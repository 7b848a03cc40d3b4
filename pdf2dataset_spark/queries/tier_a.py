"""Stub — populated in later build phases."""
