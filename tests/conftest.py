from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from pdf2dataset_spark.session import get_spark

    # SPARK_GRAFT_MASTER=local-cluster[2,4,4096] runs the suite on
    # real separate executor JVMs (closure serialization, broadcast
    # lifecycle, off-driver numpy state) instead of local[N]'s shared
    # JVM — the cheapest cluster-bug detector available locally.
    spark = get_spark(
        "pdf2dataset-spark-tests",
        master=os.environ.get("SPARK_GRAFT_MASTER"),
        shuffle_partitions=8,
    )
    yield spark


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_SMOKE
