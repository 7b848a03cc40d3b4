"""Engine operators: dataflow (features, fan-out, resume) and
LLM-pipeline ops (dedup, similarity, text analysis)."""
