"""Boundary-cost A/B for the fused extraction pass: run
extract_features with the near-free TextBytesCodec over a parquet
manifest so the Python-boundary cost (not PDF parsing) dominates.
Usage: python tools/bench_boundary_pass.py [label]
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pdf2dataset_spark.session import get_spark
from pdf2dataset_spark.operators.features import extract_features
from pdf2dataset_spark.sources.codecs import TextBytesCodec

label = sys.argv[1] if len(sys.argv) > 1 else "?"
spark = get_spark("exp-boundary")
spark.sparkContext.setLogLevel("FATAL")

path = "/tmp/exp_text_manifest.parquet"
if not os.path.exists(path):
    import pandas as pd
    body = ("lorem ipsum dolor sit amet " * 400).encode()  # ~10.4 KB
    rows = [{"path": f"d{i:05d}.txt", "content": body} for i in range(20000)]
    spark.createDataFrame(pd.DataFrame(rows)).repartition(32) \
        .write.mode("overwrite").parquet(path)

mf = spark.read.parquet(path)
mk = lambda: extract_features(mf, ["text"], codec=TextBytesCodec())
mk().limit(1).collect()

best = float("inf"); runs = []
for _ in range(7):
    t0 = time.perf_counter()
    mk().write.format("noop").mode("overwrite").save()
    w = time.perf_counter() - t0
    runs.append(round(w, 3)); best = min(best, w)
print(f"{label} boundary-pass 20k x 10KB: best={best:.3f} runs={runs}")
