"""Micro-bench: JVM->Python boundary cost (mapInPandas vs mapInArrow,
identity and binary-in/columns-out reduce shapes) over a parquet scan
substrate so no driver ship lands in the timed region. Evidence
tooling for the round-12 mapInArrow conversion; NOT part of bench.py
(writes its fixture under /tmp, never touches /root/testdata)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pdf2dataset_spark.session import get_spark

spark = get_spark("exp-miarrow3")
spark.sparkContext.setLogLevel("FATAL")

import random
random.seed(7)
path = "/tmp/exp_payload.parquet"
if not os.path.exists(path):
    import pandas as pd
    rows = [{"path": f"d{i:04d}.bin", "content": random.randbytes(1 << 20)}
            for i in range(256)]
    spark.createDataFrame(pd.DataFrame(rows)).repartition(32) \
        .write.mode("overwrite").parquet(path)

base = spark.read.parquet(path)

from pyspark.sql import types as T
in_schema = T.StructType([
    T.StructField("path", T.StringType(), False),
    T.StructField("content", T.BinaryType(), True),
])
out_schema = T.StructType([
    T.StructField("path", T.StringType(), False),
    T.StructField("n", T.IntegerType(), False),
])

import pandas as pd
import pyarrow as pa

def ident_pandas(batches):
    for pdf in batches:
        yield pdf

def ident_arrow(batches):
    for b in batches:
        yield b

def reduce_pandas(batches):
    for pdf in batches:
        rows = []
        for p, content in zip(pdf["path"], pdf["content"]):
            b = bytes(content)
            rows.append({"path": p, "n": len(b)})
        yield pd.DataFrame(rows, columns=["path", "n"])

def reduce_arrow(batches):
    for b in batches:
        paths = b.column(0)
        ns = [len(v) for v in b.column(1).to_pylist()]
        yield pa.RecordBatch.from_arrays(
            [paths, pa.array(ns, type=pa.int32())], ["path", "n"])

def timeit(label, mk, n=7):
    best = float("inf"); runs=[]
    for _ in range(n):
        t0 = time.perf_counter()
        mk().write.format("noop").mode("overwrite").save()
        w = time.perf_counter() - t0
        runs.append(round(w,3)); best=min(best,w)
    print(f"{label}: best={best:.3f} runs={runs}", flush=True)

base.limit(1).collect()
timeit("scan noop            ", lambda: base)
timeit("identity mapInPandas ", lambda: base.mapInPandas(ident_pandas, schema=in_schema))
timeit("identity mapInArrow  ", lambda: base.mapInArrow(ident_arrow, schema=in_schema))
timeit("reduce   mapInPandas ", lambda: base.mapInPandas(reduce_pandas, schema=out_schema))
timeit("reduce   mapInArrow  ", lambda: base.mapInArrow(reduce_arrow, schema=out_schema))
