"""Tier A — the reference's own dataflow operators (SURVEY.md §2).

The binary sources / feature UDFs / sinks (A1–A2, A5–A7, A10–A11)
need real files and are exercised end-to-end in tests/test_extraction
.py; here each remaining operator gets a driver-checkable analog on
the testdata, plus `a0` runs the real extraction pipeline on
deterministic in-memory fixtures (rows-only: binary/traceback columns
aren't SQL-comparable).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pdf2dataset_spark.queries import query
from pdf2dataset_spark.queries._util import t


# --------------------------------------------------------------- A0
@query("a0_extract_pipeline", sql=None, tier="A")
def a0_extract_pipeline(spark, sf_dir):
    """The reference's core loop end-to-end (A2+A4+A5+A8): in-memory
    docs → fused mapInPandas fan-out + text feature + error capture.
    Deterministic fixture incl. a corrupted doc → error row."""
    from pdf2dataset_spark.extraction import ExtractionPipeline

    docs = {
        "a.pdf": "page one\fpage two\fpage three".encode(),
        "b.pdf": "single page".encode(),
        "bad.pdf": b"\xff\xfe broken",
    }
    pipe = ExtractionPipeline(spark=spark, features=["text"])
    pages = pipe.pages(docs)
    return pages.select("path", "page", "text", F.col("error").isNotNull().alias("has_error"))


# --------------------------------------------------------------- A3
@query(
    "a3_parquet_scan",
    sql="""
    SELECT COUNT(*) AS n_rows,
           MIN(l_orderkey) AS min_key,
           MAX(l_orderkey) AS max_key,
           COUNT(DISTINCT l_suppkey) AS n_suppliers
    FROM lineitem
    """,
    tier="A",
)
def a3_parquet_scan(spark, sf_dir):
    """Parquet scan + footer-driven schema (A3): the resume/read path."""
    li = t(spark, sf_dir, "lineitem")
    return li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("l_orderkey").alias("min_key"),
        F.max("l_orderkey").alias("max_key"),
        F.countDistinct("l_suppkey").alias("n_suppliers"),
    )


# --------------------------------------------------------------- A4
@query(
    "a4_page_fanout",
    sql="""
    SELECT doc_id, unnest(generate_series(1, CAST(doc_id % 5 + 1 AS INTEGER))) AS page
    FROM documents
    """,
    tier="A",
)
def a4_page_fanout(spark, sf_dir):
    """Doc→page fan-out (A4), relational analog: explode a per-doc
    page sequence (n_pages = doc_id % 5 + 1). The production path is
    the fused mapInPandas in operators/features.py; this proves the
    pure-relational expansion Catalyst sees."""
    d = t(spark, sf_dir, "documents")
    n_pages = (F.col("doc_id") % 5 + 1).cast("int")
    return d.select(
        "doc_id",
        F.explode(F.sequence(F.lit(1), n_pages)).alias("page"),
    )


# --------------------------------------------------------------- A8
@query(
    "a8_error_capture",
    sql="""
    SELECT c_custkey,
           CASE WHEN c_acctbal >= 0 THEN sqrt(c_acctbal) END AS sqrt_bal,
           CASE WHEN c_acctbal < 0 THEN 'negative balance' END AS error
    FROM customer
    """,
    tier="A",
)
def a8_error_capture(spark, sf_dir):
    """Per-row error capture analog (A8): guarded computation keeps
    the row and fills an error column instead of failing — the same
    contract the feature UDFs implement for tracebacks."""
    c = t(spark, sf_dir, "customer")
    ok = F.col("c_acctbal") >= 0
    return c.select(
        "c_custkey",
        F.when(ok, F.sqrt("c_acctbal")).alias("sqrt_bal"),
        F.when(~ok, F.lit("negative balance")).alias("error"),
    )


# --------------------------------------------------------------- A9
@query(
    "a9_resume_antijoin",
    sql="""
    WITH tasks AS (
      SELECT doc_id, unnest(generate_series(1, CAST(doc_id % 5 + 1 AS INTEGER))) AS page
      FROM documents
    ),
    done AS (SELECT doc_id, page FROM tasks WHERE (doc_id * 7 + page) % 3 = 0)
    SELECT t.doc_id, t.page
    FROM tasks t
    WHERE NOT EXISTS (SELECT 1 FROM done d
                      WHERE d.doc_id = t.doc_id AND d.page = t.page)
    """,
    tier="A",
)
def a9_resume_antijoin(spark, sf_dir):
    """Resume / skip-processed (A9): pending = tasks ANTI JOIN done —
    the exact plan shape operators/resume.py uses against a real sink."""
    from pdf2dataset_spark.operators.resume import resume_filter

    d = t(spark, sf_dir, "documents")
    tasks = d.select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(1), (F.col("doc_id") % 5 + 1).cast("int"))
        ).alias("page"),
    )
    done = tasks.filter((F.col("doc_id") * 7 + F.col("page")) % 3 == 0)
    return resume_filter(tasks, done, ["doc_id", "page"])


# --------------------------------------------------------------- A12
@query(
    "a12_chunk_concat",
    sql="""
    SELECT COUNT(*) AS n_rows,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
    FROM (
      SELECT l_quantity FROM lineitem WHERE l_orderkey % 2 = 0
      UNION ALL
      SELECT l_quantity FROM lineitem WHERE l_orderkey % 2 = 1
    )
    """,
    tier="A",
)
def a12_chunk_concat(spark, sf_dir):
    """Chunk concat (A12): union of chunk DataFrames reassembles the
    whole dataset losslessly (the sink-side invariant of A10)."""
    li = t(spark, sf_dir, "lineitem")
    even = li.filter(F.col("l_orderkey") % 2 == 0).select("l_quantity")
    odd = li.filter(F.col("l_orderkey") % 2 == 1).select("l_quantity")
    both = even.unionByName(odd)
    return both.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("l_quantity").cast("decimal(12,2)")).cast("double").alias("sum_qty"),
    )


# --------------------------------------------------------------- A15
@query("a15_pipeline_composition", sql=None, tier="A")
def a15_pipeline_composition(spark, sf_dir):
    """The actual use-case, end to end in ONE lazy plan: extract
    (fused fan-out + features + error capture) → drop error rows →
    quality filter → exact dedup → per-doc token stats. Every stage
    is the operator the registry checks individually; this proves
    they compose without materialization barriers (zero actions until
    the driver collects)."""
    from pyspark.sql import functions as F

    from pdf2dataset_spark.extraction import ExtractionPipeline
    from pdf2dataset_spark.operators.dedup import exact_dedup
    from pdf2dataset_spark.operators.text import quality_filter

    docs = {
        "a.pdf": "spark query engine with enough words here\fsecond page text body".encode(),
        "b.pdf": "spark query engine with enough words here".encode(),  # dup of a p1
        "c.pdf": "tiny".encode(),  # fails quality filter
        "bad.pdf": b"\xff\xfe",  # error row
    }
    pages = ExtractionPipeline(spark=spark, features=["text"]).pages(docs)
    ok = pages.filter(F.col("error").isNull()).withColumn(
        "doc_key", F.concat_ws("#", "path", F.col("page").cast("string"))
    )
    good = quality_filter(ok, min_tokens=4, min_mean_token_len=1.0)
    deduped = exact_dedup(good, text_col="text", order_col="doc_key")
    return deduped.select(
        "path", "page", F.col("q_n_tokens").alias("n_tokens"), "text_sha256"
    )
