"""Differential query fuzzing: randomized filter→groupBy→agg plans
run through BOTH the engine (Spark DataFrame API) and DuckDB, exact
compare — the SQLancer-style complement to the fixed oracle registry.
A mismatch on ANY generated plan is a real engine/translation bug.

The generated space stays inside the cross-engine-exact domain the
registry establishes (`queries/_util.py`): integer-cents money sums,
COUNT/MIN/MAX on exact columns, integer group keys — so any diff is
semantics, never float slop.
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

import pyspark.sql.functions as F

from pdf2dataset_spark.io import load_table

SF = "/root/testdata/sf0.001"

# ---- predicate atoms: (spark_column_fn, duckdb_sql) pairs ----------
PREDICATES = [
    (lambda: F.col("l_quantity") <= 25.0, "l_quantity <= 25.0"),
    (lambda: F.col("l_quantity") > 40.0, "l_quantity > 40.0"),
    (lambda: F.col("l_discount") >= 0.05, "l_discount >= 0.05"),
    (lambda: F.col("l_returnflag") == "R", "l_returnflag = 'R'"),
    (lambda: F.col("l_returnflag") != "A", "l_returnflag <> 'A'"),
    (lambda: F.col("l_linestatus") == "F", "l_linestatus = 'F'"),
    (lambda: F.col("l_linenumber").isin(1, 2, 3), "l_linenumber IN (1,2,3)"),
    (lambda: F.col("l_partkey") % 7 == 0, "l_partkey % 7 = 0"),
    (
        lambda: F.col("l_shipdate") < F.lit("1997-06-01").cast("timestamp_ntz"),
        "l_shipdate < TIMESTAMP '1997-06-01'",
    ),
    (
        lambda: F.col("l_extendedprice") > 20000.0,
        "l_extendedprice > 20000.0",
    ),
]

GROUP_KEYS = ["l_returnflag", "l_linestatus", "l_linenumber"]

# ---- aggregate atoms ----------------------------------------------
AGGS = [
    (lambda: F.count(F.lit(1)).alias("cnt"), "COUNT(*) AS cnt"),
    (
        lambda: F.sum(F.round(F.col("l_extendedprice") * 100, 0).cast("bigint")).alias(
            "price_c"
        ),
        "SUM(CAST(round(l_extendedprice*100,0) AS BIGINT)) AS price_c",
    ),
    (
        lambda: F.sum(F.round(F.col("l_discount") * 100, 0).cast("bigint")).alias(
            "disc_c"
        ),
        "SUM(CAST(round(l_discount*100,0) AS BIGINT)) AS disc_c",
    ),
    (
        lambda: F.min(F.col("l_quantity").cast("bigint")).alias("min_q"),
        "MIN(CAST(l_quantity AS BIGINT)) AS min_q",
    ),
    (
        lambda: F.max(F.col("l_quantity").cast("bigint")).alias("max_q"),
        "MAX(CAST(l_quantity AS BIGINT)) AS max_q",
    ),
    (
        lambda: F.countDistinct("l_partkey").alias("nd_part"),
        "COUNT(DISTINCT l_partkey) AS nd_part",
    ),
    (
        lambda: F.sum(F.col("l_linenumber").cast("bigint")).alias("sum_ln"),
        "SUM(CAST(l_linenumber AS BIGINT)) AS sum_ln",
    ),
]


@pytest.fixture(scope="module")
def oracle():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{SF}/lineitem.parquet')"
    )
    yield con
    con.close()


plan_strategy = st.fixed_dictionaries(
    {
        "preds": st.lists(
            st.integers(0, len(PREDICATES) - 1), max_size=3, unique=True
        ),
        "keys": st.lists(
            st.sampled_from(GROUP_KEYS), max_size=2, unique=True
        ),
        "aggs": st.lists(
            st.integers(0, len(AGGS) - 1), min_size=1, max_size=3, unique=True
        ),
    }
)


def _norm(v):
    return int(v) if isinstance(v, bool) else v


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(plan=plan_strategy)
def test_random_plan_matches_duckdb(spark, oracle, plan):
    df = load_table(spark, SF, "lineitem")
    where = []
    for i in plan["preds"]:
        col_fn, sql = PREDICATES[i]
        df = df.filter(col_fn())
        where.append(sql)
    agg_cols = [AGGS[i][0]() for i in plan["aggs"]]
    agg_sqls = [AGGS[i][1] for i in plan["aggs"]]
    if plan["keys"]:
        df = df.groupBy(*plan["keys"]).agg(*agg_cols)
        select = ", ".join(plan["keys"] + agg_sqls)
        group = " GROUP BY " + ", ".join(plan["keys"])
    else:
        df = df.agg(*agg_cols)
        select = ", ".join(agg_sqls)
        group = ""
    sql = (
        f"SELECT {select} FROM lineitem"
        + (" WHERE " + " AND ".join(where) if where else "")
        + group
    )
    got = sorted(
        tuple(_norm(v) for v in row) for row in (tuple(r) for r in df.collect())
    )
    want = sorted(
        tuple(_norm(v) for v in row) for row in oracle.execute(sql).fetchall()
    )
    assert got == want, sql


ORDER_PREDICATES = [
    (lambda: F.col("o_orderpriority") == "1-URGENT", "o_orderpriority = '1-URGENT'"),
    (lambda: F.col("o_totalprice") > 150000.0, "o_totalprice > 150000.0"),
    (lambda: F.col("o_orderstatus") != "F", "o_orderstatus <> 'F'"),
    (lambda: F.col("o_custkey") % 3 == 1, "o_custkey % 3 = 1"),
]

join_strategy = st.fixed_dictionaries(
    {
        "li_preds": st.lists(
            st.integers(0, len(PREDICATES) - 1), max_size=2, unique=True
        ),
        "o_preds": st.lists(
            st.integers(0, len(ORDER_PREDICATES) - 1), max_size=2, unique=True
        ),
        "how": st.sampled_from(["inner", "left", "left_semi", "left_anti"]),
        "aggs": st.lists(
            st.integers(0, len(AGGS) - 1), min_size=1, max_size=2, unique=True
        ),
    }
)


@pytest.fixture(scope="module")
def oracle2(oracle):
    oracle.execute(
        f"CREATE VIEW orders AS SELECT * FROM read_parquet('{SF}/orders.parquet')"
    )
    return oracle


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(plan=join_strategy)
def test_random_join_matches_duckdb(spark, oracle2, plan):
    """Random lineitem⋈orders joins (incl. semi/anti — null-handling
    hot spots) aggregated per l_returnflag, vs DuckDB."""
    li = load_table(spark, SF, "lineitem")
    o = load_table(spark, SF, "orders")
    li_where, o_where = [], []
    for i in plan["li_preds"]:
        li = li.filter(PREDICATES[i][0]())
        li_where.append(PREDICATES[i][1])
    for i in plan["o_preds"]:
        o = o.filter(ORDER_PREDICATES[i][0]())
        o_where.append(ORDER_PREDICATES[i][1])
    joined = li.join(o, li["l_orderkey"] == o["o_orderkey"], plan["how"])
    agg_cols = [AGGS[i][0]() for i in plan["aggs"]]
    agg_sqls = [AGGS[i][1] for i in plan["aggs"]]
    df = joined.groupBy("l_returnflag").agg(*agg_cols)

    li_sub = "SELECT * FROM lineitem" + (
        " WHERE " + " AND ".join(li_where) if li_where else ""
    )
    o_sub = "SELECT * FROM orders" + (
        " WHERE " + " AND ".join(o_where) if o_where else ""
    )
    duck_join = {
        "inner": "JOIN",
        "left": "LEFT JOIN",
        "left_semi": "SEMI JOIN",
        "left_anti": "ANTI JOIN",
    }[plan["how"]]
    sql = (
        f"SELECT l_returnflag, {', '.join(agg_sqls)} FROM ({li_sub}) l "
        f"{duck_join} ({o_sub}) o ON l.l_orderkey = o.o_orderkey "
        "GROUP BY l_returnflag"
    )
    got = sorted(tuple(_norm(v) for v in r) for r in (tuple(x) for x in df.collect()))
    want = sorted(
        tuple(_norm(v) for v in r) for r in oracle2.execute(sql).fetchall()
    )
    assert got == want, sql


# (l_orderkey, l_linenumber) is NOT unique in the synthetic data —
# the 5-column ORDER_KEY below is (verified 6000/6000 distinct), which
# makes every sequence-sensitive window function deterministic.
ORDER_KEY = "l_orderkey, l_linenumber, l_partkey, l_suppkey, l_extendedprice"

WINDOW_FNS = [
    "row_number() OVER w AS rn",
    "rank() OVER (PARTITION BY {p} ORDER BY CAST(l_quantity AS BIGINT)) AS rk",
    "dense_rank() OVER (PARTITION BY {p} ORDER BY CAST(l_quantity AS BIGINT)) AS drk",
    "lag(CAST(l_quantity AS BIGINT), 1) OVER w AS lag_q",
    "lead(l_linenumber, 2) OVER w AS lead_ln",
    "SUM(CAST(round(l_extendedprice*100,0) AS BIGINT)) OVER "
    f"(PARTITION BY {{p}} ORDER BY {ORDER_KEY} "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_c",
    "COUNT(*) OVER (PARTITION BY {p}) AS part_n",
]

PARTS = ["l_returnflag", "l_linestatus", "l_orderkey % 10"]

window_strategy = st.fixed_dictionaries(
    {
        "part": st.sampled_from(PARTS),
        "fns": st.lists(
            st.integers(0, len(WINDOW_FNS) - 1), min_size=1, max_size=3, unique=True
        ),
        "pred": st.one_of(
            st.none(), st.integers(0, len(PREDICATES) - 1)
        ),
    }
)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(plan=window_strategy)
def test_random_window_matches_duckdb(spark, oracle, plan):
    """Random window specs over a deterministic total order
    (l_orderkey, l_linenumber is unique) — identical SQL text on
    both engines."""
    load_table(spark, SF, "lineitem").createOrReplaceTempView("lineitem")
    p = plan["part"]
    sels = [WINDOW_FNS[i].format(p=p) for i in plan["fns"]]
    where = f" WHERE {PREDICATES[plan['pred']][1]}" if plan["pred"] is not None else ""
    sql = (
        f"SELECT {ORDER_KEY}, {', '.join(sels)} "
        f"FROM lineitem{where} "
        f"WINDOW w AS (PARTITION BY {p} ORDER BY {ORDER_KEY})"
    )
    key = lambda row: tuple((v is None, v) for v in row)  # noqa: E731
    got = sorted((tuple(r) for r in spark.sql(sql).collect()), key=key)
    want = sorted((tuple(r) for r in oracle.execute(sql).fetchall()), key=key)
    assert got == want, sql


SETOPS = ["UNION", "UNION ALL", "INTERSECT", "EXCEPT"]


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    op=st.sampled_from(SETOPS),
    pa=st.integers(0, len(PREDICATES) - 1),
    pb=st.integers(0, len(PREDICATES) - 1),
)
def test_random_setop_matches_duckdb(spark, oracle, op, pa, pb):
    """Random set operations between two filtered projections —
    UNION dedup and EXCEPT/INTERSECT bag-vs-set semantics are classic
    cross-engine divergence points; identical SQL text both sides."""
    load_table(spark, SF, "lineitem").createOrReplaceTempView("lineitem")
    proj = "l_returnflag, l_linestatus, CAST(l_quantity AS BIGINT) AS q"
    sql = (
        f"SELECT {proj} FROM lineitem WHERE {PREDICATES[pa][1]} "
        f"{op} "
        f"SELECT {proj} FROM lineitem WHERE {PREDICATES[pb][1]}"
    )
    got = sorted(tuple(r) for r in spark.sql(sql).collect())
    want = sorted(tuple(r) for r in oracle.execute(sql).fetchall())
    assert got == want, sql


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    key=st.sampled_from(GROUP_KEYS),
    min_n=st.integers(1, 2000),
    limit=st.integers(1, 5),
)
def test_random_having_order_limit_matches_duckdb(spark, oracle, key, min_n, limit):
    """HAVING + deterministic ORDER BY ... LIMIT — tie-break on the
    group key keeps the limit engine-invariant."""
    load_table(spark, SF, "lineitem").createOrReplaceTempView("lineitem")
    sql = (
        f"SELECT {key} AS k, COUNT(*) AS n, "
        "SUM(CAST(round(l_extendedprice*100,0) AS BIGINT)) AS rev_c "
        f"FROM lineitem GROUP BY {key} HAVING COUNT(*) >= {min_n} "
        f"ORDER BY n DESC, k LIMIT {limit}"
    )
    got = [tuple(r) for r in spark.sql(sql).collect()]
    want = [tuple(r) for r in oracle.execute(sql).fetchall()]
    assert got == want, sql


@pytest.fixture(scope="module")
def null_tables(spark, oracle):
    """A null-rich table registered in BOTH engines — the TPC-H
    testdata has no NULLs, so null semantics (group-by-null,
    agg-over-null, join-on-null) would otherwise go unfuzzed."""
    import pandas as pd

    rows = []
    for i in range(300):
        rows.append(
            (
                i,
                None if i % 7 == 0 else i % 5,          # nullable group key
                None if i % 11 == 0 else (i * 13) % 97,  # nullable value
                None if i % 13 == 0 else i % 20,         # nullable join key
            )
        )
    pdf = pd.DataFrame(rows, columns=["id", "g", "v", "jk"]).astype(
        {"id": "int64", "g": "Int64", "v": "Int64", "jk": "Int64"}
    )
    spark.createDataFrame(pdf).createOrReplaceTempView("nulltab")
    oracle.register("nulltab", pdf)
    dim = pd.DataFrame(
        {"jk": pd.array([None, 1, 2, 3, 5, 8, 13], dtype="Int64"),
         "label": ["n", "a", "b", "c", "d", "e", "f"]}
    )
    spark.createDataFrame(dim).createOrReplaceTempView("nulldim")
    oracle.register("nulldim", dim)
    return oracle


NULL_QUERIES = [
    # group-by NULL key forms its own group in both engines
    "SELECT g, COUNT(*) AS n, COUNT(v) AS nv, SUM(v) AS sv FROM nulltab GROUP BY g",
    # aggregates skip NULLs; COUNT(*) does not
    "SELECT COUNT(*) AS n, COUNT(v) AS nv, MIN(v) AS mn, MAX(v) AS mx FROM nulltab",
    # DISTINCT treats NULLs as equal
    "SELECT DISTINCT g FROM nulltab",
    # equality join never matches NULL keys
    "SELECT t.id, d.label FROM nulltab t JOIN nulldim d ON t.jk = d.jk",
    # left join keeps NULL-key rows with NULL label
    "SELECT COUNT(*) AS n, COUNT(d.label) AS matched "
    "FROM nulltab t LEFT JOIN nulldim d ON t.jk = d.jk",
    # IS DISTINCT FROM: null-safe comparison
    "SELECT COUNT(*) AS n FROM nulltab WHERE g IS DISTINCT FROM v",
    # NULL-aware NOT IN: any NULL in the subquery empties the result
    "SELECT COUNT(*) AS n FROM nulltab WHERE jk NOT IN (SELECT jk FROM nulldim)",
    # COALESCE / NULLIF scalar behavior
    "SELECT COALESCE(g, -1) AS gg, COUNT(*) AS n FROM nulltab GROUP BY 1",
    "SELECT COUNT(NULLIF(g, 0)) AS nz FROM nulltab",
    # ORDER BY with explicit null placement + deterministic tie-break
    "SELECT id, v FROM nulltab ORDER BY v ASC NULLS LAST, id LIMIT 25",
]


@pytest.mark.parametrize("sql", NULL_QUERIES)
def test_null_semantics_match_duckdb(spark, null_tables, sql):
    key = lambda row: tuple((x is None, x) for x in row)  # noqa: E731
    got = sorted((tuple(r) for r in spark.sql(sql).collect()), key=key)
    want = sorted((tuple(r) for r in null_tables.execute(sql).fetchall()), key=key)
    assert [tuple(_norm(v) for v in r) for r in got] == [
        tuple(_norm(v) for v in r) for r in want
    ], sql


# ---------------------------------------------------------------------
# curation-chain fuzz (round-5): random quality/dedup parameters over
# planted-invariant corpora — kept set must equal the planted good set
# EXACTLY for every config. This is the class of test that catches
# input-shape divergences like round-4's f41 multi-space bug: doc
# text uses randomized whitespace/casing shapes, never just single
# spaces.
# ---------------------------------------------------------------------


def _fuzz_corpus(rng, min_tokens, max_tokens):
    """Planted corpus: unique good docs (pass every gate), exact dups,
    near dups, too-short junk, repeated-bigram junk. Returns
    (rows, good_ids). Doc vocabularies are doc-unique so only planted
    dups are near-dups; separators/casing are adversarial."""
    import hashlib

    seps = [" ", "  ", "\t", " \n", "   "]

    def doc(i, n_words):
        words = []
        for j in range(n_words):
            h = hashlib.md5(f"{i}:{j}".encode()).hexdigest()[:6]
            words.append(f"w{h}")
        return seps[int(rng.integers(len(seps)))].join(words)

    n_good = int(rng.integers(20, 50))
    rows, good = [], set()
    for i in range(n_good):
        n_words = int(rng.integers(min_tokens + 5, min(max_tokens - 5, 60)))
        rows.append((i, doc(i, n_words)))
        good.add(i)
    next_id = 1000
    for _ in range(int(rng.integers(1, 4))):  # exact dups (normalized)
        src = int(rng.integers(n_good))
        dup = rows[src][1]
        if rng.random() < 0.5:
            dup = dup.upper()  # normalization: case-insensitive exact
        rows.append((next_id, dup))
        next_id += 1
    near_ids = []
    for _ in range(int(rng.integers(1, 4))):  # near dups (+1 word)
        src = int(rng.integers(n_good))
        rows.append((next_id, rows[src][1] + " zzq"))
        near_ids.append(next_id)
        next_id += 1
    for _ in range(int(rng.integers(1, 3))):  # too short
        rows.append((next_id, "tiny doc"))
        next_id += 1
    for _ in range(int(rng.integers(1, 3))):  # repeated bigrams
        rows.append((next_id, "spam ham " * 150))
        next_id += 1
    return rows, good, set(near_ids)


@pytest.mark.parametrize("seed", range(8))
def test_curation_chain_fuzz_planted_invariants(spark, seed):
    import numpy as np

    from pdf2dataset_spark import curate as cu

    rng = np.random.default_rng(seed)
    min_tokens = int(rng.integers(5, 12))
    max_tokens = int(rng.integers(80, 200))
    max_dup_bigram = float(rng.uniform(0.2, 0.8))
    jaccard_threshold = float(rng.uniform(0.6, 0.8))
    neardup = "lsh" if rng.random() < 0.7 else "none"
    n_shards = int(rng.integers(2, 8))
    train_frac = float(rng.uniform(0.5, 0.95))

    rows, good, near_ids = _fuzz_corpus(rng, min_tokens, max_tokens)
    corpus = spark.createDataFrame(rows, "doc_id long, text string")
    out = cu.curate(
        corpus,
        min_tokens=min_tokens,
        max_tokens=max_tokens,
        max_dup_bigram=max_dup_bigram,
        neardup=neardup,
        jaccard_threshold=jaccard_threshold,
        train_frac=train_frac,
        n_shards=n_shards,
    ).select("doc_id", "split", "shard_id").collect()
    cu.release_caches()
    kept = {r["doc_id"] for r in out}
    want = good | (near_ids if neardup == "none" else set())
    assert kept == want, (
        f"seed={seed}: kept {sorted(kept ^ want)} diverges "
        f"(cfg min={min_tokens} max={max_tokens} bigram={max_dup_bigram:.2f} "
        f"nd={neardup} jt={jaccard_threshold:.2f})"
    )
    assert {r["split"] for r in out} <= {"train", "test"}
    assert {r["shard_id"] for r in out} <= set(range(n_shards))


def test_shingles_canonical_under_edge_whitespace(spark):
    """Round-5 review follow-up: F.trim strips only ASCII spaces, so a
    doc and its '\\t...\\n'-wrapped copy used to shingle differently
    (extracted page text routinely ends with a newline). Shingles and
    minhash signatures must be identical under ANY edge whitespace."""
    from pdf2dataset_spark.operators import dedup as dd

    base = "alpha beta gamma delta epsilon zeta"
    variants = [base, "\t" + base + "\n", "  " + base + "  ", base + "\r\n"]
    df = spark.createDataFrame(
        list(enumerate(variants)), "doc_id long, text string"
    )
    rows = df.select(
        "doc_id",
        dd.shingles("text", 3).alias("sh"),
        dd.minhash_signature(dd.shingles("text", 3)).alias("sig"),
    ).collect()
    want_sh = sorted(rows[0]["sh"])
    want_sig = rows[0]["sig"]
    for r in rows[1:]:
        assert sorted(r["sh"]) == want_sh, r["doc_id"]
        assert r["sig"] == want_sig, r["doc_id"]
