"""At-scale invariant checks — beyond the oracle scale factors.

The sf0.001/0.01/0.1 oracle gates prove semantics; they CANNOT catch
bugs that only appear once distributed machinery starts sampling,
spilling, or partial-aggregating over millions of rows (the
`global_rank` boundary-resampling bug found by tools/bench_rank.py
was invisible below ~1M rows). This harness re-checks the
scale-critical primitives at 5-10M rows using self-evident
invariants — permutation laws, conservation of counts, agreement
between independent strategies — and prints one JSON line.

Usage: python tools/scale_check.py [scale_multiplier]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from pdf2dataset_spark.operators import dedup as dd  # noqa: E402
from pdf2dataset_spark.operators import mixture as mx  # noqa: E402
from pdf2dataset_spark.operators import rank  # noqa: E402
from pdf2dataset_spark.session import get_spark  # noqa: E402


def main() -> None:
    mult = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    spark = get_spark("scale-check", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    results: dict[str, dict] = {}

    def check(name: str, fn) -> None:
        t0 = time.time()
        try:
            detail = fn()
            results[name] = {"ok": True, "s": round(time.time() - t0, 1), **detail}
        except Exception as e:
            results[name] = {
                "ok": False,
                "s": round(time.time() - t0, 1),
                "detail": str(e)[:300],
            }

    # 1. global_rank permutation law at 10M (the bug class just fixed)
    def rank_perm():
        n = int(10_000_000 * mult)
        df = spark.range(n).select("id", F.xxhash64("id").alias("k"))
        out = rank.global_rank(df, [F.col("k"), F.col("id")])
        a = out.agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("global_rank").alias("nd"),
            F.min("global_rank").alias("mn"),
            F.max("global_rank").alias("mx"),
        ).collect()[0]
        assert (a["n"], a["nd"], a["mn"], a["mx"]) == (n, n, 1, n), dict(a.asDict())
        return {"rows": n}

    # 2. global_prefix_sum conservation at 10M: final sum == Σ values
    def prefix_conservation():
        n = int(10_000_000 * mult)
        df = spark.range(n).select(
            "id", F.xxhash64("id").alias("k"), (F.col("id") % 7 + 1).alias("v")
        )
        total = df.agg(F.sum("v").alias("s")).collect()[0]["s"]
        ps = rank.global_prefix_sum(df, [F.col("k"), F.col("id")], "v")
        a = ps.agg(
            F.max("prefix_sum").alias("mx"), F.countDistinct("prefix_sum").alias("nd")
        ).collect()[0]
        assert a["mx"] == total and a["nd"] == n, dict(a.asDict())
        return {"rows": n, "total": int(total)}

    # 3. exact_dedup: window and join strategies must agree at 5M
    #    rows with ~20% planted duplicate texts
    def dedup_strategy_agreement():
        n = int(5_000_000 * mult)
        df = spark.range(n).select(
            F.col("id").alias("doc_id"),
            F.concat(
                F.lit("doc "), ((F.col("id") * 5) % n).cast("string")
            ).alias("text"),  # ids sharing (id*5)%n collide -> dups
        )
        a = dd.exact_dedup(df, "text", "doc_id", strategy="window").select("doc_id")
        b = dd.exact_dedup(df, "text", "doc_id", strategy="join").select("doc_id")
        n_a, n_b = a.count(), b.count()
        sym_diff = a.join(b, "doc_id", "full_outer").filter(
            a["doc_id"].isNull() | b["doc_id"].isNull()
        ).count()
        assert n_a == n_b and sym_diff == 0, (n_a, n_b, sym_diff)
        return {"rows": n, "survivors": n_a}

    # 4. mixture: deterministic hash sampling must hit expected counts
    #    within binomial tolerance AND be rerun-identical at 5M
    def mixture_law():
        n = int(5_000_000 * mult)
        df = spark.range(n).select(
            F.col("id").alias("doc_id"),
            F.when(F.col("id") % 2 == 0, "a").otherwise("b").alias("source"),
        )
        out = mx.mix_sources(df, {"a": 0.25, "b": 2.5})
        c1 = {r["source"]: r["n"] for r in out.groupBy("source").agg(
            F.count(F.lit(1)).alias("n")).collect()}
        c2 = {r["source"]: r["n"] for r in out.groupBy("source").agg(
            F.count(F.lit(1)).alias("n")).collect()}
        assert c1 == c2, (c1, c2)  # rerun-identical
        half = n // 2
        assert abs(c1["a"] - half * 0.25) < 0.01 * half, c1
        assert abs(c1["b"] - half * 2.5) < 0.01 * half, c1
        return {"rows": n, **{f"kept_{k}": int(v) for k, v in c1.items()}}

    # 5. LSH banding: planted exact dups all collide at 5M docs
    #    (short synthetic token docs; near-dup recall is covered by
    #    operator tests — here the invariant is exhaustive exact-dup
    #    collision + zero pairs among unique docs)
    def lsh_collision_law():
        n = int(2_000_000 * mult)
        dup_every = 1000
        df = spark.range(n).select(
            F.col("id").alias("doc_id"),
            F.when(F.col("id") % dup_every == 1, F.col("id") - 1)
            .otherwise(F.col("id"))
            .alias("src"),
        ).select(
            "doc_id",
            F.array(
                *[F.md5(F.concat(F.col("src").cast("string"), F.lit(i))) for i in range(8)]
            ).alias("sh"),
        )
        sig = df.select("doc_id", dd.minhash_signature(F.col("sh")).alias("minhash"))
        pairs = dd.lsh_candidate_pairs(sig, "doc_id", "minhash")
        expected = (n - 2) // dup_every + 1
        got = pairs.count()
        assert got == expected, (got, expected)
        return {"rows": n, "planted": expected, "pairs": got}

    # 6. connected components: K disjoint chains of length L must
    #    yield exactly K components labeled by their chain minimum
    #    (iterative fixpoint at 2M edges — the curate near-dup core)
    def components_chain_law():
        from pdf2dataset_spark.operators import cluster as cl

        n_edges = int(2_000_000 * mult)
        chain_len = 10  # nodes per chain
        edges = (
            spark.range(n_edges)
            .filter(F.col("id") % chain_len != chain_len - 1)  # break chains
            .select(F.col("id").alias("id1"), (F.col("id") + 1).alias("id2"))
        )
        comp = cl.connected_components(edges)
        a = comp.agg(
            F.countDistinct("component").alias("k"),
            F.count(F.lit(1)).alias("nodes"),
            # every node's component must be its chain's first node
            F.sum(
                (F.col("component") != F.col("node") - F.col("node") % chain_len)
                .cast("long")
            ).alias("mislabels"),
        ).collect()[0]
        expected_k = n_edges // chain_len
        assert a["mislabels"] == 0 and a["k"] == expected_k, dict(a.asDict())
        return {"edges": int(n_edges * (chain_len - 1) / chain_len), "components": int(a["k"])}

    # 7. cross-engine exactness at 10M rows: the integer-cents
    #    aggregation discipline must stay BITWISE equal to DuckDB far
    #    beyond the oracle scale factors (partial-agg order is
    #    maximally nondeterministic at width; decimal/cents paths are
    #    designed order-independent — prove it at 17x sf0.1)
    def cents_cross_engine():
        import duckdb

        n = int(10_000_000 * mult)
        path = "/tmp/scale_check_li.parquet"
        spark.range(n).select(
            (F.xxhash64("id") % 5).alias("g"),
            ((F.pmod(F.xxhash64("id", F.lit(1)), 10_000_000).cast("double")) / 100
             ).alias("price"),
            (F.pmod(F.xxhash64("id", F.lit(2)), 100).cast("double") / 100
             ).alias("disc"),
        ).write.mode("overwrite").parquet(path)
        sdf = spark.read.parquet(path)
        got = {
            r["g"]: (r["rev"], r["n"])
            for r in sdf.groupBy("g").agg(
                (F.sum(
                    F.round(F.col("price") * 100, 0).cast("bigint")
                    * F.round(F.col("disc") * 100, 0).cast("bigint")
                ).cast("double") / 10_000).alias("rev"),
                F.count(F.lit(1)).alias("n"),
            ).collect()
        }
        want = {
            g: (rev, cnt)
            for g, rev, cnt in duckdb.sql(
                f"""SELECT g,
                     CAST(SUM(CAST(round(price*100,0) AS BIGINT)
                              * CAST(round(disc*100,0) AS BIGINT)) AS DOUBLE)
                       / 10000 AS rev,
                     COUNT(*) AS n
                    FROM read_parquet('{path}/*.parquet') GROUP BY g"""
            ).fetchall()
        }
        assert got == want, (got, want)
        return {"rows": n, "groups": len(got)}

    # 8. window spill correctness at 10M: running-sum + row_number
    #    fingerprints must match DuckDB exactly (unique total order,
    #    integer values — any spill/merge bug perturbs the fingerprint)
    def window_spill_cross_engine():
        import duckdb

        n = int(10_000_000 * mult)
        path = "/tmp/scale_check_w.parquet"
        spark.range(n).select(
            F.col("id"),
            (F.xxhash64("id") % 16).alias("g"),
            F.pmod(F.xxhash64("id", F.lit(3)), 1000).alias("v"),
        ).write.mode("overwrite").parquet(path)
        sql = """
          SELECT g,
                 SUM(rn * (id % 97)) AS rn_fp,
                 SUM(run_v % 100003) AS run_fp
          FROM (
            SELECT g, id,
                   row_number() OVER w AS rn,
                   SUM(v) OVER (PARTITION BY g ORDER BY id
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS run_v
            FROM t
            WINDOW w AS (PARTITION BY g ORDER BY id)
          ) GROUP BY g
        """
        spark.read.parquet(path).createOrReplaceTempView("t")
        got = {r["g"]: (r["rn_fp"], r["run_fp"]) for r in spark.sql(sql).collect()}
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW t AS SELECT * FROM read_parquet('{path}/*.parquet')"
        )
        want = {g: (a, b) for g, a, b in con.execute(sql).fetchall()}
        assert got == want, ({k: got[k] for k in list(got)[:2]},)
        return {"rows": n, "groups": len(got)}

    # 9. as-of join vs DuckDB's native ASOF JOIN at 5M left rows:
    #    the union+window strategy must agree with a reference engine
    #    implementation exactly (strict backward; right ts unique per
    #    key so the match is unambiguous)
    def asof_cross_engine():
        import duckdb

        from pdf2dataset_spark.operators.asof import asof_join_window

        n_l, n_r = int(5_000_000 * mult), int(500_000 * mult)
        lp, rp = "/tmp/scale_check_asof_l.parquet", "/tmp/scale_check_asof_r.parquet"
        spark.range(n_l).select(
            F.col("id"),
            (F.xxhash64("id") % 1000).alias("k"),
            F.pmod(F.xxhash64("id", F.lit(5)), 1_000_000).alias("ts"),
        ).write.mode("overwrite").parquet(lp)
        # unique ts per key: ts = unique id-derived value
        spark.range(n_r).select(
            (F.xxhash64("id", F.lit(7)) % 1000).alias("k"),
            (F.col("id") * 2 + 1).alias("ts"),   # odd, unique
            F.pmod(F.xxhash64("id", F.lit(9)), 1000).alias("rv"),
        ).write.mode("overwrite").parquet(rp)
        l, r = spark.read.parquet(lp), spark.read.parquet(rp)
        out = asof_join_window(l, r, on="ts", by="k", value_cols=["rv"])
        got = out.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.coalesce(F.col("asof_rv"), F.lit(-1)) * (F.col("id") % 97)
            ).alias("fp"),
        ).collect()[0]
        con = duckdb.connect()
        want = con.execute(
            f"""SELECT COUNT(*) AS n,
                  SUM(COALESCE(rv, -1) * (id % 97)) AS fp
                FROM (
                  SELECT l.id, l.ts, r.rv
                  FROM read_parquet('{lp}/*.parquet') l
                  ASOF LEFT JOIN read_parquet('{rp}/*.parquet') r
                    ON l.k = r.k AND r.ts < l.ts)"""
        ).fetchone()
        assert (got["n"], got["fp"]) == (want[0], want[1]), (dict(got.asDict()), want)
        return {"left_rows": n_l, "right_rows": n_r}

    # 10. salted skew join at 5M rows with one key carrying 30% of
    #     the data: result fingerprint must equal the plain join's
    def salted_join_equality():
        from pdf2dataset_spark.operators.skew import salted_join

        n = int(5_000_000 * mult)
        large = spark.range(n).select(
            F.col("id"),
            F.when(F.col("id") % 10 < 3, F.lit(0))  # hot key: 30% of rows
            .otherwise(F.xxhash64("id") % 10_000)
            .alias("k"),
        )
        small = spark.range(10_000).select(
            (F.col("id") - 5_000).alias("k"), (F.col("id") % 50).alias("v")
        )
        fp = lambda df: df.agg(  # noqa: E731
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("v") * (F.col("id") % 101)).alias("fp"),
        ).collect()[0]
        plain = fp(large.join(small, "k"))
        salted = fp(salted_join(large, small, on="k", salt=16))
        assert (plain["n"], plain["fp"]) == (salted["n"], salted["fp"]), (
            dict(plain.asDict()),
            dict(salted.asDict()),
        )
        return {"rows": n, "matches": int(plain["n"])}

    # 11. SemDeDup two-sided accuracy at 5M vectors: every planted
    #     ×2-scaled copy must be dropped (same direction -> same cell,
    #     cosine exactly 1 with its original) and no original may be
    #     falsely dropped (random 64-dim cosines concentrate near 0,
    #     far under the 0.85 threshold). Vectors are generated JVM-side
    #     (hash-derived), so the corpus never passes through the driver.
    def semdedup_two_sided():
        from pdf2dataset_spark.operators import similarity as sim

        n = int(5_000_000 * mult)
        dup_every = 100
        vec_expr = (
            "transform(sequence(0, 63), j -> CAST(__scale * "
            "(pmod(xxhash64(__src, j), 2001) - 1000) / 1000.0 AS DOUBLE))"
        )
        corpus = (
            spark.range(n)
            .select(
                F.col("id").alias("vec_id"),
                F.when(F.col("id") % dup_every == 1, F.col("id") - 1)
                .otherwise(F.col("id"))
                .alias("__src"),
                F.when(F.col("id") % dup_every == 1, F.lit(2.0))
                .otherwise(F.lit(1.0))
                .alias("__scale"),
            )
            .select("vec_id", F.expr(vec_expr).alias("embedding"))
        )
        out = sim.semantic_dedup_fast(
            corpus, n_centroids=4096, threshold=0.85
        )
        a = out.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum((~F.col("kept")).cast("long")).alias("dropped"),
            # false_kept: planted dup surviving; false_dropped: original lost
            F.sum(
                ((F.col("vec_id") % dup_every == 1) & F.col("kept")).cast("long")
            ).alias("false_kept"),
            F.sum(
                ((F.col("vec_id") % dup_every != 1) & ~F.col("kept")).cast("long")
            ).alias("false_dropped"),
        ).collect()[0]
        planted = (n - 2) // dup_every + 1
        assert a["n"] == n, dict(a.asDict())
        assert a["false_kept"] == 0 and a["false_dropped"] == 0, dict(a.asDict())
        assert a["dropped"] == planted, (dict(a.asDict()), planted)
        return {"vectors": n, "planted": planted, "dropped": int(a["dropped"])}

    # 12. f22 shard packing at 10M docs: the global_prefix_sum-based
    #     shard map must agree with a DuckDB global-window replay
    #     shard-for-shard, and conserve docs/tokens exactly.
    def shard_packing_cross_engine():
        import duckdb

        n = int(10_000_000 * mult)
        cap = 2000
        path = "/tmp/scale_check_pack.parquet"
        spark.range(n).select(
            F.col("id").alias("doc_id"),
            (F.pmod(F.xxhash64("id"), 37) + 1).alias("n_tokens"),
        ).write.mode("overwrite").parquet(path)
        d = spark.read.parquet(path)
        c = rank.global_prefix_sum(
            d, [F.col("doc_id")], "n_tokens", sum_col="__run"
        ).select(
            "doc_id",
            "n_tokens",
            (F.col("__run") - F.col("n_tokens")).alias("start_tok"),
        )
        shards = (
            c.groupBy(F.expr(f"start_tok div {cap}").alias("shard_id"))
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum("n_tokens").alias("toks"),
            )
        )
        got = {
            r["shard_id"]: (r["n_docs"], r["toks"]) for r in shards.collect()
        }
        want = {
            s: (nd, tk)
            for s, nd, tk in duckdb.sql(
                f"""SELECT start_tok // {cap} AS shard_id,
                           COUNT(*) AS n_docs, SUM(n_tokens) AS toks
                    FROM (
                      SELECT n_tokens,
                             SUM(n_tokens) OVER (ORDER BY doc_id
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) - n_tokens AS start_tok
                      FROM read_parquet('{path}/*.parquet'))
                    GROUP BY 1"""
            ).fetchall()
        }
        assert got == want, (len(got), len(want))
        total = sum(t for _, t in got.values())
        docs = sum(d_ for d_, _ in got.values())
        assert docs == n, (docs, n)
        # contiguous shard ids 0..max, and no shard overfull beyond one
        # straddling doc (max start inside the shard + max doc size)
        assert set(got) == set(range(len(got))), len(got)
        assert max(t for _, t in got.values()) <= cap + 37, max(
            t for _, t in got.values()
        )
        return {"docs": n, "shards": len(got), "tokens": int(total)}

    # 13. f33 BPE pair counting at 10M tokens: the vocab-sized pair
    #     explode must agree with a DuckDB corpus replay on EVERY
    #     pair's exact count (not just the top-50 the oracle checks).
    def bpe_pairs_cross_engine():
        import duckdb

        n_docs = int(500_000 * mult)
        words_per_doc = 20
        path = "/tmp/scale_check_bpe.parquet"
        text_expr = (
            "concat_ws(' ', transform(sequence(1, %d), "
            "j -> concat('w', pmod(xxhash64(id, j), 50000))))"
            % words_per_doc
        )
        spark.range(n_docs).select(
            F.expr(text_expr).alias("text")
        ).write.mode("overwrite").parquet(path)
        from pdf2dataset_spark.operators.bpe import word_frequencies

        wf = word_frequencies(spark.read.parquet(path))
        pairs = (
            wf.filter(F.length("word") >= 2)
            .select(
                F.explode(F.sequence(F.lit(1), F.length("word") - 1)).alias(
                    "i"
                ),
                "word",
                "freq",
            )
            .select(F.expr("substring(word, i, 2)").alias("pair"), "freq")
            .groupBy("pair")
            .agg(F.sum("freq").alias("cnt"))
        )
        got = {r["pair"]: r["cnt"] for r in pairs.collect()}
        want = dict(
            duckdb.sql(
                f"""WITH wf AS (
                      SELECT word, count(*) AS freq FROM (
                        SELECT unnest(string_split(text, ' ')) AS word
                        FROM read_parquet('{path}/*.parquet')
                      ) WHERE word <> '' GROUP BY word)
                    SELECT substring(word, i, 2) AS pair, SUM(freq) AS cnt
                    FROM wf, unnest(generate_series(1, len(word) - 1)) AS t(i)
                    WHERE len(word) >= 2 GROUP BY 1"""
            ).fetchall()
        )
        assert got == want, (len(got), len(want))
        return {
            "tokens": n_docs * words_per_doc,
            "distinct_pairs": len(got),
        }

    check("global_rank_permutation", rank_perm)
    check("salted_join_equality_5M", salted_join_equality)
    check("asof_cross_engine_5M", asof_cross_engine)
    check("window_spill_cross_engine_10M", window_spill_cross_engine)
    check("cents_cross_engine_10M", cents_cross_engine)
    check("components_chain_law", components_chain_law)
    check("prefix_sum_conservation", prefix_conservation)
    check("exact_dedup_strategy_agreement", dedup_strategy_agreement)
    # 14. incremental dedup-against-store at 10M store / 1M batch:
    #     the bloom-pruned path must return EXACTLY the plain
    #     anti-join's survivors, and the filter must actually prune
    #     (store rows entering the join ~ batch-sized, not store-sized)
    def ingest_dedup_cross_strategy():
        from pdf2dataset_spark.operators import dedup as dd
        from pdf2dataset_spark.operators import runtime_filter as rtf

        n_store = int(10_000_000 * mult)
        n_batch = int(1_000_000 * mult)
        store = spark.range(n_store).select(
            dd.text_hash(F.concat(F.lit("doc "), F.col("id"))).alias("__text_sha")
        )
        # batch: half replays stored docs, half is new
        batch = spark.range(n_batch).select(
            (F.col("id") + 20_000_000).alias("doc_id"),
            F.when(
                F.col("id") % 2 == 0, F.concat(F.lit("doc "), F.col("id"))
            )
            .otherwise(F.concat(F.lit("fresh "), F.col("id")))
            .alias("text"),
        )
        kept = dd.dedup_against_store(
            batch, store, store_hash_col="__text_sha"
        )
        a = kept.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("doc_id") % 97).alias("fp"),
        ).collect()[0]
        plain = (
            dd.exact_dedup(batch, "text", keep_hash=True, strategy="join")
            .withColumnRenamed("text_sha256", "__text_sha")
            .join(store, "__text_sha", "left_anti")
        )
        b = plain.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("doc_id") % 97).alias("fp"),
        ).collect()[0]
        assert (a["n"], a["fp"]) == (b["n"], b["fp"]), (
            dict(a.asDict()),
            dict(b.asDict()),
        )
        assert a["n"] == n_batch // 2, a["n"]  # exactly the fresh half
        # pruning power: the bloom keeps ~batch-sized candidates of the
        # 10M store (batch hashes + fpp false positives)
        num_bits, k = rtf.suggest_params(n_batch, 0.001)
        words = rtf.bloom_build(
            batch.select(dd.text_hash("text").alias("h")), "h", num_bits, k
        )
        candidates = rtf.bloom_probe(store, "__text_sha", words, k).count()
        assert candidates < 2 * n_batch, (candidates, n_store)
        return {
            "store": n_store,
            "batch": n_batch,
            "survivors": int(a["n"]),
            "store_rows_entering_join": int(candidates),
            "pruned_frac": round(1 - candidates / n_store, 4),
        }

    # 15. image pHash Hamming-LSH banding law at 600k hashes: groups of
    #     5 ids carry (base, exact dup, ≤2-bit near dup, 2 unique
    #     fillers). With max_hamming=3 < bands=4 at least one band is
    #     always unaffected, so EVERY planted pair must surface (exact
    #     recall law) and cross-group pairs must be ZERO (random 64-bit
    #     hashes within Hamming ≤3 are ~2^-48 events — any false pair
    #     is a banding/dedup bug, not chance). A 4k-image slab also
    #     runs the REAL render→decode→DCT→hash path end to end.
    def imagehash_banding_law():
        from pdf2dataset_spark.operators import image_hash as ih

        n = int(600_000 * mult)
        n = n - n % 5
        groups = n // 5
        df = spark.range(n).select(
            F.col("id").alias("doc_id"),
            (F.col("id") / 5).cast("long").alias("gid"),
            (F.col("id") % 5).alias("role"),
        )
        base_h = F.xxhash64(F.col("gid"))
        uniq_h = F.xxhash64(F.col("doc_id"), F.lit(7))
        hashed = df.select(
            "doc_id",
            "gid",
            F.when(F.col("role") <= 1, base_h)
            .when(F.col("role") == 2, F.expr(
                "xxhash64(gid) ^ (shiftleft(1L, cast(gid % 64 as int)) | "
                "shiftleft(1L, cast((gid * 7 + 11) % 64 as int)))"
            ))
            .otherwise(uniq_h)
            .alias("phash"),
        )
        pairs = ih.phash_neardup_pairs(
            hashed.select("doc_id", "phash"), max_hamming=3, bands=4
        )
        ids = hashed.select("doc_id", "gid")
        labeled = (
            pairs.join(ids.withColumnRenamed("doc_id", "id_a")
                       .withColumnRenamed("gid", "g1"), "id_a")
            .join(ids.withColumnRenamed("doc_id", "id_b")
                  .withColumnRenamed("gid", "g2"), "id_b")
        )
        a = labeled.agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum((F.col("g1") != F.col("g2")).cast("long")).alias("cross"),
        ).collect()[0]
        # 3 pairs per group: (base, exact), (base, near), (exact, near)
        assert a["cross"] == 0, f"{a['cross']} cross-group FALSE pairs"
        assert a["n_pairs"] == 3 * groups, (a["n_pairs"], 3 * groups)
        # real render→hash slab (full decode+DCT path, planted dups)
        m = 4_000
        src = F.when(F.col("id") % 100 == 1, F.col("id") - 1).otherwise(
            F.col("id")
        ).cast("string")
        slab = spark.range(m).select(
            F.col("id").alias("doc_id"),
            F.substring(F.md5(src), 1, 16).alias("page_text"),
        )
        rendered = ih.with_image_hash(
            ih.render_text_images(slab), "image", out="phash"
        ).select("doc_id", "phash")
        got = ih.phash_neardup_pairs(rendered, max_hamming=0, bands=4).count()
        assert got == m // 100, (got, m // 100)
        return {"hashes": n, "pairs": int(a["n_pairs"]),
                "rendered": m, "render_dup_pairs": got}

    def pq_ivfpq_dup_law():
        """PQ / IVF+PQ at 1M vectors: identical vectors must quantize
        to identical codes (and identical lists), and ADC retrieval
        must surface a planted duplicate at its original's tied score
        — the code-path laws behind semantic near-dup retrieval,
        exercised with real multi-partition encode/scan tasks."""
        from pdf2dataset_spark.operators import similarity as sim

        n = int(1_000_000 * mult)
        step = 100
        dim, m, ksub = 64, 8, 64
        # UNCLUSTERED noise: the retrieval law below needs ~unique codes
        # (code space 64^8 >> n). On a dense clustered corpus thousands
        # of vectors legitimately share one code and the deterministic
        # lowest-id tie-break ranks a high-id duplicate out of top-k —
        # that regime's guarantees (code identity, tied-max score) are
        # laws 1/3; exact retrieval is provable only here.
        noise = lambda a, b, j: (  # noqa: E731
            F.pmod(F.xxhash64(a, b, F.lit(j)), F.lit(2_000_001))
            / 1_000_000.0 - 1.0
        )
        vec = F.array(*[
            noise(F.col("vec_id"), F.lit(1), j).cast("double")
            for j in range(dim)
        ])
        base = spark.range(n).select(
            F.col("id").alias("vec_id")
        ).select("vec_id", vec.alias("embedding"))
        dups = base.filter(F.col("vec_id") % step == 0).select(
            (F.col("vec_id") + n).alias("vec_id"), "embedding"
        )
        corpus = base.unionByName(dups).persist()
        n_dups = corpus.count() - n

        cb = sim.pq_train(corpus, dim=dim, m=m, ksub=ksub, iters=3)
        codes = sim.pq_encode_fast(
            corpus, cb, dim=dim, m=m, ksub=ksub
        ).persist()
        total = codes.count()
        assert total == n + n_dups
        # law 1: duplicate rows carry byte-identical codes
        orig = codes.filter(F.col("vec_id") < n).select(
            F.col("vec_id").alias("o_id"), F.col("pq_code").alias("o_code")
        )
        mism = (
            codes.filter(F.col("vec_id") >= n)
            .select((F.col("vec_id") - n).alias("o_id"), "pq_code")
            .join(orig, "o_id")
            .filter(F.col("pq_code") != F.col("o_code"))
            .count()
        )
        assert mism == 0, f"{mism} duplicate code mismatches"

        # law 2: ADC retrieval surfaces each planted dup at the tied-max
        q = base.filter(
            F.col("vec_id") % (n // 20) == 0
        ).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        )
        nq = q.count()
        top = sim.pq_topk(
            codes, cb, q, dim=dim, m=m, ksub=ksub, k=10
        ).collect()
        # presence, not rank-1: ADC max-IP is not guaranteed at the
        # self code (a larger-norm codeword can out-score the argmin-L2
        # quantization), so the law is top-k membership
        found = sum(1 for r in top if r.vec_id == r.query_id + n)
        assert found == nq, f"pq dup retrieval {found}/{nq}"

        # law 3: IVF+PQ — same list, same residual code, retrieved
        cents = sim._ivf_centroids(corpus, 64, "vec_id", "embedding")
        idx, icb = sim.ivfpq_build(
            corpus, cents, dim=dim, m=m, ksub=ksub, iters=3
        )
        idx = idx.persist()
        iorig = idx.filter(F.col("vec_id") < n).select(
            F.col("vec_id").alias("o_id"),
            F.col("list_id").alias("o_list"),
            F.col("pq_code").alias("o_code"),
        )
        imism = (
            idx.filter(F.col("vec_id") >= n)
            .select(
                (F.col("vec_id") - n).alias("o_id"), "list_id", "pq_code"
            )
            .join(iorig, "o_id")
            .filter(
                (F.col("list_id") != F.col("o_list"))
                | (F.col("pq_code") != F.col("o_code"))
            )
            .count()
        )
        assert imism == 0, f"{imism} ivfpq list/code mismatches"
        itop = sim.ivfpq_topk(
            idx, cents, icb, q, dim=dim, m=m, ksub=ksub, nprobe=8, k=10
        ).collect()
        ifound = sum(1 for r in itop if r.vec_id == r.query_id + n)
        assert ifound == nq, f"ivfpq dup retrieval {ifound}/{nq}"
        corpus.unpersist()
        codes.unpersist()
        idx.unpersist()
        return {"vectors": total, "dups": n_dups, "queries": nq}

    # 17. f44 DSIR importance scoring at 3M docs / 12M tokens: the
    # planted three-class ordering law (target-exclusive vocabulary
    # > mixed > raw-exclusive, signs included) must hold EXACTLY,
    # and every doc sharing a token profile must land on the
    # IDENTICAL integer score — partial-aggregation or broadcast
    # bugs in either token pass would smear the class scores apart.
    # (The six planted words md5-hash to six distinct 2-hex buckets.)
    def dsir_planted_order():
        n = int(3_000_000 * mult)
        d = spark.range(n).select(
            F.col("id").alias("doc_id"),
            (F.col("id") % 3).alias("cls"),
            F.when(F.col("id") % 3 == 0, "en").otherwise("zz").alias(
                "lang"
            ),
        )
        txt = (
            F.when(F.col("cls") == 0, F.lit("alpha beta gamma alpha"))
            .when(F.col("cls") == 1, F.lit("alpha beta delta epsilon"))
            .otherwise(F.lit("delta epsilon zeta delta"))
        )
        docs = d.withColumn("text", txt)
        scores = mx.dsir_scores(docs, F.col("lang") == "en")
        agg = (
            scores.join(docs.select("doc_id", "cls"), "doc_id")
            .groupBy("cls")
            .agg(
                F.countDistinct("score").alias("nv"),
                F.min("score").alias("mn"),
                F.count(F.lit(1)).alias("n"),
            )
            .collect()
        )
        by = {r["cls"]: r for r in agg}
        assert sum(r["n"] for r in agg) == n
        for c in (0, 1, 2):
            assert by[c]["nv"] == 1, f"class {c} scores diverge"
        assert by[0]["mn"] > by[1]["mn"] > by[2]["mn"], (
            by[0]["mn"], by[1]["mn"], by[2]["mn"],
        )
        assert by[0]["mn"] > 0 > by[2]["mn"]
        return {"docs": n, "class_scores": [
            by[0]["mn"], by[1]["mn"], by[2]["mn"],
        ]}

    check("mixture_determinism_and_law", mixture_law)
    check("dsir_planted_order_3M", dsir_planted_order)
    check("lsh_exact_dup_collision", lsh_collision_law)
    check("ingest_dedup_cross_strategy_10M", ingest_dedup_cross_strategy)
    check("semdedup_two_sided_5M", semdedup_two_sided)
    check("shard_packing_cross_engine_10M", shard_packing_cross_engine)
    check("bpe_pairs_cross_engine_10M", bpe_pairs_cross_engine)
    check("imagehash_banding_law_600k", imagehash_banding_law)
    # 18. size-guarded broadcast fallback at 10M (round 7): the sql26
    # join shape through maybe_broadcast must produce IDENTICAL exact
    # integer aggregates with the hint applied (broadcast plan) and
    # with the guard refusing it (threshold -1 -> shuffle join) —
    # the 100x behavior of every swept tier_tpch query, exercised at
    # a scale the sf-level oracles never reach.
    def guarded_broadcast_fallback():
        from pdf2dataset_spark.queries._util import maybe_broadcast

        n = int(10_000_000 * mult)
        dims = 400_000
        fact = spark.range(n).select(
            (F.col("id") % dims).alias("k"),
            (F.xxhash64("id") % 1000).alias("v"),
        )
        dim = spark.range(dims).select(
            F.col("id").alias("k"),
            (F.col("id") * 7919 % 99001).alias("cost"),
        )

        def run():
            j = fact.join(maybe_broadcast(dim), "k")
            row = j.agg(
                F.count(F.lit(1)).alias("cnt"),
                F.sum(F.col("v") * F.col("cost")).alias("amt"),
            ).collect()[0]
            return row["cnt"], row["amt"]

        old_thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        hinted = run()
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            fallback = run()
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thr)
        assert hinted == fallback, (hinted, fallback)
        assert hinted[0] == n
        return {"rows": n, "dim_rows": dims, "total": int(hinted[1])}

    # 20. remove_boilerplate at 2M docs / 6M paragraphs: a planted
    #     header (all docs) and a per-doc-year footer (digit-stripped
    #     to ONE key) must vanish exactly; every unique body must
    #     survive byte-identical; empty-doc retention keeps counts.
    def boilerplate_law():
        n = int(2_000_000 * mult)
        # bodies must stay unique under the operator's DIGIT-STRIPPED
        # normalization: encode the id as letters (hex digits
        # translated g-p)
        letter_id = F.translate(
            F.hex(F.col("doc_id")), "0123456789", "ghijklmnop"
        )
        docs = spark.range(n).select(
            F.col("id").alias("doc_id"),
        ).select(
            "doc_id",
            F.concat(
                F.lit("Subscribe Now\n"),
                F.lit("body "), letter_id, F.lit(" unique"),
                F.lit("\nCopyright "),
                (F.lit(2000) + F.col("doc_id") % 25).cast("string"),
                F.lit(" Corp"),
            ).alias("text"),
        )
        out = dd.remove_boilerplate(docs, min_doc_frac=0.5)
        agg = out.select(
            "doc_id",
            "text",
            F.concat(F.lit("body "), letter_id, F.lit(" unique"))
            .alias("want"),
        ).agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum((F.col("text") == F.col("want")).cast("long"))
            .alias("exact"),
        ).collect()[0]
        assert agg["cnt"] == n and agg["exact"] == n, dict(agg.asDict())
        return {"docs": n, "paras": 3 * n}

    check("pq_ivfpq_dup_law_1M", pq_ivfpq_dup_law)
    check("guarded_broadcast_fallback_10M", guarded_broadcast_fallback)
    check("boilerplate_removal_law_2M", boilerplate_law)
    # the ranked frames persisted by checks 1/2/12 are no longer
    # needed once their actions finish — release so a long harness run
    # doesn't hold cached RDDs (and to exercise the cleanup path)
    rank.release_caches()

    ok = all(v["ok"] for v in results.values())
    print(json.dumps({"all_ok": ok, "checks": results}))
    spark.stop()
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
