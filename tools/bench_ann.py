"""ANN similarity-search benchmark: brute force vs IVF at scale.

Synthesizes an n-vector, 64-dim clustered corpus entirely JVM-side
(hash-derived cluster centers + per-vector noise, no RNG, fully
deterministic), then measures:

  brute  — `topk_cosine`: every query scored against every corpus row
  build  — `ivf_assign`: one-time inverted-list construction
           (query-independent; amortized in production)
  query  — `ivf_topk` over the prebuilt lists: scores only
           nprobe/n_centroids of the corpus per query
  recall — |IVF top-k ∩ brute top-k| / k averaged over queries

Prints one JSON line. Usage: python tools/bench_ann.py [n_vectors]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from pdf2dataset_spark.operators import similarity as sim  # noqa: E402
from pdf2dataset_spark.session import get_spark  # noqa: E402

DIM, N_CLUSTERS, N_QUERIES, K = 64, 64, 20, 10
N_CENTROIDS, NPROBE = 64, 8


def _unit_noise(seed_a, seed_b, j):
    """Deterministic pseudo-uniform in [-1, 1) from hashes."""
    return (
        F.pmod(F.xxhash64(seed_a, seed_b, F.lit(j)), F.lit(2_000_001))
        / 1_000_000.0
        - 1.0
    )


def synth_corpus(spark, n: int):
    """Clustered vectors: 90% cluster center + 10% noise, so nearest
    neighbors are intra-cluster and IVF has real structure to find."""
    df = spark.range(n).select(F.col("id").alias("vec_id"))
    cluster = F.pmod(F.col("vec_id"), F.lit(N_CLUSTERS))
    vec = F.array(
        *[
            (
                _unit_noise(cluster, F.lit(-1), j) * 0.9
                + _unit_noise(F.col("vec_id"), F.lit(1), j) * 0.1
            ).cast("double")
            for j in range(DIM)
        ]
    )
    return df.select("vec_id", vec.alias("embedding"))


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    spark = get_spark("pdf2dataset-spark-ann-bench")
    spark.sparkContext.setLogLevel("ERROR")

    corpus = synth_corpus(spark, n).persist()
    corpus.count()
    queries = (
        corpus.filter(F.col("vec_id") % (n // N_QUERIES) == 0)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        )
        .persist()
    )
    nq = queries.count()

    t0 = time.perf_counter()
    brute = sim.topk_cosine(corpus, queries, k=K).persist()
    brute.count()
    brute_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    fast = sim.topk_cosine_fast(corpus, queries, k=K).persist()
    fast.count()
    fast_s = time.perf_counter() - t0
    fast_agree = (
        brute.select("query_id", "vec_id")
        .intersect(fast.select("query_id", "vec_id"))
        .count()
        / (nq * K)
    )

    t0 = time.perf_counter()
    packed = corpus.select(
        "vec_id", sim.pack_embedding("embedding").alias("embedding_bin")
    ).persist()
    packed.count()
    pack_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    pk = sim.topk_cosine_packed(packed, queries, dim=DIM, k=K).persist()
    pk.count()
    packed_s = time.perf_counter() - t0
    packed_agree = (
        brute.select("query_id", "vec_id")
        .intersect(pk.select("query_id", "vec_id"))
        .count()
        / (nq * K)
    )

    # pack-at-INGEST path: the packed column is written to storage once
    # (maintenance.write_packed_embeddings) and queries read it back —
    # the steady-state production shape, where the per-session pack
    # cost above disappears entirely.
    import shutil
    import tempfile

    from pdf2dataset_spark.operators import maintenance as mt

    store = tempfile.mkdtemp(prefix="ann_packed_")
    shutil.rmtree(store)
    t0 = time.perf_counter()
    meta = mt.write_packed_embeddings(
        corpus.select("vec_id", "embedding"), store, dim=DIM
    )
    ingest_s = time.perf_counter() - t0
    stored, meta = mt.read_packed_embeddings(spark, store)
    t0 = time.perf_counter()
    spk = sim.topk_cosine_packed(
        stored, queries, dim=meta["dim"], k=K,
        corpus_vec=meta["packed_col"], dtype=meta["dtype"],
    ).persist()
    spk.count()
    stored_packed_s = time.perf_counter() - t0
    stored_agree = (
        brute.select("query_id", "vec_id")
        .intersect(spk.select("query_id", "vec_id"))
        .count()
        / (nq * K)
    )
    shutil.rmtree(store, ignore_errors=True)

    # ------------------------------------------------------------------
    # PQ / IVF+PQ — graded on PARTNER RETRIEVAL, not brute agreement.
    # This corpus packs ~n/64 vectors within ~0.005 cosine of each other,
    # so intra-cluster margins (~0.0014) sit far below any 8-16 byte
    # quantizer's distortion: exact-rank agreement is structurally ~0 and
    # measures the corpus, not the operator. The realistic compressed-ANN
    # task is near-duplicate retrieval: probe queries are perturbed copies
    # of corpus vectors (margin >> distortion) and the metric is whether
    # the source partner is retrieved — the semantic-dedup workload.
    # ------------------------------------------------------------------
    PQ_M, PQ_KSUB = 16, 256
    # Re-rank shortlist sized to the PROBED-REGION DENSITY, not a
    # constant: the round-6 miss diagnosis at 1M showed every probe's
    # partner list probed (probe recall 1.0) but partner ADC ranks up
    # to ~1800 among the ~125k near-identical probed candidates — a
    # fixed 1000 shortlist truncated exactly those. 2% of the probed
    # candidate count keeps rerank cost a constant FRACTION of the ADC
    # scan (corpus-size-independent per probed row) and covers the
    # observed rank tail with ~1.4x margin.
    SHORTLIST = max(1000, (n * NPROBE // N_CENTROIDS) // 50)
    # OPQ random-rotation search (sim.pq_train/ivfpq_build opq_seeds=)
    # was MEASURED here and stays OFF for this corpus: it reduces
    # training-sample MSE (its selection metric) but DEGRADED partner
    # retrieval on clustered data (plain-PQ rerank 1.0 -> 0.85 at
    # 100k) — subspace mixing destroys the cluster-aligned code
    # structure retrieval relies on. The option remains for genuinely
    # anisotropic corpora, with its laws pinned in tests/test_pq.py.
    OPQ_SEEDS = 0
    probe_pert = F.array(
        *[
            (
                F.col("embedding")[j]
                + _unit_noise(F.col("vec_id"), F.lit(7), j) * 0.01
            ).cast("double")
            for j in range(DIM)
        ]
    )
    probes = (
        corpus.filter(F.col("vec_id") % (n // N_QUERIES) == 0)
        .select(F.col("vec_id").alias("query_id"), probe_pert.alias("query_vec"))
        .persist()
    )
    n_probes = probes.count()

    def partner_rate(df, at_rank=None):
        rows = df.collect()
        ok = {
            r.query_id
            for r in rows
            if r.vec_id == r.query_id
            and (at_rank is None or r.rank <= at_rank)
        }
        return len(ok) / n_probes

    # all corpus-sized PQ passes read the PACKED column (one
    # frombuffer per Arrow batch instead of ~20 us/row of list-object
    # conversion - the pack-at-ingest dividend)
    t0 = time.perf_counter()
    pq_cb = sim.pq_train(
        packed, dim=DIM, m=PQ_M, ksub=PQ_KSUB, iters=4, sample_rows=65_536,
        corpus_vec="embedding_bin", packed_dtype="float32",
        opq_seeds=OPQ_SEEDS,
    ).persist()
    pq_cb.count()
    pq_train_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    pq_codes = sim.pq_encode_fast(
        packed, pq_cb, dim=DIM, m=PQ_M, ksub=PQ_KSUB,
        corpus_vec="embedding_bin", packed_dtype="float32",
    ).persist()
    pq_codes.count()
    pq_encode_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    pq = sim.pq_topk(
        pq_codes, pq_cb, probes, dim=DIM, m=PQ_M, ksub=PQ_KSUB, k=K,
        exclude_self=False,
    ).persist()
    pq.count()
    pq_query_s = time.perf_counter() - t0
    pq_partner = partner_rate(pq)

    t0 = time.perf_counter()
    pq_short = sim.pq_topk(
        pq_codes, pq_cb, probes, dim=DIM, m=PQ_M, ksub=PQ_KSUB, k=SHORTLIST,
        exclude_self=False,
    )
    pq_rer = sim.exact_rerank(pq_short, corpus, probes, k=K).persist()
    pq_rer.count()
    pq_rerank_s = time.perf_counter() - t0
    pq_rerank_partner = partner_rate(pq_rer, at_rank=1)

    t0 = time.perf_counter()
    ivfpq_cents = sim.ivf_centroids_kmeans(
        corpus, n_centroids=N_CENTROIDS, iters=2
    )
    ivfpq_idx, ivfpq_cb = sim.ivfpq_build(
        packed, ivfpq_cents, dim=DIM, m=PQ_M, ksub=PQ_KSUB, iters=4,
        corpus_vec="embedding_bin", packed_dtype="float32",
        opq_seeds=OPQ_SEEDS,
    )
    ivfpq_idx = ivfpq_idx.persist()
    ivfpq_idx.count()
    ivfpq_build_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    ivfpq = sim.ivfpq_topk(
        ivfpq_idx, ivfpq_cents, ivfpq_cb, probes,
        dim=DIM, m=PQ_M, ksub=PQ_KSUB, nprobe=NPROBE, k=K,
        exclude_self=False,
    ).persist()
    ivfpq.count()
    ivfpq_query_s = time.perf_counter() - t0
    ivfpq_partner = partner_rate(ivfpq)

    t0 = time.perf_counter()
    ivfpq_short = sim.ivfpq_topk(
        ivfpq_idx, ivfpq_cents, ivfpq_cb, probes,
        dim=DIM, m=PQ_M, ksub=PQ_KSUB, nprobe=NPROBE, k=SHORTLIST,
        exclude_self=False,
    )
    ivfpq_rer = sim.exact_rerank(ivfpq_short, corpus, probes, k=K).persist()
    ivfpq_rer.count()
    ivfpq_rerank_s = time.perf_counter() - t0
    ivfpq_rerank_partner = partner_rate(ivfpq_rer, at_rank=1)

    t0 = time.perf_counter()
    assigned = sim.ivf_assign_fast(corpus, n_centroids=N_CENTROIDS).persist()
    assigned.count()
    build_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    ivf = sim.ivf_topk(
        corpus,
        queries,
        n_centroids=N_CENTROIDS,
        nprobe=NPROBE,
        k=K,
        assigned=assigned,
    ).persist()
    ivf.count()
    query_s = time.perf_counter() - t0

    hits = brute.select("query_id", "vec_id").intersect(
        ivf.select("query_id", "vec_id")
    )
    recall = hits.count() / (nq * K)

    print(
        json.dumps(
            {
                "n_vectors": n,
                "dim": DIM,
                "n_queries": nq,
                "k": K,
                "n_centroids": N_CENTROIDS,
                "nprobe": NPROBE,
                "brute_s": round(brute_s, 2),
                "brute_fast_s": round(fast_s, 2),
                "fast_speedup_x": round(brute_s / fast_s, 1),
                "fast_agreement": round(fast_agree, 3),
                "pack_build_s": round(pack_s, 2),
                "packed_query_s": round(packed_s, 2),
                "packed_speedup_x": round(brute_s / packed_s, 1),
                "packed_agreement": round(packed_agree, 3),
                "packed_ingest_s": round(ingest_s, 2),
                "stored_packed_query_s": round(stored_packed_s, 2),
                "stored_packed_speedup_x": round(brute_s / stored_packed_s, 1),
                "stored_packed_agreement": round(stored_agree, 3),
                "pq_m": PQ_M,
                "pq_ksub": PQ_KSUB,
                "pq_code_bytes_per_vec": PQ_M,
                "pq_shortlist": SHORTLIST,
                "opq_seeds": OPQ_SEEDS,
                "pq_train_s": round(pq_train_s, 2),
                "pq_encode_s": round(pq_encode_s, 2),
                "pq_query_s": round(pq_query_s, 2),
                "pq_speedup_x": round(brute_s / pq_query_s, 1),
                "pq_partner_at_k": round(pq_partner, 3),
                "pq_rerank_s": round(pq_rerank_s, 2),
                "pq_rerank_partner_at_1": round(pq_rerank_partner, 3),
                "ivfpq_build_s": round(ivfpq_build_s, 2),
                "ivfpq_query_s": round(ivfpq_query_s, 2),
                "ivfpq_speedup_x": round(brute_s / ivfpq_query_s, 1),
                "ivfpq_partner_at_k": round(ivfpq_partner, 3),
                "ivfpq_rerank_s": round(ivfpq_rerank_s, 2),
                "ivfpq_rerank_partner_at_1": round(ivfpq_rerank_partner, 3),
                "ivf_build_s": round(build_s, 2),
                "ivf_query_s": round(query_s, 2),
                "ivf_speedup_x": round(brute_s / query_s, 1),
                "recall_at_k": round(recall, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
