"""Product-quantization ANN (SURVEY §2 F5 family, f5d): codebook
training, exact-vs-fast encode agreement, ADC scoring laws, and the
planted-duplicate retrieval guarantee (identical vectors quantize to
identical codes, so a duplicate always ties its original's score)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from pdf2dataset_spark.operators import similarity as sim

SF = "/root/testdata/sf0.001"
DIM = 64


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id", "embedding"
    )


def _queries(corpus, n=3):
    return corpus.filter(F.col("vec_id") < n).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )


def test_pq_encode_fast_agrees_with_exact(corpus):
    cb = sim.pq_codebooks(corpus, dim=DIM, m=4, ksub=8)
    exact = {
        (r.vec_id, r.sub_id): r.code_id
        for r in sim.pq_encode(corpus, cb, dim=DIM, m=4).collect()
    }
    fast = {}
    for r in sim.pq_encode_fast(
        corpus, cb, dim=DIM, m=4, ksub=8, normalize=False
    ).collect():
        for s, c in enumerate(r.pq_code):
            fast[(r.vec_id, s)] = c
    assert set(exact) == set(fast)
    agree = sum(exact[k] == fast[k] for k in exact) / len(exact)
    # identical argmin up to float near-ties between the sequential
    # fold and numpy's blocked distance
    assert agree >= 0.99, agree


def test_pq_topk_exact_matches_adc_definition(corpus):
    """The exact path's scores replay bitwise from its own assignment
    table with a pure-Python sequential fold (same IEEE double ops in
    the same order as the JVM fold), and its rank set is exactly the
    (score DESC, vec_id) top-5 of those scores."""
    m, ksub, dsub, k = 2, 4, 32, 5
    cb = sim.pq_codebooks(corpus, dim=DIM, m=m, ksub=ksub)
    q = _queries(corpus)
    out = sim.pq_topk_exact(corpus, cb, q, dim=DIM, m=m, k=k).collect()

    cvec = {(r.sub_id, r.code_id): r.code_vec for r in cb.collect()}
    assign = {
        (r.vec_id, r.sub_id): r.code_id
        for r in sim.pq_encode(corpus, cb, dim=DIM, m=m).collect()
    }
    qv = {r.query_id: r.query_vec for r in q.collect()}
    vec_ids = sorted({v for v, _ in assign})

    def fold_ip(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc += float(x) * float(y)
        return acc

    for qid, vec in qv.items():
        scores = {}
        for v in vec_ids:
            if v == qid:
                continue
            acc = 0.0
            for s in range(m):
                sub = vec[s * dsub : (s + 1) * dsub]
                acc += fold_ip(sub, cvec[(s, assign[(v, s)])])
            scores[v] = acc
        want = sorted(scores, key=lambda v: (-scores[v], v))[:k]
        mine = sorted(
            (r for r in out if r.query_id == qid), key=lambda r: r.rank
        )
        assert [r.vec_id for r in mine] == want
        for r in mine:
            assert r.approx_score == scores[r.vec_id]  # bitwise


def test_pq_topk_fast_matches_adc_definition(corpus):
    """The numpy path's output is exactly the top-5 of LUT-gather sums
    recomputed independently from its own packed codes."""
    m, ksub, dsub, k = 2, 4, 32, 5
    cb = sim.pq_codebooks(corpus, dim=DIM, m=m, ksub=ksub)
    q = _queries(corpus)
    codes_df = sim.pq_encode_fast(
        corpus, cb, dim=DIM, m=m, ksub=ksub, normalize=False
    )
    out = sim.pq_topk(
        codes_df, cb, q, dim=DIM, m=m, ksub=ksub, k=k, normalize=False
    ).collect()

    cmat = sim._codebook_matrix(cb, m, ksub, dsub)
    codes = {r.vec_id: np.frombuffer(r.pq_code, np.uint8) for r in codes_df.collect()}
    for r in q.collect():
        qm = np.array(r.query_vec, dtype=np.float64)
        lut = np.empty((m, ksub))
        for s in range(m):
            lut[s] = qm[s * dsub : (s + 1) * dsub] @ cmat[s].T
        scores = {
            v: lut[np.arange(m), c].sum()
            for v, c in codes.items()
            if v != r.query_id
        }
        want = sorted(scores, key=lambda v: (-scores[v], v))[:k]
        mine = sorted(
            (x for x in out if x.query_id == r.query_id),
            key=lambda x: x.rank,
        )
        assert [x.vec_id for x in mine] == want
        for x in mine:
            assert abs(x.approx_score - scores[x.vec_id]) < 1e-12


def test_pq_train_is_deterministic_and_improves_on_seeds(corpus):
    a = sorted(
        (r.sub_id, r.code_id, tuple(r.code_vec))
        for r in sim.pq_train(
            corpus, dim=DIM, m=4, ksub=8, iters=4, sample_rows=200
        ).collect()
    )
    b = sorted(
        (r.sub_id, r.code_id, tuple(r.code_vec))
        for r in sim.pq_train(
            corpus, dim=DIM, m=4, ksub=8, iters=4, sample_rows=200
        ).collect()
    )
    assert a == b  # pure function of (corpus, params)

    def sq_err(cb_df):
        cmat = sim._codebook_matrix(cb_df, 4, 8, DIM // 4)
        rows = corpus.orderBy("vec_id").limit(200).collect()
        x = np.array([r.embedding for r in rows], dtype=np.float64)
        x = x / sim._safe_norm(x)
        tot = 0.0
        for s in range(4):
            xs = x[:, s * 16 : (s + 1) * 16]
            d = (
                (xs * xs).sum(1)[:, None]
                - 2.0 * (xs @ cmat[s].T)
                + (cmat[s] * cmat[s]).sum(1)[None, :]
            )
            tot += np.maximum(d.min(1), 0.0).sum()
        return tot

    seeds = sim.pq_codebooks(corpus, dim=DIM, m=4, ksub=8)
    trained = sim.pq_train(
        corpus, dim=DIM, m=4, ksub=8, iters=4, sample_rows=200
    )
    assert sq_err(trained) <= sq_err(seeds)


def test_planted_duplicates_tie_their_originals(spark, corpus):
    """Identical vectors -> identical uint8 codes -> identical ADC
    scores: a planted exact duplicate must score exactly the max in its
    original's result and appear in a generous top-k."""
    dups = corpus.filter(F.col("vec_id") % 5 == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
    )
    full = corpus.unionByName(dups)
    cb = sim.pq_train(full, dim=DIM, m=8, ksub=16, iters=4, sample_rows=500)
    codes = sim.pq_encode_fast(full, cb, dim=DIM, m=8, ksub=16)
    by_id = {r.vec_id: r.pq_code for r in codes.collect()}
    for (i,) in dups.select("vec_id").collect():
        assert by_id[i] == by_id[i - 100000]

    q = corpus.filter(F.col("vec_id").isin(0, 5, 10)).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    top = sim.pq_topk(codes, cb, q, dim=DIM, m=8, ksub=16, k=10)
    rows = top.collect()
    for qid in (0, 5, 10):
        mine = [r for r in rows if r.query_id == qid]
        best = max(r.approx_score for r in mine)
        dup = [r for r in mine if r.vec_id == qid + 100000]
        assert dup, f"planted duplicate of {qid} missing from top-10"
        assert dup[0].approx_score == best


def test_pq_parameter_validation(corpus):
    with pytest.raises(ValueError, match="not divisible"):
        sim.pq_codebooks(corpus, dim=DIM, m=7)
    with pytest.raises(ValueError, match="uint8"):
        sim.pq_train(corpus, dim=DIM, m=2, ksub=512)
    with pytest.raises(ValueError, match="sample vectors"):
        sim.pq_train(corpus, dim=DIM, m=2, ksub=4, sample_rows=2)
    incomplete = sim.pq_codebooks(corpus, dim=DIM, m=2, ksub=4).filter(
        "code_id < 2"
    )
    with pytest.raises(ValueError, match="missing"):
        sim._codebook_matrix(incomplete, 2, 4, 32)


def test_pq_code_is_m_bytes(corpus):
    cb = sim.pq_codebooks(corpus, dim=DIM, m=8, ksub=4)
    codes = sim.pq_encode_fast(corpus, cb, dim=DIM, m=8, ksub=4)
    r = codes.first()
    assert len(r.pq_code) == 8  # m bytes per vector, 8x under fp32/8
    assert all(b < 4 for b in r.pq_code)


def test_ivfpq_duplicates_share_list_and_code(spark, corpus):
    """Exact duplicates assign to the same list and quantize to the
    same residual code, so IVF+PQ retrieval must surface them at the
    tied-max score."""
    dups = corpus.filter(F.col("vec_id") % 5 == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
    )
    full = corpus.unionByName(dups)
    cents = sim._ivf_centroids(full, 8, "vec_id", "embedding")
    idx, cb = sim.ivfpq_build(
        full, cents, dim=DIM, m=8, ksub=16, iters=3, sample_rows=500
    )
    rows = {r.vec_id: (r.list_id, r.pq_code) for r in idx.collect()}
    for (i,) in dups.select("vec_id").collect():
        assert rows[i] == rows[i - 100000]

    q = corpus.filter(F.col("vec_id").isin(0, 5, 10)).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    top = sim.ivfpq_topk(
        idx, cents, cb, q, dim=DIM, m=8, ksub=16, nprobe=2, k=10
    ).collect()
    for qid in (0, 5, 10):
        mine = [r for r in top if r.query_id == qid]
        dup = [r for r in mine if r.vec_id == qid + 100000]
        # the duplicate always surfaces; unlike plain PQ its score is
        # only tied-max WITHIN its list (another probed list's scalar
        # term can exceed it), so assert presence, not global max
        assert dup, f"planted duplicate of {qid} missing from top-10"


def test_ivfpq_scores_match_definition(spark, corpus):
    """ivfpq_topk's output replays from the collected index: probed
    lists are the nprobe largest q.centroid terms, and each score is
    the per-list scalar plus the m LUT gathers (same numpy ops)."""
    m, ksub, dsub, nprobe, k = 4, 8, 16, 2, 5
    cents = sim._ivf_centroids(corpus, 8, "vec_id", "embedding")
    idx_df, cb = sim.ivfpq_build(
        corpus, cents, dim=DIM, m=m, ksub=ksub, iters=3, sample_rows=500
    )
    q = _queries(corpus)
    out = sim.ivfpq_topk(
        idx_df, cents, cb, q, dim=DIM, m=m, ksub=ksub, nprobe=nprobe, k=k
    ).collect()

    crows = sorted(cents.collect(), key=lambda r: r.cent_id)
    c_ids = np.array([r.cent_id for r in crows])
    c_mat = np.array([r.cent_vec for r in crows], dtype=np.float64)
    c_norm = c_mat / sim._safe_norm(c_mat)
    cmat = sim._codebook_matrix(cb, m, ksub, dsub)
    index = {
        r.vec_id: (r.list_id, np.frombuffer(r.pq_code, np.uint8))
        for r in idx_df.collect()
    }
    for r in q.collect():
        qm = np.array(r.query_vec, dtype=np.float64)
        qm = qm / max(np.linalg.norm(qm), 1e-300)
        consts = qm @ c_norm.T
        probed = set(c_ids[np.argsort(-consts)[:nprobe]].tolist())
        lut = np.empty((m, ksub))
        for s in range(m):
            lut[s] = qm[s * dsub : (s + 1) * dsub] @ cmat[s].T
        scores = {}
        for v, (lid, codes) in index.items():
            if v == r.query_id or lid not in probed:
                continue
            lrow = int(np.where(c_ids == lid)[0][0])
            scores[v] = lut[np.arange(m), codes].sum() + consts[lrow]
        want = sorted(scores, key=lambda v: (-scores[v], v))[:k]
        mine = sorted(
            (x for x in out if x.query_id == r.query_id),
            key=lambda x: x.rank,
        )
        assert [x.vec_id for x in mine] == want
        for x in mine:
            assert abs(x.approx_score - scores[x.vec_id]) < 1e-12


def test_exact_rerank_matches_brute_on_full_candidates(spark, corpus):
    """Re-ranking ALL (query, vec) pairs must reproduce brute-force
    top-k exactly (same fold, same tie-break)."""
    q = _queries(corpus)
    all_pairs = corpus.selectExpr("vec_id").crossJoin(
        q.select("query_id")
    ).filter(F.col("vec_id") != F.col("query_id"))
    rer = sim.exact_rerank(all_pairs, corpus, q, k=5)
    brute = sim.topk_cosine(corpus, q, k=5)
    got = {(r.query_id, r.vec_id, r.rank) for r in rer.collect()}
    want = {(r.query_id, r.vec_id, r.rank) for r in brute.collect()}
    assert got == want


def test_pq_encode_packed_input_matches_array_input(corpus):
    """pq_encode_fast over a float64-packed binary column produces
    byte-identical codes to the array<float> path (the pack-at-ingest
    fast lane for corpus-sized scans)."""
    cb = sim.pq_codebooks(corpus, dim=DIM, m=8, ksub=8)
    packed = corpus.select(
        "vec_id",
        sim.pack_embedding("embedding", dtype="float64").alias("ebin"),
    )
    a = {
        r.vec_id: r.pq_code
        for r in sim.pq_encode_fast(
            corpus, cb, dim=DIM, m=8, ksub=8
        ).collect()
    }
    b = {
        r.vec_id: r.pq_code
        for r in sim.pq_encode_fast(
            packed, cb, dim=DIM, m=8, ksub=8,
            corpus_vec="ebin", packed_dtype="float64",
        ).collect()
    }
    assert a == b


class TestOPQ:
    """OPQ-style rotation (round 6): codebooks trained under the
    MSE-best of k candidate orthogonal transforms (identity always a
    candidate), stored as sub_id == -1 rows, applied transparently on
    the fast encode/search paths."""

    def test_candidates_are_orthogonal_and_deterministic(self):
        c1 = sim._opq_candidates(16, 4)
        c2 = sim._opq_candidates(16, 4)
        assert len(c1) == 4
        for a, b in zip(c1, c2):
            assert np.array_equal(a, b)  # deterministic
            assert np.allclose(a @ a.T, np.eye(16), atol=1e-10)
        assert np.array_equal(c1[0], np.eye(16))

    def test_rotation_never_worse_than_identity(self):
        # anisotropic sample: pairs of dims correlated ACROSS the
        # subspace split, the case plain PQ quantizes badly
        rng = np.random.default_rng(3)
        dim, m, ksub = 8, 4, 16
        z = rng.standard_normal((4096, dim // 2))
        x = np.concatenate([z, z * 0.9], axis=1)  # dim i ~ dim i+4
        _, _, mse_id = sim._train_rotated(x, dim, m, ksub, 5, 1)
        rot, _, mse_opq = sim._train_rotated(x, dim, m, ksub, 5, 6)
        assert mse_opq <= mse_id + 1e-12

    def test_rotation_rows_round_trip(self, spark, corpus):
        cb = sim.pq_train(
            corpus, dim=DIM, m=4, ksub=8, iters=2, opq_seeds=3
        )
        r = sim._pq_rotation(cb, DIM)
        if r is not None:  # identity winner stores no rows
            assert np.allclose(r @ r.T, np.eye(DIM), atol=1e-10)
        # the matrix extractor skips rotation rows
        cm = sim._codebook_matrix(cb, 4, 8, DIM // 4)
        assert cm.shape == (4, 8, DIM // 4)

    def test_pq_encode_rejects_rotated_codebooks(self, corpus):
        cb = sim.pq_train(
            corpus, dim=DIM, m=4, ksub=8, iters=2, opq_seeds=4
        )
        if sim._pq_rotation(cb, DIM) is None:
            pytest.skip("identity won on this sample — nothing to reject")
        with pytest.raises(ValueError, match="OPQ"):
            sim.pq_encode(corpus, cb, dim=DIM, m=4)

    def test_duplicate_retrieval_law_survives_rotation(self, spark, corpus):
        # identical vectors -> identical rotated residuals -> identical
        # codes -> a planted duplicate always ties its original
        dup = corpus.filter(F.col("vec_id") < 4).select(
            (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
        )
        both = corpus.unionByName(dup)
        cents = sim.ivf_centroids_kmeans(both, n_centroids=4, iters=2)
        idx, cb = sim.ivfpq_build(
            both, cents, dim=DIM, m=4, ksub=8, iters=3, opq_seeds=4
        )
        q = corpus.filter(F.col("vec_id") < 4).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        )
        top = sim.ivfpq_topk(
            idx, cents, cb, q, dim=DIM, m=4, ksub=8, nprobe=4, k=5,
            exclude_self=True,
        ).collect()
        found = {r.query_id for r in top if r.vec_id == r.query_id + 100000}
        assert found == {0, 1, 2, 3}
        # and with plain PQ codes through pq_topk as well
        pcb = sim.pq_train(both, dim=DIM, m=4, ksub=8, iters=3, opq_seeds=4)
        codes = sim.pq_encode_fast(both, pcb, dim=DIM, m=4, ksub=8)
        ptop = sim.pq_topk(
            codes, pcb, q, dim=DIM, m=4, ksub=8, k=5, exclude_self=True
        ).collect()
        pfound = {r.query_id for r in ptop if r.vec_id == r.query_id + 100000}
        assert pfound == {0, 1, 2, 3}
