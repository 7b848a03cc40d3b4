"""pyspark.ml LSH variants (SURVEY §2 F2/F5): MinHashLSH for Jaccard
and BucketedRandomProjectionLSH for Euclidean — the stock Spark ML
implementations, complementing the DataFrame-native operators."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

SF = "/root/testdata/sf0.001"


def test_minhash_lsh_ml_similarity_join(spark):
    from pyspark.ml.feature import CountVectorizer, MinHashLSH

    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", F.split("text", " ").alias("tokens"))
        .limit(80)
    )
    near = docs.select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.slice("tokens", 1, F.size("tokens") - 1).alias("tokens"),
    )
    corpus = docs.unionByName(near)
    cv = CountVectorizer(inputCol="tokens", outputCol="features", binary=True)
    model = cv.fit(corpus)
    vecs = model.transform(corpus)
    mh = MinHashLSH(inputCol="features", outputCol="hashes", numHashTables=8, seed=42)
    mh_model = mh.fit(vecs)
    pairs = mh_model.approxSimilarityJoin(vecs, vecs, 0.3, distCol="jaccard_dist")
    found = {
        (r.datasetA.doc_id, r.datasetB.doc_id)
        for r in pairs.collect()
        if r.datasetA.doc_id < r.datasetB.doc_id
    }
    planted = {(i, i + 1000000) for (i,) in docs.select("doc_id").collect()}
    recall = len(found & planted) / len(planted)
    assert recall >= 0.9, f"ml MinHashLSH recall: {recall}"


def test_brp_lsh_ml_nearest_neighbors(spark):
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    emb = (
        spark.read.parquet(f"{SF}/embeddings.parquet")
        .select("vec_id", array_to_vector("embedding").alias("features"))
    )
    brp = BucketedRandomProjectionLSH(
        inputCol="features", outputCol="hashes", bucketLength=2.0,
        numHashTables=4, seed=42,
    )
    model = brp.fit(emb)
    key = emb.filter(F.col("vec_id") == 0).collect()[0].features
    neighbors = model.approxNearestNeighbors(emb, key, 5)
    ids = [r.vec_id for r in neighbors.collect()]
    assert len(ids) == 5
    assert ids[0] == 0  # the vector itself is its own nearest neighbor


def test_collect_set_array_form(spark):
    """c6 serializes to CSV for the oracle; the array form itself."""
    n = spark.read.parquet(f"{SF}/nation.parquet")
    row = (
        n.groupBy("n_regionkey")
        .agg(F.sort_array(F.collect_set("n_name")).alias("nations"))
        .filter(F.col("n_regionkey") == 0)
        .collect()[0]
    )
    assert isinstance(row.nations, list) and len(row.nations) >= 1
    assert row.nations == sorted(row.nations)


def test_approx_percentile_close_to_exact(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    row = li.agg(
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias("a"),
        F.percentile("l_extendedprice", 0.5).alias("e"),
    ).collect()[0]
    assert abs(row.a - row.e) / row.e < 0.02


def test_hll_sketch_union_accuracy(spark):
    """Sketches built per group must union to a near-exact global
    estimate (the mergeability property that matters at scale)."""
    import pyspark.sql.functions as F

    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    est = (
        li.groupBy("l_returnflag")
        .agg(F.hll_sketch_agg("l_partkey").alias("sk"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
        .collect()[0]
        .est
    )
    exact = li.select("l_partkey").distinct().count()
    assert abs(est - exact) / exact < 0.05


def test_topk_cosine_fast_matches_exact(spark):
    from pdf2dataset_spark.operators import similarity as sim
    from pyspark.sql import functions as F

    corpus = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    queries = corpus.limit(8).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = sim.topk_cosine(corpus, queries, k=10)
    fast = sim.topk_cosine_fast(corpus, queries, k=10)
    e = {(r.query_id, r.vec_id) for r in exact.collect()}
    f = {(r.query_id, r.vec_id) for r in fast.collect()}
    # identical up to float near-ties; demand >= 95% agreement
    assert len(e & f) / len(e) >= 0.95, (len(e & f), len(e))


def test_topk_cosine_packed_matches_exact(spark):
    from pdf2dataset_spark.operators import similarity as sim
    from pyspark.sql import functions as F

    corpus = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    dim = len(corpus.select("embedding").first()[0])
    queries = corpus.limit(8).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    packed = corpus.select(
        "vec_id", sim.pack_embedding("embedding").alias("embedding_bin")
    )
    exact = sim.topk_cosine(corpus, queries, k=10)
    fast = sim.topk_cosine_packed(packed, queries, dim=dim, k=10)
    e = {(r.query_id, r.vec_id) for r in exact.collect()}
    f = {(r.query_id, r.vec_id) for r in fast.collect()}
    # fp32 scoring: allow near-tie divergence, demand >= 90% agreement
    assert len(e & f) / len(e) >= 0.90, (len(e & f), len(e))


def test_ivf_assign_fast_matches_exact(spark):
    """The numpy matmul build phase must assign (essentially) the
    same inverted lists as the JVM-fold exact variant."""
    from pdf2dataset_spark.operators import similarity as sim

    e = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    exact = {
        r["vec_id"]: r["list_id"] for r in sim.ivf_assign(e, 16).collect()
    }
    fast = {
        r["vec_id"]: r["list_id"]
        for r in sim.ivf_assign_fast(e, 16).collect()
    }
    assert fast.keys() == exact.keys()
    agree = sum(1 for k in exact if exact[k] == fast[k]) / len(exact)
    assert agree >= 0.999, agree  # float near-ties only


def test_ann_query_side_collect_is_guarded(spark):
    """An oversized query side must fail fast with a remediation hint
    — never OOM the driver. The guard collects at most cap+1 rows."""
    import pytest
    from pdf2dataset_spark.operators import similarity as sim
    from pyspark.sql import functions as F

    corpus = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    queries = corpus.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    with pytest.raises(ValueError, match="max_query_rows"):
        sim.topk_cosine_fast(corpus, queries, k=5, max_query_rows=10)
    with pytest.raises(ValueError, match="max_query_rows"):
        sim.topk_cosine_packed(
            corpus.select(
                "vec_id", sim.pack_embedding("embedding").alias("embedding_bin")
            ),
            queries,
            dim=4,
            k=5,
            max_query_rows=10,
        )


def test_ivf_kmeans_tightens_clusters_and_keeps_plan(spark):
    """ivf_centroids_kmeans must (a) keep the (cent_id, cent_vec)
    contract so downstream ivf_assign plans are unchanged, (b) raise
    mean vector-to-assigned-centroid cosine vs the first-C-by-id seed
    on real embeddings, and (c) preserve every doc in the assignment."""
    import numpy as np

    from pdf2dataset_spark.operators import similarity as sim

    e = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    n = e.count()

    def mean_sim(cents_df):
        assigned = sim.ivf_assign_fast(e, 16, centroids=cents_df)
        cmap = {
            r["cent_id"]: np.array(r["cent_vec"], dtype=np.float64)
            for r in cents_df.collect()
        }
        for k, v in cmap.items():
            cmap[k] = v / (np.linalg.norm(v) or 1.0)
        rows = assigned.collect()
        assert len(rows) == n
        sims = []
        for r in rows:
            v = np.array(r["embedding"], dtype=np.float64)
            v = v / (np.linalg.norm(v) or 1.0)
            sims.append(float(v @ cmap[r["list_id"]]))
        return sum(sims) / len(sims)

    seed = sim._ivf_centroids(e, 16, "vec_id", "embedding")
    seed_named = seed.selectExpr("cent_id", "cent_vec")
    refined = sim.ivf_centroids_kmeans(e, 16, iters=3)
    assert refined.columns == ["cent_id", "cent_vec"]
    assert refined.count() == 16

    base, better = mean_sim(seed_named), mean_sim(refined)
    assert better > base, (base, better)

    # plan identity: same physical shape feeding _ivf_assign
    from pdf2dataset_spark.plans.audit import explain_string

    p_seed = explain_string(sim.ivf_assign(e, 16))
    p_ref = explain_string(sim.ivf_assign(e, 16, centroids=refined))
    for marker in ("BroadcastNestedLoopJoin", "Window"):
        assert (marker in p_seed) == (marker in p_ref), marker


def test_ivf_kmeans_is_deterministic(spark):
    """Same corpus, same iters -> bitwise-identical centroids (fixed
    seed pick, fixed iteration count, ordered partial combine)."""
    from pdf2dataset_spark.operators import similarity as sim

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    a = sim.ivf_centroids_kmeans(e, 8, iters=2).collect()
    b = sim.ivf_centroids_kmeans(e, 8, iters=2).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
