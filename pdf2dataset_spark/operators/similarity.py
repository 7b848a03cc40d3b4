"""Similarity search over embedding columns (tier F).

- `cosine`: JVM-side cosine via zip_with + sequential aggregate —
  verified bitwise-identical to DuckDB's list arithmetic, so results
  are oracle-checkable.
- `topk_cosine`: brute-force kNN — queries broadcast against the
  corpus, ranked per query. The corpus is never shuffled: at 100 TB
  the cost is one scan × |queries|, embarrassingly parallel.
- `lsh_bucket_topk`: random-hyperplane LSH (sign-bit bucketing with
  hyperplanes derived deterministically from a seed) — the scale
  path: candidate set shrinks ~2^planes, then exact cosine re-ranks.
- `ivf_topk`: IVF-style coarse quantization: corpus assigned to the
  nearest of C deterministic centroids; queries probe `nprobe` lists.

pyspark.ml's BucketedRandomProjectionLSH / MinHashLSH cover the
Euclidean/Jaccard variants (see tests); these operators keep the
DataFrame-native plan visible to Catalyst.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


#: Hard cap on the query-side rows the numpy scale paths will pull to
#: the driver. The closure-capture design is only valid for a small
#: query batch; beyond this, use `topk_cosine` / `lsh_bucket_topk` /
#: `ivf_topk` whose probe side stays a DataFrame.
MAX_QUERY_ROWS = 65_536


def _safe_norm(m: np.ndarray) -> np.ndarray:
    """Row L2 norms with zeros clamped to 1, so zero vectors divide to
    themselves instead of NaN (which would silently argmax to index 0)."""
    n = np.linalg.norm(m, axis=1, keepdims=True)
    return np.where(n == 0.0, 1.0, n)


def _collect_query_side(
    queries: DataFrame, query_id: str, query_vec: str, max_query_rows: int
) -> list:
    """Guarded driver collect of the ANN query side.

    Collects at most ``max_query_rows + 1`` rows (via limit, so an
    oversized query side costs one extra row — never an OOM) and fails
    fast with a remediation hint when the cap is exceeded."""
    rows = (
        queries.select(query_id, query_vec).limit(max_query_rows + 1).collect()
    )
    if len(rows) > max_query_rows:
        raise ValueError(
            f"query side exceeds max_query_rows={max_query_rows}; "
            "the numpy closure-capture path is for small query batches — "
            "use topk_cosine / lsh_bucket_topk / ivf_topk (DataFrame probe "
            "side) or raise max_query_rows explicitly"
        )
    return rows


def dot(a: Column, b: Column) -> Column:
    """Sequential dot product. Elements are cast to double BEFORE the
    multiply so the arithmetic is pure float64 — bitwise-reproducible
    against DuckDB's list arithmetic (float32 multiplies would round
    differently per engine)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def topk_cosine(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "query_vec",
    exclude_self: bool = True,
) -> DataFrame:
    """Brute-force top-k cosine neighbors per query vector (F4).

    Queries are broadcast (small side by construction); the per-query
    ranking uses (similarity DESC, corpus_id) so ties are
    deterministic.
    """
    q = queries.select(F.col(query_id), F.col(query_vec))
    joined = corpus.select(F.col(corpus_id), F.col(corpus_vec)).crossJoin(
        F.broadcast(q)
    )
    if exclude_self:
        joined = joined.filter(F.col(corpus_id) != F.col(query_id))
    sim = cosine(F.col(corpus_vec), F.col(query_vec)).alias("cos_sim")
    w = Window.partitionBy(query_id).orderBy(
        F.col("cos_sim").desc(), F.col(corpus_id)
    )
    return (
        joined.select(query_id, corpus_id, sim)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _hyperplanes(dim: int, planes: int, seed: int) -> list[list[float]]:
    rng = np.random.RandomState(seed)
    return rng.standard_normal((planes, dim)).tolist()


def lsh_bucket(vec: Column, dim: int, planes: int = 8, seed: int = 42) -> Column:
    """Sign-bit bucket id from `planes` fixed random hyperplanes.

    The plane loop unrolls in Python (shift amounts must be literal
    ints in Spark), producing one flat JVM expression per plane.
    """
    hps = _hyperplanes(dim, planes, seed)
    bucket = F.lit(0).cast("long")
    for p in range(planes):
        proj = F.aggregate(
            F.zip_with(
                vec, F.lit(hps[p]), lambda x, w: x.cast("double") * w
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bit = F.when(proj >= 0, F.lit(1 << p).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        bucket = bucket + bit
    return bucket


def lsh_bucket_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    planes: int = 8,
    tables: int = 4,
    seed: int = 42,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "query_vec",
) -> DataFrame:
    """Approximate top-k: candidates share the query's bucket in ANY
    of `tables` independent hash tables (standard LSH forest), then
    exact cosine re-ranks (F5 scale path).

    Recall ≈ 1 − (1 − p^planes)^tables where p = 1 − θ/π: tune
    `planes` (bucket size ↓) against `tables` (recall ↑, cost ↑).
    Each table is one column + one equi-join — at 100 TB the probe
    side is broadcast and the corpus is scanned once with all table
    buckets computed in a single projection.
    """
    cb = corpus.select(
        F.col(corpus_id),
        F.col(corpus_vec),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(t).alias("tbl"),
                        lsh_bucket(
                            F.col(corpus_vec), dim, planes, seed + 1000 * t
                        ).alias("bkt"),
                    )
                    for t in range(tables)
                ]
            )
        ).alias("tb"),
    ).select(corpus_id, corpus_vec, "tb.tbl", "tb.bkt")
    qb = queries.select(
        F.col(query_id),
        F.col(query_vec),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(t).alias("tbl"),
                        lsh_bucket(
                            F.col(query_vec), dim, planes, seed + 1000 * t
                        ).alias("bkt"),
                    )
                    for t in range(tables)
                ]
            )
        ).alias("tb"),
    ).select(query_id, query_vec, "tb.tbl", "tb.bkt")
    joined = (
        cb.join(F.broadcast(qb), ["tbl", "bkt"])
        .filter(F.col(corpus_id) != F.col(query_id))
        .select(corpus_id, corpus_vec, query_id, query_vec)
        .distinct()
    )
    sim = cosine(F.col(corpus_vec), F.col(query_vec)).alias("cos_sim")
    w = Window.partitionBy(query_id).orderBy(F.col("cos_sim").desc(), F.col(corpus_id))
    return (
        joined.select(query_id, corpus_id, sim)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _ivf_centroids(
    corpus: DataFrame, n_centroids: int, corpus_id: str, corpus_vec: str
) -> DataFrame:
    """First `n_centroids` corpus vectors by id — deterministic coarse
    centroids. A production build would k-means these (see
    `ivf_centroids_kmeans`); every plan downstream is identical.

    `orderBy(...).limit(n)` plans as TakeOrderedAndProject: each
    partition keeps its local top-n and only C rows converge on the
    driver — no global sort, no single-partition window, safe at any
    corpus size (the previous unpartitioned `row_number` window moved
    the whole corpus through one partition)."""
    return corpus.select(
        F.col(corpus_id).alias("cent_id"), F.col(corpus_vec).alias("cent_vec")
    ).orderBy("cent_id").limit(n_centroids)


def ivf_centroids_kmeans(
    corpus: DataFrame,
    n_centroids: int = 16,
    iters: int = 3,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
) -> DataFrame:
    """Refined IVF centroids: spherical k-means (Lloyd) seeded with the
    deterministic first-C-by-id pick. Output schema matches
    `_ivf_centroids` (cent_id, cent_vec), so every downstream plan —
    `ivf_assign`/`ivf_topk` with `centroids=` — is identical; only the
    centroid VALUES improve (tighter lists → better recall at the same
    nprobe).

    Scale shape per iteration: one `mapInPandas` pass emits PARTIAL
    per-centroid sums (≤ C rows per Arrow batch — never the corpus),
    which reduce driver-side into new means. The corpus is scanned
    `iters` times but never shuffled; the driver holds only C×dim
    floats. Deterministic: fixed seed pick, fixed iteration count,
    float64 partial sums combined in batch order via a final sort.
    Empty clusters keep their previous centroid."""
    seed_rows = (
        _ivf_centroids(corpus, n_centroids, corpus_id, corpus_vec)
        .orderBy("cent_id")
        .collect()
    )
    c_mat = np.array([r[1] for r in seed_rows], dtype=np.float64)
    c_mat = c_mat / _safe_norm(c_mat)
    spark = corpus.sparkSession
    dim = c_mat.shape[1]
    vecs = corpus.select(corpus_vec)

    for _ in range(iters):
        bc = spark.sparkContext.broadcast(c_mat)

        def partials(batches):
            import pandas as pd

            cm = bc.value
            for pdf in batches:
                if not len(pdf):
                    continue
                v = np.array(list(pdf[corpus_vec]), dtype=np.float64)
                vn = v / _safe_norm(v)
                arg = np.argmax(vn @ cm.T, axis=1)
                sums = np.zeros_like(cm)
                np.add.at(sums, arg, vn)
                counts = np.bincount(arg, minlength=len(cm))
                nz = np.flatnonzero(counts)
                yield pd.DataFrame(
                    {
                        "cidx": nz,
                        "psum": [sums[i].tolist() for i in nz],
                        "pcnt": counts[nz],
                    }
                )

        rows = vecs.mapInPandas(
            partials, "cidx int, psum array<double>, pcnt long"
        ).collect()
        sums = np.zeros_like(c_mat)
        counts = np.zeros(len(c_mat), dtype=np.int64)
        for r in sorted(rows, key=lambda r: r["cidx"]):
            sums[r["cidx"]] += np.array(r["psum"])
            counts[r["cidx"]] += r["pcnt"]
        nonempty = counts > 0
        new = c_mat.copy()
        new[nonempty] = sums[nonempty] / counts[nonempty, None]
        c_mat = new / _safe_norm(new)
        bc.unpersist()

    return spark.createDataFrame(
        [(int(i), c_mat[i].tolist()) for i in range(len(c_mat))],
        "cent_id long, cent_vec array<double>",
    )


def _ivf_assign(
    df: DataFrame, cents: DataFrame, key: str, vec: str, n: int
) -> DataFrame:
    sim = cosine(F.col(vec), F.col("cent_vec")).alias("__sim")
    w = Window.partitionBy(key).orderBy(F.col("__sim").desc(), F.col("cent_id"))
    return (
        df.crossJoin(F.broadcast(cents))
        .select(*df.columns, F.col("cent_id"), sim)
        .withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") <= n)
        .withColumnRenamed("cent_id", "list_id")
        .drop("__sim", "__r")
    )


def ivf_assign(
    corpus: DataFrame,
    n_centroids: int = 16,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF index build: corpus with a `list_id` inverted-list column.

    This is the expensive phase (corpus x centroids scoring) and it is
    QUERY-INDEPENDENT — persist or write it once and amortize across
    every subsequent `ivf_topk` batch; at 100 TB the assignment would
    be a partitioned-by-list_id parquet table. Pass `centroids` (e.g.
    from `ivf_centroids_kmeans`) to use refined centers; the plan is
    identical either way."""
    cents = (
        centroids
        if centroids is not None
        else _ivf_centroids(corpus, n_centroids, corpus_id, corpus_vec)
    )
    return _ivf_assign(
        corpus.select(corpus_id, corpus_vec), cents, corpus_id, corpus_vec, 1
    )


def ivf_assign_fast(
    corpus: DataFrame,
    n_centroids: int = 16,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    centroids: DataFrame | None = None,
) -> DataFrame:
    """`ivf_assign`'s Arrow/numpy scale path: centroids ship to
    executors as one normalized matrix; each Arrow batch scores
    corpus×centroids with a single matmul and argmaxes its list —
    O(100×) less per-dot cost than the interpreted JVM fold for the
    QUERY-INDEPENDENT build phase (the expensive one). Ties resolve
    to the lowest centroid id (argmax-first on an id-ordered matrix),
    matching the exact variant up to float near-ties. Zero-norm
    vectors are scored against unnormalized dot products (norm
    clamped to 1), so they land deterministically rather than
    propagating NaN into argmax."""
    cent_src = (
        centroids
        if centroids is not None
        else _ivf_centroids(corpus, n_centroids, corpus_id, corpus_vec)
    )
    cent_rows = cent_src.orderBy("cent_id").collect()
    c_ids = np.array([r[0] for r in cent_rows])
    c_mat = np.array([r[1] for r in cent_rows], dtype=np.float64)
    c_norm = c_mat / _safe_norm(c_mat)

    dtypes = dict(corpus.dtypes)
    vec_type = dtypes[corpus_vec]
    id_type = dtypes[corpus_id]

    def assign(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            v = np.array(list(pdf[corpus_vec]), dtype=np.float64)
            vn = v / _safe_norm(v)
            arg = np.argmax(vn @ c_norm.T, axis=1)
            yield pd.DataFrame(
                {
                    corpus_id: pdf[corpus_id],
                    corpus_vec: pdf[corpus_vec],
                    "list_id": c_ids[arg],
                }
            )

    schema = f"{corpus_id} {id_type}, {corpus_vec} {vec_type}, list_id long"
    return corpus.select(corpus_id, corpus_vec).mapInPandas(assign, schema)


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    n_centroids: int = 16,
    nprobe: int = 2,
    k: int = 5,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "query_vec",
    assigned: DataFrame | None = None,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF-style ANN: the first `n_centroids` corpus vectors (by id —
    deterministic) act as coarse centroids; every corpus vector is
    assigned to its nearest centroid (inverted list); each query
    probes its `nprobe` nearest lists and brute-forces only those.

    Pass `assigned` (a persisted `ivf_assign` result built with the
    same n_centroids) to skip the rebuild — the query phase then only
    scores nprobe/n_centroids of the corpus. Pass `centroids` (e.g.
    `ivf_centroids_kmeans`) to probe refined centers; it must be the
    same table the assignment was built with.
    """
    cents = (
        centroids
        if centroids is not None
        else _ivf_centroids(corpus, n_centroids, corpus_id, corpus_vec)
    )
    if assigned is None:
        assigned = _ivf_assign(
            corpus.select(corpus_id, corpus_vec), cents, corpus_id, corpus_vec, 1
        )
    probed = _ivf_assign(
        queries.select(query_id, query_vec), cents, query_id, query_vec, nprobe
    )

    joined = assigned.join(probed, "list_id").filter(
        F.col(corpus_id) != F.col(query_id)
    )
    sim = cosine(F.col(corpus_vec), F.col(query_vec)).alias("cos_sim")
    w = Window.partitionBy(query_id).orderBy(F.col("cos_sim").desc(), F.col(corpus_id))
    return (
        joined.select(query_id, corpus_id, sim)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .distinct()
    )


def semantic_dedup(
    corpus: DataFrame,
    centroids: DataFrame,
    threshold: float = 0.85,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    nprobe: int = 1,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (cluster-then-dedup over
    an embedding column, after Abbas et al. 2023, arXiv:2303.09540):
    assign every vector to its nearest centroid, then drop any
    document whose cluster holds a LOWER-id document with cosine
    similarity >= `threshold`. Returns (corpus_id, list_id, kept)
    with list_id = the primary (nearest) cell.

    Scale shape: the quadratic near-dup comparison is scoped to
    clusters, so the pair count is the sum of squared CLUSTER sizes
    (controlled by len(centroids)) — never corpus². Assignment
    broadcasts the C centroids against an unshuffled corpus scan; the
    pair join then shuffles narrow (id, vec, list_id) rows hash-
    partitioned on list_id. The keep rule ("no lower-id near
    neighbour in any shared cluster") is anchor-free and
    engine-exact: sequential float64 cosine is bitwise-reproducible
    and the strict id inequality leaves no ties to break.

    `nprobe > 1` assigns each vector to its `nprobe` nearest cells
    for the PAIR stage (primary cell still reported): a duplicate
    pair is caught whenever the two probe sets intersect, which
    recovers the pairs a single-cell assignment splits across a cell
    boundary — the standard SemDeDup recall trade-off — at `nprobe`×
    pair-stage cost."""
    multi = _ivf_assign(
        corpus.select(corpus_id, corpus_vec),
        centroids,
        corpus_id,
        corpus_vec,
        nprobe,
    )
    primary = ivf_assign(
        corpus, corpus_id=corpus_id, corpus_vec=corpus_vec, centroids=centroids
    )
    a = multi.select(
        F.col(corpus_id).alias("__ida"),
        F.col(corpus_vec).alias("__va"),
        "list_id",
    )
    b = multi.select(
        F.col(corpus_id).alias("__idb"),
        F.col(corpus_vec).alias("__vb"),
        "list_id",
    )
    dropped = (
        a.join(b, "list_id")
        .filter(F.col("__idb") < F.col("__ida"))
        .filter(cosine(F.col("__va"), F.col("__vb")) >= F.lit(threshold))
        .select(F.col("__ida").alias(corpus_id))
        .distinct()
        .withColumn("__dropped", F.lit(True))
    )
    return primary.join(dropped, corpus_id, "left").select(
        corpus_id,
        "list_id",
        F.coalesce(~F.col("__dropped"), F.lit(True)).alias("kept"),
    )


def semantic_dedup_fast(
    corpus: DataFrame,
    centroids: DataFrame | None = None,
    n_centroids: int = 1024,
    threshold: float = 0.85,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    assigned: DataFrame | None = None,
    nprobe: int = 1,
) -> DataFrame:
    """`semantic_dedup`'s Arrow/numpy scale path: matmul centroid
    assignment (one pass per Arrow batch, corpus never shuffled),
    then ONE shuffle groups each cluster and a per-cluster numpy
    Gram matrix decides drops — a vector is dropped when a LOWER-id
    cluster member has cosine >= threshold (same anchor-free rule as
    the exact variant).

    Cost shape at 100 TB: per-cluster work is |cluster|² float64
    matmul (pick n_centroids so clusters stay ~100–1000 rows —
    SemDeDup's own operating point); total pair work is Σ cluster²,
    and the only corpus-wide movement is the hash partition on
    list_id. `nprobe > 1` replicates each vector into its nprobe
    nearest cells for the pair stage (plus one id-grain merge
    shuffle), recovering duplicate pairs that a single-cell
    assignment splits across a cell boundary. Differs from
    `semantic_dedup` only by matmul-vs-sequential-fold float
    rounding on pairs exactly AT the threshold; agreement is pinned
    in tests and `tools/bench_semdedup.py`. Returns
    (corpus_id, list_id, kept) with list_id the primary cell."""
    if assigned is not None and nprobe != 1:
        raise ValueError(
            "assigned= carries a single-cell assignment; rebuild with "
            "nprobe via centroids=/n_centroids= instead of passing both"
        )
    if assigned is None and nprobe == 1:
        assigned = ivf_assign_fast(
            corpus,
            n_centroids=n_centroids,
            corpus_id=corpus_id,
            corpus_vec=corpus_vec,
            centroids=centroids,
        )
    if assigned is not None:
        multi = assigned.withColumn("primary", F.lit(True))
    else:
        cent_src = (
            centroids
            if centroids is not None
            else _ivf_centroids(corpus, n_centroids, corpus_id, corpus_vec)
        )
        cent_rows = cent_src.orderBy("cent_id").collect()
        c_ids = np.array([r[0] for r in cent_rows])
        c_norm = np.array([r[1] for r in cent_rows], dtype=np.float64)
        c_norm = c_norm / _safe_norm(c_norm)
        p = min(nprobe, len(c_ids))
        dtypes = dict(corpus.dtypes)
        a_schema = (
            f"{corpus_id} {dtypes[corpus_id]}, "
            f"{corpus_vec} {dtypes[corpus_vec]}, "
            "list_id long, primary boolean"
        )

        def assign_multi(batches):
            import pandas as pd

            for pdf in batches:
                if not len(pdf):
                    continue
                v = np.array(list(pdf[corpus_vec]), dtype=np.float64)
                vn = v / _safe_norm(v)
                top = np.argsort(-(vn @ c_norm.T), axis=1, kind="stable")[:, :p]
                frames = [
                    pd.DataFrame(
                        {
                            corpus_id: pdf[corpus_id],
                            corpus_vec: pdf[corpus_vec],
                            "list_id": c_ids[top[:, r]],
                            "primary": r == 0,
                        }
                    )
                    for r in range(p)
                ]
                yield pd.concat(frames, ignore_index=True)

        multi = corpus.select(corpus_id, corpus_vec).mapInPandas(
            assign_multi, a_schema
        )
    id_type = dict(corpus.dtypes)[corpus_id]

    def per_cluster(key, pdf):
        import pandas as pd

        ids = pdf[corpus_id].to_numpy()
        order = np.argsort(ids, kind="stable")
        v = np.array(list(pdf[corpus_vec]), dtype=np.float64)[order]
        ids = ids[order]
        primary = pdf["primary"].to_numpy()[order]
        vn = v / _safe_norm(v)
        sims = vn @ vn.T
        # dropped[j] ⇔ ∃ i<j with sims[i,j] >= threshold: the strict
        # upper triangle of the threshold mask, any per column
        dropped = np.triu(sims >= threshold, k=1).any(axis=0)
        return pd.DataFrame(
            {
                corpus_id: ids,
                "list_id": key[0],
                "primary": primary,
                "dropped": dropped,
            }
        )

    cells = multi.groupBy("list_id").applyInPandas(
        per_cluster,
        f"{corpus_id} {id_type}, list_id long, primary boolean, "
        "dropped boolean",
    )
    if nprobe == 1:
        return cells.select(
            corpus_id, "list_id", (~F.col("dropped")).alias("kept")
        )
    return cells.groupBy(corpus_id).agg(
        F.max(F.when(F.col("primary"), F.col("list_id"))).alias("list_id"),
        (~F.max("dropped")).alias("kept"),
    )


def topk_cosine_fast(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "query_vec",
    exclude_self: bool = True,
    max_query_rows: int = MAX_QUERY_ROWS,
) -> DataFrame:
    """Brute-force top-k cosine, Arrow/numpy scale path.

    Same semantics as `topk_cosine` but the scoring is a blocked
    numpy matmul inside `mapInPandas` instead of an interpreted
    per-element JVM fold — O(100x) less per-dot cost. Two-phase
    top-k: each Arrow batch emits only its local top-k per query
    (n_batches * n_queries * k rows cross the shuffle, independent of
    corpus size), then one window re-ranks globally. Queries ship to
    executors via closure capture (small side by construction).

    numpy's pairwise/SIMD summation differs from the sequential
    float64 fold in the last ulp, so near-tie ranks can differ from
    `topk_cosine` — use that one when oracle-exactness matters and
    this one when the corpus is large.
    """
    q_rows = _collect_query_side(queries, query_id, query_vec, max_query_rows)
    q_ids = np.array([r[0] for r in q_rows])
    q_mat = np.array([r[1] for r in q_rows], dtype=np.float64)
    q_norm = q_mat / _safe_norm(q_mat)

    def score(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf[corpus_id].to_numpy()
            v = np.array(list(pdf[corpus_vec]), dtype=np.float64)
            v = v / _safe_norm(v)
            s = v @ q_norm.T  # (batch, n_queries)
            if exclude_self:
                s[ids[:, None] == q_ids[None, :]] = -np.inf
            top = min(k, len(ids))
            # local top-k per query via argpartition, then exact order
            idx = np.argpartition(-s, top - 1, axis=0)[:top]
            out = {
                query_id: np.repeat(q_ids, top),
                corpus_id: ids[idx].T.ravel(),
                "cos_sim": np.take_along_axis(s, idx, axis=0).T.ravel(),
            }
            pdf_out = pd.DataFrame(out)
            yield pdf_out[np.isfinite(pdf_out.cos_sim)]

    schema = (
        f"{query_id} long, {corpus_id} long, cos_sim double"
    )
    local = corpus.select(corpus_id, corpus_vec).mapInPandas(score, schema)
    w = Window.partitionBy(query_id).orderBy(
        F.col("cos_sim").desc(), F.col(corpus_id)
    )
    return (
        local.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def pack_embedding(vec: Column | str, dtype: str = "float32") -> Column:
    """Pack an array<numeric> embedding into a binary column
    (little-endian, fixed dtype) via a vectorized pandas UDF.

    Why: Arrow `list<double>` rows materialize as one Python object
    per element on the UDF boundary — converting them to a contiguous
    matrix costs ~20 us/row and DOMINATES any numpy scoring at scale.
    A packed binary column turns the whole batch into one
    `np.frombuffer` reshape (no per-element objects), and float32
    halves storage/shuffle bytes (embedding similarity is robust to
    fp32). This mirrors the multimodal design: opaque binary payload +
    typed metadata, vectorized decode at the edge."""
    from pyspark.sql.functions import pandas_udf

    np_dtype = np.dtype(dtype).newbyteorder("<")

    # non-decorator form: type-hint inference can't see through the
    # module's deferred annotations
    _pack = pandas_udf(
        lambda s: s.map(lambda a: np.asarray(a, dtype=np_dtype).tobytes()),
        "binary",
    )
    c = F.col(vec) if isinstance(vec, str) else vec
    return _pack(c)


def topk_cosine_packed(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding_bin",
    query_id: str = "query_id",
    query_vec: str = "query_vec",
    dtype: str = "float32",
    exclude_self: bool = True,
    max_query_rows: int = MAX_QUERY_ROWS,
) -> DataFrame:
    """`topk_cosine_fast` over a packed-binary embedding column: each
    Arrow batch decodes with ONE frombuffer+reshape, so the per-row
    boundary cost vanishes and the blocked matmul is the whole cost.
    `queries` still carries a plain array column (small side)."""
    q_rows = _collect_query_side(queries, query_id, query_vec, max_query_rows)
    q_ids = np.array([r[0] for r in q_rows])
    q_mat = np.array([r[1] for r in q_rows], dtype=np.float64)
    q_norm = (q_mat / _safe_norm(q_mat)).astype(np.dtype(dtype))
    np_dtype = np.dtype(dtype).newbyteorder("<")

    def score(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf[corpus_id].to_numpy()
            v = np.frombuffer(
                b"".join(pdf[corpus_vec]), dtype=np_dtype
            ).reshape(-1, dim)
            s = (v / _safe_norm(v)) @ q_norm.T
            if exclude_self:
                s[ids[:, None] == q_ids[None, :]] = -np.inf
            top = min(k, len(ids))
            idx = np.argpartition(-s, top - 1, axis=0)[:top]
            out = pd.DataFrame(
                {
                    query_id: np.repeat(q_ids, top),
                    corpus_id: ids[idx].T.ravel(),
                    "cos_sim": np.take_along_axis(s, idx, axis=0)
                    .T.ravel()
                    .astype(np.float64),
                }
            )
            yield out[np.isfinite(out.cos_sim)]

    schema = f"{query_id} long, {corpus_id} long, cos_sim double"
    local = corpus.select(corpus_id, corpus_vec).mapInPandas(score, schema)
    w = Window.partitionBy(query_id).orderBy(
        F.col("cos_sim").desc(), F.col(corpus_id)
    )
    return local.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ) — memory-bound ANN for 100 TB embedding stores.
#
# A dim-d vector is split into `m` contiguous subvectors; each subvector is
# quantized to one of `ksub` codewords trained per subspace, so the whole
# vector stores as `m` uint8 codes (ksub <= 256) — 32x smaller than fp32 at
# m = dim/8. Search is ADC (asymmetric distance computation): the query stays
# exact, each subspace contributes LUT[sub, code] = <q_sub, codeword>, and a
# vector's approximate inner product is the sum of its m table lookups — one
# uint8 gather per subspace instead of a dim-wide multiply-add (Jégou et al.
# 2011, "Product Quantization for Nearest Neighbor Search").
#
# Two parallel paths, mirroring ivf_assign / ivf_assign_fast:
#  - `pq_encode` / `pq_topk_exact`: JVM sequential-fold arithmetic,
#    bitwise-replayable in DuckDB (the f5d oracle) — correctness anchor.
#  - `pq_encode_fast` / `pq_topk`: Arrow/numpy over packed uint8 codes —
#    the scale path (codes column shuffles at m bytes/row; the corpus
#    embedding column never moves after encode).
# ---------------------------------------------------------------------------


def _batch_matrix(col, packed_dtype: str | None, dim: int) -> np.ndarray:
    """A pandas Series of embeddings -> (n, dim) float64 matrix. With
    ``packed_dtype`` the column is little-endian packed binary
    (`pack_embedding` / `maintenance.write_packed_embeddings`) and the
    whole batch converts with ONE frombuffer+reshape; a plain
    array<float> column pays ~20 us/row of per-element Arrow object
    overhead instead — at 1M vectors that alone was 20-40 s of the
    encode pass, so prefer packed input for corpus-sized scans."""
    if packed_dtype is None:
        return np.array(list(col), dtype=np.float64)
    np_dtype = np.dtype(packed_dtype).newbyteorder("<")
    return (
        np.frombuffer(b"".join(col), dtype=np_dtype)
        .reshape(-1, dim)
        .astype(np.float64)
    )


def _lloyd_subspace(xs: np.ndarray, ksub: int, iters: int) -> np.ndarray:
    """Deterministic per-subspace Lloyd k-means: evenly-spaced seeding,
    fixed iteration count, empty clusters keep their previous centroid.
    Mean accumulation uses per-dimension weighted bincount — np.add.at
    is a buffered ufunc ~100x slower at this shape (it alone put
    pq_train at 44 s for m=16/ksub=256/65k samples; bincount takes it
    to ~2 s with identical encounter-order accumulation)."""
    xs = np.ascontiguousarray(xs)
    idx = np.linspace(0, len(xs) - 1, ksub).astype(np.int64)
    c = xs[idx].copy()
    xs_sq = (xs * xs).sum(axis=1)[:, None]
    dsub = xs.shape[1]
    for _ in range(iters):
        # (n, ksub) squared distances without the 3-D tensor
        d = xs_sq - 2.0 * (xs @ c.T) + (c * c).sum(axis=1)[None, :]
        arg = np.argmin(d, axis=1)
        counts = np.bincount(arg, minlength=ksub)
        sums = np.empty_like(c)
        for j in range(dsub):
            sums[:, j] = np.bincount(
                arg, weights=xs[:, j], minlength=ksub
            )
        nonempty = counts > 0
        c[nonempty] = sums[nonempty] / counts[nonempty, None]
    return c


def pq_codebooks(
    corpus: DataFrame,
    dim: int,
    m: int = 2,
    ksub: int = 4,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
) -> DataFrame:
    """Deterministic seed codebooks: the subvectors of the first `ksub`
    corpus vectors by id (the `_ivf_centroids` convention, so oracles can
    replay the pick). Output: (sub_id, code_id, code_vec array<double>),
    m*ksub rows — always a broadcast-sized table.

    `pq_train` refines these with per-subspace k-means; the downstream
    encode/search plans are identical either way."""
    if dim % m:
        raise ValueError(f"dim={dim} not divisible by m={m}")
    dsub = dim // m
    seeds = (
        corpus.select(corpus_id, corpus_vec)
        .orderBy(corpus_id)
        .limit(ksub)  # TakeOrderedAndProject: ksub rows to the driver
        .withColumn(
            # unpartitioned window over the POST-LIMIT frame: <= ksub
            # (<= 256) rows regardless of corpus size — bounded by
            # construction, not a scale hazard
            "code_id",
            F.row_number().over(Window.orderBy(corpus_id)) - 1,
        )
    )
    # two-step select: the slice references sub_id, so the explode must
    # resolve to a column first
    subs = (
        seeds.select(
            "code_id",
            F.col(corpus_vec).alias("__v"),
            F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("sub_id"),
        )
        .select(
            F.col("sub_id").cast("int"),
            F.col("code_id").cast("int"),
            F.transform(
                F.slice(F.col("__v"), F.col("sub_id") * dsub + 1, F.lit(dsub)),
                lambda x: x.cast("double"),
            ).alias("code_vec"),
        )
    )
    return subs


def pq_train(
    corpus: DataFrame,
    dim: int,
    m: int = 8,
    ksub: int = 256,
    iters: int = 10,
    sample_rows: int = 65_536,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    normalize: bool = True,
    packed_dtype: str | None = None,
    opq_seeds: int = 0,
) -> DataFrame:
    """Train PQ codebooks: per-subspace Lloyd k-means on a bounded,
    deterministic corpus sample (first `sample_rows` by id — one
    TakeOrderedAndProject, never an unbounded collect; FAISS trains PQ on a
    sample the same way since codeword quality saturates far below corpus
    size). Seeding is evenly-spaced sample points; empty clusters keep
    their previous centroid; fixed iteration count — the whole training is
    a pure function of (corpus, params).

    `normalize=True` L2-normalizes training vectors so ADC inner products
    approximate cosine; use the same flag on encode/search.

    ``opq_seeds > 0`` enables OPQ-style rotation: codebooks are trained
    under the best of `opq_seeds` candidate orthogonal transforms
    (identity + seeded random-QR matrices), picked by reconstruction
    MSE on the training sample — never worse than plain PQ because the
    identity is always a candidate. The winning rotation travels with
    the codebooks as ``sub_id == -1`` rows; `pq_encode_fast`/`pq_topk`
    apply it transparently (the exact JVM twin `pq_encode` rejects
    rotated tables by name).

    Output schema matches `pq_codebooks`: (sub_id, code_id, code_vec)."""
    if dim % m:
        raise ValueError(f"dim={dim} not divisible by m={m}")
    if ksub > 256:
        raise ValueError("ksub > 256 does not fit uint8 codes")
    dsub = dim // m
    pdf = (
        corpus.select(corpus_id, corpus_vec)
        .orderBy(corpus_id)
        .limit(sample_rows)
        .toPandas()  # Arrow path: ~50x faster than Row collect for arrays
    )
    x = _batch_matrix(pdf[corpus_vec], packed_dtype, dim)
    if len(x) < ksub:
        raise ValueError(
            f"PQ training needs >= ksub={ksub} sample vectors, got {len(x)}"
        )
    if normalize:
        x = x / _safe_norm(x)
    out: list[tuple] = []
    if opq_seeds > 0:
        rot, cbs, _mse = _train_rotated(x, dim, m, ksub, iters, opq_seeds)
        out.extend(_rotation_rows(rot))
        for s, c in enumerate(cbs):
            out.extend((int(s), int(j), c[j].tolist()) for j in range(ksub))
    else:
        for s in range(m):
            c = _lloyd_subspace(x[:, s * dsub : (s + 1) * dsub], ksub, iters)
            out.extend(
                (int(s), int(j), c[j].tolist()) for j in range(ksub)
            )
    return corpus.sparkSession.createDataFrame(
        out, "sub_id int, code_id int, code_vec array<double>"
    )


def pq_encode(
    corpus: DataFrame,
    codebooks: DataFrame,
    dim: int,
    m: int,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
) -> DataFrame:
    """Exact (JVM sequential-fold) PQ encode: for every (vector, subspace)
    the argmin-L2 codeword, as the LONG-format assignment table
    (id, sub_id, code_id) that joins straight into `pq_topk_exact`.

    Plan: corpus x broadcast(m*ksub codebook rows), squared-distance fold
    per pair, then min(struct(dist, code_id)) per (id, sub_id) — the
    lexicographic struct-min makes argmin ties deterministic (lowest
    code_id), matching the oracle's row_number replay. The fold arithmetic
    is the `dot()` convention: cast-to-double before multiply, sequential
    accumulate — bitwise-reproducible against DuckDB list_aggregate.

    This is the correctness anchor: it scores corpus x (m*ksub) pairs with
    interpreted folds, so at scale use `pq_encode_fast` (identical argmin
    up to float near-ties) and keep this one for oracle checks."""
    dsub = dim // m
    if not codebooks.filter(F.col("sub_id") < 0).isEmpty():
        raise ValueError(
            "pq_encode (the exact JVM fold) does not support OPQ-rotated "
            "codebooks — use pq_encode_fast, which applies the rotation"
        )
    j = corpus.select(corpus_id, corpus_vec).crossJoin(F.broadcast(codebooks))
    sub = F.slice(F.col(corpus_vec), F.col("sub_id") * dsub + 1, F.lit(dsub))
    dist = F.aggregate(
        F.zip_with(
            sub,
            F.col("code_vec"),
            lambda x, y: (x.cast("double") - y) * (x.cast("double") - y),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return (
        j.select(corpus_id, "sub_id", F.col("code_id"), dist.alias("__d"))
        .groupBy(corpus_id, "sub_id")
        .agg(
            F.min(F.struct(F.col("__d"), F.col("code_id"))).alias("__b")
        )
        .select(corpus_id, "sub_id", F.col("__b.code_id").alias("code_id"))
    )


def pq_topk_exact(
    corpus: DataFrame,
    codebooks: DataFrame,
    queries: DataFrame,
    dim: int,
    m: int,
    k: int = 5,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "query_vec",
    exclude_self: bool = True,
) -> DataFrame:
    """ADC top-k by approximate inner product, exact-fold variant (the f5d
    oracle path). LUT = queries x codebooks inner products (nq*m*ksub rows,
    broadcast); each encoded corpus row joins its m LUT entries and the
    per-(query, vector) score folds the m subspace terms in sub_id order
    (sorted collect_list fold — deterministic for any m, and for the
    oracle's m=2 bitwise-equal to t0 + t1). Rank ties break on corpus id.

    Output: (query_id, vec_id, approx_score, rank <= k)."""
    dsub = dim // m
    assign = pq_encode(corpus, codebooks, dim, m, corpus_id, corpus_vec)
    qsub = F.slice(F.col(query_vec), F.col("sub_id") * dsub + 1, F.lit(dsub))
    ip = F.aggregate(
        F.zip_with(
            qsub,
            F.col("code_vec"),
            lambda x, y: x.cast("double") * y.cast("double"),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    lut = (
        queries.select(query_id, query_vec)
        .crossJoin(F.broadcast(codebooks))
        .select(query_id, "sub_id", "code_id", ip.alias("__ip"))
    )
    scored = assign.join(F.broadcast(lut), ["sub_id", "code_id"])
    if exclude_self:
        scored = scored.filter(F.col(corpus_id) != F.col(query_id))
    score = F.aggregate(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct(F.col("sub_id"), F.col("__ip")))
            ),
            lambda s: s["__ip"],
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    w = Window.partitionBy(query_id).orderBy(
        F.col("approx_score").desc(), F.col(corpus_id)
    )
    return (
        scored.groupBy(query_id, corpus_id)
        .agg(score.alias("approx_score"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _codebook_state(
    codebooks: DataFrame, m: int, ksub: int, dsub: int, dim: int
) -> tuple[np.ndarray, np.ndarray | None]:
    """ONE collect of a codebook table (bounded by construction:
    m*ksub + at most dim rows) split into the (m, ksub, dsub)
    codebook array and the optional OPQ rotation (rows with
    ``sub_id == -1``: code_id = row index, code_vec = that row of
    R) — a single Spark job even on the opq-free default path."""
    c = np.zeros((m, ksub, dsub), dtype=np.float64)
    seen = np.zeros((m, ksub), dtype=bool)
    rot_rows: dict[int, list] = {}
    for r in codebooks.collect():
        if r["sub_id"] < 0:
            rot_rows[r["code_id"]] = r["code_vec"]
            continue
        c[r["sub_id"], r["code_id"]] = r["code_vec"]
        seen[r["sub_id"], r["code_id"]] = True
    if not seen.all():
        raise ValueError("codebook table is missing (sub_id, code_id) rows")
    if not rot_rows:
        return c, None
    if sorted(rot_rows) != list(range(dim)):
        raise ValueError("rotation rows are incomplete")
    rot = np.array([rot_rows[i] for i in range(dim)], dtype=np.float64)
    return c, rot


def _codebook_matrix(codebooks: DataFrame, m: int, ksub: int, dsub: int):
    """Codebook array alone (rotation rows skipped) — kept for
    callers that train the codebooks themselves."""
    return _codebook_state(codebooks, m, ksub, dsub, dsub * m)[0]


def _pq_rotation(codebooks: DataFrame, dim: int) -> np.ndarray | None:
    """The OPQ rotation stored in a codebook table, or None. Prefer
    :func:`_codebook_state` where the codebooks are also needed —
    this spends its own collect job."""
    rows = codebooks.filter(F.col("sub_id") < 0).collect()
    if not rows:
        return None
    r = np.zeros((dim, dim), dtype=np.float64)
    seen = np.zeros(dim, dtype=bool)
    for row in rows:
        r[row["code_id"]] = row["code_vec"]
        seen[row["code_id"]] = True
    if not seen.all():
        raise ValueError("rotation rows are incomplete")
    return r


def _opq_candidates(dim: int, opq_seeds: int) -> list[np.ndarray]:
    """Candidate rotations: the identity first (so OPQ can never be
    worse than plain PQ — selection is by measured quantization MSE),
    then ``opq_seeds - 1`` deterministic random-orthogonal matrices
    (QR of seeded Gaussians, sign-fixed for uniqueness)."""
    cands = [np.eye(dim)]
    for s in range(1, opq_seeds):
        g = np.random.default_rng(1000 + s).standard_normal((dim, dim))
        q, r = np.linalg.qr(g)
        q = q * np.sign(np.diag(r))[None, :]
        cands.append(q)
    return cands


def _train_rotated(
    x: np.ndarray, dim: int, m: int, ksub: int, iters: int, opq_seeds: int
) -> tuple[np.ndarray | None, list[np.ndarray], float]:
    """Train per-subspace codebooks under the best of ``opq_seeds``
    candidate rotations (OPQ-style: pick by reconstruction MSE on the
    training sample). Returns (rotation | None, per-subspace codebook
    list, winning MSE)."""
    dsub = dim // m
    best: tuple[float, np.ndarray | None, list[np.ndarray]] | None = None
    for ci, rot in enumerate(_opq_candidates(dim, max(1, opq_seeds))):
        xr = x if ci == 0 else x @ rot
        cbs = []
        mse = 0.0
        for s in range(m):
            xs = xr[:, s * dsub : (s + 1) * dsub]
            c = _lloyd_subspace(xs, ksub, iters)
            d = (
                (xs * xs).sum(axis=1)[:, None]
                - 2.0 * (xs @ c.T)
                + (c * c).sum(axis=1)[None, :]
            )
            mse += float(np.maximum(d.min(axis=1), 0.0).mean())
            cbs.append(c)
        if best is None or mse < best[0]:
            best = (mse, None if ci == 0 else rot, cbs)
    assert best is not None
    return best[1], best[2], best[0]


def _rotation_rows(rot: np.ndarray | None) -> list[tuple[int, int, list]]:
    if rot is None:
        return []
    return [(-1, int(i), rot[i].tolist()) for i in range(rot.shape[0])]


def pq_encode_fast(
    corpus: DataFrame,
    codebooks: DataFrame,
    dim: int,
    m: int,
    ksub: int,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    normalize: bool = True,
    packed_dtype: str | None = None,
) -> DataFrame:
    """Arrow/numpy PQ encode — the scale path. Codebooks ship to executors
    as one (m, ksub, dsub) matrix via closure capture; each Arrow batch
    argmin-assigns every subspace with a blocked |x|^2 - 2x.c + |c|^2
    distance matmul and emits the packed uint8 code row (`pq_code` binary,
    m bytes/vector — at dim=64, m=8 that is 32x smaller than the fp32
    embedding). Zero shuffle: a narrow map over the corpus scan, the
    canonical pack-at-ingest step (write the result next to the
    embeddings; every later ADC search reads m bytes/row instead of the
    vector column).

    Ties argmin to the lowest code_id (np.argmin first-match), agreeing
    with `pq_encode`'s struct-min up to float near-ties."""
    dsub = dim // m
    cmat, rot = _codebook_state(codebooks, m, ksub, dsub, dim)
    c_sq = (cmat * cmat).sum(axis=2)  # (m, ksub)
    id_type = dict(corpus.dtypes)[corpus_id]

    def encode(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            v = _batch_matrix(pdf[corpus_vec], packed_dtype, dim)
            if normalize:
                v = v / _safe_norm(v)
            if rot is not None:
                v = v @ rot
            codes = np.empty((len(v), m), dtype=np.uint8)
            for s in range(m):
                xs = v[:, s * dsub : (s + 1) * dsub]
                d = (
                    (xs * xs).sum(axis=1)[:, None]
                    - 2.0 * (xs @ cmat[s].T)
                    + c_sq[s][None, :]
                )
                codes[:, s] = np.argmin(d, axis=1)
            yield pd.DataFrame(
                {
                    corpus_id: pdf[corpus_id],
                    "pq_code": [row.tobytes() for row in codes],
                }
            )

    return corpus.select(corpus_id, corpus_vec).mapInPandas(
        encode, f"{corpus_id} {id_type}, pq_code binary"
    )


def pq_topk(
    codes: DataFrame,
    codebooks: DataFrame,
    queries: DataFrame,
    dim: int,
    m: int,
    ksub: int,
    k: int = 5,
    corpus_id: str = "vec_id",
    code_col: str = "pq_code",
    query_id: str = "query_id",
    query_vec: str = "query_vec",
    normalize: bool = True,
    exclude_self: bool = True,
    max_query_rows: int = MAX_QUERY_ROWS,
) -> DataFrame:
    """ADC top-k over packed uint8 codes — the memory-bound ANN scan.

    Queries collect driver-side (guarded), normalize, and precompute per
    query the (m, ksub) inner-product LUT against the codebooks; each
    Arrow batch then scores every corpus row with m uint8 gathers + adds
    (no per-vector float math at all) and emits only its local top-k per
    query, two-phase like `topk_cosine_fast` (n_batches * nq * k rows
    cross the one shuffle). At 100 TB the scan reads m bytes/row — the
    whole corpus fits hot at sizes where fp32 vectors spill cold.

    Scores are approximate (quantization error); recall is a function of
    (m, ksub) and retraining, not corpus size. Output:
    (query_id, vec_id, approx_score, rank)."""
    dsub = dim // m
    cmat, rot = _codebook_state(codebooks, m, ksub, dsub, dim)
    q_rows = _collect_query_side(queries, query_id, query_vec, max_query_rows)
    q_ids = np.array([r[0] for r in q_rows])
    q_mat = np.array([r[1] for r in q_rows], dtype=np.float64)
    if normalize:
        q_mat = q_mat / _safe_norm(q_mat)
    if rot is not None:
        # q.(x@R) in rotated code space == (q@R).(x@R) since R is
        # orthogonal — rotate the query side once, LUT as usual
        q_mat = q_mat @ rot
    nq = len(q_ids)
    # (nq, m, ksub) LUT flattened per query for one-gather scoring
    lut = np.empty((nq, m * ksub), dtype=np.float64)
    for s in range(m):
        lut[:, s * ksub : (s + 1) * ksub] = (
            q_mat[:, s * dsub : (s + 1) * dsub] @ cmat[s].T
        )
    offs = (np.arange(m) * ksub).astype(np.int64)

    def score(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf[corpus_id].to_numpy()
            codes = np.frombuffer(
                b"".join(pdf[code_col]), dtype=np.uint8
            ).reshape(-1, m)
            idx = codes.astype(np.int64) + offs[None, :]  # (n, m)
            s = np.empty((len(ids), nq), dtype=np.float64)
            for i in range(nq):
                s[:, i] = lut[i][idx].sum(axis=1)
            if exclude_self:
                s[ids[:, None] == q_ids[None, :]] = -np.inf
            top = min(k, len(ids))
            # PQ scores tie STRUCTURALLY (ksub^m distinct values), so the
            # local prune must already apply the global (score DESC, id)
            # order — argpartition alone would drop tied low-id members
            # a later global window can never recover
            sel_ids = np.empty((nq, top), dtype=np.int64)
            sel_sc = np.empty((nq, top), dtype=np.float64)
            for i in range(nq):
                o = np.lexsort((ids, -s[:, i]))[:top]
                sel_ids[i] = ids[o]
                sel_sc[i] = s[o, i]
            out = pd.DataFrame(
                {
                    query_id: np.repeat(q_ids, top),
                    corpus_id: sel_ids.ravel(),
                    "approx_score": sel_sc.ravel(),
                }
            )
            yield out[np.isfinite(out.approx_score)]

    schema = f"{query_id} long, {corpus_id} long, approx_score double"
    local = codes.select(corpus_id, code_col).mapInPandas(score, schema)
    w = Window.partitionBy(query_id).orderBy(
        F.col("approx_score").desc(), F.col(corpus_id)
    )
    return local.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def exact_rerank(
    candidates: DataFrame,
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "query_vec",
) -> DataFrame:
    """Exact-cosine re-rank of an ANN shortlist — the standard second
    stage after any approximate retrieval (LSH / IVF / PQ / IVFPQ):
    `candidates` is (query_id, vec_id) pairs; each joins back to its
    full corpus vector (equi join on id — at 100 TB this is an
    nq*shortlist-row probe of the corpus, NOT a scan) and to the
    broadcast query side, scores with the exact JVM fold, and keeps
    the (cos_sim DESC, id) top-k per query."""
    w = Window.partitionBy(query_id).orderBy(
        F.col("cos_sim").desc(), F.col(corpus_id)
    )
    return (
        candidates.select(query_id, corpus_id)
        .join(corpus.select(corpus_id, corpus_vec), corpus_id)
        .join(F.broadcast(queries.select(query_id, query_vec)), query_id)
        .select(
            query_id,
            corpus_id,
            cosine(F.col(corpus_vec), F.col(query_vec)).alias("cos_sim"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


# ---------------------------------------------------------------------------
# IVF+PQ — coarse quantizer + product-quantized RESIDUALS (FAISS
# IndexIVFPQ, Jégou et al. 2011 §V). Plain PQ quantizes absolute
# vectors, so on clustered corpora every member of a cluster collapses
# to near-identical codes and intra-cluster ranking is lost. Encoding
# the residual (vector - its centroid) spends all m*log2(ksub) bits on
# exactly the intra-list detail the coarse quantizer cannot see; query
# scoring decomposes as
#     q . recon = q . centroid[list]  (per-list scalar)
#               + sum_m <q_m, residual_codeword_m>  (one LUT per query)
# so a probe costs nprobe scalars + m uint8 gathers per row.
# ---------------------------------------------------------------------------


def ivfpq_build(
    corpus: DataFrame,
    centroids: DataFrame,
    dim: int,
    m: int = 8,
    ksub: int = 256,
    iters: int = 4,
    sample_rows: int = 65_536,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    normalize: bool = True,
    packed_dtype: str | None = None,
    opq_seeds: int = 0,
):
    """Build an IVF+PQ index: assign every vector to its nearest
    centroid (cosine, normalized centroid matrix via closure capture),
    train per-subspace codebooks on RESIDUAL vectors from a bounded
    deterministic sample, then encode every vector's residual to m
    uint8 codes. ``opq_seeds > 0`` trains under the MSE-best of that
    many candidate orthogonal transforms of the residual space
    (identity always included, so never worse); the rotation rides in
    the codebooks as ``sub_id == -1`` rows and `ivfpq_topk` applies it
    to the query residual LUT transparently.

    Returns ``(index_df, codebooks_df)``: index is
    (id, list_id, pq_code binary) — m+8ish bytes/vector, the whole
    searchable state at 100 TB (partition/sort by list_id on write so
    probes prune row groups); codebooks is the `pq_codebooks` schema.
    Two corpus passes (train sample + encode), zero shuffles."""
    if dim % m:
        raise ValueError(f"dim={dim} not divisible by m={m}")
    if ksub > 256:
        raise ValueError("ksub > 256 does not fit uint8 codes")
    dsub = dim // m
    cent_rows = centroids.orderBy("cent_id").collect()
    c_ids = np.array([r[0] for r in cent_rows], dtype=np.int64)
    c_mat = np.array([r[1] for r in cent_rows], dtype=np.float64)
    c_norm = c_mat / _safe_norm(c_mat)

    # --- train codebooks on sample residuals (driver-side numpy) ---
    pdf = (
        corpus.select(corpus_id, corpus_vec)
        .orderBy(corpus_id)
        .limit(sample_rows)
        .toPandas()
    )
    x = _batch_matrix(pdf[corpus_vec], packed_dtype, dim)
    if len(x) < ksub:
        raise ValueError(
            f"IVFPQ training needs >= ksub={ksub} sample vectors, got {len(x)}"
        )
    if normalize:
        x = x / _safe_norm(x)
    res = x - c_norm[np.argmax(x @ c_norm.T, axis=1)]
    cb_rows: list[tuple] = []
    if opq_seeds > 0:
        rot, cbs, _mse = _train_rotated(res, dim, m, ksub, iters, opq_seeds)
        cb_rows.extend(_rotation_rows(rot))
        for s, c in enumerate(cbs):
            cb_rows.extend(
                (int(s), int(j), c[j].tolist()) for j in range(ksub)
            )
    else:
        rot = None
        for s in range(m):
            c = _lloyd_subspace(res[:, s * dsub : (s + 1) * dsub], ksub, iters)
            cb_rows.extend(
                (int(s), int(j), c[j].tolist()) for j in range(ksub)
            )
    codebooks = corpus.sparkSession.createDataFrame(
        cb_rows, "sub_id int, code_id int, code_vec array<double>"
    )
    cmat = _codebook_matrix(codebooks, m, ksub, dsub)
    c_sq = (cmat * cmat).sum(axis=2)
    id_type = dict(corpus.dtypes)[corpus_id]

    def encode(batches):
        import pandas as pd

        for bpdf in batches:
            if not len(bpdf):
                continue
            v = _batch_matrix(bpdf[corpus_vec], packed_dtype, dim)
            if normalize:
                v = v / _safe_norm(v)
            assign = np.argmax(v @ c_norm.T, axis=1)
            r = v - c_norm[assign]
            if rot is not None:
                r = r @ rot
            codes = np.empty((len(v), m), dtype=np.uint8)
            for s in range(m):
                xs = r[:, s * dsub : (s + 1) * dsub]
                d = (
                    (xs * xs).sum(axis=1)[:, None]
                    - 2.0 * (xs @ cmat[s].T)
                    + c_sq[s][None, :]
                )
                codes[:, s] = np.argmin(d, axis=1)
            yield pd.DataFrame(
                {
                    corpus_id: bpdf[corpus_id],
                    "list_id": c_ids[assign],
                    "pq_code": [row.tobytes() for row in codes],
                }
            )

    index = corpus.select(corpus_id, corpus_vec).mapInPandas(
        encode, f"{corpus_id} {id_type}, list_id long, pq_code binary"
    )
    return index, codebooks


def ivfpq_topk(
    index: DataFrame,
    centroids: DataFrame,
    codebooks: DataFrame,
    queries: DataFrame,
    dim: int,
    m: int = 8,
    ksub: int = 256,
    nprobe: int = 8,
    k: int = 10,
    corpus_id: str = "vec_id",
    query_id: str = "query_id",
    query_vec: str = "query_vec",
    normalize: bool = True,
    exclude_self: bool = True,
    max_query_rows: int = MAX_QUERY_ROWS,
) -> DataFrame:
    """ADC search over an `ivfpq_build` index: each query probes its
    `nprobe` nearest lists; a row in a probed list scores as the
    per-list scalar q.centroid plus m LUT gathers on its residual
    codes — never a full-vector dot, and rows outside the probed
    lists are skipped entirely (at 100 TB, with the index stored
    partitioned by list_id, they are never even read).

    Ties prune by (score DESC, id) locally (PQ scores tie
    structurally), matching the global window. Output:
    (query_id, vec_id, approx_score, rank)."""
    dsub = dim // m
    cent_rows = centroids.orderBy("cent_id").collect()
    c_ids = np.array([r[0] for r in cent_rows], dtype=np.int64)
    c_mat = np.array([r[1] for r in cent_rows], dtype=np.float64)
    c_norm = c_mat / _safe_norm(c_mat)
    cmat, rot = _codebook_state(codebooks, m, ksub, dsub, dim)

    q_rows = _collect_query_side(queries, query_id, query_vec, max_query_rows)
    q_ids = np.array([r[0] for r in q_rows])
    q_mat = np.array([r[1] for r in q_rows], dtype=np.float64)
    if normalize:
        q_mat = q_mat / _safe_norm(q_mat)
    nq = len(q_ids)
    consts = q_mat @ c_norm.T  # (nq, C): per-list scalar term
    order = np.argsort(-consts, axis=1)[:, :nprobe]
    probed = c_ids[order]  # (nq, nprobe) probed list ids
    # residual codes live in the (optionally OPQ-rotated) residual
    # space: q.res == (q@R).(res@R), so only the LUT side rotates —
    # the q.centroid scalar term stays in the original space
    q_lut = q_mat @ rot if rot is not None else q_mat
    lut = np.empty((nq, m * ksub), dtype=np.float64)
    for s in range(m):
        lut[:, s * ksub : (s + 1) * ksub] = (
            q_lut[:, s * dsub : (s + 1) * dsub] @ cmat[s].T
        )
    offs = (np.arange(m) * ksub).astype(np.int64)
    # list_id -> centroid row for the scalar term
    lid_to_row = {int(lid): i for i, lid in enumerate(c_ids)}

    def score(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf[corpus_id].to_numpy()
            lids = pdf["list_id"].to_numpy()
            codes = np.frombuffer(
                b"".join(pdf["pq_code"]), dtype=np.uint8
            ).reshape(-1, m)
            idx = codes.astype(np.int64) + offs[None, :]
            lrows = np.array([lid_to_row[int(x)] for x in lids])
            top_ids, top_sc, top_q = [], [], []
            for i in range(nq):
                sel = np.isin(lids, probed[i])
                if exclude_self:
                    sel &= ids != q_ids[i]
                if not sel.any():
                    continue
                s_i = lut[i][idx[sel]].sum(axis=1) + consts[i][lrows[sel]]
                sel_ids = ids[sel]
                top = min(k, len(sel_ids))
                o = np.lexsort((sel_ids, -s_i))[:top]
                top_q.append(np.full(top, q_ids[i]))
                top_ids.append(sel_ids[o])
                top_sc.append(s_i[o])
            if not top_q:
                continue
            yield pd.DataFrame(
                {
                    query_id: np.concatenate(top_q),
                    corpus_id: np.concatenate(top_ids),
                    "approx_score": np.concatenate(top_sc),
                }
            )

    schema = f"{query_id} long, {corpus_id} long, approx_score double"
    local = index.select(corpus_id, "list_id", "pq_code").mapInPandas(
        score, schema
    )
    w = Window.partitionBy(query_id).orderBy(
        F.col("approx_score").desc(), F.col(corpus_id)
    )
    return local.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )
