"""Streaming SEMANTIC dedup ingest (tier G × tier F composition).

Embedding-space twin of :mod:`streaming/neardup`: documents arrive
with an embedding column and the retained corpus must stay free of
semantic near-duplicates (cosine >= threshold) WITHOUT re-scanning
itself per batch. foreachBatch (G8) plus a persistent **vector
store** — a parquet table of every retained vector, partitioned by
its IVF cell — make the per-batch work proportional to the batch's
cells, not the corpus:

per micro-batch
  1. assign batch vectors to their `nprobe` nearest cells (numpy
     matmul against the fixed broadcast centroids — the same
     assignment `semantic_dedup_fast` uses),
  2. read ONLY the store partitions for cells the batch touches
     (partition pruning on the `list_id=` directory layout),
  3. per cell, a float64 Gram matrix drops any batch vector with a
     retained neighbour at cosine >= threshold, or a lower-id
     batch neighbour (within-batch dedup) — drop decisions merge
     across probe cells,
  4. survivors append to the output sink FIRST, then their cell
     rows append to the vector store (crash between the writes ⇒
     recoverable duplication, never silent loss — same contract as
     the neardup ingest, same seam for epoch-keyed transactional
     appends).

Centroids are FIXED for the lifetime of the store (train once with
`similarity.ivf_centroids_kmeans`, persist, reuse) — re-clustering
would silently orphan existing store partitions. State grows with
the retained corpus × nprobe narrow rows; age it by dropping old
ingest-date partitions, and compact small per-epoch files with
`maintenance.compact` — both standard knobs.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from pdf2dataset_spark.operators.similarity import _safe_norm
from pdf2dataset_spark.streaming.neardup import _store_exists


def _batch_processor(
    out_path: str,
    vector_store: str,
    c_ids: np.ndarray,
    c_norm: np.ndarray,
    id_col: str,
    vec_col: str,
    threshold: float,
    nprobe: int,
):
    p = min(nprobe, len(c_ids))

    def process(batch: DataFrame, epoch_id: int) -> None:
        spark = batch.sparkSession
        dtypes = dict(batch.dtypes)
        a_schema = (
            f"{id_col} {dtypes[id_col]}, {vec_col} {dtypes[vec_col]}, "
            "list_id long, is_new boolean"
        )

        def assign_multi(batches):
            import pandas as pd

            for pdf in batches:
                if not len(pdf):
                    continue
                v = np.array(list(pdf[vec_col]), dtype=np.float64)
                vn = v / _safe_norm(v)
                top = np.argsort(-(vn @ c_norm.T), axis=1, kind="stable")[:, :p]
                for r in range(p):
                    yield pd.DataFrame(
                        {
                            id_col: pdf[id_col],
                            vec_col: pdf[vec_col],
                            "list_id": c_ids[top[:, r]],
                            "is_new": True,
                        }
                    )

        multi = batch.select(id_col, vec_col).mapInPandas(assign_multi, a_schema)
        multi = multi.localCheckpoint(eager=True)  # assignment reused 3×
        cells = [r["list_id"] for r in multi.select("list_id").distinct().collect()]

        both = multi
        if _store_exists(spark, vector_store):
            old = (
                spark.read.parquet(vector_store)
                .filter(F.col("list_id").isin(cells))  # partition pruning
                .select(
                    id_col, vec_col, "list_id", F.lit(False).alias("is_new")
                )
            )
            both = multi.unionByName(old)

        def per_cell(key, pdf):
            import pandas as pd

            new_mask = pdf["is_new"].to_numpy()
            v = np.array(list(pdf[vec_col]), dtype=np.float64)
            vn = v / _safe_norm(v)
            new_ids = pdf[id_col].to_numpy()[new_mask]
            order = np.argsort(new_ids, kind="stable")
            nn = vn[new_mask][order]
            new_ids = new_ids[order]
            hit_old = np.zeros(len(new_ids), dtype=bool)
            if (~new_mask).any():
                hit_old = ((nn @ vn[~new_mask].T) >= threshold).any(axis=1)
            hit_new = np.triu(nn @ nn.T >= threshold, k=1).any(axis=0)
            return pd.DataFrame(
                {id_col: new_ids, "dropped": hit_old | hit_new}
            )

        drops = both.groupBy("list_id").applyInPandas(
            per_cell, f"{id_col} {dtypes[id_col]}, dropped boolean"
        )
        survivor_ids = (
            drops.groupBy(id_col)
            .agg(F.max("dropped").alias("dropped"))
            .filter(~F.col("dropped"))
            .select(id_col)
        )
        survivors = batch.join(survivor_ids, id_col, "left_semi")
        survivors = survivors.localCheckpoint(eager=True)
        # survivors FIRST, store second (see module docstring)
        survivors.write.mode("append").parquet(out_path)
        (
            multi.join(survivors.select(id_col), id_col, "left_semi")
            .select(id_col, vec_col, "list_id")
            .write.mode("append")
            .partitionBy("list_id")
            .parquet(vector_store)
        )

    return process


def semantic_ingest(
    stream: DataFrame,
    out_path: str,
    vector_store: str,
    checkpoint: str,
    centroids: DataFrame,
    id_col: str = "doc_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    nprobe: int = 2,
) -> StreamingQuery:
    """Start incremental semantic dedup on a streaming DataFrame with
    an embedding column; returns the StreamingQuery. `centroids` is a
    (cent_id, cent_vec) DataFrame — fixed for the store's lifetime —
    collected once here (C×dim floats on the driver, the same bounded
    footprint as `ivf_assign_fast`)."""
    cent_rows = centroids.orderBy("cent_id").collect()
    c_ids = np.array([r[0] for r in cent_rows])
    c_norm = np.array([r[1] for r in cent_rows], dtype=np.float64)
    c_norm = c_norm / _safe_norm(c_norm)
    return (
        stream.writeStream.foreachBatch(
            _batch_processor(
                out_path,
                vector_store,
                c_ids,
                c_norm,
                id_col,
                vec_col,
                threshold,
                nprobe,
            )
        )
        .option("checkpointLocation", checkpoint)
        .start()
    )
