"""Tier F — LLM-data-pipeline extensions (SURVEY.md §2 tier F).

Dedup, similarity search, text analytics, multimodal — the operators
a 100 TB training-data pipeline needs. Implementations live in
pdf2dataset_spark/operators/{dedup,similarity,text,multimodal}.py;
these queries exercise them against the driver testdata.

The documents corpus has no duplicates (verified), so dedup queries
construct perturbed copies in-query — the oracle then checks real
collapse/candidate semantics instead of a trivially-empty result.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from pdf2dataset_spark.operators import dedup as dd
from pdf2dataset_spark.operators import similarity as sim
from pdf2dataset_spark.operators import text as tx
from pdf2dataset_spark.operators.multimodal import attach_fake_media, decode_media
from pdf2dataset_spark.queries import query
from pdf2dataset_spark.queries._util import t

# DuckDB twin of dedup.normalize_text + text_hash.
_SQL_NORM = "lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))"
_SQL_HASH = f"sha256({_SQL_NORM})"

# DuckDB twin of a doubled corpus: originals + uppercased copies
# (ids offset by 1e6) that normalize to the same text.
_SQL_DOUBLED = """
    SELECT doc_id, text, source FROM documents
    UNION ALL
    SELECT doc_id + 1000000 AS doc_id, upper(text) AS text, source
    FROM documents
"""


def _doubled_corpus(spark, sf_dir):
    d = t(spark, sf_dir, "documents").select("doc_id", "text", "source")
    copy = d.select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.upper("text").alias("text"),
        F.col("source"),
    )
    return d.unionByName(copy)


# --------------------------------------------------------------- F1
@query(
    "f1_exact_dedup",
    sql=f"""
    SELECT doc_id, text_sha256 FROM (
      SELECT doc_id, {_SQL_HASH} AS text_sha256,
             row_number() OVER (PARTITION BY {_SQL_HASH} ORDER BY doc_id) AS rn
      FROM ({_SQL_DOUBLED})
    ) WHERE rn = 1
    """,
    tier="F",
)
def f1_exact_dedup(spark, sf_dir):
    """Exact dedup: sha256(normalized text), deterministic keep-first
    (F1). Each uppercased copy collapses onto its original."""
    doubled = _doubled_corpus(spark, sf_dir)
    return dd.exact_dedup(doubled, "text", "doc_id").select("doc_id", "text_sha256")


# --------------------------------------------------------------- F2a
@query("f2a_minhash_lsh_candidates", sql=None, tier="F")
def f2a_minhash_lsh_candidates(spark, sf_dir):
    """MinHash(64) + LSH banding (16×4) candidate pairs (F2).

    xxhash64 has no DuckDB twin → rows-only; candidate quality is
    asserted in tests (each planted near-dup pair must be recalled).
    Planted near-dups: copies missing their last word, ids +1e6.
    """
    d = t(spark, sf_dir, "documents").select("doc_id", "text")
    toks = F.split(F.col("text"), " ")
    near = d.select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat_ws(" ", F.slice(toks, 1, F.size(toks) - 1)).alias("text"),
    )
    corpus = d.unionByName(near)
    sigs = corpus.select(
        "doc_id", dd.minhash_signature(dd.shingles("text", 3)).alias("minhash")
    )
    return dd.lsh_candidate_pairs(sigs, "doc_id", "minhash", bands=16, rows_per_band=4)


# --------------------------------------------------------------- F2b
_SQL_SHINGLES = """list_distinct(list_transform(
      generate_series(1, greatest(len(string_split(text,' ')) - 2, 1)),
      i -> array_to_string(string_split(text,' ')[i:i+2], ' ')))"""


@query(
    "f2b_jaccard_neardup",
    sql=f"""
    WITH corpus AS (
      SELECT doc_id, source, {_SQL_SHINGLES} AS sh FROM (
        SELECT doc_id, text, source FROM documents
        UNION ALL
        SELECT doc_id + 1000000,
               array_to_string(string_split(text,' ')[1:len(string_split(text,' '))-1], ' '),
               source
        FROM documents
      )
    ),
    tok AS (
      SELECT doc_id, source, len(sh) AS sz, unnest(sh) AS g FROM corpus
    ),
    co AS (
      SELECT a.doc_id AS id1, b.doc_id AS id2,
             a.sz AS sza, b.sz AS szb, COUNT(*) AS inter
      FROM tok a JOIN tok b
        ON a.source = b.source AND a.g = b.g AND a.doc_id < b.doc_id
      GROUP BY 1, 2, 3, 4
    )
    SELECT id1, id2,
           CAST(inter AS DOUBLE) / (sza + szb - inter) AS jaccard
    FROM co
    WHERE CAST(inter AS DOUBLE) / (sza + szb - inter) >= 0.8
    """,
    tier="F",
)
def f2b_jaccard_neardup(spark, sf_dir):
    """Exact n-gram-shingle Jaccard near-dup pairs, blocked by source
    (F2 exact path). Planted truncated copies must pair with their
    originals at J ≥ 0.8."""
    d = t(spark, sf_dir, "documents").select("doc_id", "text", "source")
    toks = F.split(F.col("text"), " ")
    near = d.select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat_ws(" ", F.slice(toks, 1, F.size(toks) - 1)).alias("text"),
        F.col("source"),
    )
    corpus = d.unionByName(near).withColumn("sh", dd.shingles("text", 3))
    return dd.jaccard_pairs(corpus, "doc_id", "sh", block_col="source", threshold=0.8)


# --------------------------------------------------------------- F3
_SQL_DOT = """list_aggregate(list_transform(generate_series(1, 64),
      i -> CAST(a.embedding[i] AS DOUBLE) * CAST(q.embedding[i] AS DOUBLE)), 'sum')"""
_SQL_NORM_A = """sqrt(list_aggregate(list_transform(generate_series(1, 64),
      i -> CAST(a.embedding[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE)), 'sum'))"""
_SQL_NORM_Q = """sqrt(list_aggregate(list_transform(generate_series(1, 64),
      i -> CAST(q.embedding[i] AS DOUBLE) * CAST(q.embedding[i] AS DOUBLE)), 'sum'))"""


@query(
    "f3_cosine_similarity",
    sql=f"""
    SELECT a.vec_id,
           {_SQL_DOT} AS dot_q,
           {_SQL_DOT} / ({_SQL_NORM_A} * {_SQL_NORM_Q}) AS cos_sim
    FROM embeddings a, (SELECT embedding FROM embeddings WHERE vec_id = 0) q
    """,
    tier="F",
)
def f3_cosine_similarity(spark, sf_dir):
    """Cosine similarity of every vector vs the vec_id=0 query vector
    (F3) — sequential float64 list arithmetic, bitwise-checkable."""
    e = t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qvec"))
    joined = e.crossJoin(F.broadcast(q))
    return joined.select(
        "vec_id",
        sim.dot(F.col("embedding"), F.col("qvec")).alias("dot_q"),
        sim.cosine(F.col("embedding"), F.col("qvec")).alias("cos_sim"),
    )


# --------------------------------------------------------------- F4
@query(
    "f4_topk_cosine",
    sql=f"""
    WITH q AS (SELECT vec_id AS query_id, embedding FROM embeddings
               WHERE vec_id IN (0, 1, 2)),
    sims AS (
      SELECT q.query_id, a.vec_id,
             {_SQL_DOT} / ({_SQL_NORM_A} * {_SQL_NORM_Q}) AS cos_sim
      FROM embeddings a, q
      WHERE a.vec_id <> q.query_id
    )
    SELECT query_id, vec_id, cos_sim, rank FROM (
      SELECT query_id, vec_id, cos_sim,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cos_sim DESC, vec_id) AS rank
      FROM sims
    ) WHERE rank <= 5
    """,
    tier="F",
)
def f4_topk_cosine(spark, sf_dir):
    """Brute-force top-5 cosine neighbors for 3 query vectors (F4)."""
    e = t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id").isin(0, 1, 2)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    return sim.topk_cosine(e, q, k=5)


# --------------------------------------------------------------- F5
@query("f5_lsh_approx_topk", sql=None, tier="F")
def f5_lsh_approx_topk(spark, sf_dir):
    """Random-hyperplane LSH bucketed approximate top-k (F5) — the
    100 TB scale path for similarity search. Randomized bucketing →
    rows-only; recall vs brute force asserted in tests."""
    e = t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id").isin(0, 1, 2)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    return sim.lsh_bucket_topk(e, q, dim=64, k=5, planes=3, tables=8)


# --------------------------------------------------------------- F5b
@query("f5b_ivf_topk", sql=None, tier="F")
def f5b_ivf_topk(spark, sf_dir):
    """IVF-style coarse-quantized ANN (F5 variant): assign to nearest
    centroid list, probe 2 lists per query. Rows-only."""
    e = t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id").isin(0, 1, 2)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    return sim.ivf_topk(e, q, n_centroids=16, nprobe=2, k=5)


@query("f5c_topk_cosine_packed", sql=None, tier="F")
def f5c_topk_cosine_packed(spark, sf_dir):
    """Packed-binary brute-force top-k (F4's Arrow/numpy scale path):
    embeddings packed to little-endian float32 binary once, then each
    Arrow batch decodes with one frombuffer+reshape and scores with a
    blocked matmul — the per-row object overhead that dominates
    list<double> UDF boundaries vanishes (19x at 1M vectors,
    tools/bench_ann.py). fp32 scoring -> rows-only; agreement with the
    exact JVM path asserted in tests."""
    e = t(spark, sf_dir, "embeddings")
    dim = len(e.select("embedding").first()[0])
    q = e.filter(F.col("vec_id").isin(0, 1, 2)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    packed = e.select(
        "vec_id", sim.pack_embedding("embedding").alias("embedding_bin")
    )
    return sim.topk_cosine_packed(packed, q, dim=dim, k=5)


@query(
    "f5d_pq_adc_topk",
    sql="""
    WITH corpus AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ),
    cb AS (
      SELECT s.sub_id, c.vec_id AS code_id, c.v AS code_full
      FROM (SELECT vec_id, v FROM corpus WHERE vec_id < 4) c
      CROSS JOIN (SELECT unnest([0, 1]) AS sub_id) s
    ),
    assign AS (
      SELECT vec_id, sub_id, code_id FROM (
        SELECT a.vec_id, b.sub_id, b.code_id,
               row_number() OVER (
                 PARTITION BY a.vec_id, b.sub_id
                 ORDER BY list_aggregate(list_transform(
                     generate_series(1, 32),
                     i -> (a.v[b.sub_id * 32 + i] - b.code_full[b.sub_id * 32 + i])
                        * (a.v[b.sub_id * 32 + i] - b.code_full[b.sub_id * 32 + i])
                   ), 'sum'), b.code_id) AS rn
        FROM corpus a CROSS JOIN cb b
      ) WHERE rn = 1
    ),
    lut AS (
      SELECT q.vec_id AS query_id, b.sub_id, b.code_id,
             list_aggregate(list_transform(generate_series(1, 32),
               i -> q.v[b.sub_id * 32 + i] * b.code_full[b.sub_id * 32 + i]),
               'sum') AS ip
      FROM (SELECT vec_id, v FROM corpus WHERE vec_id < 3) q
      CROSS JOIN cb b
    ),
    scored AS (
      SELECT l.query_id, a.vec_id,
             sum(CASE WHEN a.sub_id = 0 THEN l.ip END)
           + sum(CASE WHEN a.sub_id = 1 THEN l.ip END) AS approx_score
      FROM assign a
      JOIN lut l ON l.sub_id = a.sub_id AND l.code_id = a.code_id
      WHERE a.vec_id <> l.query_id
      GROUP BY l.query_id, a.vec_id
    )
    SELECT query_id, vec_id, approx_score, rank FROM (
      SELECT query_id, vec_id, approx_score,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY approx_score DESC, vec_id) AS rank
      FROM scored
    ) WHERE rank <= 5
    """,
    tier="F",
)
def f5d_pq_adc_topk(spark, sf_dir):
    """Product-quantization ADC top-k (F5 variant, FULL oracle): the
    memory-bound ANN path for a 100 TB embedding store — each vector
    quantizes to m uint8 subspace codes (32x smaller than fp32 at
    m=dim/8), and search sums m LUT gathers per vector instead of a
    dim-wide dot (Jegou et al. 2011). This entry runs the exact-fold
    variant (similarity.pq_encode / pq_topk_exact) with deterministic
    first-4-by-id seed codebooks, m=2 subspaces of 32 dims: the DuckDB
    twin replays the argmin-L2 encode (row_number over the identical
    sequential-fold distance, code_id tie-break) and the per-(query,
    vector) two-term ADC sum bitwise. The numpy packed-codes scale
    path (pq_train / pq_encode_fast / pq_topk) is covered by planted-
    duplicate tests and tools/bench_ann.py."""
    e = t(spark, sf_dir, "embeddings")
    cb = sim.pq_codebooks(e, dim=64, m=2, ksub=4)
    q = e.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    return sim.pq_topk_exact(e, cb, q, dim=64, m=2, k=5)


@query("f5e_ivfpq_topk", sql=None, tier="F")
def f5e_ivfpq_topk(spark, sf_dir):
    """IVF+PQ residual ANN (F5 scale flagship): coarse centroids route
    queries to nprobe lists; product-quantized RESIDUAL codes (m uint8
    bytes/vector) score via per-list scalar + LUT gathers — the
    FAISS-IndexIVFPQ shape, memory-bound at 100 TB (the index is
    id + list + m bytes per vector). k-means codebooks + numpy ADC →
    rows-only; ADC-definition replay, planted-duplicate retrieval and
    partner-recall laws in tests/test_pq.py + tools/bench_ann.py."""
    e = t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    cents = sim._ivf_centroids(e, 8, "vec_id", "embedding")
    idx, cb = sim.ivfpq_build(
        e, cents, dim=64, m=8, ksub=16, iters=3, sample_rows=65_536
    )
    q = e.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    return sim.ivfpq_topk(
        idx, cents, cb, q, dim=64, m=8, ksub=16, nprobe=2, k=5
    )


# --------------------------------------------------------------- F6
@query(
    "f6_text_statistics",
    sql="""
    SELECT doc_id,
           length(text) AS q_n_chars,
           len(string_split(text, ' ')) AS q_n_tokens,
           CAST(length(text) - (len(string_split(text, ' ')) - 1) AS DOUBLE)
             / len(string_split(text, ' ')) AS q_mean_token_len,
           CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
             / len(string_split(text, ' ')) AS q_type_token_ratio,
           len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS n_bpe_ish,
           (length(text) = n_chars) AS chars_invariant
    FROM documents
    """,
    tier="F",
)
def f6_text_statistics(spark, sf_dir):
    """Token/char statistics incl. BPE-ish token count and the
    n_chars invariant (F6)."""
    d = t(spark, sf_dir, "documents")
    out = tx.quality_features(d)
    return out.select(
        "doc_id",
        "q_n_chars",
        F.col("q_n_tokens").cast("bigint").alias("q_n_tokens"),
        "q_mean_token_len",
        "q_type_token_ratio",
        tx.token_count("text", bpe=True).cast("bigint").alias("n_bpe_ish"),
        (F.length("text") == F.col("n_chars")).alias("chars_invariant"),
    )


# --------------------------------------------------------------- F7
@query(
    "f7_quality_language_filter",
    sql="""
    SELECT doc_id, lang,
           len(string_split(text, ' ')) AS q_n_tokens
    FROM documents
    WHERE lang IN ('en', 'de', 'fr')
      AND len(string_split(text, ' ')) BETWEEN 10 AND 1000
      AND CAST(length(text) - (len(string_split(text, ' ')) - 1) AS DOUBLE)
            / len(string_split(text, ' ')) BETWEEN 2.0 AND 12.0
    """,
    tier="F",
)
def f7_quality_language_filter(spark, sf_dir):
    """Language + quality gate (F7): declared-language whitelist ∧
    token-count band ∧ mean-token-length band."""
    d = t(spark, sf_dir, "documents").filter(F.col("lang").isin("en", "de", "fr"))
    out = tx.quality_filter(d, min_tokens=10, max_tokens=1000)
    return out.select(
        "doc_id", "lang", F.col("q_n_tokens").cast("bigint").alias("q_n_tokens")
    )


# --------------------------------------------------------------- F8
@query("f8_multimodal_decode", sql=None, tier="F")
def f8_multimodal_decode(spark, sf_dir):
    """Multimodal columns (F8): binary payload + typed metadata
    struct, Arrow-batched mapInPandas decode (stubbed codec). The
    decoded dims must round-trip the attached metadata — asserted in
    tests; rows-only here (binary payloads aren't SQL-comparable)."""
    d = t(spark, sf_dir, "documents").select("doc_id", "text")
    media = attach_fake_media(d)
    return decode_media(media).select(
        "doc_id", "dec_width", "dec_height", "dec_frames", "dec_ok"
    )


# --------------------------------------------------------------- F9
@query(
    "f9_tfidf_top_terms",
    sql="""
    WITH tf AS (
      SELECT doc_id, word, COUNT(*) AS tf
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents)
      GROUP BY doc_id, word
    ),
    df AS (SELECT word, COUNT(DISTINCT doc_id) AS df_count FROM tf GROUP BY word),
    n AS (SELECT COUNT(*) AS n_docs FROM documents)
    SELECT doc_id, word AS top_term, tf, df_count, score FROM (
      SELECT tf.doc_id, tf.word, tf.tf, df.df_count,
             CAST(tf.tf AS DOUBLE) * n.n_docs / df.df_count AS score,
             row_number() OVER (PARTITION BY tf.doc_id
                                ORDER BY CAST(tf.tf AS DOUBLE) * n.n_docs / df.df_count DESC,
                                         tf.word) AS rn
      FROM tf JOIN df USING (word) CROSS JOIN n
    ) WHERE rn = 1
    """,
    tier="F",
)
def f9_tfidf_top_terms(spark, sf_dir):
    """TF-IDF-style keyword extraction (F9): raw-ratio idf (tf·N/df)
    keeps the math deterministic (ln is not cross-engine bitwise);
    top term per document with deterministic tie-break."""
    d = t(spark, sf_dir, "documents")
    # ONE shuffle keyed on `word` serves everything word-keyed:
    # HashPartitioning(word) satisfies the (doc_id, word) tf groupBy
    # (partitioning-subset rule), and since tf rows are UNIQUE per
    # (doc_id, word), df_count is simply count(*) over a word window
    # on tf — no second scan of the token stream, no tf ⋈ df join.
    # The exploded token stream (the big flow at 100 TB) moves exactly
    # once. Known skew: a stopword's partition holds ≤ n_docs tf rows
    # (post-combine), the same bound the join formulation had; salt
    # the repartition key if vocabulary skew ever dominates.
    words = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("word")
    ).repartition("word")
    tf = words.groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("tf"))
    # N kept lazy: 1-row broadcast agg crossJoin instead of an eager
    # d.count() at plan-build time (which cost a driver action + a full
    # extra scan per plan construction — a scale-killer at 100 TB).
    n_docs = d.agg(F.count(F.lit(1)).alias("n_docs"))
    w_word = Window.partitionBy("word")
    scored = (
        tf.withColumn("df_count", F.count(F.lit(1)).over(w_word))
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score",
            F.col("tf").cast("double") * F.col("n_docs") / F.col("df_count"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("word"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "doc_id", F.col("word").alias("top_term"), "tf", "df_count", "score"
        )
    )


# --------------------------------------------------------------- F10
@query(
    "f10_doc_fingerprint",
    sql="""
    SELECT doc_id,
           list_aggregate(list_transform(
             generate_series(1, greatest(length(text) - 19, 1)),
             i -> md5(substring(text, i, 20))), 'min') AS fingerprint
    FROM documents
    """,
    tier="F",
)
def f10_doc_fingerprint(spark, sf_dir):
    """Rolling-hash document fingerprint (winnowing-lite): min md5
    over 20-char windows (F: fingerprinting)."""
    d = t(spark, sf_dir, "documents")
    return d.select(
        "doc_id", tx.char_ngram_fingerprint("text", 20).alias("fingerprint")
    )


# --------------------------------------------------------------- F11
@query("f11_simhash_hamming", sql=None, tier="F")
def f11_simhash_hamming(spark, sf_dir):
    """SimHash64 fingerprints + Hamming distance to doc 0 (F2 family,
    xxhash64-based → rows-only)."""
    d = t(spark, sf_dir, "documents").select(
        "doc_id", dd.simhash64(tx.ws_tokens("text")).alias("simhash")
    )
    ref = d.filter(F.col("doc_id") == 0).select(
        F.col("simhash").alias("ref_hash")
    )
    return d.crossJoin(F.broadcast(ref)).select(
        "doc_id",
        "simhash",
        dd.hamming64(F.col("simhash"), F.col("ref_hash")).alias("hamming_to_doc0"),
    )


# --------------------------------------------------------------- F12
@query(
    "f12_lang_id_heuristic",
    sql="""
    SELECT doc_id,
           CAST(len(list_filter(string_split(lower(text), ' '),
                t -> list_contains(['the','and','of','to','in','is','that','it','for','was'], t)))
             AS DOUBLE) / len(string_split(text, ' ')) AS en_score
    FROM documents
    """,
    tier="F",
)
def f12_lang_id_heuristic(spark, sf_dir):
    """Language-ID scoring primitive (F: language ID): per-language
    stopword-hit ratio. The testdata vocabulary is language-neutral
    (verified), so the oracle checks the en-profile *score*; the full
    argmax classifier (operators/text.py lang_id) is tested on real
    multilingual fixtures in tests/."""
    d = t(spark, sf_dir, "documents")
    en = tx.LANG_PROFILES["en"]
    toks = tx.ws_tokens(F.lower(F.col("text")))
    score = (
        F.size(F.filter(toks, lambda tok: tok.isin(en))).cast("double")
        / F.size(tx.ws_tokens("text"))
    )
    return d.select("doc_id", score.alias("en_score"))


# --------------------------------------------------------------- F13
@query(
    "f13_embedding_neardup",
    sql=f"""
    SELECT a.vec_id AS id1, q.vec_id AS id2,
           {_SQL_DOT} / ({_SQL_NORM_A} * {_SQL_NORM_Q}) AS cos_sim
    FROM embeddings a
    JOIN (SELECT vec_id, label, embedding FROM embeddings) q
      ON a.label = q.label AND a.vec_id < q.vec_id
    WHERE {_SQL_DOT} / ({_SQL_NORM_A} * {_SQL_NORM_Q}) >= 0.4
    """,
    tier="F",
)
def f13_embedding_neardup(spark, sf_dir):
    """Embedding-cosine near-duplicate pairs (F2 embedding variant):
    pairwise cosine within a label block, threshold 0.4. At corpus
    scale the block key becomes an LSH bucket (f5) — the plan shape
    (block equi-join → HOF cosine → filter) is unchanged."""
    e = t(spark, sf_dir, "embeddings")
    a = e.select(
        F.col("vec_id").alias("id1"),
        F.col("label").alias("lbl_a"),
        F.col("embedding").alias("vec_a"),
    )
    b = e.select(
        F.col("vec_id").alias("id2"),
        F.col("label").alias("lbl_b"),
        F.col("embedding").alias("vec_b"),
    )
    pairs = a.join(
        b, (F.col("lbl_a") == F.col("lbl_b")) & (F.col("id1") < F.col("id2"))
    )
    cos = sim.cosine(F.col("vec_a"), F.col("vec_b"))
    return pairs.select("id1", "id2", cos.alias("cos_sim")).filter(
        F.col("cos_sim") >= 0.4
    )


# --------------------------------------------------------------- F14
@query(
    "f14_text_cleaning",
    sql="""
    SELECT doc_id,
           regexp_replace(
             regexp_replace(
               regexp_replace(concat('see http://ex.com/', doc_id,
                              ' mail a', doc_id, '@b.co  ', text),
                              'https?://[^ ]+', '<URL>', 'g'),
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             ' +', ' ', 'g') AS cleaned
    FROM documents
    """,
    tier="F",
)
def f14_text_cleaning(spark, sf_dir):
    """Boilerplate/PII scrubbing (training-data cleaning): URL and
    email redaction + whitespace collapse, pure regexp_replace chain
    (scan-speed at 100 TB). Noise is injected in-query so the
    patterns actually fire on this corpus."""
    d = t(spark, sf_dir, "documents")
    noisy = F.concat(
        F.lit("see http://ex.com/"),
        F.col("doc_id").cast("string"),
        F.lit(" mail a"),
        F.col("doc_id").cast("string"),
        F.lit("@b.co  "),
        F.col("text"),
    )
    cleaned = F.regexp_replace(noisy, r"https?://[^ ]+", "<URL>")
    cleaned = F.regexp_replace(
        cleaned, r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"
    )
    cleaned = F.regexp_replace(cleaned, " +", " ")
    return d.select("doc_id", cleaned.alias("cleaned"))


# --------------------------------------------------------------- F16
@query("f16_stratified_sample", sql=None, tier="F")
def f16_stratified_sample(spark, sf_dir):
    """Stratified sampling by language (training-mix control):
    sampleBy with per-stratum fractions — seeded RNG → rows-only;
    per-stratum proportions asserted in tests."""
    d = t(spark, sf_dir, "documents")
    fractions = {"en": 0.5, "fr": 1.0, "es": 1.0, "de": 1.0, "zh": 0.25}
    return d.sampleBy("lang", fractions, seed=42).select("doc_id", "lang")


# --------------------------------------------------------------- F17
@query(
    "f17_hash_train_test_split",
    sql="""
    SELECT doc_id,
           (md5(CAST(doc_id AS VARCHAR)) < 'e6666666') AS is_train
    FROM documents
    """,
    tier="F",
)
def f17_hash_train_test_split(spark, sf_dir):
    """Deterministic ~90/10 train/test split by content-stable hash:
    md5 hex compares lexicographically, so the threshold 'e6666666'
    keeps ≈ 0xe6666666/0x100000000 ≈ 90% in train — reproducible
    across engines, runs, and cluster sizes (no RNG state), the
    property that matters when re-materializing a 100 TB corpus."""
    d = t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        (F.md5(F.col("doc_id").cast("string")) < "e6666666").alias("is_train"),
    )


# --------------------------------------------------------------- F18
@query(
    "f18_neardup_clustering",
    sql=f"""
    WITH RECURSIVE base AS (
      SELECT doc_id, text, source FROM documents WHERE doc_id < 100
    ),
    g1 AS (
      SELECT doc_id + 1000000 AS doc_id,
             array_to_string(string_split(text,' ')[1:len(string_split(text,' '))-1], ' ') AS text,
             source FROM base
    ),
    g2 AS (
      SELECT doc_id + 1000000 AS doc_id,
             array_to_string(string_split(text,' ')[1:len(string_split(text,' '))-1], ' ') AS text,
             source FROM g1
    ),
    corpus AS (
      SELECT doc_id, source, {_SQL_SHINGLES} AS sh FROM (
        SELECT * FROM base UNION ALL SELECT * FROM g1 UNION ALL SELECT * FROM g2
      )
    ),
    tok AS (
      SELECT doc_id, source, len(sh) AS sz, unnest(sh) AS g FROM corpus
    ),
    co AS (
      SELECT a.doc_id AS id1, b.doc_id AS id2,
             a.sz AS sza, b.sz AS szb, COUNT(*) AS inter
      FROM tok a JOIN tok b
        ON a.source = b.source AND a.g = b.g AND a.doc_id < b.doc_id
      GROUP BY 1, 2, 3, 4
    ),
    pairs AS (
      SELECT id1, id2 FROM co
      WHERE CAST(inter AS DOUBLE) / (sza + szb - inter) >= 0.8
    ),
    edges AS (
      SELECT id1 AS a, id2 AS b FROM pairs
      UNION
      SELECT id2 AS a, id1 AS b FROM pairs
    ),
    walk(node, label) AS (
      SELECT a, a FROM edges
      UNION
      SELECT e.b, w.label FROM walk w JOIN edges e ON e.a = w.node
    )
    SELECT node AS doc_id, MIN(label) AS cluster_id
    FROM walk GROUP BY node
    """,
    tier="F",
)
def f18_neardup_clustering(spark, sf_dir):
    """Near-dup pairs → connected components → one representative per
    cluster (the final dedup step after LSH/Jaccard pair generation).
    The fixpoint label propagation is iterative on the Spark side,
    but its RESULT (component = min reachable id) is deterministic
    and SQL-expressible as a recursive CTE — so this carries a full
    oracle despite being the 'iterative algorithm' class. Corpus:
    originals + TWO perturbed generations (A→A', A'→A'') so
    components genuinely need transitivity — A and A'' never pair
    directly."""
    from pdf2dataset_spark.operators.cluster import connected_components

    d = (
        t(spark, sf_dir, "documents")
        .select("doc_id", "text", "source")
        .filter(F.col("doc_id") < 100)
    )
    toks = F.split(F.col("text"), " ")
    gen1 = d.select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat_ws(" ", F.slice(toks, 1, F.size(toks) - 1)).alias("text"),
        F.col("source"),
    )
    toks1 = F.split(F.col("text"), " ")
    gen2 = gen1.select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat_ws(" ", F.slice(toks1, 1, F.size(toks1) - 1)).alias("text"),
        F.col("source"),
    )
    corpus = d.unionByName(gen1).unionByName(gen2).withColumn(
        "sh", dd.shingles("text", 3)
    )
    pairs = dd.jaccard_pairs(corpus, "doc_id", "sh", block_col="source", threshold=0.8)
    comp = connected_components(pairs.select("id1", "id2"))
    return comp.select(
        F.col("node").alias("doc_id"), F.col("component").alias("cluster_id")
    )


@query(
    "f19_token_chunking",
    sql="""
    WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks
               FROM documents),
         c AS (SELECT doc_id, toks,
                      greatest(CAST(floor((len(toks) - 8 + 23) / 24.0)
                                    AS INT), 1) AS n_chunks
               FROM d)
    SELECT doc_id, i AS chunk_id,
           array_to_string(
             list_slice(toks, i*24 + 1, least(i*24 + 32, len(toks))),
             ' ') AS chunk_text,
           least(i*24 + 32, len(toks)) - (i*24 + 1) + 1 AS chunk_tokens
    FROM c, unnest(generate_series(0, n_chunks - 1)) AS u(i)
    ORDER BY doc_id, chunk_id
    """,
    tier="F",
)
def f19_token_chunking(spark, sf_dir):
    """Pre-training token-window chunking (window 32, overlap 8): each
    document explodes into its overlapping chunks entirely inside the
    scan stage — per-row op, zero shuffle, so at 100 TB it pipelines
    with the parquet read. Exact integer index math makes the chunk
    boundaries oracle-checkable against DuckDB list slicing."""
    from pdf2dataset_spark.operators import text as tx

    docs = t(spark, sf_dir, "documents")
    return tx.chunk_tokens(docs, window=32, overlap=8).orderBy(
        "doc_id", "chunk_id"
    )


@query(
    "f20_repetition_stats",
    sql="""
    WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks
               FROM documents),
         b AS (SELECT doc_id, toks,
                      list_transform(
                        generate_series(1, greatest(len(toks)-1, 1)),
                        i -> array_to_string(
                               list_slice(toks, i, least(i+1, len(toks))),
                               ' ')) AS bg
               FROM d)
    SELECT doc_id, len(toks) AS n_tokens,
           1.0 - CAST(len(list_distinct(bg)) AS DOUBLE)
                 / CAST(len(bg) AS DOUBLE) AS dup_bigram_frac,
           CAST(list_max(list_transform(list_distinct(toks),
                  u -> len(list_filter(toks, x -> x = u)))) AS DOUBLE)
             / CAST(len(toks) AS DOUBLE) AS top_token_frac
    FROM b
    ORDER BY doc_id
    """,
    tier="F",
)
def f20_repetition_stats(spark, sf_dir):
    """Gopher-style repetition quality signals (duplicate-bigram
    fraction, top-token share) — exact integer counts divided once in
    double so every value hash-matches DuckDB. Per-row HOFs, zero
    shuffle."""
    from pdf2dataset_spark.operators import text as tx

    docs = t(spark, sf_dir, "documents")
    return tx.repetition_stats(docs).orderBy("doc_id")


# --------------------------------------------------------------- F21
_SQL_SHINGLE5 = "array_to_string(tk[i.g:i.g+4], ' ')"
_SQL_SHIDX = "unnest(generate_series(1, greatest(len(tk)-4, 1))) AS i(g)"


@query(
    "f21_contamination_check",
    sql=f"""
    WITH evalc AS (
      SELECT doc_id, text FROM documents WHERE source <> 'src0'
      UNION ALL
      SELECT doc_id + 1000000 AS doc_id, text FROM documents
      WHERE source = 'src0' AND doc_id % 7 = 0
    ),
    esh AS (
      SELECT DISTINCT doc_id, {_SQL_SHINGLE5} AS shingle
      FROM (SELECT doc_id, string_split(text, ' ') AS tk FROM evalc),
           {_SQL_SHIDX}
    ),
    bsh AS (
      SELECT DISTINCT {_SQL_SHINGLE5} AS shingle
      FROM (SELECT string_split(text, ' ') AS tk FROM documents
            WHERE source = 'src0'),
           {_SQL_SHIDX}
    ),
    tot AS (SELECT doc_id, count(*) AS n_shingles FROM esh GROUP BY doc_id),
    hit AS (
      SELECT e.doc_id, count(*) AS n_hit FROM esh e
      WHERE EXISTS (SELECT 1 FROM bsh b WHERE b.shingle = e.shingle)
      GROUP BY e.doc_id
    )
    SELECT t.doc_id, t.n_shingles,
           COALESCE(h.n_hit, 0) AS n_hit,
           CAST(COALESCE(h.n_hit, 0) AS DOUBLE) / t.n_shingles
             AS contamination_frac
    FROM tot t LEFT JOIN hit h ON t.doc_id = h.doc_id
    WHERE CAST(COALESCE(h.n_hit, 0) AS DOUBLE) / t.n_shingles >= 0.5
    ORDER BY t.doc_id
    """,
    tier="F",
)
def f21_contamination_check(spark, sf_dir):
    """Benchmark-contamination screen (decontamination, F21): treat
    source 'src0' as a held-out benchmark and flag eval documents
    whose distinct 5-gram shingle overlap with the benchmark exceeds
    50% — the standard n-gram decontamination gate run before
    training-corpus release. Planted copies of benchmark docs
    (doc_id % 7 = 0, ids offset by 1e6) must surface at frac 1.0.

    Plan: eval shingles explode once (no shuffle), probe the DISTINCT
    benchmark shingle set via broadcast LEFT SEMI join, one groupBy on
    doc_id — the corpus text itself never shuffles (operator:
    dedup.ngram_contamination)."""
    d = t(spark, sf_dir, "documents")
    evalc = d.filter(F.col("source") != "src0").select("doc_id", "text")
    planted = (
        d.filter((F.col("source") == "src0") & (F.col("doc_id") % 7 == 0))
        .select((F.col("doc_id") + 1000000).alias("doc_id"), "text")
    )
    bench = d.filter(F.col("source") == "src0").select("text")
    rep = dd.ngram_contamination(
        evalc.unionByName(planted), bench, n=5
    )
    return rep.filter(F.col("contamination_frac") >= 0.5).orderBy("doc_id")


# --------------------------------------------------------------- F22
@query(
    "f22_token_shard_packing",
    sql="""
    WITH d AS (
      SELECT doc_id, len(string_split(text, ' ')) AS n_tokens
      FROM documents
    ), c AS (
      SELECT doc_id, n_tokens,
             SUM(n_tokens) OVER (
               ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) - n_tokens AS start_tok
      FROM d
    )
    SELECT CAST(start_tok // 2000 AS BIGINT) AS shard_id,
           count(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS shard_tokens,
           min(doc_id) AS first_doc,
           max(doc_id) AS last_doc
    FROM c GROUP BY shard_id ORDER BY shard_id
    """,
    tier="F",
)
def f22_token_shard_packing(spark, sf_dir):
    """Contiguous token-budget shard packing (F22): assign documents
    (in deterministic doc_id order) to training shards of ~2000 tokens
    by exclusive-prefix-sum division — every engine and every run
    produces the identical shard map, the property a reproducible
    data-mix recipe needs. Token counts are exact integers so the
    assignment is engine-invariant by construction.

    Scale path: the running sum goes through
    operators/rank.global_prefix_sum — range partition on doc_id,
    partition-local running-sum windows, per-partition totals (one
    row each) cumulated into broadcast offsets. Token counts are
    integers so the split sum is bit-identical to a global window;
    no row of the corpus ever crosses a single-partition window."""
    from pdf2dataset_spark.operators.rank import global_prefix_sum

    d = t(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split(F.col("text"), " ")).alias("n_tokens")
    )
    c = global_prefix_sum(
        d, [F.col("doc_id")], "n_tokens", sum_col="__run_tok"
    ).select(
        "doc_id",
        "n_tokens",
        (F.col("__run_tok") - F.col("n_tokens")).alias("start_tok"),
    )
    return (
        c.groupBy(
            F.expr("start_tok div 2000").cast("bigint").alias("shard_id")
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("shard_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .orderBy("shard_id")
    )


# --------------------------------------------------------------- F23
@query(
    "f23_pii_redaction",
    sql="""
    WITH noisy AS (
      SELECT doc_id,
             concat('tel +1 (555) 123-', lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0'),
                    ' ip 10.0.', CAST(doc_id % 256 AS VARCHAR), '.7',
                    ' acct 4111111111111111 ', text) AS text
      FROM documents
    )
    SELECT doc_id,
           regexp_replace(regexp_replace(regexp_replace(regexp_replace(
             regexp_replace(text, 'https?://[^ ]+', '<URL>', 'g'),
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             '\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b', '<IP>', 'g'),
             '\\+?[0-9]{1,3}[- .]?\\([0-9]{3}\\)[- .]?[0-9]{3}[- .]?[0-9]{4}|\\+?[0-9]{1,3}[- .][0-9]{3}[- .][0-9]{3}[- .]?[0-9]{4}', '<PHONE>', 'g'),
             '\\b[0-9]{13,19}\\b', '<DIGITRUN>', 'g') AS redacted,
           len(regexp_extract_all(text,
             '\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b')) AS n_ip,
           len(regexp_extract_all(text,
             '\\+?[0-9]{1,3}[- .]?\\([0-9]{3}\\)[- .]?[0-9]{3}[- .]?[0-9]{4}|\\+?[0-9]{1,3}[- .][0-9]{3}[- .][0-9]{3}[- .]?[0-9]{4}')) AS n_phone,
           len(regexp_extract_all(text, '\\b[0-9]{13,19}\\b')) AS n_digitrun
    FROM noisy ORDER BY doc_id
    """,
    tier="F",
)
def f23_pii_redaction(spark, sf_dir):
    """Typed PII redaction for corpus release (F23; extends f14's
    URL/email pass): phone numbers, IPv4 addresses, and card-shaped
    digit runs are replaced with typed tags and counted per category
    from the ORIGINAL text (audit rates per source). Noise is
    injected in-query so every pattern fires deterministically.
    Patterns live in operators/text.PII_PATTERNS, restricted to the
    regex subset Java and RE2 parse identically — the whole pass is a
    JVM regexp chain, shuffle-free, scan-speed at 100 TB."""
    d = t(spark, sf_dir, "documents")
    noisy = d.select(
        "doc_id",
        F.concat(
            F.lit("tel +1 (555) 123-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            F.lit(" ip 10.0."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit(".7 acct 4111111111111111 "),
            F.col("text"),
        ).alias("text"),
    )
    red = tx.redact_pii(noisy, "text")
    return red.select(
        "doc_id",
        "redacted",
        F.col("n_ip").cast("bigint").alias("n_ip"),
        F.col("n_phone").cast("bigint").alias("n_phone"),
        F.col("n_digitrun").cast("bigint").alias("n_digitrun"),
    ).orderBy("doc_id")


# --------------------------------------------------------------- F25
@query(
    "f25_line_dedup",
    sql="""
    WITH corpus AS (
      SELECT doc_id,
             ['SUBSCRIBE to our newsletter today'] ||
             list_transform(generate_series(1, (len(tk)+9)//10),
               i -> array_to_string(tk[(i-1)*10+1:(i-1)*10+10], ' '))
               AS lines
      FROM (SELECT doc_id, string_split(text, ' ') AS tk FROM documents)
    ),
    lx AS (
      SELECT doc_id, i.g - 1 AS pos, lines[i.g] AS line
      FROM corpus, unnest(generate_series(1, len(lines))) AS i(g)
    ),
    kept AS (
      SELECT doc_id, pos, line FROM (
        SELECT doc_id, pos, line,
               row_number() OVER (PARTITION BY line ORDER BY doc_id, pos)
                 AS rn
        FROM lx) WHERE rn = 1
    )
    SELECT doc_id,
           string_agg(line, chr(10) ORDER BY pos) AS deduped_text,
           count(*) AS n_lines_kept
    FROM kept GROUP BY doc_id ORDER BY doc_id
    """,
    tier="F",
)
def f25_line_dedup(spark, sf_dir):
    """Line-grain exact dedup / boilerplate removal (F25) — the
    RefinedWeb/Gopher-style pass that strips repeated navigation
    chrome: documents are reframed as newline-joined 10-token lines
    with a shared boilerplate banner injected at the head of EVERY
    doc; the operator keeps only the first corpus-wide occurrence of
    each distinct line (deterministic (doc_id, pos) order) and
    reassembles docs from their surviving lines. The banner must
    survive in exactly one document. Operator: text.line_dedup;
    plan: posexplode → one rank window on the high-entropy line key →
    keyed reassembly, with payload moving at line grain throughout."""
    d = t(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    n_lines = F.expr("(size(split(text, ' ')) + 9) div 10")
    lines = F.concat(
        F.array(F.lit("SUBSCRIBE to our newsletter today")),
        F.transform(
            F.sequence(F.lit(1), n_lines),
            lambda i: F.concat_ws(" ", F.slice(toks, (i - 1) * 10 + 1, 10)),
        ),
    )
    corpus = d.select(
        "doc_id", F.array_join(lines, "\n").alias("text")
    )
    return tx.line_dedup(corpus, "doc_id", "text").orderBy("doc_id")


# --------------------------------------------------------------- F26
@query(
    "f26_token_rarity_score",
    sql="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok
      FROM documents
    ),
    cnts AS (SELECT tok, count(*) AS cnt FROM tok GROUP BY tok)
    SELECT t.doc_id,
           count(*) AS n_tokens,
           CAST(CAST(SUM(1000000000 // c.cnt) AS BIGINT) AS DOUBLE)
             / 1000000000 / count(*) AS rarity_score
    FROM tok t JOIN cnts c USING (tok)
    GROUP BY t.doc_id ORDER BY t.doc_id
    """,
    tier="F",
)
def f26_token_rarity_score(spark, sf_dir):
    """Corpus-statistics quality score (F26): mean inverse corpus
    frequency of a document's tokens — the cheap stand-in for LM
    logprob scoring (common-token word salad scores low, rare-token
    docs score high). Inverse frequencies accumulate as exact
    fixed-point integers (1e9 div count) so the partial-agg order
    never matters — the ln-based variant is NOT cluster-deterministic
    (libm vs JVM ulps + double sum order) and is exactly the kind of
    silent nondeterminism a 1000-executor corpus build must avoid.
    Plan: one explode, one count agg on the token key, one broadcast-
    able join back, one doc-grain agg — all high-entropy keys."""
    d = t(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("tok")
    )
    cnts = tok.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
    return (
        tok.join(cnts, "tok")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            (
                F.sum(F.expr("1000000000 div cnt")).cast("bigint").cast("double")
                / F.lit(1000000000)
                / F.count(F.lit(1))
            ).alias("rarity_score"),
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------------------- F24
@query(
    "f24_deterministic_group_sample",
    sql="""
    SELECT doc_id, lang FROM (
      SELECT doc_id, lang,
             row_number() OVER (
               PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
             ) AS rn
      FROM documents) WHERE rn <= 3
    ORDER BY lang, doc_id
    """,
    tier="F",
)
def f24_deterministic_group_sample(spark, sf_dir):
    """Deterministic per-group sample (F24): exactly k=3 docs per
    language, chosen by ordering on md5(doc_id) — a seeded-RNG-free
    'random' sample that is identical on every engine, every run,
    every cluster size (e12/f16's sampling is honest-random and
    therefore rows-only; this is the reproducible variant a data
    recipe should ship with). Hash-ordering is uniform, so the sample
    is unbiased within groups; one window shuffle on the group key."""
    d = t(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        d.select("doc_id", "lang", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 3)
        .select("doc_id", "lang")
        .orderBy("lang", "doc_id")
    )


# --------------------------------------------------------------- F27
@query(
    "f27_embedding_quantization",
    sql="""
    WITH q AS (
      SELECT vec_id,
             list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) / 127 AS scale,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ),
    d AS (
      SELECT vec_id, scale,
             list_transform(v, x -> round(x / scale) * scale) AS deq, v
      FROM q
    )
    SELECT vec_id, scale,
           list_aggregate(list_transform(generate_series(1, 64),
             i -> v[i] * deq[i]), 'sum')
           / (sqrt(list_aggregate(list_transform(generate_series(1, 64),
                i -> v[i] * v[i]), 'sum'))
              * sqrt(list_aggregate(list_transform(generate_series(1, 64),
                  i -> deq[i] * deq[i]), 'sum'))) AS cos_orig_deq,
           list_max(list_transform(generate_series(1, 64),
             i -> abs(v[i] - deq[i]))) AS max_abs_err
    FROM d
    """,
    tier="F",
)
def f27_embedding_quantization(spark, sf_dir):
    """Symmetric int8 embedding quantization (F: the 4× storage/
    shuffle reduction every 100 TB embedding store runs): per-vector
    scale = max|v|/127, q = round(v/scale), dequant = q*scale. The
    query scores the information loss — cosine(original, dequantized)
    and max absolute error — entirely in JVM float64 HOFs, which are
    bitwise-reproducible against DuckDB (round-half-away agrees with
    Spark's BigDecimal HALF_UP on doubles, including exact ties).
    Composes with `similarity.pack_embedding` (int8 dtype) for the
    packed binary storage path."""
    e = t(spark, sf_dir, "embeddings")
    v = F.transform("embedding", lambda x: x.cast("double"))
    ev = e.select("vec_id", v.alias("v"))
    scale = (
        F.array_max(F.transform("v", F.abs)) / F.lit(127.0)
    ).alias("scale")
    q = ev.select("vec_id", "v", scale)
    deq = F.transform(
        "v", lambda x: F.round(x / F.col("scale"), 0) * F.col("scale")
    )
    d = q.select("vec_id", "scale", "v", deq.alias("deq"))
    num = sim.dot(F.col("v"), F.col("deq"))
    cos = (num / (sim.norm(F.col("v")) * sim.norm(F.col("deq")))).alias(
        "cos_orig_deq"
    )
    err = F.array_max(
        F.zip_with("v", "deq", lambda a, b: F.abs(a - b))
    ).alias("max_abs_err")
    return d.select("vec_id", "scale", cos, err)


# --------------------------------------------------------------- F28
_MIX_WEIGHTS = {"src0": 2.5, "src1": 0.5, "src19": 0.0}


def _mix_sql_copies() -> str:
    """DuckDB twin of operators/mixture._copies_col for _MIX_WEIGHTS."""
    from pdf2dataset_spark.operators.mixture import mixture_case_sql

    case = mixture_case_sql(_MIX_WEIGHTS, default=1.0)
    return f"""
    WITH w AS (
      SELECT doc_id, source, {case} AS wt FROM documents
    ),
    c AS (
      SELECT doc_id, source,
             CAST(floor(wt) AS BIGINT)
             + CASE WHEN md5('mix' || CAST(doc_id AS VARCHAR))
                    < lpad(lower(to_hex(CAST(floor((wt - floor(wt))
                          * 4294967296.0) AS BIGINT))), 8, '0')
                    THEN 1 ELSE 0 END AS copies
      FROM w
    )
    SELECT source,
           count(*) AS n_docs,
           CAST(sum(copies) AS BIGINT) AS n_emitted
    FROM c GROUP BY source ORDER BY source
    """


@query("f28_source_mixture_sampling", sql=_mix_sql_copies(), tier="F")
def f28_source_mixture_sampling(spark, sf_dir):
    """Data-mix recipe materialization (F28): per-source sampling /
    up-sampling weights (src0 x2.5, src1 x0.5, src19 dropped, rest
    x1.0) applied as a pure function of doc_id — floor(w) guaranteed
    copies plus a hashed-id Bernoulli for the fraction, the
    coordination-free reproducibility a 100 TB mix rebuild needs.
    The query reports per-source doc and emitted-copy counts; the
    underlying operator (operators/mixture.mix_sources) emits the
    actual repeated rows with a copy_id, shuffle-free."""
    from pdf2dataset_spark.operators.mixture import mix_sources

    d = t(spark, sf_dir, "documents").select("doc_id", "source")
    mixed = mix_sources(d, _MIX_WEIGHTS, default=1.0)
    return (
        d.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .join(
            mixed.groupBy("source").agg(
                F.count(F.lit(1)).alias("n_emitted")
            ),
            "source",
            "left",
        )
        .select(
            "source",
            "n_docs",
            F.coalesce("n_emitted", F.lit(0)).cast("bigint").alias("n_emitted"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------- F29
@query(
    "f29_quality_decile_binning",
    sql="""
    WITH r AS (
      SELECT doc_id, n_chars,
             row_number() OVER (ORDER BY n_chars, doc_id) AS rnk,
             count(*) OVER () AS n
      FROM documents
    )
    SELECT CAST(1 + ((rnk - 1) * 10) // n AS INT) AS decile,
           count(*) AS n_docs,
           min(n_chars) AS min_chars,
           max(n_chars) AS max_chars,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars
    FROM r GROUP BY decile ORDER BY decile
    """,
    tier="F",
)
def f29_quality_decile_binning(spark, sf_dir):
    """Quality-curriculum binning (F29): rank documents by a quality
    proxy (n_chars; any score column slots in) and cut EQUAL-COUNT
    deciles by explicit rank arithmetic — 1 + (rank-1)*10 div n —
    instead of ntile, whose remainder distribution differs between
    engines. The rank comes from operators/rank.global_rank (range
    partition + partition-local windows + broadcast offsets), so no
    row crosses a single-partition window; n arrives lazily via a
    broadcast 1-row aggregate. All outputs are exact integers."""
    from pdf2dataset_spark.operators.rank import global_rank

    d = t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    ranked = global_rank(
        d, [F.col("n_chars"), F.col("doc_id")], rank_col="rnk"
    )
    n1 = d.agg(F.count(F.lit(1)).alias("n"))
    return (
        ranked.join(F.broadcast(n1))
        .select(
            "doc_id",
            "n_chars",
            (
                1 + ((F.col("rnk") - 1) * 10) / F.col("n")
            ).cast("int").alias("decile"),
        )
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
            F.sum("n_chars").cast("bigint").alias("sum_chars"),
        )
        .orderBy("decile")
    )


# --------------------------------------------------------------- F30
@query(
    "f30_source_vocabulary_overlap",
    sql="""
    WITH sw AS (
      SELECT DISTINCT source, word FROM (
        SELECT source, unnest(string_split(text, ' ')) AS word
        FROM documents
      )
    ),
    wc AS (SELECT word, count(*) AS n_sources FROM sw GROUP BY word)
    SELECT source,
           count(*) AS n_distinct_words,
           CAST(sum(CASE WHEN n_sources = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_exclusive_words
    FROM sw JOIN wc USING (word)
    GROUP BY source ORDER BY source
    """,
    tier="F",
)
def f30_source_vocabulary_overlap(spark, sf_dir):
    """Cross-source vocabulary analysis (F30) — the corpus profile a
    tokenizer-training run reads: per source, distinct word count and
    how many of those words appear in NO other source. Plan: the
    exploded token stream collapses to distinct (source, word) rows
    in its one big shuffle; per-word source counts come from a window
    over the word-keyed repartition of those narrow rows (f9's
    one-shuffle-serves-two trick: HashPartitioning(word) satisfies
    both the window and nothing else needs the wide stream again).
    Exact integers only."""
    d = t(spark, sf_dir, "documents")
    sw = (
        d.select("source", F.explode(F.split("text", " ")).alias("word"))
        .distinct()
        .repartition("word")
    )
    wc = F.count(F.lit(1)).over(Window.partitionBy("word"))
    return (
        sw.withColumn("n_sources", wc)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_distinct_words"),
            F.sum(
                F.when(F.col("n_sources") == 1, 1).otherwise(0)
            ).cast("bigint").alias("n_exclusive_words"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------- F31
@query(
    "f31_training_order_shuffle",
    sql="""
    SELECT doc_id,
           CAST(row_number() OVER (
             ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
           ) AS INT) AS shuffle_pos
    FROM documents
    """,
    tier="F",
)
def f31_training_order_shuffle(spark, sf_dir):
    """Deterministic global training-order shuffle (F31): a corpus-
    wide pseudorandom permutation from ranking by md5(doc_id) — the
    reproducible "shuffle the 100 TB corpus once per epoch" step (a
    different epoch = a different salt). The rank is scale-safe
    (operators/rank.global_rank: range partition on the hash +
    partition-local windows + broadcast offsets); doc_id tie-break
    makes the order total, so output is engine-exact."""
    from pdf2dataset_spark.operators.rank import global_rank

    d = t(spark, sf_dir, "documents").select(
        "doc_id", F.md5(F.col("doc_id").cast("string")).alias("__h")
    )
    return global_rank(
        d, [F.col("__h"), F.col("doc_id")], rank_col="shuffle_pos"
    ).select("doc_id", "shuffle_pos")


# --------------------------------------------------------------- F32
_SQL_EPOCH_NEW = """
    SELECT doc_id, text FROM documents
    WHERE doc_id % 17 <> 0 AND doc_id % 13 <> 0
    UNION ALL
    SELECT doc_id, text || ' v2' AS text FROM documents
    WHERE doc_id % 13 = 0 AND doc_id % 17 <> 0
    UNION ALL
    SELECT doc_id + 1000000 AS doc_id, text FROM documents
    WHERE doc_id % 11 = 0
"""


@query(
    "f32_corpus_epoch_diff",
    sql=f"""
    WITH old AS (SELECT doc_id, sha256(text) AS h FROM documents),
    new AS (SELECT doc_id, sha256(text) AS h FROM ({_SQL_EPOCH_NEW})),
    d AS (
      SELECT coalesce(old.doc_id, new.doc_id) AS doc_id,
             CASE
               WHEN old.doc_id IS NULL THEN 'added'
               WHEN new.doc_id IS NULL THEN 'removed'
               WHEN old.h <> new.h THEN 'changed'
               ELSE 'unchanged'
             END AS status
      FROM old FULL OUTER JOIN new ON old.doc_id = new.doc_id
    )
    SELECT status, count(*) AS n_docs, min(doc_id) AS first_doc,
           max(doc_id) AS last_doc
    FROM d GROUP BY status ORDER BY status
    """,
    tier="F",
)
def f32_corpus_epoch_diff(spark, sf_dir):
    """Corpus-epoch diffing (F32): the "what changed since the last
    crawl/snapshot" report every incremental re-train needs. The new
    epoch is derived in-query (every 17th doc removed, every
    remaining 13th edited, every 11th re-added under a new id) so all
    four statuses appear deterministically. Plan: both sides reduce
    to narrow (doc_id, sha256) rows BEFORE the full outer join — the
    wide text column never crosses the shuffle; at 100 TB the join
    moves ~40 bytes/doc. Counts are exact integers."""
    d = t(spark, sf_dir, "documents").select("doc_id", "text")
    modified = (
        d.filter((F.col("doc_id") % 13 == 0) & (F.col("doc_id") % 17 != 0))
        .select("doc_id", F.concat(F.col("text"), F.lit(" v2")).alias("text"))
    )
    new = (
        d.filter((F.col("doc_id") % 17 != 0) & (F.col("doc_id") % 13 != 0))
        .unionByName(modified)
        .unionByName(
            d.filter(F.col("doc_id") % 11 == 0).select(
                (F.col("doc_id") + 1000000).alias("doc_id"), "text"
            )
        )
    )
    oldh = d.select("doc_id", F.sha2("text", 256).alias("h"))
    newh = new.select("doc_id", F.sha2("text", 256).alias("h"))
    j = oldh.alias("o").join(
        newh.alias("n"), F.col("o.doc_id") == F.col("n.doc_id"), "full_outer"
    )
    status = (
        F.when(F.col("o.doc_id").isNull(), "added")
        .when(F.col("n.doc_id").isNull(), "removed")
        .when(F.col("o.h") != F.col("n.h"), "changed")
        .otherwise("unchanged")
    )
    return (
        j.select(
            F.coalesce(F.col("o.doc_id"), F.col("n.doc_id")).alias("doc_id"),
            status.alias("status"),
        )
        .groupBy("status")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .orderBy("status")
    )


# --------------------------------------------------------------- F33
@query(
    "f33_bpe_pair_counts",
    sql="""
    WITH wf AS (
      SELECT word, count(*) AS freq FROM (
        SELECT unnest(string_split(text, ' ')) AS word FROM documents
      ) WHERE word <> '' GROUP BY word
    ),
    pairs AS (
      SELECT substring(word, i, 2) AS pair, freq
      FROM wf, unnest(generate_series(1, len(word) - 1)) AS t(i)
      WHERE len(word) >= 2
    )
    SELECT pair, CAST(sum(freq) AS BIGINT) AS pair_count
    FROM pairs GROUP BY pair
    ORDER BY pair_count DESC, pair LIMIT 50
    """,
    tier="F",
)
def f33_bpe_pair_counts(spark, sf_dir):
    """BPE merge-candidate counting (F33): the inner loop of
    byte-pair-encoding tokenizer training — corpus-weighted adjacent
    character-pair frequencies, top 50 with deterministic tie-break.
    Plan for 100 TB: the exploded token stream collapses to the
    DISTINCT word+freq table first (vocabulary-sized — orders of
    magnitude smaller than the corpus), and the quadratic-ish
    char-pair explode runs over THAT, so per-iteration BPE cost is
    O(vocab), not O(corpus); counts are exact integers."""
    d = t(spark, sf_dir, "documents")
    wf = (
        d.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    # explode over 1..len-1 gives every adjacent pair position
    pairs = (
        wf.filter(F.length("word") >= 2)
        .select(
            "word",
            "freq",
            F.explode(
                F.sequence(F.lit(1), F.length("word") - 1)
            ).alias("i"),
        )
        .select(F.expr("substring(word, i, 2)").alias("pair"), "freq")
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("freq").cast("bigint").alias("pair_count"))
        .orderBy(F.col("pair_count").desc(), "pair")
        .limit(50)
    )


# --------------------------------------------------------------- F37
@query("f37_bpe_tokenize", sql=None, tier="F")
def f37_bpe_tokenize(spark, sf_dir):
    """BPE tokenizer train + apply (F37, operators/bpe.py): learn 30
    merges from the corpus word-frequency table (the ONLY corpus-
    sized pass; merge selection runs on the vocab-sized table like
    production BPE trainers), then tokenize every document in one
    broadcast-merges mapInPandas pass. Python-side tokenization has
    no SQL twin → rows-only; determinism, round-trip inversion and
    the f33 pair-count consistency are pinned in pytest."""
    from pdf2dataset_spark.operators import bpe

    d = t(spark, sf_dir, "documents").select("doc_id", "text")
    merges = bpe.train_bpe(d, n_merges=30)
    enc = bpe.bpe_encode(d, merges)
    return enc.select(
        "doc_id",
        F.size("bpe_tokens").alias("n_bpe_tokens"),
        F.size(F.array_distinct("bpe_tokens")).alias("n_distinct_symbols"),
    )


# --------------------------------------------------------------- F34
# Element-wise double cast inside the SQL CTEs so every product below
# is pure float64 — the bitwise-parity discipline of f3/f13.
_SQL_SEM_CORPUS = """
    SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS embedding
    FROM embeddings
    UNION ALL
    SELECT vec_id + 1000000 AS vec_id,
           list_transform(embedding, x -> CAST(x AS DOUBLE) * 2) AS embedding
    FROM embeddings WHERE vec_id % 10 = 0
"""


def _sql_cos(a: str, b: str) -> str:
    return f"""list_aggregate(list_transform(generate_series(1, 64),
        i -> {a}[i] * {b}[i]), 'sum')
      / (sqrt(list_aggregate(list_transform(generate_series(1, 64),
           i -> {a}[i] * {a}[i]), 'sum'))
         * sqrt(list_aggregate(list_transform(generate_series(1, 64),
           i -> {b}[i] * {b}[i]), 'sum')))"""


@query(
    "f34_semantic_dedup",
    sql=f"""
    WITH corpus AS ({_SQL_SEM_CORPUS}),
    cents AS (
      SELECT vec_id AS cent_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cent_vec
      FROM embeddings WHERE vec_id < 8
    ),
    scored AS (
      SELECT a.vec_id, c.cent_id,
             {_sql_cos('a.embedding', 'c.cent_vec')} AS cs
      FROM corpus a CROSS JOIN cents c
    ),
    assign AS (
      SELECT vec_id, cent_id AS list_id FROM (
        SELECT vec_id, cent_id,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY cs DESC, cent_id) AS rn
        FROM scored
      ) WHERE rn = 1
    ),
    av AS (
      SELECT s.vec_id, s.list_id, c.embedding
      FROM assign s JOIN corpus c USING (vec_id)
    ),
    dropped AS (
      SELECT DISTINCT a.vec_id
      FROM av a JOIN av b
        ON a.list_id = b.list_id AND b.vec_id < a.vec_id
      WHERE {_sql_cos('a.embedding', 'b.embedding')} >= 0.85
    )
    SELECT s.vec_id, s.list_id, d.vec_id IS NULL AS kept
    FROM assign s LEFT JOIN dropped d ON s.vec_id = d.vec_id
    """,
    tier="F",
)
def f34_semantic_dedup(spark, sf_dir):
    """SemDeDup-style semantic dedup (F34): cluster every embedding
    to its nearest of 8 deterministic centroids, then inside each
    cluster drop any vector with a lower-id cosine-0.85 neighbour
    (operators/similarity.semantic_dedup — the cluster-then-dedup
    recipe of Abbas et al. 2023). Near-dups are planted in-query
    (every 10th vector re-appears scaled ×2 under id+1e6: exactly
    cosine 1.0 with its original and bitwise-identical centroid
    assignment, since scaling by a power of two is exact in fp64),
    so the oracle checks real collapse decisions. Pair work is
    cluster-scoped — Σ cluster² not corpus² — and the corpus never
    shuffles for assignment (centroids broadcast)."""
    e = t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    planted = e.filter(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + 1000000).alias("vec_id"),
        F.transform("embedding", lambda x: x.cast("double") * 2).alias(
            "embedding"
        ),
    )
    corpus = e.unionByName(planted)
    cents = e.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("cent_vec")
    )
    return sim.semantic_dedup(corpus, cents, threshold=0.85)


# --------------------------------------------------------------- F38
@query(
    "f38_semantic_dedup_nprobe",
    sql=f"""
    WITH corpus AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS embedding
      FROM embeddings
      UNION ALL
      SELECT vec_id + 1000000 AS vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE) + 0.125) AS embedding
      FROM embeddings WHERE vec_id % 10 = 0
    ),
    cents AS (
      SELECT vec_id AS cent_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cent_vec
      FROM embeddings WHERE vec_id < 8
    ),
    ranked AS (
      SELECT vec_id, cent_id,
             row_number() OVER (PARTITION BY vec_id
                                ORDER BY cs DESC, cent_id) AS rn
      FROM (
        SELECT a.vec_id, c.cent_id,
               {_sql_cos('a.embedding', 'c.cent_vec')} AS cs
        FROM corpus a CROSS JOIN cents c
      )
    ),
    assign AS (SELECT vec_id, cent_id AS list_id FROM ranked WHERE rn = 1),
    av AS (
      SELECT p.vec_id, p.cent_id AS list_id, c.embedding
      FROM ranked p JOIN corpus c USING (vec_id) WHERE p.rn <= 2
    ),
    dropped AS (
      SELECT DISTINCT a.vec_id
      FROM av a JOIN av b
        ON a.list_id = b.list_id AND b.vec_id < a.vec_id
      WHERE {_sql_cos('a.embedding', 'b.embedding')} >= 0.62
    )
    SELECT s.vec_id, s.list_id, d.vec_id IS NULL AS kept
    FROM assign s LEFT JOIN dropped d ON s.vec_id = d.vec_id
    """,
    tier="F",
)
def f38_semantic_dedup_nprobe(spark, sf_dir):
    """Multi-probe SemDeDup (F38): `semantic_dedup(nprobe=2)` — each
    vector joins the pair stage in its TWO nearest cells, so near-dup
    pairs split across a cell boundary are still compared (the recall
    gap single-cell SemDeDup has by construction). Planted dups here
    PERTURB (+0.125 per component — exact in fp64 on both engines)
    instead of scaling, so copies genuinely land in different cells
    than their originals and the second probe does real work; the
    0.62 threshold sits between planted-pair and natural-pair cosine.
    Full oracle: DuckDB replays assignment (rn=1 primary, rn≤2
    probes), cluster-scoped pairs, and the anchor-free drop rule."""
    e = t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    planted = e.filter(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + 1000000).alias("vec_id"),
        F.transform("embedding", lambda x: x.cast("double") + 0.125).alias(
            "embedding"
        ),
    )
    corpus = e.unionByName(planted)
    cents = e.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("cent_vec")
    )
    return sim.semantic_dedup(corpus, cents, threshold=0.62, nprobe=2)


# --------------------------------------------------------------- F35
_SPAN_HEADER = "Lorem ipsum boilerplate header. "  # 32 chars → 17 16-grams


@query(
    "f35_duplicate_ngram_spans",
    sql=f"""
    WITH corpus AS (
      SELECT doc_id,
             CASE WHEN doc_id % 7 = 0
                  THEN '{_SPAN_HEADER}' || text ELSE text END AS text
      FROM documents
    ),
    grams AS (
      SELECT doc_id, substring(text, i, 16) AS gram
      FROM corpus, unnest(generate_series(1, len(text) - 15)) AS u(i)
      WHERE len(text) >= 16
    )
    SELECT gram,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
           min(doc_id) AS first_doc, max(doc_id) AS last_doc
    FROM grams GROUP BY gram
    HAVING count(DISTINCT doc_id) >= 2
    ORDER BY n_docs DESC, gram LIMIT 100
    """,
    tier="F",
)
def f35_duplicate_ngram_spans(spark, sf_dir):
    """Exact duplicated-substring detection (F35): character 16-grams
    at stride 1, reporting spans shared by >= 2 documents — the
    relational analog of suffix-array substring dedup (Lee et al.
    2022, "Deduplicating Training Data Makes Language Models
    Better"): any duplicated substring of length >= 16 is caught. A
    shared boilerplate header is injected on every 7th doc so the
    detector provably fires. Scale shape: stride-1 shingling
    inflates the corpus ~16× in bytes, so at 100 TB the gram column
    is replaced by xxhash64(gram) BEFORE the shuffle (8 bytes/row,
    same grouping semantics — hash collisions only ever over-report
    candidates, which a rescan verifies); the single groupBy with a
    distinct-count is the planner's two-phase partial/final agg, and
    the top-100 is TakeOrderedAndProject (no global sort)."""
    d = t(spark, sf_dir, "documents").select("doc_id", "text")
    txt = F.when(
        F.col("doc_id") % 7 == 0, F.concat(F.lit(_SPAN_HEADER), F.col("text"))
    ).otherwise(F.col("text"))
    corpus = d.select("doc_id", txt.alias("text")).filter(
        F.length("text") >= 16
    )
    grams = corpus.select(
        "doc_id",
        "text",
        F.explode(F.sequence(F.lit(1), F.length("text") - 15)).alias("i"),
    ).select("doc_id", F.expr("substring(text, i, 16)").alias("gram"))
    return (
        grams.groupBy("gram")
        .agg(
            F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .filter(F.col("n_docs") >= 2)
        .orderBy(F.col("n_docs").desc(), "gram")
        .limit(100)
    )


# --------------------------------------------------------------- F36
@query(
    "f36_quality_classifier",
    sql="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    feat AS (
      SELECT doc_id,
             instr('0123456789abcdef', substring(md5(tok), 1, 1)) - 8 AS w
      FROM tok WHERE tok <> ''
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(sum(w) AS BIGINT) AS w_sum,
           CAST(CAST(sum(w) AS BIGINT) AS DOUBLE) / count(*) AS quality_score,
           sum(w) > 0 AS keep
    FROM feat GROUP BY doc_id
    """,
    tier="F",
)
def f36_quality_classifier(spark, sf_dir):
    """Hashed linear quality classifier (F36): the fastText-style
    scoring pass every corpus-curation pipeline runs — tokens map to
    feature buckets via the hashing trick (first md5 nibble → 16
    buckets), each bucket carries a fixed integer weight (here the
    arithmetic bucket-8 stand-in; a trained model would broadcast-join
    a C-row weight table, identical plan), and a document's score is
    mean token weight with keep = score > 0. Weights stay exact
    integers until ONE final division, so the score is
    bitwise-deterministic under any partial-agg order — the property
    a 1000-executor scoring run needs. Plan: one explode, one
    doc-grain agg; the wide text column never shuffles."""
    d = t(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    ).filter(F.col("tok") != "")
    w = F.expr("instr('0123456789abcdef', substring(md5(tok), 1, 1)) - 8")
    feat = tok.select("doc_id", w.alias("w"))
    return feat.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
        F.sum("w").cast("bigint").alias("w_sum"),
        (F.sum("w").cast("bigint").cast("double") / F.count(F.lit(1))).alias(
            "quality_score"
        ),
        (F.sum("w") > 0).alias("keep"),
    )


# --------------------------------------------------------------- F40
@query("f40_image_phash_neardup", sql=None, tier="F")
def f40_image_phash_neardup(spark, sf_dir):
    """Image near-dup detection over a binary image column (F8
    family, REAL end-to-end): each document's first 120 chars render
    to a PNG page image via the engine's own raster, a 64-bit DCT
    perceptual hash is computed per image (Arrow-batched narrow
    pass, operators/image_hash.py), and near-dup pairs come from
    Hamming-LSH banding (single bucket shuffle, same plan family as
    MinHash-LSH text dedup) verified with JVM bit_count. bands=8
    makes Hamming<=6 detection exhaustive by pigeonhole — rescaled
    copies hash identically (hamming 0, pinned in tests) and
    one-glyph edits land around 6. Rows-only: the DCT hash is not
    SQL-expressible, but determinism + recall are pytest-pinned
    (tests/test_image_hash.py)."""
    from pdf2dataset_spark.operators import image_hash as ih

    d = t(spark, sf_dir, "documents").select(
        "doc_id", F.substring("text", 1, 120).alias("page_text")
    )
    imgs = ih.render_text_images(d)
    hashed = ih.with_image_hash(imgs, "image", out="phash")
    return ih.phash_neardup_pairs(
        hashed, id_col="doc_id", hash_col="phash", max_hamming=6, bands=8
    ).orderBy("id_a", "id_b")


# --------------------------------------------------------------- F41
@query(
    "f41_lm_coverage_quality",
    sql="""
    WITH toks AS (
      SELECT doc_id, w, i FROM (
        SELECT doc_id,
               unnest(string_split(text, ' ')) AS w,
               generate_subscripts(string_split(text, ' '), 1) AS i
        FROM documents
      ) WHERE w <> ''
    ),
    vocab AS (
      SELECT w FROM (
        SELECT w, count(*) AS freq FROM toks GROUP BY w
        ORDER BY freq DESC, w ASC LIMIT 200
      )
    ),
    -- re-rank positions AFTER the empty filter so bigrams pair
    -- adjacent SURVIVING tokens, exactly like the Spark side's
    -- zip_with over the filtered array (multi-space runs would
    -- otherwise produce no bigram here but one there)
    seq AS (
      SELECT doc_id, w,
             row_number() OVER (PARTITION BY doc_id ORDER BY i) AS j
      FROM toks
    ),
    big AS (
      SELECT t1.doc_id, t1.w || ' ' || t2.w AS bg
      FROM seq t1 JOIN seq t2
        ON t1.doc_id = t2.doc_id AND t2.j = t1.j + 1
    ),
    common_big AS (
      SELECT bg FROM (SELECT bg, count(*) AS c FROM big GROUP BY bg)
      WHERE c >= 3
    ),
    tok_stats AS (
      SELECT doc_id,
             count(*) AS n_tokens,
             sum(CASE WHEN v.w IS NULL THEN 1 ELSE 0 END) AS n_oov
      FROM toks LEFT JOIN vocab v USING (w) GROUP BY doc_id
    ),
    big_stats AS (
      SELECT doc_id,
             count(*) AS n_bigrams,
             sum(CASE WHEN c.bg IS NULL THEN 0 ELSE 1 END) AS n_covered
      FROM big LEFT JOIN common_big c USING (bg) GROUP BY doc_id
    )
    SELECT t.doc_id,
           CAST(t.n_tokens AS BIGINT) AS n_tokens,
           CAST(t.n_oov AS BIGINT) AS n_oov,
           CAST(t.n_oov AS DOUBLE) / t.n_tokens AS oov_rate,
           CAST(COALESCE(b.n_bigrams, 0) AS BIGINT) AS n_bigrams,
           CASE WHEN b.n_bigrams > 0
                THEN CAST(b.n_covered AS DOUBLE) / b.n_bigrams END
             AS bigram_coverage
    FROM tok_stats t LEFT JOIN big_stats b USING (doc_id)
    """,
    tier="F",
)
def f41_lm_coverage_quality(spark, sf_dir):
    """LM-coverage quality signals (F41) — the exact-arithmetic core
    of CCNet-style perplexity filtering without the transcendental
    part: per-document OOV rate against the corpus top-200 vocabulary
    and bigram coverage against corpus bigrams seen >= 3 times. Docs
    full of rare words / unseen word transitions score high-OOV /
    low-coverage — the same ranking signal an n-gram LM gives, but
    every number here is an integer count until ONE final division,
    so the result is bitwise engine-invariant (a log-prob sum could
    never hash-match across libm implementations).

    Scale shape: token explode -> ONE word-keyed shuffle for the
    vocab counts; top-V selection is orderBy().limit() ->
    TakeOrderedAndProject (V rows to the driver, broadcast back);
    bigrams are built doc-locally with a JVM zip_with over the
    shifted token array (no self-join, no extra shuffle — the
    DuckDB twin's i+1 self-join is the relational spelling of the
    same pairing); bigram counts are a second keyed shuffle; doc
    aggregation hash-partitions on doc_id. The wide text column
    never shuffles."""
    d = t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("w")
    ).filter(F.col("w") != "")
    vocab = (
        toks.groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.col("freq").desc(), F.col("w").asc())
        .limit(200)
        .select("w", F.lit(1).alias("__in_vocab"))
    )
    tok_stats = (
        toks.join(F.broadcast(vocab), "w", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.sum(
                F.when(F.col("__in_vocab").isNull(), 1).otherwise(0)
            ).cast("bigint").alias("n_oov"),
        )
    )
    arr = F.filter(F.split("text", " "), lambda x: x != "")
    bigrams = d.select(
        "doc_id",
        F.explode(
            F.zip_with(
                F.slice(arr, 1, F.greatest(F.size(arr) - 1, F.lit(0))),
                F.slice(arr, 2, F.greatest(F.size(arr) - 1, F.lit(0))),
                lambda a, b: F.concat_ws(" ", a, b),
            )
        ).alias("bg"),
    )
    common = (
        bigrams.groupBy("bg")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= 3)
        .select("bg", F.lit(1).alias("__common"))
    )
    big_stats = (
        bigrams.join(common, "bg", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum(
                F.when(F.col("__common").isNull(), 0).otherwise(1)
            ).alias("n_covered"),
        )
    )
    return tok_stats.join(big_stats, "doc_id", "left").select(
        "doc_id",
        "n_tokens",
        "n_oov",
        (F.col("n_oov").cast("double") / F.col("n_tokens")).alias("oov_rate"),
        F.coalesce("n_bigrams", F.lit(0)).cast("bigint").alias("n_bigrams"),
        F.when(
            F.col("n_bigrams") > 0,
            F.col("n_covered").cast("double") / F.col("n_bigrams"),
        ).alias("bigram_coverage"),
    )


# --------------------------------------------------------------- F42/F43
# The documents corpus carries no PII (synthetic), so the queries
# INJECT deterministic PII by doc_id residue — both engines build the
# same corpus, then audit / redact it. Patterns live in operators/pii
# (Java-regex ∩ RE2 dialect, so the twins are exact).
_SQL_PII_CORPUS = """
    SELECT doc_id,
           CASE doc_id % 5
             WHEN 0 THEN text || ' Contact user' || doc_id
                         || '@example.com or ops@sub.example.org now'
             WHEN 1 THEN text || ' card 4111-1111-1111-1111 SSN 123-45-6789'
             WHEN 2 THEN text || ' from 10.0.0.' || (doc_id % 200)
                         || ' call +1 (555) 123-4567'
             ELSE text
           END AS text
    FROM documents
"""

_PII_SQL_PAT = {
    "cc": r"\b\d{4}[ -]?\d{4}[ -]?\d{4}[ -]?\d{4}\b",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b(?:\d{1,3}\.){3}\d{1,3}\b",
    "phone": r"\+?\d{1,3}[-. (]{1,2}\d{3}[-. )]{1,2}\d{3}[-. ]?\d{4}",
}


def _pii_corpus(spark, sf_dir):
    d = t(spark, sf_dir, "documents").select("doc_id", "text")
    res = F.col("doc_id") % 5
    injected = (
        F.when(
            res == 0,
            F.concat(
                F.col("text"), F.lit(" Contact user"),
                F.col("doc_id").cast("string"),
                F.lit("@example.com or ops@sub.example.org now"),
            ),
        )
        .when(
            res == 1,
            F.concat(
                F.col("text"),
                F.lit(" card 4111-1111-1111-1111 SSN 123-45-6789"),
            ),
        )
        .when(
            res == 2,
            F.concat(
                F.col("text"), F.lit(" from 10.0.0."),
                (F.col("doc_id") % 200).cast("string"),
                F.lit(" call +1 (555) 123-4567"),
            ),
        )
        .otherwise(F.col("text"))
    )
    return d.select("doc_id", injected.alias("text"))


@query(
    "f42_pii_scan",
    sql=f"""
    SELECT doc_id,
           len(regexp_extract_all(text, '{_PII_SQL_PAT["email"]}')) AS pii_email,
           len(regexp_extract_all(text, '{_PII_SQL_PAT["cc"]}')) AS pii_cc,
           len(regexp_extract_all(text, '{_PII_SQL_PAT["ssn"]}')) AS pii_ssn,
           len(regexp_extract_all(text, '{_PII_SQL_PAT["ipv4"]}')) AS pii_ipv4,
           len(regexp_extract_all(text, '{_PII_SQL_PAT["phone"]}')) AS pii_phone,
           (len(regexp_extract_all(text, '{_PII_SQL_PAT["email"]}'))
            + len(regexp_extract_all(text, '{_PII_SQL_PAT["cc"]}'))
            + len(regexp_extract_all(text, '{_PII_SQL_PAT["ssn"]}'))
            + len(regexp_extract_all(text, '{_PII_SQL_PAT["ipv4"]}'))
            + len(regexp_extract_all(text, '{_PII_SQL_PAT["phone"]}'))) > 0
             AS pii_any
    FROM ({_SQL_PII_CORPUS})
    """,
    tier="F",
)
def f42_pii_scan(spark, sf_dir):
    """PII audit (F-tier curation): per-doc counts of each PII kind +
    a has-any flag over the injected corpus — all JVM regexp_count
    expressions (operators/pii.with_pii_counts), zero shuffles, text
    never leaves the JVM. The DuckDB twin re-counts with
    regexp_extract_all, so pattern semantics are pinned cross-engine
    in the Java∩RE2 dialect."""
    from pdf2dataset_spark.operators import pii

    out = pii.with_pii_counts(_pii_corpus(spark, sf_dir))
    return out.select(
        "doc_id", "pii_email", "pii_cc", "pii_ssn", "pii_ipv4",
        "pii_phone", "pii_any",
    )


@query(
    "f43_pii_redaction",
    sql=f"""
    SELECT doc_id,
           md5(regexp_replace(regexp_replace(regexp_replace(
               regexp_replace(regexp_replace(text,
                 '{_PII_SQL_PAT["cc"]}', '[CARD]', 'g'),
                 '{_PII_SQL_PAT["ssn"]}', '[SSN]', 'g'),
                 '{_PII_SQL_PAT["email"]}', '[EMAIL]', 'g'),
                 '{_PII_SQL_PAT["ipv4"]}', '[IP]', 'g'),
                 '{_PII_SQL_PAT["phone"]}', '[PHONE]', 'g'))
             AS redacted_md5,
           contains(regexp_replace(regexp_replace(regexp_replace(
               regexp_replace(regexp_replace(text,
                 '{_PII_SQL_PAT["cc"]}', '[CARD]', 'g'),
                 '{_PII_SQL_PAT["ssn"]}', '[SSN]', 'g'),
                 '{_PII_SQL_PAT["email"]}', '[EMAIL]', 'g'),
                 '{_PII_SQL_PAT["ipv4"]}', '[IP]', 'g'),
                 '{_PII_SQL_PAT["phone"]}', '[PHONE]', 'g'), '@')
             AS still_has_at
    FROM ({_SQL_PII_CORPUS})
    """,
    tier="F",
)
def f43_pii_redaction(spark, sf_dir):
    """PII redaction (F-tier curation): the injected corpus scrubbed
    by operators/pii.redact_pii (fixed most-specific-first pattern
    order — the cc pattern must consume card digits before the phone
    pattern can misread them). The oracle compares md5 of the
    REDACTED TEXT itself, so replacement order, token spelling and
    global-replace semantics are all pinned cross-engine;
    ``still_has_at`` pins that no raw email survives."""
    from pdf2dataset_spark.operators import pii

    red = pii.redact_pii("text")
    return _pii_corpus(spark, sf_dir).select(
        "doc_id",
        F.md5(red).alias("redacted_md5"),
        F.contains(red, F.lit("@")).alias("still_has_at"),
    )


# --------------------------------------------------------------- F44
@query(
    "f44_dsir_importance_score",
    sql="""
    WITH toks AS (
      SELECT doc_id, lang = 'en' AS tgt,
             substr(md5(tok), 1, 2) AS b
      FROM (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok
            FROM documents)
    ),
    stats AS (
      SELECT b,
             SUM(CASE WHEN tgt THEN 1 ELSE 0 END) AS tgt_n,
             COUNT(*) AS raw_n
      FROM toks GROUP BY b
    ),
    tot AS (
      SELECT CAST(SUM(tgt_n) AS BIGINT) AS t_total,
             CAST(SUM(raw_n) AS BIGINT) AS r_total
      FROM stats
    ),
    w AS (
      SELECT b, CAST(tgt_n * r_total - raw_n * t_total AS BIGINT)
               AS delta
      FROM stats CROSS JOIN tot
    )
    SELECT doc_id, CAST(SUM(delta) AS BIGINT) AS score
    FROM toks JOIN w USING (b)
    GROUP BY doc_id
    ORDER BY score DESC, doc_id
    LIMIT 20
    """,
    tier="F",
)
def f44_dsir_importance_score(spark, sf_dir):
    """DSIR-style importance scoring (F-tier curation; Xie et al.
    2023): rank every document by how much its hashed-unigram
    profile resembles the English subset — the
    "select raw-corpus data that looks like the target domain" step
    of a training-data pipeline. Buckets are md5-prefix STRINGS
    (256 of them), weights the exact-integer distributional
    difference tgt_b*R - raw_b*T (classic DSIR's log(p/q) is not
    cross-engine bitwise; see operators/mixture.dsir_scores).
    Top-20 with deterministic tie-break — plans as
    TakeOrderedAndProject; the token stream moves twice behind
    map-side partial aggregation, the 256-row weight table is
    broadcast."""
    from pdf2dataset_spark.operators.mixture import dsir_scores

    d = t(spark, sf_dir, "documents")
    scores = dsir_scores(d, F.col("lang") == "en")
    return scores.orderBy(F.col("score").desc(), "doc_id").limit(20)


# --------------------------------------------------------------- F45
@query(
    "f45_gopher_repetition",
    sql="""
    WITH words AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS word
      FROM documents
    ),
    ws AS (
      SELECT doc_id,
             CAST(count(*) AS BIGINT) AS n_words,
             CAST(count(DISTINCT word) AS BIGINT) AS n_distinct_words
      FROM words GROUP BY doc_id
    ),
    w2 AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ),
    bg AS (
      SELECT doc_id, w[i] || ' ' || w[i + 1] AS bg
      FROM w2,
           LATERAL unnest(range(1, greatest(len(w), 1))) t(i)
      WHERE i < len(w)
    ),
    bgc AS (
      SELECT doc_id, bg, count(*) AS c FROM bg GROUP BY doc_id, bg
    ),
    bgs AS (
      SELECT doc_id,
             CAST(max(c) AS BIGINT) AS top_bigram_n,
             CAST(sum(c) AS BIGINT) AS n_bigrams,
             CAST(count(*) AS BIGINT) AS n_distinct_bigrams
      FROM bgc GROUP BY doc_id
    )
    SELECT doc_id, n_words, n_distinct_words,
           top_bigram_n, n_bigrams, n_distinct_bigrams
    FROM ws JOIN bgs USING (doc_id)
    """,
    tier="F",
)
def f45_gopher_repetition(spark, sf_dir):
    """Gopher-style repetition quality signals (F-tier curation; Rae
    et al. 2021 §A1.1): per document, the EXACT-INTEGER numerators
    and denominators behind the published filters — duplicate-word
    mass (n_words vs n_distinct_words) and top-2-gram coverage
    (top_bigram_n / n_bigrams) plus duplicate-bigram mass
    (n_bigrams vs n_distinct_bigrams). Integers, not ratios, so the
    oracle is bitwise and the caller picks thresholds. Scale shape:
    word stats and bigram stats are two branches of ONE exploded
    scan with map-side partial aggregation; bigrams are built
    JVM-side (transform over the split array — no Python in the
    loop); the final join is doc_id-keyed on two already-aggregated
    (corpus-row-sized, not token-sized) relations."""
    d = t(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("w")
    )
    words = d.select("doc_id", F.explode("w").alias("word"))
    ws = words.groupBy("doc_id").agg(
        F.count("*").alias("n_words"),
        F.countDistinct("word").alias("n_distinct_words"),
    )
    bg = d.filter(F.size("w") >= 2).select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(0, size(w) - 2),"
                " i -> concat(w[i], ' ', w[i + 1]))"
            )
        ).alias("bg"),
    )
    bgc = bg.groupBy("doc_id", "bg").count()
    bgs = bgc.groupBy("doc_id").agg(
        F.max("count").alias("top_bigram_n"),
        F.sum("count").alias("n_bigrams"),
        F.count("*").alias("n_distinct_bigrams"),
    )
    return ws.join(bgs, "doc_id")


# --------------------------------------------------------------- F46
@query(
    "f46_decontamination",
    sql="""
    WITH words AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ),
    sh AS (
      SELECT DISTINCT doc_id, array_to_string(w[i:i+4], ' ') AS s
      FROM words,
           LATERAL unnest(range(1, greatest(len(w) - 4, 1) + 1)) t(i)
    ),
    totals AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shingles
      FROM sh WHERE doc_id >= 20 GROUP BY doc_id
    ),
    bench AS (SELECT DISTINCT s FROM sh WHERE doc_id < 20),
    hits AS (
      SELECT sh.doc_id, CAST(count(*) AS BIGINT) AS n_hit
      FROM sh JOIN bench USING (s)
      WHERE sh.doc_id >= 20
      GROUP BY sh.doc_id
    )
    SELECT doc_id, n_shingles, n_hit
    FROM totals JOIN hits USING (doc_id)
    WHERE n_hit > 0
    """,
    tier="F",
)
def f46_decontamination(spark, sf_dir):
    """Benchmark DECONTAMINATION scan (F-tier curation; the
    GPT-3/PaLM-style n-gram overlap check) through the PRODUCTION
    operator ``operators/dedup.ngram_contamination``: every corpus
    document that shares any 5-word shingle with the benchmark set
    (docs 0-19 stand in for a held-out eval suite) surfaces with its
    distinct-shingle total and overlap count — the report a pipeline
    uses to drop or flag contaminated training documents. Shingles
    are joined as STRINGS (hash functions differ cross-engine;
    equality does not). Scale shape (see the operator): the corpus
    explodes once, probes the benchmark's distinct shingle set with
    a broadcast LEFT SEMI join — the corpus-sized stream never
    shuffles for the join — and one doc-keyed groupBy closes the
    loop. The SQL twin mirrors the operator's short-text clamp (a
    sub-n-word doc yields one short shingle)."""
    from pdf2dataset_spark.operators.dedup import ngram_contamination

    d = t(spark, sf_dir, "documents")
    rep = ngram_contamination(
        d.filter(F.col("doc_id") >= 20),
        d.filter(F.col("doc_id") < 20),
        n=5,
    )
    return rep.filter(F.col("n_hit") > 0).select(
        "doc_id", "n_shingles", "n_hit"
    )


@query(
    "f47_boilerplate_removal",
    sql="""
    SELECT doc_id, text, CAST(2 AS BIGINT) AS n_removed
    FROM documents
    """,
    tier="F",
)
def f47_boilerplate_removal(spark, sf_dir):
    """Paragraph-grain boilerplate removal (CCNet/RefinedWeb cut;
    operators/dedup.remove_boilerplate): paragraphs whose normalized,
    DIGIT-STRIPPED form recurs across >= min_docs distinct documents
    are template furniture and drop from every document. The query
    plants a subscription header on every document and a copyright
    footer whose YEAR varies per document (2020 + doc_id % 7) — the
    digit-stripping normalization is what makes all seven variants
    one boilerplate key — then runs the operator and proves EXACT
    reconstruction: every cleaned document equals its original
    single-paragraph body, with exactly 2 paragraphs removed. The
    oracle is therefore the documents table itself — the strongest
    possible pin on split/normalize/count/anti-join/reassemble.

    Scale shape (see the operator docstring): three keyed shuffles
    (paragraph-key agg with map-side partials, paragraph-key
    anti-join, doc-id regroup), order restored via
    array_sort(collect_list(struct(idx, para))) — no Python, no
    driver collect, no unpartitioned window."""
    d = t(spark, sf_dir, "documents").select("doc_id", "text")
    aug = d.select(
        "doc_id",
        F.concat(
            F.lit("Subscribe to our Newsletter!\n"),
            F.col("text"),
            F.lit("\nCopyright "),
            (F.lit(2020) + F.col("doc_id") % 7).cast("string"),
            F.lit(" Example Corp"),
        ).alias("text"),
    )
    cleaned = dd.remove_boilerplate(aug, min_docs=50)
    n_in = aug.select(
        "doc_id", F.size(F.split("text", "\n")).alias("__n_in")
    )
    return cleaned.join(n_in, "doc_id").select(
        "doc_id",
        "text",
        (
            F.col("__n_in") - F.size(F.split(F.col("text"), "\n"))
        ).cast("long").alias("n_removed"),
    )
