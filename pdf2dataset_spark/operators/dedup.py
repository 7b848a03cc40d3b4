"""Deduplication operators for training-data pipelines (tier F).

Four families, all expressed as Catalyst-visible DataFrame plans:

- **Exact** (`exact_dedup`): sha256 of normalized text; keep-first by
  an explicit order column via ranked window (deterministic — Spark's
  ``dropDuplicates`` keeps an arbitrary row, which is not acceptable
  for reproducible corpus builds).
- **MinHash + LSH** (`minhash_signature` / `lsh_candidate_pairs`):
  shingle → 64-way minhash via seeded xxhash64 (all JVM higher-order
  functions, no Python) → banding → bucket self-join for candidate
  pairs → exact-Jaccard verification. At 100 TB the bucket join is
  the only shuffle and its key (band_id, band_hash) is high-entropy,
  so it distributes well; a hot bucket means near-identical docs and
  is capped by `max_bucket` salting-style.
- **SimHash** (`simhash64`): 64-bit sign-aggregated token-hash
  fingerprint; near-dups = small Hamming distance.
- **N-gram Jaccard** (`jaccard_pairs`): exact pairwise Jaccard over
  shingle sets within a blocking key (never all-pairs at scale).

Scale note: everything here is shuffle-minimal — per-row HOF compute,
then one aggregation or one equi-join on a well-distributed key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


class ConcurrentIngestError(RuntimeError):
    """Raised by :func:`ingest_exact` when the store's ingest lock is
    already held (concurrent writer, or debris from a crashed one)."""


def normalize_text(col: Column | str) -> Column:
    """Whitespace-collapse + trim + lowercase — the canonical form."""
    c = F.col(col) if isinstance(col, str) else col
    return F.lower(F.trim(F.regexp_replace(c, r"\s+", " ")))


def text_hash(col: Column | str) -> Column:
    """sha256 of the normalized text — the exact-dedup key."""
    return F.sha2(normalize_text(col), 256)


def exact_dedup(
    df: DataFrame,
    text_col: str = "text",
    order_col: str = "doc_id",
    keep_hash: bool = True,
    strategy: str = "window",
) -> DataFrame:
    """Keep the first row (by ``order_col``) of each normalized-text
    hash group. Deterministic keep-first (SURVEY §2 F1/E11).

    strategy='window': rank within hash partitions. Catalyst prunes
    unused columns before the shuffle, so if the caller selects only
    narrow columns the wide text never moves; if the caller keeps
    ALL columns, every surviving column shuffles.
    strategy='join': aggregate min(order) per hash (two narrow
    columns shuffle) and semi-join winners back — the wide-row scale
    plan: the 100 TB text/media payload is never shuffled at all.
    Both return identical rows.
    strategy='streaming': keyed dropDuplicates state on the hash —
    the only formulation valid on unbounded input (window/join assume
    a bounded set). Keeps the first ARRIVAL per hash (arrival order,
    not order_col — a stream cannot know the global minimum). Pair
    with a watermark upstream to bound state, or use
    streaming.stateful.ttl_dedup for TTL-bounded state.
    """
    h = text_hash(text_col).alias("text_sha256")
    hashed = df.withColumn("text_sha256", h)
    if strategy == "streaming":
        out = hashed.dropDuplicates(["text_sha256"])
    elif strategy == "join":
        winners = hashed.groupBy("text_sha256").agg(
            F.min(order_col).alias(order_col)
        )
        out = hashed.join(winners, ["text_sha256", order_col], "left_semi")
    elif strategy == "window":
        w = Window.partitionBy("text_sha256").orderBy(order_col)
        out = (
            hashed.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
    else:
        raise ValueError(f"unknown strategy {strategy!r}")
    return out if keep_hash else out.drop("text_sha256")


def tokens(col: Column | str, sep: str = r"\s+") -> Column:
    """Regex-split tokenization (after edge-stripping). The default
    splits on ANY whitespace run, so tabs/newlines/multi-space text
    tokenizes identically to single-spaced text — matching
    normalize_text's canonicalization. (The round-5 curation fuzz
    caught the previous literal-single-space split mis-shingling
    tab/newline-separated docs, silently killing near-dup recall on
    real corpora.) Edge stripping is a regex, NOT F.trim: trim strips
    only ASCII spaces, so a trailing newline — extracted page text
    routinely ends with one — would still yield an empty edge token
    and non-canonical shingles."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.regexp_replace(c, r"^\s+|\s+$", ""), sep)


def shingles(col: Column | str, n: int = 3, sep: str = r"\s+") -> Column:
    """Distinct word n-gram shingles of a text column (JVM HOFs).
    Tokenizes on whitespace RUNS (see :func:`tokens`) and joins grams
    with a single space, so shingle strings are canonical regardless
    of the source text's separators."""
    toks = tokens(col, sep)
    idx = F.sequence(F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(1)))
    gram = lambda i: F.concat_ws(" ", F.slice(toks, i, n))  # noqa: E731
    return F.array_distinct(F.transform(idx, gram))


def minhash_signature(
    shingle_col: Column | str, num_hashes: int = 64
) -> Column:
    """MinHash signature: per seed s, min over shingles of
    xxhash64(shingle, s). Pure JVM — no Python crossing.

    Structured so the (expensive) shingle expression is evaluated ONCE
    per row: each shingle string is hashed to a long, then a single
    fold (`aggregate`) updates all num_hashes minima per shingle with
    cheap long-pair hashes. The naive nesting — transform(seeds,
    s -> array_min(transform(shingles, ...))) — re-evaluates the whole
    shingling pipeline per seed inside an interpreted HOF, which is
    ~60x slower at 64 hashes."""
    sh = F.col(shingle_col) if isinstance(shingle_col, str) else shingle_col
    base = F.transform(sh, lambda g: F.xxhash64(g))
    seeds = F.array(*[F.lit(i) for i in range(num_hashes)])
    init = F.array(
        *[F.lit(0x7FFFFFFFFFFFFFFF).cast("long")] * num_hashes
    )
    return F.aggregate(
        base,
        init,
        lambda acc, h: F.zip_with(
            acc, seeds, lambda m, s: F.least(m, F.xxhash64(h, s))
        ),
    )


def lsh_band_rows(
    df: DataFrame,
    id_col: str = "doc_id",
    sig_col: str = "minhash",
    bands: int = 16,
    rows_per_band: int = 4,
) -> DataFrame:
    """Explode minhash signatures into (id, band_id, band_hash) rows —
    the shared banding primitive for batch pair generation
    (:func:`lsh_candidate_pairs`) and the streaming bucket-store
    ingest (streaming/neardup.py)."""
    band_idx = F.sequence(F.lit(0), F.lit(bands - 1))
    return df.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.transform(
                band_idx,
                lambda b: F.struct(
                    b.alias("band_id"),
                    F.xxhash64(
                        F.concat_ws(
                            ",",
                            F.transform(
                                F.slice(
                                    F.col(sig_col),
                                    b * rows_per_band + 1,
                                    rows_per_band,
                                ),
                                lambda v: v.cast("string"),
                            ),
                        )
                    ).alias("band_hash"),
                ),
            )
        ).alias("band"),
    ).select("id", "band.band_id", "band.band_hash")


def lsh_candidate_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    sig_col: str = "minhash",
    bands: int = 16,
    rows_per_band: int = 4,
    max_bucket: int | None = None,
) -> DataFrame:
    """Banding: docs sharing any (band_id, band_hash) bucket become a
    candidate pair (id1 < id2, distinct).

    Single-pass: explode signatures into (band_id, band_hash, id) rows,
    groupBy bucket (one shuffle, map-side combine via collect_list),
    then expand each bucket's id list into its ordered pairs with JVM
    HOFs. No self-join — the signature expression is evaluated once,
    and there is exactly one shuffle over the banded rows. At scale,
    degenerate buckets (boilerplate docs hashing identically) would
    blow up the pair expansion quadratically; `max_bucket` drops them
    (a bucket that large is not a near-dup *pair* signal anyway — handle
    via exact dedup first)."""
    banded = lsh_band_rows(df, id_col, sig_col, bands, rows_per_band)
    buckets = banded.groupBy("band_id", "band_hash").agg(
        F.array_sort(F.collect_list("id")).alias("ids")
    )
    if max_bucket is not None:
        buckets = buckets.filter(F.size("ids") <= max_bucket)
    ids = F.col("ids")
    pairs = F.flatten(
        F.transform(
            ids,
            lambda x, i: F.transform(
                F.slice(ids, i + 2, F.greatest(F.size(ids) - i - 1, F.lit(0))),
                lambda y: F.struct(x.alias("id1"), y.alias("id2")),
            ),
        )
    )
    return (
        buckets.filter(F.size("ids") >= 2)
        .select(F.explode(pairs).alias("p"))
        .select("p.id1", "p.id2")
        .distinct()
    )


def jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard over two (distinct-element) array columns."""
    inter = F.size(F.array_intersect(a, b)).cast("double")
    union = F.size(F.array_distinct(F.concat(a, b))).cast("double")
    return inter / union


def jaccard_pairs(
    df: DataFrame,
    id_col: str,
    set_col: str,
    block_col: str | None = None,
    threshold: float = 0.8,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Exact pairwise Jaccard within a blocking key (F2 exact path).

    All-pairs is O(n²); the block column (source, LSH bucket, length
    band, ...) bounds each block so the join stays tractable at scale.
    Pass ``candidates`` (id1/id2 pairs, e.g. from
    :func:`lsh_candidate_pairs`) to score only those pairs instead of
    the blocked self-join — the production-scale composition.

    Plan (blocked path): **shingle co-occurrence**, not a pairwise
    block self-join. Rows explode to (block, shingle, id); a self
    equi-join on the high-entropy (block, shingle) key generates a row
    per *shared* shingle per pair; one groupBy counts |A∩B|. Pairs
    sharing nothing are never materialized, so cost is
    Σ_shingle freq² instead of Σ_block |block|² — the difference
    between "survives 100 TB" and "quadratic in the block size".
    Three exactness notes:

    - **length-ratio prune** on the join: J(A,B) ≤
      min(|A|,|B|)/max(|A|,|B|), so mismatched-size pairs drop before
      the groupBy (epsilon slack keeps the bound strictly necessary
      under float rounding — a prune false-positive costs a few
      counted rows, a false negative would be a wrong answer).
    - **inclusion–exclusion union**: |A∪B| = |A|+|B|−|A∩B|. Sizes are
      exact ints, so the final double division is bitwise-identical
      to an array_intersect/array_distinct(concat) formulation.
    - requires ``threshold > 0``: zero-overlap pairs are (correctly)
      absent from the co-occurrence join, and J=0 pairs can only
      matter for a threshold of 0.

    The ``candidates`` path scores exactly the given (id1, id2) pairs
    via two narrow joins + one array_intersect per pair (candidate
    sets are pre-pruned, e.g. LSH output, so pairwise is cheap there).
    """
    if threshold <= 0 and candidates is None:
        raise ValueError(
            "jaccard_pairs requires threshold > 0 (J=0 pairs are not "
            "enumerable from a co-occurrence plan); pass explicit "
            "`candidates` pairs to score at any threshold"
        )
    # Set semantics regardless of input: dedup once per ROW (cheap)
    # so |A| and inclusion–exclusion are exact even if the caller
    # passes arrays with repeats (array_intersect dedups implicitly).
    s_distinct = F.array_distinct(set_col)
    cols = [
        F.col(id_col).alias("id"),
        s_distinct.alias("s"),
        F.size(s_distinct).alias("sz"),
    ]
    if block_col is not None:
        cols.append(F.col(block_col).alias("blk"))
    s = df.select(*cols)

    jac = (
        F.col("__inter").cast("double")
        / (F.col("__sza") + F.col("__szb") - F.col("__inter"))
    ).alias("jaccard")

    if candidates is not None:
        a, b = s.alias("a"), s.alias("b")
        ratio_ok = (
            F.least(F.col("a.sz"), F.col("b.sz")).cast("double")
            >= (threshold - 1e-9) * F.greatest(F.col("a.sz"), F.col("b.sz"))
        )
        pairs = candidates.select(
            F.col("id1").alias("__id1"), F.col("id2").alias("__id2")
        )
        joined = (
            pairs.join(a, F.col("__id1") == F.col("a.id"))
            .join(b, F.col("__id2") == F.col("b.id"))
            .filter(ratio_ok)
        )
        scored = joined.select(
            F.col("a.id").alias("id1"),
            F.col("b.id").alias("id2"),
            F.col("a.sz").alias("__sza"),
            F.col("b.sz").alias("__szb"),
            F.size(F.array_intersect(F.col("a.s"), F.col("b.s"))).alias(
                "__inter"
            ),
        ).select("id1", "id2", jac)
        return scored.filter(F.col("jaccard") >= threshold)

    tok_cols = [F.col("id"), F.col("sz"), F.explode("s").alias("shingle")]
    join_keys = ["shingle"]
    if block_col is not None:
        tok_cols.append(F.col("blk"))
        join_keys = ["blk", "shingle"]
    tok = s.select(*tok_cols)
    a, b = tok.alias("a"), tok.alias("b")
    ratio_ok = (
        F.least(F.col("a.sz"), F.col("b.sz")).cast("double")
        >= (threshold - 1e-9) * F.greatest(F.col("a.sz"), F.col("b.sz"))
    )
    co = a.join(b, join_keys).filter((F.col("a.id") < F.col("b.id")) & ratio_ok)
    counted = (
        co.groupBy(
            F.col("a.id").alias("id1"),
            F.col("b.id").alias("id2"),
            F.col("a.sz").alias("__sza"),
            F.col("b.sz").alias("__szb"),
        )
        .agg(F.count(F.lit(1)).alias("__inter"))
        .select("id1", "id2", jac)
    )
    return counted.filter(F.col("jaccard") >= threshold)


def simhash64(token_col: Column | str, bits: int = 64) -> Column:
    """SimHash: sum ±1 per bit of each token's xxhash64, take sign
    bits. Entirely JVM HOFs; the accumulator is a `bits`-int array.
    Bit positions unroll in Python (Spark shift amounts must be
    literal ints)."""
    toks = F.col(token_col) if isinstance(token_col, str) else token_col

    def contrib(tok: Column) -> Column:
        h = F.xxhash64(tok)
        return F.array(
            *[
                F.when(
                    F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, F.lit(1)
                ).otherwise(F.lit(-1))
                for i in range(bits)
            ]
        )

    counts = F.aggregate(
        toks,
        F.array_repeat(F.lit(0), bits),
        lambda acc, tok: F.zip_with(acc, contrib(tok), lambda x, y: x + y),
    )
    # Fold sign bits into one signed 64-bit fingerprint. `counts` must
    # appear exactly ONCE in the expression tree — indexing it per bit
    # would duplicate the whole aggregate subtree 64× and blow codegen.
    bitvals = F.array(
        *[
            F.lit(1 << i if i < 63 else -(1 << 63)).cast("long")
            for i in range(bits)
        ]
    )
    return F.aggregate(
        F.zip_with(
            counts,
            bitvals,
            lambda c, v: F.when(c > 0, v).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two 64-bit fingerprints."""
    x = a.bitwiseXOR(b)
    return F.bit_count(x)


def boilerplate_key(col: Column | str) -> Column:
    """64-bit key of a paragraph's boilerplate-normal form:
    whitespace-collapsed, lowercased, DIGIT-STRIPPED (so 'Copyright
    2023' == 'Copyright 2024' == 'Copyright Corp' once the residual
    gap re-collapses), xxhash64. Shared by the batch operator
    (:func:`remove_boilerplate`) and the streaming ingest
    (streaming/boilerplate.py) so their stores interoperate."""
    c = F.col(col) if isinstance(col, str) else col
    stripped = F.regexp_replace(normalize_text(c), r"\d+", "")
    return F.xxhash64(F.trim(F.regexp_replace(stripped, r"\s+", " ")))


def remove_boilerplate(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n",
    min_docs: int | None = None,
    min_doc_frac: float | None = None,
    keep_empty: bool = True,
) -> DataFrame:
    """PARAGRAPH-grain boilerplate removal (the CCNet/RefinedWeb
    cut): a paragraph whose normalized form recurs across many
    DISTINCT documents is template furniture — cookie banners,
    navigation, subscription prompts, copyright footers — not
    authored content, and is dropped from every document.

    Plan (all JVM-side, no Python, no driver collect):

    1. ``split`` + ``posexplode`` to (id, idx, para) rows;
       normalization = :func:`normalize_text` + digit-stripping (so
       'Copyright 2023' == 'Copyright 2024'); key = ``xxhash64`` of
       the normalized form (64-bit keys shuffle instead of full
       paragraph strings — the CCNet trade: a 2^-64 collision can
       drop a unique paragraph).
    2. distinct-document counts per key: one ``groupBy(key)``
       shuffle with map-side partial aggregation.
    3. boilerplate keys = count >= ``min_docs`` (absolute), or
       count >= ``min_doc_frac`` * total docs — the total arrives
       as a broadcast 1-row aggregate, so the fraction form is
       still one lazy plan (no driver-side ``count()``).
    4. ``left_anti`` join segments against boilerplate keys (both
       sides hash-partitioned on the key — AQE reuses the agg's
       partitioning), then reassemble per document with
       ``array_sort(collect_list(struct(idx, para)))`` — paragraph
       ORDER is restored exactly, independent of shuffle order.

    ``keep_empty=True`` (default) retains documents whose every
    paragraph was boilerplate as empty strings — corpus row counts
    stay stable for downstream joins; ``False`` drops them.

    At 100 TB: three shuffles (para-key agg, para-key anti-join,
    doc-id regroup), each on a well-distributed key; the hot key
    problem is structurally absent from the anti-join's STREAM side
    (every para row is unique by (id, idx)) and the build side is
    the count table (one row per distinct paragraph). Returns
    (id_col, text_col) with paragraphs rejoined by ``sep``."""
    if (min_docs is None) == (min_doc_frac is None):
        raise ValueError("pass exactly one of min_docs / min_doc_frac")
    cid = F.col(id_col)
    seg = df.select(
        cid.alias("__id"),
        F.posexplode(F.split(F.col(text_col), sep)).alias(
            "__idx", "__para"
        ),
    )
    keyed = seg.withColumn("__key", boilerplate_key(F.col("__para")))
    counts = keyed.groupBy("__key").agg(
        F.countDistinct("__id").alias("__n_docs")
    )
    if min_docs is not None:
        boiler = counts.filter(F.col("__n_docs") >= min_docs)
    else:
        total = df.select(
            F.countDistinct(cid).alias("__total")
        )
        boiler = counts.crossJoin(F.broadcast(total)).filter(
            F.col("__n_docs").cast("double")
            >= F.lit(float(min_doc_frac)) * F.col("__total")
        )
    kept = keyed.join(
        boiler.select("__key"), on="__key", how="left_anti"
    )
    rebuilt = kept.groupBy("__id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("__idx", "__para"))
                ),
                lambda s: s["__para"],
            ),
            sep,
        ).alias(text_col)
    )
    if keep_empty:
        rebuilt = (
            df.select(cid.alias("__id"))
            .distinct()
            .join(rebuilt, on="__id", how="left")
            .withColumn(text_col, F.coalesce(F.col(text_col), F.lit("")))
        )
    return rebuilt.select(F.col("__id").alias(id_col), text_col)


def ngram_contamination(
    eval_df: DataFrame,
    bench_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
) -> DataFrame:
    """Benchmark-contamination screen: for every eval document, the
    fraction of its distinct word n-gram shingles that also occur
    anywhere in the benchmark corpus.

    The standard pre-training decontamination primitive (n-gram
    overlap against held-out eval sets). Plan shape for 100 TB: the
    eval corpus explodes to (id, shingle) rows — one narrow shuffle-
    free pass — and probes the benchmark's DISTINCT shingle set with a
    broadcast LEFT SEMI join (benchmarks are tiny relative to a crawl;
    if not, the semi join degrades gracefully to a shuffled hash
    join on the high-entropy shingle key). One groupBy on the doc id
    closes the loop; the corpus text itself is never shuffled.
    """
    sh = shingles(text_col, n)
    doc_sh = eval_df.select(
        F.col(id_col), F.explode(sh).alias("shingle")
    ).distinct()
    totals = doc_sh.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_shingles")
    )
    bench_sh = (
        bench_df.select(F.explode(shingles(text_col, n)).alias("shingle"))
        .distinct()
    )
    hits = (
        doc_sh.join(F.broadcast(bench_sh), "shingle", "left_semi")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    return (
        totals.join(hits, id_col, "left")
        .select(
            id_col,
            "n_shingles",
            F.coalesce(F.col("n_hit"), F.lit(0)).alias("n_hit"),
            (
                F.coalesce(F.col("n_hit"), F.lit(0)).cast("double")
                / F.col("n_shingles")
            ).alias("contamination_frac"),
        )
    )


# ---------------------------------------------------------------------
# incremental exact dedup against a persistent corpus store
# ---------------------------------------------------------------------


def dedup_against_store(
    new_docs: DataFrame,
    store: DataFrame,
    text_col: str = "text",
    order_col: str = "doc_id",
    hash_col: str = "__text_sha",
    store_hash_col: str | None = None,
    fpp: float = 0.001,
    bloom_threshold: int = 10_000_000,
) -> DataFrame:
    """New-batch rows whose normalized-text hash is NOT already in the
    corpus store (within-batch keep-first applied too) — the
    incremental-ingest dedup every append-only corpus needs.

    Scale shape (store >> batch, the steady state): the batch's hash
    set builds a BLOOM FILTER (bounded bytes, one aggregation), which
    prunes the STORE's hash scan to candidate rows before any join —
    the big side contributes only rows that might collide with the
    batch, so the anti-join's shuffle is batch-sized, not store-sized
    (Trino/Snowflake-style join pruning, operators/runtime_filter).
    Exactness: bloom false positives only ADD candidate rows on the
    anti-join's right side, and extra right rows whose hash matches
    no batch row change nothing; false negatives are impossible — so
    the result equals the plain anti-join (pinned in tests). The
    bloom build runs one Spark job; batches above ``bloom_threshold``
    rows skip the filter and take the plain narrow anti-join (at that
    size the store-scan saving no longer pays for a giant filter).

    ``store`` needs only a hash column: pass ``store_hash_col`` when
    the store persists hashes (the ``keep_hash=True`` convention of
    :func:`exact_dedup` — strongly preferred at scale: the store's
    text column is then never read at all), else its text column is
    hashed on the fly.
    """
    from pdf2dataset_spark.operators import runtime_filter as rtf

    batch = exact_dedup(
        new_docs, text_col, order_col=order_col, keep_hash=True,
        strategy="join",
    ).withColumnRenamed("text_sha256", hash_col)
    if store_hash_col is None:
        store_hashes = store.select(text_hash(text_col).alias(hash_col))
    else:
        store_hashes = store.select(F.col(store_hash_col).alias(hash_col))

    # size the bloom from the RAW batch count (narrow scan-count, no
    # dedup shuffle; an upper bound is fine for suggest_params), and
    # localCheckpoint the deduped batch before the bloom path so the
    # dedup plan executes ONCE — not once each for sizing, bloom build,
    # and the final anti-join. The checkpoint blocks are released when
    # the frame is garbage-collected (ContextCleaner), so no
    # session-lifetime cache accumulates.
    n_hint = new_docs.count()
    if 0 < n_hint <= bloom_threshold:
        batch = batch.localCheckpoint()
        num_bits, k = rtf.suggest_params(n_hint, fpp)
        words = rtf.bloom_build(batch, hash_col, num_bits, k)
        store_hashes = rtf.bloom_probe(store_hashes, hash_col, words, k)
    return batch.join(store_hashes, hash_col, "left_anti")


def ingest_exact(
    new_docs: DataFrame,
    store_path: str,
    text_col: str = "text",
    order_col: str = "doc_id",
    hash_col: str = "__text_sha",
) -> int:
    """Append-only exact-dedup ingest: survivors of
    :func:`dedup_against_store` (vs the parquet store at
    ``store_path``) are APPENDED to the store with their hash column
    persisted, so the next batch's store side never re-hashes or even
    reads text. First call creates the store. Returns the number of
    rows appended. Crash contract: append happens after the dedup
    plan is fully determined from the OLD store listing; a re-run of
    the same batch after a mid-write crash re-drops already-stored
    hashes, so duplicates cannot accumulate (at-least-once feed →
    exactly-once store content, the streaming/neardup convention).

    **Single-writer contract.** The exists→read→dedup→append sequence
    is NOT safe under concurrent writers: two overlapping ingests each
    dedup against the old listing and can both append the same hash.
    A best-effort ``<store>.ingest.lock`` file is taken with an
    atomic-create before the read (atomic on HDFS/local; advisory on
    object stores whose create is not atomic) and released after the
    append; a held lock raises ``ConcurrentIngestError``. A crashed
    writer leaves the lock behind — delete it manually after
    confirming no ingest is running (the replay contract above makes
    the retry safe). Multi-writer deployments should serialize ingest
    upstream or use a transactional table format instead.
    """
    spark = new_docs.sparkSession
    # NOTE: spark._jvm/_jsc are private PySpark surfaces (stable since
    # 1.x, but unversioned) — the only way to reach Hadoop FileSystem
    # from Python without a filesystem-specific client library.
    hadoop_path = spark._jvm.org.apache.hadoop.fs.Path  # type: ignore[union-attr]
    jvm_path = hadoop_path(store_path)
    fs = jvm_path.getFileSystem(
        spark._jsc.hadoopConfiguration()  # type: ignore[union-attr]
    )
    lock_path = hadoop_path(store_path.rstrip("/") + ".ingest.lock")
    try:
        # createNewFile-style atomic create: fails if the lock exists
        fs.create(lock_path, False).close()
    except Exception as exc:
        raise ConcurrentIngestError(
            f"ingest lock {lock_path} is held — another ingest is "
            "running, or a crashed one left it behind (safe to delete "
            "after confirming no writer is active)"
        ) from exc
    try:
        store = None
        if fs.exists(jvm_path):
            try:
                store = spark.read.parquet(store_path)
            except Exception:
                # a first-batch crash mid-write leaves the directory
                # with only uncommitted _temporary files: no committed
                # schema to read — treat as an empty store so the
                # documented replay contract holds instead of wedging
                # every retry
                store = None
        if store is not None:
            survivors = dedup_against_store(
                new_docs, store, text_col, order_col,
                hash_col=hash_col, store_hash_col=hash_col,
            )
        else:
            survivors = exact_dedup(
                new_docs, text_col, order_col=order_col, keep_hash=True,
                strategy="join",
            ).withColumnRenamed("text_sha256", hash_col)
        survivors = survivors.localCheckpoint()  # freeze before append
        n = survivors.count()
        if n:
            survivors.write.mode("append").parquet(store_path)
        return n
    finally:
        fs.delete(lock_path, False)
