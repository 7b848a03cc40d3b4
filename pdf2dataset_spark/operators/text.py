"""Text analysis operators for training-data pipelines (tier F).

Language ID (n-gram/stopword heuristic), quality scoring, token
counting (whitespace + BPE-ish regex), and document fingerprinting
(rolling-hash winnowing-lite). All pure Catalyst expressions —
per-row compute, no shuffle, no Python — so they run at scan speed
on a 100 TB corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Minimal per-language marker profiles (top function words). Used by
# the heuristic language identifier; extend freely.
LANG_PROFILES: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "for", "was"],
    "fr": ["le", "la", "les", "de", "et", "un", "une", "est", "que", "pour"],
    "es": ["el", "la", "los", "de", "y", "un", "una", "es", "que", "por"],
    "de": ["der", "die", "das", "und", "ist", "ein", "eine", "zu", "nicht", "von"],
    "pt": ["o", "a", "os", "de", "e", "um", "uma", "que", "não", "para"],
}

BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def ws_tokens(col: Column | str) -> Column:
    """Whitespace tokenization."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(c), r"\s+")


def bpe_ish_tokens(col: Column | str) -> Column:
    """BPE-ish pre-tokenization: letter runs, digit runs, single
    punctuation — the usual byte-pair pre-split regex family."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(c, F.lit(BPE_ISH_PATTERN), 0)


def token_count(col: Column | str, bpe: bool = False) -> Column:
    return F.size(bpe_ish_tokens(col) if bpe else ws_tokens(col))


def stopword_ratio(col: Column | str, stopwords: list[str]) -> Column:
    """Fraction of whitespace tokens that are in `stopwords`."""
    toks = ws_tokens(col)
    hits = F.size(
        F.filter(toks, lambda t: F.lower(t).isin([s.lower() for s in stopwords]))
    )
    return hits.cast("double") / F.size(toks)


def lang_scores(col: Column | str, profiles: dict[str, list[str]] | None = None) -> Column:
    """Array of (lang, score) structs, score = stopword hit ratio."""
    profiles = profiles or LANG_PROFILES
    toks = ws_tokens(col)
    entries = [
        F.struct(
            F.lit(lang).alias("lang"),
            (
                F.size(F.filter(toks, lambda t: F.lower(t).isin(words))).cast("double")
                / F.size(toks)
            ).alias("score"),
        )
        for lang, words in sorted(profiles.items())
    ]
    return F.array(*entries)


def lang_id(col: Column | str, profiles: dict[str, list[str]] | None = None) -> Column:
    """Predicted language = argmax score, ties broken by lang name
    (deterministic). Returns 'und' when nothing matches."""
    scores = lang_scores(col, profiles)
    best = F.aggregate(
        scores,
        F.struct(F.lit("und").alias("lang"), F.lit(0.0).alias("score")),
        lambda acc, s: F.when(s["score"] > acc["score"], s).otherwise(acc),
    )
    return best["lang"]


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Standard quality-signal columns: length, token stats, ratios.

    All deterministic double arithmetic (counts divided by counts), so
    downstream filters are oracle-checkable.
    """
    c = F.col(text_col)
    toks = ws_tokens(text_col)
    n_char = F.length(c)
    n_tok = F.size(toks)
    return df.withColumns(
        {
            "q_n_chars": n_char.cast("bigint"),
            "q_n_tokens": n_tok,
            "q_mean_token_len": (n_char - (n_tok - 1)).cast("double") / n_tok,
            "q_type_token_ratio": F.size(F.array_distinct(toks)).cast("double")
            / n_tok,
            "q_alpha_ratio": (
                F.length(F.regexp_replace(c, r"[^A-Za-z]", "")).cast("double") / n_char
            ),
            "q_digit_ratio": (
                F.length(F.regexp_replace(c, r"[^0-9]", "")).cast("double") / n_char
            ),
        }
    )


def quality_filter(
    df: DataFrame,
    text_col: str = "text",
    min_tokens: int = 5,
    max_tokens: int = 100_000,
    min_mean_token_len: float = 2.0,
    max_mean_token_len: float = 12.0,
) -> DataFrame:
    """Gopher-style length/shape filter built on quality_features."""
    out = quality_features(df, text_col)
    return out.filter(
        (F.col("q_n_tokens") >= min_tokens)
        & (F.col("q_n_tokens") <= max_tokens)
        & (F.col("q_mean_token_len") >= min_mean_token_len)
        & (F.col("q_mean_token_len") <= max_mean_token_len)
    )


def char_ngram_fingerprint(col: Column | str, width: int = 20) -> Column:
    """Winnowing-lite document fingerprint: the lexicographic minimum
    of md5 over all `width`-char windows (rolling-hash family). Equal
    fingerprints ⇒ shared window ⇒ likely containment/near-dup."""
    c = F.col(col) if isinstance(col, str) else col
    idx = F.sequence(F.lit(1), F.greatest(F.length(c) - (width - 1), F.lit(1)))
    return F.array_min(F.transform(idx, lambda i: F.md5(F.substring(c, i, width))))


def chunk_tokens(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """Split documents into overlapping token windows — the standard
    pre-training chunking step (window tokens per sample, `overlap`
    tokens of context carried across boundaries).

    One row in, ceil((n_tokens - overlap) / stride) rows out, computed
    entirely JVM-side: tokenize once, explode a chunk-index sequence,
    slice per index. No shuffle — chunking is per-row, so at 100 TB it
    pipelines inside the scan stage; exact integer index math keeps it
    oracle-checkable against DuckDB list slicing.
    """
    if overlap >= window:
        raise ValueError("overlap must be < window")
    stride = window - overlap
    toks = F.split(F.col(text_col), " ")
    n = F.size(toks)
    n_chunks = F.greatest(
        F.floor((n - F.lit(overlap) + F.lit(stride - 1)) / F.lit(stride)).cast(
            "int"
        ),
        F.lit(1),
    )
    out = df.select(
        F.col(id_col),
        toks.alias("__toks"),
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_id"),
    )
    piece = F.slice(F.col("__toks"), F.col("chunk_id") * stride + 1, window)
    return out.select(
        id_col,
        "chunk_id",
        F.concat_ws(" ", piece).alias("chunk_text"),
        F.size(piece).alias("chunk_tokens"),
    )


def repetition_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Gopher-style repetition signals per document:

    - dup_bigram_frac: 1 - distinct-bigram/bigram ratio — boilerplate
      and looping generations push this toward 1;
    - top_token_frac: share of the single most frequent token.

    Both are exact integer counts divided once in double, so the
    column is oracle-checkable. The top-token count is O(n log n) per
    row (sort + longest-run fold) — no shuffle, pipelined in the scan
    like all per-row ops.
    """
    toks = F.split(F.col(text_col), " ")
    n = F.size(toks)
    bigrams = F.transform(
        F.sequence(F.lit(1), F.greatest(n - 1, F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(toks, i, 2)),
    )
    dup_frac = (
        F.lit(1.0)
        - F.size(F.array_distinct(bigrams)).cast("double")
        / F.size(bigrams).cast("double")
    )
    # Most-frequent-token count in O(n log n): sort, then one fold
    # counting the longest equal-run. (The obvious distinct x filter
    # formulation is O(distinct*n) per row — 3-4x slower end-to-end on
    # real corpora; same exact value either way.)
    init = F.struct(
        F.lit(" ").alias("prev"),
        F.lit(0).alias("run"),
        F.lit(0).alias("best"),
    )
    top_cnt = F.aggregate(
        F.array_sort(toks),
        init,
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc.prev, acc.run + 1).otherwise(F.lit(1)).alias("run"),
            F.greatest(
                acc.best,
                F.when(x == acc.prev, acc.run + 1).otherwise(F.lit(1)),
            ).alias("best"),
        ),
        lambda acc: acc.best,
    )
    return df.select(
        id_col,
        n.alias("n_tokens"),
        dup_frac.alias("dup_bigram_frac"),
        (top_cnt.cast("double") / n.cast("double")).alias("top_token_frac"),
    )


# PII patterns shared by redact_pii and its DuckDB oracle twin.
# Restricted to the regex subset Java (Spark) and RE2 (DuckDB)
# interpret identically: no lookaround, no backreferences.
PII_PATTERNS: dict[str, str] = {
    "url": r"https?://[^ ]+",
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ip": r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
    "phone": r"\+?[0-9]{1,3}[- .]?\([0-9]{3}\)[- .]?[0-9]{3}[- .]?[0-9]{4}"
             r"|\+?[0-9]{1,3}[- .][0-9]{3}[- .][0-9]{3}[- .]?[0-9]{4}",
    "digitrun": r"\b[0-9]{13,19}\b",
}


def redact_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """PII redaction pass for corpus release (F-tier cleaning):
    replaces URLs, emails, IPv4 addresses, phone numbers, and long
    digit runs (card/account-shaped) with typed placeholder tags, and
    reports per-category match counts so downstream audits can track
    redaction rates per source.

    Pure regexp expression chain — per-row, shuffle-free, JVM-side —
    i.e. scan-speed at 100 TB; counts come from regexp_extract_all on
    the ORIGINAL text so later replacements can't mask earlier
    categories. Order matters for the replacements themselves: URLs
    first (they may embed digit runs), then emails, IPs, phones, and
    digit runs over what remains.
    """
    c = F.col(text_col)
    counts = {
        k: F.size(F.regexp_extract_all(c, F.lit(p), 0)).alias(f"n_{k}")
        for k, p in PII_PATTERNS.items()
    }
    cleaned = c
    for key in ("url", "email", "ip", "phone", "digitrun"):
        cleaned = F.regexp_replace(
            cleaned, PII_PATTERNS[key], f"<{key.upper()}>"
        )
    return df.select(
        "*",
        cleaned.alias("redacted"),
        counts["url"],
        counts["email"],
        counts["ip"],
        counts["phone"],
        counts["digitrun"],
    )


def line_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n",
) -> DataFrame:
    """Line-grain exact deduplication (boilerplate removal): split
    each document into lines, keep only the FIRST occurrence of every
    distinct line across the whole corpus (ordered by (doc id, line
    position) — deterministic), and reassemble documents from their
    surviving lines in original order. Repeated navigation chrome /
    cookie banners / signature blocks collapse to one occurrence
    corpus-wide; docs reduced to nothing disappear.

    Plan: posexplode (no shuffle) → one rank window partitioned by the
    line text (high-entropy key, one shuffle) → groupBy doc
    reassembly (second shuffle, keyed by id). The heavy payload moves
    at line grain, never as whole documents. At 100 TB, swap the rank
    window for the agg+semi-join formulation (dedup.exact_dedup
    strategy='join') to shuffle only (hash, winner-id) pairs.
    """
    lines = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), sep)).alias("pos", "line"),
    )
    w = Window.partitionBy("line").orderBy(id_col, "pos")
    kept = (
        lines.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    return (
        kept.groupBy(id_col)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "line"))),
                    lambda s: s["line"],
                ),
                sep,
            ).alias("deduped_text"),
            F.count(F.lit(1)).alias("n_lines_kept"),
        )
    )
