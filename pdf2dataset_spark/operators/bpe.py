"""Byte-pair-encoding tokenizer training and application (tier F).

Completes the tokenizer-training story started by the f33 pair-count
query: `train_bpe` learns a deterministic merge list from a corpus,
`bpe_encode` applies it distributed, `bpe_decode` inverts it.

Scale design (the part that matters at 100 TB):

- **Training touches the corpus once.** The only corpus-sized job is
  the word-frequency aggregation (one explode + one groupBy on the
  token key — exactly f33's first stage). Everything after runs on
  the VOCAB-sized (word, freq) table: this is how production BPE
  trainers work too (HuggingFace `tokenizers` trains from word
  counts), because pair statistics are a pure function of it.
- **The vocab collect is guarded.** Like the ANN query-side collect
  (`similarity._collect_query_side`), the driver pulls at most
  `max_vocab + 1` rows and fails fast with a remediation hint — never
  an OOM. A 100 TB corpus has a bounded distinct-word set for any
  sane tokenizer budget; `min_freq` prunes the hapax tail before the
  cap applies.
- **Encoding never shuffles.** `bpe_encode` is one `mapInPandas` pass
  with the merge ranks broadcast; each Arrow batch tokenizes
  independently (embarrassingly parallel, linear scan per word with
  a rank-greedy merge loop).

Determinism: merge selection is (count DESC, pair lexicographic ASC);
float-free integer counts; iteration order over a sorted dict —
re-training on the same corpus yields byte-identical merges on any
cluster size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def word_frequencies(
    docs: DataFrame, text_col: str = "text", min_freq: int = 1
) -> DataFrame:
    """(word, freq) table — the single corpus-sized pass."""
    wf = (
        docs.select(F.explode(F.split(F.col(text_col), " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    if min_freq > 1:
        wf = wf.filter(F.col("freq") >= min_freq)
    return wf


def _pair_counts(vocab: dict[tuple[str, ...], int]) -> dict[tuple[str, str], int]:
    counts: dict[tuple[str, str], int] = {}
    for syms, freq in vocab.items():
        for a, b in zip(syms, syms[1:]):
            counts[(a, b)] = counts.get((a, b), 0) + freq
    return counts


def _merge_vocab(
    vocab: dict[tuple[str, ...], int], pair: tuple[str, str]
) -> dict[tuple[str, ...], int]:
    a, b = pair
    merged = a + b
    out: dict[tuple[str, ...], int] = {}
    for syms, freq in vocab.items():
        ns: list[str] = []
        i = 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                ns.append(merged)
                i += 2
            else:
                ns.append(syms[i])
                i += 1
        key = tuple(ns)
        out[key] = out.get(key, 0) + freq
    return out


def train_bpe(
    docs: DataFrame,
    n_merges: int = 50,
    text_col: str = "text",
    min_freq: int = 1,
    max_vocab: int = 1_000_000,
) -> list[tuple[str, str]]:
    """Learn `n_merges` BPE merges: [(left, right), ...] in rank order.

    Symbols start as single characters (no end-of-word marker, the
    f33 pair-count convention); each round merges the (count DESC,
    pair ASC) argmax pair across the frequency-weighted vocab."""
    rows = (
        word_frequencies(docs, text_col, min_freq)
        .limit(max_vocab + 1)
        .collect()
    )
    if len(rows) > max_vocab:
        raise ValueError(
            f"distinct-word vocabulary exceeds max_vocab={max_vocab}; "
            "raise min_freq to prune the tail (or raise max_vocab "
            "explicitly) — BPE training needs the word-count table, "
            "never the corpus"
        )
    vocab = {tuple(r["word"]): int(r["freq"]) for r in rows}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        counts = _pair_counts(vocab)
        if not counts:
            break
        # (count DESC, pair lexicographic ASC) — total order, no RNG
        top = max(counts.values())
        best_pair = min(p for p, c in counts.items() if c == top)
        merges.append(best_pair)
        vocab = _merge_vocab(vocab, best_pair)
    return merges


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    syms = list(word)
    while len(syms) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i < 0:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Tokenize every document with a trained merge list: appends
    `out_col: array<string>` (sub-word symbols, whitespace-split words
    encoded independently). One mapInPandas pass, merges broadcast —
    zero shuffles."""
    spark = docs.sparkSession
    bc = spark.sparkContext.broadcast(
        {tuple(p): i for i, p in enumerate(merges)}
    )
    cols = docs.columns
    schema = (
        ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in docs.schema.fields)
        + f", {out_col} array<string>"
    )

    def run(batches):
        import pandas as pd

        ranks = bc.value
        cache: dict[str, list[str]] = {}
        for pdf in batches:
            toks = []
            for text in pdf[text_col]:
                out: list[str] = []
                for w in str(text).split(" "):
                    if not w:
                        continue
                    enc = cache.get(w)
                    if enc is None:
                        enc = _encode_word(w, ranks)
                        cache[w] = enc
                    out.extend(enc)
                toks.append(out)
            pdf = pdf.copy()
            pdf[out_col] = toks
            yield pdf

    return docs.mapInPandas(run, schema).select(*cols, out_col)


def bpe_decode(tokens_col):
    """Inverse of the per-word encoding: merges only ever concatenate
    adjacent symbols, so concatenation restores the original words'
    character stream."""
    return F.concat_ws("", tokens_col)
