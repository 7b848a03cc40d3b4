"""PII detection / redaction — a core training-data curation stage.

Corpora scraped from the web carry emails, phone numbers, SSNs,
credit-card numbers and IP addresses that must be measured (audit)
and scrubbed (redaction) before training. Everything here is
JVM-side `regexp_count` / `regexp_replace` expressions — no UDFs, so
the scan stays in whole-stage codegen and the text column never
crosses into Python.

Pattern dialect: the intersection of Java regex (Spark) and RE2
(DuckDB) — `\\d`, `\\b`, non-capturing groups, bounded repetition —
so every operator has an exact DuckDB oracle twin (queries f42/f43).
The patterns are intentionally conservative/high-precision (a
false-positive redaction destroys real text); recall-tuning belongs
in deployment config, not code.

Redaction applies patterns in a FIXED order (cc → ssn → email →
ipv4 → phone): the phone pattern can match digit runs inside a
space-separated card number, so longer/more-specific patterns must
consume their text first.

Scale note: each pattern is one scan-local expression; `redact_pii`
chains them in a single projection — zero shuffles, pushdown-safe.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: kind -> (pattern, replacement token). Insertion order IS the
#: redaction order (see module docstring).
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "cc": (
        r"\b\d{4}[ -]?\d{4}[ -]?\d{4}[ -]?\d{4}\b",
        "[CARD]",
    ),
    "ssn": (r"\b\d{3}-\d{2}-\d{4}\b", "[SSN]"),
    "email": (
        r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
        "[EMAIL]",
    ),
    "ipv4": (r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "[IP]"),
    "phone": (
        r"\+?\d{1,3}[-. (]{1,2}\d{3}[-. )]{1,2}\d{3}[-. ]?\d{4}",
        "[PHONE]",
    ),
}


def _col(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def pii_count(col: Column | str, kind: str) -> Column:
    """Occurrence count of one PII kind (raw pattern count over the
    unredacted text — counts of overlapping kinds are independent)."""
    return F.regexp_count(_col(col), F.lit(PII_PATTERNS[kind][0]))


def with_pii_counts(
    df: DataFrame, text_col: str = "text", prefix: str = "pii_"
) -> DataFrame:
    """Append one ``{prefix}{kind}`` int column per PII kind plus
    ``{prefix}any`` (bool) — the audit projection."""
    out = df
    total = F.lit(0)
    for kind in PII_PATTERNS:
        c = pii_count(text_col, kind)
        out = out.withColumn(f"{prefix}{kind}", c)
        total = total + c
    return out.withColumn(f"{prefix}any", total > 0)


def redact_pii(
    col: Column | str, kinds: tuple[str, ...] | None = None
) -> Column:
    """The text with every selected PII kind replaced by its token,
    applied in PII_PATTERNS order (most-specific first)."""
    c = _col(col)
    for kind in kinds if kinds is not None else tuple(PII_PATTERNS):
        pat, token = PII_PATTERNS[kind]
        c = F.regexp_replace(c, pat, token)
    return c


def luhn_valid(col: Column | str) -> Column:
    """Luhn checksum over the digits of a candidate card string —
    pure JVM higher-order functions (no UDF): strip non-digits,
    reverse, double every second digit (subtracting 9 above 9), sum
    % 10 == 0. Used to demote regex card matches that cannot be real
    card numbers; NULL-safe (null / empty → false)."""
    digits = F.split(
        F.reverse(F.regexp_replace(_col(col), r"\D+", "")), ""
    )
    digits = F.filter(digits, lambda d: d != "")
    summed = F.aggregate(
        F.zip_with(
            digits,
            F.sequence(F.lit(0), F.greatest(F.size(digits) - 1, F.lit(0))),
            lambda d, i: F.when(
                i % 2 == 1,
                F.when(d.cast("int") * 2 > 9, d.cast("int") * 2 - 9)
                .otherwise(d.cast("int") * 2),
            ).otherwise(d.cast("int")),
        ),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    return F.coalesce(
        (F.size(digits) >= 13) & (summed % 10 == 0), F.lit(False)
    )
