"""PII detection and redaction for training-data pipelines.

Emails, North-American-style phone numbers, and IPv4 addresses via
pure `pyspark.sql.functions` regex ops (JVM-side, whole-stage codegen
— no Python UDFs), the standard pre-training scrub (e.g. the C4 and
BigScience ROOTS pipelines redact exactly these classes before
training). Patterns are deliberately lookaround-free so they behave
identically under Java regex (Spark) and RE2 (the DuckDB oracle).

Scale shape: every function is a narrow per-row projection — no
shuffle, no driver-side work; filters/projections around it still push
down to the parquet scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Ordered: redaction applies them in this sequence (email first so
# "user@host" is consumed before the digit patterns see its text).
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
     "<EMAIL>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b", "<PHONE>"),
)


def redact_col(text: Column) -> Column:
    """Text with all PII classes replaced by their tags, applied in
    PII_PATTERNS order."""
    out = text
    for _, pattern, tag in PII_PATTERNS:
        out = F.regexp_replace(out, pattern, tag)
    return out


def pii_stats(docs: DataFrame, text_col: str = "text",
              id_col: str = "doc_id",
              include_redacted_md5: bool = False) -> DataFrame:
    """(doc_id, n_emails, n_ips, n_phones, n_pii) match counts per
    document. Counts are taken on the progressively-redacted text the
    same way redact_col consumes it, so overlapping classes (an IPv4
    inside an email's domain, digits inside an IP) are attributed to
    exactly one class and the counts always sum to the number of
    redaction tags. With include_redacted_md5, a `redacted_md5` column
    (md5 of the fully-scrubbed text) rides the SAME single narrow
    projection — no second scan, no join."""
    text = F.col(text_col)
    counts = []
    for name, pattern, tag in PII_PATTERNS:
        counts.append(F.regexp_count(text, F.lit(pattern))
                      .alias(f"n_{name}s"))
        text = F.regexp_replace(text, pattern, tag)
    cols = [F.col(id_col).alias("doc_id"), *counts]
    if include_redacted_md5:
        # `text` is now the fully-redacted expression
        cols.append(F.md5(text).alias("redacted_md5"))
    return docs.select(*cols).withColumn(
        "n_pii",
        sum(F.col(f"n_{name}s") for name, _, _ in PII_PATTERNS)
        .alias("n_pii"),
    )


def redact_pii(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """docs with `text_col` scrubbed in place."""
    return docs.withColumn(text_col, redact_col(F.col(text_col)))
