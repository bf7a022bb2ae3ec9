"""URL-level curation for Common-Crawl-style page tables.

Every web-scale indexing pipeline starts by keying pages on their URL:
the reference's omindex builds a unique ``U<url>`` term per document
(omindex.cc:364-368), truncating long URLs with a 32-bit rolling hash
(hashterm.cc:40-69), and uses it for duplicate skipping and
replace-by-urlterm updates (omindex.cc:373-396, skip_duplicates /
replace_document).  This module re-expresses that key, plus the modern
canonicalize-then-dedup stage that crawl curation (CCNet / RefinedWeb
style) layers on top, as pure Catalyst column expressions — no Python
UDFs, so the whole stage stays inside whole-stage codegen and scales as
one hash shuffle on the canonical key.

Scale shape (100 TB corpus):
- ``url_term`` / ``canonicalize_urls`` are narrow per-row projections —
  zero shuffles, fully pushdown-friendly.
- ``url_dedup`` is ONE hash shuffle keyed by canonical URL.  Canonical
  URLs are near-unique (group sizes = recrawl counts, tens at worst),
  so there is no skew concern; max_by aggregates partial map-side.
- ``host_stats`` is ONE shuffle keyed by host.  Hosts ARE skewed
  (head domains hold millions of pages), but the aggregates are all
  algebraic (count / sum), so partial aggregation bounds the reduce-side
  row count at n_distinct_hosts and the skew never materializes a
  large shuffle row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Reference constants (hashterm.h:26, hashterm.cc:32).
MAX_SAFE_TERM_LENGTH = 240
HASH_LEN = (4 * 8 + 5) // 6  # = 6

# Tracking query parameters dropped by canonicalization.  Anchored
# key-match; the value is irrelevant.
TRACKING_PARAM_RE = r"^(utm_[a-z0-9]+|gclid|fbclid|msclkid|mc_eid|ref|ref_src)="

_M32 = 4294967296  # 2^32


def _hash_string(s: Column) -> Column:
    """hashterm.cc:39-58 ``hash_string`` as a Catalyst expression.

    h = 1; for each byte c: h += (h << 5) + c  (i.e. h = h*33 + c),
    truncated to 32 bits; then encoded little-end-first as up to 6
    chars of ``chr((h & 63) + 33)``, space-padded to HASH_LEN.

    The reference folds raw BYTES; this expression folds code points,
    which agrees for ASCII — URLs in crawl tables are ASCII
    (percent-encoded) by convention, and the golden tests pin the
    ASCII behaviour.  The C++ accumulates in 64-bit and masks once at
    the end, but (33*h + c) mod 2^32 depends only on h mod 2^32, so
    masking every step — required to avoid ANSI overflow on BIGINT —
    yields the identical low 32 bits.
    """
    h = F.aggregate(
        F.transform(F.split(s, ""), lambda ch: F.ascii(ch)),
        F.lit(1).cast("long"),
        lambda acc, c: (acc * 33 + c) % _M32,
    )
    chars = []
    for j in range(HASH_LEN):
        hj = F.floor(h / F.lit(64 ** j))
        chars.append(
            F.when(hj != 0, F.chr((hj % 64) + 33)).otherwise(F.lit(" ")))
    return F.concat(*chars)


def url_term(url: Column | str) -> Column:
    """The reference's unique-per-URL document key: ``"U" + url``,
    hash-truncated to MAX_SAFE_TERM_LENGTH when longer
    (omindex.cc:364-368 + hashterm.cc:60-69 ``hash_long_term``).

    hash_long_term keeps the first ``240 - HASH_LEN`` chars of the
    term and replaces the tail with hash_string(tail).
    """
    u = F.col(url) if isinstance(url, str) else url
    term = F.concat(F.lit("U"), u)
    keep = MAX_SAFE_TERM_LENGTH - HASH_LEN  # 234
    truncated = F.concat(
        F.substring(term, 1, keep),
        _hash_string(F.substring(term, keep + 1, 2147483647)),
    )
    return F.when(F.length(term) <= MAX_SAFE_TERM_LENGTH, term) \
            .otherwise(truncated)


# RFC 3986 appendix-B split regex, one capture group per component.
_RFC3986 = r"^(?:([^:/?#]+):)?(?://([^/?#]*))?([^?#]*)(?:\?([^#]*))?(?:#.*)?$"


def canonical_url_expr(url: Column | str) -> Column:
    """Canonical form of ``url`` as a pure column expression.

    Rules (each deterministic and individually pinned by tests):
    - scheme and authority lowercased;
    - a leading ``www.`` stripped from the host;
    - default ports dropped (``:80`` for http, ``:443`` for https);
    - the fragment dropped;
    - empty path → ``/``;
    - query parameters split on ``&``, empties and tracking params
      (TRACKING_PARAM_RE) dropped, the rest sorted lexicographically
      and rejoined — parameter ORDER never distinguishes resources,
      so sorting merges trivially-permuted recrawl URLs.
    """
    u = F.col(url) if isinstance(url, str) else url
    scheme = F.lower(F.regexp_extract(u, _RFC3986, 1))
    auth = F.lower(F.regexp_extract(u, _RFC3986, 2))
    path = F.regexp_extract(u, _RFC3986, 3)
    query = F.regexp_extract(u, _RFC3986, 4)

    host = F.regexp_replace(auth, r"^www\.", "")
    host = F.when(scheme == "http", F.regexp_replace(host, r":80$", "")) \
            .when(scheme == "https", F.regexp_replace(host, r":443$", "")) \
            .otherwise(host)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    params = F.array_sort(F.filter(
        F.split(query, "&"),
        lambda p: (p != "")
        & (F.regexp_extract(p, TRACKING_PARAM_RE, 0) == ""),
    ))
    qpart = F.when(F.size(params) > 0,
                   F.concat(F.lit("?"), F.array_join(params, "&"))) \
             .otherwise(F.lit(""))
    return F.concat(scheme, F.lit("://"), host, path, qpart)


def host_expr(url: Column | str) -> Column:
    """Lowercased host (``www.`` and port stripped) of ``url``."""
    u = F.col(url) if isinstance(url, str) else url
    auth = F.lower(F.regexp_extract(u, _RFC3986, 2))
    return F.regexp_replace(F.regexp_replace(auth, r"^www\.", ""),
                            r":\d+$", "")


def canonicalize_urls(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Add ``canonical_url`` and ``host`` columns.  Narrow projection —
    no shuffle, no Python."""
    return df.withColumn("canonical_url", canonical_url_expr(url_col)) \
             .withColumn("host", host_expr(url_col))


def url_dedup(df: DataFrame, url_col: str = "url",
              ts_col: str = "warc_ts", id_col: str = "doc_id"
              ) -> DataFrame:
    """Keep ONE page per canonical URL: the latest capture (max
    ``ts_col``, ties broken by max ``id_col`` for determinism).

    This is the reference's replace-by-urlterm update semantics
    (omindex.cc:373-396: a recrawled URL replaces the earlier
    document) applied corpus-wide in one aggregation.  One hash
    shuffle keyed by canonical_url; group sizes are recrawl counts,
    so no skew path is needed.  Returns the input columns plus
    ``canonical_url``.
    """
    cols = df.columns
    canon = df.withColumn("canonical_url", canonical_url_expr(url_col))
    key = F.struct(F.col(ts_col), F.col(id_col))
    kept = canon.groupBy("canonical_url").agg(
        F.max_by(F.struct(*cols), key).alias("_row"))
    return kept.select("canonical_url", "_row.*")


def host_stats(df: DataFrame, url_col: str = "url",
               text_col: str = "text", exact: bool = False) -> DataFrame:
    """Per-host curation stats: page count, distinct canonical URLs
    (recrawl-collapsed size), and mean extracted-text length.  All
    algebraic aggregates → map-side partials bound the shuffle at
    one row per host, so head-domain skew never builds a large row.

    Default is approx_count_distinct (HLL) rather than exact
    COUNT(DISTINCT): at head-domain scale an exact distinct re-shuffles
    every (host, url) pair; the sketch keeps the aggregation one-pass.
    ``exact=True`` switches to the exact distinct for small inputs and
    deterministic verification.
    """
    canon = canonicalize_urls(df, url_col)
    n_canon = (F.count_distinct(F.col("canonical_url")) if exact
               else F.approx_count_distinct("canonical_url"))
    return canon.groupBy("host").agg(
        F.count(F.lit(1)).alias("n_pages"),
        n_canon.alias("n_canonical"),
        F.avg(F.length(text_col)).alias("avg_text_len"),
    )


# Default soft-banned URL substrings for the RefinedWeb-style word
# filter — a tiny deterministic stand-in for the production list
# (RefinedWeb §3.1 scores URLs against a weighted vocabulary; plug the
# real list in via the `banned_words` argument).
DEFAULT_URL_BANNED_WORDS = ("casino", "porn", "viagra", "webcam",
                            "xxx")


def url_filter(df: DataFrame, blocked_hosts=None, banned_words=None,
               max_word_hits: int = 0,
               url_col: str = "url") -> DataFrame:
    """RefinedWeb-style URL filtering — the cheapest curation stage,
    run FIRST so later stages never touch blocked pages:

    - hard host blocklist: drop the page when its canonical host is in
      `blocked_hosts` (adult/fraud/malware domain lists in
      production);
    - soft banned-word score: count case-insensitive occurrences of
      each `banned_words` entry in the full URL; drop when the total
      exceeds `max_word_hits`.

    Returns the surviving rows with `host` and `url_word_hits`
    columns. The blocklist arrives by BROADCAST join (production lists
    are millions of rows — still broadcast-sized); the word scan is a
    narrow per-row expression. Nothing about the page body is read:
    with parquet column pruning, this stage scans only the URL column.
    """
    from xapian_spark.pipeline.heuristics import _count_occurrences

    if banned_words is None:
        banned_words = DEFAULT_URL_BANNED_WORDS
    low = F.lower(F.col(url_col))
    hits = F.lit(0).cast("long")
    for w in banned_words:
        hits = hits + _count_occurrences(low, w.lower())
    out = df.withColumn("host", host_expr(url_col)) \
            .withColumn("url_word_hits", hits)
    if blocked_hosts is not None:
        from pyspark.sql import DataFrame as _DF

        if isinstance(blocked_hosts, _DF):
            bl = blocked_hosts.select(
                F.col(blocked_hosts.columns[0]).alias("host"))
        else:
            # pandas -> Arrow LocalRelation: a parallelized driver
            # list would pay defaultParallelism Python-worker tasks
            # per action (see the tiny-write note in BENCH.md).
            # Explicit schema: an empty blocklist (present-but-empty
            # file) must filter nothing, not fail schema inference.
            import pandas as pd

            bl = df.sparkSession.createDataFrame(
                pd.DataFrame({"host": list(blocked_hosts)},
                             dtype="object"),
                schema="host string")
        out = out.join(F.broadcast(bl), "host", "left_anti")
    return out.filter(F.col("url_word_hits") <= max_word_hits)


def surt_key_expr(url: Column | str) -> Column:
    """SURT (Sort-friendly URI Reordering Transform) key — the
    Internet Archive / Common Crawl CDX ``urlkey`` convention:
    ``http://www.Example.com/A/b?x=2&utm_s=t`` →
    ``com,example)/a/b?x=2``. Host rules shared with host_expr
    (lowercase, ``www.``/port stripped), components reversed and
    comma-joined; path and the canonically-sorted query (tracking
    params dropped, same rules as canonical_url_expr) lowercased.
    Pure Catalyst expressions — narrow, codegen-friendly, and the
    natural range-partition key for a crawl index (pages of one
    domain sort adjacent)."""
    u = F.col(url) if isinstance(url, str) else url
    host = host_expr(u)
    path = F.lower(F.regexp_extract(u, _RFC3986, 3))
    query = F.lower(F.regexp_extract(u, _RFC3986, 4))
    path = F.when(path == "", F.lit("/")).otherwise(path)
    params = F.array_sort(F.filter(
        F.split(query, "&"),
        lambda p: (p != "")
        & (F.regexp_extract(p, TRACKING_PARAM_RE, 0) == ""),
    ))
    qpart = F.when(F.size(params) > 0,
                   F.concat(F.lit("?"), F.array_join(params, "&"))) \
             .otherwise(F.lit(""))
    return F.concat(F.array_join(F.reverse(F.split(host, r"\.")), ","),
                    F.lit(")"), path, qpart)


def cdx_index(pages: DataFrame, url_col: str = "url",
              ts_col: str = "warc_ts",
              payload_col: str = "html") -> DataFrame:
    """CDX-style capture index over a pages table: one row per
    capture — (urlkey, ts14, url, digest, length) — globally ordered
    by (urlkey, ts14) the way CDX files are, via repartitionByRange +
    sortWithinPartitions (range-partitioned sorted runs are how a
    distributed engine writes a globally sorted index; NO single-task
    global sort). Lookups by url prefix then touch one partition
    range. digest is the payload md5, length its byte count."""
    out = pages.select(
        surt_key_expr(url_col).alias("urlkey"),
        F.date_format(F.col(ts_col), "yyyyMMddHHmmss").alias("ts14"),
        F.col(url_col).alias("url"),
        F.md5(F.col(payload_col)).alias("digest"),
        F.length(F.col(payload_col)).alias("length"))
    return (out.repartitionByRange("urlkey", "ts14")
            .sortWithinPartitions("urlkey", "ts14"))
