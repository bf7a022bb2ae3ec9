"""Deterministic synthetic Common-Crawl-style pages table.

Generates the input shape from BASELINE.json's input_hint:
    (url STRING, warc_ts TIMESTAMP, html BINARY, text STRING, lang STRING)

- fully deterministic per (seed, doc index): same args → same bytes
  (no RNG state shared across rows, so generation parallelizes freely)
- Zipf-distributed vocabulary to exercise head-term skew (SURVEY §7)
- html wraps the text in a template with <title>, <meta>, <script> junk
  and block tags, built so that the reference extraction rules
  (myhtmlparse.cc) recover `text` byte-identically — the per-row
  invariant is testable on every generated row
- a small fraction of near-duplicate pages (suffix-perturbed copies) so
  dedup operators have real work

Generation is an Arrow-batched mapInPandas over spark.range(n) — linear
scale-out, no driver materialization.
"""

from __future__ import annotations

import hashlib
from typing import Iterator, List

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BinaryType, LongType, StringType, StructField, StructType,
    TimestampType,
)

PAGES_SCHEMA = StructType([
    StructField("doc_id", LongType(), False),
    StructField("url", StringType(), False),
    StructField("warc_ts", TimestampType(), False),
    StructField("html", BinaryType(), False),
    StructField("text", StringType(), False),
    StructField("lang", StringType(), False),
])

_SYLLABLES = [
    "ba", "co", "di", "fu", "ga", "hi", "jo", "ku", "la", "me",
    "no", "pa", "qui", "ra", "so", "tu", "ve", "wa", "xe", "zo",
    "an", "ber", "cam", "dor", "el", "fin", "gra", "hul", "in", "jam",
]

_VOCAB_SIZE = 20000
_ZIPF_S = 1.07


def _word(i: int) -> str:
    """Deterministic pseudo-word for vocab rank i (rank 0 = most common)."""
    h = int(hashlib.md5(f"w{i}".encode()).hexdigest()[:12], 16)
    n_syll = 2 + (h % 3)
    parts = []
    x = h
    for _ in range(n_syll):
        parts.append(_SYLLABLES[x % len(_SYLLABLES)])
        x //= len(_SYLLABLES)
    return "".join(parts)


def _zipf_cdf(size: int, s: float) -> List[float]:
    weights = [1.0 / (r + 1) ** s for r in range(size)]
    total = sum(weights)
    cdf = []
    acc = 0.0
    for w in weights:
        acc += w / total
        cdf.append(acc)
    return cdf


_CDF = None
_WORDS = None


def _vocab():
    global _CDF, _WORDS
    if _CDF is None:
        _CDF = _zipf_cdf(_VOCAB_SIZE, _ZIPF_S)
        _WORDS = [_word(i) for i in range(_VOCAB_SIZE)]
    return _CDF, _WORDS


def _rand_stream(seed: int, doc: int):
    """Deterministic uniform [0,1) stream keyed by (seed, doc)."""
    counter = 0
    while True:
        h = hashlib.md5(f"{seed}:{doc}:{counter}".encode()).digest()
        # 16 bytes → four 4-byte uniforms per md5 call
        for off in range(0, 16, 4):
            yield int.from_bytes(h[off: off + 4], "big") / 2**32
        counter += 1


def _sample_word(u: float) -> str:
    cdf, words = _vocab()
    lo, hi = 0, len(cdf) - 1
    while lo < hi:
        mid = (lo + hi) // 2
        if cdf[mid] < u:
            lo = mid + 1
        else:
            hi = mid
    return words[lo]


_LANGS = ["en", "en", "en", "en", "en", "en", "de", "fr", "es", "en"]
_NEAR_DUP_FRACTION = 0.05  # 1 in 20 docs is a perturbed copy of doc-1


def generate_page(doc: int, seed: int = 42) -> dict:
    """One deterministic page row (python dict)."""
    rs = _rand_stream(seed, doc)
    # near-duplicate: re-generate the previous doc's body, then perturb
    is_dup = doc > 0 and next(rs) < _NEAR_DUP_FRACTION
    if is_dup:
        base = generate_page(doc - 1, seed)
        body = base["text"] + " " + _sample_word(next(rs))
        title = base["_title"]
        lang = base["lang"]
    else:
        n_words = 50 + int(next(rs) * 250)
        words = [_sample_word(next(rs)) for _ in range(n_words)]
        # sentence-ish chunks
        sents = []
        i = 0
        while i < len(words):
            ln = 6 + int(next(rs) * 10)
            chunk = words[i: i + ln]
            sents.append(" ".join(chunk).capitalize() + ".")
            i += ln
        body = " ".join(sents)
        title = " ".join(
            w.capitalize() for w in words[:3]) if words else "Untitled"
        lang = _LANGS[int(next(rs) * len(_LANGS))]

    urlhash = hashlib.md5(f"{seed}:url:{doc}".encode()).hexdigest()[:16]
    url = f"https://example.org/{urlhash}/p{doc}"
    # epoch seconds, deterministic from doc index: 2024-01-01 + doc minutes
    ts = 1704067200 + doc * 60
    kw = " ".join(body.split()[:5])
    html = (
        "<html><head><title>" + title + "</title>"
        '<meta name="keywords" content="' + kw + '">'
        "<style>body { font: 12px }</style></head>"
        "<body><h1>" + title + "</h1>"
        "<script>var tracker = 'junk < not text';</script>"
        "<p>" + body + "</p>"
        "<div>footer</div></body></html>"
    )
    # extraction recovers: "<h1>title</h1>...<p>body</p><div>footer</div>"
    text = title + " " + body + " footer"
    return {
        "doc_id": doc + 1,  # 1-based like the reference
        "url": url,
        "warc_ts": ts,
        "html": html.encode("utf-8"),
        "text": text,
        "lang": lang,
        "_title": title,
    }


def generate_pages(spark: SparkSession, n_docs: int, seed: int = 42,
                   partitions: int = 0) -> DataFrame:
    """Distributed deterministic pages DataFrame."""
    import datetime

    import pandas as pd

    rng = spark.range(n_docs)
    if partitions:
        rng = rng.repartition(partitions)

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for doc in pdf["id"]:
                r = generate_page(int(doc), seed)
                r.pop("_title")
                r["warc_ts"] = datetime.datetime.fromtimestamp(
                    r["warc_ts"], datetime.timezone.utc
                ).replace(tzinfo=None)
                rows.append(r)
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "url", "warc_ts", "html", "text",
                         "lang"],
            )

    return rng.mapInPandas(gen, PAGES_SCHEMA)
