"""URL-level curation ops (pipeline/urls.py) vs reference semantics.

The golden mirror below is an independent pure-Python transcription of
omega's hash_string/hash_long_term (hashterm.cc:39-69); the Spark
expressions must reproduce it byte-for-byte, including the quirky
space-padding and the 33-offset base-64 alphabet.
"""

import pytest
from pyspark.sql import functions as F

from xapian_spark.pipeline.urls import (
    HASH_LEN,
    MAX_SAFE_TERM_LENGTH,
    canonical_url_expr,
    canonicalize_urls,
    host_stats,
    url_dedup,
    url_term,
)


def _hash_string_py(s: str) -> str:
    h = 1
    for ch in s.encode("ascii"):
        h = (h + (h << 5) + ch) & 0xFFFFFFFF
    out = [" "] * HASH_LEN
    j = 0
    while h:
        out[j] = chr((h & 63) + 33)
        j += 1
        h >>= 6
    return "".join(out)


def _url_term_py(url: str) -> str:
    term = "U" + url
    if len(term) <= MAX_SAFE_TERM_LENGTH:
        return term
    keep = MAX_SAFE_TERM_LENGTH - HASH_LEN
    return term[:keep] + _hash_string_py(term[keep:])


def _terms(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [r["t"] for r in
            df.select(url_term("url").alias("t")).collect()]


def test_url_term_short_is_plain_U_prefix(spark):
    urls = ["http://example.org/", "https://a.b/c?d=1"]
    assert _terms(spark, urls) == ["U" + u for u in urls]


def test_url_term_long_matches_reference_hash(spark):
    urls = [
        "http://example.org/" + "x" * 300,
        "http://example.org/" + "x" * 230,          # term len 250 > 240
        "http://example.org/" + "ab" * 500 + "?q=1",
        "http://e.org/" + "".join(chr(33 + i % 90) for i in range(400)),
    ]
    assert _terms(spark, urls) == [_url_term_py(u) for u in urls]


def test_url_term_boundary_exact_240(spark):
    u240 = "h" * (MAX_SAFE_TERM_LENGTH - 1)       # term len == 240: kept
    u241 = "h" * MAX_SAFE_TERM_LENGTH             # term len == 241: hashed
    got = _terms(spark, [u240, u241])
    assert got[0] == "U" + u240
    assert got[1] == _url_term_py(u241)
    assert len(got[1]) == MAX_SAFE_TERM_LENGTH


def test_hash_zero_tail_pads_spaces(spark):
    # hash_string pads with ' ' once h runs out of bits — pin a case
    # whose hash has high zero sextets (any value < 64^5 does).
    u = "http://example.org/" + "q" * 400
    assert _terms(spark, [u]) == [_url_term_py(u)]


CANON_CASES = [
    ("HTTP://WWW.Example.COM:80/a/b?x=1#frag",
     "http://example.com/a/b?x=1"),
    ("https://example.com:443/",
     "https://example.com/"),
    ("https://example.com:8443/x",
     "https://example.com:8443/x"),          # non-default port kept
    ("http://example.com",
     "http://example.com/"),                 # empty path -> /
    ("http://example.com/p?b=2&utm_source=f&a=1&gclid=z",
     "http://example.com/p?a=1&b=2"),        # tracking dropped, sorted
    ("http://example.com/p?utm_campaign=x",
     "http://example.com/p"),                # all params dropped -> no ?
    ("http://example.com/p?&a=1&",
     "http://example.com/p?a=1"),            # empty params dropped
    ("http://www2.example.com/p",
     "http://www2.example.com/p"),           # only exact www. stripped
]


def test_canonicalize_cases(spark):
    df = spark.createDataFrame([(u,) for u, _ in CANON_CASES],
                               "url string")
    got = [r["c"] for r in
           df.select(canonical_url_expr("url").alias("c")).collect()]
    assert got == [c for _, c in CANON_CASES]


def test_canonicalize_adds_host(spark):
    df = spark.createDataFrame(
        [("HTTPS://WWW.Sub.Example.ORG:443/p?x=1",)], "url string")
    row = canonicalize_urls(df).head()
    assert row["host"] == "sub.example.org"
    assert row["canonical_url"] == "https://sub.example.org/p?x=1"


def _pages(spark):
    rows = [
        # three captures of one resource (case/track/frag variants)
        (1, "http://WWW.a.com/p?b=2&a=1", 100, "t1"),
        (2, "http://a.com/p?a=1&b=2&utm_source=x", 300, "t2"),
        (3, "http://a.com:80/p?b=2&a=1#top", 200, "t3"),
        # distinct resource on same host
        (4, "http://a.com/q", 50, "t4"),
        # other host
        (5, "https://b.com/", 60, "t5"),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, url string, ts long, text string")
    return df.withColumn("warc_ts", F.timestamp_seconds("ts")).drop("ts")


def test_url_dedup_keeps_latest_capture(spark):
    out = url_dedup(_pages(spark)).orderBy("doc_id").collect()
    assert [r["doc_id"] for r in out] == [2, 4, 5]
    by_id = {r["doc_id"]: r for r in out}
    assert by_id[2]["canonical_url"] == "http://a.com/p?a=1&b=2"
    assert by_id[2]["text"] == "t2"        # full original row survives
    assert set(out[0].asDict()) == {
        "canonical_url", "doc_id", "url", "text", "warc_ts"}


def test_url_dedup_tiebreak_on_id(spark):
    df = spark.createDataFrame(
        [(7, "http://x.com/", 100), (9, "http://X.COM/", 100),
         (8, "http://x.com:80/", 100)],
        "doc_id long, url string, ts long",
    ).withColumn("warc_ts", F.timestamp_seconds("ts")).drop("ts")
    out = url_dedup(df).collect()
    assert len(out) == 1 and out[0]["doc_id"] == 9


def test_host_stats(spark):
    out = {r["host"]: r for r in host_stats(_pages(spark)).collect()}
    assert out["a.com"]["n_pages"] == 4
    assert out["a.com"]["n_canonical"] == 2   # p-collapsed + q
    assert out["b.com"]["n_pages"] == 1
    assert out["a.com"]["avg_text_len"] == pytest.approx(2.0)


def test_plans_stay_jvm_side(spark):
    """No Python evaluation anywhere: url_term's fold, the
    canonicalization regexes, and the dedup aggregation all compile to
    Catalyst expressions."""
    pages = _pages(spark)
    for df in (
        pages.select(url_term("url")),
        canonicalize_urls(pages),
        url_dedup(pages),
        host_stats(pages),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan


def test_url_dedup_single_shuffle(spark):
    plan = url_dedup(_pages(spark))._jdf.queryExecution() \
        .executedPlan().toString()
    assert plan.count("Exchange") <= 1


def test_url_filter_blocklist_and_words(spark):
    from xapian_spark.pipeline.urls import url_filter

    rows = [
        (1, "https://good.example.com/article"),
        (2, "https://bad.example.com/article"),          # blocked host
        (3, "https://ok.example.com/free-casino-chips"), # banned word
        (4, "https://ok.example.com/Casino"),            # case-insens
        (5, "https://www.bad.example.com/x"),            # www-canonical
    ]
    df = spark.createDataFrame(rows, ["doc_id", "url"])
    kept = {r.doc_id: r for r in
            url_filter(df, blocked_hosts=["bad.example.com"]).collect()}
    assert set(kept) == {1}
    assert kept[1].host == "good.example.com"
    assert kept[1].url_word_hits == 0


def test_url_filter_soft_threshold_and_df_blocklist(spark):
    from xapian_spark.pipeline.urls import url_filter

    rows = [(1, "https://a.com/casino"), (2, "https://a.com/clean"),
            (3, "https://a.com/casino-porn")]
    df = spark.createDataFrame(rows, ["doc_id", "url"])
    # allow one hit -> doc 1 (1 hit) and 2 (0) stay, 3 (2 hits) drops
    kept = {r.doc_id for r in url_filter(df, max_word_hits=1).collect()}
    assert kept == {1, 2}
    bl = spark.createDataFrame([("a.com",)], ["host"])
    assert url_filter(df, blocked_hosts=bl).count() == 0


def test_url_filter_empty_blocklist(spark):
    from xapian_spark.pipeline.urls import url_filter

    df = spark.createDataFrame(
        [(1, "https://a.com/x")], ["doc_id", "url"])
    assert url_filter(df, blocked_hosts=[]).count() == 1


def test_surt_key_expr(spark):
    from xapian_spark.pipeline.urls import surt_key_expr

    cases = [
        ("http://www.Example.COM/A/b?x=2&utm_source=t", "com,example)/a/b?x=2"),
        ("https://sub.host.org:443/", "org,host,sub)/"),
        ("http://plain.net", "net,plain)/"),
        ("http://a.b.c.d/p?b=1&a=2", "d,c,b,a)/p?a=2&b=1"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = [r["k"] for r in
           df.select(surt_key_expr("url").alias("k")).collect()]
    assert got == [k for _, k in cases]


def test_cdx_index_sorted_and_exact(spark):
    import datetime
    import hashlib

    from xapian_spark.pipeline.urls import cdx_index

    rows = [(f"http://h{i % 3}.ex.org/p{i}",
             datetime.datetime(2024, 1, 1, 0, 0, i),
             f"<html>{i}</html>".encode()) for i in range(40)]
    pages = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary")
    out = cdx_index(pages)
    # partitions are range-partitioned and sorted within — collecting
    # partition by partition yields the global order
    collected = out.collect()
    keys = [(r["urlkey"], r["ts14"]) for r in collected]
    # verify within-partition sortedness via the physical layout
    import itertools

    parts = out.rdd.glom().collect()
    flat = []
    for p in parts:
        ks = [(r["urlkey"], r["ts14"]) for r in p]
        assert ks == sorted(ks)  # sorted within each partition
        flat.extend(ks)
    assert sorted(flat) == sorted(keys)
    by_url = {r["url"]: r for r in collected}
    for url, ts, html in rows:
        r = by_url[url]
        i = int(url.rsplit("p", 1)[1])
        assert r["urlkey"] == f"org,ex,h{i % 3})/p{i}"
        assert r["ts14"] == ts.strftime("%Y%m%d%H%M%S")
        assert r["digest"] == hashlib.md5(html).hexdigest()
        assert r["length"] == len(html)
