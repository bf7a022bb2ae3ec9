"""WARC (ISO 28500) reader/writer + the warc_pages Spark operator."""

import datetime
import gzip

import pytest

from xapian_spark.io.warc import parse_warc, warc_pages, write_warc


def _recs(n):
    return [(f"http://ex{i}.org/p{i}",
             datetime.datetime(2024, 3, 1 + i % 20, 12, i % 60),
             f"<html><title>T{i}</title><body>doc {i}</body></html>"
             .encode()) for i in range(n)]


def test_roundtrip_gzip_members_and_plain():
    recs = _recs(5)
    for gz in (True, False):
        assert parse_warc(write_warc(recs, gzip_members=gz)) == recs


def test_whole_file_gzip():
    recs = _recs(4)
    blob = gzip.compress(write_warc(recs, gzip_members=False))
    assert parse_warc(blob) == recs


def test_non_response_records_skipped():
    recs = _recs(1)
    info = (b"WARC/1.0\r\nWARC-Type: warcinfo\r\n"
            b"Content-Length: 4\r\n\r\nabcd\r\n\r\n")
    assert parse_warc(info + write_warc(recs, gzip_members=False)) \
        == recs


def test_http_content_length_honored():
    # trailing junk after the HTTP body must be trimmed by the HTTP
    # Content-Length, not returned as html
    recs = _recs(1)
    blob = bytearray(write_warc(recs, gzip_members=False))
    # craft manually: body + junk, with WARC length covering both
    url, ts, html = recs[0]
    http = (b"HTTP/1.1 200 OK\r\nContent-Length: "
            + str(len(html)).encode() + b"\r\n\r\n" + html + b"JUNK")
    rec = (b"WARC/1.0\r\nWARC-Type: response\r\n"
           b"WARC-Date: 2024-03-01T12:00:00Z\r\n"
           b"WARC-Target-URI: " + url.encode() + b"\r\n"
           b"Content-Length: " + str(len(http)).encode()
           + b"\r\n\r\n" + http + b"\r\n\r\n")
    assert parse_warc(rec) == [(url,
                                datetime.datetime(2024, 3, 1, 12, 0),
                                html)]


def test_truncation_and_garbage_raise():
    blob = write_warc(_recs(3))
    for cut in (5, len(blob) // 2, len(blob) - 3):
        with pytest.raises(ValueError):
            parse_warc(blob[:cut])
    with pytest.raises(ValueError):
        parse_warc(b"\x1f\x8b\x00bogus")
    with pytest.raises(ValueError):
        parse_warc(b"NOT A WARC RECORD\r\n\r\n")


def test_warc_pages_explodes_files(spark):
    import pandas as pd

    recs = _recs(30)
    blobs = [write_warc(recs[i:i + 10]) for i in (0, 10, 20)]
    files = spark.createDataFrame(
        pd.DataFrame({"content": blobs}))
    rows = sorted(warc_pages(files).collect(),
                  key=lambda r: r["url"])
    exp = sorted(recs)
    assert len(rows) == 30
    for r, (url, ts, html) in zip(rows, exp):
        assert (r["url"], r["warc_ts"], bytes(r["html"])) \
            == (url, ts, html)


def test_warc_to_text_extraction_chain(spark):
    # the full first hop: WARC -> pages -> byte-identical text via
    # the html extraction rules (io/pages.py builds html so that
    # extraction recovers `text` exactly)
    import pandas as pd
    from pyspark.sql import functions as F

    from xapian_spark.analysis.htmlparse import extract_text_udf
    from xapian_spark.io.pages import generate_page

    pages = [generate_page(i, seed=7) for i in range(12)]
    recs = [(p["url"],
             datetime.datetime.fromtimestamp(
                 p["warc_ts"], datetime.timezone.utc)
             .replace(tzinfo=None, microsecond=0),
             p["html"]) for p in pages]
    files = spark.createDataFrame(
        pd.DataFrame({"content": [write_warc(recs)]}))
    got = {r["url"]: r["text"] for r in warc_pages(files).select(
        "url", extract_text_udf(F.col("html")).alias("text")
    ).collect()}
    for p in pages:
        assert got[p["url"]] == p["text"]
