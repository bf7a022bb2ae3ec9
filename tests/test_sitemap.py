"""Sitemap URL discovery (io/sitemap.py) — pure-Catalyst extraction."""

import pandas as pd
import pytest

from xapian_spark.io.sitemap import sitemap_urls, write_sitemap


@pytest.fixture(scope="module")
def parsed(spark):
    xml1 = write_sitemap([
        ("http://ex.org/a?x=1&y=2", "2024-01-02", 0.8),
        ("http://ex.org/b", None, None),
        ("http://ex.org/<odd>&", "2024-02-03T10:00:00Z", 0.5)])
    xml2 = write_sitemap(
        [("http://ex.org/s1.xml", "2024-01-01", None),
         ("http://ex.org/s2.xml", None, None)], index=True)
    df = spark.createDataFrame(
        pd.DataFrame({"content": [xml1, xml2]}))
    return {r["loc"]: r for r in sitemap_urls(df).collect()}


def test_urlset_fields(parsed):
    r = parsed["http://ex.org/a?x=1&y=2"]  # entities unescaped
    assert (r["lastmod"], r["priority"], r["is_index"]) == \
        ("2024-01-02", 0.8, False)
    r = parsed["http://ex.org/b"]
    assert r["lastmod"] is None and r["priority"] is None


def test_entity_unescape(parsed):
    assert "http://ex.org/<odd>&" in parsed


def test_sitemapindex_flagged(parsed):
    assert parsed["http://ex.org/s1.xml"]["is_index"] is True
    assert parsed["http://ex.org/s1.xml"]["lastmod"] == "2024-01-01"
    assert parsed["http://ex.org/s2.xml"]["is_index"] is True
    assert len(parsed) == 5


def test_no_python_in_plan(spark):
    # the extraction is pure Catalyst — no Python eval node
    df = spark.createDataFrame(
        pd.DataFrame({"content": [write_sitemap(
            [("http://e/x", None, None)])]}))
    plan = sitemap_urls(df)._jdf.queryExecution().executedPlan() \
        .toString()
    for marker in ("BatchEvalPython", "ArrowEvalPython", "PythonUDF",
                   "MapInPandas"):
        assert marker not in plan, marker
