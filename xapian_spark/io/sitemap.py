"""Sitemap (sitemaps.org XML) URL discovery — the crawl-frontier
feed that pairs with robots.txt politeness (pipeline/robots.py),
WARC ingestion (io/warc.py) and the CDX index (pipeline/urls.py).

Spark-first: extraction is PURE Catalyst — regexp_extract_all over
the <url>…</url> blocks, then per-block regexp_extract for <loc> /
<lastmod> / <priority> inside a transform lambda. No Python UDF, no
XML parser dependency, one narrow codegen stage; a million sitemap
blobs explode into frontier rows with zero shuffles. <sitemapindex>
files yield their child sitemap locations with is_index=true so a
driver loop (or a second pass) can fetch-and-expand them.

Entity handling covers the five XML built-ins (&amp; &lt; &gt;
&apos; &quot;) — the only escaping sitemaps.org requires.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BLOCK_RE = "(?s)<(?:url|sitemap)>.*?</(?:url|sitemap)>"
_LOC_RE = "(?s)<loc>\\s*(.*?)\\s*</loc>"
_LASTMOD_RE = "(?s)<lastmod>\\s*(.*?)\\s*</lastmod>"
_PRIORITY_RE = "(?s)<priority>\\s*(.*?)\\s*</priority>"


def _unescape(c: Column) -> Column:
    for ent, ch in (("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
                    ("&apos;", "'"), ("&amp;", "&")):
        c = F.replace(c, F.lit(ent), F.lit(ch))
    return c


def sitemap_urls(sitemaps: DataFrame,
                 content_col: str = "content") -> DataFrame:
    """Binary/string sitemap XML column → exploded frontier rows
    (loc, lastmod, priority, is_index). is_index marks entries of a
    <sitemapindex> (child sitemap locations, not page urls).
    lastmod/priority are NULL when absent; priority is DOUBLE."""
    xml = F.col(content_col).cast("string")
    is_index = xml.rlike("(?s)<sitemapindex[\\s>]")
    blocks = F.regexp_extract_all(xml, F.lit(_BLOCK_RE), F.lit(0))
    rows = F.transform(
        blocks,
        lambda b: F.struct(
            _unescape(F.regexp_extract(b, _LOC_RE, 1)).alias("loc"),
            F.nullif(F.regexp_extract(b, _LASTMOD_RE, 1), F.lit(""))
            .alias("lastmod"),
            F.nullif(F.regexp_extract(b, _PRIORITY_RE, 1), F.lit(""))
            .cast("double").alias("priority"),
        ))
    return (sitemaps
            .select(F.explode(rows).alias("r"), is_index.alias("i"))
            .select(F.col("r.loc").alias("loc"),
                    F.col("r.lastmod").alias("lastmod"),
                    F.col("r.priority").alias("priority"),
                    F.col("i").alias("is_index"))
            .filter(F.col("loc") != ""))


def write_sitemap(entries, index: bool = False) -> bytes:
    """Fixture builder: [(loc, lastmod_or_None, priority_or_None)] →
    sitemap XML bytes (urlset, or sitemapindex when index=True)."""
    tag = "sitemap" if index else "url"
    root = "sitemapindex" if index else "urlset"

    def esc(s: str) -> str:
        return (s.replace("&", "&amp;").replace("<", "&lt;")
                .replace(">", "&gt;"))

    parts = ['<?xml version="1.0" encoding="UTF-8"?>',
             f'<{root} xmlns="http://www.sitemaps.org/schemas'
             '/sitemap/0.9">']
    for loc, lastmod, priority in entries:
        parts.append(f"  <{tag}>")
        parts.append(f"    <loc>{esc(loc)}</loc>")
        if lastmod is not None:
            parts.append(f"    <lastmod>{lastmod}</lastmod>")
        if priority is not None and not index:
            parts.append(f"    <priority>{priority}</priority>")
        parts.append(f"  </{tag}>")
    parts.append(f"</{root}>")
    return "\n".join(parts).encode("utf-8")
