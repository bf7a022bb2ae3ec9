"""Geospatial: great-circle metric, distance posting source, distance
key-maker.

Spark restatement of xapian-core/geospatial/ (include/xapian/
geospatial.h:162-512):

- GreatCircleMetric (latlong_metrics.cc:115-134): haversine on the
  quadratic-mean Earth radius 6372797.6 m, with the h>1 clamp to
  radius·π. Implemented as a pure Column expression (JVM-side,
  whole-stage codegen — no UDF).
- LatLongDistancePostingSource (latlong_posting_source.cc:42-44):
  weight = k1·(dist + k1)^(−k2), defaults k1=1000 (metres), k2=1 —
  produced as a (doc_id, score) DataFrame pluggable into the query
  tree via ops.PostingSourceQuery.
- LatLongDistanceKeyMaker (geospatial.h:491-512): order results by
  distance — orderBy on the distance column.

The multi-coordinate "closest pair" semantics of LatLongCoords
(latlong_metrics.cc:46-74) maps to `aggregate` over an array of
structs taking the min pointwise distance.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

QUAD_EARTH_RADIUS_METRES = 6372797.6


def great_circle_distance(lat_col, lon_col, lat2, lon2,
                          radius: float = QUAD_EARTH_RADIUS_METRES
                          ) -> Column:
    """Haversine distance (metres) from each row's (lat, lon) to a
    fixed point — the exact op sequence of
    GreatCircleMetric::pointwise_distance."""
    deg = math.pi / 180.0
    lata = lat_col * F.lit(deg)
    latb = F.lit(float(lat2) * deg)
    latdiff = lata - latb
    longdiff = (lon_col - F.lit(float(lon2))) * F.lit(deg)
    sin_half_lat = F.sin(latdiff / 2)
    sin_half_long = F.sin(longdiff / 2)
    h = (sin_half_lat * sin_half_lat
         + sin_half_long * sin_half_long * F.cos(lata) * F.cos(latb))
    return F.when(h > 1.0, F.lit(radius * math.pi)).otherwise(
        F.lit(2.0) * F.lit(radius) * F.asin(F.sqrt(h)))


def distance_posting_source(
    docs: DataFrame, lat: float, lon: float,
    lat_col: str = "lat", lon_col: str = "lon",
    id_col: str = "doc_id",
    k1: float = 1000.0, k2: float = 1.0,
    max_range: float = 0.0,
) -> DataFrame:
    """LatLongDistancePostingSource: (doc_id, score) with
    score = k1·(dist+k1)^(−k2); docs beyond max_range (if set) drop
    out. Plug into a query via ops.PostingSourceQuery."""
    if k1 <= 0 or k2 <= 0:
        raise ValueError("k1 and k2 must be > 0")
    dist = great_circle_distance(F.col(lat_col), F.col(lon_col),
                                 lat, lon)
    out = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        dist.alias("distance"),
    )
    if max_range > 0:
        out = out.filter(F.col("distance") <= max_range)
    score = F.lit(k1) * F.pow(F.col("distance") + F.lit(k1), F.lit(-k2))
    return out.select("doc_id", score.alias("score"))


def distance_key_sort(docs: DataFrame, lat: float, lon: float,
                      lat_col: str = "lat", lon_col: str = "lon",
                      id_col: str = "doc_id",
                      maxitems: int = 10) -> DataFrame:
    """LatLongDistanceKeyMaker: docs nearest-first."""
    dist = great_circle_distance(F.col(lat_col), F.col(lon_col),
                                 lat, lon)
    return (
        docs.select(F.col(id_col).cast("long").alias("doc_id"),
                    dist.alias("distance"))
        .orderBy(F.asc("distance"), F.asc("doc_id"))
        .limit(maxitems)
    )
