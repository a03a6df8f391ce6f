"""Meilisearch geosearch analog (the ``_geo`` document field):
``_geoRadius(lat, lng, meters)`` / ``_geoBoundingBox([lat, lng],
[lat, lng])`` filter functions and the ``_geoPoint(lat, lng)`` sort
rule, over a docs table whose coordinates live in two declared columns
(``IndexConfig.geo_attributes = (lat_col, lng_col)`` — the analog of
putting ``_geo`` in filterableAttributes/sortableAttributes; the
reference ships those settings to Meilisearch verbatim,
config/type.go:62-63).

Everything here compiles to pure Catalyst expressions (built-in
trig/sqrt — whole-stage codegen, zero Python in the scan):

- :func:`haversine_meters` — great-circle distance on the mean-Earth
  sphere (R = 6 371 000 m), the same formula Meilisearch uses for
  ``_geoRadius``/``_geoDistance``.
- :func:`geo_radius` — the 100 TB shape: the radius is FIRST bounded
  by a latitude/longitude window computed driver-side from plain
  float literals, so the scan keeps sargable ``lat >= c`` range
  predicates (parquet row-group min/max pruning); the exact haversine
  runs only on rows surviving the window. Antimeridian-crossing
  windows compile to an OR of two ranges (still sargable); windows
  touching a pole drop the longitude bound (everything wraps there).
- :func:`geo_bounding_box` — direct range predicates,
  antimeridian-aware (Meilisearch: ``lng1 > lng2`` means the box
  crosses 180°).

NULL semantics match the filter grammar's set-complement model
(functions/filters.py): a document without coordinates is inside NO
geo shape, and the COMPLEMENT of a shape includes it.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

from meilibridge_spark.config import ConfigError

#: mean Earth radius in meters (Meilisearch's haversine constant)
EARTH_RADIUS_M = 6_371_000.0


def _check_lat_lng(lat: float, lng: float, where: str) -> None:
    if not -90.0 <= lat <= 90.0:
        raise ConfigError(
            f"{where}: latitude must be in [-90, 90], got {lat!r}"
        )
    if not -180.0 <= lng <= 180.0:
        raise ConfigError(
            f"{where}: longitude must be in [-180, 180], got {lng!r}"
        )


def haversine_meters(
    lat_col: Column, lng_col: Column, lat: float, lng: float
) -> Column:
    """Great-circle distance (meters) from each row's coordinates to a
    fixed point, as a Catalyst Column (degrees in, meters out)."""
    dlat = F.radians(lat_col - F.lit(float(lat)))
    dlng = F.radians(lng_col - F.lit(float(lng)))
    a = (
        F.pow(F.sin(dlat / F.lit(2.0)), F.lit(2.0))
        + F.cos(F.radians(F.lit(float(lat))))
        * F.cos(F.radians(lat_col))
        * F.pow(F.sin(dlng / F.lit(2.0)), F.lit(2.0))
    )
    return F.lit(2.0 * EARTH_RADIUS_M) * F.asin(F.sqrt(a))


def _lng_window(lng_col: Column, lo: float, hi: float) -> "Column | None":
    """Sargable longitude range predicate for a [lo, hi] window in
    degrees (may exceed [-180, 180]); None when the window wraps the
    whole circle."""
    if hi - lo >= 360.0:
        return None
    if lo >= -180.0 and hi <= 180.0:
        return (lng_col >= F.lit(lo)) & (lng_col <= F.lit(hi))
    if lo < -180.0:
        return (lng_col >= F.lit(lo + 360.0)) | (lng_col <= F.lit(hi))
    return (lng_col >= F.lit(lo)) | (lng_col <= F.lit(hi - 360.0))


def geo_radius(
    lat_col: Column,
    lng_col: Column,
    lat: float,
    lng: float,
    meters: float,
) -> Column:
    """``_geoRadius(lat, lng, meters)``: rows within ``meters`` of the
    point (haversine), bounded first by a driver-computed lat/lng
    window so the scan keeps sargable range predicates."""
    _check_lat_lng(lat, lng, "_geoRadius")
    if meters < 0:
        raise ConfigError(f"_geoRadius: distance must be >= 0, got {meters!r}")
    dlat = math.degrees(meters / EARTH_RADIUS_M)
    lat_lo, lat_hi = lat - dlat, lat + dlat
    window = (lat_col >= F.lit(lat_lo)) & (lat_col <= F.lit(lat_hi))
    if lat_lo > -90.0 and lat_hi < 90.0:
        # widest longitude spread of the disk occurs at the extreme
        # latitude edge; at/over a pole every longitude is inside
        cosv = min(
            math.cos(math.radians(lat_lo)), math.cos(math.radians(lat_hi))
        )
        if cosv > 1e-12:
            dlng = math.degrees(meters / (EARTH_RADIUS_M * cosv))
            lw = _lng_window(lng_col, lng - dlng, lng + dlng)
            if lw is not None:
                window = window & lw
    exact = haversine_meters(lat_col, lng_col, lat, lng) <= F.lit(
        float(meters)
    )
    return window & exact


def geo_radius_complement(
    lat_col: Column,
    lng_col: Column,
    lat: float,
    lng: float,
    meters: float,
) -> Column:
    """Set complement of :func:`geo_radius` (Meilisearch NOT / ``!=``
    model): outside the disk OR missing coordinates."""
    _check_lat_lng(lat, lng, "_geoRadius")
    if meters < 0:
        raise ConfigError(f"_geoRadius: distance must be >= 0, got {meters!r}")
    return (
        lat_col.isNull()
        | lng_col.isNull()
        | (haversine_meters(lat_col, lng_col, lat, lng) > F.lit(float(meters)))
    )


def geo_bounding_box(
    lat_col: Column,
    lng_col: Column,
    top_left: "tuple[float, float]",
    bottom_right: "tuple[float, float]",
) -> Column:
    """``_geoBoundingBox([lat1, lng1], [lat2, lng2])``: top-left /
    bottom-right corners, Meilisearch semantics — ``lng1 > lng2``
    means the box crosses the antimeridian."""
    lat1, lng1 = top_left
    lat2, lng2 = bottom_right
    _check_lat_lng(lat1, lng1, "_geoBoundingBox top-left")
    _check_lat_lng(lat2, lng2, "_geoBoundingBox bottom-right")
    if lat1 < lat2:
        raise ConfigError(
            "_geoBoundingBox: top-left latitude must be >= bottom-right "
            f"latitude, got {lat1!r} < {lat2!r}"
        )
    pred = (lat_col >= F.lit(float(lat2))) & (lat_col <= F.lit(float(lat1)))
    if lng1 <= lng2:
        pred = pred & (lng_col >= F.lit(float(lng1))) & (
            lng_col <= F.lit(float(lng2))
        )
    else:
        pred = pred & (
            (lng_col >= F.lit(float(lng1))) | (lng_col <= F.lit(float(lng2)))
        )
    return pred


def geo_bounding_box_complement(
    lat_col: Column,
    lng_col: Column,
    top_left: "tuple[float, float]",
    bottom_right: "tuple[float, float]",
) -> Column:
    """Set complement of :func:`geo_bounding_box`: outside the box OR
    missing coordinates."""
    inside = geo_bounding_box(lat_col, lng_col, top_left, bottom_right)
    return lat_col.isNull() | lng_col.isNull() | ~inside
