"""Geosearch (Meilisearch ``_geo`` analog, functions/geo.py):
_geoRadius / _geoBoundingBox filter functions against declared
(lat_col, lng_col) columns, set-complement NULL semantics, the
antimeridian-crossing box, the _geoPoint sort rule with _geoDistance,
and the sargable-window pushdown shape of the radius filter."""

import math
import re

import pytest
from pyspark.sql import functions as F

from meilibridge_spark.config import ConfigError, IndexConfig
from meilibridge_spark.functions.filters import parse_filter
from meilibridge_spark.functions.geo import (
    EARTH_RADIUS_M,
    geo_bounding_box,
    geo_radius,
    haversine_meters,
)
from meilibridge_spark.operators.relational import geo_sort_hits

# (doc_id, name, lat, lng) — Paris cluster, global spread, antimeridian
# neighbors (Fiji side / Samoa side), a polar point, and missing coords
ROWS = [
    (0, "paris", 48.8566, 2.3522),
    (1, "versailles", 48.8049, 2.1204),
    (2, "orleans", 47.9029, 1.9039),
    (3, "london", 51.5074, -0.1278),
    (4, "auckland", -36.8485, 174.7633),
    (5, "suva", -18.1248, 178.4501),
    (6, "apia", -13.8506, -171.7513),
    (7, "alert", 82.5018, -62.3481),
    (8, "nowhere", None, None),
    (9, "null-lng", 10.0, None),
]
SCHEMA = "doc_id long, name string, lat double, lng double"


def _hav(lat1, lng1, lat2, lng2):
    dlat = math.radians(lat2 - lat1)
    dlng = math.radians(lng2 - lng1)
    a = (
        math.sin(dlat / 2) ** 2
        + math.cos(math.radians(lat1))
        * math.cos(math.radians(lat2))
        * math.sin(dlng / 2) ** 2
    )
    return 2 * EARTH_RADIUS_M * math.asin(math.sqrt(a))


@pytest.fixture(scope="module")
def geo_df(spark):
    return spark.createDataFrame(ROWS, SCHEMA).persist()


def _ids(df):
    return {r["doc_id"] for r in df.select("doc_id").collect()}


def test_haversine_matches_reference_formula(geo_df):
    got = {
        r["doc_id"]: r["d"]
        for r in geo_df.filter(F.col("lat").isNotNull())
        .select(
            "doc_id",
            haversine_meters(
                F.col("lat"), F.col("lng"), 48.8566, 2.3522
            ).alias("d"),
        )
        .collect()
    }
    for doc_id, _, lat, lng in ROWS:
        if lat is None or lng is None:
            continue
        assert got[doc_id] == pytest.approx(
            _hav(lat, lng, 48.8566, 2.3522), rel=1e-12
        )


def test_geo_radius_membership_vs_brute_force(geo_df):
    for meters in (25_000, 120_000, 500_000, 20_000_000):
        want = {
            d
            for d, _, lat, lng in ROWS
            if lat is not None
            and lng is not None
            and _hav(lat, lng, 48.8566, 2.3522) <= meters
        }
        got = _ids(
            geo_df.filter(
                geo_radius(F.col("lat"), F.col("lng"), 48.8566, 2.3522, meters)
            )
        )
        assert got == want, meters


def test_geo_radius_crossing_antimeridian(geo_df):
    # 1,000 km around (-16, 179.5): Suva (~520 km W) and Apia
    # (~1,000 km E across the line) — Auckland (~2,400 km) is out
    want = {
        d
        for d, _, lat, lng in ROWS
        if lat is not None and lng is not None
        and _hav(lat, lng, -16.0, 179.5) <= 1_150_000
    }
    assert want == {5, 6}
    got = _ids(
        geo_df.filter(
            geo_radius(F.col("lat"), F.col("lng"), -16.0, 179.5, 1_150_000)
        )
    )
    assert got == want


def test_geo_radius_polar_window(geo_df):
    # 900 km around the north pole: the lat window reaches the pole, so
    # the longitude bound is dropped — Alert (82.5N) is inside
    got = _ids(
        geo_df.filter(
            geo_radius(F.col("lat"), F.col("lng"), 89.0, 0.0, 900_000)
        )
    )
    assert got == {7}


def test_parser_radius_and_complement(geo_df):
    flt = parse_filter(
        "_geoRadius(48.8566, 2.3522, 120000)", (), geo=("lat", "lng")
    )
    assert _ids(geo_df.filter(flt)) == {0, 1, 2}
    # set complement: docs WITHOUT coordinates are included
    neg = parse_filter(
        "NOT _geoRadius(48.8566, 2.3522, 120000)", (), geo=("lat", "lng")
    )
    assert _ids(geo_df.filter(neg)) == {3, 4, 5, 6, 7, 8, 9}
    # composes with ordinary conditions
    both = parse_filter(
        "_geoRadius(48.8566, 2.3522, 500000) AND name != 'london'",
        ("name",),
        geo=("lat", "lng"),
    )
    assert _ids(geo_df.filter(both)) == {0, 1, 2}


def test_parser_bounding_box(geo_df):
    # box covering northern France, top-left / bottom-right corners
    flt = parse_filter(
        "_geoBoundingBox([49.5, 1.0], [47.5, 3.0])", (), geo=("lat", "lng")
    )
    assert _ids(geo_df.filter(flt)) == {0, 1, 2}
    # antimeridian-crossing box (lng1 > lng2): Fiji + Samoa, not Auckland
    wrap = parse_filter(
        "_geoBoundingBox([-10.0, 170.0], [-20.0, -160.0])",
        (),
        geo=("lat", "lng"),
    )
    assert _ids(geo_df.filter(wrap)) == {5, 6}
    neg = parse_filter(
        "NOT _geoBoundingBox([49.5, 1.0], [47.5, 3.0])",
        (),
        geo=("lat", "lng"),
    )
    assert _ids(geo_df.filter(neg)) == {3, 4, 5, 6, 7, 8, 9}


def test_parser_geo_errors():
    with pytest.raises(ConfigError, match="geo_attributes"):
        parse_filter("_geoRadius(1, 2, 3)", ())
    with pytest.raises(ConfigError, match="sort rule"):
        parse_filter("_geoPoint(1, 2) = 3", (), geo=("lat", "lng"))
    with pytest.raises(ConfigError, match="latitude"):
        parse_filter("_geoRadius(91, 2, 3)", (), geo=("lat", "lng"))
    with pytest.raises(ConfigError, match="top-left latitude"):
        parse_filter(
            "_geoBoundingBox([1.0, 2.0], [3.0, 4.0])", (), geo=("lat", "lng")
        )
    with pytest.raises(ConfigError, match="expected a number"):
        parse_filter("_geoRadius(a, 2, 3)", (), geo=("lat", "lng"))
    with pytest.raises(ConfigError, match="not a filterable expression"):
        parse_filter("_geo EXISTS", (), geo=("lat", "lng"))


def test_geo_config_validation():
    with pytest.raises(ConfigError, match="geo_attributes"):
        IndexConfig(index_name="g", geo_attributes=("lat",)).validate()
    # a bare 2-char string is a len-2 iterable of 1-char strs — must
    # still be rejected (it is not a (lat_col, lng_col) pair)
    with pytest.raises(ConfigError, match="geo_attributes"):
        IndexConfig(index_name="g", geo_attributes="xy").validate()
    IndexConfig(index_name="g", geo_attributes=("lat", "lng")).validate()


def test_geo_sort_rejects_out_of_range_point(spark, geo_df):
    hits = spark.createDataFrame([(0, 1.0)], "doc_id long, score double")
    with pytest.raises(ConfigError, match="latitude"):
        geo_sort_hits(hits, geo_df, ("lat", "lng"), 95.0, 2.0)
    with pytest.raises(ConfigError, match="longitude"):
        geo_sort_hits(hits, geo_df, ("lat", "lng"), 5.0, 200.0)


def test_geo_sort_hits_distance_and_nulls_last(spark, geo_df):
    hits = spark.createDataFrame(
        [(d, 1.0 + 0.01 * d) for d, *_ in ROWS], "doc_id long, score double"
    )
    out = geo_sort_hits(
        hits, geo_df, ("lat", "lng"), 48.8566, 2.3522, k=10
    ).collect()
    ids = [r["doc_id"] for r in out]
    # located docs by distance asc, missing-coord docs last
    want_order = sorted(
        (d for d, _, lat, lng in ROWS if lat is not None and lng is not None),
        key=lambda d: _hav(ROWS[d][2], ROWS[d][3], 48.8566, 2.3522),
    )
    assert ids[: len(want_order)] == want_order
    assert set(ids[len(want_order):]) == {8, 9}
    by_id = {r["doc_id"]: r for r in out}
    assert by_id[0]["_geoDistance"] == round(
        _hav(48.8566, 2.3522, 48.8566, 2.3522)
    )
    assert by_id[3]["_geoDistance"] == round(
        _hav(51.5074, -0.1278, 48.8566, 2.3522)
    )
    assert by_id[8]["_geoDistance"] is None
    # desc: farthest located first, missing still last
    out_d = geo_sort_hits(
        hits, geo_df, ("lat", "lng"), 48.8566, 2.3522, ascending=False, k=10
    ).collect()
    ids_d = [r["doc_id"] for r in out_d]
    assert ids_d[: len(want_order)] == want_order[::-1]
    assert set(ids_d[len(want_order):]) == {8, 9}


def test_geo_radius_window_is_sargable(spark, geo_df, tmp_path):
    """The radius filter's lat/lng window must reach the parquet scan
    as plain range predicates (row-group pruning at scale); only the
    exact haversine stays post-scan."""
    p = str(tmp_path / "geodocs")
    geo_df.write.parquet(p)
    df = spark.read.parquet(p)
    flt = geo_radius(F.col("lat"), F.col("lng"), 48.8566, 2.3522, 120_000)
    fdf = df.filter(flt)
    plan = fdf._sc._jvm.PythonSQLUtils.explainString(
        fdf._jdf.queryExecution(), "formatted"
    )
    m = re.search(r"PushedFilters: \[([^\]]*)\]", plan)
    assert m, plan
    pushed = m.group(1)
    assert "GreaterThanOrEqual(lat" in pushed, pushed
    assert "LessThanOrEqual(lat" in pushed, pushed
    assert "GreaterThanOrEqual(lng" in pushed, pushed
