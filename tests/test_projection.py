"""J7 spatial-reference tests: UTM 12N (26912) <-> WGS84 from-scratch math."""

import duckdb
import pytest

from geocode_spark.operators.projection import (
    reproject_result,
    utm_to_wgs84_sql,
    wgs84_to_utm_sql,
)


def test_forward_anchor_central_meridian():
    # equator on the zone-12 central meridian -> exactly (false easting, 0)
    fw = wgs84_to_utm_sql("lon", "lat")
    row = duckdb.sql(
        f"SELECT {fw['x']} AS x, {fw['y']} AS y FROM (VALUES (-111.0, 0.0)) t(lon,lat)"
    ).fetchone()
    assert row == (500000.0, 0.0)


def test_roundtrip_exact_over_utah_grid():
    fw = wgs84_to_utm_sql("lon", "lat")
    inv = utm_to_wgs84_sql("x", "y")
    q = f"""
    WITH pts AS (
      SELECT -114.0 + 0.1*i AS lon, 37.0 + 0.05*j AS lat
      FROM range(0,30) t1(i), range(0,40) t2(j)
    ), utm AS (SELECT lon, lat, {fw['x']} AS x, {fw['y']} AS y FROM pts)
    SELECT max(abs(lon - {inv['lon']})) AS dlon,
           max(abs(lat - {inv['lat']})) AS dlat FROM utm"""
    dlon, dlat = duckdb.sql(q).fetchone()
    # inverse(forward(p)) == p to the rounding precision (1e-6 deg ~ 0.1 m)
    assert dlon == 0.0 and dlat == 0.0


def test_spark_matches_duckdb_formula(spark):
    """Same SQL string through Catalyst and DuckDB -> same rounded values."""
    from pyspark.sql import functions as F

    inv = utm_to_wgs84_sql("x", "y")
    pts = [(425000.0 + 997.0 * i, 4500000.0 + 1471.0 * i) for i in range(200)]
    sdf = (
        spark.createDataFrame(pts, "x double, y double")
        .select(F.expr(inv["lon"]).alias("lon"), F.expr(inv["lat"]).alias("lat"))
        .collect()
    )
    vals = ", ".join(f"({x!r}, {y!r})" for x, y in pts)
    ddf = duckdb.sql(
        f"SELECT {inv['lon']} AS lon, {inv['lat']} AS lat FROM (VALUES {vals}) t(x,y)"
    ).fetchall()
    assert [(r["lon"], r["lat"]) for r in sdf] == [tuple(r) for r in ddf]


def test_reproject_result_keeps_failure_sentinel(spark, fixtures_dir):
    from pyspark.sql import functions as F

    from geocode_spark.operators.geocode import geocode
    from geocode_spark.plans.pipeline import load_locators

    rows = [("ok", "669 West 200 South", "84101"), ("bad", "xyzzy", "nowhere")]
    df = spark.createDataFrame(rows, "id string, street string, zone string")
    res = geocode(df, pobox=True, spatial_reference=4326,
                  **load_locators(spark, fixtures_dir))
    got = {r["primary_key"]: r for r in res.collect()}
    assert got["bad"]["x"] == 0.0 and got["bad"]["y"] == 0.0
    ok = got["ok"]
    if ok["message"] is None:  # fixture-dependent; when matched, must be lon/lat
        assert -115.0 < ok["x"] < -108.0 and 36.0 < ok["y"] < 43.0


def test_unsupported_wkid_raises(spark, fixtures_dir):
    from geocode_spark.operators.geocode import geocode
    from geocode_spark.plans.pipeline import load_locators

    df = spark.createDataFrame([("a", "s", "z")], "id string, street string, zone string")
    with pytest.raises(ValueError):
        geocode(df, pobox=True, spatial_reference=999999,
                **load_locators(spark, fixtures_dir)).collect()


def test_utm_params_families():
    from geocode_spark.operators.projection import utm_params

    p12 = utm_params(26912)
    assert p12.lon0_deg == -111.0 and p12.false_northing == 0.0
    p13 = utm_params(26913)
    assert p13.lon0_deg == -105.0
    w12 = utm_params(32612)
    assert w12.lon0_deg == -111.0 and w12.f != p12.f  # WGS84 vs GRS80
    s56 = utm_params(32756)
    assert s56.false_northing == 10_000_000.0
    with pytest.raises(ValueError):
        utm_params(12345)


def test_web_mercator_anchor():
    # equator at lon -111 -> x = R*radians(-111), y = 0
    import math

    from geocode_spark.operators.projection import web_mercator_sql

    wm = web_mercator_sql("lon", "lat")
    x, y = duckdb.sql(
        f"SELECT {wm['x']} AS x, {wm['y']} AS y FROM (VALUES (-111.0, 0.0)) t(lon,lat)"
    ).fetchone()
    assert abs(x - 6378137.0 * math.radians(-111.0)) < 1e-3
    assert y == 0.0


def test_reproject_3857_and_neighbor_zone(spark, fixtures_dir):
    """Success rows re-express in web mercator and in UTM zone 13; failure
    rows keep the 0/0 sentinel in every target."""
    from geocode_spark.operators.geocode import geocode
    from geocode_spark.plans.pipeline import load_locators

    rows = [("ok", "669 West 200 South", "84101"), ("bad", "xyzzy", "nowhere")]
    df = spark.createDataFrame(rows, "id string, street string, zone string")
    locs = load_locators(spark, fixtures_dir)
    for wkid, xr, yr in [
        (3857, (-12_800_000, -12_000_000), (4_300_000, 5_300_000)),
        (26913, (-300_000, 260_000), (4_100_000, 4_800_000)),
    ]:
        res = geocode(df, pobox=True, spatial_reference=wkid, **locs)
        got = {r["primary_key"]: r for r in res.collect()}
        assert got["bad"]["x"] == 0.0 and got["bad"]["y"] == 0.0
        ok = got["ok"]
        if ok["message"] is None:
            assert xr[0] < ok["x"] < xr[1], (wkid, ok["x"])
            assert yr[0] < ok["y"] < yr[1], (wkid, ok["y"])
