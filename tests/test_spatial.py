"""Spatial layer tests (J8/J9): Z-order cells, kNN, point-in-polygon, tiles."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from geocode_spark.fixtures import ensure_fixtures
from geocode_spark.operators.spatial import (
    DEFAULT_BBOX,
    DEFAULT_RES,
    assign_tiles,
    knn_bruteforce,
    knn_cell,
    point_in_polygon,
    tile_rollup,
    with_cell,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def fix(spark):
    return str(ensure_fixtures(SF_DIR))


@pytest.fixture(scope="module")
def ap(spark, fix):
    return spark.read.parquet(f"{fix}/address_points.parquet")


def test_cell_encode_locality(spark):
    """Points in the same small square share a cell; far points differ."""
    x0, y0 = DEFAULT_BBOX[0], DEFAULT_BBOX[1]
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "pk": ["a", "b", "c"],
                "x": [x0 + 5000.0, x0 + 5000.5, x0 + 50000.0],
                "y": [y0 + 5000.0, y0 + 5000.5, y0 + 50000.0],
            }
        )
    )
    rows = {r.pk: r for r in with_cell(df).collect()}
    assert rows["a"].cell_id == rows["b"].cell_id
    assert rows["a"].cell_id != rows["c"].cell_id


def test_cell_encode_clamps_outside_bbox(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"pk": ["lo", "hi"], "x": [-1e9, 1e9], "y": [-1e9, 1e9]})
    )
    n = 1 << DEFAULT_RES
    rows = {r.pk: r for r in with_cell(df).collect()}
    assert (rows["lo"].ix, rows["lo"].iy) == (0, 0)
    assert (rows["hi"].ix, rows["hi"].iy) == (n - 1, n - 1)


def test_cell_id_is_morton_interleave(spark):
    """cell_id bits = interleaved ix/iy bits."""
    df = spark.createDataFrame(pd.DataFrame({"pk": ["p"], "x": [400000.0], "y": [4420000.0]}))
    r = with_cell(df).collect()[0]

    def part1by1(v):
        out = 0
        for i in range(16):
            out |= ((v >> i) & 1) << (2 * i)
        return out

    assert r.cell_id == part1by1(r.ix) | (part1by1(r.iy) << 1)


def test_knn_cell_subset_of_bruteforce(spark, ap, fix):
    """Cell-kNN results are the brute-force neighbors whenever the true
    neighbors fall inside the 3x3 cell window (dense grids -> almost always)."""
    pts = (
        ap.select(F.col("cand_id").cast("string").alias("primary_key"), "x", "y")
        .limit(40)
    )
    cands = ap
    cell = knn_cell(pts, cands, k=1).toPandas().set_index("primary_key").sort_index()
    brute = (
        knn_bruteforce(pts, cands, k=1).toPandas().set_index("primary_key").sort_index()
    )
    # querying the candidate set by itself: nearest neighbor is the point, d=0
    assert (brute["dist_sq"] == 0).all()
    assert (cell["dist_sq"] == 0).all()
    assert (cell["cand_id"] == brute["cand_id"]).all()


def test_knn_rank_ordering(spark, ap):
    pts = ap.select(
        F.col("cand_id").cast("string").alias("primary_key"), "x", "y"
    ).limit(10)
    df = knn_bruteforce(pts, ap, k=3).toPandas()
    for _, g in df.groupby("primary_key"):
        g = g.sort_values("rank")
        assert list(g["rank"]) == [1, 2, 3]
        assert g["dist_sq"].is_monotonic_increasing


def test_point_in_polygon_matches_grid(spark, ap, fix):
    """Address points lie inside their own grid's polygon."""
    polys = spark.read.parquet(f"{fix}/grid_polygons.parquet")
    pts = ap.select(
        F.col("cand_id").cast("string").alias("primary_key"), "x", "y", "grid"
    ).limit(200)
    out = point_in_polygon(pts.select("primary_key", "x", "y"), polys).toPandas()
    truth = pts.toPandas().set_index("primary_key")["grid"]
    got = out.set_index("primary_key")["pip_grid"]
    assert (got.loc[truth.index] == truth).all()


def test_point_outside_all_polygons_is_null(spark, fix):
    polys = spark.read.parquet(f"{fix}/grid_polygons.parquet")
    df = spark.createDataFrame(
        pd.DataFrame({"primary_key": ["out"], "x": [0.0], "y": [0.0]})
    )
    out = point_in_polygon(df, polys).collect()[0]
    assert out.pip_grid is None


def test_tile_assignment_and_rollup(spark):
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "primary_key": ["a", "b", "c"],
                "x": [1500.0, 1999.0, 2000.0],
                "y": [500.0, 999.0, 500.0],
                "score": [100, 90, 80],
            }
        )
    )
    t = assign_tiles(df, 1000.0).toPandas().set_index("primary_key")
    assert (t.loc["a", "tile_x"], t.loc["a", "tile_y"]) == (1, 0)
    assert (t.loc["b", "tile_x"], t.loc["b", "tile_y"]) == (1, 0)
    assert (t.loc["c", "tile_x"], t.loc["c", "tile_y"]) == (2, 0)
    r = tile_rollup(df, 1000.0).toPandas()
    row = r[(r.tile_x == 1) & (r.tile_y == 0)].iloc[0]
    assert row.n_points == 2 and row.sum_score == 190


def test_knn_bruteforce_nan_query_degrades_gracefully(spark, fixtures_dir):
    """A NaN-coordinate query row must not crash the stage (ADVICE r01): it
    emits k rows of arbitrary-but-valid candidates instead."""
    import math

    from geocode_spark.operators.spatial import knn_bruteforce

    cands = spark.read.parquet(f"{fixtures_dir}/address_points.parquet")
    pts = spark.createDataFrame(
        [("nan-row", math.nan, math.nan), ("ok", 425000.0, 4450000.0)],
        "primary_key string, x double, y double",
    )
    out = knn_bruteforce(pts, cands, k=3).toPandas()
    assert len(out[out.primary_key == "nan-row"]) == 3
    ok = out[out.primary_key == "ok"]
    assert len(ok) == 3 and ok["dist_sq"].is_monotonic_increasing


def test_knn_bruteforce_candidate_collect_is_guarded(spark, fixtures_dir):
    """The candidate-side collect must be size-guarded (VERDICT r02 #2): past
    the guard it raises with a pointer to knn_cells instead of OOMing the
    driver, and limit(max+1) bounds what the driver can ever hold."""
    cands = spark.read.parquet(f"{fixtures_dir}/address_points.parquet")
    pts = spark.createDataFrame(
        [("ok", 425000.0, 4450000.0)], "primary_key string, x double, y double"
    )
    with pytest.raises(ValueError, match="knn_cell"):
        knn_bruteforce(pts, cands, k=1, max_candidate_rows=5)
    # guard sized just above the table: identical answer to the default path
    n = cands.count()
    a = knn_bruteforce(pts, cands, k=3).toPandas().sort_values("rank")
    b = (
        knn_bruteforce(pts, cands, k=3, max_candidate_rows=n)
        .toPandas()
        .sort_values("rank")
    )
    assert list(a["cand_id"]) == list(b["cand_id"])
