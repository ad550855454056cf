"""Eighth-wave operators: dwell runs, bearing octants, Z-order bbox ranges
— validated against in-python brute force / first principles."""

import math

from pyspark.sql import functions as F


def test_dwell_runs_known_track(spark):
    from geocode_spark.operators.spatial import dwell_runs

    rows = [
        # run A: 4 points with 100 m steps; jump; run B: only 2 points
        # (below min_pts=3); jump; run C: 3 points
        ("t", 0, 0, 0),
        ("t", 1, 100_000, 0),
        ("t", 2, 200_000, 0),
        ("t", 3, 300_000, 0),
        ("t", 4, 900_000, 0),        # big step breaks the run
        ("t", 5, 1_000_000, 0),      # run B: 2 points only
        ("t", 6, 1_700_000, 0),      # big step
        ("t", 7, 1_800_000, 0),
        ("t", 8, 1_900_000, 0),      # run C: 3 points
    ]
    df = spark.createDataFrame(rows, ["track_id", "seq", "x", "y"])
    got = {
        (r.track_id, r.dwell_idx): (r.n_points, r.span_mm)
        for r in dwell_runs(df, step_mm=150_000, min_pts=3).collect()
    }
    assert got == {
        ("t", 1): (4, 300_000),
        ("t", 2): (3, 200_000),
    }


def test_bearing_octants_exact(spark):
    from geocode_spark.operators.spatial import bearing_histogram

    # one step per octant plus a zero step (excluded)
    deltas = [
        (2, 1),    # 0: E..NE
        (1, 2),    # 1: NE..N
        (-1, 2),   # 2: N..NW
        (-2, 1),   # 3: NW..W
        (-2, -1),  # 4: W..SW
        (-1, -2),  # 5: SW..S
        (1, -2),   # 6: S..SE
        (2, -1),   # 7: SE..E
        (0, 0),    # zero step: excluded
    ]
    rows, x, y = [("t", 0, 0, 0)], 0, 0
    for i, (dx, dy) in enumerate(deltas, start=1):
        x, y = x + dx, y + dy
        rows.append(("t", i, x, y))
    df = spark.createDataFrame(rows, ["track_id", "seq", "x", "y"])
    got = {r.octant: r.n_steps for r in bearing_histogram(df).collect()}
    assert got == {o: 1 for o in range(8)}


def test_bearing_axis_boundaries(spark):
    from geocode_spark.operators.spatial import bearing_histogram

    # due E, N, W, S and the four exact diagonals — half-open [o*45,(o+1)*45)
    deltas = [(1, 0), (1, 1), (0, 1), (-1, 1), (-1, 0), (-1, -1),
              (0, -1), (1, -1)]
    rows, x, y = [("t", 0, 0, 0)], 0, 0
    for i, (dx, dy) in enumerate(deltas, start=1):
        x, y = x + dx, y + dy
        rows.append(("t", i, x, y))
    df = spark.createDataFrame(rows, ["track_id", "seq", "x", "y"])
    got = {r.octant: r.n_steps for r in bearing_histogram(df).collect()}
    assert got == {o: 1 for o in range(8)}


def test_zorder_ranges_cover_exactly():
    from geocode_spark.operators.spatial import _morton, zorder_ranges

    res = 5
    box = (3, 5, 19, 11)
    ranges = zorder_ranges(*box, res=res)
    # merged, sorted, non-overlapping
    for (l0, h0), (l1, h1) in zip(ranges, ranges[1:]):
        assert h0 + 1 < l1
    covered = set()
    for lo, hi in ranges:
        covered.update(range(lo, hi + 1))
    want = {
        _morton(ix, iy)
        for ix in range(1 << res)
        for iy in range(1 << res)
        if box[0] <= ix <= box[2] and box[1] <= iy <= box[3]
    }
    assert covered == want
    assert 1 < len(ranges) < len(want)  # genuinely compressed cover


def test_bbox_zrange_equals_plain_filter(spark, sf_dir):
    from geocode_spark.operators.spatial import QUERY_BBOX, bbox_zrange_query

    import __spark_entry__ as entrymod

    pts = entrymod._success_points(spark, sf_dir)
    got = {
        r.primary_key for r in bbox_zrange_query(pts).collect()
    }
    qx0, qy0, qx1, qy1 = QUERY_BBOX
    want = {
        r.primary_key
        for r in pts.filter(
            (F.col("x") >= qx0) & (F.col("x") <= qx1)
            & (F.col("y") >= qy0) & (F.col("y") <= qy1)
        ).collect()
    }
    assert got == want and len(want) > 0
