"""Spatial layer — J8/J9 (SURVEY §2.3): cell encode, kNN, point-in-polygon, tiles.

The reference delegates all spatial search to the AGRC API's server-side
locators (reference geocode.py:198-208); the north rule mandates a native
reimplementation: "H3/S2 cell encode, point-in-polygon tests, kNN
nearest-candidate search ... raster-to-vector tile assignment".

No geo libraries exist in this environment (h3/s2/shapely verified absent), so
the cell index is a from-scratch Z-order (Morton) curve over a fixed bounding
box — the same quantize-then-interleave idea H3/S2 use, in pure integer
arithmetic that runs identically in Spark SQL and DuckDB:

  ix = clamp(floor((x - x0) / span * 2^res))        quantize
  cell = part1by1(ix) | part1by1(iy) << 1           interleave (magic-number
                                                     bit spread, 4 ops/axis)

Every formula here is generated ONCE as a SQL string and rendered for both
dialects (Spark `shiftleft()` vs DuckDB `<<`), so the Spark plan and the
DuckDB oracle execute the exact same IEEE-754 / integer operations — results
hash-compare bitwise.

Scale notes (100 TB):
 - cell encode / tile assign: pure column arithmetic, whole-stage codegen, no
   shuffle, no Python.
 - kNN: candidate side (locators) is broadcast; the query side explodes into 9
   neighbor-cell probes (bounded ×9 blowup) and equi-joins on (ix, iy) — no
   cartesian product. The only shuffle is the per-key top-k window, keyed on
   the UNIQUE primary key (skew-free by construction).
 - point-in-polygon: broadcast join against the (tiny) polygon table with a
   convex cross-product containment predicate — no shuffle of the big side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# Bounding box covering the fixture lattice (UTM 12N meters) with margin.
DEFAULT_BBOX = (370000.0, 4390000.0, 440000.0, 4460000.0)  # x0, y0, x1, y1
DEFAULT_RES = 6  # 2^6 = 64 cells/axis -> ~1094 m cells over the 70 km bbox
# kNN probes a 3x3 neighborhood, so its grid must be fine enough that a cell
# holds O(1) candidates — at res 9 (~137 m cells) the candidate fan-in per
# probe stays single-digit for city-density address points, keeping the
# pair count ~9*|points| instead of the ~800x blowup res 6 produced.
KNN_RES = 9
DEFAULT_TILE = 1000.0  # raster tile size in meters

_NEIGHBOR_OFFSETS = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]

_SPREAD_MASKS = ((8, 0x00FF00FF), (4, 0x0F0F0F0F), (2, 0x33333333), (1, 0x55555555))


# ----------------------------------------------------------- formula builders
def _shl(expr: str, n: int, dialect: str) -> str:
    if dialect == "spark":
        return f"shiftleft({expr}, {n})"
    return f"({expr} << {n})"


def part1by1_sql(v: str, dialect: str) -> str:
    """Spread the low 16 bits of `v` into even bit positions (Morton spread)."""
    e = f"(CAST({v} AS BIGINT) & 65535)"
    for n, mask in _SPREAD_MASKS:
        e = f"(({e} | {_shl(e, n, dialect)}) & {mask})"
    return e


def quantize_sql(c: str, lo: float, span: float, n: int) -> str:
    """Clamped quantization of coordinate `c` into [0, n-1]."""
    return (
        f"CAST(least(greatest(floor((({c}) - {lo!r}) / {span!r} * {n}), 0),"
        f" {n - 1}) AS BIGINT)"
    )


def cell_sql(ix: str, iy: str, dialect: str) -> str:
    """Z-order cell id from quantized integer coordinates."""
    return f"({part1by1_sql(ix, dialect)} | {_shl(part1by1_sql(iy, dialect), 1, dialect)})"


def quantize_exprs(x: str, y: str, res: int = DEFAULT_RES,
                   bbox=DEFAULT_BBOX) -> tuple[str, str]:
    x0, y0, x1, y1 = bbox
    n = 1 << res
    return quantize_sql(x, x0, x1 - x0, n), quantize_sql(y, y0, y1 - y0, n)


# ------------------------------------------------------------------ cell ops
def cell_encode_cols(x: str = "x", y: str = "y", res: int = DEFAULT_RES,
                     bbox=DEFAULT_BBOX) -> dict[str, Column]:
    """Columns {ix, iy, cell_id} for a DataFrame with coordinate columns x/y."""
    ix, iy = quantize_exprs(x, y, res, bbox)
    return {
        "ix": F.expr(ix),
        "iy": F.expr(iy),
        "cell_id": F.expr(cell_sql(ix, iy, "spark")),
    }


def cell_encode_select_sql(x: str = "x", y: str = "y", res: int = DEFAULT_RES,
                           bbox=DEFAULT_BBOX) -> str:
    """DuckDB select-list fragment mirroring cell_encode_cols bit-for-bit."""
    ix, iy = quantize_exprs(x, y, res, bbox)
    return f"{ix} AS ix, {iy} AS iy, {cell_sql(ix, iy, 'duckdb')} AS cell_id"


def with_cell(df: DataFrame, x: str = "x", y: str = "y", res: int = DEFAULT_RES,
              bbox=DEFAULT_BBOX) -> DataFrame:
    return df.withColumns(cell_encode_cols(x, y, res, bbox))


# ----------------------------------------------------------------------- kNN
_DIST_SQ = "((q_x - c_x) * (q_x - c_x) + (q_y - c_y) * (q_y - c_y))"


def _ranked_topk(pairs: DataFrame, k: int) -> DataFrame:
    """Deterministic top-k per primary_key: order by (dist_sq, cand_id)."""
    w = Window.partitionBy("primary_key").orderBy(
        F.col("dist_sq").asc(), F.col("cand_id").asc()
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("primary_key", "rank", "cand_id", "dist_sq")
    )


def knn_cell(points: DataFrame, candidates: DataFrame, k: int = 3,
             res: int = KNN_RES, bbox=DEFAULT_BBOX) -> DataFrame:
    """Cell-bucketed kNN: candidates restricted to the 3x3 neighbor cells.

    points:     (primary_key, x, y);  candidates: (cand_id, x, y) — broadcast.
    The 9-offset explode keeps the join strictly equi on (ix, iy): no range
    predicate, no cartesian blowup; probe fan-out is a constant 9.
    """
    q = with_cell(
        points.select("primary_key", F.col("x").alias("q_x"), F.col("y").alias("q_y")),
        "q_x", "q_y", res, bbox,
    )
    offsets = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx, dy in _NEIGHBOR_OFFSETS
        ]
    )
    q = q.withColumn("o", F.explode(offsets)).select(
        "primary_key", "q_x", "q_y",
        (F.col("ix") + F.col("o.dx")).alias("jx"),
        (F.col("iy") + F.col("o.dy")).alias("jy"),
    )
    c = with_cell(
        candidates.select("cand_id", F.col("x").alias("c_x"), F.col("y").alias("c_y")),
        "c_x", "c_y", res, bbox,
    )
    pairs = q.join(
        F.broadcast(c), on=[q.jx == c.ix, q.jy == c.iy], how="inner"
    ).select("primary_key", "cand_id", F.expr(_DIST_SQ).alias("dist_sq"))
    return _ranked_topk(pairs, k)


MAX_CANDIDATE_BROADCAST_ROWS = 2_000_000  # ~48 MB of (id, x, y) doubles


def knn_bruteforce(points: DataFrame, candidates: DataFrame, k: int = 3,
                   max_candidate_rows: int = MAX_CANDIDATE_BROADCAST_ROWS,
                   ) -> DataFrame:
    """Exact kNN baseline: vectorized scan of broadcast candidates.

    O(|points| * |cands|) distance evaluations — exact at any scale where the
    candidate side fits in a broadcast (the locator contract). The collect is
    SIZE-GUARDED (same contract as similarity.ann_topk): past
    `max_candidate_rows` it raises instead of OOMing the driver — use
    knn_cell for large candidate sets. Instead of materializing the
    cross-join as
    |P|*|C| shuffle rows and window-sorting them, each Arrow batch of query
    points computes the full distance matrix in numpy and emits only k rows
    per query — no shuffle at all. dist_sq = dx*dx+dy*dy in IEEE double,
    identical to the SQL expression; ties sort by cand_id via a stable sort
    over candidates pre-ordered by id — the exact (dist_sq, cand_id) order of
    the window/oracle formulation.
    """
    import numpy as np

    # limit(max+1) bounds what can ever reach the driver: if the extra row
    # shows up the table is over-guard and we bail before holding it all.
    cand = (
        candidates.select("cand_id", "x", "y")
        .limit(max_candidate_rows + 1)
        .toPandas()
    )
    if len(cand) > max_candidate_rows:
        raise ValueError(
            f"knn_bruteforce candidate side exceeds the broadcast guard "
            f"({max_candidate_rows} rows); use knn_cell for large "
            f"candidate sets"
        )
    order = np.argsort(cand["cand_id"].to_numpy(), kind="stable")
    bc = points.sparkSession.sparkContext.broadcast(
        (
            cand["cand_id"].to_numpy()[order],
            cand["x"].to_numpy(dtype="float64")[order],
            cand["y"].to_numpy(dtype="float64")[order],
        )
    )
    q = points.select("primary_key", "x", "y")

    def topk_batches(batches):
        import numpy as np
        import pandas as pd

        cid, cx, cy = bc.value
        n = len(cid)
        kk = min(k, n)
        if kk == 0:
            return
        # One candidate-length buffer set, written in place row by row. A
        # row-blocked distance MATRIX would be faster in pure FLOPs, but on
        # this class of VM first-touch page faults on large fresh buffers run
        # ~100x slower than the arithmetic (measured 10-15 MB/s in executors),
        # so the hot path touches only these 4 vectors (~0.6 MB total) once.
        dxb, dyb, db, scratch = (np.empty(n) for _ in range(4))
        ranks = np.arange(1, kk + 1)
        for pdf in batches:
            pks = pdf["primary_key"].to_numpy()
            qx = pdf["x"].to_numpy(dtype="float64")
            qy = pdf["y"].to_numpy(dtype="float64")
            m = len(pdf)
            sel = np.empty((m, kk), dtype=np.int64)
            dist = np.empty((m, kk))
            for i in range(m):
                np.subtract(qx[i], cx, out=dxb)
                np.subtract(qy[i], cy, out=dyb)
                np.multiply(dxb, dxb, out=dxb)
                np.multiply(dyb, dyb, out=dyb)
                np.add(dxb, dyb, out=db)
                # O(n) top-k: kth-smallest boundary value via in-place
                # partition of the scratch copy, then exact (dist_sq, cand_id)
                # ordering resolved only inside the tiny <=boundary set —
                # equivalent to a full stable sort (candidates are pre-sorted
                # by cand_id) at a fraction of the cost of a full argsort.
                scratch[:] = db
                scratch.partition(kk - 1)
                ji = np.flatnonzero(db <= scratch[kk - 1])
                o = ji[np.lexsort((ji, db[ji]))[:kk]]
                if len(o) < kk:
                    # NaN query coords make every distance NaN (no j with
                    # db <= boundary): degrade to the first kk candidates by
                    # id — matching what a NaN-laden ORDER BY would emit —
                    # instead of crashing the stage on a shape mismatch.
                    o = np.concatenate(
                        [o, np.arange(kk - len(o), dtype=np.int64)]
                    )
                sel[i] = o
                dist[i] = db[o]
            yield pd.DataFrame(
                {
                    "primary_key": np.repeat(pks, kk),
                    "rank": np.tile(ranks, m),
                    "cand_id": cid[sel].ravel(),
                    "dist_sq": dist.ravel(),
                }
            )

    return q.mapInPandas(
        topk_batches,
        schema="primary_key string, rank bigint, cand_id bigint, dist_sq double",
    )


def knn_sql(fix: str, source_sql: str, k: int = 3, res: int | None = KNN_RES,
            bbox=DEFAULT_BBOX) -> str:
    """DuckDB oracle for knn_cell (res set) or knn_bruteforce (res=None).

    source_sql: relation with (primary_key, x, y). Candidates = the
    address_points fixture."""
    if res is not None:
        qix, qiy = quantize_exprs("q.x", "q.y", res, bbox)
        cix, ciy = quantize_exprs("c.x", "c.y", res, bbox)
        offsets = ", ".join(f"({dx}, {dy})" for dx, dy in _NEIGHBOR_OFFSETS)
        join = f"""
  FROM ({source_sql}) q
  CROSS JOIN (VALUES {offsets}) AS o(dx, dy)
  JOIN read_parquet('{fix}/address_points.parquet') c
    ON {qix} + o.dx = {cix} AND {qiy} + o.dy = {ciy}"""
    else:
        join = f"""
  FROM ({source_sql}) q
  CROSS JOIN read_parquet('{fix}/address_points.parquet') c"""
    dist = ("((q.x - c.x) * (q.x - c.x) + (q.y - c.y) * (q.y - c.y))")
    return f"""
SELECT primary_key, rank, cand_id, dist_sq FROM (
  SELECT q.primary_key,
         CAST(row_number() OVER (PARTITION BY q.primary_key
                                 ORDER BY {dist} ASC, c.cand_id ASC) AS BIGINT) AS rank,
         c.cand_id, {dist} AS dist_sq
  {join}
) WHERE rank <= {k}
"""


# --------------------------------------------------------- point-in-polygon
def _inside_quad(px: Column, py: Column) -> Column:
    """CCW convex quad containment: all 4 edge cross products >= 0.

    Polygon columns x1..x4 / y1..y4 must be in scope (grid_polygons schema)."""
    cond = None
    corners = [(1, 2), (2, 3), (3, 4), (4, 1)]
    for a, b in corners:
        ax, ay = F.col(f"x{a}"), F.col(f"y{a}")
        bx, by = F.col(f"x{b}"), F.col(f"y{b}")
        cross = (bx - ax) * (py - ay) - (by - ay) * (px - ax)
        c = cross >= 0
        cond = c if cond is None else (cond & c)
    return cond


def point_in_polygon(points: DataFrame, polygons: DataFrame,
                     out_col: str = "pip_grid") -> DataFrame:
    """Left-assign each point the convex quad containing it (or null).

    points: (primary_key, x, y); polygons: grid_polygons fixture schema.
    Broadcast nested-loop join against the tiny polygon table; polygons are
    disjoint so at most one match per point (enforced upstream by fixture
    geometry)."""
    p = points.select("primary_key", "x", "y")
    polys = polygons.select(
        F.col("grid").alias(out_col), "x1", "y1", "x2", "y2", "x3", "y3", "x4", "y4"
    )
    joined = p.join(
        F.broadcast(polys), on=_inside_quad(F.col("x"), F.col("y")), how="left"
    )
    return joined.select("primary_key", "x", "y", out_col)


def point_in_polygon_sql(fix: str, source_sql: str, out_col: str = "pip_grid") -> str:
    crosses = []
    for a, b in [(1, 2), (2, 3), (3, 4), (4, 1)]:
        crosses.append(
            f"((g.x{b} - g.x{a}) * (p.y - g.y{a})"
            f" - (g.y{b} - g.y{a}) * (p.x - g.x{a})) >= 0"
        )
    pred = " AND ".join(crosses)
    return f"""
SELECT p.primary_key, p.x, p.y, g.grid AS {out_col}
FROM ({source_sql}) p
LEFT JOIN read_parquet('{fix}/grid_polygons.parquet') g ON {pred}
"""


# ------------------------------------------------------------ tile assignment
def assign_tiles(points: DataFrame, tile_size: float = DEFAULT_TILE) -> DataFrame:
    """J9 raster side: snap each point to its raster tile (integer floor-div)."""
    return points.withColumns(
        {
            "tile_x": F.floor(F.col("x") / tile_size).cast("bigint"),
            "tile_y": F.floor(F.col("y") / tile_size).cast("bigint"),
        }
    )


def tile_rollup(points: DataFrame, tile_size: float = DEFAULT_TILE,
                salt_buckets: int = 16) -> DataFrame:
    """J9 raster->vector rollup: per-tile stats, salted two-phase aggregation.

    Hot grids (SALT LAKE CITY) concentrate points into few tiles; phase 1
    aggregates on (tile, salt) so the hot tiles spread over `salt_buckets`
    reducers, phase 2 combines the small partial table. Output is identical
    to the unsalted groupBy (the DuckDB oracle IS the unsalted form)."""
    t = assign_tiles(points, tile_size)
    partial = (
        t.withColumn("_salt", F.pmod(F.hash("primary_key"), F.lit(salt_buckets)))
        .groupBy("tile_x", "tile_y", "_salt")
        .agg(F.count("*").alias("_n"), F.sum("score").alias("_s"))
    )
    return partial.groupBy("tile_x", "tile_y").agg(
        F.sum("_n").cast("bigint").alias("n_points"),
        F.sum("_s").cast("bigint").alias("sum_score"),
    )


def tile_rollup_sql(source_sql: str, tile_size: float = DEFAULT_TILE) -> str:
    """DuckDB oracle for tile_rollup (unsalted — the semantic ground truth).

    source_sql: relation with (x, y, score)."""
    return f"""
SELECT CAST(floor(x / {tile_size!r}) AS BIGINT) AS tile_x,
       CAST(floor(y / {tile_size!r}) AS BIGINT) AS tile_y,
       CAST(count(*) AS BIGINT) AS n_points,
       CAST(sum(score) AS BIGINT) AS sum_score
FROM ({source_sql})
GROUP BY 1, 2
"""
