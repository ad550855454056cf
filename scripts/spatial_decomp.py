#!/usr/bin/env python
"""Decompose map_match / radius_join / pip_raycast cost at a given tier:
time each subplan with the noop sink (guide §1.4) so the expensive stage
is identified before any restructuring.

Usage: SPARK_GRAFT_SF_DIR=... python scripts/spatial_decomp.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from geocode_spark.envtune import tune_allocator_env

tune_allocator_env()

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def t(label, df, mode="noop"):
    t0 = time.perf_counter()
    if mode == "noop":
        df.write.format("noop").mode("overwrite").save()
        n = None
    else:
        n = df.count()
    print(f"{label:42s} {time.perf_counter() - t0:7.2f}s rows={n}",
          flush=True)


def main():
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("spatial-decomp")
        .config("spark.sql.shuffle.partitions", str(max(CPUS, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as mod
    from geocode_spark.operators import spatial as sp

    pts = mod._success_points(spark, SF_DIR)
    pts = pts.persist()
    print("points:", pts.count(), flush=True)

    fix = mod._fix(SF_DIR)
    segs = spark.read.parquet(f"{fix}/road_centerlines.parquet").filter(
        F.col("cand_id") % 1 == 0
    )
    print("segments:", segs.count(), flush=True)

    # --- map_match decomposition
    r_mm = int(round(sp.SNAP_RADIUS_M * 1000))
    s2 = segs.select(
        "cand_id",
        F.expr(sp._mm("x0")).alias("ax"), F.expr(sp._mm("y0")).alias("ay"),
        F.expr(sp._mm("x1")).alias("bx"), F.expr(sp._mm("y1")).alias("by"),
    ).select(
        "cand_id", "ax", "ay", "bx", "by",
        F.explode(F.expr(
            f"sequence(least(ax, bx) div {r_mm} - 1,"
            f" greatest(ax, bx) div {r_mm} + 1)")).alias("cx"),
    ).select(
        "cand_id", "ax", "ay", "bx", "by", "cx",
        F.explode(F.expr(
            f"sequence(least(ay, by) div {r_mm} - 1,"
            f" greatest(ay, by) div {r_mm} + 1)")).alias("cy"),
    )
    t("mm: exploded segs", s2)
    p2 = pts.select(
        "primary_key",
        F.expr(sp._mm("x")).alias("px"), F.expr(sp._mm("y")).alias("py"),
    ).select(
        "primary_key", "px", "py",
        F.expr(f"px div {r_mm}").alias("cx"),
        F.expr(f"py div {r_mm}").alias("cy"),
    )
    joined = F.broadcast(p2).join(s2, ["cx", "cy"])
    t("mm: join (no filters)", joined.select(F.lit(1).alias("one")), "count")
    filt = joined.filter(F.expr(
        f"px BETWEEN least(ax, bx) - {r_mm} AND greatest(ax, bx) + {r_mm}"
        f" AND py BETWEEN least(ay, by) - {r_mm}"
        f" AND greatest(ay, by) + {r_mm}"))
    t("mm: join+bbox", filt.select(F.lit(1).alias("one")), "count")
    t("mm: full map_match", sp.map_match(pts, segs))

    # --- radius_join decomposition
    t("rj: full radius_join", sp.radius_join(pts))

    # --- pip decomposition
    regs = sp.synthetic_regions(pts)
    print("regions:", regs.count(), flush=True)
    t("pip: full pip_raycast", sp.pip_raycast(pts, regs))

    spark.stop()


if __name__ == "__main__":
    main()
