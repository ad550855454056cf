#!/usr/bin/env python
"""spark-submit entry point: GPS track table -> mobility analytics suite.

    spark-submit --py-files geocode_spark.zip jobs/mobility_job.py \
        --tracks /data/tracks.parquet --output /data/mobility_out \
        [--gap-m 600] [--dwell-step-m 150] [--dwell-min-pts 3]

One pass over a (track_id, seq, x, y) trajectory table (integer-mm
coordinates, the synthetic_tracks layout) producing the standard
mobility-analytics outputs:

  1. trip segments    — gap-split trips with point counts + path length
  2. OD matrix        — origin/destination 1 km cell flows per trip
  3. dwell runs       — stay-point candidates (small-step runs)
  4. heading octants  — exact-integer bearing distribution

All four share the same window shape keyed by track_id (PLANS.md §6i);
the job persists the scanned track relation once so the four consumers
re-read it from memory, each paying only its own (identically keyed,
AQE-planned) window. Outputs land as parquet per product; the OD
matrix is written partitioned by origin cell x (o_cx) — the key a
serving layer range-scans by.

Prints ONE JSON summary line. Every stage is a thin composition of the
oracle-gated operators in geocode_spark.operators.spatial — the job adds
orchestration, not new semantics.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--tracks", required=True,
                   help="parquet path with (track_id, seq, x, y) in mm")
    p.add_argument("--output", required=True, help="output run directory")
    p.add_argument("--gap-m", type=float, default=600.0,
                   help="trip split threshold in meters")
    p.add_argument("--dwell-step-m", type=float, default=150.0,
                   help="dwell max step in meters")
    p.add_argument("--dwell-min-pts", type=int, default=3,
                   help="minimum fixes per dwell run")
    return p.parse_args(argv)


def main(argv=None) -> int:
    args = parse_args(argv)

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.appName("mobility-job")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")

    from geocode_spark.operators.spatial import (
        bearing_histogram,
        dwell_runs,
        od_matrix,
        track_segments,
    )

    t0 = time.perf_counter()
    tracks = spark.read.parquet(args.tracks).persist()
    n_fixes = tracks.count()
    n_tracks = tracks.select("track_id").distinct().count()

    gap_mm = int(round(args.gap_m * 1000))
    step_mm = int(round(args.dwell_step_m * 1000))

    segs = track_segments(tracks, gap_mm=gap_mm)
    segs.write.mode("overwrite").parquet(f"{args.output}/trip_segments")
    segs_done = spark.read.parquet(f"{args.output}/trip_segments")
    n_trips = segs_done.count()
    total_len_mm = (
        segs_done.groupBy().sum("len_mm").collect()[0][0] or 0
    )

    od = od_matrix(tracks, gap_mm=gap_mm)
    (od.write.mode("overwrite").partitionBy("o_cx")
       .parquet(f"{args.output}/od_matrix"))
    n_od_cells = spark.read.parquet(f"{args.output}/od_matrix").count()

    dw = dwell_runs(tracks, step_mm=step_mm, min_pts=args.dwell_min_pts)
    dw.write.mode("overwrite").parquet(f"{args.output}/dwell_runs")
    n_dwells = spark.read.parquet(f"{args.output}/dwell_runs").count()

    br = bearing_histogram(tracks)
    br.write.mode("overwrite").parquet(f"{args.output}/bearing_histogram")
    n_octants = spark.read.parquet(
        f"{args.output}/bearing_histogram"
    ).count()

    tracks.unpersist()
    print(json.dumps({
        "status": "ok",
        "fixes_in": n_fixes,
        "tracks_in": n_tracks,
        "trips": n_trips,
        "total_path_km": round(total_len_mm / 1e6, 3),
        "od_cells": n_od_cells,
        "dwells": n_dwells,
        "octants_seen": n_octants,
        "elapsed_sec": round(time.perf_counter() - t0, 2),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
