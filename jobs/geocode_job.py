#!/usr/bin/env python
"""spark-submit entry point: web pages -> resumable geocode run (north rule).

    spark-submit --py-files geocode_spark.zip jobs/geocode_job.py \
        --pages /data/pages.parquet --locators-dir /data/locators \
        --output /data/out --batches 16 [--resume] \
        [--locators all|addressPoints|roadCenterlines] [--pobox] \
        [--accept-score 70] [--ignore-failures]

Mirrors the reference CLI surface (geocode.py:320-336: positional csv/fields
+ --locators/--pobox/--acceptScore/--ignore-failures) re-shaped for a
distributed run: health probe first (F1, geocode.py:190-191), then
checkpoint-resumable batches with per-partition lineage ledgers (F9), final
metrics report (A5, geocode.py:260-261). Prints ONE JSON summary line last.

The session is built WITHOUT a master so spark-submit / cluster manager
controls deployment; local testing passes --master local[N] to spark-submit.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--pages", required=True, help="parquet/iceberg path of web pages")
    p.add_argument("--locators-dir", required=True,
                   help="dir with address_points/road_centerlines/pobox_points parquet")
    p.add_argument("--output", required=True, help="output run directory")
    p.add_argument("--batches", type=int, default=16)
    p.add_argument("--resume", action="store_true",
                   help="skip batches already committed to the ledger")
    p.add_argument("--locators", default="all",
                   choices=["all", "addressPoints", "roadCenterlines"])
    p.add_argument("--pobox", action="store_true")
    p.add_argument("--accept-score", type=int, default=70)
    p.add_argument("--ignore-failures", action="store_true",
                   help="disable the 25-row health probe abort (F1)")
    p.add_argument("--probe-count", type=int, default=25)
    return p.parse_args(argv)


def main(argv=None) -> int:
    args = parse_args(argv)

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.appName("geocode-spark-job")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")

    from geocode_spark.batching import run_resumable
    from geocode_spark.flowcontrol import (
        ContinuousFailThresholdExceeded,
        format_time,
        health_probe,
    )
    from geocode_spark.plans.pipeline import geocode_pages, load_locators

    t0 = time.perf_counter()
    pages = spark.read.parquet(args.pages)
    result = geocode_pages(
        pages,
        load_locators(spark, args.locators_dir),
        locators=args.locators,
        pobox=args.pobox,
        accept_score=args.accept_score,
    )

    try:
        probe = health_probe(result, probe_count=args.probe_count,
                             ignore_failures=args.ignore_failures)
    except ContinuousFailThresholdExceeded as ex:
        print(json.dumps({"status": "aborted", "error": str(ex)}))
        spark.stop()
        return 2
    print(f"probe: {probe['failed']}/{probe['probed']} failed", file=sys.stderr)

    summary = run_resumable(
        spark, result, args.output, n_batches=args.batches, resume=args.resume,
        log=lambda m: print(m, file=sys.stderr),
    )
    elapsed = time.perf_counter() - t0
    print("Job Completed", file=sys.stderr)  # A5 parity, geocode.py:260
    print(json.dumps({
        "status": "ok",
        "output": args.output,
        "probe": probe,
        "elapsed": format_time(elapsed),
        "rows_per_sec": round(summary["total"] / elapsed, 1) if elapsed else None,
        **summary,
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
