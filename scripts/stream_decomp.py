"""Decompose stream_geocode_drained wall time: harness vs operator.

Round-4 verdict item #6: the drained-geocode gate grew 2.69x at 5x data
(CORRECTNESS_SF05.json) and its ~9-10 s sf0.1 wall is the most expensive
single gate. This script splits that wall into its parts, at one or more
fixture tiers, using the engine's own surfaces plus the structured-
streaming checkpoint the drain leaves behind:

  stage    — _pages_stream_source staging (rank-split 2-file source);
             cached across runs keyed by fixture mtime, so both the COLD
             (fresh tmp) and WARM (reused) costs are reported
  locators — load_locators (broadcast-side relations)
  drain    — the availableNow query from start() to awaitTermination()
  addBatch — per-micro-batch operator time, from the checkpoint's
             progress metadata (durationMs.addBatch: the foreachBatch
             body = the batch geocode plan on that half)
  commit   — per-batch non-operator time: walCommit + offset log +
             file-sink metadata fsyncs (durationMs minus addBatch)
  batch    — the BATCH geocode_pages plan over the full table in the
             same session (the zero-harness floor for the same rows)

Run: PYTHONPATH=/root/repo:/root/repo/tests python scripts/stream_decomp.py [sf_dir ...]
Prints one JSON line per tier. Findings land in PLANS.md §5.
"""
from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def decompose(spark, sf_dir: str) -> dict:
    from pyspark.sql import functions as F

    from geocode_spark.fixtures import ensure_fixtures
    from geocode_spark.plans.pipeline import geocode_pages, load_locators
    from geocode_spark.streaming import drained
    from geocode_spark.streaming.stream import read_stream_results, stream_geocode

    fix = ensure_fixtures(sf_dir)
    out = {"sf_dir": sf_dir}

    # staging: cold (force a fresh tmp dir by clearing the cache key target)
    # then warm (the production path — reused across every later run)
    src_probe = drained._pages_stream_source(spark, fix)
    shutil.rmtree(src_probe, ignore_errors=True)
    t0 = time.perf_counter()
    src = drained._pages_stream_source(spark, fix)
    out["stage_cold_sec"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    drained._pages_stream_source(spark, fix)
    out["stage_warm_sec"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    locators = load_locators(spark, fix)
    out["locators_sec"] = round(time.perf_counter() - t0, 3)

    root = tempfile.mkdtemp(prefix="gs_decomp_")
    try:
        with drained._drain_partitions(spark):
            t0 = time.perf_counter()
            q = stream_geocode(
                spark, src, locators, f"{root}/out", f"{root}/ckpt",
                available_now=True, max_files_per_trigger=1,
            )
            q.awaitTermination()
            out["drain_sec"] = round(time.perf_counter() - t0, 3)
        out["rows"] = read_stream_results(spark, f"{root}/out").count()

        # per-batch operator vs harness split from the query's progress:
        # durationMs.triggerExecution is the per-batch TOTAL; addBatch
        # (the foreachBatch body = plan + broadcast + batch compute +
        # sink write) is one component of it, the rest is offset/commit
        # log + source discovery + state bookkeeping
        add_batch = trigger = 0.0
        batches = 0
        for prog in q.recentProgress:
            d = prog["durationMs"] if isinstance(prog, dict) else prog.durationMs
            add_batch += d.get("addBatch", 0) / 1e3
            trigger += d.get("triggerExecution", 0) / 1e3
            batches += 1
        out["n_batches"] = batches
        out["addBatch_sec"] = round(add_batch, 3)
        out["commitlog_sec"] = round(trigger - add_batch, 3)
        out["startstop_sec"] = round(out["drain_sec"] - trigger, 3)
    finally:
        shutil.rmtree(root, ignore_errors=True)

    # zero-harness floor: the same rows through the batch plan
    pages = spark.read.parquet(f"{fix}/pages.parquet")
    geocode_pages(pages, locators).count()  # warm
    t0 = time.perf_counter()
    geocode_pages(pages, locators).count()
    out["batch_plan_sec"] = round(time.perf_counter() - t0, 3)
    return out


def main():
    from pyspark.sql import SparkSession

    tiers = sys.argv[1:] or ["/root/testdata/sf0.1"]
    spark = (
        SparkSession.builder.master("local[16]")
        .appName("stream-decomp")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    for sf_dir in tiers:
        print(json.dumps(decompose(spark, sf_dir)), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
