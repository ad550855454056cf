#!/usr/bin/env python
"""Ad-hoc per-query benchmark (bench.py methodology, arbitrary query subset).

bench.py is FROZEN for measurement (the round driver re-runs the round-start
copy); this sidecar reproduces its session config and warm+timed protocol so
optimization work can time single queries at any scale factor without
touching the frozen harness.

Usage:
    python bench_extra.py q1 q2 ...          # time named queries
    python bench_extra.py --explain q1 ...   # also dump .explain("formatted")
    SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python bench_extra.py containment_pairs

Env mirrors bench.py: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS
(default 32). Timing methodology is identical: non-eager queries get one
warm pass (`.count()`), then the timed pass is `.count()`; tracked persists
are cleared after each query.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from geocode_spark.envtune import tune_allocator_env  # noqa: E402

tune_allocator_env()

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
EXPLAIN_DIR = os.environ.get("BENCH_EXTRA_EXPLAIN_DIR", "")
REPEATS = int(os.environ.get("BENCH_EXTRA_REPEATS", "1"))


def _session(cpus: int, app: str):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )


def main(names):
    explain = False
    if names and names[0] == "--explain":
        explain = True
        names = names[1:]
    import __spark_entry__ as entrymod
    from geocode_spark.caching import clear_caches as _clear_tracked

    spark = _session(CPUS, "geocode-spark-bench-extra")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    eager = getattr(entrymod, "EAGER_QUERIES", frozenset())
    if not names:
        names = list(qs)
    out = {}
    for name in names:
        fn = qs[name]
        spark.sparkContext.setJobDescription(f"bench_extra:{name}")
        if explain and name not in eager:
            df = fn(spark, SF_DIR)
            plan = spark._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            if EXPLAIN_DIR:
                with open(os.path.join(EXPLAIN_DIR, f"{name}.txt"), "w") as f:
                    f.write(plan)
            else:
                print(f"==== {name} ====\n{plan}", flush=True)
        samples = []
        for _ in range(max(1, REPEATS)):
            if name not in eager:
                fn(spark, SF_DIR).count()
            t0 = time.perf_counter()
            n = fn(spark, SF_DIR).count()
            samples.append(round(time.perf_counter() - t0, 4))
            _clear_tracked()
        out[name] = min(samples)
        print(
            json.dumps({"query": name, "sec": min(samples),
                        "samples": samples, "rows": n}),
            flush=True,
        )
    print(json.dumps({"total": round(sum(out.values()), 3),
                      "sf_dir": SF_DIR, "queries": out}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1:])
