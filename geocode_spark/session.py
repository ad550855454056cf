"""SparkSession factory tuned for the engine.

Local-mode testing runs on local[N]; the same configs are what we would ship
in spark-submit --conf for a real multi-executor cluster (AQE, Arrow, sensible
shuffle parallelism). UTC session timezone pins timestamp semantics so the
DuckDB oracle (UTC-naive) compares cleanly.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "geocode-spark",
    parallelism: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
    small_input: bool | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    parallelism: local[N] core count; default $SPARK_GRAFT_CPUS or 32.
    shuffle_partitions: default = parallelism (local mode: ~cores, not 200).
    small_input: True splits MB-scale single-file inputs into enough scan
      partitions to feed every core (fixture/bench-only knobs — a production
      table gets its parallelism from file count, so the 128 MB default
      stays). Default: $SPARK_GRAFT_SMALL_INPUT, else False.
    """
    cpus = parallelism or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle = shuffle_partitions or cpus
    if small_input is None:
        small_input = os.environ.get("SPARK_GRAFT_SMALL_INPUT", "0") == "1"
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.default.parallelism", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    if small_input:
        builder = (
            builder.config("spark.sql.files.maxPartitionBytes", "524288")
            .config("spark.sql.files.openCostInBytes", "65536")
        )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
