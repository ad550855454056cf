"""Stateful streaming sessionization via applyInPandasWithState.

The batch twin is operators/temporal.sessionize (same gap rule, same
(ts_us, event_id) total order). Here the session assignment survives across
micro-batches: per-user state carries (last_ts_us, session_idx), so an event
arriving in a later micro-batch continues its user's open session exactly as
the batch operator would have, provided per-user event-time order across
batches (the file-source ordering contract; out-of-order arrivals within one
micro-batch are sorted before assignment).

This is the `applyInPandasWithState` pattern the engine uses for any custom
stateful operator: grouped state keyed by the shuffle key (user_id), Arrow
batches in, Arrow batches out, state schema explicit and tiny. State size is
O(active users), not O(events) — the knob that keeps it bounded at web scale
is the idle-state timeout (state for a user silent past the gap can be
dropped without changing assignments, since any later event starts a new
session by definition; set a processing-time timeout of the gap length when
running against unbounded streams).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from ..operators.temporal import DEFAULT_GAP_MINUTES

EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("user_id", LongType()),
        StructField("ts_us", LongType()),
        StructField("session_idx", LongType()),
        StructField("session_id", StringType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("last_ts_us", LongType()),
        StructField("session_idx", LongType()),
    ]
)


def read_events_stream(
    spark: SparkSession, events_dir: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    reader = spark.readStream.schema(EVENTS_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.parquet(events_dir)


def _session_func(gap_us: int):
    def assign(key, pdfs, state):
        (user_id,) = key
        if state.exists:
            last_ts_us, session_idx = state.get
        else:
            last_ts_us, session_idx = None, 0
        # A micro-batch group arrives as MULTIPLE Arrow chunks (one per
        # spark.sql.execution.arrow.maxRecordsPerBatch records, and chunk
        # order is not time order). Sorting per chunk would misassign any
        # group whose rows span chunks, so materialize the whole group and
        # sort ONCE — safe because per-user-per-micro-batch volume is the
        # state-store group size, which is already bounded by the trigger.
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True).sort_values(
                ["ts_us", "event_id"], kind="stable"
            )
            idxs = []
            for ts_us in pdf["ts_us"]:
                if last_ts_us is None or ts_us - last_ts_us > gap_us:
                    session_idx += 1
                idxs.append(session_idx)
                last_ts_us = int(ts_us)
            yield pd.DataFrame(
                {
                    "event_id": pdf["event_id"].to_numpy(),
                    "user_id": user_id,
                    "ts_us": pdf["ts_us"].to_numpy(),
                    "session_idx": pd.array(idxs, dtype="int64"),
                    "session_id": [f"{user_id}-{i}" for i in idxs],
                }
            )
        state.update((last_ts_us, session_idx))

    return assign


def stream_sessionize(
    events_stream: DataFrame,
    gap_minutes: int = DEFAULT_GAP_MINUTES,
) -> DataFrame:
    """Continuous session assignment over an events stream.

    Emits one row per event with its session assignment, identical to the
    batch sessionize() under per-user cross-batch event-time order."""
    gap_us = gap_minutes * 60 * 1_000_000
    with_us = events_stream.select(
        "event_id",
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
    )
    return (
        with_us.groupBy("user_id")
        .applyInPandasWithState(
            _session_func(gap_us),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf="NoTimeout",
        )
    )


def stream_attribution(
    events_stream: DataFrame,
    probe_type: str = "click",
    build_type: str = "purchase",
    window_hours: int = 1,
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked stream-stream inner join: clicks within [purchase_ts,
    purchase_ts + window] of a same-user purchase — the streaming twin of
    operators.temporal.attribution_join (same output schema and rows on a
    drained input, pinned by tests).

    Both sides carry an event-time watermark and the join condition bounds
    probe time to a finite range after build time, so Spark can expire
    state: a purchase is held only until watermark passes its window end,
    a click until its own window closes. Without the range bound the state
    store would grow forever — this is THE pattern for joining two
    unbounded streams."""
    win_us = window_hours * 3600 * 1_000_000
    base = events_stream.select(
        "event_id", "user_id", "event_type",
        F.col("ts").cast("timestamp").alias("ts_t"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
    )
    probes = (
        base.filter(F.col("event_type") == probe_type)
        .select(
            F.col("event_id").alias("probe_event_id"),
            F.col("user_id").alias("p_user_id"),
            F.col("ts_t").alias("probe_ts"),
            F.col("ts_us").alias("probe_ts_us"),
        )
        .withWatermark("probe_ts", watermark)
    )
    builds = (
        base.filter(F.col("event_type") == build_type)
        .select(
            F.col("event_id").alias("build_event_id"),
            F.col("user_id").alias("b_user_id"),
            F.col("ts_t").alias("build_ts"),
            F.col("ts_us").alias("build_ts_us"),
        )
        .withWatermark("build_ts", watermark)
    )
    joined = probes.join(
        builds,
        F.expr(
            f"""
            p_user_id = b_user_id AND
            probe_ts >= build_ts AND
            probe_ts <= build_ts + INTERVAL {window_hours} HOURS
            """
        ),
    )
    return joined.select(
        "probe_event_id",
        F.col("p_user_id").alias("user_id"),
        "probe_ts_us",
        "build_event_id",
        "build_ts_us",
        (F.col("probe_ts_us") - F.col("build_ts_us")).alias("delay_us"),
    )


def run_stream_sessionize(
    spark: SparkSession,
    events_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    gap_minutes: int = DEFAULT_GAP_MINUTES,
    max_files_per_trigger: int | None = 1,
):
    """File-to-file streaming sessionization; availableNow drains the input
    and stops (the testable finite form; drop availableNow for 24/7)."""
    stream = read_events_stream(spark, events_dir, max_files_per_trigger)
    q = (
        stream_sessionize(stream, gap_minutes)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
