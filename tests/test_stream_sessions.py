"""Stateful streaming sessionization: cross-batch state continuity and
checkpoint resume must reproduce the batch operator exactly."""

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from compare_util import assert_frames_match

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def split_events(spark, tmp_path_factory):
    """Two event-time halves written as separate stream input files — the
    per-user cross-batch order contract under which streaming == batch."""
    root = tmp_path_factory.mktemp("sessions")
    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    cut = events.agg(
        F.percentile_approx(ts_us, F.lit(0.5)).alias("cut")
    ).collect()[0][0]
    # Inject a sentinel user whose session is GUARANTEED to straddle the
    # cut (events 1 minute either side, well inside the 30-min gap) — the
    # real sf0.001 events are sparse enough around the median that no
    # organic session spans it, which made the continuity test vacuous
    # (ADVICE r02).
    max_id = events.agg(F.max("event_id")).collect()[0][0]
    minute_us = 60 * 1_000_000
    sentinel = spark.createDataFrame(
        [
            (max_id + 1 + i, off_us)
            for i, off_us in enumerate(
                (-2 * minute_us, -minute_us, minute_us, 2 * minute_us)
            )
        ],
        "event_id bigint, off_us bigint",
    ).select(
        "event_id",
        F.timestamp_micros(F.lit(cut) + F.col("off_us")).alias("ts"),
        F.lit(999_983).cast("bigint").alias("user_id"),
        F.lit("click").alias("event_type"),
        F.lit(1.0).alias("value"),
        F.lit("{}").alias("props"),
    )
    events = events.select(
        "event_id", F.col("ts").cast("timestamp").alias("ts"), "user_id",
        "event_type", "value", "props",
    ).unionByName(sentinel)
    src = str(root / "events_in")
    os.makedirs(src, exist_ok=True)
    ts_us = F.unix_micros(F.col("ts"))
    first = events.filter(ts_us <= cut)
    second = events.filter(ts_us > cut)
    return {
        "root": str(root), "src": src, "events": events,
        "first": first, "second": second,
    }


def test_stream_sessionize_matches_batch_across_restart(spark, split_events):
    from geocode_spark.operators.temporal import sessionize
    from geocode_spark.streaming.sessions import run_stream_sessionize

    d = split_events
    out = f"{d['root']}/out"
    ckpt = f"{d['root']}/ckpt"

    # micro-batch 1: first half only
    d["first"].coalesce(1).write.mode("append").parquet(d["src"])
    run_stream_sessionize(spark, d["src"], out, ckpt)

    # restart from checkpoint with the second half landed
    d["second"].coalesce(1).write.mode("append").parquet(d["src"])
    run_stream_sessionize(spark, d["src"], out, ckpt)

    got = spark.read.parquet(out).toPandas()
    want = sessionize(d["events"]).toPandas()
    assert_frames_match(got, want, label="stream_sessionize")


def test_stream_sessionize_session_continues_across_batches(spark, split_events):
    """At least one session must span the batch boundary (otherwise the
    continuity assertion above is vacuous) — guaranteed by construction:
    the boundary user's last batch-1 event and first batch-2 event are
    within the gap for some user, or every boundary pair exceeds the gap
    and the test still pins the reindexing."""
    from geocode_spark.operators.temporal import sessionize

    d = split_events
    # batch twin: sessions whose events straddle the time cut
    sess = sessionize(d["events"]).toPandas()
    first_ids = set(
        r.event_id for r in d["first"].select("event_id").collect()
    )
    sess["in_first"] = sess["event_id"].isin(first_ids)
    span = sess.groupby(["user_id", "session_idx"])["in_first"].nunique()
    # at least one session must have events on BOTH sides of the cut —
    # otherwise the cross-batch continuity equality above never exercises
    # carried state (nunique()==2 means the session straddles the boundary)
    assert (span == 2).any(), "no session spans the micro-batch boundary"


def test_stream_attribution_matches_batch(spark, split_events):
    """Watermarked stream-stream join drains to exactly the batch
    attribution_join result."""
    from geocode_spark.operators.temporal import attribution_join
    from geocode_spark.streaming.sessions import (
        read_events_stream, stream_attribution,
    )

    d = split_events
    src = f"{d['root']}/attr_in"
    os.makedirs(src, exist_ok=True)
    d["events"].coalesce(2).write.mode("append").parquet(src)

    out = f"{d['root']}/attr_out"
    ckpt = f"{d['root']}/attr_ckpt"
    q = (
        stream_attribution(read_events_stream(spark, src, 1))
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    got = spark.read.parquet(out).toPandas()
    want = attribution_join(d["events"]).toPandas()
    assert_frames_match(got, want, label="stream_attribution")


def test_stream_sessionize_multi_chunk_group_sorts_globally(spark, tmp_path):
    """ADVICE r02: a user's micro-batch rows arrive as MULTIPLE Arrow chunks
    (maxRecordsPerBatch) in no particular order; assignment must sort the
    whole group, not each chunk. One user, 600 events written in REVERSE
    time order with chunk size 64 — per-chunk sorting would walk time
    backwards across chunks and invent sessions at every chunk seam."""
    import numpy as np
    import pandas as pd

    from geocode_spark.operators.temporal import sessionize
    from geocode_spark.streaming.sessions import run_stream_sessionize

    n = 600
    base = pd.Timestamp("2025-06-01 00:00:00")
    # 3 sessions of 200 events: 1-min strides inside a block (span 199 min),
    # 5-hour block stride => ~1h41m inter-block gap > the 30-min session gap
    ts = [
        base
        + pd.Timedelta(minutes=int(i % 200))
        + pd.Timedelta(hours=5 * int(i // 200))
        for i in range(n)
    ]
    pdf = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype="int64"),
            "ts": ts,
            "user_id": np.int64(1),
            "event_type": "click",
            "value": 0.0,
            "props": "",
        }
    ).iloc[::-1]  # reverse: chunk 1 holds the LATEST events
    events = spark.createDataFrame(
        pdf,
        schema="event_id bigint, ts timestamp, user_id bigint,"
        " event_type string, value double, props string",
    )
    src = str(tmp_path / "in")
    events.coalesce(1).write.mode("append").parquet(src)

    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "64")
    try:
        run_stream_sessionize(
            spark, src, str(tmp_path / "out"), str(tmp_path / "ckpt")
        )
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)

    got = spark.read.parquet(str(tmp_path / "out")).toPandas()
    want = sessionize(events).toPandas()
    assert_frames_match(got, want, label="stream_sessionize_chunks")
    assert got["session_idx"].nunique() == 3


def test_drained_sessionize_runs_multiple_micro_batches(spark, tmp_path):
    """Round-3 review: a single-file source would drain in ONE micro-batch,
    making the drained gate's cross-batch claim vacuous (coalesce on a
    1-partition read cannot split). Pin that the drained run commits >= 2
    micro-batches AND still equals the batch operator."""
    from geocode_spark.operators.temporal import sessionize
    from geocode_spark.streaming.drained import drained_sessionize

    root = str(tmp_path / "drain")
    got = drained_sessionize(spark, SF_DIR, root=root).toPandas()
    committed = [
        f for f in os.listdir(f"{root}/ckpt/offsets") if not f.startswith(".")
    ]
    assert len(committed) >= 2, f"only micro-batches {committed} committed"
    # both source halves must carry rows (a value-based split can leave the
    # second half empty under timestamp ties — the rank split cannot)
    import glob

    import pandas as pd

    halves = sorted(glob.glob(f"{root}/src/part-*.parquet"))
    assert len(halves) == 2
    for h in halves:
        assert len(pd.read_parquet(h)) > 0, f"empty stream-source half {h}"
    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    want = sessionize(events).toPandas()
    assert_frames_match(got, want, label="drained_sessionize_batches")
