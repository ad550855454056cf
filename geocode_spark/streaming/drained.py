"""Drained streaming runs — the oracle gate for the streaming family.

Each helper materializes a finite input as stream source files, runs the
real Structured Streaming query with trigger(availableNow=True) across
MULTIPLE micro-batches (maxFilesPerTrigger=1 over 2 source files, so
cross-batch state/continuity is actually exercised), drains it to parquet,
and returns the batch read-back. Because every streaming operator here is
batch-equivalent on a drained input (pinned by tests/test_stream_sessions.py
and tests/test_streaming.py), the drained result can be hash-compared against
the SAME DuckDB oracle as its batch twin — turning the pytest-only streaming
ops (SURVEY §2.8 T15/T24/T33) into CORRECTNESS-gated queries.

Fresh temp dirs per call: a drained query is a full re-run, never an append
onto a previous invocation's sink.
"""

from __future__ import annotations

import os
import tempfile
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Stateful streaming cost is dominated by STATE STORE COUNT, not data:
# every shuffle partition carries its own versioned store per stateful
# operator (4 per stream-stream join side-pair), each fsyncing per
# micro-batch. Drained verification runs are small-data by construction, so
# they pin a small state partitioning (measured at sf0.1: the attribution
# drain is 104 s at 32 partitions, 17 s at 8 — same rows). A production
# 24/7 stream sizes this to state VOLUME instead.
DRAIN_SHUFFLE_PARTITIONS = 8

# r6: each micro-batch reads ONE staged file, so the pre-shuffle stage of
# every drained plan (scan + tokenize/md5/geocode + partial agg) ran as a
# single task regardless of core count — measured 37.3 s addBatch vs 0.75 s
# for the identical batch plan over the FULL table at sf1.0 (guide §2.5
# input skew: one unsplittable-in-practice file). Staged files are therefore
# written with small parquet row groups (block size below) and drains read
# with a matching small maxPartitionBytes, so the one-file-per-micro-batch
# contract (2 files -> 2 batches, unchanged) no longer serializes the scan.
DRAIN_PARQUET_BLOCK_BYTES = 4 * 1024 * 1024
# staging-format version for the reusable pages source (bump when the
# staged layout changes so stale /tmp dirs are never reused)
PAGES_STAGE_VERSION = "ranksplit-v3"
DRAIN_MAX_PARTITION_BYTES = 4 * 1024 * 1024


@contextmanager
def _drain_partitions(spark: SparkSession):
    old = spark.conf.get("spark.sql.shuffle.partitions")
    old_split = spark.conf.get("spark.sql.files.maxPartitionBytes")
    spark.conf.set(
        "spark.sql.shuffle.partitions", str(DRAIN_SHUFFLE_PARTITIONS)
    )
    spark.conf.set(
        "spark.sql.files.maxPartitionBytes", str(DRAIN_MAX_PARTITION_BYTES)
    )
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
        spark.conf.set("spark.sql.files.maxPartitionBytes", old_split)


def _write_half(df: DataFrame, path: str) -> None:
    """Write one micro-batch half as ONE splittable parquet file.

    repartition(1), not coalesce(1): coalesce pulls the ENTIRE upstream
    (filters, md5 bucketing, rank windows) into the single writer task;
    repartition keeps the upstream parallel and serializes only the final
    encode. The small row-group size keeps the single file splittable for
    the drain-side scan (see DRAIN_PARQUET_BLOCK_BYTES)."""
    (
        df.repartition(1)
        .write.mode("append")
        .option("parquet.block.size", str(DRAIN_PARQUET_BLOCK_BYTES))
        .parquet(path)
    )


def _events_source(spark: SparkSession, sf_dir: str, root: str) -> str:
    """Write the events table as 2 TIME-SPLIT stream-source files.

    The split must be explicit (round-3 review: the events table is one
    small parquet file -> one scan partition, so a bare coalesce(2) yields
    ONE output file and the drain would run as a single micro-batch,
    leaving the cross-batch state path unexercised). The two halves are
    written SEQUENTIALLY around the median event time — FileStreamSource
    orders files by modification time, so micro-batch 1 carries the earlier
    half and batch 2 the later half, the per-user cross-batch order
    contract under which streaming equals batch."""
    from pyspark.sql.window import Window

    src = f"{root}/src"
    events = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id",
        F.col("ts").cast("timestamp").alias("ts"),
        "user_id",
        "event_type",
        "value",
        "props",
    )
    # split by RANK, not by a median value: a value cut degenerates to one
    # non-empty half whenever >=50% of events tie at the max timestamp
    # (ingest-stamped imports), silently re-creating the single-batch
    # vacuousness. The rank split guarantees both halves non-empty for any
    # n >= 2. The global window is one task — fine for a gate-sized input;
    # production streams never take this path.
    w = Window.orderBy(F.unix_micros(F.col("ts")), F.col("event_id"))
    # persist: the ranked relation feeds the size check AND both half
    # writes — without it the one-task global window runs three times
    ranked = events.withColumn("_rn", F.row_number().over(w)).persist()
    try:
        n = ranked.count()
        if n < 2:
            raise ValueError(
                f"events source has {n} rows — cannot 2-batch split"
            )
        half = n // 2
        first = ranked.filter(F.col("_rn") <= half).drop("_rn")
        second = ranked.filter(F.col("_rn") > half).drop("_rn")
        _write_half(first, src)
        _write_half(second, src)
    finally:
        ranked.unpersist()
    return src


def drained_sessionize(spark: SparkSession, sf_dir: str,
                       root: str | None = None) -> DataFrame:
    """applyInPandasWithState sessionization drained over 2 micro-batches;
    equals operators.temporal.sessionize row-for-row (same oracle). `root`
    (tests) pins the run directory so the checkpoint can be inspected."""
    from .sessions import read_events_stream, stream_sessionize

    root = root or tempfile.mkdtemp(prefix="gs_drain_sessionize_")
    src = _events_source(spark, sf_dir, root)
    with _drain_partitions(spark):
        q = (
            stream_sessionize(
                read_events_stream(spark, src, max_files_per_trigger=1)
            )
            .writeStream.format("parquet")
            .option("path", f"{root}/out")
            .option("checkpointLocation", f"{root}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.read.parquet(f"{root}/out")


def drained_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked stream-stream attribution join drained over 2
    micro-batches; equals operators.temporal.attribution_join (same oracle)."""
    from .sessions import read_events_stream, stream_attribution

    root = tempfile.mkdtemp(prefix="gs_drain_attr_")
    src = _events_source(spark, sf_dir, root)
    with _drain_partitions(spark):
        q = (
            stream_attribution(
                read_events_stream(spark, src, max_files_per_trigger=1)
            )
            .writeStream.format("parquet")
            .option("path", f"{root}/out")
            .option("checkpointLocation", f"{root}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.read.parquet(f"{root}/out")


def _pages_stream_source(spark: SparkSession, fixtures_dir: str) -> str:
    """Stage the pages table as 2 RANK-SPLIT stream-source files, REUSED
    across calls (keyed by fixtures_dir — the fixture corpus is immutable).

    The split must be explicit, exactly like _events_source: the fixture
    pages table is typically ONE small parquet file -> one scan partition,
    so a bare coalesce(2) = min(2, 1) yields ONE output file and the drain
    silently runs as a single micro-batch, leaving the cross-batch path
    unexercised (round-3 verdict item #1 — a degenerate one-file staging
    artifact was observed on disk). The two halves are split by row_number
    over url (unique key, so both halves are non-empty for any n >= 2) and
    written SEQUENTIALLY so FileStreamSource's mtime ordering assigns one
    half per micro-batch.

    The html binary column is nulled at the staging boundary: the geocode
    pipeline projects only (url, text), so shipping the payload bytes into
    the stream source would be pure write amplification the batch plan's
    own column pruning already avoids."""
    import hashlib

    from pyspark.sql.window import Window

    # cache key includes the source file's (mtime, size) fingerprint, so a
    # regenerated fixture corpus invalidates the staging automatically, and
    # a staging-format version, so pre-rank-split (coalesce-based) dirs
    # from older engine versions are never reused; the staged dir is
    # written to a private tmp path and atomically rename()d in, so
    # concurrent runs never observe a half-written source.
    pages_path = f"{fixtures_dir}/pages.parquet"
    st = os.stat(pages_path)
    key = hashlib.md5(
        f"{fixtures_dir}|{st.st_mtime_ns}|{st.st_size}|{PAGES_STAGE_VERSION}"
        .encode()
    ).hexdigest()[:16]
    src = f"{tempfile.gettempdir()}/gs_drain_pages_{key}"
    if not os.path.exists(f"{src}/_HALVES_OK"):
        tmp = f"{src}.tmp-{os.getpid()}"
        pages = spark.read.parquet(pages_path).select(
            "url",
            "warc_ts",
            F.lit(None).cast("binary").alias("html"),
            "text",
            "lang",
        )
        # one-task global window — fine for a gate-sized staging input;
        # production streams arrive pre-split into many files and never
        # take this path.
        w = Window.orderBy("url")
        # persist: feeds the size check and both half writes (3 uses)
        ranked = pages.withColumn("_rn", F.row_number().over(w)).persist()
        try:
            n = ranked.count()
            if n < 2:
                raise ValueError(
                    f"pages source has {n} rows — cannot 2-batch split"
                )
            half = n // 2
            first = ranked.filter(F.col("_rn") <= half).drop("_rn")
            second = ranked.filter(F.col("_rn") > half).drop("_rn")
            _write_half(first, tmp)
            _write_half(second, tmp)
        finally:
            ranked.unpersist()
        # success marker distinct from Spark's _SUCCESS: set only after BOTH
        # sequential half-writes committed.
        with open(f"{tmp}/_HALVES_OK", "w") as fh:
            fh.write("2")
        try:
            os.rename(tmp, src)
        except OSError:
            # another process won the race; its copy is complete (rename is
            # atomic and only happens after a full write)
            import shutil

            shutil.rmtree(tmp, ignore_errors=True)
    return src


def _dup_corpus_source(spark: SparkSession, sf_dir: str, root: str) -> str:
    """Stage the dup-injected documents corpus (textops.dedup.near_dup_corpus
    — the same relation the batch dedup_exact gate runs on) as 2
    INTERLEAVED stream-source files: rows are ranked within (text_hash,
    doc_id) order and split odd/even, so EVERY duplicate group with >= 2
    members spans both micro-batches — the drain cannot pass on
    within-batch dedup alone; the cross-batch state path carries the gate.
    Event time is a constant timestamp: the watermark then never classifies
    any row late (late-drop semantics are pinned separately by the
    streaming pytest suite), so drained output keys == batch distinct keys
    exactly."""
    from pyspark.sql.window import Window

    from ..textops.dedup import near_dup_corpus

    src = f"{root}/src"
    corpus = near_dup_corpus(
        spark.read.parquet(f"{sf_dir}/documents.parquet")
    ).select(
        "doc_id",
        F.lit("2026-01-01 00:00:00").cast("timestamp").alias("ts"),
        "text",
    )
    # one-task global window — gate-sized staging input only
    w = Window.orderBy(F.md5("text"), F.col("doc_id"))
    # persist: feeds the size check and both half writes (3 uses)
    ranked = corpus.withColumn("_rn", F.row_number().over(w)).persist()
    try:
        n = ranked.count()
        if n < 2:
            raise ValueError(f"dup corpus has {n} rows — cannot 2-batch split")
        first = ranked.filter(F.col("_rn") % 2 == 1).drop("_rn")
        second = ranked.filter(F.col("_rn") % 2 == 0).drop("_rn")
        _write_half(first, src)
        _write_half(second, src)
    finally:
        ranked.unpersist()
    return src


def drained_dedup(spark: SparkSession, sf_dir: str,
                  root: str | None = None) -> DataFrame:
    """Streaming exact dedup (dropDuplicatesWithinWatermark on the content
    hash — SURVEY §2.8 T29) drained over 2 micro-batches with every
    duplicate group spanning both; returns the surviving content-hash SET,
    which equals the batch dedup relation's distinct text_hash column (the
    SURVIVING doc_id is arrival-order-dependent inside a micro-batch and
    deliberately not part of the gate). `root` (tests) pins the run
    directory so the checkpoint's committed offsets can be inspected."""
    root = root or tempfile.mkdtemp(prefix="gs_drain_dedup_")
    src = _dup_corpus_source(spark, sf_dir, root)
    stream = (
        spark.readStream.schema("doc_id bigint, ts timestamp, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    survivors = (
        stream.withColumn("text_hash", F.md5(F.col("text")))
        .withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["text_hash"])
    )
    with _drain_partitions(spark):
        q = (
            survivors.writeStream.format("parquet")
            .option("path", f"{root}/out")
            .option("checkpointLocation", f"{root}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.read.parquet(f"{root}/out").select("text_hash")


def drained_geocode(spark: SparkSession, fixtures_dir: str,
                    root: str | None = None) -> DataFrame:
    """foreachBatch incremental geocode drained over 2 micro-batches; equals
    the batch geocode_pages plan (same oracle) because a url lives in exactly
    one file, so per-batch top-1 is global top-1. `root` (tests) pins the
    run directory so the checkpoint's committed offsets can be inspected."""
    from ..plans.pipeline import load_locators
    from .stream import read_stream_results, stream_geocode

    root = root or tempfile.mkdtemp(prefix="gs_drain_geocode_")
    src = _pages_stream_source(spark, fixtures_dir)
    with _drain_partitions(spark):
        q = stream_geocode(
            spark,
            src,
            load_locators(spark, fixtures_dir),
            f"{root}/out",
            f"{root}/ckpt",
            available_now=True,
            max_files_per_trigger=1,
        )
        q.awaitTermination()
    return read_stream_results(spark, f"{root}/out")


def _docs_split_source(spark: SparkSession, sf_dir: str, root: str) -> str:
    """Stage the documents table as 2 doc_id-parity stream-source files:
    with the fixture vocabulary every term occurs in BOTH halves, so the
    final complete-mode counts are correct ONLY if the streaming
    aggregation state carried batch 1's partial counts into batch 2 — a
    state-less per-batch recount would roughly halve every value and fail
    the hash gate."""
    src = f"{root}/src"
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    first = docs.filter(F.col("doc_id") % 2 == 0)
    second = docs.filter(F.col("doc_id") % 2 == 1)
    if first.limit(1).count() == 0 or second.limit(1).count() == 0:
        raise ValueError("parity split left an empty micro-batch")
    _write_half(first, src)
    _write_half(second, src)
    return src


def drained_term_counts(spark: SparkSession, sf_dir: str,
                        root: str | None = None) -> DataFrame:
    """Native streaming aggregation (the one streaming class the drained
    family didn't yet gate — T15/T24/T29/T33 cover foreachBatch reuse,
    applyInPandasWithState, dropDuplicatesWithinWatermark, and the
    stream-stream join): exact corpus term counts via groupBy(term) in
    COMPLETE output mode, drained over 2 parity-split micro-batches.
    foreachBatch overwrites the sink with each batch's complete counts, so
    the surviving table is the LAST batch's state — exactly the batch
    groupBy when (and only when) cross-batch aggregation state held."""
    from ..textops.textstats import ws_word_array

    root = root or tempfile.mkdtemp(prefix="gs_drain_terms_")
    src = _docs_split_source(spark, sf_dir, root)
    stream = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    counts = (
        stream.select(
            F.explode(ws_word_array(F.lower(F.col("text")))).alias("term")
        )
        .groupBy("term")
        .agg(F.count("*").cast("bigint").alias("n"))
    )

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(f"{root}/out")

    with _drain_partitions(spark):
        q = (
            counts.writeStream.outputMode("complete")
            .foreachBatch(_sink)
            .option("checkpointLocation", f"{root}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.read.parquet(f"{root}/out")


def _points_split_source(spark: SparkSession, points: DataFrame,
                         root: str) -> str:
    """Stage a point relation as 2 md5-parity stream-source files. Tiles
    hold many points, so (almost) every tile's mass spans both halves —
    a state-less per-batch recount would report only the second half's
    counts and fail the hash gate."""
    src = f"{root}/src"
    # pin the bucketed relation for the staging window: the two
    # non-empty probes + two half writes are 4 actions, and for tile
    # rollup the upstream is the full geocode pipeline — without the
    # pin staging recomputes it 4x (the ranked-split source above
    # already follows this persist/unpersist discipline)
    bucketed = points.withColumn(
        "_b", F.expr("conv(substr(md5(primary_key), 1, 8), 16, 10) % 2")
    ).persist()
    try:
        first = bucketed.filter(F.col("_b") == 0).drop("_b")
        second = bucketed.filter(F.col("_b") == 1).drop("_b")
        if first.limit(1).count() == 0 or second.limit(1).count() == 0:
            raise ValueError("md5 parity split left an empty micro-batch")
        _write_half(first, src)
        _write_half(second, src)
    finally:
        bucketed.unpersist()
    return src


def drained_tile_rollup(spark: SparkSession, points: DataFrame,
                        root: str | None = None) -> DataFrame:
    """Streaming tile rollup — the geospatial member of the drained
    family: per-raster-tile counts + score mass via groupBy(tile) in
    COMPLETE output mode over 2 md5-parity micro-batches (the live-map
    dashboard shape: a feed of geocoded points, per-tile aggregates
    maintained incrementally). Same contract as drained_term_counts:
    foreachBatch overwrites the sink, so the survivor equals the batch
    tile_rollup exactly when cross-batch aggregation state held — gated
    against the SAME DuckDB oracle as the batch operator."""
    from ..operators.spatial import assign_tiles

    root = root or tempfile.mkdtemp(prefix="gs_drain_tiles_")
    src = _points_split_source(spark, points, root)
    stream = (
        spark.readStream.schema(points.schema)  # the staged files' own types
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    rollup = (
        assign_tiles(stream)
        .groupBy("tile_x", "tile_y")
        .agg(
            F.count("*").cast("bigint").alias("n_points"),
            F.sum("score").cast("bigint").alias("sum_score"),
        )
    )

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(f"{root}/out")

    with _drain_partitions(spark):
        q = (
            rollup.writeStream.outputMode("complete")
            .foreachBatch(_sink)
            .option("checkpointLocation", f"{root}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.read.parquet(f"{root}/out")


def _crawl_split_source(spark: SparkSession, log: DataFrame,
                        root: str) -> str:
    """Stage a (segment, visitor) crawl log as 2 stream-source files
    split by md5(visitor) PARITY — each visitor's rows land wholly in
    one half, so batch 2's registers alone MISS every batch-1 visitor:
    the drained result equals the batch sketch only if register state
    max-merged across batches."""
    src = f"{root}/src"
    # same staging pin as _points_split_source: 4 actions over the
    # synthesized log otherwise recompute it 4x
    bucketed = log.withColumn(
        "_b", F.expr("conv(substr(md5(visitor), 9, 8), 16, 10) % 2")
    ).persist()
    try:
        first = bucketed.filter(F.col("_b") == 0).drop("_b")
        second = bucketed.filter(F.col("_b") == 1).drop("_b")
        if first.limit(1).count() == 0 or second.limit(1).count() == 0:
            raise ValueError("md5 parity split left an empty micro-batch")
        _write_half(first, src)
        _write_half(second, src)
    finally:
        bucketed.unpersist()
    return src


def drained_hll(spark: SparkSession, sf_dir: str,
                root: str | None = None) -> DataFrame:
    """Streaming HLL distinct counting — the sketch member of the
    drained family (the live "distinct visitors per segment" counter):
    register maintenance (groupBy(segment, bucket) max(rho)) runs as a
    COMPLETE-mode streaming aggregation over 2 visitor-disjoint
    micro-batches; the estimate is finished by the read-side projection
    over the surviving register table (registers, not estimates, are
    what streams maintain and merge). Gated against the batch
    hll_distinct oracle (with_exact=False)."""
    from ..textops.sketch import (
        hll_finish,
        hll_registers,
        synthetic_crawl_log,
    )

    root = root or tempfile.mkdtemp(prefix="gs_drain_hll_")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    src = _crawl_split_source(spark, synthetic_crawl_log(li), root)
    stream = (
        spark.readStream.schema("segment string, visitor string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    regs = hll_registers(stream)

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(f"{root}/out")

    with _drain_partitions(spark):
        q = (
            regs.writeStream.outputMode("complete")
            .foreachBatch(_sink)
            .option("checkpointLocation", f"{root}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return hll_finish(spark.read.parquet(f"{root}/out"))
