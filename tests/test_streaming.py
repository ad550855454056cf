"""Structured-Streaming geocode: batch-equivalence, incremental arrival,
checkpoint resume, and the watermarked windowed rollup."""

import os
import shutil
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from compare_util import canonicalize
from geocode_spark.plans.pipeline import geocode_pages, load_locators
from geocode_spark.streaming.stream import (
    read_pages_stream,
    read_stream_results,
    stream_geocode,
    windowed_lang_counts,
)


@pytest.fixture(scope="module")
def stream_dirs(spark, fixtures_dir, tmp_path_factory):
    """Split the fixture pages into two file batches in a stream source dir."""
    root = tmp_path_factory.mktemp("stream")
    src = str(root / "pages_in")
    pages = spark.read.parquet(f"{fixtures_dir}/pages.parquet")
    first, second = (
        pages.filter(F.crc32(F.col("url")) % 2 == 0),
        pages.filter(F.crc32(F.col("url")) % 2 == 1),
    )
    first.coalesce(1).write.mode("overwrite").parquet(src)
    return {"root": str(root), "src": src, "second": second, "pages": pages}


def _run(spark, fixtures_dir, dirs, out, ckpt):
    q = stream_geocode(
        spark,
        dirs["src"],
        load_locators(spark, fixtures_dir),
        out_dir=out,
        checkpoint_dir=ckpt,
        available_now=True,
    )
    q.awaitTermination(300)


def test_stream_matches_batch_and_resumes(spark, fixtures_dir, stream_dirs):
    root = stream_dirs["root"]
    out, ckpt = f"{root}/out", f"{root}/ckpt"

    # pass 1: only the first half of the pages exists
    _run(spark, fixtures_dir, stream_dirs, out, ckpt)
    got1 = read_stream_results(spark, out)
    n_first = spark.read.parquet(stream_dirs["src"]).count()
    assert got1.count() == n_first

    # more files arrive; restart with the SAME checkpoint -> only new files
    # are processed (resume), and the union equals the batch result
    stream_dirs["second"].coalesce(2).write.mode("append").parquet(
        stream_dirs["src"]
    )
    _run(spark, fixtures_dir, stream_dirs, out, ckpt)

    got = read_stream_results(spark, out).toPandas()
    want = geocode_pages(
        spark.read.parquet(stream_dirs["src"]),
        load_locators(spark, fixtures_dir),
    ).toPandas()
    assert len(got) == len(want)
    a, b = canonicalize(got), canonicalize(want)
    assert a.equals(b), "streamed result != batch result"

    # resume really skipped: a third run with nothing new adds no batches
    batches_before = set(os.listdir(out))
    _run(spark, fixtures_dir, stream_dirs, out, ckpt)
    new = {
        d for d in set(os.listdir(out)) - batches_before
        if d.startswith("stream_batch=")
    }
    for d in new:  # an empty replay batch may appear; it must carry no rows
        files = [f for f in os.listdir(f"{out}/{d}") if f.endswith(".parquet")]
        if files:
            assert spark.read.parquet(f"{out}/{d}").count() == 0


def test_windowed_lang_counts(spark, fixtures_dir, stream_dirs):
    root = stream_dirs["root"]
    out = f"{root}/lang_out"
    src = read_pages_stream(spark, stream_dirs["src"])
    agg = windowed_lang_counts(src, window="10 minutes", watermark="30 minutes")
    q = (
        agg.writeStream.format("memory")
        .queryName("langcounts")
        .outputMode("complete")
        .option("checkpointLocation", f"{root}/lang_ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = spark.sql("select * from langcounts").toPandas()

    pages = spark.read.parquet(stream_dirs["src"])
    want = (
        pages.groupBy(F.window("warc_ts", "10 minutes").alias("w"), "lang")
        .agg(F.count("*").alias("n_pages"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "lang",
            "n_pages",
        )
        .toPandas()
    )
    assert len(got) == len(want)
    assert canonicalize(got).equals(canonicalize(want))


def test_stream_dedup_pages(spark, fixtures_dir, tmp_path):
    """A page re-delivered in a later micro-batch within the watermark is
    dropped; distinct pages all survive."""
    from pyspark.sql import functions as F

    from geocode_spark.streaming.stream import (
        read_pages_stream,
        stream_dedup_pages,
    )

    src = str(tmp_path / "dedup_in")
    out = str(tmp_path / "dedup_out")
    ckpt = str(tmp_path / "dedup_ckpt")

    pages = spark.read.parquet(f"{fixtures_dir}/pages.parquet")
    n_distinct = pages.select(
        F.md5(F.lower(F.regexp_replace(F.trim("text"), r"\s+", " ")))
    ).distinct().count()

    # batch 1: all pages; batch 2: a re-crawl of half of them (same text,
    # later warc_ts still inside the watermark)
    pages.coalesce(1).write.mode("append").parquet(src)
    q = (
        stream_dedup_pages(read_pages_stream(spark, src, 1))
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(300)

    recrawl = pages.filter(F.crc32("url") % 2 == 0).withColumn(
        "url", F.concat_ws("#", F.col("url"), F.lit("recrawl"))
    ).withColumn(
        "warc_ts", F.col("warc_ts") + F.expr("INTERVAL 10 MINUTES")
    )
    recrawl.coalesce(1).write.mode("append").parquet(src)
    q = (
        stream_dedup_pages(read_pages_stream(spark, src, 1))
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(300)

    got = spark.read.parquet(out)
    # every distinct fingerprint survived exactly once; all re-crawled
    # duplicates were dropped by the state store across micro-batches
    assert got.select("fp_md5").distinct().count() == got.count()
    assert got.count() == n_distinct
    assert got.filter(F.col("url").endswith("#recrawl")).count() == 0


def test_drained_geocode_runs_multiple_micro_batches(spark, fixtures_dir, tmp_path):
    """Round-4 (verdict item #1): the pages drain previously staged its
    source with a bare coalesce(2), which on a 1-partition read yields ONE
    file -> ONE micro-batch, making the drained gate's cross-batch claim
    vacuous. The staging is now an explicit rank split (row_number over url,
    two sequential writes) — config-INDEPENDENT, so it holds under the
    default 128 MB file-split config as much as under the test session's
    small_input splits. Pin: >= 2 committed offsets, both staged halves
    non-empty, and the drained result still equals the batch plan."""
    import glob
    import hashlib
    import tempfile

    import pandas as pd

    from compare_util import assert_frames_match
    from geocode_spark.streaming.drained import drained_geocode

    # force a COLD staging cache: drop any previously staged source for this
    # fixture fingerprint so the rank-split write path itself is exercised
    pages_path = f"{fixtures_dir}/pages.parquet"
    st = os.stat(pages_path)
    from geocode_spark.streaming.drained import PAGES_STAGE_VERSION

    key = hashlib.md5(
        f"{fixtures_dir}|{st.st_mtime_ns}|{st.st_size}|{PAGES_STAGE_VERSION}"
        .encode()
    ).hexdigest()[:16]
    staged = f"{tempfile.gettempdir()}/gs_drain_pages_{key}"
    shutil.rmtree(staged, ignore_errors=True)

    root = str(tmp_path / "drain")
    got = drained_geocode(spark, fixtures_dir, root=root).toPandas()

    committed = [
        f for f in os.listdir(f"{root}/ckpt/offsets") if not f.startswith(".")
    ]
    assert len(committed) >= 2, f"only micro-batches {committed} committed"
    halves = sorted(glob.glob(f"{staged}/part-*.parquet"))
    assert len(halves) == 2, f"staging produced {len(halves)} files, want 2"
    for h in halves:
        assert len(pd.read_parquet(h)) > 0, f"empty stream-source half {h}"

    pages = spark.read.parquet(pages_path)
    want = geocode_pages(pages, load_locators(spark, fixtures_dir)).toPandas()
    assert_frames_match(got, want, label="drained_geocode_batches")


def test_drained_dedup_cross_batch_state(spark, tmp_path):
    """T29's oracle gate: the drained streaming exact dedup must (a) commit
    >= 2 micro-batches, (b) have duplicate groups SPANNING the two source
    halves (the interleaved split guarantees it — otherwise within-batch
    dedup alone could pass), and (c) emit each surviving content hash
    exactly once, matching the batch dedup relation's key set."""
    import glob
    import os

    import pandas as pd
    from pyspark.sql import functions as F

    from geocode_spark.streaming.drained import drained_dedup
    from geocode_spark.textops.dedup import dedup_exact, near_dup_corpus

    sf_dir = "/root/testdata/sf0.001"
    root = str(tmp_path / "drain")
    got = drained_dedup(spark, sf_dir, root=root).toPandas()

    committed = [
        f for f in os.listdir(f"{root}/ckpt/offsets") if not f.startswith(".")
    ]
    assert len(committed) >= 2, f"only micro-batches {committed} committed"

    halves = sorted(glob.glob(f"{root}/src/part-*.parquet"))
    assert len(halves) == 2
    h0 = set(pd.read_parquet(halves[0]).text.map(hash))
    h1 = set(pd.read_parquet(halves[1]).text.map(hash))
    spanning = h0 & h1
    assert len(spanning) > 0, "no duplicate group spans the micro-batches"

    # exactly-once per key, and the key set equals the batch relation's
    assert got.text_hash.is_unique
    batch = (
        dedup_exact(near_dup_corpus(
            spark.read.parquet(f"{sf_dir}/documents.parquet")
        ))
        .select("text_hash").toPandas()
    )
    assert sorted(got.text_hash) == sorted(batch.text_hash)
    # effect size: the corpus genuinely contains duplicates
    assert len(got) < len(h0) + len(h1)


def test_drained_term_counts_cross_batch_state(spark, tmp_path):
    """The native streaming-aggregation gate: complete-mode term counts
    drained over 2 parity-split micro-batches must (a) commit >= 2
    offsets, (b) have every term's mass SPLIT across the halves (so a
    state-less per-batch recount cannot reproduce the totals), and (c)
    equal the batch groupBy exactly."""
    import glob
    import os

    import pandas as pd
    from pyspark.sql import functions as F

    from geocode_spark.streaming.drained import drained_term_counts
    from geocode_spark.textops.textstats import ws_word_array

    sf_dir = "/root/testdata/sf0.001"
    root = str(tmp_path / "drain")
    got = (
        drained_term_counts(spark, sf_dir, root=root)
        .toPandas().sort_values("term").reset_index(drop=True)
    )

    committed = [
        f for f in os.listdir(f"{root}/ckpt/offsets") if not f.startswith(".")
    ]
    assert len(committed) >= 2, f"only micro-batches {committed} committed"

    halves = sorted(glob.glob(f"{root}/src/part-*.parquet"))
    assert len(halves) == 2
    # cross-batch evidence: the top term appears in BOTH halves, so its
    # final count cannot come from either batch alone
    top = got.iloc[got.n.idxmax()].term
    for h in halves:
        texts = pd.read_parquet(h).text.str.lower()
        assert texts.str.contains(top, regex=False).any(), (
            f"term {top!r} missing from {h} — split is not cross-batch"
        )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    want = (
        docs.select(
            F.explode(ws_word_array(F.lower(F.col("text")))).alias("term")
        )
        .groupBy("term")
        .agg(F.count("*").cast("bigint").alias("n"))
        .toPandas().sort_values("term").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)


def test_drained_tile_rollup_cross_batch_state(spark, tmp_path):
    """The geospatial drained gate: complete-mode per-tile aggregates over
    2 md5-parity micro-batches must (a) commit >= 2 offsets, (b) have at
    least one tile's mass split across the halves, and (c) equal the batch
    tile_rollup exactly."""
    import glob
    import os

    import pandas as pd

    from geocode_spark.operators.spatial import tile_rollup
    from geocode_spark.streaming.drained import drained_tile_rollup

    pts = spark.createDataFrame(
        pd.DataFrame(
            {
                "primary_key": [f"p{i:03d}" for i in range(80)],
                "x": [372000.0 + (i % 8) * 900.0 for i in range(80)],
                "y": [4392000.0 + (i // 8) * 700.0 for i in range(80)],
                "score": [float(80 + i % 20) for i in range(80)],
            }
        )
    )
    root = str(tmp_path / "drain")
    got = (
        drained_tile_rollup(spark, pts, root=root)
        .toPandas().sort_values(["tile_x", "tile_y"]).reset_index(drop=True)
    )

    committed = [
        f for f in os.listdir(f"{root}/ckpt/offsets") if not f.startswith(".")
    ]
    assert len(committed) >= 2, f"only micro-batches {committed} committed"

    halves = sorted(glob.glob(f"{root}/src/part-*.parquet"))
    assert len(halves) == 2
    tiles_per_half = [
        set(map(tuple, (pd.read_parquet(h)[["x", "y"]] // [1000.0, 1000.0])
                .astype(int).itertuples(index=False)))
        for h in halves
    ]
    assert tiles_per_half[0] & tiles_per_half[1], (
        "no tile spans both micro-batches — split is not cross-batch"
    )

    want = (
        tile_rollup(pts)
        .toPandas().sort_values(["tile_x", "tile_y"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[want.columns], want, check_dtype=False
    )


def test_drained_hll_cross_batch_registers(spark, tmp_path, monkeypatch):
    """The sketch drained gate: complete-mode register maintenance over 2
    VISITOR-DISJOINT micro-batches must (a) commit >= 2 offsets, (b) split
    every visitor wholly into one half (so the second batch alone cannot
    reproduce the registers), and (c) finish to exactly the batch
    hll_distinct(with_exact=False) relation."""
    import glob
    import os

    import pandas as pd

    from geocode_spark.streaming import drained as dr
    from geocode_spark.textops.sketch import hll_distinct

    # a small crawl log staged where drained_hll expects lineitem
    n, card = 4000, 900
    log = spark.range(0, n).selectExpr(
        "CASE WHEN (id DIV 900) % 2 = 0 THEN 'a' ELSE 'b' END AS segment",
        "concat('v', CAST(id % 900 AS STRING)) AS visitor",
    )
    sf_dir = str(tmp_path / "sf")
    os.makedirs(sf_dir)
    # drained_hll derives the log from lineitem via synthetic_crawl_log;
    # monkeypatch the derivation to use this test's log directly
    monkeypatch.setattr(
        "geocode_spark.textops.sketch.synthetic_crawl_log", lambda df: log
    )
    spark.range(0, 1).write.parquet(f"{sf_dir}/lineitem.parquet")

    root = str(tmp_path / "drain")
    got = (
        dr.drained_hll(spark, sf_dir, root=root)
        .toPandas().sort_values("segment").reset_index(drop=True)
    )

    committed = [
        f for f in os.listdir(f"{root}/ckpt/offsets") if not f.startswith(".")
    ]
    assert len(committed) >= 2, f"only micro-batches {committed} committed"

    halves = sorted(glob.glob(f"{root}/src/part-*.parquet"))
    assert len(halves) == 2
    v0, v1 = [set(pd.read_parquet(h).visitor) for h in halves]
    assert v0 and v1 and not (v0 & v1), (
        "visitors must split wholly: batch 2 alone must miss batch 1's "
        "registers"
    )

    want = (
        hll_distinct(log, with_exact=False)
        .toPandas().sort_values("segment").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[want.columns], want, check_dtype=False)
