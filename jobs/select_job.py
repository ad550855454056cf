#!/usr/bin/env python
"""spark-submit entry point: curated corpus -> LM-selected training corpus.

    spark-submit --py-files geocode_spark.zip jobs/select_job.py \
        --documents /data/curated.parquet --output /data/selected_out \
        [--window 8] [--max-dup-ppk 500] [--nll-drop-ppk 100] \
        [--target-source src0] [--select-ppk 500] \
        [--batches 8] [--resume]

The model-based selection pass that runs AFTER quality/safety curation
(jobs/curation_job.py) and BEFORE packing (jobs/pack_job.py) — the
modern web-corpus recipe, end to end:

  1. span-level dedup rewrite (Lee et al. 2022) — cut every cross-doc
     duplicated W-word window from the text; drop docs that were mostly
     duplication (removed fraction > --max-dup-ppk/1000) or that were cut
     to nothing
  2. bigram-LM quality filter (CCNet-style) — score the REWRITTEN corpus
     under its own bigram model and drop the worst --nll-drop-ppk/1000
     tail by per-bigram NLL; the cutoff is a deterministic histogram
     threshold (no global sort), docs too short to score pass through
  3. DSIR selection (Xie et al. 2023) — keep the top --select-ppk/1000 of
     scored docs by target-domain vs corpus log-likelihood ratio per
     bigram (docs too short to score carry no signal and are dropped
     here)
  4. staged checkpoint-resumable write with the per-batch ledger +
     per-partition lineage (same machinery as the curation job)

Prints ONE JSON summary line: docs in/out and per-stage drop counts.
Every stage is a thin composition of the oracle-gated operators in
geocode_spark.textops.lm / .spans — the job adds orchestration (and the
two adjudicated, metadata-scale histogram collects) — not new scoring
semantics.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--documents", required=True,
                   help="parquet path with (doc_id, text, source, ...)")
    p.add_argument("--output", required=True, help="output run directory")
    p.add_argument("--window", type=int, default=8,
                   help="span-dedup window size in words")
    p.add_argument("--max-dup-ppk", type=int, default=500,
                   help="drop docs whose removed-word fraction exceeds "
                        "this (parts per thousand)")
    p.add_argument("--nll-drop-ppk", type=int, default=100,
                   help="drop the worst this-many-per-thousand of scored "
                        "docs by per-bigram NLL")
    p.add_argument("--target-source", default="src0",
                   help="source value defining the DSIR target domain")
    p.add_argument("--select-ppk", type=int, default=500,
                   help="keep the top this-many-per-thousand of scored "
                        "docs by per-bigram DSIR ratio")
    p.add_argument("--batches", type=int, default=8,
                   help="resumable batch count for the final write")
    p.add_argument("--resume", action="store_true",
                   help="skip batches already in the ledger")
    return p.parse_args(argv)


def main(argv=None) -> int:
    args = parse_args(argv)

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.appName("corpus-selection-job")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")

    from pyspark.sql import functions as F

    from geocode_spark.batching import run_resumable_staged, stage_batched_source
    from geocode_spark.textops.lm import (
        bigram_lm_score,
        dsir_log_ratio,
        int_keep_low_threshold,
    )
    from geocode_spark.textops.spans import span_dedup_rewrite

    t0 = time.perf_counter()
    docs = spark.read.parquet(args.documents)
    n_in = docs.count()

    # 1. span-dedup rewrite; drop mostly-duplicated and fully-cut docs.
    # persist: the rewrite feeds the survivor join AND two stage counts —
    # recomputing it would re-run the window-hash pipeline per consumer.
    rw = span_dedup_rewrite(docs, window=args.window).persist()
    keep_span = rw.filter(
        (F.col("n_words") > 0)
        & (F.col("n_removed") * 1000 <= args.max_dup_ppk * F.col("n_words"))
        & (F.col("n_removed") < F.col("n_words"))
    )
    cleaned = (
        docs.drop("text", "n_chars")
        .join(keep_span.select("doc_id", F.col("text_clean").alias("text")),
              "doc_id")
        .persist()
    )
    n_span_dropped = n_in - cleaned.count()

    # 2. CCNet-style tail filter on the rewritten corpus's own bigram LM.
    # The cutoff is a deterministic histogram quantile (0.1-nat bins) —
    # no global sort; unscorable docs (< 2 words) pass through.
    scored = bigram_lm_score(cleaned).persist()
    per_tok = scored.filter(F.col("n_bigrams") > 0).select(
        "doc_id",
        F.expr("nll_micro div n_bigrams").cast("bigint").alias("tok_nll"),
    )
    thr = int_keep_low_threshold(
        per_tok, "tok_nll", keep_ppk=1000 - args.nll_drop_ppk,
        bin_width=100_000,
    )
    keep_lm = (
        per_tok.filter(F.col("tok_nll") <= thr).select("doc_id")
        .unionByName(scored.filter(F.col("n_bigrams") == 0).select("doc_id"))
        if thr is not None else scored.select("doc_id")
    )
    lm_survivors = cleaned.join(keep_lm, "doc_id").persist()
    n_lm_dropped = n_in - n_span_dropped - lm_survivors.count()

    # 3. DSIR: keep the top tail by per-bigram target/corpus log-ratio
    # (negated column -> reuse the keep-low threshold); unscorable docs
    # carry no token signal and are dropped at selection.
    ratio = dsir_log_ratio(
        lm_survivors, target_source=args.target_source
    ).filter(F.col("n_bigrams") > 0).select(
        "doc_id",
        (-F.expr("ratio_micro div n_bigrams")).cast("bigint").alias("neg_r"),
    )
    rthr = int_keep_low_threshold(
        ratio, "neg_r", keep_ppk=args.select_ppk, bin_width=100_000
    )
    selected = (
        lm_survivors.join(
            ratio.filter(F.col("neg_r") <= rthr).select("doc_id"), "doc_id"
        )
        if rthr is not None
        else lm_survivors.limit(0)
    )

    # 4. staged, ledgered, resumable write
    staged = f"{args.output}/selected_staged"
    if not (args.resume and os.path.exists(f"{staged}/_SUCCESS")):
        stage_batched_source(
            spark, selected, staged, n_batches=args.batches, key="doc_id"
        )
    run_resumable_staged(
        spark, staged, f"{args.output}/selected",
        n_batches=args.batches, key="doc_id", resume=args.resume,
        log=lambda m: print(m, file=sys.stderr),
    )
    n_out = spark.read.parquet(f"{args.output}/selected").count()
    n_dsir_dropped = n_in - n_span_dropped - n_lm_dropped - n_out
    for rel in (rw, cleaned, scored, lm_survivors):
        rel.unpersist()

    print(json.dumps({
        "status": "ok",
        "docs_in": n_in,
        "span_dedup_dropped": n_span_dropped,
        "lm_tail_dropped": n_lm_dropped,
        "dsir_not_selected": n_dsir_dropped,
        "docs_out": n_out,
        "nll_threshold_micro": thr,
        "dsir_threshold_micro": None if rthr is None else -rthr,
        "elapsed_sec": round(time.perf_counter() - t0, 2),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
