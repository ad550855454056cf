#!/usr/bin/env python
"""spark-submit entry point: raw documents -> curated training corpus.

    spark-submit --py-files geocode_spark.zip jobs/curation_job.py \
        --documents /data/documents.parquet --output /data/curated_out \
        [--max-repetition 0.5] [--bench-mod 97] [--sample] \
        [--batches 8] [--resume]

The quality/safety curation pass that runs AFTER dedup (jobs/corpus_job.py)
and BEFORE training, end to end:

  1. benchmark decontamination — drop every doc sharing an n-gram with the
     held-out benchmark set (docs at doc_id % bench-mod, which are also
     themselves excluded from the corpus) -> the eval-contamination sweep
  2. repetition filter — drop docs whose intra-document repeated-n-gram
     ratio exceeds --max-repetition (Gopher-style boilerplate/spam rule)
  3. PII redaction — emails -> <EMAIL>, phones -> <PHONE>, with per-doc
     match counts kept as audit columns
  4. optional per-language stratified downsampling
  5. staged checkpoint-resumable write: the surviving corpus is first
     landed partitioned by the deterministic batch key (the Iceberg
     bucket-transform analog), then committed batch-by-batch with the
     per-batch ledger + per-partition lineage — a resumed run prunes
     straight to pending-batch files

Prints ONE JSON summary line: docs in/out and per-stage drop counts.
Every stage is a thin composition of the oracle-gated operators in
geocode_spark.textops — the job adds orchestration, not new semantics.
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
                   help="parquet path with (doc_id, text, lang, ...)")
    p.add_argument("--output", required=True, help="output run directory")
    p.add_argument("--bench-mod", type=int, default=97,
                   help="doc_id modulus selecting the held-out benchmark set")
    p.add_argument("--max-repetition", type=float, default=0.5,
                   help="drop docs with repetition_ratio above this")
    p.add_argument("--sample", action="store_true",
                   help="stratified-sample the surviving corpus per language")
    p.add_argument("--batches", type=int, default=8,
                   help="resumable batch count for the final write")
    p.add_argument("--resume", action="store_true",
                   help="skip batches already in the ledger")
    return p.parse_args(argv)


def main(argv=None) -> int:
    args = parse_args(argv)

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.appName("corpus-curation-job")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")

    from pyspark.sql import functions as F

    from geocode_spark.batching import run_resumable_staged, stage_batched_source
    from geocode_spark.textops.corpusops import (
        decontaminate,
        doc_repetition,
        stratified_sample,
    )
    from geocode_spark.textops.textstats import with_pii_columns

    t0 = time.perf_counter()
    docs = spark.read.parquet(args.documents)
    n_in = docs.count()

    # 1. decontamination (also excludes the benchmark docs themselves).
    # persist: the relation feeds the summary count AND the survivors join
    # — without it the n-gram overlap pipeline re-runs per consumer.
    decon = decontaminate(docs, bench_mod=args.bench_mod).persist()
    clean_ids = decon.filter(F.col("is_contaminated") == 0).select("doc_id")
    n_benchmark = docs.filter(F.col("doc_id") % args.bench_mod == 0).count()
    n_contaminated = decon.filter(F.col("is_contaminated") == 1).count()

    # 2. repetition filter (persisted for the same two-consumer reason)
    keep_rep = doc_repetition(docs).filter(
        F.col("repetition_ratio") <= args.max_repetition
    ).select("doc_id").persist()
    n_repetitive = (n_in - keep_rep.count())

    survivors = docs.join(clean_ids, "doc_id").join(keep_rep, "doc_id")

    # 3. PII redaction on the survivors — the SAME kernel as the
    # oracle-gated pii_redact query (textstats.with_pii_columns), so the
    # shipped corpus cannot drift from the gated semantics
    redacted = with_pii_columns(survivors)

    # 4. optional per-language downsampling
    if args.sample:
        kept = stratified_sample(redacted).select("doc_id")
        redacted = redacted.join(kept, "doc_id")

    # 5. staged, ledgered, resumable write
    staged = f"{args.output}/curated_staged"
    if not (args.resume and os.path.exists(f"{staged}/_SUCCESS")):
        stage_batched_source(
            spark, redacted, staged, n_batches=args.batches, key="doc_id"
        )
    run_resumable_staged(
        spark, staged, f"{args.output}/curated",
        n_batches=args.batches, key="doc_id", resume=args.resume,
        log=lambda m: print(m, file=sys.stderr),
    )
    n_out = spark.read.parquet(f"{args.output}/curated").count()
    decon.unpersist()
    keep_rep.unpersist()

    print(json.dumps({
        "status": "ok",
        "docs_in": n_in,
        "benchmark_held_out": n_benchmark,
        "contaminated_dropped": n_contaminated,
        "repetitive_dropped": n_repetitive,
        "docs_out": n_out,
        "elapsed_sec": round(time.perf_counter() - t0, 2),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
