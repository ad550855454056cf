#!/usr/bin/env python
"""spark-submit entry point: raw document corpus -> deduplicated training set.

    spark-submit --py-files geocode_spark.zip jobs/corpus_job.py \
        --documents /data/documents.parquet --output /data/corpus_out \
        [--threshold 0.8] [--sample] [--stats]

The canonical 100 TB dedup run, end to end:

  1. near-dup pair generation (MinHash + LSH band join, exact-Jaccard
     verification on candidates only) -> pairs/
  2. connected-component resolution over the pair graph -> clusters/
  3. canonical corpus = one survivor per cluster (min doc_id), optionally
     stratified-sampled per language -> canonical/
  4. optional corpus stats (per-language length quantiles) -> stats/

Every stage writes parquet under --output and the job prints ONE JSON
summary line (doc counts in/out, pair count, cluster count, wall time).
The pair relation is materialized once and feeds both reporting and
cluster resolution — the shape the engine's query surface mirrors.
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
    p.add_argument("--threshold", type=float, default=0.8,
                   help="Jaccard near-dup threshold")
    p.add_argument("--sample", action="store_true",
                   help="stratified-sample the canonical corpus per language")
    p.add_argument("--stats", action="store_true",
                   help="also write per-language length-quantile stats")
    p.add_argument("--batches", type=int, default=8,
                   help="resumable batch count for the canonical write")
    p.add_argument("--resume", action="store_true",
                   help="skip canonical batches already in the ledger")
    return p.parse_args(argv)


def main(argv=None) -> int:
    args = parse_args(argv)

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.appName("corpus-dedup-job")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")

    from pyspark.sql import functions as F

    from geocode_spark.textops.corpusops import (
        dedup_clusters,
        length_quantiles,
        stratified_sample,
    )
    from geocode_spark.textops.dedup import minhash_lsh_pairs

    t0 = time.perf_counter()
    docs = spark.read.parquet(args.documents)
    n_in = docs.count()

    pairs = minhash_lsh_pairs(docs, threshold=args.threshold).persist()
    pairs.write.mode("overwrite").parquet(f"{args.output}/pairs")
    n_pairs = pairs.count()

    clusters = dedup_clusters(docs, threshold=args.threshold, edges=pairs)
    clusters.write.mode("overwrite").parquet(f"{args.output}/clusters")

    canonical_ids = spark.read.parquet(f"{args.output}/clusters").filter(
        F.col("is_canonical") == 1
    ).select("doc_id")
    # No broadcast hint: canonical ids are nearly ALL docs in a typical
    # corpus, so forcing a broadcast (bypassing autoBroadcastJoinThreshold)
    # would ship a multi-hundred-MB relation to every executor. AQE picks
    # broadcast on its own when the landed clusters/ files are actually
    # small, and a co-partitioned shuffle join otherwise.
    canonical = docs.join(canonical_ids, "doc_id")
    if args.sample:
        kept = stratified_sample(canonical).select("doc_id")
        canonical = canonical.join(kept, "doc_id")
    # canonical write goes through the checkpoint-resumable batcher, with the
    # source STAGED bucket-aligned by the batch key first (the Iceberg
    # bucket(N, doc_id) analog): a resumed run prunes straight to the
    # pending batch directories instead of re-running the canonical join
    # and hash-filtering a full corpus scan
    from geocode_spark.batching import run_resumable_staged, stage_batched_source

    staged = f"{args.output}/canonical_staged"
    if not (args.resume and os.path.exists(f"{staged}/_SUCCESS")):
        stage_batched_source(
            spark, canonical, staged, n_batches=args.batches, key="doc_id"
        )
    run_resumable_staged(
        spark, staged, f"{args.output}/canonical",
        n_batches=args.batches, key="doc_id", resume=args.resume,
        log=lambda m: print(m, file=sys.stderr),
    )
    n_out = spark.read.parquet(f"{args.output}/canonical").count()

    n_clusters = None
    if args.stats:
        stats_in = (
            canonical
            if "n_chars" in canonical.columns
            else canonical.withColumn(
                "n_chars", F.length("text").cast("bigint")
            )
        )
        length_quantiles(stats_in).write.mode("overwrite").parquet(
            f"{args.output}/stats"
        )
    n_clusters = clusters.select("cluster_id").distinct().count()
    pairs.unpersist()

    print(json.dumps({
        "status": "ok",
        "docs_in": n_in,
        "near_dup_pairs": n_pairs,
        "clusters": n_clusters,
        "docs_out": n_out,
        "removed": n_in - n_out if not args.sample else None,
        "elapsed_sec": round(time.perf_counter() - t0, 2),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
