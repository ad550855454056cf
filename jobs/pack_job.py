#!/usr/bin/env python
"""spark-submit entry point: curated corpus -> packed training shards.

    spark-submit --py-files geocode_spark.zip jobs/pack_job.py \
        --documents /data/curated.parquet --output /data/epoch0 \
        [--epoch 0] [--shards 8] [--context-len 256] \
        [--budget-tokens N] [--min-df 10]

The trainer handoff that runs AFTER curation (jobs/curation_job.py), one
invocation per training epoch:

  1. boilerplate strip — cross-document line dedup (strip_boilerplate);
     documents whose every line was boilerplate are dropped
  2. optional mixture sampling — uniform per-source token budget
     (mixture_sample) when --budget-tokens is given
  3. epoch shuffle — deterministic md5(epoch, doc_id) permutation into
     --shards shards (epoch_shuffle); same epoch -> byte-identical output
  4. greedy sequence packing — first-fit in SHUFFLED order within each
     shard, never splitting a document (sequence_pack_greedy with
     shard/order from step 3)
  5. shard write — parquet partitioned by shard, rows sorted by
     (seq_idx, shard_pos) within each shard so the trainer streams each
     file front-to-back; a manifest.json records per-shard doc/seq/token
     counts for the data loader

Prints ONE JSON summary line. Every stage is a thin composition of the
oracle-gated operators in geocode_spark.textops — the job adds
orchestration, not new semantics.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--documents", required=True,
                   help="parquet path with (doc_id, text, source, ...)")
    p.add_argument("--output", required=True, help="output run directory")
    p.add_argument("--epoch", type=int, default=0,
                   help="epoch number = shuffle seed")
    p.add_argument("--shards", type=int, default=8)
    p.add_argument("--context-len", type=int, default=256)
    p.add_argument("--budget-tokens", type=int, default=None,
                   help="if set, mixture-sample to this total token budget")
    p.add_argument("--min-df", type=int, default=10,
                   help="boilerplate threshold: line in >= min-df docs")
    return p.parse_args(argv)


def main(argv=None) -> int:
    args = parse_args(argv)

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.appName("sequence-pack-job")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")

    from pyspark.sql import functions as F

    from geocode_spark.textops.lineops import epoch_shuffle, strip_boilerplate
    from geocode_spark.textops.packing import mixture_sample, sequence_pack_greedy

    t0 = time.perf_counter()
    docs = spark.read.parquet(args.documents)
    n_in = docs.count()

    # 1. boilerplate strip; persist: feeds the sample/shuffle AND the final
    # text join — without it the explode+reassemble re-runs per consumer
    stripped = (
        strip_boilerplate(docs, min_df=args.min_df)
        .filter(F.length("clean_text") > 0)
        .persist()
    )
    try:
        clean = stripped.select("doc_id", F.col("clean_text").alias("text"))
        n_stripped = n_in - clean.count()

        # 2. optional mixture sampling on the CLEANED text (budgets must
        # count the tokens the trainer will actually see)
        n_sampled_out = 0
        if args.budget_tokens:
            src = docs.select("doc_id", "source") if "source" in docs.columns \
                else docs.select("doc_id", F.lit("all").alias("source"))
            kept = mixture_sample(
                clean.join(src, "doc_id"), budget_tokens=args.budget_tokens
            ).select("doc_id")
            clean = clean.join(kept, "doc_id")
            # summary must tie out: docs_in == boilerplate_only_dropped
            # + mixture_sampled_out + docs_packed (select_job asserts the
            # same stage accounting in its test); pre-sample count is
            # already known as n_in - n_stripped, so this costs one pass
            n_sampled_out = (n_in - n_stripped) - clean.count()

        # 3. deterministic epoch shuffle
        order = epoch_shuffle(clean, seed=args.epoch, n_shards=args.shards)

        # 4. greedy pack in shuffled order (shard/order from the shuffle)
        packed = sequence_pack_greedy(
            clean.join(order, "doc_id"),
            context_len=args.context_len,
            order_col="shard_pos",
            shard_col="shard",
        )

        # 5. shard write: one output partition per shard, trainer order
        out = (
            packed.join(order.select("doc_id", "shard_pos"), "doc_id")
            .join(clean, "doc_id")
            .repartition("shard")
            .sortWithinPartitions("shard", "seq_idx", "shard_pos")
        )
        out.write.mode("overwrite").partitionBy("shard").parquet(
            f"{args.output}/shards"
        )

        manifest_rows = (
            spark.read.parquet(f"{args.output}/shards")
            .groupBy("shard")
            .agg(
                F.count("*").alias("n_docs"),
                (F.max("seq_idx") + 1).alias("n_seqs"),
                F.sum("tok_count").alias("n_tokens"),
            )
            .orderBy("shard")
            .collect()  # adjudicated: n_shards rows
        )
        manifest = {
            "epoch": args.epoch,
            "context_len": args.context_len,
            "shards": [r.asDict() for r in manifest_rows],
        }
        with open(f"{args.output}/manifest.json", "w") as fh:
            json.dump(manifest, fh, indent=1)
    finally:
        stripped.unpersist()

    n_docs = sum(r["n_docs"] for r in manifest["shards"])
    print(json.dumps({
        "status": "ok",
        "docs_in": n_in,
        "boilerplate_only_dropped": n_stripped,
        "mixture_sampled_out": n_sampled_out,
        "docs_packed": n_docs,
        "sequences": sum(r["n_seqs"] for r in manifest["shards"]),
        "tokens": sum(r["n_tokens"] for r in manifest["shards"]),
        "elapsed_sec": round(time.perf_counter() - t0, 2),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
