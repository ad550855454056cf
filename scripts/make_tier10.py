#!/usr/bin/env python
"""Derive a synthetic 10x tier (.scale/sf1.0) from /root/testdata/sf0.1.

Same derivation rules as scripts/scale_ladder.py's 5x tier (replica tag
token on documents, deterministic embedding jitter, key strides), with
REPLICAS=10 — a stand-in for the driver's own sf1.0 regeneration so
optimization work can measure heavy queries at the driver's escalated
scale. The geocode fixture side scales automatically off the dir name
(fixtures.sf_from_dir), exactly as at sf0.1.

Usage: PYTHONPATH=.:tests python scripts/make_tier10.py
"""
import os
import shutil
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

SRC = "/root/testdata/sf0.1"
TIER_DIR = os.path.join(ROOT, ".scale", "sf1.0")
REPLICAS = 10
KEY_STRIDE = 10_000_000


def build_tier(spark) -> str:
    from pyspark.sql import functions as F

    marker = os.path.join(TIER_DIR, "_TIER_OK")
    if os.path.exists(marker):
        return TIER_DIR
    if os.path.isdir(TIER_DIR):
        shutil.rmtree(TIER_DIR)
    os.makedirs(TIER_DIR, exist_ok=True)

    def consolidate(name):
        import pyarrow.dataset as ds
        import pyarrow.parquet as pq

        tmp = os.path.join(TIER_DIR, f"_tmp_{name}")
        final = os.path.join(TIER_DIR, f"{name}.parquet")
        table = ds.dataset(tmp, format="parquet").to_table()
        pq.write_table(table, final)
        shutil.rmtree(tmp)

    def replicate(df, key_cols, perturb):
        parts = []
        for k in range(REPLICAS):
            p = df
            for c in key_cols:
                p = p.withColumn(c, F.col(c) + F.lit(k * KEY_STRIDE))
            parts.append(perturb(p, k))
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    docs = spark.read.parquet(f"{SRC}/documents.parquet")

    def perturb_doc(p, k):
        if k == 0:
            return p
        p = p.withColumn("text", F.concat(F.lit(f"replica{k} "), F.col("text")))
        return p.withColumn("n_chars", F.length("text").cast("long"))

    replicate(docs, ["doc_id"], perturb_doc).repartition(8).write.mode(
        "overwrite"
    ).parquet(f"{TIER_DIR}/_tmp_documents")
    consolidate("documents")

    emb = spark.read.parquet(f"{SRC}/embeddings.parquet")

    def perturb_emb(p, k):
        if k == 0:
            return p
        jitter = F.transform(
            "embedding",
            lambda x, j: (
                x + ((F.lit(k * 31).cast("int") + j * 17) % 7 - 3).cast("float")
                * F.lit(0.001)
            ).cast("float"),
        )
        return p.withColumn("embedding", jitter)

    replicate(emb, ["vec_id"], perturb_emb).repartition(8).write.mode(
        "overwrite"
    ).parquet(f"{TIER_DIR}/_tmp_embeddings")
    consolidate("embeddings")

    events = spark.read.parquet(f"{SRC}/events.parquet")
    replicate(events, ["event_id", "user_id"], lambda p, k: p).repartition(
        8
    ).write.mode("overwrite").parquet(f"{TIER_DIR}/_tmp_events")
    consolidate("events")

    li = spark.read.parquet(f"{SRC}/lineitem.parquet")
    replicate(li, ["l_orderkey", "l_partkey"], lambda p, k: p).repartition(
        8
    ).write.mode("overwrite").parquet(f"{TIER_DIR}/_tmp_lineitem")
    consolidate("lineitem")

    with open(marker, "w") as fh:
        fh.write(f"replicas={REPLICAS} src={SRC}\n")
    return TIER_DIR


def main():
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[16]")
        .appName("make-tier10")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    print(build_tier(spark), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
