#!/usr/bin/env python
"""Scale ladder: run the heavy query families at sf0.1 AND a synthetic 5x
tier (sf0.5), oracle-gated at both, recording per-query seconds — the
growth curve is the evidence behind the 100x-scale claims (round-3 verdict
item #6).

The sf0.5 tier is DERIVED deterministically from /root/testdata/sf0.1 (no
external data): documents/embeddings/events are replicated 5x with key
remapping and per-replica perturbation (replica tag token in text, +-1e-3
deterministic jitter on embeddings) so pair/ANN queries don't degenerate
into exact-clone blowups. The geocode-side fixtures (pages/locators) come
from the engine's own fixture generator, which scales purely off the tier
directory's name (fixtures.sf_from_dir) — a tier dir named `sf0.5` yields a
1,000,000-page corpus.

Usage: PYTHONPATH=.:tests python scripts/scale_ladder.py
Writes CORRECTNESS_SF05.json at the repo root.
"""
import json
import os
import shutil
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests"))

SRC = "/root/testdata/sf0.1"
TIER_DIR = os.path.join(ROOT, ".scale", "sf0.5")
REPLICAS = 5
KEY_STRIDE = 10_000_000  # replica key offset; >> any source id

# the families whose cost actually moves with state size / candidate volume
HEAVY = [
    "stream_sessionize_drained",
    "stream_attribution_drained",
    "stream_geocode_drained",
    "embedding_near_dup",
    "connected_components_deep",
    "minhash_lsh_pairs",
    "ngram_jaccard_pairs",
    "ann_lsh_topk",
    "pagerank",
    "sessionize_salted",
    # round-4 corpus-assembly families: explode/regex/Arrow-kernel cost all
    # move linearly with corpus volume
    "strip_boilerplate",
    "url_dedup",
    "mixture_sample",
    "sequence_pack_greedy",
    # LM / span-dedup families: the window/bigram relations are
    # corpus-token-sized, so their growth curve is the scale evidence
    "bigram_lm_score",
    "span_dup_stats",
    "span_dedup_rewrite",
    "dsir_log_ratio",
    "semdedup",
    "stream_dedup_drained",
    # round-4 review additions: cluster election rides the label-propagation
    # loop, graded contamination rides the shared shingle relation
    "dedup_keep_best",
    "contamination_score",
    # round-5 additions: winnow selection + pairs are gram-stream-sized,
    # the trigram model rides a corpus-token kernel pass, BPE encode joins
    # a vocab relation back to one corpus explode, frequent_terms' MG pass
    # streams every token, bm25 is a full scan + 1-row agg
    "winnow_fingerprints",
    "winnow_candidate_pairs",
    "trigram_lm_score",
    "bpe_encode_tokens",
    "frequent_terms",
    "bm25_topk",
    # round-5 session additions: rank fusion composes three corpus-sized
    # signal passes, the weights/fertility ops ride the propagation / BPE
    # loops, the overlap matrix is a shingle-keyed self-join, the index and
    # chunker are explode-heavy
    "rrf_fusion",
    "dedup_weights",
    "tokenizer_fertility",
    "source_overlap",
    "inverted_index",
    "chunk_overlap",
    # round-5 fourth wave: lexical diversity is a full (doc, token)
    # explode+agg, anchor terms join the 3N-edge relation against the
    # anchor projection, co-citation expands per-target in-link pairs —
    # all corpus- or graph-sized
    "lexical_diversity",
    "anchor_terms_topk",
    "co_citation_pairs",
    # round-5 fifth wave: the HLL register pass streams every token-row of
    # the crawl log, DP and hull are per-track Arrow kernels whose input
    # (the geocoded point relation) scales with the page corpus
    "hll_distinct",
    "polyline_simplify",
    "convex_hull",
    # round-5 sixth-to-eighth waves: the radius/map-match joins scale with
    # the geocoded point relation (candidate volume moves with density),
    # triangle counting with the edge relation, RAKE with the token stream,
    # and the trajectory ops with track count
    "radius_join",
    "map_match",
    "triangle_counts",
    "rake_keyphrases",
    "track_segments",
    # ninth wave: the containment join's posting lists and the PIP
    # candidate volume both move with corpus/point density
    # (segment_crossings is excluded: its OUTPUT is quadratic in segment
    # density, so the 5x tier's cost is output size, not operator shape)
    "containment_pairs",
    "pip_raycast",
]


def build_tier(spark) -> str:
    """Deterministically materialize the 5x tier; idempotent."""
    from pyspark.sql import functions as F

    marker = os.path.join(TIER_DIR, "_TIER_OK")
    if os.path.exists(marker):
        return TIER_DIR
    if os.path.isdir(TIER_DIR):
        shutil.rmtree(TIER_DIR)  # partial build from a crashed run
    os.makedirs(TIER_DIR, exist_ok=True)

    def consolidate(name):
        """Spark writes a part-file directory; the DuckDB oracle (and the
        driver's testdata layout) expects ONE parquet file per table — rewrite
        the directory into a single file of the same name."""
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
        # replica tag token shifts every shingle window: replicas are
        # related-but-not-identical, so dedup pairs stay non-degenerate
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

    # lineitem feeds the HLL crawl-log stand-in (hll_distinct): the key
    # stride multiplies the distinct-visitor cardinality (l_partkey) by
    # REPLICAS so the sketch stays in its raw-estimate regime at 5x
    li = spark.read.parquet(f"{SRC}/lineitem.parquet")
    replicate(li, ["l_orderkey", "l_partkey"], lambda p, k: p).repartition(
        8
    ).write.mode("overwrite").parquet(f"{TIER_DIR}/_tmp_lineitem")
    consolidate("lineitem")

    with open(marker, "w") as fh:
        fh.write(f"replicas={REPLICAS} src={SRC}\n")
    return TIER_DIR


def run_tier(spark, mod, sf_dir, names):
    from compare_util import duck_to_pdf, vhash

    mod.ORACLE_SF_DIR = sf_dir
    qs, osql = mod.queries(), mod.oracle_sql()
    out = {}
    for name in names:
        t0 = time.perf_counter()
        try:
            spdf = qs[name](spark, sf_dir).toPandas()
            sec = round(time.perf_counter() - t0, 2)
            opdf = duck_to_pdf(osql[name], sf_dir)
            out[name] = {
                "rows_match": len(spdf) == len(opdf),
                "schema_match": sorted(spdf.columns) == sorted(opdf.columns),
                "hash_match": vhash(spdf) == vhash(opdf),
                "spark_rows": len(spdf),
                "oracle_rows": len(opdf),
                "sec": sec,
                "err": None,
            }
        except Exception as e:
            out[name] = {"err": f"{type(e).__name__}: {str(e)[:300]}",
                         "sec": round(time.perf_counter() - t0, 2)}
        print(sf_dir.split("/")[-1], name, out[name], flush=True)
        mod.clear_caches()  # per-query storage release between heavy runs
    return out


def main():
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[16]")
        .appName("scale-ladder")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as mod

    build_tier(spark)
    tiers = {}
    tiers["sf0.1"] = run_tier(spark, mod, SRC, HEAVY)
    tiers["sf0.5"] = run_tier(spark, mod, TIER_DIR, HEAVY)

    growth = {}
    for name in HEAVY:
        a, b = tiers["sf0.1"].get(name, {}), tiers["sf0.5"].get(name, {})
        if a.get("sec") and b.get("sec") and not (a.get("err") or b.get("err")):
            growth[name] = {
                "sec_sf01": a["sec"],
                "sec_sf05": b["sec"],
                "time_ratio_at_5x_data": round(b["sec"] / a["sec"], 2),
            }
    result = {"replicas": REPLICAS, "tiers": tiers, "growth": growth}
    with open(os.path.join(ROOT, "CORRECTNESS_SF05.json"), "w") as f:
        json.dump(result, f, indent=1)
    bad = [
        f"{t}:{k}" for t, fam in tiers.items()
        for k, v in fam.items() if v.get("err") or not v.get("hash_match")
    ]
    print("BAD:", bad)
    print(json.dumps({"growth": growth}))
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
