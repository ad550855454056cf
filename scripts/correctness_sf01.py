#!/usr/bin/env python
"""Run the dedup/ANN/corpus family's oracle gate at sf0.1 (VERDICT r1 item 9).

The driver's own gate runs every query at sf0.01; this script repeats the
comparison for the similarity-sensitive family at the 10x corpus, where LSH
recall and banding behavior actually get exercised, and writes the results
to CORRECTNESS_SF01.json at the repo root.

Usage: PYTHONPATH=. python scripts/correctness_sf01.py
"""
import hashlib
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests"))

SF = "/root/testdata/sf0.1"
FAMILY = [
    "dedup_exact",
    "ngram_jaccard_pairs",
    "minhash_lsh_pairs",
    "simhash_signatures",
    "simhash_pairs",
    "ann_topk",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "embedding_near_dup",
    "dedup_clusters",
    "dedup_keep_best",
    "stratified_sample",
    "tfidf_top_terms",
    # round-3 extension (VERDICT r02 #9): the temporal / graph / corpus /
    # rollup families at the 10x corpus, where window partition sizes,
    # iteration counts and salting actually move
    "sessionize",
    "sessionize_salted",
    "session_stats",
    "asof_last_purchase",
    "asof_join_two_relation",
    "attribution_range_join",
    "event_window_rollup",
    "pagerank",
    "connected_components_chain",
    "connected_components_deep",
    "length_quantiles",
    "metrics_rollup",
    "metrics_by_grid_salted",
    # round-3 operators
    "ann_ivf_kmeans",
    "decontaminate",
    "contamination_score",
    "doc_repetition",
    "pii_redact",
    "domain_stats",
    "stream_sessionize_drained",
    "stream_attribution_drained",
    "stream_dedup_drained",
    # round-4 operators: corpus-assembly + LM / span-dedup / BPE families,
    # where window-duplication volume and vocab size move with the corpus
    "sequence_pack_greedy",
    "url_dedup",
    "mixture_sample",
    "strip_boilerplate",
    "epoch_shuffle",
    "bigram_lm_score",
    "bpe_pair_stats",
    "dsir_log_ratio",
    "span_dup_stats",
    "span_dedup_rewrite",
    "semdedup",
    # round-5 sixth-to-ninth waves: the 10x corpus exercises candidate
    # density (radius/map-match/crossings), posting-list asymmetry
    # (containment), and the triangle orientation bound
    "radius_join",
    "map_match",
    "triangle_counts",
    "containment_pairs",
    "pip_raycast",
    "segment_crossings",
    "cohort_retention",
    # round-6 extension (VERDICT r05 #6 + this round's touched operators):
    # the sketch layer joins, the winnow/anchor/co-citation corpus ops,
    # the packed iterative graphs, and the per-cell spatial kernels all
    # changed internals this round — the 10x corpus is where their hot
    # keys, pack guards and kernel chunking actually move
    "cms_term_counts",
    "hll_merge",
    "bloom_blocklist",
    "winnow_fingerprints",
    "winnow_candidate_pairs",
    "anchor_terms_topk",
    "co_citation_pairs",
    "hits_scores",
    "spatial_clusters",
    "convex_hull",
    "polyline_simplify",
    "dedup_weights",
    "trigram_lm_score",
    "perplexity_buckets",
    "rrf_fusion",
    "bpe_merge_steps",
    "bpe_encode_tokens",
    "tokenizer_fertility",
]


def vhash(pdf):
    from compare_util import _norm_cell, canonicalize

    c = canonicalize(pdf)
    h = hashlib.sha256()
    for col in c.columns:
        for v in c[col].tolist():
            h.update(repr(_norm_cell(v)).encode())
    return h.hexdigest()


def main():
    from pyspark.sql import SparkSession

    from compare_util import duck_to_pdf

    spark = (
        SparkSession.builder.master("local[16]")
        .appName("sf01-gate")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as mod

    # oracle_sql() renders fixture paths from ORACLE_SF_DIR at call time;
    # point it at the sf0.1 fixtures so the metrics/geocode-family oracles
    # read the same scale the Spark queries run at
    mod.ORACLE_SF_DIR = SF
    qs, osql = mod.queries(), mod.oracle_sql()
    out = {}
    for name in FAMILY:
        t0 = time.perf_counter()
        try:
            spdf = qs[name](spark, SF).toPandas()
            opdf = duck_to_pdf(osql[name], SF)
            out[name] = {
                "rows_match": len(spdf) == len(opdf),
                "schema_match": sorted(spdf.columns) == sorted(opdf.columns),
                "hash_match": vhash(spdf) == vhash(opdf),
                "spark_rows": len(spdf),
                "oracle_rows": len(opdf),
                "sec": round(time.perf_counter() - t0, 2),
                "err": None,
            }
        except Exception as e:
            out[name] = {"err": f"{type(e).__name__}: {str(e)[:300]}"}
        print(name, out[name], flush=True)
    with open(os.path.join(ROOT, "CORRECTNESS_SF01.json"), "w") as f:
        json.dump({"sf": 0.1, "family": out}, f, indent=2)
    bad = [k for k, v in out.items()
           if v.get("err") or not v.get("hash_match")]
    print("BAD:", bad)
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
