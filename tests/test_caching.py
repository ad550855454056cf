"""Persist-lifecycle contract (round-3 verdict item #3).

Builder-local persists (shingle/signature relations that feed two branches
of one plan) and the entry module's cross-query memos are all session-scoped
caches with no release path of their own. __spark_entry__.clear_caches()
must release every one of them: after running the dedup/image/spatial query
families end-to-end and clearing, Spark's cache manager must be EMPTY — any
residue is an untracked persist leaking executor storage in a long-lived
session. (localCheckpoint RDDs are lineage truncation, not cache-manager
entries, and are out of scope here.)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _cache_manager(spark):
    return spark._jsparkSession.sharedState().cacheManager()


def test_clear_caches_releases_all_persisted_relations(spark, sf_dir):
    import __spark_entry__ as e

    qs = e.queries()
    # every query family that persists: dhash signatures, shingle relations
    # (jaccard / minhash / incremental / decontaminate), simhash signatures,
    # the entry memos (_PAIRS_CACHE via dedup_clusters, _SUCCESS_CACHE via
    # knn_cells)
    for name in (
        "image_hash_pairs",
        "ngram_jaccard_pairs",
        "minhash_lsh_pairs",
        "incremental_dedup",
        "decontaminate",
        "simhash_pairs",
        "dedup_clusters",
        "knn_cells",
    ):
        assert qs[name](spark, sf_dir).count() >= 0, name

    cm = _cache_manager(spark)
    assert not cm.isEmpty(), "sanity: the query run should have persisted"

    released = e.clear_caches()
    assert released > 0
    assert cm.isEmpty(), (
        "cache manager not empty after clear_caches() — an untracked "
        "persist() is leaking executor storage"
    )

    # the memos re-build lazily and the queries stay correct after a clear
    assert qs["knn_cells"](spark, sf_dir).count() >= 0
    e.clear_caches()
    assert cm.isEmpty()
