"""BM25 ranked retrieval + domain blocklist filter unit gates.

The oracle parity of both operators is pinned by test_entry_contract; these
tests pin the SEMANTICS on hand-built corpora — ranking monotonicity,
tie-breaks, no-match exclusion, and every suffix-match shape both ways
(including the label-boundary negative the synthetic frontier cannot
express).
"""
import math

import pytest

from geocode_spark.textops.corpusops import BM25_B, BM25_K1, bm25_topk
from geocode_spark.textops.packing import blocklist_filter


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _bm25_ref(tf, dl, n_docs, avgdl, df):
    idf = round(math.log((n_docs - df + 0.5) / (df + 0.5) + 1.0), 6)
    den = tf + BM25_K1 * (1.0 - BM25_B + BM25_B * (dl / avgdl))
    return int(round(idf * ((tf * (1.0 + BM25_K1)) / den) * 1000000.0, 0))


def test_bm25_ranking_and_exclusion(spark):
    # doc 0: 2x 'hash' in 4 tokens; doc 1: 1x 'hash' in 4; doc 2: no match
    docs = _docs(
        spark,
        [
            (0, "hash hash alpha beta"),
            (1, "hash alpha beta gamma"),
            (2, "alpha beta gamma delta"),
        ],
    )
    rows = bm25_topk(docs, query=("hash",), k=10).collect()
    assert [r.doc_id for r in rows] == [0, 1]  # doc 2 excluded, tf order
    assert [r.rank for r in rows] == [1, 2]
    avgdl = 4.0
    assert rows[0].score_micro == _bm25_ref(2, 4, 3, avgdl, 2)
    assert rows[1].score_micro == _bm25_ref(1, 4, 3, avgdl, 2)


def test_bm25_length_normalization_and_ties(spark):
    # same tf=1: the shorter doc must rank first; equal docs tie on doc_id
    docs = _docs(
        spark,
        [
            (7, "hash alpha"),
            (3, "hash alpha beta gamma delta epsilon"),
            (9, "hash alpha"),
        ],
    )
    rows = bm25_topk(docs, query=("hash",), k=2).collect()
    assert [r.doc_id for r in rows] == [7, 9]  # tie -> lowest doc_id
    assert rows[0].score_micro == rows[1].score_micro


def test_bm25_k_truncates(spark):
    docs = _docs(spark, [(i, "hash x") for i in range(6)])
    rows = bm25_topk(docs, query=("hash",), k=3).collect()
    assert [r.doc_id for r in rows] == [0, 1, 2]
    assert [r.rank for r in rows] == [1, 2, 3]


@pytest.mark.parametrize(
    "host,blocked",
    [
        ("example5.com", "example5.com"),  # exact
        ("www.example5.com", "example5.com"),  # 1-deep subdomain
        ("cdn.media.example5.com", "example5.com"),  # 2-deep subdomain
        ("media.example7.com", "media.example7.com"),  # mid-label entry
        ("notexample5.com", None),  # label boundary: NOT a suffix match
        ("example5.com.evil.org", None),  # blocked name not at the tail
        ("example50.com", None),  # prefix collision on the label
        ("EXAMPLE5.COM", "example5.com"),  # hosts are case-folded
    ],
)
def test_blocklist_suffix_shapes(spark, host, blocked):
    from geocode_spark.textops.packing import default_blocklist

    frontier = spark.createDataFrame(
        [(0, f"http://{host}/p/0")], "doc_id long, url string"
    )
    row = blocklist_filter(frontier, default_blocklist(spark)).collect()[0]
    assert row.blocked_domain == blocked
    assert row.keep == (1 if blocked is None else 0)


def test_blocklist_multi_hit_is_deterministic(spark):
    # both 'media.example7.com' and 'example7.com' listed -> min() wins
    bl = spark.createDataFrame(
        [("media.example7.com",), ("example7.com",)], "domain string"
    )
    frontier = spark.createDataFrame(
        [(0, "http://cdn.media.example7.com/x")], "doc_id long, url string"
    )
    row = blocklist_filter(frontier, bl).collect()[0]
    assert row.blocked_domain == "example7.com" and row.keep == 0


def test_domain_cap_deterministic_quota(spark):
    import hashlib

    from geocode_spark.textops.packing import domain_cap

    # 10 pages on one host, 2 on another
    rows = [(i, "http://hot.example.com/p/%d" % i) for i in range(10)]
    rows += [(100 + i, "http://cold.example.org/p/%d" % i) for i in range(2)]
    frontier = spark.createDataFrame(rows, "doc_id long, url string")
    got = domain_cap(frontier, k=3).collect()
    by_host = {}
    for r in got:
        by_host.setdefault(r.host, []).append(r)
    assert len(by_host["hot.example.com"]) == 3  # capped
    assert len(by_host["cold.example.org"]) == 2  # under quota, all kept
    # the survivors are exactly the 3 lowest md5(':cap') ranks — pinned
    # against an independent python recomputation
    exp = sorted(
        range(10), key=lambda d: hashlib.md5(f"{d}:cap".encode()).hexdigest()
    )[:3]
    assert sorted(r.doc_id for r in by_host["hot.example.com"]) == sorted(exp)
    # ranks are 1..n within each host
    assert sorted(r.rank for r in by_host["hot.example.com"]) == [1, 2, 3]


def test_domain_cap_parallelism_invariant(spark):
    from geocode_spark.textops.packing import domain_cap

    rows = [(i, f"http://h{i % 5}.example.com/p/{i}") for i in range(200)]
    frontier = spark.createDataFrame(rows, "doc_id long, url string")
    a = {(r.doc_id, r.rank)
         for r in domain_cap(frontier.repartition(1), k=4).collect()}
    b = {(r.doc_id, r.rank)
         for r in domain_cap(frontier.repartition(17), k=4).collect()}
    assert a == b and len(a) == 20
