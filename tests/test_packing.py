"""Sequence packing + URL canonicalization edge cases.

The corpus-level differential gates live in the driver contract
(queries()/oracle_sql(): sequence_pack, sequence_pack_greedy, url_dedup);
these tests pin the hand-checkable semantics the hash gates can't express
directly: span arithmetic at chunk boundaries, greedy never-split/oversize
behavior, and each canonicalization rule on crafted URLs.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from geocode_spark.textops.packing import (
    canonical_url,
    sequence_pack,
    sequence_pack_greedy,
    url_dedup,
)


def _docs(spark, token_counts):
    """One doc per entry, doc_id = index, text with exactly n tokens."""
    rows = [(i, " ".join(["tok"] * n) if n else "") for i, n in
            enumerate(token_counts)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_sequence_pack_spans_chunk_boundaries(spark):
    # one shard, context 10: cum ends 4, 9, 12 — the third doc straddles
    # the 10-token boundary and spans chunks 0 and 1
    out = (
        sequence_pack(_docs(spark, [4, 5, 3]), context_len=10, n_shards=1)
        .orderBy("doc_id").collect()
    )
    assert [(r.tok_end, r.first_seq, r.last_seq, r.seqs_spanned)
            for r in out] == [(4, 0, 0, 1), (9, 0, 0, 1), (12, 0, 1, 2)]


def test_sequence_pack_zero_token_doc_spans_nothing(spark):
    out = (
        sequence_pack(_docs(spark, [10, 0, 3]), context_len=10, n_shards=1)
        .orderBy("doc_id").collect()
    )
    zero = out[1]
    assert zero.tok_count == 0 and zero.seqs_spanned == 0
    # insertion point: right at the start of chunk 1
    assert zero.first_seq == zero.last_seq == 1


def test_sequence_pack_exact_fit_stays_in_chunk(spark):
    out = (
        sequence_pack(_docs(spark, [10, 10]), context_len=10, n_shards=1)
        .orderBy("doc_id").collect()
    )
    # each doc fills exactly one chunk — no straddle
    assert [(r.first_seq, r.last_seq) for r in out] == [(0, 0), (1, 1)]


def test_greedy_never_splits_and_oversize_gets_own_sequence(spark):
    out = (
        sequence_pack_greedy(_docs(spark, [6, 6, 11, 2]), context_len=10,
                             n_shards=1)
        .orderBy("doc_id").collect()
    )
    # 6 fits; +6 overflows -> new seq; 11 oversize -> own seq (never split);
    # +2 after an 11-fill seq -> new seq
    assert [(r.seq_idx, r.seq_fill) for r in out] == [
        (0, 6), (1, 6), (2, 11), (3, 2)
    ]


def test_greedy_exact_fit_closes_at_boundary(spark):
    out = (
        sequence_pack_greedy(_docs(spark, [4, 6, 1]), context_len=10,
                             n_shards=1)
        .orderBy("doc_id").collect()
    )
    # 4+6 == 10 exactly fits; the next doc opens a new sequence
    assert [(r.seq_idx, r.seq_fill) for r in out] == [(0, 4), (0, 10), (1, 1)]


@pytest.mark.parametrize("raw,want", [
    # scheme+host case-fold, path case preserved
    ("HTTP://ExAmPle.COM/Path/X", "http://example.com/Path/X"),
    # default ports stripped (http:80, https:443), non-default kept
    ("http://h.com:80/a", "http://h.com/a"),
    ("https://h.com:443/a", "https://h.com/a"),
    ("http://h.com:8080/a", "http://h.com:8080/a"),
    # default port directly followed by query/fragment/end (no path) —
    # must strip the same as the '/'-followed shape or dedup forks
    ("http://h.com:80?q=1", "http://h.com?q=1"),
    ("https://h.com:443#frag", "https://h.com"),
    ("http://h.com:80", "http://h.com"),
    # fragment dropped
    ("http://h.com/a#sec-2", "http://h.com/a"),
    # tracking params: adjacent run after '?', real param survives
    ("http://h.com/a?utm_source=x&utm_medium=y", "http://h.com/a"),
    ("http://h.com/a?q=1&utm_source=x", "http://h.com/a?q=1"),
    ("http://h.com/a?utm_source=x&q=1", "http://h.com/a?q=1"),
    # trailing slash on non-root path; root slash kept
    ("http://h.com/a/b/", "http://h.com/a/b"),
    ("http://h.com/", "http://h.com/"),
    # everything at once
    ("HTTPS://H.com:443/a/b/?utm_source=x#frag", "https://h.com/a/b"),
])
def test_canonical_url_rules(spark, raw, want):
    from pyspark.sql import functions as F

    got = (
        spark.createDataFrame([(raw,)], "url string")
        .select(canonical_url("url").alias("c")).collect()[0]["c"]
    )
    assert got == want, raw


def test_mixture_sample_weighted(spark):
    from geocode_spark.textops.packing import mixture_sample

    # 100 docs of 10 tokens each per source; a and b present, c unweighted
    rows = []
    for i in range(300):
        rows.append((i, " ".join(["tok"] * 10), ["a", "b", "c"][i % 3]))
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = mixture_sample(
        docs, budget_tokens=600, weights_ppk={"a": 900, "b": 100}
    ).toPandas()
    by_src = out.groupby("source")["tok_count"].sum().to_dict()
    # source c has no weight -> excluded entirely
    assert "c" not in by_src
    # expected masses: a ~540 tokens, b ~60 — md5 bucketing is uniform so
    # allow a generous band; a must dominate b by roughly the weight ratio
    assert 300 <= by_src.get("a", 0) <= 800
    assert 0 <= by_src.get("b", 0) <= 200


def test_mixture_sample_deterministic(spark):
    from geocode_spark.textops.packing import mixture_sample

    rows = [(i, " ".join(["tok"] * 5), f"s{i % 4}") for i in range(200)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    a = sorted(r.doc_id for r in mixture_sample(docs, 250).collect())
    b = sorted(r.doc_id for r in mixture_sample(docs, 250).collect())
    assert a == b and len(a) > 0


def test_url_dedup_keeps_lowest_id(spark):
    rows = [
        (10, "http://h.com/a?utm_source=x"),
        (7, "HTTP://H.COM/a"),
        (3, "http://h.com/a#frag"),
        (5, "http://other.com/b"),
    ]
    out = {
        r.canonical: (r.keep_id, r.n_variants)
        for r in url_dedup(
            spark.createDataFrame(rows, "doc_id long, url string")
        ).collect()
    }
    assert out == {
        "http://h.com/a": (3, 3),
        "http://other.com/b": (5, 1),
    }


# ----------------------------------------------------------- url templates
def test_url_template_masking_rules(spark):
    from geocode_spark.textops.packing import url_template

    cases = {
        # hex collapses BEFORE digits (a 16-hex id must not shred)
        "http://a.com/s/deadbeef12345678": "a.com/s/{x}",
        # short hex-looking words stay literal
        "http://a.com/cafe/dead": "a.com/cafe/dead",
        # digits mask everywhere, including the host
        "http://shard7.a.com/p/123/x9": "shard{d}.a.com/p/{d}/x{d}",
        # query and fragment are dropped before masking
        "http://a.com/p/5?sess=ffffffffff#frag": "a.com/p/{d}",
        # an all-digit run of >= 8 is a valid hex run -> {x}
        "http://a.com/id/123456789": "a.com/id/{x}",
    }
    df = spark.createDataFrame(
        [(u,) for u in cases], "url string"
    ).select("url", url_template("url").alias("t"))
    got = {r.url: r.t for r in df.collect()}
    assert got == cases


def test_url_templates_trap_signals(spark):
    from geocode_spark.textops.packing import (
        synthetic_path_corpus,
        url_templates,
    )

    from pyspark.sql import functions as F

    docs = spark.range(0, 200).select(F.col("id").alias("doc_id"))
    rows = {r.template: r for r in
            url_templates(synthetic_path_corpus(docs)).collect()}
    assert len(rows) == 5
    trap = rows["site{d}.example.com/session/{x}"]
    # session-id mill: every page is a distinct URL
    assert trap.n_urls == trap.n_pages == 40
    asset = rows["site{d}.example.com/static/css/main.css"]
    # boilerplate re-fetch: 40 pages collapse to the 7 per-host URLs
    assert asset.n_pages == 40 and asset.n_urls == 7
