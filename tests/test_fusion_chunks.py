"""Soft-dedup weights, RRF signal fusion, and overlapping chunking:
hand-built semantics pins and DuckDB oracle parity (the sf0.001 twin of
the driver gate)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from compare_util import assert_frames_match, duck_to_pdf

from geocode_spark.textops.corpusops import (
    RRF_K,
    dedup_weights,
    dedup_weights_oracle_sql,
    rrf_fusion,
    rrf_fusion_oracle_sql,
)
from geocode_spark.textops.packing import (
    chunk_overlap,
    chunk_overlap_oracle_sql,
)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


# --------------------------------------------------------- dedup weights

def test_dedup_weights_inverse_cluster_size(spark):
    # component {0,1,2} (chain edges) + singleton 3: members of the
    # 3-cluster each weigh 1_000_000 div 3 = 333333 (remainder NOT
    # redistributed — same weight per member is the semantics), the
    # singleton weighs the full million
    corpus = _docs(spark, [
        (0, "a", "x"), (1, "a", "x"), (2, "a", "x"), (3, "a", "y"),
    ]).select("doc_id", "text")
    edges = spark.createDataFrame([(0, 1), (1, 2)], "id_a long, id_b long")
    out = (
        dedup_weights(corpus, edges=edges)
        .toPandas().set_index("doc_id").sort_index()
    )
    assert list(out.cluster_id) == [0, 0, 0, 3]
    assert list(out.n_members) == [3, 3, 3, 1]
    assert list(out.weight_ppm) == [333333, 333333, 333333, 1000000]


def test_dedup_weights_oracle_parity_sf(spark):
    from __spark_entry__ import _corpus, _dup_pairs

    got = dedup_weights(
        _corpus(spark, SF_DIR), edges=_dup_pairs(spark, SF_DIR)
    ).toPandas()
    want = duck_to_pdf(dedup_weights_oracle_sql(), SF_DIR)
    assert (got.n_members > 1).any()  # effect size: injected dups cluster
    assert_frames_match(got, want, label="dedup_weights")


# ------------------------------------------------------------ RRF fusion

def test_rrf_rank_ties_and_unscored(spark):
    # three docs with >= 2 tokens and >= 3 tokens so all signals fire for
    # docs 0-2; doc 3 is a single token: no bigrams, no shingles,
    # n_grams_total 0 -> 0 signals, rrf_nano 0
    docs = _docs(spark, [
        (0, "a", "the cat sat on the mat"),
        (1, "a", "the cat sat on the mat"),   # exact dup: novelty 0
        (2, "a", "a b a b a b a b"),          # repetitive
        (3, "a", "solo"),
    ])
    out = rrf_fusion(docs).toPandas().set_index("doc_id").sort_index()
    assert list(out.n_signals) == [3, 3, 3, 0]
    assert out.loc[3].rrf_nano == 0
    # docs 0 and 1 are textually identical under the nll and repetition
    # signals -> tie (same rank, same contribution) there; doc 0 wins
    # novelty (first introducer) so its fused score is strictly higher
    assert out.loc[0].rrf_nano > out.loc[1].rrf_nano


def test_rrf_contribution_arithmetic(spark):
    # with distinct signal values, the best doc's per-signal contribution
    # is exactly 10^9 div (k + 1)
    docs = _docs(spark, [
        (0, "a", "u v w x y z q r s t"),
        (1, "a", "u u u u u u u u u u"),
    ])
    out = rrf_fusion(docs).toPandas().set_index("doc_id").sort_index()
    first = 1_000_000_000 // (RRF_K + 1)
    second = 1_000_000_000 // (RRF_K + 2)
    # doc 0: novel + non-repetitive -> rank 1 on novelty and repetition
    assert out.loc[0].rrf_nano >= 2 * first  # two rank-1 contributions
    assert out.loc[0].rrf_nano + out.loc[1].rrf_nano >= 3 * (first + second) - 3


def test_rrf_oracle_parity_sf(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    got = rrf_fusion(docs).toPandas()
    want = duck_to_pdf(rrf_fusion_oracle_sql(), SF_DIR)
    assert got.n_signals.max() == 3  # effect size: all signals fire
    assert got.rrf_nano.nunique() > 1
    assert_frames_match(got, want, label="rrf_fusion")


# -------------------------------------------------------- chunk overlap

def test_chunk_starts_cover_and_never_nest(spark):
    # n=10 size=4 stride=3: K = ceil(6/3) = 2 -> starts 1,4,7; chunks
    # (1-4)(4-7)(7-10) cover every token, last chunk full
    docs = _docs(spark, [(0, "a", "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10")])
    out = (
        chunk_overlap(docs, size=4, stride=3)
        .toPandas().sort_values("chunk_id").reset_index(drop=True)
    )
    assert list(out.start_tok) == [1, 4, 7]
    assert list(out.n_tokens) == [4, 4, 4]
    assert out.chunk_text[0] == "t1 t2 t3 t4"
    assert out.chunk_text[2] == "t7 t8 t9 t10"

    # n=5: one chunk suffices (K=0) — no contained trailing chunk
    docs2 = _docs(spark, [(0, "a", "t1 t2 t3 t4 t5")])
    out2 = chunk_overlap(docs2, size=8, stride=3).toPandas()
    assert len(out2) == 1 and out2.n_tokens[0] == 5

    # ragged tail: n=6 size=4 stride=3 -> starts 1,4; last chunk len 3
    docs3 = _docs(spark, [(0, "a", "t1 t2 t3 t4 t5 t6")])
    out3 = (
        chunk_overlap(docs3, size=4, stride=3)
        .toPandas().sort_values("chunk_id").reset_index(drop=True)
    )
    assert list(out3.n_tokens) == [4, 3]
    assert out3.chunk_text[1] == "t4 t5 t6"


def test_chunk_empty_doc_emits_nothing(spark):
    docs = _docs(spark, [(0, "a", "   "), (1, "a", "w")])
    out = chunk_overlap(docs).toPandas()
    assert list(out.doc_id) == [1]
    assert out.n_tokens[0] == 1 and out.chunk_text[0] == "w"


def test_chunk_oracle_parity_sf(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    got = chunk_overlap(docs).toPandas()
    want = duck_to_pdf(chunk_overlap_oracle_sql(), SF_DIR)
    assert (got.chunk_id > 0).any()  # effect size: multi-chunk docs exist
    assert_frames_match(got, want, label="chunk_overlap")
