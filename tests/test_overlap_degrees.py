"""Source-pair shingle overlap + link-graph degree histogram: semantics
pins and DuckDB oracle parity."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from compare_util import assert_frames_match, duck_to_pdf

from geocode_spark.operators.graph import (
    LINK_COEFFS,
    degree_histogram,
    degree_histogram_oracle_sql,
)
from geocode_spark.textops.corpusops import (
    source_overlap,
    source_overlap_oracle_sql,
)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


# --------------------------------------------------------- source overlap

def test_source_overlap_exact_jaccard(spark):
    # s1: {a b c, b c d}  s2: {b c d, c d e}  -> intersection {b c d} = 1,
    # union 3 -> 333333 ppm; s3 shares nothing -> no pair row
    docs = _docs(spark, [
        (0, "s1", "a b c d"),        # shingles: "a b c", "b c d"
        (1, "s2", "b c d e"),        # shingles: "b c d", "c d e"
        (2, "s3", "x y z"),
    ])
    out = source_overlap(docs).toPandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert (r.src_a, r.src_b) == ("s1", "s2")
    assert (r.n_a, r.n_b, r.n_common) == (2, 2, 1)
    assert r.jaccard_ppm == 333333


def test_source_overlap_dedups_within_source(spark):
    # duplicate shingles inside one source count once (set semantics)
    docs = _docs(spark, [
        (0, "s1", "a b c"),
        (1, "s1", "a b c"),
        (2, "s2", "a b c"),
    ])
    out = source_overlap(docs).toPandas()
    assert len(out) == 1
    assert out.iloc[0].jaccard_ppm == 1_000_000  # identical singleton sets


def test_source_overlap_oracle_parity_sf(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    got = source_overlap(docs).toPandas()
    want = duck_to_pdf(source_overlap_oracle_sql(), SF_DIR)
    assert len(got) > 1
    assert got.jaccard_ppm.nunique() > 1  # effect size
    assert_frames_match(got, want, label="source_overlap")


# ------------------------------------------------------- degree histogram

def test_degree_histogram_counts_and_zero_nodes(spark):
    n = 7
    docs = _docs(spark, [(i, "s", "t") for i in range(n)])
    out = degree_histogram(docs).toPandas()
    # mass conservation: every edge lands somewhere
    assert (out.in_degree * out.n_nodes).sum() == n * len(LINK_COEFFS)
    assert out.n_nodes.sum() == n  # every node counted exactly once
    # quadratic maps are many-to-one -> degree spread, including 0
    assert out.in_degree.min() == 0 and out.in_degree.max() > 1


def test_degree_histogram_oracle_parity_sf(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    got = degree_histogram(docs).toPandas()
    want = duck_to_pdf(degree_histogram_oracle_sql(), SF_DIR)
    assert len(got) > 2  # effect size: non-trivial distribution
    assert_frames_match(got, want, label="degree_histogram")
