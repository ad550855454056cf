"""Integer PageRank: hash-exact oracle parity and fixed-point invariants."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from compare_util import assert_frames_match, duck_to_pdf

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()


def test_pagerank_oracle(docs):
    from geocode_spark.operators.graph import pagerank, pagerank_oracle_sql

    got = pagerank(docs).toPandas()
    want = duck_to_pdf(pagerank_oracle_sql("documents"), SF_DIR)
    assert_frames_match(got, want, label="pagerank")


def test_pagerank_invariants(docs):
    from geocode_spark.operators.graph import (
        BASE_RANK, LINK_COEFFS, pagerank,
    )

    out = pagerank(docs).toPandas()
    n = docs.count()
    assert len(out) == n and out["doc_id"].is_unique
    # integer floor division only leaks mass downward — total stays within
    # (teleport floor, initial mass]
    assert 0 < out["rank"].sum() <= n * BASE_RANK
    assert (out["rank"] > 0).all()
    # in-degree varies across the affine maps -> ranks are non-uniform
    assert out["rank"].nunique() > 1


def test_pagerank_iteration_zero_is_uniform(docs):
    from geocode_spark.operators.graph import BASE_RANK, pagerank

    out = pagerank(docs, iters=0).toPandas()
    assert (out["rank"] == BASE_RANK).all()
