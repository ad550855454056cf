"""Packed (driver numpy) vs distributed-loop equivalence for the
iterative graph family (round-6 optimization): below the
SPARK_GRAFT_GRAPH_PACK_ROWS budget the fixed-point iterations run as
vectorized numpy over collected metadata-scale relations; the packed
results must be BIT-identical to the distributed loops' (same integer
arithmetic, same fixpoint), which stay the over-budget fallback."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master("local[4]")
        .appName("packed-graph-test")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture()
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _both_paths(monkeypatch, build):
    packed = _rows(build())
    # budget 0 forces every guard to the distributed loop
    monkeypatch.setenv("SPARK_GRAFT_GRAPH_PACK_ROWS", "0")
    loop = _rows(build())
    return packed, loop


def test_pagerank_packed_equals_loop(spark, docs, monkeypatch):
    from geocode_spark.operators.graph import pagerank

    packed, loop = _both_paths(monkeypatch, lambda: pagerank(docs))
    assert packed == loop and len(packed) == docs.count()


def test_hits_packed_equals_loop(spark, docs, monkeypatch):
    from geocode_spark.operators.graph import hits_scores

    packed, loop = _both_paths(monkeypatch, lambda: hits_scores(docs))
    assert packed == loop and len(packed) == docs.count()


def test_chain_components_packed_equals_loop(spark, docs, monkeypatch):
    from geocode_spark.operators.graph import chain_components

    packed, loop = _both_paths(monkeypatch, lambda: chain_components(docs))
    assert packed == loop


def test_deep_components_packed_equals_loop(spark, docs, monkeypatch):
    """cc_star: deep-tree parent values are NOT real doc ids — the packed
    universe must include them as connectors, exactly as the star
    contraction does (component labels can BE phantom ids)."""
    from geocode_spark.operators.graph import deep_components

    packed, loop = _both_paths(monkeypatch, lambda: deep_components(docs))
    assert packed == loop


def test_dedup_clusters_packed_equals_loop(spark, docs, monkeypatch):
    from geocode_spark.textops.corpusops import dedup_clusters
    from geocode_spark.textops.dedup import near_dup_corpus

    corpus = near_dup_corpus(docs)
    packed, loop = _both_paths(
        monkeypatch, lambda: dedup_clusters(corpus)
    )
    assert packed == loop
