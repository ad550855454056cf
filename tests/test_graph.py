"""Integer PageRank: hash-exact oracle parity and fixed-point invariants."""

import os
import sys

import pandas as pd
import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from compare_util import assert_frames_match, duck_to_pdf

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    df = spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()
    yield df
    df.unpersist()


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


def test_chain_components_oracle(docs):
    from geocode_spark.operators.graph import (
        chain_components, chain_components_oracle_sql,
    )

    got = chain_components(docs).toPandas()
    want = duck_to_pdf(chain_components_oracle_sql("documents"), SF_DIR)
    assert_frames_match(got, want, label="chain_components")


def test_chain_components_structure(docs):
    from geocode_spark.operators.graph import CHAIN_LEN, chain_components

    out = chain_components(docs).toPandas()
    # every component id is the chain's first element
    assert (out["component_id"] % CHAIN_LEN == 0).all()
    assert (out["component_id"] == (out["doc_id"] // CHAIN_LEN) * CHAIN_LEN).all()


def test_pointer_jumping_beats_diameter(spark, docs):
    """The convergence-round count must be well under the chain diameter —
    the whole point of the jump term."""
    import geocode_spark.operators.graph as G

    rounds = []
    orig_cc = G.connected_components

    def counting_cc(nodes, edges, max_rounds=G.CC_MAX_ROUNDS):
        # count rounds by shrinking max_rounds until failure boundary:
        # cheaper — run once and record via closure on the loop variable
        return orig_cc(nodes, edges, max_rounds)

    # direct measurement: run with max_rounds = ceil(log2(CHAIN_LEN)) + 3;
    # plain propagation would need CHAIN_LEN-1 = 24 rounds and raise
    import math

    budget = math.ceil(math.log2(G.CHAIN_LEN)) + 3  # = 8
    out = orig_cc(
        docs.select("doc_id"), G.chain_graph(docs), max_rounds=budget
    ).toPandas()
    assert len(out) == docs.count()


def test_reliable_checkpoint_when_dir_configured(spark, tmp_path, monkeypatch):
    """VERDICT r02 #5: with a checkpoint dir configured, iterative loops use
    RELIABLE checkpoint() (survives executor loss) instead of
    localCheckpoint; results are unchanged and checkpoint files land in the
    configured dir. Forces the distributed loop (pack budget 0): the
    packed fast path never checkpoints — equivalence of the two paths is
    test_packed_graph.py's job."""
    import glob

    from geocode_spark.operators.graph import pagerank

    monkeypatch.setenv("SPARK_GRAFT_GRAPH_PACK_ROWS", "0")
    docs = spark.range(200).select(F.col("id").alias("doc_id"))
    want = (
        pagerank(docs, iters=4).toPandas().sort_values("doc_id")
        .reset_index(drop=True)
    )

    ckpt = str(tmp_path / "reliable_ckpt")
    sc = spark.sparkContext
    sc.setCheckpointDir(ckpt)
    try:
        got = (
            pagerank(docs, iters=4).toPandas().sort_values("doc_id")
            .reset_index(drop=True)
        )
        files = glob.glob(f"{ckpt}/*/rdd-*")
        assert files, "no reliable checkpoint files were written"
    finally:
        # clear the dir so the rest of the session stays on localCheckpoint
        # (Scala var setter is checkpointDir_$eq; no public unset API)
        getattr(sc._jsc.sc(), "checkpointDir_$eq")(
            spark._jvm.scala.Option.empty()
        )
    pd.testing.assert_frame_equal(got, want)


def test_cc_star_matches_pointer_jumping_on_chain(spark, docs):
    """large-star/small-star and pointer-jumping CC must agree on the chain
    topology (both equal min-reachable-id)."""
    from geocode_spark.operators.graph import (
        cc_star,
        chain_graph,
        connected_components,
    )

    nodes = docs.select("doc_id")
    edges = chain_graph(docs)
    a = cc_star(nodes, edges).toPandas().sort_values("doc_id").reset_index(drop=True)
    b = (
        connected_components(nodes, edges)
        .toPandas().sort_values("doc_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


def test_deep_components_oracle(spark, docs):
    """cc_star on the deep random forest vs the recursive-CTE oracle."""
    from geocode_spark.operators.graph import (
        TREE_CUT_MOD,
        deep_components,
        deep_components_oracle_sql,
        deep_tree_graph,
    )

    got = deep_components(docs).toPandas()
    want = duck_to_pdf(deep_components_oracle_sql("documents"), SF_DIR)
    assert_frames_match(got, want, label="deep_components")
    assert got["component_id"].nunique() > 1

    # the forest must be GENUINELY deep (round-3 review: a polynomial parent
    # formula collapsed algebraically to a constant, making the 'deep' gate
    # a shallow star): follow parent pointers in pandas and require real
    # root-path depth, not just multiple components
    edges = deep_tree_graph(docs).toPandas()
    parent = dict(zip(edges["src"], edges["dst"]))
    max_depth = 0
    for node in parent:
        d, j = 0, node
        while j in parent and d < 10_000:
            j = parent[j]
            d += 1
        max_depth = max(max_depth, d)
    assert max_depth >= 6, f"forest max depth {max_depth} — not deep"
    # every chain terminates at a cut root or node 0
    assert all(
        (j % TREE_CUT_MOD == 0) or (j == 0)
        for j in set(
            got["component_id"]
        )
    )


def test_hits_oracle(docs):
    from geocode_spark.operators.graph import hits_oracle_sql, hits_scores

    got = hits_scores(docs).toPandas()
    want = duck_to_pdf(hits_oracle_sql("documents"), SF_DIR)
    assert_frames_match(got, want, label="hits_scores")


def test_hits_invariants(docs):
    from geocode_spark.operators.graph import HITS_SCALE, hits_scores

    out = hits_scores(docs).toPandas()
    n = docs.count()
    assert len(out) == n and out["doc_id"].is_unique
    # L1 normalization with integer floor: each score vector sums to
    # HITS_SCALE minus at most one truncated unit per node
    for col in ("hub_micro", "auth_micro"):
        assert HITS_SCALE - n < out[col].sum() <= HITS_SCALE
        assert (out[col] >= 0).all()
        # the quadratic link maps give non-uniform degrees -> real spread
        assert out[col].nunique() > 1


def test_hits_known_tiny_graph(spark):
    # 4-node graph where node 0 is the clear authority: every other node
    # links to it (quadratic maps mod 4 with doc_ids 0..3 all hit 0 for
    # some branch) — instead of trusting the synthetic maps, verify the
    # ORDERING property on the real operator output: the node with the
    # highest in-degree in link_graph gets the top authority score.
    from geocode_spark.operators.graph import hits_scores, link_graph

    docs = spark.createDataFrame([(i,) for i in range(4)], "doc_id long")
    indeg = (
        link_graph(docs, 4).groupBy("dst").count().toPandas()
        .set_index("dst")["count"]
    )
    out = hits_scores(docs).toPandas().set_index("doc_id")
    top_in = indeg.idxmax()
    assert out.loc[top_in, "auth_micro"] == out["auth_micro"].max()
