"""Iterative graph analytics: PageRank over a deterministic document link
graph.

Web-corpus pipelines rank pages by link structure; this module shows the
engine's iterative-algorithm pattern with a HASH-EXACT oracle — normally
iterative float algorithms only get a weaker rows-only check, because
per-iteration float sums are fold-order dependent. Here every quantity is
int64 fixed-point (rank mass in nano-units, damping 85/100, integer
division): integer addition is associative, so any shuffle order, any
parallelism level, and DuckDB's serial evaluation produce byte-identical
ranks.

Scale shape: each iteration is one join (edges ⋈ ranks, both partitioned
by src/doc_id) + one groupBy(dst) + one left join back to the node frame —
the canonical distributed power iteration. Lineage is truncated with
truncate_lineage (localCheckpoint, or reliable checkpoint when a checkpoint
dir is configured — see lineage.py) every CHECKPOINT_EVERY iterations: past ~3 chained
iterations, Catalyst/AQE planning cost dominates the per-iteration compute
(measured 11.4 s fully-lazy vs ~3 s checkpointed for 10 iterations at test
scale), and at depth the un-truncated plan would grow without bound.

The link graph is synthesized deterministically from doc_ids (three
quadratic out-links per document) — fixed, many-to-one, identical in both
engines by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..lineage import truncate_lineage

BASE_RANK = 1_000_000_000  # initial mass per node, nano-units
DAMPING_NUM, DAMPING_DEN = 85, 100
# three quadratic out-links per node: dst = (a2*x^2 + a1*x + a0) mod N.
# affine maps with a1 coprime to N are permutations (uniform in-degree ->
# uniform PageRank, a degenerate test); quadratic maps are many-to-one, so
# in-degrees — and therefore ranks — vary.
LINK_COEFFS = ((0, 7, 1), (1, 3, 5), (3, 0, 11))
DEFAULT_ITERS = 10
CHECKPOINT_EVERY = 3
_TELEPORT = BASE_RANK * (DAMPING_DEN - DAMPING_NUM) // DAMPING_DEN


def link_graph(docs: DataFrame, n_docs: int) -> DataFrame:
    """Deterministic out-degree-3 link graph: quadratic maps mod N."""
    did = F.col("doc_id")
    return docs.select(
        did.alias("src"),
        F.explode(
            F.array(
                *[
                    ((did * did * a2 + did * a1 + a0) % n_docs).alias(f"l{i}")
                    for i, (a2, a1, a0) in enumerate(LINK_COEFFS)
                ]
            )
        ).alias("dst"),
    )


def _graph_pack_rows() -> int:
    """Row budget under which an iterative graph query collects its
    metadata-scale relations ONCE and runs the fixed-point iteration as
    vectorized numpy on the driver (~16 B/edge) — the size-guarded-pack
    discipline of the LM model packs (spans._broadcast_key_rows). At the
    gate scales the distributed loops spend their whole wall clock on
    per-round job/exchange/checkpoint latency (measured: hits_scores
    7.6 s for 8 rounds over a 5k-node graph, spatial_clusters 6.6 s for
    ~7 CC rounds over a few hundred dense cells); a graph that fits one
    machine is faster there, and one that does not falls back to the
    unchanged distributed loop. Every packed path replicates the loop's
    integer arithmetic exactly (int64 `div` on non-negative operands ==
    numpy //), so results are bit-identical either way — pinned by
    tests/test_packed_graph.py, which runs both paths."""
    import os

    return int(os.environ.get("SPARK_GRAFT_GRAPH_PACK_ROWS", "2000000"))


def _collect_edges_capped(edges: DataFrame, cap: int):
    """Two int64 arrays (first col, second col), or None when the edge
    set exceeds cap — limit(cap+1) bounds the driver transfer to the
    budget regardless of the true count; the caller falls back to the
    distributed loop on None."""
    import numpy as np

    pdf = edges.limit(cap + 1).toPandas()
    if len(pdf) > cap:
        return None
    return (
        pdf.iloc[:, 0].to_numpy(np.int64),
        pdf.iloc[:, 1].to_numpy(np.int64),
    )


def _collect_ids_capped(rel: DataFrame, cap: int):
    """One int64 array (first col), or None when the relation exceeds
    cap — the single-column sibling of _collect_edges_capped."""
    import numpy as np

    pdf = rel.limit(cap + 1).toPandas()
    if len(pdf) > cap:
        return None
    return pdf.iloc[:, 0].to_numpy(np.int64)


def _packed_min_labels(ids, src, dst):
    """Min-label pointer jumping over a packed undirected edge list:
    converges to min reachable id — the same fixpoint as the distributed
    propagation loops — in O(log diameter) vectorized rounds. `ids` must
    be sorted unique; edges must reference members of `ids`."""
    import numpy as np

    si = np.searchsorted(ids, src)
    di = np.searchsorted(ids, dst)
    lab = np.arange(len(ids), dtype=np.int64)
    while True:
        new = lab.copy()
        if len(si):
            np.minimum.at(new, di, lab[si])
            np.minimum.at(new, si, lab[di])
        new = np.minimum(new, new[new])
        if np.array_equal(new, lab):
            return ids[lab]
        lab = new


def pagerank(docs: DataFrame, iters: int = DEFAULT_ITERS) -> DataFrame:
    """Fixed-iteration integer PageRank; returns (doc_id, rank) in
    nano-units. out-degree is the constant len(LINK_COEFFS)."""
    n_docs = docs.count()  # control-flow scalar, not data movement
    out_deg = len(LINK_COEFFS)
    nodes = docs.select("doc_id")
    edges = link_graph(docs, n_docs)

    if n_docs <= _graph_pack_rows():
        packed = _collect_ids_capped(
            nodes.select("doc_id"), _graph_pack_rows()
        )
        if packed is not None:
            import numpy as np
            import pandas as pd

            ids = np.sort(packed)
            n = len(ids)
            # same synthesis as link_graph, on the packed id vector; a
            # dst that is not a real node id is dropped by the loop's
            # nodes left join each round — masked identically here
            srcs, dsts = [], []
            for a2, a1, a0 in LINK_COEFFS:
                d = (ids * ids * a2 + ids * a1 + a0) % n_docs
                srcs.append(ids)
                dsts.append(d)
            src = np.concatenate(srcs) if srcs else np.zeros(0, np.int64)
            dst = np.concatenate(dsts) if dsts else np.zeros(0, np.int64)
            pos = np.searchsorted(ids, dst)
            valid = (pos < n) & (ids[np.minimum(pos, n - 1)] == dst)
            si = np.searchsorted(ids, src[valid])
            di = pos[valid]
            rank = np.full(n, BASE_RANK, dtype=np.int64)
            for _ in range(iters):
                total = np.zeros(n, dtype=np.int64)
                np.add.at(total, di, rank[si] // out_deg)
                rank = _TELEPORT + (DAMPING_NUM * total) // DAMPING_DEN
            return docs.sparkSession.createDataFrame(
                pd.DataFrame({"doc_id": ids, "rank": rank}),
                schema="doc_id bigint, rank bigint",
            )

    ranks = nodes.withColumn("rank", F.lit(BASE_RANK).cast("bigint"))
    for i in range(iters):
        if i and i % CHECKPOINT_EVERY == 0:
            # truncate lineage: past ~3 chained iterations Catalyst/AQE
            # planning cost dominates the (tiny) per-iteration compute
            ranks = truncate_lineage(ranks)
        contrib = (
            edges.join(ranks, edges.src == ranks.doc_id)
            .select("dst", F.expr(f"rank div {out_deg}").alias("share"))
            .groupBy("dst")
            .agg(F.sum("share").alias("total"))
        )
        ranks = nodes.join(
            contrib, nodes.doc_id == contrib.dst, "left"
        ).select(
            "doc_id",
            (
                F.lit(_TELEPORT)
                + F.expr(
                    f"({DAMPING_NUM} * coalesce(total, 0))"
                    f" div {DAMPING_DEN}"
                )
            ).cast("bigint").alias("rank"),
        )
    return ranks


CC_MAX_ROUNDS = 40
CHAIN_LEN = 25


def chain_graph(docs: DataFrame) -> DataFrame:
    """Deterministic deep-topology edge set: doc i links to i+1 except at
    CHAIN_LEN boundaries — path components of length CHAIN_LEN, the
    worst case for naive min-propagation (diameter rounds) and the
    showcase for pointer jumping (log rounds)."""
    did = F.col("doc_id")
    e = docs.filter(did % CHAIN_LEN != CHAIN_LEN - 1).select(
        did.alias("src"), (did + 1).alias("dst")
    )
    # drop the edge off the last doc when N is not a CHAIN_LEN multiple
    return e.join(
        docs.select(F.col("doc_id").alias("dst")), "dst", "semi"
    ).select("src", "dst")


def connected_components(nodes: DataFrame, edges: DataFrame,
                         max_rounds: int = CC_MAX_ROUNDS) -> DataFrame:
    """Connected components via min-label propagation WITH pointer jumping:
    each round a node takes min(own label, neighbors' labels, label of its
    label). The jump term collapses label chains exponentially, so deep
    paths converge in O(log diameter) rounds instead of O(diameter) —
    the scale answer for non-star topologies that dedup_clusters' simple
    propagation (tuned for near-dup star clusters) doesn't need.

    nodes: (doc_id); edges: (src, dst), undirected semantics. Returns
    (doc_id, component_id) with component_id = min doc_id reachable.
    Per-round: one edge join + one label self-join + one agg, all keyed
    shuffles; one count action for the convergence check.

    Each round eagerly truncates lineage (lineage.truncate_lineage). persist()
    alone is NOT enough here: it caches execution but leaves the logical
    plan intact, and with four label references per round the plan tree
    grows exponentially until Catalyst itself OOMs planning round ~5.
    Checkpointing truncates lineage, keeping per-round planning O(1).
    """
    n_nodes = nodes.count()  # metadata-scale sizing action
    if n_nodes <= _graph_pack_rows():
        packed = _collect_edges_capped(
            edges.select("src", "dst"), _graph_pack_rows()
        )
        if packed is not None:
            import numpy as np
            import pandas as pd

            node_pdf = nodes.select("doc_id").limit(n_nodes + 1).toPandas()
            if len(node_pdf) <= n_nodes:
                ids = np.sort(node_pdf["doc_id"].to_numpy(np.int64))
                src, dst = packed
                # labels live on NODES only: an edge endpoint outside the
                # node set neither relays nor receives in the loop (its
                # row drops out of the label joins) — mask identically
                n = len(ids)
                ps = np.searchsorted(ids, src)
                pdst = np.searchsorted(ids, dst)
                ok = (
                    (ps < n) & (ids[np.minimum(ps, n - 1)] == src)
                    & (pdst < n) & (ids[np.minimum(pdst, n - 1)] == dst)
                )
                comp = _packed_min_labels(ids, src[ok], dst[ok])
                return nodes.sparkSession.createDataFrame(
                    pd.DataFrame({"doc_id": ids, "component_id": comp}),
                    schema="doc_id bigint, component_id bigint",
                )

    sym = truncate_lineage(
        edges.select("src", "dst").unionAll(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
    )
    labels = truncate_lineage(
        nodes.select(F.col("doc_id"), F.col("doc_id").alias("lab"))
    )
    for _ in range(max_rounds):
        nbr = (
            sym.join(labels, sym.src == labels.doc_id)
            .groupBy(F.col("dst").alias("doc_id"))
            .agg(F.min("lab").alias("nbr_lab"))
        )
        ptr = (
            labels.alias("a")
            .join(labels.alias("b"), F.col("a.lab") == F.col("b.doc_id"))
            .select(F.col("a.doc_id").alias("doc_id"),
                    F.col("b.lab").alias("ptr_lab"))
        )
        cand = F.least(
            F.col("lab"),
            F.coalesce("nbr_lab", "lab"),
            F.coalesce("ptr_lab", "lab"),
        )
        new_labels = truncate_lineage(
            labels.join(nbr, "doc_id", "left")
            .join(ptr, "doc_id", "left")
            .select(
                "doc_id",
                cand.alias("lab"),
                (cand < F.col("lab")).cast("int").alias("_chg"),
            )
        )
        changed = new_labels.agg(F.sum("_chg")).collect()[0][0] or 0
        labels = new_labels.select("doc_id", "lab")
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_rounds} rounds"
        )
    return labels.select("doc_id", F.col("lab").alias("component_id"))


def chain_components(docs: DataFrame) -> DataFrame:
    """Query form: components of the deterministic chain graph."""
    nodes = docs.select("doc_id")
    return connected_components(nodes, chain_graph(docs))


def chain_components_oracle_sql(source: str = "documents") -> str:
    return f"""
WITH RECURSIVE
nodes AS (SELECT doc_id FROM {source}),
e AS (
  SELECT doc_id AS src, doc_id + 1 AS dst FROM {source}
  WHERE doc_id % {CHAIN_LEN} != {CHAIN_LEN - 1}
    AND doc_id + 1 IN (SELECT doc_id FROM {source})
),
sym AS (
  SELECT src, dst FROM e UNION ALL SELECT dst, src FROM e
),
reach(doc_id, lab) AS (
  SELECT doc_id, doc_id FROM nodes
  UNION
  SELECT s.dst, r.lab FROM reach r JOIN sym s ON s.src = r.doc_id
)
SELECT doc_id, min(lab) AS component_id FROM reach GROUP BY doc_id
"""


def pagerank_oracle_sql(source: str = "documents",
                        iters: int = DEFAULT_ITERS) -> str:
    """Unrolled per-iteration CTEs — identical integer arithmetic, no
    recursive-CTE self-reference limits."""
    out_deg = len(LINK_COEFFS)
    links = " UNION ALL ".join(
        f"SELECT doc_id AS src,"
        f" (doc_id * doc_id * {a2} + doc_id * {a1} + {a0})"
        f" % (SELECT c FROM n) AS dst FROM {source}"
        for a2, a1, a0 in LINK_COEFFS
    )
    ctes = [
        f"n AS (SELECT count(*) AS c FROM {source})",
        f"nodes AS (SELECT doc_id FROM {source})",
        f"edges AS ({links})",
        f"iter0 AS (SELECT doc_id, CAST({BASE_RANK} AS BIGINT) AS rank"
        f" FROM nodes)",
    ]
    for k in range(iters):
        ctes.append(f"""iter{k + 1} AS (
  SELECT nd.doc_id,
         CAST({_TELEPORT} + ({DAMPING_NUM} * COALESCE(s.total, 0))
              // {DAMPING_DEN} AS BIGINT) AS rank
  FROM nodes nd LEFT JOIN (
    SELECT e.dst, SUM(p.rank // {out_deg}) AS total
    FROM iter{k} p JOIN edges e ON e.src = p.doc_id
    GROUP BY e.dst
  ) s ON s.dst = nd.doc_id
)""")
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT doc_id, rank FROM iter{iters}"
    )


# ---------------------------------------------------- large-star / small-star
# The two-operation alternating CC algorithm (Kiveris et al., "Connected
# Components in MapReduce and Beyond", SoCC'14): each round rewires edges
# toward per-neighborhood minima; converges to star graphs (every node
# pointing at its component's minimum) in O(log n) rounds with per-round
# cost O(|edges|) — no label relation is carried at all, which is the
# documented upgrade over pointer jumping for DEEP, high-degree topologies
# (corpusops.py:15-17 / PLANS.md): the edge set itself contracts, so hub
# nodes never accumulate a giant label neighborhood.
STAR_MAX_ROUNDS = 30


def _dedup_edges(e: DataFrame) -> DataFrame:
    return e.filter(F.col("u") != F.col("v")).distinct()


def _large_star(sym: DataFrame) -> DataFrame:
    """For each node u: connect every STRICTLY LARGER neighbor v to
    m = min(N(u) + {u}). sym must hold both directions of each edge."""
    m = sym.groupBy("u").agg(F.min("v").alias("mn"))
    m = m.select("u", F.least("mn", F.col("u")).alias("m"))
    return _dedup_edges(
        sym.filter(F.col("v") > F.col("u"))
        .join(m, "u")
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Orient each edge large->small, then connect every small neighbor
    (and u itself) to m = min of u's small neighborhood."""
    d = edges.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    ).filter(F.col("u") != F.col("v")).distinct()
    m = d.groupBy("u").agg(F.min("v").alias("m"))
    rewired = d.join(m, "u").select(F.col("v").alias("u"), F.col("m").alias("v"))
    self_edge = m.select("u", F.col("m").alias("v"))
    return _dedup_edges(rewired.unionAll(self_edge))


def _edge_fingerprint(edges: DataFrame) -> tuple:
    """Order-insensitive exact summary of an edge set for the convergence
    check: (count, sum of per-edge hashes). One metadata-scale row."""
    row = edges.agg(
        F.count(F.lit(1)).alias("n"),
        # decimal(38,0) accumulator: int64 hash sums overflow under ANSI
        F.coalesce(
            F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")), F.lit(0)
        ).alias("h"),
    ).collect()[0]
    return (row["n"], str(row["h"]))


def cc_star(nodes: DataFrame, edges: DataFrame,
            max_rounds: int = STAR_MAX_ROUNDS) -> DataFrame:
    """Connected components via alternating large-star/small-star edge
    contraction. nodes: (doc_id); edges: (src, dst) undirected semantics.
    Returns (doc_id, component_id), component_id = min reachable doc_id.

    Per round: two groupBy(min) + two joins over the CURRENT edge set (which
    only shrinks toward n_nodes star edges) — no carried label relation, no
    per-node neighborhood materialization beyond the aggregate. Lineage is
    truncated every round (see lineage.py; reliable checkpoint under a
    configured dir)."""
    n_nodes = nodes.count()  # metadata-scale sizing action
    if n_nodes <= _graph_pack_rows():
        packed = _collect_edges_capped(
            edges.select("src", "dst"), _graph_pack_rows()
        )
        if packed is not None:
            import numpy as np
            import pandas as pd

            node_pdf = nodes.select("doc_id").limit(n_nodes + 1).toPandas()
            if len(node_pdf) <= n_nodes:
                node_ids = node_pdf["doc_id"].to_numpy(np.int64)
                src, dst = packed
                # star contraction never joins against nodes until the
                # stitch, so edge endpoints OUTSIDE the node set fully
                # participate as connectors and the converged label can
                # BE such an id (deep-tree parents are hash values):
                # universe = nodes ∪ endpoints, output = nodes only
                ids = np.sort(
                    np.unique(np.concatenate([node_ids, src, dst]))
                )
                comp = _packed_min_labels(ids, src, dst)
                order = np.argsort(node_ids, kind="stable")
                sorted_nodes = node_ids[order]
                lab = comp[np.searchsorted(ids, sorted_nodes)]
                return nodes.sparkSession.createDataFrame(
                    pd.DataFrame({
                        "doc_id": sorted_nodes,
                        "component_id": np.minimum(lab, sorted_nodes),
                    }),
                    schema="doc_id bigint, component_id bigint",
                )

    e = truncate_lineage(
        _dedup_edges(
            edges.select(F.col("src").alias("u"), F.col("dst").alias("v"))
        )
    )
    fp = _edge_fingerprint(e)
    for _ in range(max_rounds):
        sym = e.unionAll(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        e = truncate_lineage(_small_star(_large_star(sym)))
        nfp = _edge_fingerprint(e)
        if nfp == fp:
            break
        fp = nfp
    else:
        raise RuntimeError(f"cc_star did not converge in {max_rounds} rounds")
    # converged: e is a star graph (child -> component min). Stitch
    # singletons back with label = own id.
    labels = e.groupBy(F.col("u").alias("doc_id")).agg(
        F.min("v").alias("lab")
    )
    return nodes.join(labels, "doc_id", "left").select(
        "doc_id",
        F.least(
            F.coalesce("lab", F.col("doc_id")), F.col("doc_id")
        ).alias("component_id"),
    )


# deterministic deep random forest: node i>0 takes parent
# ((i * KNUTH + 40503) mod MERSENNE) mod i — a multiplicative hash, NOT a
# polynomial in i (a polynomial p(i) mod i collapses algebraically to its
# constant term, degenerating the forest to a shallow star; round-3 review
# finding). The hash is uniform-ish in [0, i), giving expected root-path
# depth ~ln i (~8 levels at 5k nodes — pinned by test_graph). Roots at
# i % TREE_CUT_MOD == 0 cut the forest into ~n/TREE_CUT_MOD trees;
# component min == root by construction (parents are strictly smaller).
TREE_CUT_MOD = 101
TREE_HASH_A = 2654435761  # Knuth multiplicative constant
TREE_HASH_B = 40503
TREE_HASH_M = 2147483647  # 2^31 - 1


def deep_tree_graph(docs: DataFrame) -> DataFrame:
    did = F.col("doc_id")
    return docs.filter((did > 0) & (did % TREE_CUT_MOD != 0)).select(
        did.alias("src"),
        (
            (did * F.lit(TREE_HASH_A).cast("bigint") + F.lit(TREE_HASH_B))
            % TREE_HASH_M
            % did
        ).alias("dst"),
    )


def deep_components(docs: DataFrame) -> DataFrame:
    """Query form: large-star/small-star components of the deep random
    forest."""
    return cc_star(docs.select("doc_id"), deep_tree_graph(docs))


def deep_components_oracle_sql(source: str = "documents") -> str:
    return f"""
WITH RECURSIVE
nodes AS (SELECT doc_id FROM {source}),
e AS (
  SELECT doc_id AS child,
         ((doc_id * {TREE_HASH_A} + {TREE_HASH_B}) % {TREE_HASH_M}) % doc_id
           AS parent
  FROM {source}
  WHERE doc_id > 0 AND doc_id % {TREE_CUT_MOD} != 0
),
r(doc_id, cur) AS (
  SELECT doc_id, doc_id FROM nodes
  UNION ALL
  SELECT r.doc_id, e.parent FROM r JOIN e ON r.cur = e.child
)
SELECT doc_id, CAST(min(cur) AS BIGINT) AS component_id
FROM r GROUP BY doc_id
"""


# ------------------------------------------------------- HITS (Kleinberg 1999)
# Hubs & authorities over the same deterministic link graph as pagerank —
# the second classic link-analysis ranking a web-corpus pipeline runs
# (authority ~ "worth keeping/boosting", hub ~ "good link source" in crawl
# frontier scheduling). Same iterative discipline as pagerank: every
# quantity is int64 fixed-point so the per-node sums are exact integer
# addition (shuffle-order- and engine-independent), and the per-round
# L1 normalization is integer multiply-then-div — IDENTICAL in both
# dialects. Overflow bound: raw sums are <= N * HITS_SCALE, and the
# normalization multiplies by HITS_SCALE before dividing, so N must stay
# below 2^63 / HITS_SCALE^2 ≈ 9.2e6 nodes at the default scale; a larger
# graph lowers HITS_SCALE (or divides first) — the bound is asserted.
#
# Scale shape per round: two (edge ⋈ score) joins + two keyed groupBys +
# two metadata-scale scalar totals cross-joined broadcast — the transpose
# power iteration. Lineage truncated every CHECKPOINT_EVERY rounds (the
# pagerank precedent, measured there).
HITS_ITERS = 8
HITS_SCALE = 1_000_000  # micro-units

_HITS_MAX_NODES = (1 << 63) // (HITS_SCALE * HITS_SCALE)


def hits_scores(docs: DataFrame, iters: int = HITS_ITERS) -> DataFrame:
    """(doc_id, hub_micro, auth_micro): fixed-iteration integer HITS with
    per-round L1 normalization to HITS_SCALE total mass. Nodes without
    in-links (out-links) get authority (hub) 0; truncation makes each
    score vector sum to (HITS_SCALE - n_trunc] exactly once normalized."""
    n_docs = docs.count()  # control-flow scalar, not data movement
    assert n_docs < _HITS_MAX_NODES, "lower HITS_SCALE for this graph size"
    nodes = docs.select("doc_id")
    edges = link_graph(docs, n_docs)

    if n_docs <= _graph_pack_rows():
        packed = _collect_ids_capped(
            nodes.select("doc_id"), _graph_pack_rows()
        )
        if packed is not None:
            import numpy as np
            import pandas as pd

            node_ids = np.sort(packed)
            srcs, dsts = [], []
            for a2, a1, a0 in LINK_COEFFS:
                srcs.append(node_ids)
                dsts.append(
                    (node_ids * node_ids * a2 + node_ids * a1 + a0) % n_docs
                )
            src = np.concatenate(srcs)
            dst = np.concatenate(dsts)
            # araw/atot are keyed on dst BEFORE any node join, so a dst
            # value that is NOT a real node still accumulates authority
            # and counts in the round's total — the packed universe is
            # nodes ∪ dst values, with output restricted to nodes
            ids = np.sort(np.unique(np.concatenate([node_ids, dst])))
            n = len(ids)
            si = np.searchsorted(ids, src)
            di = np.searchsorted(ids, dst)
            is_node = np.zeros(n, dtype=bool)
            is_node[np.searchsorted(ids, node_ids)] = True
            hub = np.where(is_node, HITS_SCALE, 0).astype(np.int64)
            auth = np.zeros(n, dtype=np.int64)
            for _ in range(iters):
                ar = np.zeros(n, dtype=np.int64)
                np.add.at(ar, di, hub[si])
                atot = max(int(ar.sum()), 1)
                auth = (ar * HITS_SCALE) // atot
                hr = np.zeros(n, dtype=np.int64)
                np.add.at(hr, si, auth[di])
                htot = max(int(hr.sum()), 1)
                hub = (hr * HITS_SCALE) // htot
            at = np.searchsorted(ids, node_ids)
            return docs.sparkSession.createDataFrame(
                pd.DataFrame({
                    "doc_id": node_ids,
                    "hub_micro": hub[at],
                    "auth_micro": auth[at],
                }),
                schema="doc_id bigint, hub_micro bigint, auth_micro bigint",
            )

    # in-loop relations carry ONLY nodes with a nonzero raw score: a
    # zero-score node contributes nothing to the next propagation and
    # integer-divides to 0 anyway, so dropping it is value-identical to
    # the oracle's dense formulation — the full node frame is reattached
    # once at the end (coalesce 0), saving two node-frame joins per round
    hub = nodes.withColumn("hub", F.lit(HITS_SCALE).cast("bigint"))
    auth = None
    for i in range(iters):
        if i and i % CHECKPOINT_EVERY == 0:
            hub = truncate_lineage(hub)
        araw = (
            edges.join(hub, edges.src == hub.doc_id)
            .groupBy("dst")
            .agg(F.sum("hub").alias("ar"))
        )
        atot = araw.agg(F.sum("ar").alias("atot"))
        auth = araw.crossJoin(F.broadcast(atot)).select(
            F.col("dst").alias("doc_id"),
            F.expr(
                f"CAST((ar * {HITS_SCALE})"
                " div greatest(atot, 1) AS BIGINT)"
            ).alias("auth"),
        )
        hraw = (
            edges.join(auth, edges.dst == auth.doc_id)
            .groupBy("src")
            .agg(F.sum("auth").alias("hr"))
        )
        htot = hraw.agg(F.sum("hr").alias("htot"))
        hub = hraw.crossJoin(F.broadcast(htot)).select(
            F.col("src").alias("doc_id"),
            F.expr(
                f"CAST((hr * {HITS_SCALE})"
                " div greatest(htot, 1) AS BIGINT)"
            ).alias("hub"),
        )
    return (
        nodes.join(hub, "doc_id", "left")
        .join(auth, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("hub", F.lit(0)).cast("bigint").alias("hub_micro"),
            F.coalesce("auth", F.lit(0)).cast("bigint").alias("auth_micro"),
        )
    )


def hits_oracle_sql(source: str = "documents",
                    iters: int = HITS_ITERS) -> str:
    """Unrolled per-iteration CTEs — identical integer arithmetic (the
    pagerank_oracle_sql pattern)."""
    links = " UNION ALL ".join(
        f"SELECT doc_id AS src,"
        f" (doc_id * doc_id * {a2} + doc_id * {a1} + {a0})"
        f" % (SELECT c FROM n) AS dst FROM {source}"
        for a2, a1, a0 in LINK_COEFFS
    )
    # MATERIALIZED is required, not a hint: the unrolled body references
    # edges 2x and nodes 2x PER ITERATION (plus a scalar n subquery per
    # link branch) — inlined, DuckDB would re-open the parquet ~50-150
    # times concurrently and exhaust the process fd limit
    ctes = [
        f"n AS MATERIALIZED (SELECT count(*) AS c FROM {source})",
        f"nodes AS MATERIALIZED (SELECT doc_id FROM {source})",
        f"edges AS MATERIALIZED ({links})",
        f"hub0 AS (SELECT doc_id, CAST({HITS_SCALE} AS BIGINT) AS hub"
        f" FROM nodes)",
    ]
    # every per-iteration CTE is MATERIALIZED: araw{k}/hraw{k} are each
    # referenced TWICE (score join + total), so inlining would duplicate
    # the whole prior subtree 4x per iteration — 4^iters plan copies
    for k in range(iters):
        ctes.append(f"""araw{k} AS MATERIALIZED (
  SELECT e.dst, SUM(h.hub) AS ar
  FROM hub{k} h JOIN edges e ON e.src = h.doc_id GROUP BY e.dst
), atot{k} AS MATERIALIZED (SELECT SUM(ar) AS atot FROM araw{k}),
auth{k} AS MATERIALIZED (
  SELECT nd.doc_id,
         CAST((COALESCE(s.ar, 0) * {HITS_SCALE})
              // greatest(t.atot, 1) AS BIGINT) AS auth
  FROM nodes nd LEFT JOIN araw{k} s ON s.dst = nd.doc_id
  CROSS JOIN atot{k} t
), hraw{k} AS MATERIALIZED (
  SELECT e.src, SUM(a.auth) AS hr
  FROM auth{k} a JOIN edges e ON e.dst = a.doc_id GROUP BY e.src
), htot{k} AS MATERIALIZED (SELECT SUM(hr) AS htot FROM hraw{k}),
hub{k + 1} AS MATERIALIZED (
  SELECT nd.doc_id,
         CAST((COALESCE(s.hr, 0) * {HITS_SCALE})
              // greatest(t.htot, 1) AS BIGINT) AS hub
  FROM nodes nd LEFT JOIN hraw{k} s ON s.src = nd.doc_id
  CROSS JOIN htot{k} t
)""")
    last = iters - 1
    return (
        "WITH " + ",\n".join(ctes)
        + f"""
SELECT h.doc_id, h.hub AS hub_micro, a.auth AS auth_micro
FROM hub{iters} h JOIN auth{last} a USING (doc_id)"""
    )


# ----------------------------------------------------- degree distribution
def degree_histogram(docs: DataFrame) -> DataFrame:
    """(in_degree, n_nodes): the link graph's in-degree distribution — the
    first diagnostic a crawl-graph job reads (hub heaviness decides the
    skew strategy for every downstream graph op). Nodes no quadratic map
    hits count at in-degree 0.

    Scale shape: TWO keyed groupBys (dst, then in_degree) plus one keyed
    left join to reattach zero-in-degree nodes — never a corpus-wide
    window. The one driver action is the same metadata-scale count the
    rank loops use (the graph synthesis needs N for the mod)."""
    n_docs = docs.count()
    g = link_graph(docs.select("doc_id"), n_docs)
    indeg = g.groupBy(F.col("dst").alias("doc_id")).agg(
        F.count("*").cast("bigint").alias("d")
    )
    per_node = (
        docs.select("doc_id")
        .join(indeg, "doc_id", "left")
        .select(F.coalesce("d", F.lit(0)).cast("bigint").alias("in_degree"))
    )
    return per_node.groupBy("in_degree").agg(
        F.count("*").cast("bigint").alias("n_nodes")
    )


def degree_histogram_oracle_sql(source: str = "documents") -> str:
    """DuckDB twin over the same synthesized quadratic link graph."""
    links = " UNION ALL ".join(
        f"SELECT doc_id AS src,"
        f" (doc_id * doc_id * {a2} + doc_id * {a1} + {a0})"
        f" % (SELECT c FROM n) AS dst FROM {source}"
        for a2, a1, a0 in LINK_COEFFS
    )
    return f"""
WITH n AS (SELECT count(*) AS c FROM {source}),
edges AS ({links}),
indeg AS (SELECT dst AS doc_id, CAST(count(*) AS BIGINT) AS d
          FROM edges GROUP BY dst),
per_node AS (
  SELECT CAST(COALESCE(i.d, 0) AS BIGINT) AS in_degree
  FROM {source} s LEFT JOIN indeg i USING (doc_id)
)
SELECT in_degree, CAST(count(*) AS BIGINT) AS n_nodes
FROM per_node GROUP BY in_degree
"""


# ------------------------------------------------------ anchor-text top-k
# Per-target anchor-term aggregation: for every page, the terms linking
# pages use when referring to it — the classic web-corpus relevance signal
# (anchor text is the highest-precision description of a target page a
# crawl contains; search engines and LLM-curation pipelines both rank on
# it). Anchors here are the first ANCHOR_WORDS tokens of the linking
# page's text — the deterministic sandbox stand-in for real <a> text, over
# the same synthesized quadratic link graph every other graph op uses.
ANCHOR_WORDS = 2
ANCHOR_TOPK = 3


def anchor_terms_topk(docs: DataFrame, k: int = ANCHOR_TOPK) -> DataFrame:
    """(doc_id, term, n_refs, rank): the k most frequent anchor terms
    pointing at each linked-to page, ties broken lexicographically.

    Scale shape (100 TB): anchors are a bounded projection of the corpus
    (ANCHOR_WORDS tokens/page); the edge->anchor join is keyed on src, the
    count is a keyed (dst, term) groupBy with map-side partials, and the
    top-k window partitions on dst AFTER counting, so a hub page's window
    holds its distinct anchor vocabulary, not its raw in-link multiset.
    No broadcast of the corpus side, no Python, no global sort."""
    from pyspark.sql.window import Window

    from ..textops.textstats import ws_word_array

    n_docs = docs.count()  # control-flow scalar (graph synthesis mod N)
    edges = link_graph(docs.select("doc_id"), n_docs)
    anchors = docs.select(
        F.col("doc_id").alias("src"),
        F.explode(
            F.slice(ws_word_array(F.lower(F.col("text"))), 1, ANCHOR_WORDS)
        ).alias("term"),
    )
    counts = (
        edges.join(anchors, "src")
        .groupBy("dst", "term")
        .agg(F.count("*").cast("bigint").alias("n_refs"))
    )
    w = Window.partitionBy("dst").orderBy(
        F.col("n_refs").desc(), F.col("term").asc()
    )
    return (
        counts.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select(F.col("dst").alias("doc_id"), "term", "n_refs", "rank")
    )


def anchor_terms_topk_oracle_sql(source: str = "documents",
                                 k: int = ANCHOR_TOPK) -> str:
    """DuckDB twin: same link graph, same first-ANCHOR_WORDS anchor terms,
    same (count desc, term asc) row_number ranking."""
    from ..textops.textstats import ws_word_array_sql

    links = " UNION ALL ".join(
        f"SELECT doc_id AS src,"
        f" (doc_id * doc_id * {a2} + doc_id * {a1} + {a0})"
        f" % (SELECT c FROM n) AS dst FROM {source}"
        for a2, a1, a0 in LINK_COEFFS
    )
    toks = ws_word_array_sql("lower(text)")
    return f"""
WITH n AS (SELECT count(*) AS c FROM {source}),
edges AS ({links}),
anchors AS (
  SELECT doc_id AS src, unnest(({toks})[1:{ANCHOR_WORDS}]) AS term
  FROM {source}
),
counts AS (
  SELECT e.dst, a.term, CAST(count(*) AS BIGINT) AS n_refs
  FROM edges e JOIN anchors a ON a.src = e.src
  GROUP BY e.dst, a.term
),
ranked AS (
  SELECT dst, term, n_refs,
         CAST(row_number() OVER (PARTITION BY dst
              ORDER BY n_refs DESC, term ASC) AS BIGINT) AS rank
  FROM counts
)
SELECT dst AS doc_id, term, n_refs, rank FROM ranked WHERE rank <= {k}
"""


# ------------------------------------------------------- co-citation pairs
# Co-citation similarity (Small 1973): two pages are related when many
# OTHER pages link to both — the link-graph near-dup/mirror signal that
# needs no text at all. Pairs are expanded per TARGET from its sorted
# in-link array (the source_overlap in-array pattern), so the blowup is
# bounded by in-degree choose 2 per target, never a corpus self-join; hub
# targets (the skew class) are the documented salting candidate.
CO_CITE_MIN = 2


def co_citation_pairs(docs: DataFrame, min_common: int = CO_CITE_MIN) -> DataFrame:
    """(doc_a, doc_b, n_common): pairs of documents co-cited by at least
    `min_common` distinct linking pages, doc_a < doc_b."""
    n_docs = docs.count()  # control-flow scalar (graph synthesis mod N)
    edges = link_graph(docs.select("doc_id"), n_docs).distinct()
    per_dst = edges.groupBy("dst").agg(
        F.sort_array(F.collect_set("src")).alias("srcs")
    )
    pairs = per_dst.select(
        F.explode(
            F.expr(
                "flatten(transform(srcs, (a, i) ->"
                " transform(slice(srcs, i + 2, size(srcs) - i - 1),"
                " b -> struct(a AS doc_a, b AS doc_b))))"
            )
        ).alias("p")
    ).select("p.doc_a", "p.doc_b")
    return (
        pairs.groupBy("doc_a", "doc_b")
        .agg(F.count("*").cast("bigint").alias("n_common"))
        .filter(F.col("n_common") >= min_common)
    )


def co_citation_oracle_sql(source: str = "documents",
                           min_common: int = CO_CITE_MIN) -> str:
    """DuckDB twin: the naive relational self-join formulation (the ground
    truth the in-array expansion must reproduce)."""
    links = " UNION ALL ".join(
        f"SELECT doc_id AS src,"
        f" (doc_id * doc_id * {a2} + doc_id * {a1} + {a0})"
        f" % (SELECT c FROM n) AS dst FROM {source}"
        for a2, a1, a0 in LINK_COEFFS
    )
    return f"""
WITH n AS (SELECT count(*) AS c FROM {source}),
edges AS (SELECT DISTINCT src, dst FROM ({links})),
pairs AS (
  SELECT e1.src AS doc_a, e2.src AS doc_b
  FROM edges e1 JOIN edges e2
    ON e1.dst = e2.dst AND e1.src < e2.src
)
SELECT doc_a, doc_b, CAST(count(*) AS BIGINT) AS n_common
FROM pairs GROUP BY doc_a, doc_b
HAVING count(*) >= {min_common}
"""


# ------------------------------------------------------- triangle counting
# Per-node triangle counts over the undirected link graph — the clustering
# primitive behind spam-farm detection and community cohesion scores on web
# graphs. Scale shape: the degree-ordered orientation (each undirected edge
# kept only from its lower-(degree, id) endpoint) bounds every node's
# oriented out-degree by O(sqrt(|E|)), so the wedge join — the quadratic
# step — is O(|E|^1.5) worst-case instead of sum(deg^2) with hub blowup
# (the standard MapReduce triangle trick). Every join is keyed (wedge pivot
# u, then the closing (v1, v2) pair); nothing is broadcast-sized-dependent.
# The triangle SET is orientation-invariant, so the DuckDB twin enumerates
# with the simpler a < b < c id-order and must agree row-for-row.


def triangle_counts(docs: DataFrame) -> DataFrame:
    """(doc_id, triangles): number of triangles each node participates in,
    over the symmetrized deterministic link graph (0 for none)."""
    n_docs = docs.count()  # control-flow scalar
    e = link_graph(docs, n_docs).filter(F.col("src") != F.col("dst"))
    sym = e.select("src", "dst").union(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    deg = sym.groupBy("src").agg(F.count("*").cast("bigint").alias("deg"))
    oriented = (
        sym.join(deg.select(F.col("src"), F.col("deg").alias("du")), "src")
        .join(
            deg.select(F.col("src").alias("dst"), F.col("deg").alias("dv")),
            "dst",
        )
        .filter(
            (F.col("du") < F.col("dv"))
            | ((F.col("du") == F.col("dv")) & (F.col("src") < F.col("dst")))
        )
        .select(
            F.col("src").alias("u"), F.col("dst").alias("v"), F.col("dv"),
        )
    )
    from ..caching import persist_tracked

    # three consumers below (both wedge legs + the closing-edge probe);
    # without the persist each re-derives the union+distinct+degree joins
    oriented = persist_tracked(oriented)
    e1 = oriented.select("u", F.col("v").alias("v1"), F.col("dv").alias("d1"))
    e2 = oriented.select("u", F.col("v").alias("v2"), F.col("dv").alias("d2"))
    wedges = e1.join(e2, "u").filter(
        (F.col("d1") < F.col("d2"))
        | ((F.col("d1") == F.col("d2")) & (F.col("v1") < F.col("v2")))
    )
    closing = oriented.select(
        F.col("u").alias("v1"), F.col("v").alias("v2")
    )
    tris = wedges.join(closing, ["v1", "v2"]).select("u", "v1", "v2")
    corners = tris.select(
        F.explode(F.array("u", "v1", "v2")).alias("doc_id")
    )
    counts = corners.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("t")
    )
    return docs.select("doc_id").join(counts, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("t"), F.lit(0)).cast("bigint").alias("triangles"),
    )


def triangle_counts_oracle_sql(source: str = "documents") -> str:
    """DuckDB twin: id-ordered (a < b < c) enumeration over the same
    symmetrized edge set — orientation-invariant, so it matches the
    engine's degree-ordered enumeration exactly."""
    links = " UNION ALL ".join(
        f"SELECT doc_id AS src,"
        f" (doc_id * doc_id * {a2} + doc_id * {a1} + {a0})"
        f" % (SELECT c FROM n) AS dst FROM {source}"
        for a2, a1, a0 in LINK_COEFFS
    )
    return f"""
WITH n AS (SELECT count(*) AS c FROM {source}),
edges AS ({links}),
und AS (
  SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
  FROM edges WHERE src <> dst
),
tri AS (
  SELECT e1.u AS a, e1.v AS b, e2.v AS c
  FROM und e1
  JOIN und e2 ON e2.u = e1.v
  JOIN und e3 ON e3.u = e1.u AND e3.v = e2.v
),
corners AS (
  SELECT unnest([a, b, c]) AS doc_id FROM tri
)
SELECT d.doc_id,
       CAST(COALESCE(t.t, 0) AS BIGINT) AS triangles
FROM {source} d
LEFT JOIN (SELECT doc_id, count(*) AS t FROM corners GROUP BY doc_id) t
  USING (doc_id)"""
