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


def pagerank(docs: DataFrame, iters: int = DEFAULT_ITERS) -> DataFrame:
    """Fixed-iteration integer PageRank; returns (doc_id, rank) in
    nano-units. out-degree is the constant len(LINK_COEFFS)."""
    n_docs = docs.count()  # control-flow scalar, not data movement
    out_deg = len(LINK_COEFFS)
    nodes = docs.select("doc_id")
    edges = link_graph(docs, n_docs)

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
