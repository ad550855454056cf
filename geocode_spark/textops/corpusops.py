"""Corpus-level training-data operators: duplicate-cluster resolution,
deterministic stratified sampling, TF-IDF keyword extraction.

These close the loop on the dedup family: pair generation (dedup.py) finds
near-duplicate EDGES; `dedup_clusters` resolves them into connected
components and elects one canonical document per cluster — the step an
actual 100 TB dedup run ships (you keep canonicals, drop the rest).

Scale shapes:
 - dedup_clusters: iterative min-label propagation over the (tiny, sparse)
   duplicate-edge relation. Each round is one join + one groupBy on the
   EDGE relation, never on the corpus; rounds needed = component diameter
   (near-dup clusters are stars around an original — 2-4 rounds in
   practice, hard cap asserts convergence). At 10^12 docs the same loop
   runs with edges bucketed by src; the large-star/small-star variant
   (Kiveris et al., "Connected Components in MapReduce") is the drop-in
   upgrade if components ever get deep — same per-round plan shape.
 - stratified_sample: map-only (zero shuffle) — the keep decision is a
   deterministic per-row hash test, so the sample is reproducible across
   runs, parallelism levels, and engines (md5-based, not partition-seeded
   rand() which would break the two-cluster-size invariant).
 - tfidf_top_terms: explode -> (doc,term) count -> vocabulary-sized
   doc-frequency relation joined back (broadcast when the vocab fits,
   AQE decides) -> per-doc top-k window. The df relation is |vocab|,
   orders of magnitude smaller than the token stream.

Float discipline: idf is rounded to 6 dp BEFORE the tf multiply and the
score rounded again — a 1-ulp ln() divergence between Java Math.log and
libm cannot survive two roundings at 6 dp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..caching import persist_tracked
from ..lineage import truncate_lineage

from .dedup import corpus_sql, minhash_lsh_pairs, ngram_jaccard_oracle_sql

MAX_CC_ROUNDS = 20
# per-mille keep rates by language: downsample the dominant language,
# keep the tails — the classic training-mix rebalance
SAMPLE_RATE_PERMILLE = {"en": 250}
SAMPLE_RATE_DEFAULT = 750


# ------------------------------------------------------------- dedup clusters
def dedup_clusters(corpus: DataFrame, threshold: float = 0.8,
                   edges: DataFrame | None = None) -> DataFrame:
    """Connected components over the near-duplicate pair graph.

    cluster_id = min doc_id in the component (the canonical survivor).
    Every corpus doc appears exactly once; singletons are their own
    cluster. Deterministic: label propagation over min() converges to the
    same fixpoint regardless of execution order.

    Pass `edges` (id_a, id_b) to reuse an already-materialized pair
    relation — the pipeline norm, since a dedup run computes pairs once and
    feeds both reporting and cluster resolution from the same table.
    """
    if edges is None:
        edges = minhash_lsh_pairs(corpus, threshold=threshold)
    edges = edges.select("id_a", "id_b")

    from ..operators.graph import _collect_edges_capped, _graph_pack_rows

    # near-dup pair graphs are metadata-scale (edge-touched nodes only —
    # singletons never enter); below the pack budget the min-label
    # fixpoint runs as one vectorized pass on the collected pair list
    # instead of per-round Spark jobs, stitched back by the SAME final
    # corpus join (graph._graph_pack_rows has the discipline note; the
    # distributed loop below is the over-budget fallback)
    packed = _collect_edges_capped(edges, _graph_pack_rows())
    if packed is not None:
        import numpy as np
        import pandas as pd

        from ..operators.graph import _packed_min_labels

        src, dst = packed
        ids = np.sort(np.unique(np.concatenate([src, dst])))
        comp = _packed_min_labels(ids, src, dst)
        labels = corpus.sparkSession.createDataFrame(
            pd.DataFrame({"doc_id": ids, "lab": comp}),
            schema="doc_id bigint, lab bigint",
        )
        return (
            corpus.select("doc_id")
            .join(labels, "doc_id", "left")
            .select(
                "doc_id",
                F.coalesce("lab", "doc_id").alias("cluster_id"),
                (F.col("doc_id") == F.coalesce("lab", "doc_id"))
                .cast("int")
                .alias("is_canonical"),
            )
        )

    sym = edges.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    ).unionAll(edges.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst")))
    sym = sym.persist()

    # propagate only over edge-touched nodes: singletons (the overwhelming
    # majority of a web corpus) never enter the loop and are stitched back
    # with label = own id at the end — per-iteration work is O(|edges|),
    # independent of corpus size
    # truncate_lineage, not persist: persist caches execution but leaves the
    # logical plan growing (labels referenced multiple times per round) —
    # lineage truncation keeps per-round planning O(1) at any depth (see
    # operators/graph.connected_components for the measured failure mode;
    # lineage.py picks reliable checkpoint when a checkpoint dir is set)
    labels = truncate_lineage(
        sym.select(F.col("src").alias("doc_id"))
        .distinct()
        .withColumn("lab", F.col("doc_id"))
    )
    for _ in range(MAX_CC_ROUNDS):
        nbr = (
            sym.join(labels, sym.src == labels.doc_id)
            .groupBy(F.col("dst").alias("doc_id"))
            .agg(F.min("lab").alias("nbr_lab"))
        )
        # one join per round: the new label and the did-anything-change flag
        # come out of the same pass (nbr_lab < lab detects change directly,
        # no second old-vs-new join)
        new_labels = truncate_lineage(
            labels.join(nbr, "doc_id", "left")
            .select(
                "doc_id",
                F.least("lab", F.coalesce("nbr_lab", "lab")).alias("lab"),
                (F.coalesce("nbr_lab", "lab") < F.col("lab"))
                .cast("int")
                .alias("_chg"),
            )
        )
        changed = new_labels.agg(F.sum("_chg")).collect()[0][0] or 0
        labels = new_labels.select("doc_id", "lab")
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"dedup_clusters did not converge in {MAX_CC_ROUNDS} rounds"
        )
    sym.unpersist()
    return (
        corpus.select("doc_id")
        .join(labels, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("lab", "doc_id").alias("cluster_id"),
            (F.col("doc_id") == F.coalesce("lab", "doc_id"))
            .cast("int")
            .alias("is_canonical"),
        )
    )


def dedup_clusters_oracle_sql(source: str = "documents",
                              threshold: float = 0.8) -> str:
    """Transitive closure via recursive CTE; min reachable id per node."""
    return f"""
WITH RECURSIVE
pairs AS (SELECT id_a, id_b FROM ({ngram_jaccard_oracle_sql(source, threshold)})),
sym AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION ALL
  SELECT id_b AS src, id_a AS dst FROM pairs
),
nodes AS (SELECT doc_id FROM {corpus_sql(source)}),
reach(doc_id, lab) AS (
  SELECT doc_id, doc_id FROM nodes
  UNION
  SELECT s.dst, r.lab FROM reach r JOIN sym s ON s.src = r.doc_id
)
SELECT doc_id, min(lab) AS cluster_id,
       CAST(doc_id = min(lab) AS INT) AS is_canonical
FROM reach GROUP BY doc_id
"""


def dedup_keep_best(corpus: DataFrame, threshold: float = 0.8,
                    edges: DataFrame | None = None) -> DataFrame:
    """(cluster_id, best_id, n_members, best_len): per near-duplicate
    cluster, the member elected to SURVIVE — longest text, ties broken to
    the lowest doc_id. The production variant of dedup_clusters'
    lowest-id canonical: real curation keeps the best member of a dup
    cluster (longest / highest-quality), not an arbitrary one (e.g. the
    RefinedWeb and FineWeb pipelines keep the longest near-dup).

    Scale shape: dedup_clusters' edge-relation label propagation plus ONE
    keyed join of the cluster map against a (doc_id, length) projection
    and ONE groupBy(cluster_id) whose argmax rides a struct max — no
    window over the corpus, no second shuffle beyond the aggregation.
    Deterministic at any parallelism: max(struct(len, -doc_id)) is
    order-independent.
    """
    clusters = dedup_clusters(corpus, threshold=threshold, edges=edges)
    scored = corpus.select(
        "doc_id", F.length("text").cast("bigint").alias("len")
    ).join(clusters.select("doc_id", "cluster_id"), "doc_id")
    return (
        scored.groupBy("cluster_id")
        .agg(
            F.count("*").cast("bigint").alias("n_members"),
            F.max(F.struct(
                F.col("len"),
                (-F.col("doc_id")).alias("neg_id"),
            )).alias("m"),
        )
        .select(
            "cluster_id",
            (-F.col("m.neg_id")).cast("bigint").alias("best_id"),
            "n_members",
            F.col("m.len").cast("bigint").alias("best_len"),
        )
    )


def dedup_keep_best_oracle_sql(source: str = "documents",
                               threshold: float = 0.8) -> str:
    """DuckDB twin: same clusters, same longest-text-then-lowest-id
    election via a deterministic ROW_NUMBER (DuckDB's arg_max leaves ties
    unspecified, so the window order pins them)."""
    return f"""
WITH clusters AS ({dedup_clusters_oracle_sql(source, threshold)}),
scored AS (
  SELECT c.cluster_id, c.doc_id, CAST(length(d.text) AS BIGINT) AS len
  FROM clusters c JOIN {corpus_sql(source)} d USING (doc_id)
), ranked AS (
  SELECT cluster_id, doc_id, len,
         CAST(COUNT(*) OVER (PARTITION BY cluster_id) AS BIGINT)
           AS n_members,
         ROW_NUMBER() OVER (PARTITION BY cluster_id
                            ORDER BY len DESC, doc_id) AS rn
  FROM scored
)
SELECT cluster_id, CAST(doc_id AS BIGINT) AS best_id, n_members,
       len AS best_len
FROM ranked WHERE rn = 1
"""


# -------------------------------------------------------- stratified sampling
def _bucket_col(doc_id) -> F.Column:
    return (
        F.conv(F.substring(F.md5(doc_id.cast("string")), 1, 8), 16, 10)
        .cast("bigint") % 1000
    )


def stratified_sample(docs: DataFrame) -> DataFrame:
    """Deterministic per-language downsampling.

    keep iff md5-bucket(doc_id) < per-mille rate for the row's language.
    Pure projection + filter: zero shuffle, reproducible everywhere.
    """
    rate = F.lit(SAMPLE_RATE_DEFAULT)
    for lang, r in SAMPLE_RATE_PERMILLE.items():
        rate = F.when(F.col("lang") == lang, r).otherwise(rate)
    b = _bucket_col(F.col("doc_id"))
    return (
        docs.withColumn("bucket", b)
        .filter(F.col("bucket") < rate)
        .select("doc_id", "lang", "bucket")
    )


def stratified_sample_oracle_sql(source: str = "documents") -> str:
    whens = " ".join(
        f"WHEN lang = '{lang}' THEN {r}"
        for lang, r in SAMPLE_RATE_PERMILLE.items()
    )
    bucket = (
        "(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 1000)"
    )
    return f"""
SELECT doc_id, lang, {bucket} AS bucket
FROM {source}
WHERE {bucket} < (CASE {whens} ELSE {SAMPLE_RATE_DEFAULT} END)
"""


# ------------------------------------------------------------------- TF-IDF
# grouped: Spark's regexp_extract_all extracts group 1; DuckDB gets the same
# explicit group index so both emit identical token streams
TOKEN_RE = "([a-z]+)"


def tfidf_top_terms(docs: DataFrame, k: int = 3) -> DataFrame:
    """Per-document top-k terms by smoothed TF-IDF.

    idf = round(ln((N+1)/(df+1)) + 1, 6); score = round(tf * idf, 6);
    ties broken by term ascending — totally ordered, parallelism-invariant.
    """
    toks = docs.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit(TOKEN_RE))
        ).alias("term"),
    )
    tf = toks.groupBy("doc_id", "term").agg(
        F.count("*").cast("bigint").alias("tf")
    )
    n_docs = docs.agg(F.count("*").alias("n_docs"))
    dfreq = tf.groupBy("term").agg(F.count("*").cast("bigint").alias("df"))
    idf = F.round(
        F.log(
            (F.col("n_docs").cast("double") + F.lit(1.0))
            / (F.col("df").cast("double") + F.lit(1.0))
        )
        + F.lit(1.0),
        6,
    )
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn("score", F.round(F.col("tf").cast("double") * idf, 6))
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("doc_id", "term", "tf", "score", "rank")
    )


QUANTILES = (0.5, 0.9, 0.99)


def length_quantiles(docs: DataFrame) -> DataFrame:
    """Per-language document-length distribution: exact linear-interpolation
    percentiles + exact integer-sum mean.

    Spark's `percentile` is the exact quantile_cont definition (verified
    equal to DuckDB's to the rounded 6 dp); its aggregation state is a
    count-map over DISTINCT lengths — bounded by the length domain, not the
    row count, so exact quantiles stay cheap even at 10^12 docs. For
    unbounded-domain columns switch to approx_percentile behind a flag.
    One shuffle on lang (partial count-maps merge map-side)."""
    aggs = [
        F.round(F.expr(f"percentile(n_chars, {q})"), 6).alias(
            f"p{int(q * 100)}"
        )
        for q in QUANTILES
    ]
    return docs.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("sum_chars"),
        F.round(
            F.sum("n_chars").cast("double") / F.count("*").cast("double"), 6
        ).alias("mean_chars"),
        *aggs,
    )


def length_quantiles_oracle_sql(source: str = "documents") -> str:
    qs = ",\n       ".join(
        f"round(quantile_cont(n_chars, {q}), 6) AS p{int(q * 100)}"
        for q in QUANTILES
    )
    return f"""
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
       round(CAST(sum(n_chars) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
         AS mean_chars,
       {qs}
FROM {source}
GROUP BY lang
"""


def tfidf_top_terms_oracle_sql(source: str = "documents", k: int = 3) -> str:
    return f"""
WITH toks AS (
  SELECT doc_id,
         unnest(regexp_extract_all(lower(text), '{TOKEN_RE}', 1)) AS term
  FROM {source}
),
tf AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
  FROM toks GROUP BY doc_id, term
),
n AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM {source}),
dfreq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
scored AS (
  SELECT tf.doc_id, tf.term, tf.tf,
         round(CAST(tf.tf AS DOUBLE) *
               round(ln((n.n_docs + 1.0) / (CAST(dfreq.df AS DOUBLE) + 1.0))
                     + 1.0, 6), 6) AS score
  FROM tf JOIN dfreq ON tf.term = dfreq.term CROSS JOIN n
),
ranked AS (
  SELECT doc_id, term, tf, score,
         CAST(row_number() OVER
              (PARTITION BY doc_id ORDER BY score DESC, term ASC)
              AS BIGINT) AS rank
  FROM scored
)
SELECT doc_id, term, tf, score, rank FROM ranked WHERE rank <= {k}
"""


# ----------------------------------------------------------- decontamination
# Benchmark-overlap decontamination — the training-data op that removes eval
# contamination before a corpus ships: drop/flag every document sharing an
# n-gram with a held-out benchmark set. Production pipelines use 8-13-gram
# windows; this implementation reuses the engine's word-3-gram shingle
# machinery (the operator is n-agnostic — the shingle kernel is the only
# n-dependent piece). The benchmark set here is derived deterministically
# from the corpus (doc_id % DECON_BENCH_MOD == 0) so both engines see the
# same held-out docs without external data.
#
# Scale shape: the banned relation is benchmark-sized (tiny next to the
# corpus) -> AQE broadcasts it under the semi/inner join; the corpus side is
# one explode + one keyed groupBy on the UNIQUE doc_id (skew-free); nothing
# all-pairs, nothing collected.
DECON_BENCH_MOD = 97


def _contamination_parts(docs: DataFrame, bench_mod: int):
    """Shared scaffold for the contamination family: the exploded
    per-doc-DISTINCT shingle stream (persist_tracked — it feeds both the
    banned-set build and the scoring side of the same plan) plus the
    benchmark-sized banned relation flagged for left joins."""
    from .dedup import with_shingles

    sh = persist_tracked(with_shingles(docs))
    ex = sh.select("doc_id", F.explode("shingles").alias("shingle"))
    banned = (
        ex.filter(F.col("doc_id") % bench_mod == 0)
        .select("shingle")
        .distinct()
        .withColumn("b", F.lit(1))
    )
    return ex, banned


def contamination_score(docs: DataFrame,
                        bench_mod: int = DECON_BENCH_MOD) -> DataFrame:
    """(doc_id, n_shingles, n_hits, overlap_permille) for every
    NON-benchmark doc: the GRADED contamination signal — pipelines tune
    removal thresholds on the overlap FRACTION (e.g. drop if >10% of a
    doc's distinct 3-grams appear in any benchmark), not on a boolean.
    overlap_permille = (1000 * n_hits) // n_shingles over DISTINCT
    shingles, exact integer division (bit-exact vs the oracle); docs too
    short to carry a shingle score (0, 0, 0).

    Scale shape: the one corpus-sized relation is the exploded shingle
    stream (shared, persisted); the banned relation is benchmark-sized
    (broadcastable); scoring is one keyed LEFT join + one groupBy(doc_id)
    with two PLAIN counts in a single aggregate pass — the shingle stream
    is already distinct per doc (dedup._shingle_udf / list_distinct), so
    count_distinct (and the Expand-based multi-distinct rewrite that
    would double the stream through the shuffle) is unnecessary.
    """
    ex, banned = _contamination_parts(docs, bench_mod)
    per = (
        ex.filter(F.col("doc_id") % bench_mod != 0)
        .join(banned, "shingle", "left")
        .groupBy("doc_id")
        .agg(
            F.count("shingle").cast("bigint").alias("n_shingles"),
            F.count("b").cast("bigint").alias("n_hits"),  # count skips NULL
        )
    )
    return (
        docs.filter(F.col("doc_id") % bench_mod != 0)
        .select("doc_id")
        .join(per, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_shingles", F.lit(0)).cast("bigint")
            .alias("n_shingles"),
            F.coalesce("n_hits", F.lit(0)).cast("bigint").alias("n_hits"),
            # explicit 0 on the shingle-less case: Spark's non-ANSI div
            # yields NULL on /0 where DuckDB's // raises (the
            # mixture_sample lesson)
            F.expr(
                "CAST(CASE WHEN coalesce(n_shingles, 0) = 0 THEN 0 "
                "ELSE (1000 * coalesce(n_hits, 0)) div n_shingles END "
                "AS BIGINT)"
            ).alias("overlap_permille"),
        )
    )


def decontaminate(docs: DataFrame,
                  bench_mod: int = DECON_BENCH_MOD) -> DataFrame:
    """(doc_id, n_hits, is_contaminated) for every NON-benchmark doc —
    the boolean view over contamination_score (is_contaminated =
    n_hits > 0); one operator definition, no parallel scaffold to drift."""
    return contamination_score(docs, bench_mod).select(
        "doc_id",
        "n_hits",
        (F.col("n_hits") > 0).cast("int").alias("is_contaminated"),
    )


def _contamination_per_cte(source: str, bench_mod: int) -> str:
    """Shared oracle CTE chain ending in `per`(doc_id, n_shingles, n_hits)
    over non-benchmark docs; plain counts for the same distinct-per-doc
    reason as the engine side."""
    from .dedup import _shingle_rows_cte

    return f"""corpus AS (SELECT doc_id, text FROM {source}),
{_shingle_rows_cte('corpus')},
banned AS (
  SELECT DISTINCT shingle FROM shx WHERE doc_id % {bench_mod} = 0
),
per AS (
  SELECT s.doc_id,
         CAST(count(s.shingle) AS BIGINT) AS n_shingles,
         CAST(count(b.shingle) AS BIGINT) AS n_hits
  FROM shx s LEFT JOIN banned b ON s.shingle = b.shingle
  WHERE s.doc_id % {bench_mod} != 0
  GROUP BY s.doc_id
)"""


def contamination_score_oracle_sql(source: str = "documents",
                                   bench_mod: int = DECON_BENCH_MOD) -> str:
    return f"""
WITH {_contamination_per_cte(source, bench_mod)}
SELECT d.doc_id,
       COALESCE(p.n_shingles, 0) AS n_shingles,
       COALESCE(p.n_hits, 0) AS n_hits,
       CAST(CASE WHEN COALESCE(p.n_shingles, 0) = 0 THEN 0
            ELSE (1000 * COALESCE(p.n_hits, 0)) // p.n_shingles END
            AS BIGINT) AS overlap_permille
FROM (SELECT doc_id FROM corpus WHERE doc_id % {bench_mod} != 0) d
LEFT JOIN per p USING (doc_id)
"""


def decontaminate_oracle_sql(source: str = "documents",
                             bench_mod: int = DECON_BENCH_MOD) -> str:
    return f"""
WITH {_contamination_per_cte(source, bench_mod)}
SELECT d.doc_id,
       COALESCE(p.n_hits, 0) AS n_hits,
       CASE WHEN COALESCE(p.n_hits, 0) > 0 THEN 1 ELSE 0 END
         AS is_contaminated
FROM (SELECT doc_id FROM corpus WHERE doc_id % {bench_mod} != 0) d
LEFT JOIN per p USING (doc_id)
"""



def doc_repetition(docs: DataFrame) -> DataFrame:
    """Intra-document repetition (the Gopher-style boilerplate signal):
    1 - distinct/total word-3-grams. Highly repetitive docs (chant pages,
    keyword stuffing, templated spam) score near 1 and get filtered by a
    downstream threshold. ONE projection over the scan — zero shuffle, zero
    joins; the shingle kernel is the single Arrow stage (plan-pinned by
    tests/test_plans.py)."""
    from .dedup import WS, _shingle_udf

    toks = F.split(F.lower(F.trim(F.col("text"))), WS)
    raw_total = (F.size(toks) - F.lit(2)).cast("bigint")
    n_total = F.when(raw_total >= 1, raw_total).otherwise(F.lit(0).cast("bigint"))
    n_distinct = (
        F.when(F.size(toks) >= 3, F.size(_shingle_udf(toks)))
        .otherwise(F.lit(0))
        .cast("bigint")
    )
    return docs.select(
        "doc_id",
        n_total.alias("n_grams_total"),
        n_distinct.alias("n_grams_distinct"),
        F.when(
            n_total >= 1,
            F.round(
                1.0 - n_distinct.cast("double") / n_total.cast("double"), 6
            ),
        ).otherwise(F.lit(0.0)).alias("repetition_ratio"),
    )


def doc_repetition_oracle_sql(source: str = "documents") -> str:
    from .dedup import WS

    toks = f"string_split_regex(lower(trim(text)), '{WS}')"
    return f"""
WITH base AS (
  SELECT doc_id,
         CAST(len({toks}) - 2 AS BIGINT) AS n_total,
         CAST(CASE WHEN len({toks}) >= 3
              THEN len(list_distinct(list_transform(
                     generate_series(1, len({toks}) - 2),
                     i -> {toks}[i] || ' ' || {toks}[i+1] || ' ' || {toks}[i+2])))
              ELSE 0 END AS BIGINT) AS n_distinct
  FROM {source}
)
SELECT doc_id,
       CASE WHEN n_total >= 1 THEN n_total ELSE 0 END AS n_grams_total,
       n_distinct AS n_grams_distinct,
       CASE WHEN n_total >= 1
            THEN round(1.0 - CAST(n_distinct AS DOUBLE)
                       / CAST(n_total AS DOUBLE), 6)
            ELSE 0.0 END AS repetition_ratio
FROM base
"""


# ------------------------------------------------------------ BM25 retrieval
# Okapi BM25 (Robertson & Zaragoza 2009) with the Lucene non-negative idf
# variant: idf = ln((N - df + 0.5) / (df + 0.5) + 1). Free parameters at
# the standard defaults.
BM25_K1 = 1.2
BM25_B = 0.75
BM25_QUERY = ("hash", "join", "vector")  # gate query over the fixture corpus
_MICRO = 1000000.0


def bm25_topk(
    docs: DataFrame, query: tuple = BM25_QUERY, k: int = 10
) -> DataFrame:
    """(doc_id, score_micro, rank): the top-k documents for a fixed query
    term set under BM25 — the ranked-retrieval primitive a curation
    pipeline uses for targeted selection and retrieval-based
    decontamination (find the corpus docs closest to a benchmark query).

    Scale shape: the query is a SMALL FIXED term set, so nothing ever
    explodes — per-doc term frequencies are `size(filter(toks, = term))`
    array projections computed in the same zero-exchange scan as dl, the
    corpus statistics (N, avgdl, per-term df) are ONE metadata-sized
    1-row aggregate broadcast back, and the final top-k is
    TakeOrderedAndProject (per-partition top-k, then a k-row merge at the
    driver side of the plan — never a global sort). At 100 TB the whole
    query is scan-bound plus one 1-row exchange.

    Integer-exactness: each per-term partial score is quantized to int64
    micro-units BEFORE the per-doc sum (the lm.py discipline), so the
    cross-term addition is order-exact; idf passes through round(·, 6)
    first so a 1-ulp ln() divergence between Java and libm cannot reach
    the quantizer (the tfidf_top_terms argument). Constants are combined
    ONLY inside the expression tree (`1.0 + k1`, `1.0 - b`), never
    pre-folded in Python, so the engine and the DuckDB twin execute the
    same IEEE operation sequence.
    """
    toks = F.regexp_extract_all(
        F.lower(F.coalesce(F.col("text"), F.lit(""))), F.lit(TOKEN_RE)
    )
    staged = docs.select("doc_id", toks.alias("toks"))
    def _tf(i: int, q: str):
        # one-arg lambda: a two-arg lambda would make F.filter pass
        # (element, index) and silently compare tokens to positions
        return (
            F.size(F.filter(F.col("toks"), lambda w: w == F.lit(q)))
            .cast("bigint")
            .alias(f"tf_{i}")
        )

    tf_cols = [_tf(i, q) for i, q in enumerate(query)]
    per = staged.select(
        "doc_id", F.size("toks").cast("bigint").alias("dl"), *tf_cols
    )
    stats = per.agg(
        F.count("*").cast("bigint").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count("*").cast("double")).alias(
            "avgdl"
        ),
        *[
            F.sum(F.when(F.col(f"tf_{i}") > 0, 1).otherwise(0))
            .cast("bigint")
            .alias(f"df_{i}")
            for i in range(len(query))
        ],
    )
    k1, b = F.lit(BM25_K1), F.lit(BM25_B)

    def term_micro(i: int):
        tf = F.col(f"tf_{i}").cast("double")
        dfq = F.col(f"df_{i}").cast("double")
        idf6 = F.round(
            F.log(
                (F.col("n_docs").cast("double") - dfq + F.lit(0.5))
                / (dfq + F.lit(0.5))
                + F.lit(1.0)
            ),
            6,
        )
        den = tf + k1 * (
            F.lit(1.0)
            - b
            + b * (F.col("dl").cast("double") / F.col("avgdl"))
        )
        sm = F.round(idf6 * ((tf * (F.lit(1.0) + k1)) / den) * F.lit(_MICRO), 0)
        return F.when(F.col(f"tf_{i}") > 0, sm.cast("bigint")).otherwise(
            F.lit(0).cast("bigint")
        )

    matched = sum(F.col(f"tf_{i}") for i in range(len(query)))
    scored = (
        per.join(F.broadcast(stats))
        .withColumn(
            "score_micro",
            sum(term_micro(i) for i in range(len(query))).cast("bigint"),
        )
        .filter(matched > 0)
        .select("doc_id", "score_micro")
    )
    top = scored.orderBy(
        F.col("score_micro").desc(), F.col("doc_id").asc()
    ).limit(k)
    w = Window.orderBy(F.col("score_micro").desc(), F.col("doc_id").asc())
    return top.withColumn("rank", F.row_number().over(w).cast("bigint"))


def bm25_topk_oracle_sql(
    source: str = "documents", query: tuple = BM25_QUERY, k: int = 10
) -> str:
    """DuckDB twin of bm25_topk — the identical IEEE operation sequence
    (same literals, same parenthesization, round(·,6) on idf, int64
    micro-unit quantization before the cross-term sum)."""
    n = len(query)
    tf_sel = ",\n         ".join(
        f"CAST(len(list_filter(toks, w -> w = '{q}')) AS BIGINT) AS tf_{i}"
        for i, q in enumerate(query)
    )
    df_sel = ",\n       ".join(
        f"CAST(sum(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END) AS BIGINT)"
        f" AS df_{i}"
        for i in range(n)
    )
    def term_sql(i: int) -> str:
        idf = (
            f"round(ln((CAST(n_docs AS DOUBLE) - CAST(df_{i} AS DOUBLE)"
            f" + 0.5) / (CAST(df_{i} AS DOUBLE) + 0.5) + 1.0), 6)"
        )
        den = (
            f"(CAST(tf_{i} AS DOUBLE) + {BM25_K1} * (1.0 - {BM25_B}"
            f" + {BM25_B} * (CAST(dl AS DOUBLE) / avgdl)))"
        )
        sm = (
            f"CAST(round({idf} * ((CAST(tf_{i} AS DOUBLE)"
            f" * (1.0 + {BM25_K1})) / {den}) * {_MICRO}, 0) AS BIGINT)"
        )
        return f"CASE WHEN tf_{i} > 0 THEN {sm} ELSE CAST(0 AS BIGINT) END"

    terms = "\n         + ".join(term_sql(i) for i in range(n))
    matched = " + ".join(f"tf_{i}" for i in range(n))
    return f"""
WITH base AS (
  SELECT doc_id,
         regexp_extract_all(lower(coalesce(text, '')), '{TOKEN_RE}', 1)
           AS toks
  FROM {source}
), per AS (
  SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl,
         {tf_sel}
  FROM base
), st AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(dl) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl,
       {df_sel}
  FROM per
), scored AS (
  SELECT doc_id,
         CAST({terms} AS BIGINT) AS score_micro
  FROM per CROSS JOIN st
  WHERE {matched} > 0
)
SELECT doc_id, score_micro,
       CAST(row_number() OVER (ORDER BY score_micro DESC, doc_id) AS BIGINT)
         AS rank
FROM scored
ORDER BY score_micro DESC, doc_id
LIMIT {int(k)}
"""


# ----------------------------------------------------- train/val/test split
# Deterministic held-out split: every pipeline needs one, and a rand()-based
# split breaks the two-cluster-size invariant (partition-seeded randomness
# changes with parallelism). Same md5-bucket discipline as
# stratified_sample, with a SEED salt so the split is independent of the
# sampler's buckets and re-drawable.
SPLIT_PPK = (900, 50, 50)  # train / val / test per-mille
SPLIT_NAMES = ("train", "val", "test")
SPLIT_SEED = 1


def corpus_split(
    docs: DataFrame, ppk: tuple = SPLIT_PPK, seed: int = SPLIT_SEED
) -> DataFrame:
    """(doc_id, bucket, split): assign every document to train/val/test by
    a seeded md5 bucket — pure zero-shuffle projection, reproducible
    across runs, engines, and parallelism levels; same seed + same ppk =
    byte-identical split on any cluster size. ppk must sum to 1000."""
    assert sum(ppk) == 1000 and len(ppk) == len(SPLIT_NAMES)
    b = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("doc_id").cast("string"),
                        F.lit(f":split:{int(seed)}"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        % 1000
    )
    t_hi, v_hi = ppk[0], ppk[0] + ppk[1]
    split = (
        F.when(F.col("bucket") < t_hi, SPLIT_NAMES[0])
        .when(F.col("bucket") < v_hi, SPLIT_NAMES[1])
        .otherwise(SPLIT_NAMES[2])
    )
    return docs.select("doc_id", b.alias("bucket")).withColumn(
        "split", split
    )


def corpus_split_oracle_sql(
    source: str = "documents", ppk: tuple = SPLIT_PPK, seed: int = SPLIT_SEED
) -> str:
    """DuckDB twin of corpus_split — identical salt, hash, and bounds."""
    b = (
        f"(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':split:{int(seed)}'),"
        f" 1, 8))::BIGINT % 1000)"
    )
    t_hi, v_hi = ppk[0], ppk[0] + ppk[1]
    return f"""
SELECT doc_id, {b} AS bucket,
       CASE WHEN {b} < {t_hi} THEN '{SPLIT_NAMES[0]}'
            WHEN {b} < {v_hi} THEN '{SPLIT_NAMES[1]}'
            ELSE '{SPLIT_NAMES[2]}' END AS split
FROM {source}"""


# -------------------------------------------------------- PMI collocations
# word2phrase-class phrase mining (Mikolov et al. 2013): score every
# adjacent word pair by pointwise mutual information and keep the pairs
# that co-occur far more than chance — the step that turns "new york" into
# a single token before tokenizer/embedding training.
#
# Scale shape: two corpus-sized keyed groupBys (the unigram and bigram
# count relations — the same accepted shape as tfidf_top_terms), then
# everything downstream is MODEL-scale: the bigram-count relation joins
# two vocab-sized unigram relations (AQE broadcasts them when they fit)
# and two scalar totals. Output is bounded by |distinct bigrams above
# min_count with positive PMI| — vocabulary-scale, never corpus-scale.
#
# Float discipline (same contract as lm.py): the PMI is quantized to
# integer micro-nats AFTER one ln() over a quotient whose double
# arithmetic is parenthesized IDENTICALLY in both dialects (IEEE multiply
# and divide are deterministic; only ln() carries the documented ≤1-ulp
# engine-divergence risk, absorbed by the half-micro-nat rounding slack).
PMI_MIN_COUNT = 5


def pmi_collocations(docs: DataFrame, min_count: int = PMI_MIN_COUNT) -> DataFrame:
    """(w1, w2, pair_cnt, pmi_micro): positive-PMI adjacent word pairs.

    pmi = ln( (c_ab / N_bi) / ((c_a / N_uni) * (c_b / N_uni)) ), i.e.
    observed bigram probability over the independence expectation, with
    unigram counts taken over the FULL token stream (docs with one word
    still contribute unigrams) and bigram counts over docs with >= 2
    words. Keeps pairs with pair_cnt >= min_count and pmi_micro > 0.
    """
    from .textstats import ws_word_array

    words = docs.select(
        ws_word_array(F.lower(F.col("text"))).alias("ws")
    )
    # persist the two MODEL-scale count relations (vocab- and
    # distinct-bigram-sized, the lm.py precedent): each is referenced
    # twice+ below and Catalyst does not share common subtrees — without
    # the persist every reference re-runs the corpus-sized explode
    uni = persist_tracked(
        words.select(F.explode("ws").alias("w"))
        .groupBy("w")
        .agg(F.count("*").cast("bigint").alias("c1"))
    )
    n_uni = uni.agg(F.sum("c1").cast("bigint").alias("n1"))
    pairs = (
        words.filter(F.size("ws") >= 2)
        .select(
            F.explode(
                F.zip_with(
                    F.expr("slice(ws, 1, size(ws) - 1)"),
                    F.expr("slice(ws, 2, size(ws) - 1)"),
                    lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
                )
            ).alias("p")
        )
        .select("p.w1", "p.w2")
    )
    bi = persist_tracked(
        pairs.groupBy("w1", "w2").agg(
            F.count("*").cast("bigint").alias("c2")
        )
    )
    n_bi = bi.agg(F.sum("c2").cast("bigint").alias("nb"))
    scored = (
        bi.filter(F.col("c2") >= min_count)
        .join(uni.select(F.col("w").alias("w1"), F.col("c1").alias("ca")), "w1")
        .join(uni.select(F.col("w").alias("w2"), F.col("c1").alias("cb")), "w2")
        .crossJoin(F.broadcast(n_uni))
        .crossJoin(F.broadcast(n_bi))
        # the arithmetic is one F.expr so the double-op association is
        # textually identical to the oracle's
        .withColumn(
            "pmi_micro",
            F.expr(
                "CAST(round(ln(((CAST(c2 AS DOUBLE) * CAST(n1 AS DOUBLE))"
                " * CAST(n1 AS DOUBLE))"
                " / ((CAST(ca AS DOUBLE) * CAST(cb AS DOUBLE))"
                " * CAST(nb AS DOUBLE))) * 1000000, 0) AS BIGINT)"
            ),
        )
    )
    return scored.filter(F.col("pmi_micro") > 0).select(
        "w1", "w2", F.col("c2").alias("pair_cnt"), "pmi_micro"
    )


def pmi_collocations_oracle_sql(
    source: str = "documents", min_count: int = PMI_MIN_COUNT
) -> str:
    """DuckDB twin of pmi_collocations — identical tokenization, counts,
    double-op association, and micro-nat quantization."""
    from .textstats import ws_word_array_sql

    return f"""
WITH words AS (
  SELECT {ws_word_array_sql("lower(text)")} AS ws FROM {source}
), uni AS (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS c1
  FROM (SELECT unnest(ws) AS w FROM words) GROUP BY w
), n_uni AS (SELECT CAST(SUM(c1) AS BIGINT) AS n1 FROM uni),
pairs AS (
  SELECT unnest(ws[1:len(ws)-1]) AS w1, unnest(ws[2:len(ws)]) AS w2
  FROM words WHERE len(ws) >= 2
), bi AS (
  SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c2 FROM pairs GROUP BY w1, w2
), n_bi AS (SELECT CAST(SUM(c2) AS BIGINT) AS nb FROM bi),
scored AS (
  SELECT bi.w1, bi.w2, bi.c2,
         CAST(round(ln(((CAST(bi.c2 AS DOUBLE) * CAST(n1 AS DOUBLE))
                        * CAST(n1 AS DOUBLE))
                       / ((CAST(ua.c1 AS DOUBLE) * CAST(ub.c1 AS DOUBLE))
                          * CAST(nb AS DOUBLE))) * 1000000, 0)
              AS BIGINT) AS pmi_micro
  FROM bi
  JOIN uni ua ON bi.w1 = ua.w
  JOIN uni ub ON bi.w2 = ub.w
  CROSS JOIN n_uni CROSS JOIN n_bi
  WHERE bi.c2 >= {int(min_count)}
)
SELECT w1, w2, c2 AS pair_cnt, pmi_micro FROM scored WHERE pmi_micro > 0"""


# ------------------------------------------------- domain distribution drift
# Per-domain Jensen-Shannon divergence against the whole-corpus unigram
# distribution — the "which sources look nothing like the rest of my mix"
# diagnostic a curation run consults before setting mixture weights, and
# the drift monitor a refreshed crawl is compared with.
#
# Scale shape: one corpus-sized explode -> ONE keyed groupBy(source, term)
# restricted by a broadcast top-V vocabulary (the stream is filtered
# map-side before the shuffle, so the exchange carries at most
# |sources| x V rows); the vocabulary itself is one vocab-sized groupBy +
# top-V window. Everything after is metadata-scale: the (sources x V)
# grid is built by a bounded cross join.
#
# Float discipline: each term's JS contribution is quantized to integer
# NANO-nats (1e9 — JS contributions are ~1e-4..1e-2, micro would lose
# signal) and the per-source aggregate is exact integer addition, so the
# result is independent of summation order across engines and
# parallelism levels. Divisions/multiplies are IEEE-deterministic and
# parenthesized identically in both dialects; only ln() carries the
# documented ≤1-ulp risk, absorbed by the half-nano rounding slack.
DIVERGENCE_TOP_V = 200

_JS_CONTRIB_SQL = (
    "CAST(round(((CASE WHEN cs > 0 THEN"
    " (0.5 * (CAST(cs AS DOUBLE) / CAST(dt AS DOUBLE)))"
    " * ln((CAST(cs AS DOUBLE) / CAST(dt AS DOUBLE))"
    "      / (((CAST(cs AS DOUBLE) / CAST(dt AS DOUBLE))"
    "          + (CAST(cg AS DOUBLE) / CAST(gt AS DOUBLE))) / 2.0))"
    " ELSE 0.0 END)"
    " + ((0.5 * (CAST(cg AS DOUBLE) / CAST(gt AS DOUBLE)))"
    " * ln((CAST(cg AS DOUBLE) / CAST(gt AS DOUBLE))"
    "      / (((CAST(cs AS DOUBLE) / CAST(dt AS DOUBLE))"
    "          + (CAST(cg AS DOUBLE) / CAST(gt AS DOUBLE))) / 2.0))))"
    " * 1000000000, 0) AS BIGINT)"
)


def domain_divergence(docs: DataFrame, top_v: int = DIVERGENCE_TOP_V) -> DataFrame:
    """(source, n_terms, js_nano): Jensen-Shannon divergence of each
    source's unigram distribution vs the corpus's, over the corpus's
    top-`top_v` terms (by global count, ties broken by term ascending).

    Both distributions are renormalized over the top-V support, so the
    divergence compares shape on the shared head rather than penalizing
    tail-vocabulary mismatch. q(term) > 0 always holds on that support;
    p(term) = 0 contributes only the q-side KL half. js_nano is the
    exact integer sum of per-term nano-nat contributions.
    """
    from .textstats import ws_word_array

    terms = docs.select(
        "source",
        F.explode(ws_word_array(F.lower(F.col("text")))).alias("term"),
    )
    glob = terms.groupBy("term").agg(
        F.count("*").cast("bigint").alias("cg")
    )
    # orderBy().limit() lowers to TakeOrderedAndProject — a distributed
    # partial top-k with map-side pruning, NOT the single-partition global
    # sort a row_number() window over the whole vocab would force.
    # topv (V rows) and per_src (<= |sources| x V rows) are each referenced
    # 2-3 times below; persisting these bounded relations keeps the
    # corpus-sized explode at exactly TWO runs (topv, per_src) instead of
    # one per downstream reference (Catalyst shares no common subtrees)
    topv = persist_tracked(
        glob.orderBy(F.col("cg").desc(), F.col("term").asc()).limit(top_v)
    )
    per_src = persist_tracked(
        terms.join(F.broadcast(topv.select("term")), "term")
        .groupBy("source", "term")
        .agg(F.count("*").cast("bigint").alias("cs"))
    )
    dom_tot = per_src.groupBy("source").agg(
        F.sum("cs").cast("bigint").alias("dt")
    )
    glob_tot = topv.agg(F.sum("cg").cast("bigint").alias("gt"))
    grid = (
        dom_tot.crossJoin(F.broadcast(topv))
        .join(per_src, ["source", "term"], "left")
        .withColumn("cs", F.coalesce(F.col("cs"), F.lit(0)).cast("bigint"))
        .crossJoin(F.broadcast(glob_tot))
    )
    contrib = grid.withColumn("ct_nano", F.expr(_JS_CONTRIB_SQL))
    return contrib.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_terms"),
        F.sum("ct_nano").cast("bigint").alias("js_nano"),
    )


def domain_divergence_oracle_sql(
    source: str = "documents", top_v: int = DIVERGENCE_TOP_V
) -> str:
    """DuckDB twin of domain_divergence — identical tokenization, top-V
    selection, double-op association, and nano-nat quantization."""
    from .textstats import ws_word_array_sql

    return f"""
WITH terms AS (
  SELECT source,
         unnest({ws_word_array_sql("lower(text)")}) AS term
  FROM {source}
), gcounts AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS cg FROM terms GROUP BY term
), topv AS (
  SELECT term, cg FROM gcounts
  ORDER BY cg DESC, term ASC LIMIT {int(top_v)}
), per_src AS (
  SELECT t.source, t.term, CAST(COUNT(*) AS BIGINT) AS cs
  FROM terms t JOIN topv USING (term)
  GROUP BY t.source, t.term
), dom_tot AS (
  SELECT source, CAST(SUM(cs) AS BIGINT) AS dt FROM per_src GROUP BY source
), glob_tot AS (SELECT CAST(SUM(cg) AS BIGINT) AS gt FROM topv),
grid AS (
  SELECT d.source, v.term, v.cg, d.dt,
         CAST(COALESCE(p.cs, 0) AS BIGINT) AS cs
  FROM dom_tot d CROSS JOIN topv v
  LEFT JOIN per_src p ON p.source = d.source AND p.term = v.term
)
SELECT g.source,
       CAST(COUNT(*) AS BIGINT) AS n_terms,
       CAST(SUM({_JS_CONTRIB_SQL}) AS BIGINT) AS js_nano
FROM grid g CROSS JOIN glob_tot
GROUP BY g.source"""


# ------------------------------------------------- token-budget apportionment
# Largest-remainder (Hamilton) apportionment of a fixed token budget
# across sources, proportional to each source's whitespace-token mass —
# the mixture-planning step that turns "2T-token run, weights by corpus
# share" into per-source integer quotas that sum to the budget EXACTLY
# (naive rounding over- or under-shoots by up to |sources| tokens).
#
# Scale shape: ONE corpus-sized keyed groupBy(source); everything after
# runs on the |sources|-row relation — metadata scale, where the ranking
# window's single partition is the correct plan, not a hazard. All
# arithmetic is exact int64 (floor = n*B div T, remainder = n*B mod T;
# overflow bound: n_tokens * BUDGET < 2^63 holds to ~9e13 tokens at the
# default budget). Ties in the remainder rank break by source ascending —
# totally ordered, parallelism- and engine-independent.
APPORTION_BUDGET = 100_000


def token_apportionment(docs: DataFrame,
                        budget: int = APPORTION_BUDGET) -> DataFrame:
    """(source, n_tokens, alloc): Hamilton-apportioned share of `budget`
    per source; sum(alloc) == budget exactly (when any tokens exist)."""
    from .textstats import ws_word_array

    per_src = docs.groupBy("source").agg(
        F.sum(F.size(ws_word_array(F.lower(F.col("text")))))
        .cast("bigint").alias("n_tokens")
    )
    tot = per_src.agg(F.sum("n_tokens").cast("bigint").alias("t"))
    based = per_src.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_tokens",
        F.expr(f"(n_tokens * {int(budget)}) div greatest(t, 1)")
        .cast("bigint").alias("floor_alloc"),
        F.expr(f"(n_tokens * {int(budget)}) % greatest(t, 1)")
        .cast("bigint").alias("rem"),
    )
    floors = based.agg(F.sum("floor_alloc").cast("bigint").alias("f"))
    w = Window.orderBy(F.col("rem").desc(), F.col("source").asc())
    return (
        based.crossJoin(F.broadcast(floors))
        .withColumn("rk", F.row_number().over(w).cast("bigint"))
        .select(
            "source",
            "n_tokens",
            (
                F.col("floor_alloc")
                + F.when(
                    F.col("rk") <= F.lit(int(budget)) - F.col("f"), 1
                ).otherwise(0)
            ).cast("bigint").alias("alloc"),
        )
    )


def token_apportionment_oracle_sql(source: str = "documents",
                                   budget: int = APPORTION_BUDGET) -> str:
    """DuckDB twin — identical integer floor/remainder arithmetic and
    remainder-rank tiebreak."""
    from .textstats import ws_word_array_sql

    b = int(budget)
    return f"""
WITH per_src AS (
  SELECT source,
         CAST(SUM(len({ws_word_array_sql("lower(text)")})) AS BIGINT)
           AS n_tokens
  FROM {source} GROUP BY source
), tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS t FROM per_src),
based AS (
  SELECT source, n_tokens,
         CAST((n_tokens * {b}) // greatest(t, 1) AS BIGINT) AS floor_alloc,
         CAST((n_tokens * {b}) % greatest(t, 1) AS BIGINT) AS rem
  FROM per_src CROSS JOIN tot
), floors AS (SELECT CAST(SUM(floor_alloc) AS BIGINT) AS f FROM based),
ranked AS (
  SELECT source, n_tokens, floor_alloc,
         CAST(row_number() OVER (ORDER BY rem DESC, source ASC) AS BIGINT)
           AS rk
  FROM based
)
SELECT r.source, r.n_tokens,
       CAST(r.floor_alloc
            + CASE WHEN r.rk <= {b} - fl.f THEN 1 ELSE 0 END AS BIGINT)
         AS alloc
FROM ranked r CROSS JOIN floors fl
"""


# ---------------------------------------------------------- soft dedup weights
# Inverse-cluster-size training weights ("soft dedup"): instead of DROPPING
# near-duplicates, downweight every member of a duplicate cluster so the
# cluster contributes ONE document's worth of gradient mass in aggregate
# (weight = 1/cluster_size; the sampling-probability formulation used when
# hard removal is too lossy — e.g. near-dups that differ in the tail).
# Exact integer parts-per-million; the per-member remainder of the integer
# division is deliberately NOT redistributed (every member of a cluster
# must carry the SAME weight — that is the semantics).
def dedup_weights(corpus: DataFrame, threshold: float = 0.8,
                  edges: DataFrame | None = None) -> DataFrame:
    """(doc_id, cluster_id, n_members, weight_ppm): every corpus doc with
    its near-dup cluster, the cluster's member count, and the soft-dedup
    weight 1_000_000 div n_members.

    Scale shape: dedup_clusters' edge-only label propagation plus ONE
    groupBy(cluster_id) count on the cluster map and ONE keyed join back —
    both on the doc_id-keyed map relation, no corpus text ever shuffles.
    """
    clusters = dedup_clusters(corpus, threshold=threshold, edges=edges)
    sizes = clusters.groupBy("cluster_id").agg(
        F.count("*").cast("bigint").alias("n_members")
    )
    return clusters.join(sizes, "cluster_id").select(
        "doc_id",
        "cluster_id",
        "n_members",
        F.expr("1000000 div n_members").cast("bigint").alias("weight_ppm"),
    )


def dedup_weights_oracle_sql(source: str = "documents",
                             threshold: float = 0.8) -> str:
    """DuckDB twin: same clusters, COUNT window for the size."""
    return f"""
WITH clusters AS ({dedup_clusters_oracle_sql(source, threshold)})
SELECT doc_id, cluster_id,
       CAST(COUNT(*) OVER (PARTITION BY cluster_id) AS BIGINT) AS n_members,
       CAST(1000000 // COUNT(*) OVER (PARTITION BY cluster_id) AS BIGINT)
         AS weight_ppm
FROM clusters
"""


# ------------------------------------------------- reciprocal-rank fusion
# RRF (Cormack et al. 2009): fuse several per-document quality signals into
# one keep/sample score WITHOUT calibrating their scales — each signal
# contributes 1/(k + rank) where rank is the doc's min-rank under that
# signal's better-is-first order. The standard ensemble move when a
# curation pipeline has heterogeneous signals (an LM score in micro-nats,
# a novelty permille, a repetition permille) whose magnitudes are not
# comparable. k = 60 per the paper.
#
# Integer discipline: the contribution is quantized as 10^9 div (k + rank)
# BEFORE the cross-signal sum — integer division of integer rank, so the
# fused score is exact int64 nano-units, order-independent across engines
# and parallelism. min-rank (SQL RANK()) not row_number: ties must share a
# rank or the result depends on execution order.
#
# Scale shape per signal: rank is NOT a corpus-wide window. It is derived
# from the per-VALUE distribution relation (groupBy(value).count — bounded
# by the signal's integer value domain, the perplexity_buckets /
# length_quantiles argument): a cumulative window over that model-scale
# relation yields rank(value) = 1 + #docs strictly better, joined back
# (AQE broadcast when small, keyed join when not). Docs a signal cannot
# score (no bigrams / no shingles) contribute 0 for that signal and are
# counted out of n_signals.
RRF_K = 60
_RRF_NANO = 1_000_000_000


def _rrf_contrib(scored: DataFrame, val: str, ascending: bool,
                 k: int) -> DataFrame:
    """(doc_id, contrib): 10^9 div (k + min-rank of `val`) with the
    better-first direction given by `ascending`."""
    dist = scored.groupBy(val).agg(F.count("*").cast("bigint").alias("c"))
    order = F.col(val).asc() if ascending else F.col(val).desc()
    w = Window.orderBy(order).rowsBetween(
        Window.unboundedPreceding, -1
    )
    ranked = dist.select(
        val,
        (F.coalesce(F.sum("c").over(w), F.lit(0)) + 1)
        .cast("bigint").alias("rk"),
    )
    return scored.join(ranked, val).select(
        "doc_id",
        F.expr(f"{_RRF_NANO} div ({int(k)} + rk)")
        .cast("bigint").alias("contrib"),
    )


def rrf_fusion(docs: DataFrame, k: int = RRF_K) -> DataFrame:
    """(doc_id, n_signals, rrf_nano): reciprocal-rank fusion of three
    existing quality signals over the raw document table —

      s1 bigram-LM average NLL (micro-nats, LOWER better; docs with no
         bigrams unscored),
      s2 3-gram novelty permille (HIGHER better; docs with no shingles
         unscored),
      s3 3-gram repetition permille (LOWER better; same unscored rule).

    rrf_nano = sum over scored signals of 10^9 div (k + min_rank);
    n_signals counts the signals that scored the doc.
    """
    from .dedup import ngram_novelty
    from .lm import bigram_lm_score

    nll = bigram_lm_score(docs).filter(F.col("n_bigrams") > 0).select(
        "doc_id", F.expr("nll_micro div n_bigrams").alias("v")
    )
    nov = ngram_novelty(docs).filter(F.col("n_shingles") > 0).select(
        "doc_id", F.col("novelty_permille").alias("v")
    )
    rep = doc_repetition(docs).filter(F.col("n_grams_total") >= 1).select(
        "doc_id",
        (F.lit(1000) - F.expr("n_grams_distinct * 1000 div n_grams_total"))
        .cast("bigint").alias("v"),
    )
    parts = [
        _rrf_contrib(nll, "v", ascending=True, k=k),
        _rrf_contrib(nov, "v", ascending=False, k=k),
        _rrf_contrib(rep, "v", ascending=True, k=k),
    ]
    out = docs.select("doc_id")
    for i, p in enumerate(parts):
        out = out.join(
            p.withColumnRenamed("contrib", f"c{i}"), "doc_id", "left"
        )
    cs = [F.col(f"c{i}") for i in range(len(parts))]
    return out.select(
        "doc_id",
        sum(c.isNotNull().cast("bigint") for c in cs)
        .cast("bigint").alias("n_signals"),
        sum(F.coalesce(c, F.lit(0)) for c in cs)
        .cast("bigint").alias("rrf_nano"),
    )


def rrf_fusion_oracle_sql(source: str = "documents",
                          k: int = RRF_K) -> str:
    """DuckDB twin. Small-scale, so ranks use RANK() directly (ties-min,
    value-identical to the engine's distribution-relation formulation);
    the signal derivations compose the signals' own twins."""
    from .dedup import WS, _shingle_rows_cte
    from .lm import bigram_lm_oracle_sql

    kk = int(k)
    return f"""
WITH nll_base AS ({bigram_lm_oracle_sql(source)}),
s1 AS (
  SELECT doc_id, CAST({_RRF_NANO} // ({kk} + RANK() OVER (
           ORDER BY nll_micro // n_bigrams ASC)) AS BIGINT) AS contrib
  FROM nll_base WHERE n_bigrams > 0
),
{_shingle_rows_cte(source)},
first_doc AS (
  SELECT shingle, min(doc_id) AS first_doc FROM shx GROUP BY shingle
),
nov_base AS (
  SELECT s.doc_id,
         CAST(count(*) AS BIGINT) AS n_shingles,
         CAST(sum(CASE WHEN s.doc_id = f.first_doc THEN 1 ELSE 0 END) * 1000
              // count(*) AS BIGINT) AS novelty_permille
  FROM shx s JOIN first_doc f USING (shingle)
  GROUP BY s.doc_id
),
s2 AS (
  SELECT doc_id, CAST({_RRF_NANO} // ({kk} + RANK() OVER (
           ORDER BY novelty_permille DESC)) AS BIGINT) AS contrib
  FROM nov_base WHERE n_shingles > 0
),
rep_base AS ({doc_repetition_oracle_sql(source)}),
s3 AS (
  SELECT doc_id, CAST({_RRF_NANO} // ({kk} + RANK() OVER (
           ORDER BY 1000 - n_grams_distinct * 1000 // n_grams_total ASC))
         AS BIGINT) AS contrib
  FROM rep_base WHERE n_grams_total >= 1
)
SELECT d.doc_id,
       CAST((s1.contrib IS NOT NULL)::INT + (s2.contrib IS NOT NULL)::INT
            + (s3.contrib IS NOT NULL)::INT AS BIGINT) AS n_signals,
       CAST(COALESCE(s1.contrib, 0) + COALESCE(s2.contrib, 0)
            + COALESCE(s3.contrib, 0) AS BIGINT) AS rrf_nano
FROM (SELECT doc_id FROM {source}) d
LEFT JOIN s1 USING (doc_id)
LEFT JOIN s2 USING (doc_id)
LEFT JOIN s3 USING (doc_id)
"""


# ------------------------------------------------------------ inverted index
# Positional-free inverted index build: term -> document-frequency,
# collection-frequency, and the doc_id-ordered posting list — what a
# retrieval layer (the BM25 consumer above) actually ships. Postings are
# emitted as a canonical "doc:tf" CSV string: deterministic, dialect-free,
# and hashable (array-of-struct cells are hostile to cross-engine value
# comparison).
#
# Scale shape: one corpus explode -> one keyed groupBy(term, doc) ->
# one keyed groupBy(term). The posting aggregation's per-group state is
# df-bounded — the one genuinely unbounded group is a stopword-scale term,
# which is why `max_df` exists (prune terms above it, the stop-list move);
# a production index shards those into posting BLOCKS instead (same plan
# with a (term, doc_id div B) pre-group), documented here as the 100 TB
# variant rather than implemented, since the artifact contract (one row
# per term) is what downstream consumes.
INDEX_MIN_DF = 2


def inverted_index(docs: DataFrame, min_df: int = INDEX_MIN_DF,
                   max_df: int | None = None) -> DataFrame:
    """(term, df, cf, postings): whitespace-token inverted index over
    lowercased text; postings = "doc_id:tf" joined by "," in doc_id
    order. Terms with df < min_df (or > max_df when given) are pruned."""
    from .textstats import ws_word_array

    dw = docs.select(
        "doc_id",
        F.explode(ws_word_array(F.lower(F.col("text")))).alias("term"),
    )
    tf = dw.groupBy("term", "doc_id").agg(
        F.count("*").cast("bigint").alias("tf")
    )
    idx = tf.groupBy("term").agg(
        F.count("*").cast("bigint").alias("df"),
        F.sum("tf").cast("bigint").alias("cf"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("doc_id", "tf"))),
                lambda x: F.concat_ws(
                    ":", x["doc_id"].cast("string"), x["tf"].cast("string")
                ),
            ),
            ",",
        ).alias("postings"),
    )
    out = idx.filter(F.col("df") >= int(min_df))
    if max_df is not None:
        out = out.filter(F.col("df") <= int(max_df))
    return out


def inverted_index_oracle_sql(source: str = "documents",
                              min_df: int = INDEX_MIN_DF,
                              max_df: int | None = None) -> str:
    """DuckDB twin: identical tokenizer, same doc_id-ordered CSV."""
    from .textstats import ws_word_array_sql

    cap = f" AND count(*) <= {int(max_df)}" if max_df is not None else ""
    return f"""
WITH dw AS (
  SELECT doc_id, unnest({ws_word_array_sql("lower(text)")}) AS term
  FROM {source}
), tf AS (
  SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf
  FROM dw GROUP BY term, doc_id
)
SELECT term, CAST(count(*) AS BIGINT) AS df,
       CAST(sum(tf) AS BIGINT) AS cf,
       string_agg(CAST(doc_id AS VARCHAR) || ':' || CAST(tf AS VARCHAR),
                  ',' ORDER BY doc_id) AS postings
FROM tf GROUP BY term
HAVING count(*) >= {int(min_df)}{cap}
"""


# ---------------------------------------------------------- source overlap
# Pairwise cross-source redundancy: Jaccard similarity of each source
# PAIR's distinct word-3-gram sets — the mixture-design diagnostic that
# says which corpus components are re-crawls / mirrors of each other
# (near-1 overlap means budgeting them separately double-counts mass).
#
# Scale shape: one shingle explode -> DISTINCT (source, shingle) (keyed
# aggregation) -> shingle-keyed self-join whose PER-KEY fan-out is bounded
# by |sources| choose 2 (a shingle contributes at most one row per source
# after the distinct, so even the hottest boilerplate shingle expands to
# a constant ~|sources|^2 rows — skew-safe at any corpus size) -> one
# groupBy(source pair). Set sizes ride a |sources|-row broadcast join.
def source_overlap(docs: DataFrame) -> DataFrame:
    """(src_a, src_b, n_a, n_b, n_common, jaccard_ppm) for every source
    pair sharing >= 1 distinct 3-gram; src_a < src_b.

    The corpus is touched ONCE: the shingle-grouped source-set relation
    (|distinct shingles| rows, each holding <= |sources| entries) is
    persisted, and BOTH the per-source set sizes and the pair
    intersections derive from it — a naive self-join formulation would
    re-run the corpus explode + distinct three times (measured: 10
    exchanges vs 5 here)."""
    from .dedup import WS, _shingle_udf

    staged = docs.withColumn(
        "_toks", F.split(F.lower(F.trim(F.col("text"))), WS)
    ).filter(F.size("_toks") >= 3)
    sx = staged.select(
        "source", F.explode(_shingle_udf("_toks")).alias("shingle")
    ).distinct()
    grouped = persist_tracked(
        sx.groupBy("shingle").agg(
            F.sort_array(F.collect_set("source")).alias("srcs")
        )
    )
    sizes = (
        grouped.select(F.explode("srcs").alias("source"))
        .groupBy("source")
        .agg(F.count("*").cast("bigint").alias("n"))
    )
    # ordered in-array pair expansion: srcs is sorted, so (i, j>i) pairs
    # satisfy src_a < src_b with no post-filter; fan-out per shingle is
    # bounded by |sources| choose 2
    inter = (
        grouped.select(
            F.explode(
                F.expr(
                    "flatten(transform(srcs, (x, i) ->"
                    " transform(slice(srcs, i + 2, size(srcs)), y ->"
                    " struct(x AS src_a, y AS src_b))))"
                )
            ).alias("p")
        )
        .select("p.src_a", "p.src_b")
        .groupBy("src_a", "src_b")
        .agg(F.count("*").cast("bigint").alias("n_common"))
    )
    return (
        inter.join(
            F.broadcast(sizes.withColumnRenamed("source", "src_a")
                        .withColumnRenamed("n", "n_a")), "src_a"
        )
        .join(
            F.broadcast(sizes.withColumnRenamed("source", "src_b")
                        .withColumnRenamed("n", "n_b")), "src_b"
        )
        .select(
            "src_a", "src_b", "n_a", "n_b", "n_common",
            F.expr("n_common * 1000000 div (n_a + n_b - n_common)")
            .cast("bigint").alias("jaccard_ppm"),
        )
    )


def source_overlap_oracle_sql(source: str = "documents") -> str:
    """DuckDB twin: same distinct shingle sets, same integer ppm."""
    from .dedup import _shingles_sql

    return f"""
WITH sx AS (
  SELECT DISTINCT source, shingle FROM (
    SELECT source, unnest({_shingles_sql("text")}) AS shingle
    FROM {source}
  )
), sizes AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n FROM sx GROUP BY source
), inter AS (
  SELECT a.source AS src_a, b.source AS src_b,
         CAST(count(*) AS BIGINT) AS n_common
  FROM sx a JOIN sx b USING (shingle)
  WHERE a.source < b.source
  GROUP BY a.source, b.source
)
SELECT i.src_a, i.src_b, x.n AS n_a, y.n AS n_b, i.n_common,
       CAST(i.n_common * 1000000 // (x.n + y.n - i.n_common) AS BIGINT)
         AS jaccard_ppm
FROM inter i
JOIN sizes x ON i.src_a = x.source
JOIN sizes y ON i.src_b = y.source
"""


# --------------------------------------------------------- RAKE keyphrases
# Rapid Automatic Keyword Extraction (Rose et al. 2010): candidate phrases
# are maximal runs of non-stopword tokens; each word scores
# degree/frequency over the phrase corpus (degree = summed length of the
# phrases it appears in); a phrase scores the sum of its words' scores.
# Scale shape: one posexplode -> gaps-and-islands window keyed by doc_id
# (bounded documents), one groupBy to assemble phrases, a vocabulary-sized
# word-stats relation joined back (broadcast under AQE), and a per-doc
# top-k window. Scores are integer micro-units ((deg * 1e6) div freq,
# summed) — associative integer addition, so any shuffle order and the
# serial oracle agree exactly.
RAKE_TOPK = 3
# union of the language-marker lists (textstats.LANG_MARKERS) — the
# sandbox's deterministic stopword set
def _rake_stopwords() -> list[str]:
    from .textstats import LANG_MARKERS, LANG_ORDER

    seen: list[str] = []
    for lang in LANG_ORDER:
        for wrd in LANG_MARKERS[lang]:
            if wrd not in seen:
                seen.append(wrd)
    return seen


RAKE_TOKEN_RE = "([a-z]+)"


def rake_keyphrases(docs: DataFrame, k: int = RAKE_TOPK) -> DataFrame:
    """(doc_id, phrase, score_micro, rank): top-k RAKE keyphrases per
    document (ties by phrase ascending)."""
    stops = set(_rake_stopwords())
    token_re = RAKE_TOKEN_RE

    # Phrase extraction is doc-local (split the token stream on stop
    # words), so it needs NO exchange: one Arrow kernel emits
    # (doc_id, phrase, plen) per phrase OCCURRENCE directly, replacing
    # the posexplode -> per-doc window (corpus exchange) -> collect_list
    # struct sort (second corpus exchange) gaps-and-islands plan. The
    # runs it produces are exactly the maximal consecutive-content-token
    # islands that plan grouped; downstream (global word stats join +
    # per-doc top-k) is unchanged. Token rule identical: [a-z]+ over
    # lower(text) — ASCII-only classes, so Python re == Java regex here.
    def _extract(batches):
        import re as _re

        import pandas as _pd

        pat = _re.compile(token_re)
        for pdf in batches:
            ids: list = []
            phs: list = []
            plens: list = []
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                run: list = []
                for w in pat.findall((text or "").lower()):
                    if w in stops:
                        if run:
                            ids.append(did)
                            phs.append(" ".join(run))
                            plens.append(len(run))
                            run = []
                    else:
                        run.append(w)
                if run:
                    ids.append(did)
                    phs.append(" ".join(run))
                    plens.append(len(run))
            yield _pd.DataFrame({
                "doc_id": _pd.array(ids, dtype="int64"),
                "phrase": phs,
                "plen": _pd.array(plens, dtype="int64"),
            })

    phrases = docs.select("doc_id", "text").mapInPandas(
        _extract, "doc_id bigint, phrase string, plen bigint"
    )
    words = phrases.select(
        "doc_id", "phrase", "plen",
        F.explode(F.split(F.col("phrase"), " ")).alias("word"),
    )
    stats = words.groupBy("word").agg(
        F.count("*").cast("bigint").alias("freq"),
        F.sum("plen").cast("bigint").alias("deg"),
    )
    scored = (
        words.join(stats, "word")
        .groupBy("doc_id", "phrase")
        .agg(
            F.sum(F.expr("(deg * 1000000) div freq"))
            .cast("bigint").alias("score_micro")
        )
    )
    wtop = Window.partitionBy("doc_id").orderBy(
        F.col("score_micro").desc(), F.col("phrase").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(wtop).cast("bigint"))
        .filter(F.col("rank") <= int(k))
        .select("doc_id", "phrase", "score_micro", "rank")
    )


def rake_keyphrases_oracle_sql(source: str = "documents",
                               k: int = RAKE_TOPK) -> str:
    stops = ", ".join(f"'{s}'" for s in _rake_stopwords())
    return f"""
WITH toks AS (
  SELECT doc_id,
         unnest(regexp_extract_all(lower(text), '{RAKE_TOKEN_RE}', 1))
           AS word,
         unnest(range(1, len(regexp_extract_all(lower(text),
                '{RAKE_TOKEN_RE}', 1)) + 1)) AS pos
  FROM {source}
), content AS (
  SELECT doc_id, word, pos FROM toks WHERE word NOT IN ({stops})
), grouped AS (
  SELECT doc_id, word, pos,
         pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
  FROM content
), phrases AS (
  SELECT doc_id, grp,
         string_agg(word, ' ' ORDER BY pos) AS phrase,
         CAST(count(*) AS BIGINT) AS plen
  FROM grouped GROUP BY doc_id, grp
), words AS (
  SELECT doc_id, phrase, plen, unnest(string_split(phrase, ' ')) AS word
  FROM phrases
), stats AS (
  SELECT word, CAST(count(*) AS BIGINT) AS freq,
         CAST(sum(plen) AS BIGINT) AS deg
  FROM words GROUP BY word
), scored AS (
  SELECT w.doc_id, w.phrase,
         CAST(sum((s.deg * 1000000) // s.freq) AS BIGINT) AS score_micro
  FROM words w JOIN stats s USING (word)
  GROUP BY w.doc_id, w.phrase
), ranked AS (
  SELECT doc_id, phrase, score_micro,
         CAST(row_number() OVER (PARTITION BY doc_id
              ORDER BY score_micro DESC, phrase ASC) AS BIGINT) AS rank
  FROM scored
)
SELECT doc_id, phrase, score_micro, rank FROM ranked WHERE rank <= {int(k)}"""


# ------------------------------------------------------------- Zipf slope
# Rank-frequency power-law fit per source: the slope of ln(freq) on
# ln(rank) by least squares — the corpus-health scalar (natural text sits
# near -1; templated/spammy sources flatten or steepen). All sums are over
# milli-nat-quantized logs (exact int64, associative), and the final slope
# is one integer division — so the distributed partial aggregation and the
# serial oracle produce identical bits. Scale shape: one (source, term)
# count, one per-source rank window over the vocabulary-sized relation,
# one metadata-sized rollup.


def zipf_slope(docs: DataFrame) -> DataFrame:
    """(source, n_terms, slope_milli): least-squares slope (in exact milli
    units) of ln(freq) vs ln(rank) over each source's term frequency
    ranking (rank ties broken by term)."""
    toks = docs.select(
        "source",
        F.explode(
            F.regexp_extract_all(
                F.lower(F.col("text")), F.lit(RAKE_TOKEN_RE)
            )
        ).alias("term"),
    )
    tf = toks.groupBy("source", "term").agg(
        F.count("*").cast("bigint").alias("freq")
    )
    wr = Window.partitionBy("source").orderBy(
        F.col("freq").desc(), F.col("term").asc()
    )
    pts = tf.withColumn("rank", F.row_number().over(wr)).select(
        "source",
        F.floor(F.log(F.col("rank").cast("double")) * 1000)
        .cast("bigint").alias("lx"),
        F.floor(F.log(F.col("freq").cast("double")) * 1000)
        .cast("bigint").alias("ly"),
    )
    agg = pts.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("lx").cast("bigint").alias("sx"),
        F.sum("ly").cast("bigint").alias("sy"),
        F.sum(F.col("lx") * F.col("ly")).cast("bigint").alias("sxy"),
        F.sum(F.col("lx") * F.col("lx")).cast("bigint").alias("sxx"),
    )
    return agg.select(
        "source",
        F.col("n").alias("n_terms"),
        F.when(
            F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx") == 0,
            F.lit(0),
        )
        .otherwise(
            F.expr(
                "((n * sxy - sx * sy) * 1000)"
                " div (n * sxx - sx * sx)"
            )
        )
        .cast("bigint")
        .alias("slope_milli"),
    )


def zipf_slope_oracle_sql(source: str = "documents") -> str:
    return f"""
WITH toks AS (
  SELECT source,
         unnest(regexp_extract_all(lower(text), '{RAKE_TOKEN_RE}', 1))
           AS term
  FROM {source}
), tf AS (
  SELECT source, term, CAST(count(*) AS BIGINT) AS freq
  FROM toks GROUP BY source, term
), pts AS (
  SELECT source,
         CAST(floor(ln(CAST(row_number() OVER (PARTITION BY source
              ORDER BY freq DESC, term ASC) AS DOUBLE)) * 1000)
              AS BIGINT) AS lx,
         CAST(floor(ln(CAST(freq AS DOUBLE)) * 1000) AS BIGINT) AS ly
  FROM tf
), agg AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(lx) AS BIGINT) AS sx, CAST(sum(ly) AS BIGINT) AS sy,
         CAST(sum(lx * ly) AS BIGINT) AS sxy,
         CAST(sum(lx * lx) AS BIGINT) AS sxx
  FROM pts GROUP BY source
)
SELECT source, n AS n_terms,
       CAST(CASE WHEN n * sxx - sx * sx = 0 THEN 0
                 ELSE ((n * sxy - sx * sy) * 1000) // (n * sxx - sx * sx)
            END AS BIGINT) AS slope_milli
FROM agg"""
