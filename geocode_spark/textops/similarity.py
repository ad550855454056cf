"""Embedding similarity search: brute-force cosine top-k + sign-LSH buckets.

Input: the `embeddings` table (vec_id bigint, embedding array<float>, label).

Scale design:
 - brute-force top-k: the exactness baseline. The candidate side is broadcast
   (fits executors when candidates are a curated set); the query side streams.
   The per-query top-k window partitions on the UNIQUE query id — skew-free.
 - sign-LSH: bucket = sign bits of the first 8 dimensions (axis-aligned
   random-hyperplane LSH with a deterministic basis — no RNG, so both engines
   derive identical buckets). The equi-join on bucket bounds pair generation
   to ~1/256 of the cross product; the scale path for 10^9+ vectors.

Floating point: all dot products fold left-to-right in DOUBLE in both engines
(Spark `aggregate`, DuckDB `list_sum(list_transform(...))`); cosine =
dot / sqrt(nsq_a * nsq_b) — a single expression shape, rounded to 6 dp at the
output/ranking boundary so ranking is reproducible across engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

LSH_BITS = 8  # 256 buckets from the first 8 dimension signs


# ------------------------------------------------------------------ Spark side
def _to_double(arr: Column) -> Column:
    return F.transform(arr, lambda x: x.cast("double"))


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _with_norms(emb: DataFrame, prefix: str) -> DataFrame:
    e = _to_double(F.col("embedding"))
    return emb.select(
        F.col("vec_id").alias(f"{prefix}_id"),
        e.alias(f"{prefix}_e"),
        _dot(e, e).alias(f"{prefix}_nsq"),
    )


def _cosine(qe: str, ce: str, qn: str, cn: str) -> Column:
    return F.round(
        _dot(F.col(qe), F.col(ce)) / F.sqrt(F.col(qn) * F.col(cn)), 6
    )


def _topk(pairs: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("vec_id").orderBy(
        F.col("cosine").desc(), F.col("cand_id").asc()
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("vec_id", "rank", "cand_id", "cosine")
    )


def ann_topk(emb: DataFrame, k: int = 5, query_mod: int = 20) -> DataFrame:
    """Exact cosine top-k: queries = vec_id % query_mod == 0, candidates = all
    other vectors (broadcast)."""
    q = _with_norms(emb.filter(F.col("vec_id") % query_mod == 0), "q")
    c = _with_norms(emb, "c")
    pairs = (
        q.crossJoin(F.broadcast(c))
        .filter(F.col("q_id") != F.col("c_id"))
        .select(
            F.col("q_id").alias("vec_id"),
            F.col("c_id").alias("cand_id"),
            _cosine("q_e", "c_e", "q_nsq", "c_nsq").alias("cosine"),
        )
    )
    return _topk(pairs, k)


def _bucket(e: Column) -> Column:
    b = F.lit(0)
    for j in range(LSH_BITS):
        b = b + F.when(F.get(e, j) >= 0, F.lit(1 << j)).otherwise(F.lit(0))
    return b.cast("bigint")


def ann_lsh_topk(emb: DataFrame, k: int = 5, query_mod: int = 20) -> DataFrame:
    """Sign-LSH bucketed top-k: candidates restricted to the query's bucket."""
    q = _with_norms(emb.filter(F.col("vec_id") % query_mod == 0), "q")
    q = q.withColumn("bucket", _bucket(F.col("q_e")))
    c = _with_norms(emb, "c").withColumn("bucket", _bucket(F.col("c_e")))
    pairs = (
        q.join(F.broadcast(c), on="bucket")
        .filter(F.col("q_id") != F.col("c_id"))
        .select(
            F.col("q_id").alias("vec_id"),
            F.col("c_id").alias("cand_id"),
            _cosine("q_e", "c_e", "q_nsq", "c_nsq").alias("cosine"),
        )
    )
    return _topk(pairs, k)


def embedding_near_dup(emb: DataFrame, threshold: float = 0.95) -> DataFrame:
    """All pairs (id_a < id_b) with cosine >= threshold — embedding-space
    near-duplicate detection."""
    a = _with_norms(emb, "q")
    b = _with_norms(emb, "c")
    return (
        a.crossJoin(F.broadcast(b))
        .filter(F.col("q_id") < F.col("c_id"))
        .select(
            F.col("q_id").alias("id_a"),
            F.col("c_id").alias("id_b"),
            _cosine("q_e", "c_e", "q_nsq", "c_nsq").alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


# ----------------------------------------------------------------- oracle side
def _dot_sql(a: str, b: str) -> str:
    return (
        f"list_sum(list_transform(generate_series(1, len({a})),"
        f" i -> {a}[i] * {b}[i]))"
    )


_NORMED_CTE = """
v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
n AS (SELECT vec_id, e, {nsq} AS nsq FROM v)
""".format(nsq=_dot_sql("e", "e"))


def _cosine_sql(qe: str, ce: str, qn: str, cn: str) -> str:
    return f"round({_dot_sql(qe, ce)} / sqrt({qn} * {cn}), 6)"


def _bucket_sql(e: str) -> str:
    terms = " + ".join(
        f"(CASE WHEN {e}[{j + 1}] >= 0 THEN {1 << j} ELSE 0 END)"
        for j in range(LSH_BITS)
    )
    return f"CAST(({terms}) AS BIGINT)"


def ann_topk_oracle_sql(k: int = 5, query_mod: int = 20,
                        bucketed: bool = False) -> str:
    cos = _cosine_sql("q.e", "c.e", "q.nsq", "c.nsq")
    extra = f" AND {_bucket_sql('q.e')} = {_bucket_sql('c.e')}" if bucketed else ""
    return f"""
WITH {_NORMED_CTE}
SELECT vec_id, rank, cand_id, cosine FROM (
  SELECT q.vec_id,
         CAST(row_number() OVER (PARTITION BY q.vec_id
                                 ORDER BY {cos} DESC, c.vec_id ASC) AS BIGINT) AS rank,
         c.vec_id AS cand_id, {cos} AS cosine
  FROM n q JOIN n c
    ON q.vec_id % {query_mod} = 0 AND c.vec_id <> q.vec_id{extra}
) WHERE rank <= {k}
"""


def embedding_near_dup_oracle_sql(threshold: float = 0.95) -> str:
    cos = _cosine_sql("a.e", "b.e", "a.nsq", "b.nsq")
    return f"""
WITH {_NORMED_CTE}
SELECT a.vec_id AS id_a, b.vec_id AS id_b, {cos} AS cosine
FROM n a JOIN n b ON a.vec_id < b.vec_id
WHERE {cos} >= {threshold!r}
"""
