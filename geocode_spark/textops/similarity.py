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
IVF_CENTROIDS = 8  # coarse quantizer: the n lowest-id vectors (deterministic)
IVF_NPROBE = 2  # query probes its nprobe nearest cells


# ------------------------------------------------------------------ Spark side
#
# All three operators stream the query side through a mapInPandas numpy
# kernel against a broadcast candidate matrix. The kernel never materializes
# pair ROWS (the old cross-join + window plan shuffled |Q|*|C| rows and
# evaluated an interpreted higher-order-function dot per pair); it emits only
# the k (or matching) rows per query. To stay value-identical to the DuckDB
# oracle (and the previous Catalyst fold), every sum accumulates dimension-by-
# dimension left-to-right: `acc += q[:,j]*c[:,j]` performs the same IEEE-754
# addition sequence per pair as `aggregate(zip_with(...))` / `list_sum`.


def _round_half_up(a, decimals: int = 6):
    """Spark/DuckDB ROUND (half away from zero) — numpy rounds half-even."""
    import numpy as np

    p = 10.0**decimals
    return np.copysign(np.floor(np.abs(a) * p + 0.5), a) / p


def _fold_dots(q, m):
    """(b,d)x(n,d) -> (b,n) dot products, left-to-right over dimensions."""
    import numpy as np

    acc = np.zeros((q.shape[0], m.shape[0]))
    for j in range(q.shape[1]):
        acc += q[:, j : j + 1] * m[None, :, j]
    return acc


def _fold_nsq(m):
    import numpy as np

    acc = np.zeros(m.shape[0])
    for j in range(m.shape[1]):
        acc += m[:, j] * m[:, j]
    return acc


def _collect_candidates(emb: DataFrame):
    """Candidate matrix (id-sorted) for broadcast:
    (ids, matrix, nsq, bucket, ivf_cell)."""
    import numpy as np

    pdf = emb.select("vec_id", "embedding").toPandas()
    ids = pdf["vec_id"].to_numpy(dtype=np.int64)
    order = np.argsort(ids, kind="stable")
    ids = ids[order]
    mat = np.stack(
        [np.asarray(v, dtype=np.float64) for v in pdf["embedding"]]
    )[order]
    bucket = (
        (mat[:, :LSH_BITS] >= 0).astype(np.int64)
        * (1 << np.arange(LSH_BITS, dtype=np.int64))
    ).sum(axis=1)
    nsq = _fold_nsq(mat)
    # IVF coarse quantizer: centroids = the IVF_CENTROIDS lowest-id vectors;
    # every vector is assigned the centroid id maximizing rounded cosine
    # (ties -> lowest centroid id, matching the oracle's (cos DESC, cid ASC)).
    nc = min(IVF_CENTROIDS, len(ids))
    ccos = _round_half_up(
        _fold_dots(mat, mat[:nc]) / np.sqrt(nsq[:, None] * nsq[None, :nc])
    )
    cell = ids[:nc][np.argmax(ccos, axis=1)] if nc else np.zeros(0, np.int64)
    return ids, mat, nsq, bucket, cell


_TOPK_SCHEMA = "vec_id bigint, rank bigint, cand_id bigint, cosine double"
_PAIR_SCHEMA = "id_a bigint, id_b bigint, cosine double"


def _cosine_scan(emb: DataFrame, kernel, schema: str,
                 query_filter=None) -> DataFrame:
    bc = emb.sparkSession.sparkContext.broadcast(_collect_candidates(emb))
    q = emb.select("vec_id", "embedding")
    if query_filter is not None:
        q = q.filter(query_filter)

    def run(batches):
        import numpy as np
        import pandas as pd

        cid, cmat, cnsq, cbucket, ccell = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            qid = pdf["vec_id"].to_numpy(dtype=np.int64)
            qmat = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf["embedding"]]
            )
            for s in range(0, len(pdf), 512):  # bound the (b, n) matrices
                e = min(s + 512, len(pdf))
                cos = _round_half_up(
                    _fold_dots(qmat[s:e], cmat)
                    / np.sqrt(_fold_nsq(qmat[s:e])[:, None] * cnsq[None, :])
                )
                out = kernel(qid[s:e], qmat[s:e], cos, cid, cbucket,
                             ccell, cmat, cnsq)
                if out is not None:
                    yield out

    return q.mapInPandas(run, schema=schema)


def _topk_kernel(k: int, bucketed: bool):
    def kernel(qid, qmat, cos, cid, cbucket, *_ctx):
        import numpy as np
        import pandas as pd

        cos = cos.copy()
        cos[qid[:, None] == cid[None, :]] = -np.inf  # exclude self
        if bucketed:
            qbucket = (
                (qmat[:, :LSH_BITS] >= 0).astype(np.int64)
                * (1 << np.arange(LSH_BITS, dtype=np.int64))
            ).sum(axis=1)
            cos[qbucket[:, None] != cbucket[None, :]] = -np.inf
        # stable sort on -cosine: candidates are id-sorted, so equal cosines
        # keep cand_id order — the window's (cosine DESC, cand_id ASC).
        idx = np.argsort(-cos, axis=1, kind="stable")[:, :k]
        top = np.take_along_axis(cos, idx, axis=1)
        valid = np.isfinite(top)
        n_valid = valid.sum(axis=1)
        if n_valid.sum() == 0:
            return None
        ranks = np.tile(np.arange(1, k + 1), (len(qid), 1))
        return pd.DataFrame(
            {
                "vec_id": np.repeat(qid, k)[valid.ravel()],
                "rank": ranks.ravel()[valid.ravel()],
                "cand_id": cid[idx].ravel()[valid.ravel()],
                "cosine": top.ravel()[valid.ravel()],
            }
        )

    return kernel


def _near_dup_kernel(threshold: float):
    def kernel(qid, qmat, cos, cid, cbucket, *_ctx):
        import numpy as np
        import pandas as pd

        keep = (cos >= threshold) & (qid[:, None] < cid[None, :])
        ai, bi = np.nonzero(keep)
        if len(ai) == 0:
            return None
        return pd.DataFrame(
            {"id_a": qid[ai], "id_b": cid[bi], "cosine": cos[ai, bi]}
        )

    return kernel


def _ivf_kernel(k: int, n_centroids: int, nprobe: int):
    base = _topk_kernel(k, bucketed=False)

    def kernel(qid, qmat, cos, cid, cbucket, ccell, cmat, cnsq):
        import numpy as np

        nc = min(n_centroids, len(cid))
        cent, centnsq, centid = cmat[:nc], cnsq[:nc], cid[:nc]
        qcos = _round_half_up(
            _fold_dots(qmat, cent)
            / np.sqrt(_fold_nsq(qmat)[:, None] * centnsq[None, :])
        )
        # probe list: nprobe best cells by (cos DESC, centroid id ASC) —
        # stable argsort over id-ordered centroids reproduces the oracle order
        probe = centid[np.argsort(-qcos, axis=1, kind="stable")[:, :nprobe]]
        keep = (ccell[None, :, None] == probe[:, None, :]).any(axis=2)
        cos = cos.copy()
        cos[~keep] = -np.inf
        return base(qid, qmat, cos, cid, cbucket)

    return kernel


def ann_topk(emb: DataFrame, k: int = 5, query_mod: int = 20) -> DataFrame:
    """Exact cosine top-k: queries = vec_id % query_mod == 0, candidates = all
    other vectors (broadcast matrix)."""
    return _cosine_scan(
        emb, _topk_kernel(k, bucketed=False), _TOPK_SCHEMA,
        query_filter=F.col("vec_id") % query_mod == 0,
    )


def ann_lsh_topk(emb: DataFrame, k: int = 5, query_mod: int = 20) -> DataFrame:
    """Sign-LSH bucketed top-k: candidates restricted to the query's bucket
    (sign bits of the first LSH_BITS dimensions — deterministic basis)."""
    return _cosine_scan(
        emb, _topk_kernel(k, bucketed=True), _TOPK_SCHEMA,
        query_filter=F.col("vec_id") % query_mod == 0,
    )


def ann_ivf_topk(emb: DataFrame, k: int = 5, query_mod: int = 20,
                 n_centroids: int = IVF_CENTROIDS,
                 nprobe: int = IVF_NPROBE) -> DataFrame:
    """IVF top-k: deterministic coarse quantizer (centroids = the
    n_centroids lowest-id vectors), candidates restricted to the query's
    nprobe nearest cells — the inverted-file scale path: at 10^9+ vectors the
    per-cell posting lists replace the full broadcast matrix and each query
    scans ~nprobe/n_centroids of the data."""
    return _cosine_scan(
        emb, _ivf_kernel(k, n_centroids, nprobe), _TOPK_SCHEMA,
        query_filter=F.col("vec_id") % query_mod == 0,
    )


def embedding_near_dup(emb: DataFrame, threshold: float = 0.95) -> DataFrame:
    """All pairs (id_a < id_b) with cosine >= threshold — embedding-space
    near-duplicate detection."""
    return _cosine_scan(
        emb, _near_dup_kernel(threshold), _PAIR_SCHEMA
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


def ann_ivf_topk_oracle_sql(k: int = 5, query_mod: int = 20,
                            n_centroids: int = IVF_CENTROIDS,
                            nprobe: int = IVF_NPROBE) -> str:
    ccos = _cosine_sql("x.e", "t.ce", "x.nsq", "t.cnsq")
    cos = _cosine_sql("q.e", "c.e", "q.nsq", "c.nsq")
    return f"""
WITH {_NORMED_CTE},
cent AS (SELECT vec_id AS cid, e AS ce, nsq AS cnsq FROM n
         ORDER BY vec_id LIMIT {n_centroids}),
assign AS (
  SELECT x.vec_id, t.cid,
         row_number() OVER (PARTITION BY x.vec_id
                            ORDER BY {ccos} DESC, t.cid ASC) AS crank
  FROM n x CROSS JOIN cent t
),
cell AS (SELECT vec_id, cid AS cell_id FROM assign WHERE crank = 1),
probe AS (SELECT vec_id, cid AS cell_id FROM assign
          WHERE crank <= {nprobe} AND vec_id % {query_mod} = 0)
SELECT vec_id, rank, cand_id, cosine FROM (
  SELECT q.vec_id,
         CAST(row_number() OVER (PARTITION BY q.vec_id
                                 ORDER BY {cos} DESC, c.vec_id ASC) AS BIGINT) AS rank,
         c.vec_id AS cand_id, {cos} AS cosine
  FROM n q
  JOIN probe p ON p.vec_id = q.vec_id
  JOIN cell cc ON cc.cell_id = p.cell_id
  JOIN n c ON c.vec_id = cc.vec_id AND c.vec_id <> q.vec_id
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
