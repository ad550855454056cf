"""Winnowing document fingerprints (Schleimer, Wilkerson & Aiken 2003).

Beyond-reference training-data operator (SURVEY §2.8 family). Winnowing
is THE local fingerprinting algorithm (MOSS): over a document's k-gram
hash sequence, slide a window of t consecutive grams and record the
window's minimum hash (rightmost position on ties). The selected set is
(1) position-robust — any shared substring of at least t + k - 1 words
is GUARANTEED to contribute at least one identical fingerprint to both
documents — and (2) ~2/(t+1) the size of the gram stream, so the
fingerprint index is a bounded fraction of corpus size. It complements
the span family (textops.spans): span_dup_stats answers "how duplicated
is this doc" exactly, winnowing builds the compact index that finds
WHICH docs overlap without an all-windows relation.

Hash choice — and why this module does NOT reuse the spans.py Arrow
rolling-hash kernel: winnowing's output depends on the hash ORDER (the
argmin), not just on hash equality, so the correctness gate needs the
engine and the DuckDB twin to agree on every hash VALUE, not merely on
equality classes. The cross-dialect-stable order the repo already uses
is the md5 prefix (qualityrules.hashed_linear_score): gram hash = first
15 hex chars of md5 of the case-folded k-word window, as int64 (60
bits). That costs an O(k)-byte concat+md5 per gram position — the write
amplification the span kernel was rewritten to avoid — but here k is a
SMALL constant (default 4, vs the span family's corpus-tuned windows),
the op is a zero-exchange scan-bound projection, and the dialect-stable
total order is a correctness requirement, not a convenience.

Scale shape: one Catalyst projection per doc (gram-hash array staged
once as a real column — the T55 lesson: an inline tree inside the
selection lambda would re-evaluate per element), selection via a
transform over window starts with an O(t) in-window aggregate, then
array_distinct + explode. ZERO exchanges; at 100 TB the query is
scan-bound, and the output relation is the ~2/(t+1)-sized index a
downstream bucket-join consumes (winnow_candidate_pairs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textstats import ws_word_array, ws_word_array_sql

WINNOW_K = 4  # words per gram
WINNOW_T = 5  # grams per selection window; guarantee length = t + k - 1
# selection accumulator init: strictly above any 60-bit gram hash
_H_INIT = 1 << 62


def _gram_hash(ws_col, i, k: int):
    """int64 gram hash at 1-based word position i: first 15 md5 hex chars
    (60 bits) of the case-folded space-joined k-word window — the
    cross-dialect-stable total order (see module docstring)."""
    s = F.lower(F.array_join(F.slice(ws_col, i, F.lit(k)), " "))
    return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("bigint")


def winnow_fingerprints(
    docs: DataFrame,
    text_col: str = "text",
    k: int = WINNOW_K,
    t: int = WINNOW_T,
) -> DataFrame:
    """(doc_id, pos, gram_hash): the winnowing fingerprint set — for every
    window of t consecutive k-gram positions, the minimum gram hash with
    the RIGHTMOST minimizing position on ties (the paper's robust-winnowing
    tie rule), deduplicated across overlapping windows. Docs with fewer
    than k words emit nothing; docs with 1 <= m < t gram positions emit
    the minimum over what exists (one window covering all grams)."""
    k, t = int(k), int(t)
    ws = ws_word_array(F.coalesce(F.col(text_col), F.lit("")))
    staged = docs.select("doc_id", ws.alias("ws"))
    m = F.size("ws") - F.lit(k) + F.lit(1)
    gh = F.when(
        m >= 1,
        F.transform(
            F.sequence(F.lit(1), m), lambda i: _gram_hash(F.col("ws"), i, k)
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    staged = staged.select("doc_id", gh.alias("gh"))

    mm = F.size("gh")
    n_wins = F.greatest(mm - F.lit(t) + F.lit(1), F.lit(1))
    init = F.struct(
        F.lit(_H_INIT).cast("bigint").alias("h"), F.lit(0).alias("p")
    )

    def pick(s):
        # rightmost minimum: ascending j replaces on <=, so the last
        # position attaining the window minimum wins
        return F.aggregate(
            F.sequence(s, F.least(s + F.lit(t - 1), mm)),
            init,
            lambda acc, j: F.when(
                F.element_at(F.col("gh"), j) <= acc["h"],
                F.struct(
                    F.element_at(F.col("gh"), j).alias("h"), j.alias("p")
                ),
            ).otherwise(acc),
        )

    sel = F.when(
        mm >= 1,
        F.array_distinct(F.transform(F.sequence(F.lit(1), n_wins), pick)),
    ).otherwise(F.array().cast("array<struct<h:bigint,p:int>>"))
    return (
        staged.select("doc_id", F.explode(sel).alias("fp"))
        .select(
            "doc_id",
            F.col("fp.p").cast("bigint").alias("pos"),
            F.col("fp.h").alias("gram_hash"),
        )
    )


def winnow_candidate_pairs(
    docs: DataFrame,
    text_col: str = "text",
    k: int = WINNOW_K,
    t: int = WINNOW_T,
) -> DataFrame:
    """(id_a, id_b, n_shared): candidate near-dup pairs = doc pairs sharing
    at least one winnowing fingerprint HASH, with the shared-fingerprint
    count — the MOSS index join. One hash-groupBy on the fingerprint
    relation (~2/(t+1) of the gram stream) + a self-join restricted to
    hash buckets with >= 2 docs; a bucket-size guard upstream is the
    same skew discipline as the LSH band joins (textops.dedup) — at the
    gate scale the fixture's buckets are tiny."""
    from ..caching import persist_tracked

    # persist: the relation feeds BOTH self-join sides — without it a
    # replan (AQE) can run the corpus-wide fingerprint selection twice
    # (the image_hash_pairs discipline)
    fps = persist_tracked(
        winnow_fingerprints(docs, text_col, k, t)
        .select("doc_id", "gram_hash")
        .distinct()
    )
    a = fps.alias("a")
    b = fps.alias("b")
    return (
        a.join(
            b,
            (F.col("a.gram_hash") == F.col("b.gram_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
        .agg(F.count("*").cast("bigint").alias("n_shared"))
    )


def _gram_hash_sql(k: int, pos: str = "i") -> str:
    return (
        f"('0x' || substr(md5(lower(array_to_string("
        f"ws[{pos}:{pos}+{k - 1}], ' '))), 1, 15))::BIGINT"
    )


def winnow_fingerprints_oracle_sql(
    source: str = "documents", k: int = WINNOW_K, t: int = WINNOW_T
) -> str:
    """DuckDB twin of winnow_fingerprints: identical tokenization, the
    identical md5-prefix hash (value-identical, not just
    equality-identical — selection is order-dependent), min-per-window
    with the rightmost tie rule expressed RELATIONALLY (min + max(i)
    filter) so the twin shares nothing with the engine's fold."""
    k, t = int(k), int(t)
    return f"""
WITH words AS (
  SELECT doc_id, {ws_word_array_sql(f"coalesce(text, '')")} AS ws
  FROM {source}
), grams AS (
  SELECT doc_id, i, {_gram_hash_sql(k)} AS h
  FROM (
    SELECT doc_id, ws,
           unnest(range(1, greatest(len(ws) - {k} + 2, 1))) AS i
    FROM words
  )
), nm AS (
  SELECT doc_id, max(i) AS m FROM grams GROUP BY doc_id
), wins AS (
  SELECT doc_id,
         unnest(range(1, greatest(m - {t} + 1, 1) + 1)) AS s
  FROM nm
), cand AS (
  SELECT w.doc_id, w.s, g.i, g.h
  FROM wins w JOIN grams g
    ON g.doc_id = w.doc_id AND g.i >= w.s AND g.i <= w.s + {t - 1}
), mins AS (
  SELECT doc_id, s, min(h) AS mh FROM cand GROUP BY doc_id, s
), sel AS (
  SELECT c.doc_id, c.s, max(c.i) AS p, m.mh AS h
  FROM cand c JOIN mins m
    ON c.doc_id = m.doc_id AND c.s = m.s AND c.h = m.mh
  GROUP BY c.doc_id, c.s, m.mh
)
SELECT DISTINCT doc_id, CAST(p AS BIGINT) AS pos, h AS gram_hash
FROM sel"""


def winnow_candidate_pairs_oracle_sql(
    source: str = "documents", k: int = WINNOW_K, t: int = WINNOW_T
) -> str:
    """DuckDB twin of winnow_candidate_pairs over the fingerprint twin."""
    return f"""
WITH fp AS (
  SELECT DISTINCT doc_id, gram_hash
  FROM ({winnow_fingerprints_oracle_sql(source, k, t)})
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(count(*) AS BIGINT) AS n_shared
FROM fp a JOIN fp b
  ON a.gram_hash = b.gram_hash AND a.doc_id < b.doc_id
GROUP BY a.doc_id, b.doc_id"""
