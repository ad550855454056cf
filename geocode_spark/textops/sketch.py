"""Heavy hitters via Misra-Gries summaries (Misra & Gries 1982;
mergeable-summaries form: Agarwal et al., PODS 2012).

Beyond-reference training-data operator (SURVEY §2.8 family). "Which
terms exceed 1/k of the whole token stream" is the classic corpus-
profiling question (stopword discovery, boilerplate tokens, domain
vocabulary drift), and at 100 TB the naive answer — a full
groupBy(term) over the token stream — shuffles a corpus-sized relation
to learn about a handful of terms. The sketch route never does:

  phase 1 (candidates): each PARTITION folds its token stream into a
  capacity-k Misra-Gries summary (at most k surviving terms), merging
  per-Arrow-batch value_counts into the running summary and applying
  the mergeable-summaries reduction (subtract the (k+1)-th largest
  weight, drop <= 0) whenever the summary overflows. One map-only pass,
  O(k) state per partition, zero exchanges.

  phase 2 (exact): the union of per-partition survivors (<= k x
  n_partitions rows — metadata scale) is distinct-ed, broadcast back,
  and ONLY those candidate terms are exactly counted (one keyed groupBy
  bounded by the candidate set); the total token count rides the SAME
  phase-1 pass as per-partition sentinel rows (a separate total would
  be a whole extra corpus scan). Output = candidates whose EXACT count
  clears the threshold, so the sketch never decides the answer — only
  what gets recounted.

No-miss guarantee (why the output is exact, not approximate): a term
absent from partition p's final summary has true local count
<= n_p/(k+1) (each decrement removes k+1 term-occurrences, so at most
n_p/(k+1) decrement rounds touch it). Absent from EVERY partition's
summary therefore implies total count <= sum_p n_p/(k+1) = n/(k+1),
which is strictly below the n/k output threshold — every qualifying
term survives in at least one partition. The threshold test itself is
the integer cross-multiplication cnt * k > n (float-free, /0-free).

The per-batch merge is pandas/Arrow-vectorized (value_counts + indexed
add + partition-select of the (k+1)-th weight) — no per-token Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .corpusops import TOKEN_RE

DEFAULT_HH_K = 50


def _mg_summaries(toks: DataFrame, k: int) -> DataFrame:
    """(term, n): the per-partition Misra-Gries survivors (n = residual
    weight, unused downstream) PLUS one sentinel row per partition with
    term = NULL carrying the partition's total token count — so the
    single map-only pass yields both the candidate set and the global
    n_tokens (a separate total would cost a third full corpus scan)."""
    import pandas as pd
    import pyarrow as pa

    def kernel(batches):
        import numpy as np

        summary = pd.Series(dtype="int64")
        total = 0
        for batch in batches:
            total += batch.num_rows
            vc = pd.Series(batch.column(0).to_pandas()).value_counts()
            summary = summary.add(vc.astype("int64"), fill_value=0).astype(
                "int64"
            )
            if len(summary) > k:
                w = summary.to_numpy()
                # (k+1)-th largest weight: the mergeable-summaries
                # reduction subtracts it everywhere and drops <= 0,
                # leaving at most k survivors
                cstar = np.partition(w, len(w) - (k + 1))[len(w) - (k + 1)]
                summary = summary - int(cstar)
                summary = summary[summary > 0]
        terms = list(summary.index.astype(str)) + [None]
        ns = list(summary.to_numpy(np.int64)) + [total]
        yield pa.RecordBatch.from_arrays(
            [pa.array(terms, pa.utf8()), pa.array(ns, pa.int64())],
            schema=pa.schema(
                [pa.field("term", pa.utf8()), pa.field("n", pa.int64())]
            ),
        )

    return toks.mapInArrow(kernel, "term string, n bigint")


def frequent_terms(
    docs: DataFrame, k: int = DEFAULT_HH_K, text_col: str = "text"
) -> DataFrame:
    """(term, cnt): every token whose EXACT corpus frequency exceeds 1/k
    of the total token count (strictly: cnt * k > n_tokens), with its
    exact count. Candidates come from per-partition Misra-Gries
    summaries (no corpus-wide vocabulary shuffle — see module
    docstring); counts and the threshold are exact, so the result is
    identical to the full-groupBy formulation the DuckDB twin runs."""
    k = int(k)
    toks_arr = F.regexp_extract_all(
        F.lower(F.coalesce(F.col(text_col), F.lit(""))), F.lit(TOKEN_RE)
    )
    toks = docs.select(F.explode(toks_arr).alias("term"))
    from ..caching import persist_tracked

    # one map-only pass yields candidates AND the total (sentinel rows);
    # persisted because both derivations consume it
    summaries = persist_tracked(_mg_summaries(toks, k))
    total = (
        summaries.filter(F.col("term").isNull())
        .agg(F.sum("n").cast("bigint").alias("n_tokens"))
    )
    cands = (
        summaries.filter(F.col("term").isNotNull()).select("term").distinct()
    )
    return (
        toks.join(F.broadcast(cands), "term")
        .groupBy("term")
        .agg(F.count("*").cast("bigint").alias("cnt"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("cnt") * F.lit(k) > F.col("n_tokens"))
        .select("term", "cnt")
    )


def frequent_terms_oracle_sql(
    source: str = "documents", k: int = DEFAULT_HH_K
) -> str:
    """DuckDB twin of frequent_terms — the full-groupBy formulation the
    sketch must exactly reproduce (identical tokenization and the same
    integer cross-multiplied threshold)."""
    k = int(k)
    return f"""
WITH toks AS (
  SELECT unnest(regexp_extract_all(lower(coalesce(text, '')),
                '{TOKEN_RE}', 1)) AS term
  FROM {source}
), total AS (
  SELECT CAST(count(*) AS BIGINT) AS n_tokens FROM toks
)
SELECT term, CAST(count(*) AS BIGINT) AS cnt
FROM toks CROSS JOIN total
GROUP BY term, n_tokens
HAVING CAST(count(*) AS BIGINT) * {k} > n_tokens"""
