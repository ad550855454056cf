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



# --------------------------------------------------------------------------
# HyperLogLog distinct counting (Flajolet et al. 2007; the "HLL" every
# warehouse exposes as approx_count_distinct). "Distinct visitors per
# segment" is the canonical web-log cardinality question, and at 100 TB
# the naive answer (groupBy segment + count(DISTINCT key)) shuffles the
# full per-segment DISTINCT key relation. The HLL route never does: each
# register is max(rho) over a hash bucket, max is associative, so
# registers collapse MAP-SIDE and only <= m rows per segment ever cross
# the exchange — the same mergeable-summaries argument as Misra-Gries
# above, for cardinality instead of frequency. Registers are also the
# storage/merge format: unioning two crawls' registers with max() gives
# the union cardinality without re-scanning either.
#
# Determinism (why an approximate sketch can carry a hash-exact oracle
# gate): every register is a pure integer function of md5(key) — bucket
# = first 2 hex chars (m = 256), rho = 1 + leading zero BITS of the next
# 52 (13 hex chars), derived by string ops on the hex itself (leading-'0'
# run length x 4 + a 4-way first-nonzero-digit CASE), no floats anywhere.
# The estimate divides ONE pre-folded python double literal by the exact
# integer denominator and rounds to micro-units — a single IEEE-754
# division + round, bit-identical across Spark's JVM and DuckDB's C++
# (both exactly specified; no ln/exp, whose libm last-ulp freedom is why
# the small-range linear-counting branch is deliberately NOT taken: the
# gated corpus sits in the raw-estimate regime n >= 2.5m, and the
# zero-register count is exposed for callers who want to apply it).
#
# The exact_distinct column is the GATE'S ACCURACY WITNESS (pytest
# asserts the sketch lands within the 1.04/sqrt(m) = 6.5% band's
# 3-sigma): at sf0.01 the full-distinct agg is free, at 100 TB you run
# with_exact=False and ship registers only.

HLL_M = 256  # 2^8 buckets: RSE ~ 1.04/sqrt(256) = 6.5%
_HLL_POW50 = 1 << 50  # rho quantum: term = 2^(50-rho), rho > 50 truncates
# alpha_m * m^2 * 2^50 * 1e6 pre-folded to ONE literal so the estimate is
# a single division (see determinism note above)
_HLL_EST_NUM = 5.299916281133621e25


def _hll_rho_sql(hexpart: str) -> str:
    """1 + leading-zero-bit count of the 52-bit field spelled by 13 hex
    chars — pure string/CASE arithmetic, valid in BOTH dialects (hex
    digits compare bytewise identically: '0'<'1'<...<'9'<'a'<...<'f')."""
    z = f"length(regexp_extract({hexpart}, '^(0*)', 1))"
    c = f"substring({hexpart}, {z} + 1, 1)"
    off = (
        f"(CASE WHEN {c} >= '8' THEN 0 WHEN {c} >= '4' THEN 1 "
        f"WHEN {c} >= '2' THEN 2 ELSE 3 END)"
    )
    return f"(CASE WHEN {z} = 13 THEN 53 ELSE 4 * {z} + {off} + 1 END)"


def hll_registers(
    df: DataFrame, key_col: str = "visitor", group_col: str = "segment"
) -> DataFrame:
    """(segment, bucket, rho): the HLL register relation — max(rho) per
    md5 bucket per group. Max is associative/idempotent, so this is also
    the streaming/merge format (complete-mode groupBy or register-union
    + max both yield the same relation as one batch pass)."""
    h = F.md5(F.col(key_col))
    bucket = F.conv(F.substring(h, 1, 2), 16, 10).cast("bigint")
    hexpart = f"substring(md5(`{key_col}`), 3, 13)"
    rho = F.expr(_hll_rho_sql(hexpart)).cast("int")
    return (
        df.select(
            F.col(group_col).alias("segment"),
            bucket.alias("bucket"),
            rho.alias("rho"),
        )
        .groupBy("segment", "bucket")
        .agg(F.max("rho").alias("rho"))
    )


def hll_finish(regs: DataFrame) -> DataFrame:
    """(segment, occupied, denom, est_micro) from a register relation —
    the read-side projection (dashboards finish registers at query time;
    registers, not estimates, are what merges)."""
    term = F.expr(
        "CASE WHEN rho <= 50 THEN shiftleft(CAST(1 AS BIGINT), 50 - rho) "
        "ELSE CAST(0 AS BIGINT) END"
    )
    per_grp = regs.groupBy("segment").agg(
        F.count("*").cast("bigint").alias("occupied"),
        F.sum(term).cast("bigint").alias("denom_occ"),
    )
    denom = (
        F.col("denom_occ")
        + (F.lit(HLL_M) - F.col("occupied")) * F.lit(_HLL_POW50)
    ).cast("bigint")
    est = F.round(F.lit(_HLL_EST_NUM) / denom.cast("double"), 0).cast(
        "bigint"
    )
    return per_grp.select(
        "segment", "occupied", denom.alias("denom"), est.alias("est_micro")
    )


def hll_distinct(
    df: DataFrame,
    key_col: str = "visitor",
    group_col: str = "segment",
    with_exact: bool = True,
) -> DataFrame:
    """(group, occupied, denom, est_micro[, exact_distinct]): per-group
    HLL distinct-count of key_col. occupied = registers hit (of HLL_M),
    denom = the exact-integer estimate denominator
    sum_buckets 2^(50 - rho) (empty buckets contribute 2^50), est_micro
    = the raw HLL estimate in micro-units. Registers collapse map-side;
    only <= HLL_M rows per group cross the exchange."""
    out = hll_finish(hll_registers(df, key_col, group_col))
    if not with_exact:
        return out
    exact = df.groupBy(F.col(group_col).alias("segment")).agg(
        F.countDistinct(key_col).cast("bigint").alias("exact_distinct")
    )
    return out.join(exact, "segment")


def synthetic_crawl_log(lineitem: DataFrame) -> DataFrame:
    """(segment, visitor): a deterministic high-cardinality crawl-log
    stand-in derived from lineitem — ~2k distinct repeat visitors per
    3-way segment at sf0.01 (n >= 2.5m, the raw-estimate regime HLL_M
    targets; the bundled documents/events tables top out at a few
    hundred distinct keys, below any m's raw band)."""
    return lineitem.select(
        F.col("l_returnflag").alias("segment"),
        F.concat(F.lit("u"), F.col("l_partkey").cast("string")).alias(
            "visitor"
        ),
    )


SYNTHETIC_CRAWL_LOG_SQL = (
    "SELECT l_returnflag AS segment, "
    "concat('u', CAST(l_partkey AS VARCHAR)) AS visitor FROM lineitem"
)


def hll_distinct_oracle_sql(
    source: str = SYNTHETIC_CRAWL_LOG_SQL, with_exact: bool = True
) -> str:
    """DuckDB twin of hll_distinct: identical md5-derived registers, the
    identical single-division estimate."""
    rho = _hll_rho_sql("substring(md5(visitor), 3, 13)")
    exact_cte = """
, exact AS (
  SELECT segment, CAST(count(DISTINCT visitor) AS BIGINT) AS exact_distinct
  FROM src GROUP BY segment
)"""
    exact_sel = ", e.exact_distinct" if with_exact else ""
    exact_join = "JOIN exact e USING (segment)" if with_exact else ""
    return f"""
WITH src AS ({source}), regs AS (
  SELECT segment,
         ('0x' || substr(md5(visitor), 1, 2))::BIGINT AS bucket,
         CAST(max({rho}) AS INTEGER) AS rho
  FROM src GROUP BY segment, ('0x' || substr(md5(visitor), 1, 2))::BIGINT
), per_grp AS (
  SELECT segment,
         CAST(count(*) AS BIGINT) AS occupied,
         CAST(sum(CASE WHEN rho <= 50
                       THEN CAST(1 AS BIGINT) << (50 - rho)
                       ELSE 0 END) AS BIGINT) AS denom_occ
  FROM regs GROUP BY segment
){exact_cte if with_exact else ''}
SELECT p.segment, p.occupied,
       CAST(p.denom_occ + ({HLL_M} - p.occupied) * {_HLL_POW50} AS BIGINT)
         AS denom,
       CAST(round({_HLL_EST_NUM!r} /
                  CAST(p.denom_occ + ({HLL_M} - p.occupied) * {_HLL_POW50}
                       AS DOUBLE), 0) AS BIGINT) AS est_micro{exact_sel}
FROM per_grp p {exact_join}"""


# --------------------------------------------------------------------------
# Count-min sketch (Cormode & Muthukrishnan 2005) — point-frequency
# estimation with a one-sided (over-estimate only) error bound, the third
# member of the mergeable-sketch family here: Misra-Gries answers WHICH
# terms are frequent, HLL answers HOW MANY distinct keys, CMS answers
# "about how often does THIS term occur" without ever keying an exchange
# by term. The counter relation is (depth x width) cells; each cell is a
# SUM over the tokens hashing to it, sum is associative, so cells
# collapse MAP-SIDE and only <= depth*width rows per partition cross the
# exchange — at 100 TB the token stream never shuffles on term, and two
# crawls' sketches merge by adding cells. est(t) = min_j cell[j][pos_j(t)]
# >= true count always (every occurrence of t lands in all d of its
# cells; collisions only ADD), which the gate asserts per probe term.
#
# Determinism: pos_j(term) = first-8-hex-chars of md5(j || ':' || term)
# mod width — pure integer string arithmetic, identical in both engines
# (the _hll_rho_sql precedent). No floats anywhere in the sketch.
#
# The probe set here is the exact top-k terms (count desc, term asc) —
# vocabulary-sized work the GATE can afford; a 100 TB run probes the
# Misra-Gries candidate set instead (frequent_terms above) and never
# builds the full vocabulary relation.

CMS_DEPTH = 4
CMS_WIDTH = 2048
CMS_TOPK = 20


def _cms_pos_sql(j: int, term: str, width: int, duck: bool) -> str:
    """Row-j CMS position of `term` — dialect-split ONLY in the hex->int
    cast spelling (conv vs '0x' concat); the md5 operand is identical."""
    h = f"substring(md5(concat('{j}:', {term})), 1, 8)"
    as_int = (
        f"('0x' || {h})::BIGINT" if duck
        else f"CAST(conv({h}, 16, 10) AS BIGINT)"
    )
    return f"({as_int} % {width})"


def cms_term_counts(
    docs: DataFrame,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
    topk: int = CMS_TOPK,
    text_col: str = "text",
) -> DataFrame:
    """(term, exact_cnt, cms_est): the exact top-`topk` corpus terms
    (count desc, term asc) with their count-min estimates from a
    depth x width sketch built WITHOUT a term-keyed exchange.
    cms_est >= exact_cnt for every row (one-sided CMS bound)."""
    depth, width, topk = int(depth), int(width), int(topk)
    toks_arr = F.regexp_extract_all(
        F.lower(F.coalesce(F.col(text_col), F.lit(""))), F.lit(TOKEN_RE)
    )
    from ..caching import persist_tracked

    toks = docs.select(F.explode(toks_arr).alias("term"))
    cells = F.array(*[
        F.struct(
            F.lit(j).alias("j"),
            F.expr(_cms_pos_sql(j, "term", width, duck=False)).alias("pos"),
        )
        for j in range(depth)
    ])
    # term counts: the probe branch needs this term-keyed aggregation
    # anyway, and its map-side partials bound the exchange by |vocab| per
    # partition — so the sketch derives its cells from it too, computing
    # the depth md5 positions once per DISTINCT term instead of once per
    # occurrence (the dominant cost: d interpreted md5+conv calls per
    # corpus token). Cell values are sums of exact term counts — value-
    # identical to the per-occurrence build. For an unbounded key domain
    # (URL-scale streams, where CMS earns its keep and a term-keyed
    # exchange is the thing to avoid) the per-occurrence form is the
    # right build again — that variant keys the sketch cells directly on
    # (j, pos) from the raw token stream, trading d hashes per token for
    # zero term-keyed state.
    counts = persist_tracked(
        toks.groupBy("term")
        .agg(F.count("*").cast("bigint").alias("exact_cnt"))
    )
    cms = (
        counts.select("exact_cnt", F.inline(cells))
        .groupBy("j", "pos")
        .agg(F.sum("exact_cnt").cast("bigint").alias("cell"))
    )
    # probe terms: exact top-k (gate-sized; see module note for the
    # 100 TB probe-set choice)
    probes = (
        counts
        .orderBy(F.col("exact_cnt").desc(), F.col("term").asc())
        .limit(topk)
    )
    probe_cells = probes.select(
        "term", "exact_cnt", F.inline(cells)
    )
    return (
        probe_cells.join(F.broadcast(cms), ["j", "pos"])
        .groupBy("term", "exact_cnt")
        .agg(F.min("cell").cast("bigint").alias("cms_est"))
        .select("term", "exact_cnt", "cms_est")
    )


def cms_term_counts_oracle_sql(
    source: str = "documents",
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
    topk: int = CMS_TOPK,
) -> str:
    """DuckDB twin: identical md5-derived positions, identical min-over-
    rows estimate, identical (count desc, term asc) probe selection."""
    depth, width, topk = int(depth), int(width), int(topk)
    cell_rows = " UNION ALL ".join(
        f"SELECT term, {j} AS j, "
        f"{_cms_pos_sql(j, 'term', width, duck=True)} AS pos FROM toks"
        for j in range(depth)
    )
    probe_rows = " UNION ALL ".join(
        f"SELECT term, exact_cnt, {j} AS j, "
        f"{_cms_pos_sql(j, 'term', width, duck=True)} AS pos FROM probes"
        for j in range(depth)
    )
    return f"""
WITH toks AS (
  SELECT unnest(regexp_extract_all(lower(coalesce(text, '')),
                '{TOKEN_RE}', 1)) AS term
  FROM {source}
), cms AS (
  SELECT j, pos, CAST(count(*) AS BIGINT) AS cell
  FROM ({cell_rows}) GROUP BY j, pos
), probes AS (
  SELECT term, CAST(count(*) AS BIGINT) AS exact_cnt
  FROM toks GROUP BY term
  ORDER BY exact_cnt DESC, term ASC LIMIT {topk}
)
SELECT p.term, p.exact_cnt, CAST(min(c.cell) AS BIGINT) AS cms_est
FROM ({probe_rows}) p JOIN cms c USING (j, pos)
GROUP BY p.term, p.exact_cnt"""


# --------------------------------------------------------------------------
# Bloom-filter blocklist membership (Bloom 1970) — the fourth sketch: a
# bounded-memory stand-in for the exact broadcast blocklist join when the
# blocked set is too large to broadcast raw (URL-level blocklists run to
# billions of entries at crawl scale; m bits broadcast where the strings
# cannot). Same suffix semantics as packing.blocklist_filter: every
# >= 2-label suffix of the host is probed, a doc is a (probable) hit if
# ANY suffix has all k of its bit positions set. One-sided like CMS:
# exactly-blocked docs are ALWAYS hits (no false negatives — pytest pins
# the superset invariant against blocklist_filter), false positives are
# the deterministic, oracle-matched price of the m-bit budget (a width-16
# pytest forces them — anti-vacuous-gate).
#
# Positions are the CMS hash family over a disjoint lane tag ('b{i}:'):
# pure md5-string integer arithmetic, identical in both engines. The bit
# relation is <= m rows (bits SET, not the dense array) built by one
# bounded explode + distinct over the metadata-scale blocklist; the
# corpus side is one scan + two bounded explodes (suffixes x k) joined
# against the broadcast bit relation — the corpus never shuffles.

BLOOM_M_BITS = 4096
BLOOM_K = 3


def _bloom_pos_sql(i: int, key: str, m_bits: int, duck: bool) -> str:
    h = f"substring(md5(concat('b{i}:', {key})), 1, 8)"
    as_int = (
        f"('0x' || {h})::BIGINT" if duck
        else f"CAST(conv({h}, 16, 10) AS BIGINT)"
    )
    return f"({as_int} % {m_bits})"


def bloom_blocklist(
    frontier: DataFrame,
    blocklist: DataFrame,
    m_bits: int = BLOOM_M_BITS,
    k: int = BLOOM_K,
) -> DataFrame:
    """(doc_id, host, bloom_hit): bloom_hit = 1 iff any >= 2-label suffix
    of the doc's host is PROBABLY in the blocked set (all k bit positions
    set), else 0. Superset of the exact suffix match by construction."""
    from .packing import HOST_FROM_URL_RE

    m_bits, k = int(m_bits), int(k)

    def positions(key_col: str):
        return F.array(*[
            F.struct(
                F.lit(i).alias("i"),
                F.expr(_bloom_pos_sql(i, key_col, m_bits, duck=False))
                .alias("pos"),
            )
            for i in range(k)
        ])

    bits = (
        blocklist.select(F.inline(positions("domain")))
        .select("pos").distinct()
    )
    host = F.lower(F.regexp_extract("url", HOST_FROM_URL_RE, 1))
    hosts = frontier.select("doc_id", host.alias("host"))
    labels = F.split(F.col("host"), r"\.")
    sufs = F.when(
        F.size(labels) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(labels) - 1),
            lambda i: F.array_join(
                F.slice(labels, i, F.size(labels) - i + 1), "."
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    probes = hosts.select(
        "doc_id", F.explode(sufs).alias("suffix")
    ).select("doc_id", "suffix", F.inline(positions("suffix")))
    hits = (
        probes.join(F.broadcast(bits), "pos")
        .groupBy("doc_id", "suffix")
        .agg(F.countDistinct("i").alias("n_set"))
        .filter(F.col("n_set") == k)
        .select("doc_id").distinct()
        .withColumn("bloom_hit", F.lit(1).cast("bigint"))
    )
    return (
        hosts.join(hits, "doc_id", "left")
        .select(
            "doc_id", "host",
            F.coalesce("bloom_hit", F.lit(0)).cast("bigint")
            .alias("bloom_hit"),
        )
    )


def bloom_blocklist_oracle_sql(
    source: str = "documents",
    m_bits: int = BLOOM_M_BITS,
    k: int = BLOOM_K,
) -> str:
    """DuckDB twin: identical bit positions, identical all-k/any-suffix
    membership rule over the same synthetic frontier + gate blocklist."""
    from .packing import (
        BLOCKED_DOMAINS,
        HOST_FROM_URL_RE,
        synthetic_frontier_corpus_sql,
    )

    m_bits, k = int(m_bits), int(k)
    bl = ", ".join(f"'{d}'" for d in BLOCKED_DOMAINS)
    bit_rows = " UNION ALL ".join(
        f"SELECT {_bloom_pos_sql(i, 'domain', m_bits, duck=True)} AS pos "
        "FROM bl"
        for i in range(k)
    )
    probe_rows = " UNION ALL ".join(
        f"SELECT doc_id, suffix, {i} AS i, "
        f"{_bloom_pos_sql(i, 'suffix', m_bits, duck=True)} AS pos FROM suf"
        for i in range(k)
    )
    return f"""
WITH bl AS (
  SELECT unnest([{bl}]) AS domain
), bits AS (
  SELECT DISTINCT pos FROM ({bit_rows})
), hosts AS (
  SELECT doc_id,
         lower(regexp_extract(url, '{HOST_FROM_URL_RE}', 1)) AS host
  FROM ({synthetic_frontier_corpus_sql(source)})
), suf AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(labels)),
                i -> array_to_string(labels[i:], '.'))) AS suffix
  FROM (SELECT doc_id, string_split(host, '.') AS labels FROM hosts)
), hits AS (
  SELECT DISTINCT doc_id
  FROM ({probe_rows}) p JOIN bits USING (pos)
  GROUP BY doc_id, suffix
  HAVING count(DISTINCT i) = {k}
)
SELECT h.doc_id, h.host,
       CAST(CASE WHEN hits.doc_id IS NULL THEN 0 ELSE 1 END AS BIGINT)
         AS bloom_hit
FROM hosts h LEFT JOIN hits ON h.doc_id = hits.doc_id"""


# --------------------------------------------------------------------------
# HLL register merge — the operational primitive the register FORMAT
# exists for: two crawls' sketches combine by per-bucket max without
# re-scanning either corpus. max is associative and idempotent, so the
# merged relation is IDENTICAL (not approximately equal) to the
# single-pass registers over the union — an exact integer invariant the
# gate pins: est_merged == est_single, row for row. The split here is a
# deterministic md5 half ('0'-'7' vs '8'-'f' first hex char of the key),
# rendered identically in both engines, standing in for "crawl 1" and
# "crawl 2".


def hll_merge(
    df: DataFrame, key_col: str = "visitor", group_col: str = "segment"
) -> DataFrame:
    """(segment, est_merged, est_single): the per-group HLL estimate via
    two half-sketches merged by per-bucket max, next to the single-pass
    estimate over the whole relation. The columns are equal by the merge
    invariant — the gate checks both against the twin."""
    half = F.substring(F.md5(F.col(key_col)), 1, 1) < "8"
    regs_a = hll_registers(df.filter(half), key_col, group_col)
    regs_b = hll_registers(df.filter(~half), key_col, group_col)
    merged_regs = (
        regs_a.unionByName(regs_b)
        .groupBy("segment", "bucket")
        .agg(F.max("rho").alias("rho"))
    )
    merged = hll_finish(merged_regs).select(
        "segment", F.col("est_micro").alias("est_merged")
    )
    single = hll_finish(hll_registers(df, key_col, group_col)).select(
        "segment", F.col("est_micro").alias("est_single")
    )
    return merged.join(single, "segment")


def hll_merge_oracle_sql(source: str = SYNTHETIC_CRAWL_LOG_SQL) -> str:
    """DuckDB twin: because per-bucket max over a union commutes with the
    half-split, the twin derives BOTH columns from the single-pass
    register relation — if the Spark merge path diverged in any register
    the estimates would hash-mismatch."""
    rho = _hll_rho_sql("substring(md5(visitor), 3, 13)")
    est = (
        f"CAST(round({_HLL_EST_NUM!r} / CAST(denom_occ + "
        f"({HLL_M} - occupied) * {_HLL_POW50} AS DOUBLE), 0) AS BIGINT)"
    )
    return f"""
WITH src AS ({source}), regs AS (
  SELECT segment,
         ('0x' || substr(md5(visitor), 1, 2))::BIGINT AS bucket,
         CAST(max({rho}) AS INTEGER) AS rho
  FROM src GROUP BY segment, ('0x' || substr(md5(visitor), 1, 2))::BIGINT
), per_grp AS (
  SELECT segment,
         CAST(count(*) AS BIGINT) AS occupied,
         CAST(sum(CASE WHEN rho <= 50
                       THEN CAST(1 AS BIGINT) << (50 - rho)
                       ELSE 0 END) AS BIGINT) AS denom_occ
  FROM regs GROUP BY segment
)
SELECT segment, {est} AS est_merged, {est} AS est_single
FROM per_grp"""
