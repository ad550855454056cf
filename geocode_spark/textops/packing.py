"""Corpus assembly ops: training-sequence packing + URL canonicalization.

Beyond-reference training-data operators (SURVEY §2.8 family). The reference
toolbox (a per-row geocoding HTTP client) has no analog; these are the ops a
100 TB pretraining pipeline runs between curation and the trainer:

- **sequence_pack** — GPT-style "concatenate then chunk" packing: documents
  are concatenated in a deterministic order inside each shard and the token
  stream is cut every `context_len` tokens; a document is described by the
  span of training sequences it lands in. Pure window arithmetic (one
  exchange on shard, cumulative sum, integer division) — no UDF, scales as
  one shuffle of (doc_id, tok_count)-sized rows, never materializing text
  concatenations.
- **sequence_pack_greedy** — bin packing that never splits a document:
  greedy first-fit in shard order, closing a sequence when the next document
  would overflow. The fill state is a prefix recurrence (like sessionize
  with a running-sum reset), not expressible in closed-form window algebra,
  so it runs as a per-shard Arrow kernel; the loop is per-document within a
  shard and shard size is operator-bounded (rows/shard = corpus/n_shards —
  pick n_shards ∝ corpus size). Differentially gated against a DuckDB
  recursive-CTE oracle computing the same recurrence.
- **canonical_url / url_dedup** — crawl-frontier URL canonicalization
  (case-fold scheme+host, strip default ports / fragments / tracking
  params / trailing slash) and keep-lowest-key dedup per canonical URL.
  Catalyst regex only; the dedup is one hash-groupBy on the canonical key.

Sharding uses ``doc_id % n_shards``: deterministic, dialect-free in the
oracle, and uniform over the synthetic corpus. A production pipeline would
hash first (Spark xxhash64 has no DuckDB twin, which is why the oracle-gated
form keeps the modulo).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
)

from .textstats import _ws_tokens_sql, token_count_cols

DEFAULT_CONTEXT_LEN = 256
DEFAULT_N_SHARDS = 8


# --------------------------------------------------- concat-then-chunk pack
def sequence_pack(docs: DataFrame, context_len: int = DEFAULT_CONTEXT_LEN,
                  n_shards: int = DEFAULT_N_SHARDS) -> DataFrame:
    """(doc_id, shard, tok_count, tok_end, first_seq, last_seq, seqs_spanned).

    Within each shard, documents concatenate in doc_id order and the token
    stream is chunked every `context_len` tokens. first_seq/last_seq are the
    chunk indices the document's tokens fall into (documents may straddle a
    boundary — the packed-pretraining convention); a zero-token document
    spans no sequence (seqs_spanned 0, first_seq = last_seq = its insertion
    point).

    Plan shape: one exchange (hash partition by shard) + in-partition sort
    for the running sum — the window carries only (doc_id, tok_count), so
    the shuffle is metadata-sized relative to the corpus text.
    """
    toks = token_count_cols(F.col("text"))["n_tokens_ws"]
    base = docs.select(
        "doc_id",
        F.pmod(F.col("doc_id"), F.lit(n_shards)).cast("bigint").alias("shard"),
        toks.alias("tok_count"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = F.lit(int(context_len))
    packed = base.withColumn("tok_end", F.sum("tok_count").over(w))
    start = F.col("tok_end") - F.col("tok_count")
    return packed.select(
        "doc_id",
        "shard",
        "tok_count",
        "tok_end",
        F.floor(start / c).cast("bigint").alias("first_seq"),
        F.when(F.col("tok_count") > 0, F.floor((F.col("tok_end") - 1) / c))
        .otherwise(F.floor(start / c))
        .cast("bigint")
        .alias("last_seq"),
        F.when(
            F.col("tok_count") > 0,
            F.floor((F.col("tok_end") - 1) / c) - F.floor(start / c) + 1,
        )
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("seqs_spanned"),
    )


def sequence_pack_oracle_sql(source: str = "documents",
                             context_len: int = DEFAULT_CONTEXT_LEN,
                             n_shards: int = DEFAULT_N_SHARDS) -> str:
    toks = _ws_tokens_sql("text")
    return f"""
WITH base AS (
  SELECT doc_id,
         CAST(doc_id % {n_shards} AS BIGINT) AS shard,
         {toks} AS tok_count
  FROM {source}
), packed AS (
  SELECT doc_id, shard, tok_count,
         SUM(tok_count) OVER (PARTITION BY shard ORDER BY doc_id
                              ROWS UNBOUNDED PRECEDING) AS tok_end
  FROM base
)
SELECT doc_id, shard, tok_count, CAST(tok_end AS BIGINT) AS tok_end,
       CAST((tok_end - tok_count) // {context_len} AS BIGINT) AS first_seq,
       CAST(CASE WHEN tok_count > 0 THEN (tok_end - 1) // {context_len}
                 ELSE (tok_end - tok_count) // {context_len} END
            AS BIGINT) AS last_seq,
       CAST(CASE WHEN tok_count > 0
                 THEN (tok_end - 1) // {context_len}
                      - (tok_end - tok_count) // {context_len} + 1
                 ELSE 0 END AS BIGINT) AS seqs_spanned
FROM packed"""


# ------------------------------------------------------- greedy bin packing
_GREEDY_TYPE = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("shard", LongType()),
        StructField("tok_count", LongType()),
        StructField("seq_idx", LongType()),
        StructField("seq_fill", LongType()),
    ]
)


def _greedy_pack_shard(pdf: pd.DataFrame) -> pd.DataFrame:
    """Greedy first-fit over one shard in order_key order (doc_id when no
    explicit order column was given).

    The recurrence per document: if the running fill + tok_count exceeds
    context_len AND the sequence is non-empty, close the sequence (seq_idx +=
    1, fill resets to tok_count); else accumulate. An oversized document
    (tok_count > context_len) gets a sequence of its own. Python loop is
    per-document within one shard — bounded by rows/shard, see module doc.
    """
    order = "order_key" if "order_key" in pdf.columns else "doc_id"
    pdf = pdf.sort_values([order, "doc_id"]).reset_index(drop=True)
    context_len = int(pdf["context_len"].iloc[0])
    toks = pdf["tok_count"].to_numpy()
    seq_idx = [0] * len(toks)
    seq_fill = [0] * len(toks)
    idx, fill = 0, 0
    for i, t in enumerate(toks):
        t = int(t)
        if fill > 0 and fill + t > context_len:
            idx += 1
            fill = 0
        fill += t
        seq_idx[i] = idx
        seq_fill[i] = fill
    out = pdf[["doc_id", "shard", "tok_count"]].copy()
    out["seq_idx"] = seq_idx
    out["seq_fill"] = seq_fill
    return out


def sequence_pack_greedy(docs: DataFrame,
                         context_len: int = DEFAULT_CONTEXT_LEN,
                         n_shards: int = DEFAULT_N_SHARDS,
                         order_col: str | None = None,
                         shard_col: str | None = None) -> DataFrame:
    """(doc_id, shard, tok_count, seq_idx, seq_fill) — greedy first-fit
    packing that never splits a document across sequences.

    By default shards on doc_id % n_shards and packs in doc_id order (the
    oracle-gated form). Pass shard_col / order_col to pack an already
    shuffled corpus (e.g. epoch_shuffle's shard / shard_pos) — the trainer
    handoff in jobs/pack_job.py.
    """
    toks = token_count_cols(F.col("text"))["n_tokens_ws"]
    shard = (
        F.col(shard_col).cast("bigint") if shard_col
        else F.pmod(F.col("doc_id"), F.lit(n_shards)).cast("bigint")
    )
    cols = [
        F.col("doc_id").cast("bigint").alias("doc_id"),
        shard.alias("shard"),
        toks.alias("tok_count"),
        F.lit(int(context_len)).alias("context_len"),
    ]
    if order_col:
        cols.append(F.col(order_col).cast("bigint").alias("order_key"))
    return docs.select(*cols).groupBy("shard").applyInPandas(
        _greedy_pack_shard, schema=_GREEDY_TYPE
    )


def sequence_pack_greedy_oracle_sql(source: str = "documents",
                                    context_len: int = DEFAULT_CONTEXT_LEN,
                                    n_shards: int = DEFAULT_N_SHARDS) -> str:
    """The same greedy recurrence as a DuckDB recursive CTE.

    Step i of the recursion joins shard-state after row i-1 with each
    shard's i-th document; recursion depth = max rows per shard.
    """
    toks = _ws_tokens_sql("text")
    return f"""
WITH RECURSIVE base AS (
  SELECT doc_id,
         CAST(doc_id % {n_shards} AS BIGINT) AS shard,
         {toks} AS tok_count,
         row_number() OVER (PARTITION BY doc_id % {n_shards}
                            ORDER BY doc_id) AS rn
  FROM {source}
), walk AS (
  SELECT doc_id, shard, tok_count, rn,
         CAST(0 AS BIGINT) AS seq_idx,
         CAST(tok_count AS BIGINT) AS seq_fill
  FROM base WHERE rn = 1
  UNION ALL
  SELECT b.doc_id, b.shard, b.tok_count, b.rn,
         CAST(CASE WHEN w.seq_fill > 0
                        AND w.seq_fill + b.tok_count > {context_len}
                   THEN w.seq_idx + 1 ELSE w.seq_idx END AS BIGINT),
         CAST(CASE WHEN w.seq_fill > 0
                        AND w.seq_fill + b.tok_count > {context_len}
                   THEN b.tok_count
                   ELSE w.seq_fill + b.tok_count END AS BIGINT)
  FROM walk w JOIN base b ON b.shard = w.shard AND b.rn = w.rn + 1
)
SELECT doc_id, shard, tok_count, seq_idx, seq_fill FROM walk"""


# ------------------------------------------------------- mixture sampling
DEFAULT_TOKEN_BUDGET = 20_000
_MIX_BUCKETS = 10_000  # md5-bucket resolution (parts per 10k)


def mixture_sample(docs: DataFrame,
                   budget_tokens: int = DEFAULT_TOKEN_BUDGET,
                   weights_ppk: dict[str, int] | None = None) -> DataFrame:
    """(doc_id, source, tok_count): deterministic mixture-weighted sample.

    The trainer-mixture op: given per-source weights (parts-per-1000;
    default = uniform across the sources present) and a total token
    budget, keep a deterministic md5-bucket sample of each source sized so
    its expected token mass is ~budget * weight/1000. Fully lazy — the
    per-source token totals are a metadata-sized aggregate joined back by
    broadcast, not a driver collect.

    Selection is integer-exact (no float threshold): doc kept iff
    bucket < (budget * w * BUCKETS) // (1000 * src_tokens), where bucket =
    md5(doc_id) mod BUCKETS. At extreme src_tokens (~1e12) the product
    budget*w*BUCKETS needs ~decimal(38) headroom — Spark and the oracle
    both compute it in int64 here, which holds to src_tokens ~9e5 TB-of-
    tokens per source at the default budget resolution.
    """
    toks = token_count_cols(F.col("text"))["n_tokens_ws"]
    base = docs.select("doc_id", "source", toks.alias("tok_count"))
    per_src = base.groupBy("source").agg(
        F.sum("tok_count").cast("bigint").alias("src_tokens")
    )
    if weights_ppk is None:
        # uniform weights: count sources with a whole-relation window over
        # the already-aggregated per_src (source-count-sized rows through a
        # single-partition exchange) — a separate count()+join would make
        # Spark recompute the per-source aggregate, scanning the corpus twice
        from pyspark.sql import Window

        n_src = F.count("*").over(
            Window.partitionBy().rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        )
        per_src = per_src.select(
            "source", "src_tokens", n_src.cast("bigint").alias("n_src")
        ).select(
            "source", "src_tokens",
            F.expr("CAST(1000 div n_src AS BIGINT)").alias("w_ppk"),
        )
    else:
        w = F.lit(None).cast("bigint")
        expr = None
        for k, v in sorted(weights_ppk.items()):
            cond = F.col("source") == F.lit(k)
            expr = F.when(cond, F.lit(int(v))) if expr is None \
                else expr.when(cond, F.lit(int(v)))
        per_src = per_src.select(
            "source", "src_tokens",
            F.coalesce(expr, F.lit(0)).cast("bigint").alias("w_ppk"),
        )
    # `div` = exact integer division (the oracle's `//`); a double `/` +
    # floor() could round a near-integer quotient the other way. A source
    # whose docs carry zero tokens gets an explicit 0 threshold (keep
    # nothing): without the CASE, Spark's non-ANSI `div` yields NULL
    # (silent drop) while DuckDB's `//` raises Division by zero --
    # engine/oracle divergence on the same input.
    thresh = F.expr(
        f"CAST(CASE WHEN src_tokens = 0 THEN 0 "
        f"ELSE ({int(budget_tokens)} * w_ppk * {_MIX_BUCKETS}) "
        f"div (1000 * src_tokens) END AS BIGINT)"
    )
    bucket = F.pmod(
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8),
               16, 10).cast("bigint"),
        F.lit(_MIX_BUCKETS),
    )
    return (
        base.join(F.broadcast(per_src.select(
            "source", thresh.alias("keep_below"))), "source")
        .filter(bucket < F.col("keep_below"))
        .select("doc_id", "source", "tok_count")
    )


def mixture_sample_oracle_sql(source: str = "documents",
                              budget_tokens: int = DEFAULT_TOKEN_BUDGET) -> str:
    """DuckDB twin (uniform weights): identical integer threshold + md5
    bucket, so the selected set matches bit-for-bit."""
    toks = _ws_tokens_sql("text")
    return f"""
WITH base AS (
  SELECT doc_id, source, {toks} AS tok_count FROM {source}
), per_src AS (
  SELECT source, CAST(SUM(tok_count) AS BIGINT) AS src_tokens FROM base
  GROUP BY source
), weighted AS (
  SELECT source, src_tokens,
         CAST(1000 // (SELECT COUNT(*) FROM per_src) AS BIGINT) AS w_ppk
  FROM per_src
), thresh AS (
  SELECT source,
         CAST(CASE WHEN src_tokens = 0 THEN 0
              ELSE ({int(budget_tokens)} * w_ppk * {_MIX_BUCKETS})
                   // (1000 * src_tokens) END AS BIGINT) AS keep_below
  FROM weighted
)
SELECT b.doc_id, b.source, b.tok_count
FROM base b JOIN thresh t USING (source)
WHERE CAST(concat('0x', md5(CAST(b.doc_id AS VARCHAR))[1:8]) AS BIGINT)
      % {_MIX_BUCKETS} < t.keep_below"""


# ------------------------------------------------------ URL canonicalization
# tracking parameters stripped during canonicalization (frontier-dedup set)
TRACKING_PARAMS = r"(?:utm_[a-z]+|fbclid|gclid|msclkid|ref|mc_cid|mc_eid)"


def canonical_url(url) -> F.Column:
    r"""Canonical form of a URL for frontier/corpus dedup.

    Anchors are \z (true end-of-text), never $: Java's $ also matches
    BEFORE a trailing newline while RE2's does not, so a crawl column
    containing '...?\n' would canonicalize differently in the engine and
    the oracle. \z and [\s\S] behave identically in both dialects
    (pinned by the differential fuzz in tests/test_fuzz_parity.py).

    Steps (each a Catalyst regexp, applied in order):
      1. case-fold the scheme and host (path/query stay case-sensitive)
      2. drop default ports (:80 http, :443 https)
      3. drop the fragment
      4. drop tracking query params (TRACKING_PARAMS), then a dangling '?'/'&'
      5. drop one trailing slash on a non-root path
    """
    col = F.col(url) if isinstance(url, str) else url
    # 1. scheme+host case-fold: split at the first '/' after '://'
    head = F.regexp_extract(col, r"^([a-zA-Z][a-zA-Z0-9+.-]*://[^/]*)", 1)
    tail = F.substring(col, F.length(head) + F.lit(1), F.lit(1 << 30))
    c = F.concat(F.lower(head), tail)
    # 2. default ports
    #    ([/?#]|$): a default port may be followed directly by a path,
    #    query, or fragment -- 'http://h:80?q=1' strips the same as
    #    'http://h:80/?q=1' would, or the two canonicals diverge
    c = F.regexp_replace(c, r"^(http://[^/:]+):80([/?#]|\z)", r"$1$2")
    c = F.regexp_replace(c, r"^(https://[^/:]+):443([/?#]|\z)", r"$1$2")
    # 3. fragment
    c = F.regexp_replace(c, r"#[\s\S]*", "")
    # 4. tracking params: consume a RUN of them after one separator, keeping
    #    the separator ((?:...)+ handles adjacent params identically in Java
    #    and RE2 — a lookbehind would not: RE2 has none, and a consume-based
    #    single-param regex misses the second of two adjacent params)
    c = F.regexp_replace(
        c, r"([?&])(?:" + TRACKING_PARAMS + r"=[^&#]*(?:&|\z))+", r"$1"
    )
    c = F.regexp_replace(c, r"[?&]+\z", "")
    # 5. trailing slash on non-root path
    c = F.regexp_replace(c, r"(://[^/]+/.+?)/\z", r"$1")
    return c


def _canonical_url_sql(col: str) -> str:
    """DuckDB twin of canonical_url — same regexes, RE2 dialect.

    DuckDB backreferences use \\1; the lookbehind in step 4 is re-expressed
    with a capture (RE2 has no lookbehind) — same matches on URL shapes.
    """
    c = (
        f"concat(lower(regexp_extract({col},"
        f" '^([a-zA-Z][a-zA-Z0-9+.-]*://[^/]*)', 1)),"
        f" {col}[length(regexp_extract({col},"
        f" '^([a-zA-Z][a-zA-Z0-9+.-]*://[^/]*)', 1)) + 1:])"
    )
    c = f"regexp_replace({c}, '^(http://[^/:]+):80([/?#]|\\z)', '\\1\\2')"
    c = f"regexp_replace({c}, '^(https://[^/:]+):443([/?#]|\\z)', '\\1\\2')"
    c = f"regexp_replace({c}, '#[\\s\\S]*', '')"
    c = (
        f"regexp_replace({c},"
        f" '([?&])(?:{TRACKING_PARAMS}=[^&#]*(?:&|\\z))+', '\\1', 'g')"
    )
    c = f"regexp_replace({c}, '[?&]+\\z', '')"
    c = f"regexp_replace({c}, '(://[^/]+/.+?)/\\z', '\\1')"
    return c


def synthetic_url_corpus(docs: DataFrame) -> DataFrame:
    """(doc_id, url): a deterministic crawl-frontier corpus derived from the
    documents table — the testdata has no real URLs, so the gate synthesizes
    them (the same pattern as the image-hash-pairs synthetic corpus). Groups
    of 4 consecutive doc_ids share one logical page expressed as 4 raw
    variants (canonical form, shouting host + default port + fragment,
    tracking params, trailing slash); every 7th group gets a REAL query
    param that must survive canonicalization and keep it distinct."""
    # integer DIV for the same 2^53 exactness reason as
    # synthetic_frontier_corpus
    g = F.expr("doc_id DIV 4")
    v = F.pmod(F.col("doc_id"), F.lit(4))
    host = F.concat(F.lit("example"), (g % 97).cast("string"), F.lit(".com"))
    path = F.concat(F.lit("/p/"), g.cast("string"))
    keep_q = F.when(g % 7 == 0, F.concat(F.lit("?q="), g.cast("string"))) \
        .otherwise(F.lit(""))
    url = (
        F.when(v == 0, F.concat(F.lit("http://"), host, path, keep_q))
        .when(v == 1, F.when(
            g % 7 == 0,
            # port directly followed by the query (no path): pins the
            # ':80?q=' default-port strip shape in the oracle gate
            F.concat(F.lit("HTTP://"), F.upper(host), F.lit(":80"), keep_q),
        ).otherwise(F.concat(F.lit("HTTP://"), F.upper(host),
                             F.lit(":80"), path)))
        .when(v == 2, F.concat(F.lit("http://"), host, path, keep_q,
                               F.when(g % 7 == 0, F.lit("&utm_source=f"))
                               .otherwise(F.lit("?utm_source=f&fbclid=z"))))
        .otherwise(F.concat(F.lit("http://"), host, path, F.lit("/#top")))
    )
    return docs.select("doc_id", url.alias("url"))


def synthetic_url_corpus_sql(source: str = "documents") -> str:
    """DuckDB twin of synthetic_url_corpus. For groups with no real query
    param all 4 variants collapse to one canonical; for every 7th group
    (real ?q=) the query-carrying pair and the bare pair form two canonicals
    — the gate covers both collapse and survival."""
    g = "CAST(doc_id // 4 AS BIGINT)"
    host = f"concat('example', CAST({g} % 97 AS VARCHAR), '.com')"
    path = f"concat('/p/', CAST({g} AS VARCHAR))"
    keep_q = (
        f"CASE WHEN {g} % 7 = 0 THEN concat('?q=', CAST({g} AS VARCHAR))"
        f" ELSE '' END"
    )
    return f"""
SELECT doc_id,
       CASE doc_id % 4
         WHEN 0 THEN concat('http://', {host}, {path}, {keep_q})
         WHEN 1 THEN CASE WHEN {g} % 7 = 0
                     THEN concat('HTTP://', upper({host}), ':80', {keep_q})
                     ELSE concat('HTTP://', upper({host}), ':80', {path}) END
         WHEN 2 THEN concat('http://', {host}, {path}, {keep_q},
                            CASE WHEN {g} % 7 = 0 THEN '&utm_source=f'
                                 ELSE '?utm_source=f&fbclid=z' END)
         ELSE concat('http://', {host}, {path}, '/#top')
       END AS url
FROM {source}"""


def url_dedup_oracle_sql(source: str = "documents") -> str:
    """DuckDB twin of url_dedup over the synthetic frontier corpus."""
    canon = _canonical_url_sql("url")
    return f"""
SELECT canonical,
       CAST(MIN(doc_id) AS BIGINT) AS keep_id,
       CAST(COUNT(*) AS BIGINT) AS n_variants
FROM (
  SELECT doc_id, {canon} AS canonical
  FROM ({synthetic_url_corpus_sql(source)})
)
GROUP BY canonical"""


def url_dedup(urls: DataFrame, key: str = "doc_id",
              url_col: str = "url") -> DataFrame:
    """(canonical, keep_id, n_variants): keep the lowest key per canonical
    URL, counting how many raw variants collapsed into it. One hash-groupBy
    on the canonical key — the frontier-dedup shape at crawl scale."""
    return (
        urls.select(
            F.col(key).cast("bigint").alias("k"),
            canonical_url(url_col).alias("canonical"),
        )
        .groupBy("canonical")
        .agg(
            F.min("k").alias("keep_id"),
            F.count("*").alias("n_variants"),
        )
    )


# ---------------------------------------------------- domain blocklist filter
# Every production crawl pipeline's first gate (C4 blocks its "bad words"
# domains; RefinedWeb/FineWeb ship curated blocklists): drop a page when
# its host IS a blocked domain or is any SUBDOMAIN of one (label-boundary
# suffix match — "cdn.media.example5.com" matches blocked "example5.com"
# but "notexample5.com" does not).
BLOCKED_DOMAINS = (
    "example5.com",          # blocks every .com variant of group 5
    "media.example7.com",    # blocks only the cdn.media variant of group 7
    "www.example11.com",     # blocks only the www variant of group 11
    "example9.org",          # blocks only the .org variant of group 9
    "example999.com",        # matches nothing — pins inert blocklist rows
)
HOST_FROM_URL_RE = r"^[a-z]+://([^/:?#]+)"


def default_blocklist(spark) -> DataFrame:
    """The fixed gate blocklist as a 1-column relation. Real deployments
    swap in a read of their curated list; everything downstream only
    assumes the relation is metadata-scale (blocklists are ~10^5-10^6
    rows — broadcast-sized by nature)."""
    return spark.createDataFrame(
        [(d,) for d in BLOCKED_DOMAINS], "domain string"
    )


def synthetic_frontier_corpus(docs: DataFrame) -> DataFrame:
    """(doc_id, url): a deterministic frontier with SUBDOMAIN structure —
    the url_dedup synthetic corpus (above) exercises canonicalization but
    its hosts are all 2-label, so it cannot gate suffix matching. Groups
    of 4 doc_ids share a site number N = (doc_id//4) % 50; the 4 variants
    are the bare host, a www subdomain, a 2-deep cdn.media subdomain, and
    a sibling .org host."""
    # integer DIV, not double `/`: the double round-trip loses integer
    # precision past 2^53 and would diverge from the twin's exact `//`
    n = (F.expr("doc_id DIV 4") % 50).cast("string")
    v = F.pmod(F.col("doc_id"), F.lit(4))
    site = F.concat(F.lit("example"), n)
    host = (
        F.when(v == 0, F.concat(site, F.lit(".com")))
        .when(v == 1, F.concat(F.lit("www."), site, F.lit(".com")))
        .when(v == 2, F.concat(F.lit("cdn.media."), site, F.lit(".com")))
        .otherwise(F.concat(site, F.lit(".org")))
    )
    url = F.concat(
        F.lit("http://"), host, F.lit("/p/"), F.col("doc_id").cast("string")
    )
    return docs.select("doc_id", url.alias("url"))


def synthetic_frontier_corpus_sql(source: str = "documents") -> str:
    """DuckDB twin of synthetic_frontier_corpus."""
    n = "CAST(CAST(doc_id // 4 AS BIGINT) % 50 AS VARCHAR)"
    site = f"concat('example', {n})"
    return f"""
SELECT doc_id,
       concat('http://',
              CASE doc_id % 4
                WHEN 0 THEN concat({site}, '.com')
                WHEN 1 THEN concat('www.', {site}, '.com')
                WHEN 2 THEN concat('cdn.media.', {site}, '.com')
                ELSE concat({site}, '.org')
              END,
              '/p/', CAST(doc_id AS VARCHAR)) AS url
FROM {source}"""


def blocklist_filter(frontier: DataFrame, blocklist: DataFrame) -> DataFrame:
    """(doc_id, host, blocked_domain, keep): label-boundary suffix match of
    each URL's host against a blocked-domain relation; keep=0 when any
    suffix (down to 2 labels) is listed, blocked_domain = the
    lexicographically smallest matching entry (deterministic under
    multi-hit).

    Scale shape: the per-host candidate set is its own >= 2-label suffix
    list — bounded by label count, never corpus-sized fan-out beyond
    ~4x — equi-joined against the BROADCAST blocklist (metadata-scale by
    nature); only the HITS relation (blocked docs) aggregates and joins
    back, which AQE broadcasts when small. The corpus-sized side is never
    shuffled: one scan + one bounded explode + a broadcast join each way.
    """
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
    hits = (
        hosts.select("doc_id", F.explode(sufs).alias("domain"))
        .join(F.broadcast(blocklist), "domain")
        .groupBy("doc_id")
        .agg(F.min("domain").alias("blocked_domain"))
    )
    return hosts.join(hits, "doc_id", "left").select(
        "doc_id",
        "host",
        "blocked_domain",
        F.when(F.col("blocked_domain").isNull(), F.lit(1))
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("keep"),
    )


def blocklist_filter_oracle_sql(source: str = "documents") -> str:
    """DuckDB twin of blocklist_filter over the synthetic frontier."""
    bl = ", ".join(f"'{d}'" for d in BLOCKED_DOMAINS)
    return f"""
WITH bl AS (
  SELECT unnest([{bl}]) AS domain
), hosts AS (
  SELECT doc_id,
         lower(regexp_extract(url, '{HOST_FROM_URL_RE}', 1)) AS host
  FROM ({synthetic_frontier_corpus_sql(source)})
), suf AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(labels)),
                i -> array_to_string(labels[i:], '.'))) AS domain
  FROM (SELECT doc_id, string_split(host, '.') AS labels FROM hosts)
), hits AS (
  SELECT s.doc_id, min(s.domain) AS blocked_domain
  FROM suf s JOIN bl USING (domain)
  GROUP BY s.doc_id
)
SELECT h.doc_id, h.host, hits.blocked_domain,
       CAST(CASE WHEN hits.blocked_domain IS NULL THEN 1 ELSE 0 END
            AS BIGINT) AS keep
FROM hosts h LEFT JOIN hits USING (doc_id)"""


# --------------------------------------------------------- per-domain capping
DOMAIN_CAP_K = 3


def domain_cap(frontier: DataFrame, k: int = DOMAIN_CAP_K) -> DataFrame:
    """(doc_id, host, rank): keep at most k pages per host, chosen by a
    DETERMINISTIC md5 rank (ties impossible: doc_id salts the key) — the
    crawl-politeness / anti-boilerplate quota every curation pipeline
    applies to hot domains (a handful of hosts otherwise dominate the
    corpus). A seeded hash rank, not rand(): reproducible across runs,
    engines, and parallelism levels.

    Scale shape: one keyed window exchange on host. The skew caveat is
    self-limiting: hot hosts are exactly the groups being capped, and the
    window computes row_number only — no carried payload; if one host
    ever dominated a partition, the two-phase salted pattern
    (tile_rollup_salted) applies: per-salt top-k first, then top-k of the
    k×salts survivors — same final relation."""
    k = int(k)
    host = F.lower(F.regexp_extract("url", HOST_FROM_URL_RE, 1))
    ranked = frontier.select(
        "doc_id",
        host.alias("host"),
        F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":cap")))
        .alias("rk"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("host").orderBy("rk", "doc_id")
    return (
        ranked.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("doc_id", "host", "rank")
    )


def domain_cap_oracle_sql(
    source: str = "documents", k: int = DOMAIN_CAP_K
) -> str:
    """DuckDB twin of domain_cap over the synthetic frontier."""
    k = int(k)
    return f"""
WITH ranked AS (
  SELECT doc_id,
         lower(regexp_extract(url, '{HOST_FROM_URL_RE}', 1)) AS host,
         md5(CAST(doc_id AS VARCHAR) || ':cap') AS rk
  FROM ({synthetic_frontier_corpus_sql(source)})
)
SELECT doc_id, host,
       CAST(row_number() OVER (PARTITION BY host ORDER BY rk, doc_id)
            AS BIGINT) AS rank
FROM ranked
QUALIFY rank <= {k}"""


# ----------------------------------------------------- overlapping chunking
# Sliding-window token chunking: split each document into stride-aligned
# chunks of at most `size` tokens with `size - stride` tokens of overlap —
# the context-window prep step for embedding / retrieval indexing (and the
# long-doc variant of sequence packing when documents must stay intact
# inside a chunk). Chunk starts are 1, 1+stride, ..., 1+K*stride with
# K = ceil(max(n - size, 0) / stride): the minimal stride-aligned set that
# covers every token (no fully-contained trailing chunk is ever emitted —
# K is 0 when one chunk suffices). Pure zero-shuffle projection + bounded
# explode (~n/stride rows per doc); all arithmetic int64.
# defaults sized so the synthetic gate corpus (<= 99-token docs)
# genuinely multi-chunks — a vacuous gate would pass with any start rule
CHUNK_SIZE = 48
CHUNK_STRIDE = 32


def chunk_overlap(docs: DataFrame, size: int = CHUNK_SIZE,
                  stride: int = CHUNK_STRIDE) -> DataFrame:
    """(doc_id, chunk_id, start_tok, n_tokens, chunk_text): stride-aligned
    overlapping token windows per document; chunk_id is 0-based, start_tok
    1-based. Docs with zero whitespace tokens emit no rows."""
    from .textstats import ws_word_array

    if not (0 < stride <= size):
        raise ValueError("require 0 < stride <= size")
    s, t = int(size), int(stride)
    ws = ws_word_array(F.col("text"))
    based = docs.select(
        "doc_id",
        ws.alias("ws"),
        F.size(ws).cast("bigint").alias("n"),
    ).filter(F.col("n") >= 1)
    based = based.withColumn(
        "k", F.expr(f"(greatest(n - {s}, 0) + {t} - 1) div {t}")
    )
    return (
        based.select(
            "doc_id", "ws", "n",
            F.explode(F.expr("sequence(0, k)")).alias("chunk_id"),
        )
        .select(
            "doc_id",
            F.col("chunk_id").cast("bigint").alias("chunk_id"),
            (F.col("chunk_id") * t + 1).cast("bigint").alias("start_tok"),
            F.least(
                F.lit(s).cast("bigint"),
                F.col("n") - F.col("chunk_id") * t,
            ).cast("bigint").alias("n_tokens"),
            F.concat_ws(
                " ",
                F.expr(f"slice(ws, chunk_id * {t} + 1, {s})"),
            ).alias("chunk_text"),
        )
    )


def chunk_overlap_oracle_sql(source: str = "documents",
                             size: int = CHUNK_SIZE,
                             stride: int = CHUNK_STRIDE) -> str:
    """DuckDB twin: identical tokenizer, start set, and slicing."""
    from .textstats import ws_word_array_sql

    s, t = int(size), int(stride)
    return f"""
WITH based AS (
  SELECT doc_id, {ws_word_array_sql("text")} AS ws,
         CAST(len({ws_word_array_sql("text")}) AS BIGINT) AS n
  FROM {source}
), keyed AS (
  SELECT doc_id, ws, n,
         CAST((greatest(n - {s}, 0) + {t} - 1) // {t} AS BIGINT) AS k
  FROM based WHERE n >= 1
), exploded AS (
  SELECT doc_id, ws, n,
         CAST(unnest(generate_series(0, k)) AS BIGINT) AS chunk_id
  FROM keyed
)
SELECT doc_id, chunk_id,
       CAST(chunk_id * {t} + 1 AS BIGINT) AS start_tok,
       CAST(least({s}, n - chunk_id * {t}) AS BIGINT) AS n_tokens,
       array_to_string(
         ws[CAST(chunk_id * {t} + 1 AS BIGINT)
            :CAST(least(chunk_id * {t} + {s}, n) AS BIGINT)],
         ' ') AS chunk_text
FROM exploded
"""


# ------------------------------------------------------------ snapshot diff
# Crawl-snapshot delta: classify every URL across two crawl snapshots as
# added / removed / changed / unchanged — the table a recrawl scheduler and
# an incremental-ingest job read (only `added`+`changed` flow into the
# curation pipeline; `removed` triggers tombstones). ONE url-keyed full
# outer join; change detection compares md5(text) so the corpus text never
# crosses the exchange twice. Scale: url-keyed equi-join, no windows.
#
# The testdata has one snapshot, so the gate derives the pair
# deterministically (the incremental_split precedent, dedup.py): a 1-in-21
# md5(url) bucket is ONLY in the new snapshot (added), a second bucket is
# ONLY in the old (removed), a third has its new-side text rewritten
# (changed) — identically derived in both engines.
SNAP_MOD = 21


def _url_bucket(url) -> F.Column:
    return (
        F.conv(F.substring(F.md5(url), 1, 8), 16, 10)
        .cast("bigint") % SNAP_MOD
    )


def snapshot_split(pages: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(new_snapshot, old_snapshot) derived from one pages table: bucket 0
    exists only in new, bucket 1 only in old, bucket 2 changed in new."""
    b = _url_bucket(F.col("url"))
    old = pages.filter(b != 0).select("url", "text")
    new = pages.filter(b != 1).select(
        "url",
        F.when(b == 2, F.concat(F.col("text"), F.lit(" [updated]")))
        .otherwise(F.col("text")).alias("text"),
    )
    return new, old


def snapshot_diff(new: DataFrame, old: DataFrame) -> DataFrame:
    """(url, status): added | removed | changed | unchanged per URL across
    two snapshots; change = md5(text) differs."""
    n = new.select("url", F.md5("text").alias("h_new"))
    o = old.select("url", F.md5("text").alias("h_old"))
    return n.join(o, "url", "full_outer").select(
        "url",
        F.when(F.col("h_old").isNull(), F.lit("added"))
        .when(F.col("h_new").isNull(), F.lit("removed"))
        .when(F.col("h_new") != F.col("h_old"), F.lit("changed"))
        .otherwise(F.lit("unchanged")).alias("status"),
    )


def snapshot_diff_oracle_sql(pages_source: str) -> str:
    """DuckDB twin: same md5(url) bucket derivation and md5(text)
    comparison."""
    bucket = f"(('0x' || substr(md5(url), 1, 8))::BIGINT % {SNAP_MOD})"
    return f"""
WITH old_snap AS (
  SELECT url, md5(text) AS h_old FROM {pages_source}
  WHERE {bucket} != 0
), new_snap AS (
  SELECT url,
         md5(CASE WHEN {bucket} = 2 THEN text || ' [updated]'
                  ELSE text END) AS h_new
  FROM {pages_source}
  WHERE {bucket} != 1
)
SELECT COALESCE(n.url, o.url) AS url,
       CASE WHEN o.h_old IS NULL THEN 'added'
            WHEN n.h_new IS NULL THEN 'removed'
            WHEN n.h_new != o.h_old THEN 'changed'
            ELSE 'unchanged' END AS status
FROM new_snap n FULL OUTER JOIN old_snap o ON n.url = o.url
"""


# --------------------------------------------------------------------------
# URL template mining: collapse URL paths to their structural shape
# (digit runs -> {d}, long hex runs -> {x}) and profile the crawl by
# (host, template). The standard frontier-curation move: a template with
# 10^9 pages and 10^9 distinct URLs is a crawler trap / session-id mill
# (distinct/page ratio ~1), a template with 10^9 pages and 10^2 distinct
# URLs is boilerplate re-fetch; both get capped before the next crawl.
# Pure Catalyst regex (RE2-and-Java-compatible, the T42 dialect
# discipline) + ONE keyed groupBy — the corpus never shuffles twice.
# Hex runs collapse BEFORE digit runs (a digit run inside a 16-char hex
# id would otherwise shred it into '{d}a{d}f...'); {8,}-length keeps
# short hex-looking words ('cafe', 'dead') literal.
URL_TEMPLATE_HEX_RE = "[0-9a-f]{8,}"
URL_TEMPLATE_DIGIT_RE = "[0-9]+"


def url_template(url) -> F.Column:
    """host + structural path template for one URL column (scheme and
    query dropped; hex runs >= 8 -> {x}, then digit runs -> {d})."""
    u = F.col(url) if isinstance(url, str) else url
    hostpath = F.regexp_replace(
        F.regexp_replace(u, r"^[a-z]+://", ""), r"[?#][\s\S]*", ""
    )
    t = F.regexp_replace(hostpath, URL_TEMPLATE_HEX_RE, "{x}")
    return F.regexp_replace(t, URL_TEMPLATE_DIGIT_RE, "{d}")


def url_templates(frontier: DataFrame) -> DataFrame:
    """(template, n_pages, n_urls, sample_url) per structural template
    over a (doc_id, url) frontier: page count, DISTINCT-URL count (the
    trap signal), and the lexicographically first concrete URL as the
    human-readable witness."""
    return (
        frontier.select(
            url_template("url").alias("template"), F.col("url")
        )
        .groupBy("template")
        .agg(
            F.count("*").cast("bigint").alias("n_pages"),
            F.countDistinct("url").cast("bigint").alias("n_urls"),
            F.min("url").alias("sample_url"),
        )
    )


def synthetic_path_corpus(docs: DataFrame) -> DataFrame:
    """(doc_id, url): a deterministic frontier with PATH-SHAPE structure —
    the url_dedup/frontier corpora pin canonicalization and suffix
    matching but their paths are all one shape. Five shapes cycle by
    doc_id: dated articles, product ids, 16-hex session ids (the trap
    shape: one page per URL), a constant asset path, and nested user
    profiles; hosts cycle mod 7."""
    d = F.col("doc_id")
    host = F.concat(
        F.lit("http://site"), (d % 7).cast("string"), F.lit(".example.com")
    )
    v = F.pmod(d, F.lit(5))
    hex16 = F.substring(F.md5(d.cast("string")), 1, 16)
    path = (
        F.when(v == 0, F.concat(
            F.lit("/articles/20"), F.lpad((d % 25).cast("string"), 2, "0"),
            F.lit("/"), F.lpad((d % 12 + 1).cast("string"), 2, "0"),
            F.lit("/post-"), d.cast("string"),
        ))
        .when(v == 1, F.concat(F.lit("/product/"), d.cast("string")))
        .when(v == 2, F.concat(F.lit("/session/"), hex16))
        .when(v == 3, F.lit("/static/css/main.css"))
        .otherwise(F.concat(
            F.lit("/user/"), d.cast("string"), F.lit("/profile")
        ))
    )
    return docs.select("doc_id", F.concat(host, path).alias("url"))


def synthetic_path_corpus_sql(source: str = "documents") -> str:
    """DuckDB twin of synthetic_path_corpus."""
    return f"""
SELECT doc_id,
       concat('http://site', CAST(doc_id % 7 AS VARCHAR), '.example.com',
         CASE doc_id % 5
           WHEN 0 THEN concat('/articles/20',
                              lpad(CAST(doc_id % 25 AS VARCHAR), 2, '0'),
                              '/',
                              lpad(CAST(doc_id % 12 + 1 AS VARCHAR), 2, '0'),
                              '/post-', CAST(doc_id AS VARCHAR))
           WHEN 1 THEN concat('/product/', CAST(doc_id AS VARCHAR))
           WHEN 2 THEN concat('/session/',
                              substr(md5(CAST(doc_id AS VARCHAR)), 1, 16))
           WHEN 3 THEN '/static/css/main.css'
           ELSE concat('/user/', CAST(doc_id AS VARCHAR), '/profile')
         END) AS url
FROM {source}"""


def url_templates_oracle_sql(source: str = "documents") -> str:
    """DuckDB twin of url_templates over synthetic_path_corpus: identical
    regex pipeline (hex before digits, 'g' flag — DuckDB replaces only
    the first match by default where Spark replaces all)."""
    return f"""
WITH frontier AS ({synthetic_path_corpus_sql(source)}), t AS (
  SELECT regexp_replace(
           regexp_replace(
             regexp_replace(regexp_replace(url, '^[a-z]+://', ''),
                            '[?#][\\s\\S]*', ''),
             '{URL_TEMPLATE_HEX_RE}', '{{x}}', 'g'),
           '{URL_TEMPLATE_DIGIT_RE}', '{{d}}', 'g') AS template,
         url
  FROM frontier
)
SELECT template,
       CAST(count(*) AS BIGINT) AS n_pages,
       CAST(count(DISTINCT url) AS BIGINT) AS n_urls,
       min(url) AS sample_url
FROM t GROUP BY template"""
