"""Line-level corpus curation: boilerplate stripping + epoch shuffle.

Beyond-reference training-data operators (SURVEY §2.8 family; no reference
analog — the toolbox, reference geocode.py, never looks inside page text
beyond the address fields). These are the remaining webtext-pipeline stages
between raw crawl text and the trainer:

- **strip_boilerplate** — C4/RefinedWeb-style cross-document line dedup:
  a line occurring in ≥ `min_df` distinct documents (cookie banners, nav
  bars, copyright footers) is boilerplate and is removed from every
  document; text is reassembled in original line order. Plan shape: one
  explode to line rows, one keyed groupBy to find frequent lines, a
  broadcast left join to flag them (the frequent-line relation is bounded
  by total_lines / min_df — dictionary-sized when min_df scales with the
  corpus), and one groupBy(doc_id) to reassemble. The only corpus-sized
  shuffle is the reassembly, which any line-rewrite op must pay.
- **epoch_shuffle** — deterministic global shuffle for training epoch E:
  shuffle key = md5(seed, doc_id); documents are bucketed into `n_shards`
  output shards by key prefix and positioned within their shard by key
  order. No global sort: one hash exchange on shard + in-partition sort,
  the shard files ARE the shuffled order (trainer reads shards in index
  order). Re-running with the same seed reproduces the epoch exactly;
  changing the seed re-shuffles.

Both are oracle-gated: DuckDB computes the identical line recurrence /
md5 ordering (md5 and string_split exist in both dialects).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_MIN_DF = 10
DEFAULT_EPOCH_SHARDS = 8


# ------------------------------------------------- boilerplate line removal
def strip_boilerplate(docs: DataFrame, min_df: int = DEFAULT_MIN_DF,
                      text_col: str = "text") -> DataFrame:
    """(doc_id, clean_text, n_lines_kept, n_lines_removed).

    Lines are `text` split on '\\n'. A line is boilerplate iff it occurs in
    ≥ min_df distinct documents; every occurrence is removed. A document
    whose lines are all boilerplate survives with clean_text = ''.

    The frequent-lines relation is explicitly broadcast: its size is
    bounded by total_lines / min_df (each member needs min_df distinct
    supporting docs), so with min_df scaled to the corpus it stays
    dictionary-sized at 100 TB; if a deployment wants an unbounded min_df=2,
    drop the hint and let AQE pick the join strategy.
    """
    lines = docs.select(
        "doc_id", F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line")
    )
    frequent = (
        lines.groupBy("line")
        .agg(F.count_distinct("doc_id").alias("df"))
        .filter(F.col("df") >= int(min_df))
        .select("line", F.lit(True).alias("is_bp"))
    )
    flagged = lines.join(F.broadcast(frequent), "line", "left")
    kept_struct = F.array_sort(
        F.collect_list(
            F.when(F.col("is_bp").isNull(), F.struct("pos", "line"))
        )
    )
    return flagged.groupBy("doc_id").agg(
        F.concat_ws(
            "\n", F.transform(kept_struct, lambda s: s["line"])
        ).alias("clean_text"),
        F.sum(F.when(F.col("is_bp").isNull(), 1).otherwise(0))
        .cast("bigint").alias("n_lines_kept"),
        F.sum(F.when(F.col("is_bp").isNotNull(), 1).otherwise(0))
        .cast("bigint").alias("n_lines_removed"),
    )


def strip_boilerplate_oracle_sql(lines_source_sql: str,
                                 min_df: int = DEFAULT_MIN_DF) -> str:
    """DuckDB twin over a (doc_id, text) SELECT. string_agg(... ORDER BY
    pos) FILTER matches Spark's sorted-collect reassembly; coalesce('')
    matches concat_ws on an all-filtered array."""
    return f"""
WITH src AS ({lines_source_sql}),
lines AS (
  SELECT doc_id,
         unnest(string_split(text, chr(10))) AS line,
         unnest(range(1, len(string_split(text, chr(10))) + 1)) AS pos
  FROM src
), bp AS (
  SELECT line FROM lines GROUP BY line
  HAVING count(DISTINCT doc_id) >= {int(min_df)}
), flagged AS (
  SELECT l.doc_id, l.line, l.pos, (b.line IS NOT NULL) AS is_bp
  FROM lines l LEFT JOIN bp b USING (line)
)
SELECT doc_id,
       coalesce(string_agg(line, chr(10) ORDER BY pos)
                FILTER (WHERE NOT is_bp), '') AS clean_text,
       CAST(count(*) FILTER (WHERE NOT is_bp) AS BIGINT) AS n_lines_kept,
       CAST(count(*) FILTER (WHERE is_bp) AS BIGINT) AS n_lines_removed
FROM flagged
GROUP BY doc_id"""


# ------------------------------------------------ keep-first line dedup
def line_dedup_keep_first(docs: DataFrame,
                          text_col: str = "text") -> DataFrame:
    """(doc_id, clean_text, n_lines_kept, n_lines_removed): C4-style
    GLOBAL exact line deduplication — every non-empty line value keeps
    only its FIRST occurrence corpus-wide (ordered by (doc_id, pos));
    later occurrences are removed and each document reassembles its
    surviving lines in order. Complements strip_boilerplate: that
    operator removes ALL occurrences of frequent lines, this one
    removes REPEATS of any line. Empty lines are never deduplicated
    (removing every blank line in the corpus but one would be
    nonsense, and '' would be a mega-hot shuffle key).

    Scale shape: one keyed groupBy(line) to the first-occurrence
    relation, one shuffle-hash join back on line (hinted: both sides
    are corpus-scale so sort-merge would sort line STRINGS; hashing
    them is strictly cheaper, and AQE handles hot-line skew), and the
    groupBy(doc_id) reassembly every line-rewrite op must pay. No
    broadcast: |distinct lines| is corpus-scale at 100 TB. The
    first-occurrence min is taken over a PACKED int64 ordinal
    (doc_id * 2^21 + pos) rather than min(struct(doc_id, pos)):
    struct min is not hash-aggregable in Spark and silently demotes
    the aggregation to SortAggregate — a corpus-wide sort (plan-
    checked in tests). The packing bounds (doc_id < 2^42, < 2^21
    lines per doc) are raise_error-guarded, not assumed.
    """
    # coalesce NULL text: split(NULL) explodes to zero rows and the doc
    # would VANISH from the output instead of surviving as ('', 1, 0)
    lines = docs.select(
        "doc_id",
        F.posexplode(
            F.split(F.coalesce(F.col(text_col), F.lit("")), "\n")
        ).alias("pos", "line"),
    )
    ordinal = F.when(
        (F.col("doc_id") >= 0)
        & (F.col("doc_id") < F.lit(1 << 42).cast("bigint"))
        & (F.col("pos") < F.lit(1 << 21)),
        F.col("doc_id").cast("bigint") * F.lit(1 << 21).cast("bigint")
        + F.col("pos").cast("bigint"),
    ).otherwise(
        F.raise_error(
            F.lit(
                "line_dedup_keep_first: doc_id/pos outside the packed-"
                "ordinal bounds (doc_id < 2^42, pos < 2^21)"
            )
        ).cast("bigint")
    )
    lines = lines.withColumn("ord", ordinal)
    first = (
        lines.filter(F.col("line") != "")
        .groupBy("line")
        .agg(F.min("ord").alias("first_ord"))
    )
    flagged = lines.join(first.hint("shuffle_hash"), "line", "left")
    is_kept = (F.col("line") == "") | (F.col("ord") == F.col("first_ord"))
    kept_struct = F.array_sort(
        F.collect_list(F.when(is_kept, F.struct("pos", "line")))
    )
    return flagged.groupBy("doc_id").agg(
        F.concat_ws(
            "\n", F.transform(kept_struct, lambda s: s["line"])
        ).alias("clean_text"),
        F.sum(is_kept.cast("bigint")).cast("bigint").alias("n_lines_kept"),
        F.sum((~is_kept).cast("bigint"))
        .cast("bigint")
        .alias("n_lines_removed"),
    )


def line_dedup_keep_first_oracle_sql(lines_source_sql: str) -> str:
    """DuckDB twin over a (doc_id, text) SELECT: row_number over
    (line ORDER BY doc_id, pos) = 1 marks the keeper — the window
    formulation is clearer in SQL; the engine's min-struct + join is
    the shuffle-cheaper equivalent."""
    return f"""
WITH src AS (
  SELECT doc_id, COALESCE(text, '') AS text FROM ({lines_source_sql})
),
lines AS (
  SELECT doc_id,
         unnest(string_split(text, chr(10))) AS line,
         unnest(range(1, len(string_split(text, chr(10))) + 1)) AS pos
  FROM src
), ranked AS (
  SELECT doc_id, line, pos,
         (line = '' OR row_number() OVER (
            PARTITION BY line ORDER BY doc_id, pos) = 1) AS is_kept
  FROM lines
)
SELECT doc_id,
       coalesce(string_agg(line, chr(10) ORDER BY pos)
                FILTER (WHERE is_kept), '') AS clean_text,
       CAST(count(*) FILTER (WHERE is_kept) AS BIGINT) AS n_lines_kept,
       CAST(count(*) FILTER (WHERE NOT is_kept) AS BIGINT)
         AS n_lines_removed
FROM ranked
GROUP BY doc_id"""


def synthetic_line_corpus(docs: DataFrame) -> DataFrame:
    """(doc_id, text): deterministic multi-line corpus for the boilerplate
    gate — the testdata documents are single-line, so the gate synthesizes
    line structure (same pattern as the synthetic URL / image corpora).

    Each document becomes 4 lines: a unique content line (its original
    text prefix), a footer shared by doc_id % 7 (7 variants × corpus/7
    docs each — boilerplate at any reasonable min_df), a nav line shared
    by ALL docs, and a second content line that is empty for 1 doc in 3
    (empty lines collapse into boilerplate too once min_df is met)."""
    footer = F.concat(
        F.lit("(c) example site "), F.pmod(F.col("doc_id"), F.lit(7)).cast("string")
    )
    tail = F.when(
        F.pmod(F.col("doc_id"), F.lit(3)) == 0, F.lit("")
    ).otherwise(F.concat(F.lit("p2 "), F.substring(F.col("text"), 1, 40)))
    text = F.concat_ws(
        "\n",
        F.substring(F.col("text"), 1, 60),
        footer,
        F.lit("home | about | contact"),
        tail,
    )
    return docs.select("doc_id", text.alias("text"))


def synthetic_line_corpus_sql(source: str = "documents") -> str:
    return f"""
SELECT doc_id,
       concat_ws(chr(10),
         text[1:60],
         concat('(c) example site ', CAST(doc_id % 7 AS VARCHAR)),
         'home | about | contact',
         CASE WHEN doc_id % 3 = 0 THEN ''
              ELSE concat('p2 ', text[1:40]) END) AS text
FROM {source}"""


# -------------------------------------------------- deterministic epoch shuffle
def epoch_shuffle(docs: DataFrame, seed: int = 0,
                  n_shards: int = DEFAULT_EPOCH_SHARDS) -> DataFrame:
    """(doc_id, shard, shard_pos): the order the trainer reads for this
    epoch — shard files in index order, rows by shard_pos within a shard.

    shuffle_key = md5(seed || '-' || doc_id) gives a uniform deterministic
    permutation; shard = first 8 hex chars of the key mod n_shards, so
    shard sizes are balanced and no stage ever sees a global sort: the
    plan is one hash exchange on shard + per-shard sort over
    (key, doc_id)-sized rows. Different seed → different permutation;
    same seed → byte-identical epoch, which is what makes training
    resumable mid-epoch.
    """
    key = F.md5(F.concat_ws("-", F.lit(int(seed)).cast("string"),
                            F.col("doc_id").cast("string")))
    base = docs.select(
        "doc_id",
        key.alias("shuffle_key"),
    ).select(
        "doc_id",
        "shuffle_key",
        F.pmod(
            F.conv(F.substring("shuffle_key", 1, 8), 16, 10).cast("bigint"),
            F.lit(int(n_shards)),
        ).alias("shard"),
    )
    w = Window.partitionBy("shard").orderBy("shuffle_key", "doc_id")
    return base.select(
        "doc_id",
        "shard",
        (F.row_number().over(w) - 1).cast("bigint").alias("shard_pos"),
    )


def epoch_shuffle_oracle_sql(source: str = "documents", seed: int = 0,
                             n_shards: int = DEFAULT_EPOCH_SHARDS) -> str:
    key = f"md5(concat(CAST({int(seed)} AS VARCHAR), '-', CAST(doc_id AS VARCHAR)))"
    return f"""
WITH keyed AS (
  SELECT doc_id, {key} AS shuffle_key,
         CAST(CAST(concat('0x', {key}[1:8]) AS BIGINT) % {int(n_shards)}
              AS BIGINT) AS shard
  FROM {source}
)
SELECT doc_id, shard,
       CAST(row_number() OVER (PARTITION BY shard
                               ORDER BY shuffle_key, doc_id) - 1
            AS BIGINT) AS shard_pos
FROM keyed"""
