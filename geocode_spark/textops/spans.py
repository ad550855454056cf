"""Span-level exact substring deduplication (Lee et al. 2022 style).

Beyond-reference training-data operator (SURVEY §2.8 family). Doc-level
dedup (textops.dedup T1-T4) misses the dominant duplication mode in web
corpora: long token spans repeated VERBATIM across otherwise-distinct
documents (navigation chrome, licenses, quoted passages). "Deduplicating
Training Data Makes Language Models Better" (Lee et al., ACL 2022)
removes duplicated 50-token windows; this module computes the per-doc
duplicated-window profile that filter is built from AND the rewrite
itself, Spark-first:

  1. window relation: one explode of per-position W-word rolling hashes
     (corpus-token-sized — the same accepted shape as the shingle
     relations in textops.dedup; built by Catalyst transform/sequence,
     no Python)
  2. duplicated-window relation: one keyed groupBy(hash) keeping hashes
     seen in >= 2 DISTINCT docs — bounded by |distinct duplicated
     windows|, far below corpus size
  3. per-doc profile / rewrite: keyed joins back + keyed groupBy(doc_id)

Every exchange is keyed and AQE-sizable; nothing is all-pairs.

Contract: both operators run over the whitespace-token stream (the
shared ws_word_array tokenizer), and window MATCHING is case-insensitive
(hashes fold case). span_dup_stats outputs are window COUNTS, so its
gate is exact-integer. span_dedup_rewrite reassembles the SURVIVING
words with their original casing; runs of whitespace collapse to single
spaces (word-level rewrite — byte-offset-preserving surgery would need
character spans, which a whitespace tokenizer does not keep).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..caching import persist_tracked
from .textstats import ws_word_array, ws_word_array_sql

DEFAULT_WINDOW = 8  # words per span at sandbox doc sizes (Lee et al. use 50)


def _window_hashes(w: int) -> Column:
    """array of md5(case-folded W-word window) per start position over the
    bound column "ws"; empty for docs shorter than W words."""
    n = F.size("ws")
    return F.when(
        n >= w,
        F.transform(
            F.sequence(F.lit(1), n - w + 1),
            lambda i: F.md5(F.lower(F.concat_ws(" ", F.slice("ws", i, w)))),
        ),
    ).otherwise(F.array().cast("array<string>"))


def _window_hash_sql(w: int, pos: str = "i") -> str:
    """DuckDB twin of one _window_hashes element at 1-based position
    `pos` over a list column `ws` (inclusive slicing)."""
    return f"md5(lower(array_to_string(ws[{pos}:{pos}+{w - 1}], ' ')))"


def span_dup_stats(
    docs: DataFrame, text_col: str = "text", window: int = DEFAULT_WINDOW
) -> DataFrame:
    """(doc_id, n_windows, dup_windows): per document, the number of
    W-word rolling windows and how many of them also appear verbatim
    (case-insensitively) in at least one OTHER document. Docs shorter
    than W words score (0, 0).

    A window repeated only within a single document does not count as
    duplicated (cross-doc criterion, matching Lee et al.'s definition);
    every position whose window is cross-doc-duplicated counts once.
    """
    w = int(window)
    base = docs.select("doc_id", ws_word_array(F.col(text_col)).alias("ws"))
    # wins feeds BOTH the dup aggregation and the per-doc scoring join of
    # the same returned plan; persist_tracked stops Catalyst re-running the
    # tokenize + rolling-hash + explode pipeline once per branch
    # (caching.clear_caches releases it)
    wins = persist_tracked(
        base.select("doc_id", F.explode_outer(_window_hashes(w)).alias("h"))
    )

    dup = (
        wins.filter(F.col("h").isNotNull())
        .groupBy("h")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("h", F.lit(1).alias("is_dup"))
    )

    return (
        wins.join(dup, "h", "left")
        .groupBy("doc_id")
        .agg(
            F.count("h").cast("bigint").alias("n_windows"),
            F.coalesce(F.sum("is_dup"), F.lit(0))
            .cast("bigint")
            .alias("dup_windows"),
        )
    )


def span_dedup_rewrite(
    docs: DataFrame, text_col: str = "text", window: int = DEFAULT_WINDOW
) -> DataFrame:
    """(doc_id, n_words, n_removed, text_clean): the Lee et al. transform
    itself — every word covered by at least one cross-doc-duplicated
    W-word window is cut, the remainder reassembled in order WITH their
    original casing. Overlapping duplicated windows merge naturally
    through the covered-position set.

    Scale shape: same keyed relations as span_dup_stats plus (a) a keyed
    join of word positions against duplicated-window START positions and
    (b) ONE per-doc rangeBetween window pass turning starts into coverage
    — word widx is covered iff some duplicated window starts in
    (widx-W, widx] — then (c) an order-preserving per-doc reassembly
    (array_sort over collect_list — doc-length-bounded state, the same
    accepted shape as strip_boilerplate's reassembly). The window pass
    replaces the naive explode(W rows per duplicated window) + corpus-
    sized distinct + anti-join: under heavy duplication the covered-set
    shuffle volume now never exceeds the word relation itself. No
    all-pairs work, no Python.
    """
    w = int(window)
    base = docs.select("doc_id", ws_word_array(F.col(text_col)).alias("ws"))
    # same two-consumer shape as span_dup_stats (dup agg + starts join)
    wins = persist_tracked(
        base.select(
            "doc_id", F.posexplode(_window_hashes(w)).alias("p0", "h")
        ).select("doc_id", (F.col("p0") + 1).alias("p"), "h")
    )

    dup = (
        wins.groupBy("h")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("h")
    )
    starts = (
        wins.join(dup, "h")
        .select("doc_id", F.col("p").alias("widx"))
        .groupBy("doc_id", "widx")
        .agg(F.lit(1).alias("dup_start"))
    )

    word_pos = base.select(
        "doc_id", F.posexplode("ws").alias("w0", "word")
    ).select("doc_id", (F.col("w0") + 1).alias("widx"), "word")
    cover_win = (
        Window.partitionBy("doc_id").orderBy("widx").rangeBetween(-(w - 1), 0)
    )
    kept = (
        word_pos.join(starts, ["doc_id", "widx"], "left")
        .withColumn("covered", F.max("dup_start").over(cover_win))
        .filter(F.col("covered").isNull())
    )
    re = kept.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_kept"),
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("widx", "word"))),
                lambda s: s["word"],
            ),
        ).alias("text_clean"),
    )

    return base.join(re, "doc_id", "left").select(
        "doc_id",
        F.size("ws").cast("bigint").alias("n_words"),
        (F.size("ws") - F.coalesce(F.col("n_kept"), F.lit(0)))
        .cast("bigint")
        .alias("n_removed"),
        F.coalesce(F.col("text_clean"), F.lit("")).alias("text_clean"),
    )


def span_dedup_rewrite_oracle_sql(
    source: str = "documents", window: int = DEFAULT_WINDOW
) -> str:
    """DuckDB twin of span_dedup_rewrite: identical tokenization (case
    preserved), case-folded window hashing, covered-set merge, anti-join
    keep, and ordered string_agg reassembly."""
    w = int(window)
    return rf"""
WITH words AS (
  SELECT doc_id, {ws_word_array_sql("text")} AS ws
  FROM {source}
), winp AS (
  SELECT doc_id, ws,
         unnest(range(1, greatest(len(ws) - {w} + 2, 1))) AS p
  FROM words
), wins AS (
  SELECT doc_id, p, {_window_hash_sql(w, "p")} AS h
  FROM winp
), dup AS (
  SELECT h FROM wins GROUP BY h HAVING COUNT(DISTINCT doc_id) >= 2
), cov AS (
  SELECT DISTINCT doc_id, widx FROM (
    SELECT doc_id, unnest(range(p, p + {w})) AS widx
    FROM wins JOIN dup USING (h)
  )
), wp AS (
  SELECT doc_id, widx, ws[widx] AS word FROM (
    SELECT doc_id, ws, unnest(range(1, len(ws) + 1)) AS widx FROM words
  )
), kept AS (
  SELECT w.doc_id, w.widx, w.word
  FROM wp w ANTI JOIN cov c USING (doc_id, widx)
), re AS (
  SELECT doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_kept,
         string_agg(word, ' ' ORDER BY widx) AS text_clean
  FROM kept GROUP BY doc_id
)
SELECT w.doc_id,
       CAST(len(ws) AS BIGINT) AS n_words,
       CAST(len(ws) - COALESCE(r.n_kept, 0) AS BIGINT) AS n_removed,
       COALESCE(r.text_clean, '') AS text_clean
FROM words w LEFT JOIN re r USING (doc_id)"""


def span_dup_oracle_sql(
    source: str = "documents", window: int = DEFAULT_WINDOW
) -> str:
    """DuckDB twin of span_dup_stats: identical tokenization, case-folded
    window hashing, cross-doc criterion, and integer counts."""
    w = int(window)
    return rf"""
WITH words AS (
  SELECT doc_id, {ws_word_array_sql("text")} AS ws
  FROM {source}
), wins AS (
  SELECT doc_id,
         unnest(list_transform(range(1, greatest(len(ws) - {w} + 2, 1)),
                i -> {_window_hash_sql(w)})) AS h
  FROM words
), dup AS (
  SELECT h FROM wins GROUP BY h HAVING COUNT(DISTINCT doc_id) >= 2
), per AS (
  SELECT w.doc_id, COUNT(*) AS n_w, COUNT(d.h) AS d_w
  FROM wins w LEFT JOIN dup d ON w.h = d.h
  GROUP BY w.doc_id
)
SELECT wd.doc_id,
       CAST(COALESCE(p.n_w, 0) AS BIGINT) AS n_windows,
       CAST(COALESCE(p.d_w, 0) AS BIGINT) AS dup_windows
FROM words wd LEFT JOIN per p USING (doc_id)"""
