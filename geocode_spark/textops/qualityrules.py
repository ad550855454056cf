"""Document quality-rule filters (Gopher and C4 style).

Beyond-reference training-data operators (SURVEY §2.8 family; no
reference analog — the toolbox, reference geocode.py, never inspects
page text beyond the address fields). Web-corpus curation pipelines gate
documents on cheap surface heuristics before any model-based scoring:

- **gopher_quality** — the Rae et al. 2021 (Gopher, Appendix A1.1)
  rule set: word count in [50, 100 000], mean word length in [3, 10],
  symbol-to-word ratio ('#' or ellipsis) <= 0.1, <= 90% of lines
  starting with a bullet, <= 30% of lines ending in an ellipsis,
  >= 80% of words containing an alphabetic character, and >= 2 of a
  fixed 8-stopword list present. Each rule is emitted as its own 0/1
  column plus the conjunction, so a pipeline can re-weight rules
  without re-scanning.
- **c4_line_filter** — the Raffel et al. 2020 (C4) line-level
  cleanup: keep only lines that end in terminal punctuation, have
  >= 5 words, contain no '{', and mention none of the boilerplate
  phrases (javascript / lorem ipsum / privacy policy / terms of use /
  cookie policy); a document keeps its cleaned text and is flagged
  keep_doc iff >= 3 sentences survive.

Scale shape: both operators are pure Catalyst projections over the doc
row — split / filter / aggregate higher-order functions on the line and
token arrays, ZERO exchanges, fully pipelined into the parquet scan.
At 100 TB they are scan-bound, which is the correct bound for a
surface-heuristic pass.

Integer-exactness: every ratio rule is evaluated as an integer
cross-multiplication (e.g. ``10 * n_sym <= n_words`` for the 0.1
symbol-ratio bound), so the engine and its DuckDB oracle twin can never
diverge on float rounding, and /0 never arises (empty docs fail the
word-count rule and every comparison is multiplication-only).

Regex dialect: all patterns restrict to the RE2-and-Java-common subset
(ASCII classes, explicit alternations, ^/$ on SPLIT lines — no \\s, no
lookaround), the same discipline as textops.textstats. The alternation
``#|\\.\\.\\.|…`` is unambiguous at any position, so Java's
leftmost-first and RE2's leftmost-longest semantics agree.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .textstats import ws_word_array, ws_word_array_sql

# Gopher's fixed stopword list (Rae et al. 2021, A1.1): >= 2 must appear
# as exact (case-folded) whitespace tokens.
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")
SYMBOL_RE = r"(#|\.\.\.|…)"
BULLET_RE = "^[ \t]*[-*•]"
ELLIPSIS_RE = r"(\.\.\.|…)[ \t\r]*$"
ALPHA_RE = "[A-Za-z]"
# C4 line-keep surface: terminal punctuation (trailing spaces / a
# carriage return from CRLF corpora are tolerated), >= 5 words, no code
# brace, none of the boilerplate phrases.
C4_TERMINAL_RE = '[.!?"][ \t\r]*$'
C4_BAD_PHRASES = (
    "javascript",
    "lorem ipsum",
    "privacy policy",
    "terms of use",
    "cookie policy",
)
C4_MIN_LINE_WORDS = 5
C4_MIN_SENTENCES = 3
# one sentence = a terminal mark followed by whitespace (a sentinel
# newline is appended before counting so the final mark counts)
SENTENCE_RE = r"([.!?][ \t\r\n])"


def _flag(cond: Column) -> Column:
    """0/1 bigint rule flag — integer, never boolean, so the value hash
    canonicalizes identically across Spark and DuckDB->pandas dtypes."""
    return F.when(cond, F.lit(1)).otherwise(F.lit(0)).cast("bigint")


def gopher_quality(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_words, n_chars, n_lines, n_sym, n_bullet, n_ellipsis,
    n_alpha, n_stop, wc_ok, mwl_ok, sym_ok, bullet_ok, ellipsis_ok,
    alpha_ok, stop_ok, keep): the Gopher rule set per document — raw
    counts, one 0/1 flag per rule, and the conjunction."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    # stage the tokenized arrays as real columns (the sibling operators'
    # measured staging lesson): inlined, the ws_word_array tree would be
    # embedded in ~11 sibling expressions — counts plus 8 stopword probes
    staged = docs.select(
        "doc_id",
        ws_word_array(t).alias("ws"),
        F.split(t, "\n").alias("lines"),
        F.size(F.regexp_extract_all(t, F.lit(SYMBOL_RE), 1))
        .cast("bigint")
        .alias("n_sym"),
    )
    staged = staged.select(
        "*", F.transform(F.col("ws"), F.lower).alias("wsl")
    )
    ws, lines = F.col("ws"), F.col("lines")
    staged = staged.select(
        "doc_id",
        F.size(ws).cast("bigint").alias("n_words"),
        F.aggregate(
            F.transform(ws, F.length),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x.cast("bigint"),
        ).alias("n_chars"),
        F.size(lines).cast("bigint").alias("n_lines"),
        "n_sym",
        F.size(F.filter(lines, lambda line: line.rlike(BULLET_RE)))
        .cast("bigint")
        .alias("n_bullet"),
        F.size(F.filter(lines, lambda line: line.rlike(ELLIPSIS_RE)))
        .cast("bigint")
        .alias("n_ellipsis"),
        F.size(F.filter(ws, lambda word: word.rlike(ALPHA_RE)))
        .cast("bigint")
        .alias("n_alpha"),
        sum(
            (
                F.array_contains(F.col("wsl"), s).cast("bigint")
                for s in GOPHER_STOPWORDS
            ),
            F.lit(0).cast("bigint"),
        ).alias("n_stop"),
    )
    c = F.col
    flags = {
        "wc_ok": (c("n_words") >= 50) & (c("n_words") <= 100000),
        "mwl_ok": (c("n_words") > 0)
        & (3 * c("n_words") <= c("n_chars"))
        & (c("n_chars") <= 10 * c("n_words")),
        "sym_ok": 10 * c("n_sym") <= c("n_words"),
        "bullet_ok": 10 * c("n_bullet") <= 9 * c("n_lines"),
        "ellipsis_ok": 10 * c("n_ellipsis") <= 3 * c("n_lines"),
        "alpha_ok": (c("n_words") > 0)
        & (5 * c("n_alpha") >= 4 * c("n_words")),
        "stop_ok": c("n_stop") >= 2,
    }
    out = staged.select(
        "*", *[_flag(cond).alias(name) for name, cond in flags.items()]
    )
    keep = F.lit(1).cast("bigint")
    for name in flags:
        keep = keep * F.col(name)
    return out.withColumn("keep", keep)


def c4_line_filter(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, clean_text, n_lines_kept, n_lines_removed, n_sentences,
    keep_doc): the C4 line-level cleanup — lines failing the keep
    predicate are cut, survivors rejoin in order, and the document is
    flagged keep_doc iff >= C4_MIN_SENTENCES terminal punctuation marks
    survive in the cleaned text."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    lines = F.split(t, "\n")

    def keep_line(line: Column) -> Column:
        low = F.lower(line)
        cond = (
            line.rlike(C4_TERMINAL_RE)
            & (F.size(ws_word_array(line)) >= C4_MIN_LINE_WORDS)
            & ~line.contains("{")
        )
        for phrase in C4_BAD_PHRASES:
            cond = cond & ~low.contains(phrase)
        return cond

    kept = F.filter(lines, keep_line)
    clean = F.array_join(kept, "\n")
    n_kept = F.size(kept).cast("bigint")
    # sentence = terminal mark followed by whitespace or end-of-text
    # (sentinel newline appended so the final mark counts). RE2 has no
    # lookahead, so the boundary is consumed — non-overlapping scan still
    # counts 'a. b. c.' as 3 and 'version 2.5.1' as 0, the point of the
    # rule (a bare character count called one sentence per '.').
    n_sentences = F.size(
        F.regexp_extract_all(
            F.concat(clean, F.lit("\n")), F.lit(SENTENCE_RE), 1
        )
    ).cast("bigint")
    return docs.select(
        "doc_id",
        clean.alias("clean_text"),
        n_kept.alias("n_lines_kept"),
        (F.size(lines).cast("bigint") - n_kept).alias("n_lines_removed"),
        n_sentences.alias("n_sentences"),
        _flag(n_sentences >= C4_MIN_SENTENCES).alias("keep_doc"),
    )


def gopher_repetition(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_lines, dup_lines, line_chars, dup_line_chars, word_chars,
    top2_chars, top3_chars, top4_chars, dupline_ok, duplinechar_ok,
    top2_ok, top3_ok, top4_ok, keep): the Gopher (Rae et al. 2021 A1.1)
    within-document repetition rules — duplicate-line fraction <= 0.30,
    duplicate-line CHARACTER fraction <= 0.20, and the fraction of word
    characters contained in occurrences of the most frequent word
    {2,3,4}-gram <= {0.20, 0.18, 0.16}.

    Definitions (stated because the paper leaves them loose): a line is
    "duplicated" iff its exact value occurs >= 2 times in the document;
    dup_lines / dup_line_chars count ALL occurrences of duplicated
    values. top-N char mass = occurrences * characters of the gram's
    words (separators excluded), tie-broken toward the larger char mass
    — ties on BOTH count and char length leave the fraction unchanged,
    so the tiebreak never affects a flag. Ratio flags are integer
    cross-multiplications (float-free, /0-free: empty denominators fail
    their rule only through the conjunction with gopher_quality's
    word-count gate; here empty docs pass vacuously, matching "no
    repetition evidence").

    Scale shape: ZERO exchanges, like its qualityrules siblings — all
    per-document: each unit family (lines; word {2,3,4}-grams) is
    array_sorted WITHIN the doc row, equal-value runs are extracted as
    aligned (start, end) index arrays, and run statistics fold over
    them with higher-order functions. Sorting is per-doc O(u log u) on
    the doc's own units — no corpus-wide anything. Per-run maxima ride
    a PACKED int64 (count * 2^32 + char_len; a 2^31-occurrence or
    2^32-char unit would need a multi-GB single document, impossible
    before this math matters). The plan is a projection pipelined into
    the scan (plan-pinned in tests).
    """
    t = F.coalesce(F.col(text_col), F.lit(""))

    # STAGED projections: each sorted array / index array materializes
    # as a real column before anything indexes into it — an inline
    # `element_at(array_sort(...), i)` inside a per-element lambda
    # re-evaluates the sort PER ELEMENT (measured: ~14 s/doc on the gate
    # variants), and CollapseProject keeps multi-referenced non-cheap
    # aliases staged rather than re-inlining them.
    def _runs_cols(sorted_col: str, n: int = 1):
        """(starts, ends) 1-based run-boundary index arrays over an
        already-STAGED sorted array column. Neighbor access via 0-based
        F.get: out-of-bounds yields NULL (x != NULL -> NULL, absorbed by
        the i==1 / i==n disjunct) — element_at would RAISE on index 0
        under ANSI mode, and SQL OR does not short-circuit."""
        arr = F.col(sorted_col)
        size = F.size(arr)
        idx = F.when(size >= 1, F.sequence(F.lit(1), size)).otherwise(
            F.array().cast("array<int>")
        )
        starts = F.filter(
            idx,
            lambda i: (i == 1) | (F.get(arr, i - 1) != F.get(arr, i - 2)),
        )
        ends = F.filter(
            idx,
            lambda i: (i == size) | (F.get(arr, i - 1) != F.get(arr, i)),
        )
        return starts, ends

    def _sum64(arr):
        return F.aggregate(
            arr, F.lit(0).cast("bigint"),
            lambda acc, x: acc + x.cast("bigint"),
        )

    ws = ws_word_array(t)
    staged = docs.select("doc_id", ws.alias("ws"),
                         F.array_sort(F.split(t, "\n")).alias("lsort"))

    def _grams(n: int):
        arr = F.col("ws")
        return F.when(
            F.size(arr) >= n,
            F.transform(
                F.sequence(F.lit(1), F.size(arr) - (n - 1)),
                lambda i: F.concat_ws(
                    " ", *[F.element_at(arr, i + j) for j in range(n)]
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))

    staged = staged.select(
        "doc_id", "ws", "lsort",
        *[F.array_sort(_grams(n)).alias(f"g{n}sort") for n in (2, 3, 4)],
    )
    run_cols = []
    for fam in ("lsort", "g2sort", "g3sort", "g4sort"):
        s, e = _runs_cols(fam)
        run_cols += [s.alias(f"{fam}_s"), e.alias(f"{fam}_e")]
    staged = staged.select("*", *run_cols)

    def _pack_col(fam: str, n: int):
        arr = F.col(fam)
        return F.coalesce(
            F.array_max(
                F.zip_with(
                    F.col(f"{fam}_s"),
                    F.col(f"{fam}_e"),
                    lambda a, b: (b - a + 1).cast("bigint")
                    * F.lit(1 << 32).cast("bigint")
                    + (
                        F.length(F.element_at(arr, a)) - (n - 1)
                    ).cast("bigint"),
                )
            ),
            F.lit(0).cast("bigint"),
        )

    l_run_len = F.zip_with(
        F.col("lsort_s"), F.col("lsort_e"), lambda a, b: b - a + 1
    )
    l_run_chars = F.zip_with(
        F.col("lsort_s"),
        F.col("lsort_e"),
        lambda a, b: (b - a + 1).cast("bigint")
        * F.length(F.element_at(F.col("lsort"), a)).cast("bigint"),
    )
    staged = staged.select(
        "doc_id", "ws", "lsort",
        l_run_len.alias("lrl"), l_run_chars.alias("lrc"),
        *[_pack_col(f"g{n}sort", n).alias(f"pack{n}") for n in (2, 3, 4)],
    )

    def _top_chars(n: int):
        # (count) * (word chars of the gram), unpacked with exact
        # bitwise ops — float division is exact only below 2^53
        pack = F.col(f"pack{n}")
        return F.shiftright(pack, 32).cast("bigint") * pack.bitwiseAND(
            F.lit((1 << 32) - 1).cast("bigint")
        )

    counts = {
        "n_lines": F.size(F.col("lsort")).cast("bigint"),
        "dup_lines": _sum64(F.filter(F.col("lrl"), lambda r: r >= 2)),
        "line_chars": _sum64(F.col("lrc")),
        "dup_line_chars": _sum64(
            F.zip_with(
                F.col("lrl"), F.col("lrc"),
                lambda r, c: F.when(r >= 2, c).otherwise(0),
            )
        ),
        "word_chars": _sum64(F.transform(F.col("ws"), F.length)),
        "top2_chars": _top_chars(2),
        "top3_chars": _top_chars(3),
        "top4_chars": _top_chars(4),
    }
    out = staged.select(
        "doc_id", *[v.cast("bigint").alias(k) for k, v in counts.items()]
    )
    flags = {
        "dupline_ok": 10 * F.col("dup_lines") <= 3 * F.col("n_lines"),
        "duplinechar_ok": 5 * F.col("dup_line_chars")
        <= F.col("line_chars"),
        "top2_ok": 5 * F.col("top2_chars") <= F.col("word_chars"),
        "top3_ok": 50 * F.col("top3_chars") <= 9 * F.col("word_chars"),
        "top4_ok": 25 * F.col("top4_chars") <= 4 * F.col("word_chars"),
    }
    out = out.select(
        "*", *[_flag(cond).alias(name) for name, cond in flags.items()]
    )
    keep = F.lit(1).cast("bigint")
    for name in flags:
        keep = keep * F.col(name)
    return out.withColumn("keep", keep)


# ---------------------------------------------- hashed linear classifier
# fastText-style quality-classifier INFERENCE (Joulin et al. 2017; the
# model-based filter stage of CCNet / LLaMA-style curation): tokens and
# adjacent-token bigrams hash into FT_BUCKETS weight slots, the doc score
# is the sum of slot weights. Weights here are a DETERMINISTIC SYNTHETIC
# stand-in derived from the slot id (this sandbox ships no trained model
# and no external data); the plumbing — hash -> bucket -> weight sum, all
# integer, zero-shuffle — is the real inference path. A deployment with a
# trained model swaps _ft_weight for a broadcast bucket->weight map
# (model-sized, the lm.py broadcast discipline).
FT_BUCKETS = 1 << 16
_FT_MIX_A = 2654435761
_FT_MIX_C = 40503
_FT_MOD1 = 1000003
_FT_MOD2 = 100001  # weights in [-50000, 50000] micro-units


def _ft_bucket(word: Column) -> Column:
    """Slot id in [0, FT_BUCKETS): first 8 md5 hex chars as an int —
    the cross-dialect-stable hash (DuckDB twin: ('0x'||substr)::BIGINT).
    All intermediates < 2^48, so ANSI-mode bigint arithmetic never
    overflows."""
    return F.pmod(
        F.conv(F.substring(F.md5(word), 1, 8), 16, 10).cast("bigint"),
        F.lit(FT_BUCKETS).cast("bigint"),
    )


def _ft_weight(bucket: Column) -> Column:
    return (
        F.pmod(
            F.pmod(
                bucket * F.lit(_FT_MIX_A).cast("bigint")
                + F.lit(_FT_MIX_C).cast("bigint"),
                F.lit(_FT_MOD1).cast("bigint"),
            ),
            F.lit(_FT_MOD2).cast("bigint"),
        )
        - F.lit(50000).cast("bigint")
    )


def hashed_linear_score(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_terms, score_micro, label): hashed bag-of-{token,
    bigram} linear score over case-folded whitespace tokens; label = 1
    iff score_micro >= 0. Zero-exchange projection (plan-pinned);
    integer-exact in both dialects."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    staged = docs.select(
        "doc_id", ws_word_array(F.lower(t)).alias("ws")
    )
    ws = F.col("ws")
    bigrams = F.when(
        F.size(ws) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(ws) - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(ws, i), F.element_at(ws, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    staged = staged.select("doc_id", "ws", bigrams.alias("bg"))

    def _wsum(arr):
        return F.aggregate(
            F.transform(arr, lambda x: _ft_weight(_ft_bucket(x))),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        )

    score = (_wsum(F.col("ws")) + _wsum(F.col("bg"))).cast("bigint")
    n_terms = (F.size(F.col("ws")) + F.size(F.col("bg"))).cast("bigint")
    return staged.select(
        "doc_id",
        n_terms.alias("n_terms"),
        score.alias("score_micro"),
        _flag(score >= 0).alias("label"),
    )


def hashed_linear_score_oracle_sql(source: str = "documents") -> str:
    def weight(expr: str) -> str:
        bucket = f"(('0x' || substr(md5({expr}), 1, 8))::BIGINT % {FT_BUCKETS})"
        return (
            f"((({bucket} * {_FT_MIX_A} + {_FT_MIX_C}) % {_FT_MOD1})"
            f" % {_FT_MOD2} - 50000)"
        )

    return f"""
WITH w AS (
  SELECT doc_id,
         {ws_word_array_sql("lower(COALESCE(text, ''))")} AS ws
  FROM {source}
), b AS (
  SELECT doc_id, ws,
         list_transform(range(1, greatest(len(ws) - 1, 0) + 1),
                        i -> ws[i] || ' ' || ws[i + 1]) AS bg
  FROM w
), s AS (
  SELECT doc_id,
    CAST(len(ws) + len(bg) AS BIGINT) AS n_terms,
    CAST(COALESCE(list_sum(list_transform(ws, x -> {weight("x")})), 0)
       + COALESCE(list_sum(list_transform(bg, x -> {weight("x")})), 0)
       AS BIGINT) AS score_micro
  FROM b
)
SELECT doc_id, n_terms, score_micro,
  CAST(CASE WHEN score_micro >= 0 THEN 1 ELSE 0 END AS BIGINT) AS label
FROM s"""


# ------------------------------------------------------------- oracle twins
def _sql_str(s: str) -> str:
    """SQL single-quoted literal of a python string; embedded newlines
    become chr(10) concatenations so the statement stays one line."""
    parts = [
        "'" + seg.replace("'", "''") + "'" for seg in s.split("\n")
    ]
    return " || chr(10) || ".join(parts)


def gopher_quality_oracle_sql(source: str = "documents") -> str:
    stop_sum = " + ".join(
        "CAST(CASE WHEN list_contains(wsl, '" + s + "') THEN 1 ELSE 0 END"
        " AS BIGINT)"
        for s in GOPHER_STOPWORDS
    )
    return rf"""
WITH g0 AS (
  SELECT doc_id, COALESCE(text, '') AS text FROM {source}
), g AS (
  SELECT doc_id, text,
         {ws_word_array_sql("text")} AS ws,
         string_split(text, chr(10)) AS lines
  FROM g0
), gl AS (
  SELECT *, list_transform(ws, w -> lower(w)) AS wsl FROM g
), m AS (
  SELECT doc_id,
    CAST(len(ws) AS BIGINT) AS n_words,
    CAST(COALESCE(list_sum(list_transform(ws, w -> len(w))), 0) AS BIGINT)
      AS n_chars,
    CAST(len(lines) AS BIGINT) AS n_lines,
    CAST(len(regexp_extract_all(text, '{SYMBOL_RE}', 1)) AS BIGINT)
      AS n_sym,
    CAST(len(list_filter(lines, l -> regexp_matches(l, '{BULLET_RE}')))
      AS BIGINT) AS n_bullet,
    CAST(len(list_filter(lines, l -> regexp_matches(l, '{ELLIPSIS_RE}')))
      AS BIGINT) AS n_ellipsis,
    CAST(len(list_filter(ws, w -> regexp_matches(w, '{ALPHA_RE}')))
      AS BIGINT) AS n_alpha,
    CAST({stop_sum} AS BIGINT) AS n_stop
  FROM gl
)
SELECT doc_id, n_words, n_chars, n_lines, n_sym, n_bullet, n_ellipsis,
  n_alpha, n_stop,
  CAST(CASE WHEN n_words >= 50 AND n_words <= 100000 THEN 1 ELSE 0 END
    AS BIGINT) AS wc_ok,
  CAST(CASE WHEN n_words > 0 AND 3 * n_words <= n_chars
             AND n_chars <= 10 * n_words THEN 1 ELSE 0 END
    AS BIGINT) AS mwl_ok,
  CAST(CASE WHEN 10 * n_sym <= n_words THEN 1 ELSE 0 END AS BIGINT)
    AS sym_ok,
  CAST(CASE WHEN 10 * n_bullet <= 9 * n_lines THEN 1 ELSE 0 END AS BIGINT)
    AS bullet_ok,
  CAST(CASE WHEN 10 * n_ellipsis <= 3 * n_lines THEN 1 ELSE 0 END
    AS BIGINT) AS ellipsis_ok,
  CAST(CASE WHEN n_words > 0 AND 5 * n_alpha >= 4 * n_words
    THEN 1 ELSE 0 END AS BIGINT) AS alpha_ok,
  CAST(CASE WHEN n_stop >= 2 THEN 1 ELSE 0 END AS BIGINT) AS stop_ok,
  CAST(CASE WHEN n_words >= 50 AND n_words <= 100000
             AND n_words > 0 AND 3 * n_words <= n_chars
             AND n_chars <= 10 * n_words
             AND 10 * n_sym <= n_words
             AND 10 * n_bullet <= 9 * n_lines
             AND 10 * n_ellipsis <= 3 * n_lines
             AND 5 * n_alpha >= 4 * n_words
             AND n_stop >= 2 THEN 1 ELSE 0 END AS BIGINT) AS keep
FROM m"""


def c4_line_filter_oracle_sql(source: str = "documents") -> str:
    phrase_conds = " AND ".join(
        f"NOT contains(lower(l), '{p}')" for p in C4_BAD_PHRASES
    )
    keep_line = (
        f"regexp_matches(l, '{C4_TERMINAL_RE}')"
        f" AND len({ws_word_array_sql('l')}) >= {C4_MIN_LINE_WORDS}"
        " AND NOT contains(l, '{')"
        f" AND {phrase_conds}"
    )
    return rf"""
WITH g AS (
  SELECT doc_id, string_split(COALESCE(text, ''), chr(10)) AS lines
  FROM {source}
), k AS (
  SELECT doc_id, lines,
         list_filter(lines, l -> {keep_line}) AS kept
  FROM g
), c AS (
  -- array_to_string on an EMPTY list is NULL in DuckDB (Spark's
  -- array_join gives ''): coalesce, or every all-filtered doc
  -- nullifies n_sentences into a float64 pandas column
  SELECT doc_id,
         COALESCE(array_to_string(kept, chr(10)), '') AS clean_text,
         CAST(len(kept) AS BIGINT) AS n_lines_kept,
         CAST(len(lines) - len(kept) AS BIGINT) AS n_lines_removed
  FROM k
)
SELECT doc_id, clean_text, n_lines_kept, n_lines_removed,
  CAST(len(regexp_extract_all(clean_text || chr(10), '{SENTENCE_RE}', 1))
    AS BIGINT) AS n_sentences,
  CAST(CASE WHEN
    len(regexp_extract_all(clean_text || chr(10), '{SENTENCE_RE}', 1))
    >= {C4_MIN_SENTENCES} THEN 1 ELSE 0 END AS BIGINT) AS keep_doc
FROM c"""


def gopher_repetition_oracle_sql(source: str = "documents") -> str:
    """DuckDB twin of gopher_repetition — deliberately RELATIONAL
    (unnest + GROUP BY + per-doc max over the same packed int64), so the
    gate cross-checks the engine's sorted-run array formulation against
    an implementation that shares none of it."""
    gram_ctes, gram_sel, gram_join = [], [], []
    for n in (2, 3, 4):
        expr = " || ' ' || ".join(f"ws[i+{j}]" for j in range(n))
        gram_ctes.append(f"""g{n} AS (
  SELECT doc_id, unnest(list_transform(
    range(1, greatest(len(ws) - {n - 1}, 0) + 1),
    i -> {expr})) AS gram
  FROM w
), m{n} AS (
  SELECT doc_id, max(pack) AS pack FROM (
    SELECT doc_id,
           CAST(count(*) AS BIGINT) * 4294967296
             + CAST(len(gram) - {n - 1} AS BIGINT) AS pack
    FROM g{n} GROUP BY doc_id, gram
  ) GROUP BY doc_id
)""")
        gram_sel.append(
            f"COALESCE((m{n}.pack >> 32) * (m{n}.pack & 4294967295), 0)"
            f" AS top{n}_chars"
        )
        gram_join.append(f"LEFT JOIN m{n} USING (doc_id)")
    return rf"""
WITH src AS (
  SELECT doc_id, COALESCE(text, '') AS text FROM {source}
), w AS (
  SELECT doc_id, {ws_word_array_sql("text")} AS ws FROM src
), lines AS (
  SELECT doc_id, unnest(string_split(text, chr(10))) AS line FROM src
), lg AS (
  SELECT doc_id, line, count(*) AS cnt FROM lines GROUP BY doc_id, line
), ls AS (
  SELECT doc_id,
    CAST(sum(cnt) AS BIGINT) AS n_lines,
    CAST(COALESCE(sum(cnt) FILTER (WHERE cnt >= 2), 0) AS BIGINT)
      AS dup_lines,
    CAST(sum(cnt * len(line)) AS BIGINT) AS line_chars,
    CAST(COALESCE(sum(cnt * len(line)) FILTER (WHERE cnt >= 2), 0)
      AS BIGINT) AS dup_line_chars
  FROM lg GROUP BY doc_id
), wc AS (
  SELECT doc_id,
    CAST(COALESCE(list_sum(list_transform(ws, x -> len(x))), 0) AS BIGINT)
      AS word_chars
  FROM w
), {", ".join(gram_ctes)}
SELECT src.doc_id, ls.n_lines, ls.dup_lines, ls.line_chars,
  ls.dup_line_chars, wc.word_chars,
  {", ".join(gram_sel)},
  CAST(CASE WHEN 10 * ls.dup_lines <= 3 * ls.n_lines
    THEN 1 ELSE 0 END AS BIGINT) AS dupline_ok,
  CAST(CASE WHEN 5 * ls.dup_line_chars <= ls.line_chars
    THEN 1 ELSE 0 END AS BIGINT) AS duplinechar_ok,
  CAST(CASE WHEN 5 * COALESCE((m2.pack >> 32) * (m2.pack & 4294967295), 0)
    <= wc.word_chars THEN 1 ELSE 0 END AS BIGINT) AS top2_ok,
  CAST(CASE WHEN 50 * COALESCE((m3.pack >> 32) * (m3.pack & 4294967295), 0)
    <= 9 * wc.word_chars THEN 1 ELSE 0 END AS BIGINT) AS top3_ok,
  CAST(CASE WHEN 25 * COALESCE((m4.pack >> 32) * (m4.pack & 4294967295), 0)
    <= 4 * wc.word_chars THEN 1 ELSE 0 END AS BIGINT) AS top4_ok,
  CAST(CASE WHEN 10 * ls.dup_lines <= 3 * ls.n_lines
    AND 5 * ls.dup_line_chars <= ls.line_chars
    AND 5 * COALESCE((m2.pack >> 32) * (m2.pack & 4294967295), 0)
      <= wc.word_chars
    AND 50 * COALESCE((m3.pack >> 32) * (m3.pack & 4294967295), 0)
      <= 9 * wc.word_chars
    AND 25 * COALESCE((m4.pack >> 32) * (m4.pack & 4294967295), 0)
      <= 4 * wc.word_chars
    THEN 1 ELSE 0 END AS BIGINT) AS keep
FROM src JOIN ls USING (doc_id) JOIN wc USING (doc_id)
{" ".join(gram_join)}"""


# --------------------------------------------------------- gate corpus
# Deterministic per-rule variants (doc_id % 8), each isolating ONE Gopher
# rule failure where feasible (the r4 lesson: a gate corpus must exercise
# every shape it claims to pin, both ways). Variant strings are fixed
# python constants shared verbatim by the Spark builder and the SQL twin.
_GOOD_LINE = (
    "the european research teams have worked with that community"
    " to deliver consistent results."
)
GOOD_TEXT = "\n".join([_GOOD_LINE] * 5)  # 65 words, every rule passes
SHORT_TEXT = "the quick note with brevity."  # 5 words: fails wc only
SYMBOL_TEXT = "\n".join(["#tag #tag #tag #tag the with"] * 10)
BULLET_TEXT = "\n".join(["-item entries listed with the"] * 12)
ELLIPSIS_TEXT = "\n".join(
    ["the detailed story continues onward with many more notes being"
     " added here..."] * 10
)
NUMERIC_TEXT = "\n".join(["the 11111 22222 33333 44444 with"] * 10)
LONGWORD_TEXT = "\n".join(
    ["extraordinarily incomprehensibilities neuropharmacologically the"
     " with"] * 12
)
_GOPHER_VARIANTS = (
    GOOD_TEXT,       # 0: keep = 1
    SHORT_TEXT,      # 1: wc_ok = 0
    SYMBOL_TEXT,     # 2: sym_ok = 0
    BULLET_TEXT,     # 3: bullet_ok = 0
    ELLIPSIS_TEXT,   # 4: ellipsis_ok = 0
    NUMERIC_TEXT,    # 5: alpha_ok = 0
    LONGWORD_TEXT,   # 6: mwl_ok = 0
)

_C4_GOOD_LINES = (
    "This opening sentence has comfortably more than five words.",
    "Here is another complete sentence that survives the filter.",
    "A third full sentence keeps the document above the threshold.",
)
_C4_BAD_LINES = (
    "Too short.",
    "no terminal punctuation on this line at all",
    "function() { return window.location.href; }",
    "Please enable javascript to view this page properly.",
    "Read our privacy policy and terms of use before continuing.",
)
C4_GOOD_DOC = "\n".join(_C4_GOOD_LINES + (_C4_GOOD_LINES[0],))
C4_MIXED_DOC = "\n".join(
    _C4_GOOD_LINES[:1] + _C4_BAD_LINES[:2] + _C4_GOOD_LINES[1:]
)
C4_BAD_DOC = "\n".join(_C4_BAD_LINES)
_C4_VARIANTS = (C4_GOOD_DOC, C4_MIXED_DOC, C4_BAD_DOC)


# Repetition-gate variants (doc_id % 4): clean doc passes every
# repetition rule; the line-repeat doc fails the line rules but keeps
# gram rules green (the repeated line is internally diverse, so no
# single gram dominates); the gram-repeat doc fails the top-gram rules
# on a single dominating pair with distinct lines.
# Sized so the top-gram char-fraction rules have dilution headroom: in a
# short doc even a COUNT-1 gram can exceed 16% of word characters, so
# rule isolation needs docs long enough that only the injected
# repetition trips its rule (flag expectations pinned per-variant in
# tests/test_qualityrules.py).
REP_CLEAN_TEXT = "\n".join(
    " ".join(f"term{r}{c}" for c in range(8)) for r in range(10)
)
_REP_DUP_LINE = "alpha bravo charlie delta echo foxtrot golf hotel"
REP_DUPLINE_TEXT = "\n".join(
    [_REP_DUP_LINE] * 7
    + [" ".join(f"fill{r}{c}" for c in range(9)) for r in range(14)]
)
REP_TOPGRAM_TEXT = "\n".join(
    [("alpha beta " * 30).strip()]
    + [" ".join(f"tail{r}{c}" for c in range(9)) for r in range(10)]
)
_REP_VARIANTS = (REP_CLEAN_TEXT, REP_DUPLINE_TEXT, REP_TOPGRAM_TEXT)


def _variant_corpus(docs: DataFrame, variants, mod: int) -> DataFrame:
    """(doc_id, text): pmod(doc_id, mod) selects a crafted variant (by
    index) or, past the variants, the document's own text — THE shared
    injection shape for every gate corpus in this module."""
    did = F.pmod(F.col("doc_id"), F.lit(mod))
    text = F.col("text")
    for i, variant in enumerate(variants):
        text = F.when(did == i, F.lit(variant)).otherwise(text)
    return docs.select("doc_id", text.alias("text"))


def _variant_corpus_sql(variants, mod: int, source: str) -> str:
    # ((x % m) + m) % m == Spark's pmod for negative doc_ids too —
    # DuckDB's % is sign-preserving, and a bare `doc_id % m` would fall
    # through every WHEN arm for negative ids while the engine injects
    whens = "\n".join(
        f"  WHEN ((doc_id % {mod}) + {mod}) % {mod} = {i}"
        f" THEN {_sql_str(v)}"
        for i, v in enumerate(variants)
    )
    return f"""
SELECT doc_id, CASE
{whens}
  ELSE text END AS text
FROM {source}"""


def rep_corpus(docs: DataFrame) -> DataFrame:
    """(doc_id, text): doc_id % 4 -> clean / line-repeat / gram-repeat
    variant, or the document's own text."""
    return _variant_corpus(docs, _REP_VARIANTS, 4)


def rep_corpus_sql(source: str = "documents") -> str:
    return _variant_corpus_sql(_REP_VARIANTS, 4, source)


def gopher_corpus(docs: DataFrame) -> DataFrame:
    """(doc_id, text): rule-variant injection over the documents table —
    doc_id % 8 picks one of the seven crafted variants (each isolating a
    rule) or, for 7, the document's own text."""
    return _variant_corpus(docs, _GOPHER_VARIANTS, 8)


def gopher_corpus_sql(source: str = "documents") -> str:
    return _variant_corpus_sql(_GOPHER_VARIANTS, 8, source)


def c4_corpus(docs: DataFrame) -> DataFrame:
    """(doc_id, text): doc_id % 4 -> fully-good doc / mixed doc /
    all-bad doc / the document's own text."""
    return _variant_corpus(docs, _C4_VARIANTS, 4)


def c4_corpus_sql(source: str = "documents") -> str:
    return _variant_corpus_sql(_C4_VARIANTS, 4, source)
