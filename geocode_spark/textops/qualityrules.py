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
    ws = ws_word_array(t)
    lines = F.split(t, "\n")
    n_words = F.size(ws).cast("bigint")
    n_chars = F.aggregate(
        F.transform(ws, F.length),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x.cast("bigint"),
    )
    n_lines = F.size(lines).cast("bigint")
    n_sym = F.size(
        F.regexp_extract_all(t, F.lit(SYMBOL_RE), 1)
    ).cast("bigint")
    n_bullet = F.size(
        F.filter(lines, lambda line: line.rlike(BULLET_RE))
    ).cast("bigint")
    n_ellipsis = F.size(
        F.filter(lines, lambda line: line.rlike(ELLIPSIS_RE))
    ).cast("bigint")
    n_alpha = F.size(
        F.filter(ws, lambda word: word.rlike(ALPHA_RE))
    ).cast("bigint")
    ws_low = F.transform(ws, F.lower)
    n_stop = sum(
        (
            F.array_contains(ws_low, s).cast("bigint")
            for s in GOPHER_STOPWORDS
        ),
        F.lit(0).cast("bigint"),
    )
    flags = {
        "wc_ok": (n_words >= 50) & (n_words <= 100000),
        "mwl_ok": (n_words > 0)
        & (3 * n_words <= n_chars)
        & (n_chars <= 10 * n_words),
        "sym_ok": 10 * n_sym <= n_words,
        "bullet_ok": 10 * n_bullet <= 9 * n_lines,
        "ellipsis_ok": 10 * n_ellipsis <= 3 * n_lines,
        "alpha_ok": (n_words > 0) & (5 * n_alpha >= 4 * n_words),
        "stop_ok": n_stop >= 2,
    }
    out = docs.select(
        "doc_id",
        n_words.alias("n_words"),
        n_chars.alias("n_chars"),
        n_lines.alias("n_lines"),
        n_sym.alias("n_sym"),
        n_bullet.alias("n_bullet"),
        n_ellipsis.alias("n_ellipsis"),
        n_alpha.alias("n_alpha"),
        n_stop.alias("n_stop"),
        *[_flag(cond).alias(name) for name, cond in flags.items()],
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
    n_sentences = F.size(
        F.regexp_extract_all(clean, F.lit("([.!?])"), 1)
    ).cast("bigint")
    return docs.select(
        "doc_id",
        clean.alias("clean_text"),
        n_kept.alias("n_lines_kept"),
        (F.size(lines).cast("bigint") - n_kept).alias("n_lines_removed"),
        n_sentences.alias("n_sentences"),
        _flag(n_sentences >= C4_MIN_SENTENCES).alias("keep_doc"),
    )


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
  CAST(len(regexp_extract_all(clean_text, '([.!?])', 1)) AS BIGINT)
    AS n_sentences,
  CAST(CASE WHEN len(regexp_extract_all(clean_text, '([.!?])', 1))
    >= {C4_MIN_SENTENCES} THEN 1 ELSE 0 END AS BIGINT) AS keep_doc
FROM c"""


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


def gopher_corpus(docs: DataFrame) -> DataFrame:
    """(doc_id, text): rule-variant injection over the documents table —
    doc_id % 8 picks one of the seven crafted variants (each isolating a
    rule) or, for 7, the document's own text."""
    did = F.pmod(F.col("doc_id"), F.lit(8))
    text = F.col("text")
    for i, variant in enumerate(_GOPHER_VARIANTS):
        text = F.when(did == i, F.lit(variant)).otherwise(text)
    return docs.select("doc_id", text.alias("text"))


def gopher_corpus_sql(source: str = "documents") -> str:
    whens = "\n".join(
        f"  WHEN doc_id % 8 = {i} THEN {_sql_str(v)}"
        for i, v in enumerate(_GOPHER_VARIANTS)
    )
    return f"""
SELECT doc_id, CASE
{whens}
  ELSE text END AS text
FROM {source}"""


def c4_corpus(docs: DataFrame) -> DataFrame:
    """(doc_id, text): doc_id % 4 -> fully-good doc / mixed doc /
    all-bad doc / the document's own text."""
    did = F.pmod(F.col("doc_id"), F.lit(4))
    text = F.col("text")
    for i, variant in enumerate(_C4_VARIANTS):
        text = F.when(did == i, F.lit(variant)).otherwise(text)
    return docs.select("doc_id", text.alias("text"))


def c4_corpus_sql(source: str = "documents") -> str:
    whens = "\n".join(
        f"  WHEN doc_id % 4 = {i} THEN {_sql_str(v)}"
        for i, v in enumerate(_C4_VARIANTS)
    )
    return f"""
SELECT doc_id, CASE
{whens}
  ELSE text END AS text
FROM {source}"""
