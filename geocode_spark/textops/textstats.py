"""Text analysis: token counts, quality score, language ID, fingerprints.

All operators are pure Catalyst column expressions (whole-stage codegen, no
Python on the hot path, no shuffle — per-row projections that scale linearly
with input splits). Each has a DuckDB SQL twin built from the SAME constants
so results hash-compare exactly.

Float discipline: every ratio is computed with the same operation order in
both dialects and rounded to 6 decimals at the output boundary.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Explicit 6-byte ASCII whitespace class, NOT \s: Java's non-Unicode \s is
# [ \t\n\x0B\f\r] but RE2's (DuckDB) excludes \x0B, so a '\s+' tokenizer
# silently diverges between the engine and its oracle twin on documents
# containing vertical tabs. The explicit class is byte-identical in both
# dialects AND matches the byte set the Arrow kernel splits on
# (spans._flat_words). Engine semantics are unchanged (Java \s == this set).
WS = r"[ \t\n\x0B\f\r]+"
# BPE-ish word/number/symbol tokenization (ASCII classes — identical in Java
# regex and RE2).
RE_TOKEN = r"([A-Za-z]+|[0-9]+|[^A-Za-z0-9\s])"
RE_PUNCT = r"([^A-Za-z0-9\s])"

# Marker stopwords per language (word-boundary matched, lowercased input).
LANG_MARKERS = {
    "en": ["the", "a", "and", "of", "to", "over", "while", "with", "for"],
    "es": ["el", "un", "sobre", "los", "mientras", "rapido", "datos"],
    "de": ["der", "einen", "uber", "wahrend", "daten", "schnelle"],
    "fr": ["le", "sur", "les", "que", "pendant", "donnees", "rapide"],
}
LANG_ORDER = ["en", "es", "de", "fr"]  # deterministic tiebreak priority


def _marker_pattern(lang: str) -> str:
    return r"\b(" + "|".join(LANG_MARKERS[lang]) + r")\b"


# ----------------------------------------------------------------- Spark side
def _n_matches(col: Column, pattern: str) -> Column:
    return F.size(F.regexp_extract_all(col, F.lit(pattern))).cast("bigint")


def token_count_cols(text: Column) -> dict[str, Column]:
    """Whitespace token count + regex (BPE-ish) token count."""
    trimmed = F.trim(text)
    ws = F.when(trimmed == "", F.lit(0)).otherwise(
        F.size(F.split(trimmed, WS))
    ).cast("bigint")
    return {"n_tokens_ws": ws, "n_tokens_re": _n_matches(text, RE_TOKEN)}


def quality_cols(text: Column) -> dict[str, Column]:
    """Heuristic quality score from length / punctuation / stopword ratios.

    score = 0.4 * min(1, tokens/100)
          + 0.3 * (1 - min(1, punct/tokens))
          + 0.3 * min(1, 5 * stopword_ratio)
    """
    toks = token_count_cols(text)["n_tokens_ws"]
    punct = _n_matches(text, RE_PUNCT)
    stop = _n_matches(F.lower(text), _marker_pattern("en"))
    t = toks.cast("double")
    safe_t = F.greatest(t, F.lit(1.0))
    score = (
        F.lit(0.4) * F.least(F.lit(1.0), t / F.lit(100.0))
        + F.lit(0.3) * (F.lit(1.0) - F.least(F.lit(1.0), punct.cast("double") / safe_t))
        + F.lit(0.3) * F.least(F.lit(1.0), F.lit(5.0) * stop.cast("double") / safe_t)
    )
    return {
        "n_tokens_ws": toks,
        "punct_count": punct,
        "stopword_count": stop,
        "quality": F.round(score, 6),
    }


def lang_id_col(text: Column) -> Column:
    """n-gram-heuristic language ID: marker-word counts, deterministic argmax."""
    low = F.lower(text)
    counts = {lang: _n_matches(low, _marker_pattern(lang)) for lang in LANG_ORDER}
    en, es, de, fr = (counts[k] for k in LANG_ORDER)
    return (
        F.when((en >= es) & (en >= de) & (en >= fr), "en")
        .when((es >= de) & (es >= fr), "es")
        .when(de >= fr, "de")
        .otherwise("fr")
    )


def normalize_text(text: Column) -> Column:
    return F.lower(F.regexp_replace(F.trim(text), WS, " "))


def ws_word_array(text: Column) -> Column:
    """Non-empty whitespace-token array — THE shared tokenizer for the
    LM / span-dedup / BPE family (lm.py, spans.py). Callers that want
    case-folded tokens pass F.lower(col); the expression itself preserves
    case. Twin: ws_word_array_sql."""
    return F.filter(F.split(F.trim(text), WS), lambda x: x != F.lit(""))


def ws_word_array_sql(expr: str) -> str:
    """DuckDB twin of ws_word_array over an SQL expression string."""
    return (
        f"list_filter(string_split_regex(trim({expr}), '{WS}'),"
        " x -> x <> '')"
    )


def fingerprint_cols(text: Column) -> dict[str, Column]:
    """Document fingerprints.

    fp_md5     — md5 of whitespace-normalized lowercased text (exact identity)
    fp_minhash — lexicographic min over md5(word-3-shingle) (1-perm MinHash;
                 stable under small edits away from the minimizing shingle).
                 Docs with < 3 tokens fall back to fp_md5.
    """
    norm = normalize_text(text)
    toks = F.split(norm, " ")
    n = F.size(toks)
    shingles = F.transform(
        F.sequence(F.lit(0), n - F.lit(3)),
        lambda i: F.concat_ws(
            " ", F.get(toks, i), F.get(toks, i + 1), F.get(toks, i + 2)
        ),
    )
    fp_md5 = F.md5(norm)
    fp_min = F.when(n >= 3, F.array_min(F.transform(shingles, F.md5))).otherwise(
        fp_md5
    )
    return {"fp_md5": fp_md5, "fp_minhash": fp_min}


def text_stats(df: DataFrame, id_col: str = "doc_id",
               text_col: str = "text") -> DataFrame:
    text = F.col(text_col)
    cols = {**quality_cols(text), "n_tokens_re": token_count_cols(text)["n_tokens_re"],
            **fingerprint_cols(text)}
    return df.select(F.col(id_col), *[v.alias(k) for k, v in cols.items()])


def lang_id(df: DataFrame, id_col: str = "url", text_col: str = "text") -> DataFrame:
    return df.select(
        F.col(id_col), lang_id_col(F.col(text_col)).alias("lang_pred")
    )


# ---------------------------------------------------------------- oracle side
def _n_matches_sql(col: str, pattern: str) -> str:
    return f"CAST(len(regexp_extract_all({col}, '{pattern}')) AS BIGINT)"


def _ws_tokens_sql(col: str) -> str:
    return (
        f"CAST(CASE WHEN trim({col}) = '' THEN 0"
        f" ELSE len(string_split_regex(trim({col}), '{WS}')) END AS BIGINT)"
    )


def text_stats_oracle_sql(source: str, id_col: str = "doc_id",
                          text_col: str = "text") -> str:
    t = text_col
    toks = _ws_tokens_sql(t)
    punct = _n_matches_sql(t, RE_PUNCT)
    stop = _n_matches_sql(f"lower({t})", _marker_pattern("en"))
    safe_t = f"greatest(CAST({toks} AS DOUBLE), 1.0)"
    score = (
        f"round(0.4 * least(1.0, CAST({toks} AS DOUBLE) / 100.0)"
        f" + 0.3 * (1.0 - least(1.0, CAST({punct} AS DOUBLE) / {safe_t}))"
        f" + 0.3 * least(1.0, 5.0 * CAST({stop} AS DOUBLE) / {safe_t}), 6)"
    )
    norm = f"lower(regexp_replace(trim({t}), '{WS}', ' ', 'g'))"
    toks_arr = f"string_split({norm}, ' ')"
    shingle = (
        f"list_transform(generate_series(1, len({toks_arr}) - 2),"
        f" i -> md5({toks_arr}[i] || ' ' || {toks_arr}[i+1] || ' ' || {toks_arr}[i+2]))"
    )
    fp_min = (
        f"CASE WHEN len({toks_arr}) >= 3 THEN list_min({shingle})"
        f" ELSE md5({norm}) END"
    )
    return f"""
SELECT {id_col},
       {toks} AS n_tokens_ws,
       {punct} AS punct_count,
       {stop} AS stopword_count,
       {score} AS quality,
       {_n_matches_sql(t, RE_TOKEN)} AS n_tokens_re,
       md5({norm}) AS fp_md5,
       {fp_min} AS fp_minhash
FROM {source}
"""


def lang_id_oracle_sql(source: str, id_col: str = "url",
                       text_col: str = "text") -> str:
    c = {
        lang: _n_matches_sql(f"lower({text_col})", _marker_pattern(lang))
        for lang in LANG_ORDER
    }
    return f"""
SELECT {id_col},
       CASE WHEN {c['en']} >= {c['es']} AND {c['en']} >= {c['de']} AND {c['en']} >= {c['fr']} THEN 'en'
            WHEN {c['es']} >= {c['de']} AND {c['es']} >= {c['fr']} THEN 'es'
            WHEN {c['de']} >= {c['fr']} THEN 'de'
            ELSE 'fr' END AS lang_pred
FROM {source}
"""


# -------------------------------------------------------------- PII redaction
# Pre-training PII scrub: count and strip email addresses and phone numbers
# before a corpus ships. Both patterns are RE2-and-Java-compatible ASCII
# classes so Spark (Java regex) and DuckDB (RE2) match identical spans; the
# redacted text is emitted as an md5 so the oracle can verify the FULL
# rewritten string without shipping it. The fixture word-salads carry no
# organic PII, so pii_corpus injects a deterministic contact sentence into
# every 4th doc — identically derived in both engines.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\b\d{3}[-.]\d{3}[-.]\d{4}\b"
# dotted quad with per-octet range check (0-255): "256.1.1.1" and
# "999.1.1.1" must NOT match. \d is ASCII in both Java regex and RE2,
# (?:...) groups don't shift DuckDB's explicit outer capture group.
_OCTET = r"(?:25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)"
IPV4_RE = rf"\b{_OCTET}(?:\.{_OCTET}){{3}}\b"
# SSN shape 3-2-4: the 2-digit middle can never collide with PHONE_RE's
# 3-digit middle, and a leading/trailing extra digit kills the \b
SSN_RE = r"\b\d{3}-\d{2}-\d{4}\b"
PII_INJECT_MOD = 4


def pii_corpus(docs: DataFrame) -> DataFrame:
    contact = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or call 555-867-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        F.lit(" today"),
    )
    did = F.col("doc_id")
    # ip/ssn positives, including the leading-quad-of-a-longer-sequence
    # edge ("1.2.3.4.5" contains exactly one match, "1.2.3.4")
    machine = F.concat(
        F.col("text"),
        F.lit(" server 10."), (did % 256).cast("string"),
        F.lit(".0."), (did % 100).cast("string"),
        F.lit(" seq 1.2.3.4.5 ssn 123-45-"),
        F.lpad((did % 10000).cast("string"), 4, "0"),
        F.lit(" end"),
    )
    # near-misses that must count ZERO: version string (no \b before the
    # quad), out-of-range octets, 4-digit-led ssn shape
    nearmiss = F.lit(
        " build v1.2.33 from 999.300.1.7 or 256.300.2.8"
        " ref 1234-56-7890 tail"
    )
    return docs.select(
        "doc_id",
        F.when(did % PII_INJECT_MOD == 0, contact)
        .when(did % PII_INJECT_MOD == 1, machine)
        .when(did % PII_INJECT_MOD == 2, F.concat(F.col("text"), nearmiss))
        .otherwise(F.col("text")).alias("text"),
    )


def with_pii_columns(df: DataFrame, text_col: str = "text") -> DataFrame:
    """THE shared redaction kernel: match counts (computed on the ORIGINAL
    text) + the text column rewritten email -> <EMAIL>, phone -> <PHONE>,
    ipv4 -> <IP>, ssn -> <SSN>, in that order. The rewrites CASCADE over
    the working text: a replacement token never contains a digit, but its
    '>' does introduce a word boundary, so an earlier rewrite CAN expose
    a later-pattern match the original text lacked (e.g.
    'a@b.co123-45-6789' -> '<EMAIL>123-45-6789' -> '<EMAIL><SSN>' while
    n_ssn, counted on the original, stays 0). That cascade is the safe
    direction for redaction — it only ever removes MORE digit material —
    and the engine and its DuckDB twin apply the identical sequence, so
    the gate pins it. Both the oracle-gated pii_redact query and
    jobs/curation_job.py go through this one function so the shipped
    corpus can never drift from the gated semantics (pattern constants,
    count-on-original, replace order)."""
    t = F.col(text_col)
    clean = t
    out = df
    for name, pat, token in (
        ("n_emails", EMAIL_RE, "<EMAIL>"),
        ("n_phones", PHONE_RE, "<PHONE>"),
        ("n_ipv4", IPV4_RE, "<IP>"),
        ("n_ssn", SSN_RE, "<SSN>"),
    ):
        out = out.withColumn(
            name,
            F.size(F.regexp_extract_all(t, F.lit(f"({pat})"), 1))
            .cast("bigint"),
        )
        clean = F.regexp_replace(clean, pat, token)
    return out.withColumn(text_col, clean)


def pii_redact(docs: DataFrame) -> DataFrame:
    """(doc_id, n_emails, n_phones, n_ipv4, n_ssn, clean_md5): match
    counts + md5 of the redacted text. Pure Catalyst regex projection —
    zero shuffle, zero Python."""
    return with_pii_columns(docs).select(
        "doc_id", "n_emails", "n_phones", "n_ipv4", "n_ssn",
        F.md5("text").alias("clean_md5"),
    )


def pii_corpus_sql(source: str = "documents") -> str:
    return f"""(
  SELECT doc_id,
         CASE WHEN doc_id % {PII_INJECT_MOD} = 0
              THEN text || ' contact user' || doc_id
                   || '@example.com or call 555-867-'
                   || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                   || ' today'
              WHEN doc_id % {PII_INJECT_MOD} = 1
              THEN text || ' server 10.' || CAST(doc_id % 256 AS VARCHAR)
                   || '.0.' || CAST(doc_id % 100 AS VARCHAR)
                   || ' seq 1.2.3.4.5 ssn 123-45-'
                   || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                   || ' end'
              WHEN doc_id % {PII_INJECT_MOD} = 2
              THEN text || ' build v1.2.33 from 999.300.1.7 or 256.300.2.8'
                   || ' ref 1234-56-7890 tail'
              ELSE text END AS text
  FROM {source}
)"""


def pii_redact_oracle_sql(source: str = "documents") -> str:
    email, phone, ipv4, ssn = EMAIL_RE, PHONE_RE, IPV4_RE, SSN_RE
    return f"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '({email})', 1)) AS BIGINT)
         AS n_emails,
       CAST(len(regexp_extract_all(text, '({phone})', 1)) AS BIGINT)
         AS n_phones,
       CAST(len(regexp_extract_all(text, '({ipv4})', 1)) AS BIGINT)
         AS n_ipv4,
       CAST(len(regexp_extract_all(text, '({ssn})', 1)) AS BIGINT)
         AS n_ssn,
       md5(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
             text, '{email}', '<EMAIL>', 'g'),
             '{phone}', '<PHONE>', 'g'),
             '{ipv4}', '<IP>', 'g'),
             '{ssn}', '<SSN>', 'g')) AS clean_md5
FROM {pii_corpus_sql(source)}
"""


# --------------------------------------------------------------- domain stats
HOST_RE = r"^[a-z]+://([^/]+)"


def domain_stats(pages: DataFrame) -> DataFrame:
    """Per-registered-host corpus profile: pages, languages, total text
    volume. The crawl-curation roll-up that decides which domains to keep,
    throttle or drop. One keyed shuffle on host (medium cardinality — at
    web scale the hot-domain tail is exactly what sessionize_salted's
    salting pattern handles if a single host ever dominates)."""
    host = F.regexp_extract("url", HOST_RE, 1)
    return (
        pages.select(
            host.alias("host"),
            "lang",
            F.length("text").cast("bigint").alias("n_chars"),
        )
        .groupBy("host")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pages"),
            F.count_distinct("lang").cast("bigint").alias("n_langs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
    )


def domain_stats_oracle_sql(pages_source: str) -> str:
    return f"""
SELECT regexp_extract(url, '{HOST_RE}', 1) AS host,
       CAST(count(*) AS BIGINT) AS n_pages,
       CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
       CAST(sum(length(text)) AS BIGINT) AS total_chars
FROM {pages_source}
GROUP BY 1
"""


# ------------------------------------------------------ encoding damage scan
# Mojibake / encoding-damage detection — the curation gate that catches
# double-decoded UTF-8 ("caf\u00c3\u00a9", "\u00e2\u20ac\u2122"), U+FFFD replacement
# characters (a lossy transcode already happened), and raw control bytes
# (binary spill into a text field). Pure Catalyst regex projection: zero
# shuffle, zero Python — the same plan class as pii_redact.
#
# Regex dialect: \\x{....} escapes only (valid in BOTH Java regex and
# RE2 — \\uFFFF is Java-only); each pattern carries one outer capture
# group because Spark's regexp_extract_all defaults to group 1 while
# DuckDB's counts full matches.
REPLACEMENT_RE = "(\\x{FFFD})"
# C0 controls except tab/newline/VT/FF/CR (legitimate whitespace), + DEL
CONTROL_RE = "([\\x{0001}-\\x{0008}\\x{000E}-\\x{001F}\\x{007F}])"
# UTF-8 bytes re-decoded as Latin-1/cp1252: a 2-byte sequence becomes
# \u00c3/\u00c2 + one high-Latin-1 char; a 3-byte punctuation sequence becomes
# \u00e2\u20ac + anything (cp1252 maps 0x80-0x9F outside U+0080-U+00FF, hence ".")
MOJIBAKE_RE = (
    "([\\x{00C2}\\x{00C3}][\\x{0080}-\\x{00FF}]|\\x{00E2}\\x{20AC}.)"
)
ENC_INJECT_MOD = 4


def encoding_corpus(docs: DataFrame) -> DataFrame:
    """Deterministic damage injection, one variant per signal family:
    mod 0 -> two U+FFFD replacement chars; mod 1 -> three mojibake
    sequences (2-byte \u00c3\u00a9/\u00c3\u00af and 3-byte \u00e2\u20ac\u2122 forms); mod 2 -> three
    raw control bytes; mod 3 -> clean. Twin: encoding_corpus_sql."""
    did = F.col("doc_id")
    repl = F.concat(
        F.col("text"),
        F.lit(" caf\ufffd data \ufffd end"),
    )
    moji = F.concat(
        F.col("text"),
        F.lit(" caf\u00c3\u00a9 na\u00c3\u00afve \u00e2\u20ac\u2122quote"),
    )
    ctrl = F.concat(
        F.col("text"),
        F.lit(" bin\x01mid\x02tail\x1f"),
    )
    return docs.select(
        "doc_id",
        F.when(did % ENC_INJECT_MOD == 0, repl)
        .when(did % ENC_INJECT_MOD == 1, moji)
        .when(did % ENC_INJECT_MOD == 2, ctrl)
        .otherwise(F.col("text")).alias("text"),
    )


def encoding_quality(docs: DataFrame) -> DataFrame:
    """(doc_id, n_replacement, n_control, n_mojibake, damaged): per-doc
    encoding-damage counts; damaged = 1 iff any signal fired."""
    t = F.col("text")
    n_rep = _n_matches(t, REPLACEMENT_RE)
    n_ctl = _n_matches(t, CONTROL_RE)
    n_moj = _n_matches(t, MOJIBAKE_RE)
    return docs.select(
        "doc_id",
        n_rep.alias("n_replacement"),
        n_ctl.alias("n_control"),
        n_moj.alias("n_mojibake"),
        ((n_rep > 0) | (n_ctl > 0) | (n_moj > 0))
        .cast("bigint").alias("damaged"),
    )


def encoding_corpus_sql(source: str = "documents") -> str:
    return f"""(
  SELECT doc_id,
         CASE WHEN doc_id % {ENC_INJECT_MOD} = 0
              THEN text || ' caf' || chr(65533) || ' data '
                   || chr(65533) || ' end'
              WHEN doc_id % {ENC_INJECT_MOD} = 1
              THEN text || ' caf' || chr(195) || chr(169) || ' na'
                   || chr(195) || chr(175) || 've ' || chr(226)
                   || chr(8364) || chr(8482) || 'quote'
              WHEN doc_id % {ENC_INJECT_MOD} = 2
              THEN text || ' bin' || chr(1) || 'mid' || chr(2)
                   || 'tail' || chr(31)
              ELSE text END AS text
  FROM {source}
)"""


def encoding_quality_oracle_sql(source: str = "documents") -> str:
    rep, ctl, moj = REPLACEMENT_RE, CONTROL_RE, MOJIBAKE_RE
    return f"""
SELECT doc_id,
       {_n_matches_sql("text", rep)} AS n_replacement,
       {_n_matches_sql("text", ctl)} AS n_control,
       {_n_matches_sql("text", moj)} AS n_mojibake,
       CAST(({_n_matches_sql("text", rep)} > 0
             OR {_n_matches_sql("text", ctl)} > 0
             OR {_n_matches_sql("text", moj)} > 0) AS BIGINT) AS damaged
FROM {encoding_corpus_sql(source)}
"""


# --------------------------------------------------------- language mixture
# Corpus language composition: pages and byte mass per predicted language —
# the table a mixture/budget plan reads before language-balanced sampling
# (composes the T8 lang-ID heuristic). ONE groupBy(lang) plus a 1-row
# totals broadcast; shares are exact integer permille (cross-multiplied,
# /0-guarded). Byte mass matters because pages/language and bytes/language
# diverge on real crawls (CJK pages are byte-heavy) — both are reported.
def lang_mixture(pages: DataFrame, text_col: str = "text") -> DataFrame:
    """(lang, n_pages, n_bytes, permille_pages, permille_bytes): corpus
    language-mixture table over the lang-ID prediction."""
    per = pages.select(
        lang_id_col(F.col(text_col)).alias("lang"),
        F.octet_length(text_col).cast("bigint").alias("nb"),
    ).groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_pages"),
        F.sum("nb").cast("bigint").alias("n_bytes"),
    )
    tot = per.agg(
        F.sum("n_pages").cast("bigint").alias("tp"),
        F.sum("n_bytes").cast("bigint").alias("tb"),
    )
    return per.crossJoin(F.broadcast(tot)).select(
        "lang", "n_pages", "n_bytes",
        F.expr("n_pages * 1000 div greatest(tp, 1)")
        .cast("bigint").alias("permille_pages"),
        F.expr("n_bytes * 1000 div greatest(tb, 1)")
        .cast("bigint").alias("permille_bytes"),
    )


def lang_mixture_oracle_sql(source: str, text_col: str = "text") -> str:
    """DuckDB twin: the lang-ID twin aggregated with the same exact
    integer permille shares (strlen = byte length)."""
    c = {
        lang: _n_matches_sql(f"lower({text_col})", _marker_pattern(lang))
        for lang in LANG_ORDER
    }
    return f"""
WITH pred AS (
  SELECT CASE WHEN {c['en']} >= {c['es']} AND {c['en']} >= {c['de']}
                   AND {c['en']} >= {c['fr']} THEN 'en'
              WHEN {c['es']} >= {c['de']} AND {c['es']} >= {c['fr']}
                   THEN 'es'
              WHEN {c['de']} >= {c['fr']} THEN 'de'
              ELSE 'fr' END AS lang,
         CAST(strlen({text_col}) AS BIGINT) AS nb
  FROM {source}
), per AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n_pages,
         CAST(sum(nb) AS BIGINT) AS n_bytes
  FROM pred GROUP BY lang
), tot AS (
  SELECT CAST(sum(n_pages) AS BIGINT) AS tp,
         CAST(sum(n_bytes) AS BIGINT) AS tb FROM per
)
SELECT lang, n_pages, n_bytes,
       CAST(n_pages * 1000 // greatest(tp, 1) AS BIGINT) AS permille_pages,
       CAST(n_bytes * 1000 // greatest(tb, 1) AS BIGINT) AS permille_bytes
FROM per CROSS JOIN tot
"""


# ------------------------------------------------------- lexical diversity
# Type-token ratio + hapax-legomena rate: the classic lexical-diversity
# quality signals (a near-zero TTR flags template/spam pages; a near-one
# TTR on a long page flags word-salad). The reference has no analog — this
# is beyond-reference curation surface, same family as text_stats.
#
# Scale shape (100 TB): explode once -> ONE keyed groupBy on
# (doc_id, token) with map-side partial aggregation, then a second keyed
# groupBy on doc_id — both exchanges keyed on (or prefixed by) the unique
# doc id, skew-free by construction. No window, no broadcast of the big
# side, no Python. TTR is published as an exact integer (parts-per-million,
# floor) so the oracle compares integer-for-integer.

def lexical_diversity(docs: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text") -> DataFrame:
    """(doc_id, n_tokens, n_types, n_hapax, ttr_ppm) per document.

    Tokens are the shared case-folded whitespace tokenizer
    (ws_word_array over lower()) used by the LM/span family, so the
    numbers line up with token budgets elsewhere in the engine."""
    toks = ws_word_array(F.lower(F.col(text_col)))
    tf = (
        docs.select(F.col(id_col), F.explode(toks).alias("tok"))
        .groupBy(id_col, "tok")
        .agg(F.count("*").alias("c"))
    )
    return (
        tf.groupBy(id_col)
        .agg(
            F.sum("c").cast("bigint").alias("n_tokens"),
            F.count("*").cast("bigint").alias("n_types"),
            F.sum(F.when(F.col("c") == 1, 1).otherwise(0))
            .cast("bigint").alias("n_hapax"),
        )
        .withColumn(
            "ttr_ppm",
            F.expr("n_types * 1000000 div greatest(n_tokens, 1)")
            .cast("bigint"),
        )
    )


def lexical_diversity_oracle_sql(source: str, id_col: str = "doc_id",
                                 text_col: str = "text") -> str:
    toks = ws_word_array_sql(f"lower({text_col})")
    return f"""
WITH tf AS (
  SELECT {id_col}, tok, count(*) AS c
  FROM (SELECT {id_col}, unnest({toks}) AS tok FROM {source})
  GROUP BY {id_col}, tok
), agg AS (
  SELECT {id_col},
         CAST(sum(c) AS BIGINT) AS n_tokens,
         CAST(count(*) AS BIGINT) AS n_types,
         CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax
  FROM tf GROUP BY {id_col}
)
SELECT {id_col}, n_tokens, n_types, n_hapax,
       CAST(n_types * 1000000 // greatest(n_tokens, 1) AS BIGINT) AS ttr_ppm
FROM agg
"""


# ------------------------------------------------------- Flesch readability
# Flesch reading-ease + Flesch-Kincaid grade (the canonical readability
# screens in curation stacks: extremely low ease flags legalese/boilerplate,
# negative grades flag token soup). Published in exact integer MILLI units
# over a common (words x sentences) denominator, so both engines run one
# int64 division — no float in the formula at all. Syllables are the
# standard vowel-group heuristic with a 1-syllable floor per token.
#
# Scale shape: a single zero-shuffle Catalyst projection (split + regexp +
# higher-order aggregate), whole-stage codegen, no Python.
_VOWEL_RUNS = "([aeiouy]+)"  # group-1 wrapped: the _n_matches convention
_SENT_RUNS = "([.!?]+)"


def flesch_readability(docs: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    text = F.col(text_col)
    words = ws_word_array(F.lower(text))
    n_words = F.size(words).cast("bigint")
    n_sents = _n_matches(text, _SENT_RUNS).cast("bigint")
    syl = F.aggregate(
        F.transform(
            words,
            lambda w: F.greatest(
                F.lit(1).cast("bigint"), _n_matches(w, _VOWEL_RUNS)
            ),
        ),
        F.lit(0).cast("bigint"),
        lambda a, x: a + x,
    )
    staged = docs.select(
        F.col(id_col),
        n_words.alias("n_words"),
        F.greatest(F.lit(1).cast("bigint"), n_sents).alias("n_sentences"),
        F.coalesce(syl, F.lit(0).cast("bigint")).alias("n_syllables"),
    )
    w = "greatest(n_words, 1)"
    s = "n_sentences"
    return staged.withColumns(
        {
            "ease_milli": F.expr(
                f"CAST((206835 * {w} * {s} - 1015 * {w} * {w}"
                f" - 84600 * n_syllables * {s}) div ({w} * {s}) AS BIGINT)"
            ),
            "grade_milli": F.expr(
                f"CAST((390 * {w} * {w} + 11800 * n_syllables * {s}"
                f" - 15590 * {w} * {s}) div ({w} * {s}) AS BIGINT)"
            ),
        }
    )


def flesch_readability_oracle_sql(source: str, id_col: str = "doc_id",
                                  text_col: str = "text") -> str:
    toks = ws_word_array_sql(f"lower({text_col})")
    syl_list = (
        f"list_transform({toks},"
        f" w -> greatest(1, len(regexp_extract_all(w, '{_VOWEL_RUNS}'))))"
    )
    n_sents = _n_matches_sql(text_col, _SENT_RUNS)
    w = "greatest(n_words, 1)"
    s = "n_sentences"
    return f"""
WITH staged AS (
  SELECT {id_col},
         CAST(len({toks}) AS BIGINT) AS n_words,
         CAST(greatest(1, {n_sents}) AS BIGINT) AS n_sentences,
         CAST(coalesce(list_sum({syl_list}), 0) AS BIGINT) AS n_syllables
  FROM {source}
)
SELECT {id_col}, n_words, n_sentences, n_syllables,
       CAST((206835 * {w} * {s} - 1015 * {w} * {w}
             - 84600 * n_syllables * {s}) // ({w} * {s}) AS BIGINT)
           AS ease_milli,
       CAST((390 * {w} * {w} + 11800 * n_syllables * {s}
             - 15590 * {w} * {s}) // ({w} * {s}) AS BIGINT) AS grade_milli
FROM staged
"""
