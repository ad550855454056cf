"""Gopher / C4 quality rules + keep-first line dedup.

Each Gopher gate variant isolates ONE rule (the r4 lesson: a gate corpus
must exercise every shape it claims to pin, both ways); the C4 tests pin
per-line removal reasons; the keep-first tests pin global first-occurrence
semantics including the empty-line carve-out.
"""
import pytest

from geocode_spark.textops.lineops import line_dedup_keep_first
from geocode_spark.textops.qualityrules import (
    BULLET_TEXT,
    C4_BAD_DOC,
    C4_GOOD_DOC,
    C4_MIXED_DOC,
    ELLIPSIS_TEXT,
    GOOD_TEXT,
    LONGWORD_TEXT,
    NUMERIC_TEXT,
    SHORT_TEXT,
    SYMBOL_TEXT,
    c4_line_filter,
    gopher_quality,
)

RULES = (
    "wc_ok", "mwl_ok", "sym_ok", "bullet_ok", "ellipsis_ok",
    "alpha_ok", "stop_ok",
)


def _one(spark, text):
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    return df


@pytest.mark.parametrize(
    "text,failing",
    [
        (GOOD_TEXT, None),
        (SHORT_TEXT, "wc_ok"),
        (SYMBOL_TEXT, "sym_ok"),
        (BULLET_TEXT, "bullet_ok"),
        (ELLIPSIS_TEXT, "ellipsis_ok"),
        (NUMERIC_TEXT, "alpha_ok"),
        (LONGWORD_TEXT, "mwl_ok"),
    ],
)
def test_gopher_variant_isolates_one_rule(spark, text, failing):
    row = gopher_quality(_one(spark, text)).collect()[0]
    for rule in RULES:
        expected = 0 if rule == failing else 1
        assert row[rule] == expected, (rule, text[:40])
    assert row["keep"] == (1 if failing is None else 0)


def test_gopher_empty_and_null_docs(spark):
    df = spark.createDataFrame(
        [(0, ""), (1, None)], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in gopher_quality(df).collect()}
    for r in rows.values():
        assert r["n_words"] == 0 and r["keep"] == 0
        # /0-free: ratio rules on an empty doc are well-defined
        assert r["sym_ok"] == 1 and r["alpha_ok"] == 0


def test_c4_line_filter_mixed_doc(spark):
    row = c4_line_filter(_one(spark, C4_MIXED_DOC)).collect()[0]
    assert row["n_lines_kept"] == 3 and row["n_lines_removed"] == 2
    assert row["keep_doc"] == 1
    assert "Too short." not in row["clean_text"]
    assert "no terminal punctuation" not in row["clean_text"]


def test_c4_line_filter_per_reason(spark):
    good = "This is a perfectly fine sentence with many words."
    cases = {
        "short": "Too brief.",
        "no_punct": "this line has five words but no terminal punctuation",
        "brace": "A line with code tokens { should be dropped.",
        "phrase": "Please review our privacy policy before you continue on.",
    }
    for reason, bad in cases.items():
        row = c4_line_filter(
            _one(spark, good + "\n" + bad)
        ).collect()[0]
        assert row["n_lines_kept"] == 1, reason
        assert bad not in row["clean_text"], reason


def test_c4_all_bad_doc_empty_clean_text(spark):
    row = c4_line_filter(_one(spark, C4_BAD_DOC)).collect()[0]
    assert row["n_lines_kept"] == 0 and row["clean_text"] == ""
    assert row["keep_doc"] == 0
    good = c4_line_filter(_one(spark, C4_GOOD_DOC)).collect()[0]
    assert good["keep_doc"] == 1 and good["n_sentences"] >= 3


def test_gopher_repetition_exact_counts(spark):
    from geocode_spark.textops.qualityrules import gopher_repetition

    # hand-computed: lines [ab, ab, cd] -> 'a b'x2 dup run; words
    # a(1) b(1) a(1) b(1) c(1) d(1); top bigram 'a b' count 2, chars 2
    row = gopher_repetition(
        _one(spark, "a b\na b\nc d")
    ).collect()[0]
    assert row["n_lines"] == 3 and row["dup_lines"] == 2
    assert row["line_chars"] == 9 and row["dup_line_chars"] == 6
    assert row["word_chars"] == 6
    # bigrams: (a,b)x2 (b,a)x1 (b,c)x1 (c,d)x1 -> top 'a b' 2 occ x 2 ch
    assert row["top2_chars"] == 4
    # trigrams each once; 3 word-chars each -> top mass 3
    assert row["top3_chars"] == 3
    assert row["top4_chars"] == 4  # 4-grams once, 4 word chars


def test_gopher_repetition_variant_isolation(spark):
    from geocode_spark.textops.qualityrules import (
        REP_CLEAN_TEXT,
        REP_DUPLINE_TEXT,
        REP_TOPGRAM_TEXT,
        gopher_repetition,
    )

    docs = spark.createDataFrame(
        [(0, REP_CLEAN_TEXT), (1, REP_DUPLINE_TEXT), (2, REP_TOPGRAM_TEXT)],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in gopher_repetition(docs).collect()}
    rep_flags = ("dupline_ok", "duplinechar_ok")
    gram_flags = ("top2_ok", "top3_ok", "top4_ok")
    assert all(rows[0][f] == 1 for f in rep_flags + gram_flags)
    assert rows[0]["keep"] == 1
    assert all(rows[1][f] == 0 for f in rep_flags)
    assert all(rows[1][f] == 1 for f in gram_flags)
    assert all(rows[2][f] == 1 for f in rep_flags)
    assert all(rows[2][f] == 0 for f in gram_flags)


def test_hashed_linear_score_terms_and_determinism(spark):
    from geocode_spark.textops.qualityrules import (
        _FT_MIX_A,
        _FT_MIX_C,
        _FT_MOD1,
        _FT_MOD2,
        FT_BUCKETS,
        hashed_linear_score,
    )

    docs = spark.createDataFrame(
        [(0, "Alpha beta"), (1, "alpha  BETA"), (2, "solo"), (3, ""),
         (4, None)],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in hashed_linear_score(docs).collect()}
    # case-folded and whitespace-normalized: same terms, same score
    assert rows[0]["score_micro"] == rows[1]["score_micro"]
    assert rows[0]["n_terms"] == 3  # 2 unigrams + 1 bigram
    assert rows[2]["n_terms"] == 1 and rows[3]["n_terms"] == 0
    assert rows[3]["score_micro"] == 0 and rows[4]["score_micro"] == 0
    # python recomputation of the synthetic weight path
    import hashlib

    def weight(term):
        b = int(hashlib.md5(term.encode()).hexdigest()[:8], 16) % FT_BUCKETS
        return (b * _FT_MIX_A + _FT_MIX_C) % _FT_MOD1 % _FT_MOD2 - 50000

    expected = weight("alpha") + weight("beta") + weight("alpha beta")
    assert rows[0]["score_micro"] == expected


def test_plan_shapes(spark):
    """gopher/c4 must stay zero-exchange projections; line dedup must
    stay hash-only (the packed-ordinal min exists precisely because
    min(struct) silently demotes to SortAggregate — a corpus-wide
    sort)."""
    from geocode_spark.textops.qualityrules import gopher_corpus

    docs = spark.createDataFrame(
        [(i, f"line a\nline b{i}") for i in range(10)],
        "doc_id long, text string",
    )
    from geocode_spark.textops.qualityrules import (
        gopher_repetition,
        hashed_linear_score,
    )

    for df in (
        gopher_quality(gopher_corpus(docs)),
        c4_line_filter(docs),
        gopher_repetition(docs),
        hashed_linear_score(docs),
    ):
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        assert "Exchange" not in plan
    ld = line_dedup_keep_first(docs)
    plan = ld._sc._jvm.PythonSQLUtils.explainString(
        ld._jdf.queryExecution(), "formatted"
    )
    assert "SortAggregate" not in plan
    assert "SortMergeJoin" not in plan


def test_line_dedup_ordinal_bounds_raise(spark):
    docs = spark.createDataFrame(
        [(1 << 50, "over the doc id bound")], "doc_id long, text string"
    )
    with pytest.raises(Exception, match="packed-ordinal bounds"):
        line_dedup_keep_first(docs).collect()


def test_line_dedup_keep_first_semantics(spark):
    docs = spark.createDataFrame(
        [
            (1, "shared line\nunique one\n\nshared line"),
            (2, "shared line\nunique two\n"),
            (3, "unique three"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in line_dedup_keep_first(docs).collect()}
    # doc 1 holds the global first occurrence; its in-doc repeat at pos 3
    # is a later occurrence and goes; empty lines always survive
    assert out[1]["clean_text"] == "shared line\nunique one\n"
    assert out[1]["n_lines_kept"] == 3 and out[1]["n_lines_removed"] == 1
    # doc 2's copy is removed; its trailing empty line survives
    assert out[2]["clean_text"] == "unique two\n"
    assert out[2]["n_lines_removed"] == 1
    assert out[3]["clean_text"] == "unique three"
    assert out[3]["n_lines_removed"] == 0
