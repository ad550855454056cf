"""Bigram-LM quality scoring edge cases.

The corpus-level differential gate lives in the driver contract
(bigram_lm_score vs its DuckDB oracle); these pin the hand-checkable
semantics: the smoothed probability arithmetic on a tiny corpus, short-doc
behavior, and the quality-ordering property the filter relies on.
"""

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from geocode_spark.textops.lm import LP_SCALE, bigram_lm_score


def _docs(spark, texts):
    return spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )


def test_bigram_lm_exact_arithmetic(spark):
    # corpus: "a b" x2 and "a c" -> bigrams: (a,b):2, (a,c):1
    # c1(a)=3, vocab V=|{b,c}|=2
    # p(b|a)=(2+1)/(3+2)=0.6  p(c|a)=(1+1)/(3+2)=0.4
    out = {
        r.doc_id: r
        for r in bigram_lm_score(_docs(spark, ["a b", "a b", "a c"])).collect()
    }
    nll_ab = -round(math.log(0.6) * LP_SCALE)
    nll_ac = -round(math.log(0.4) * LP_SCALE)
    assert (out[0].n_bigrams, out[0].nll_micro) == (1, nll_ab)
    assert (out[1].n_bigrams, out[1].nll_micro) == (1, nll_ab)
    assert (out[2].n_bigrams, out[2].nll_micro) == (1, nll_ac)


def test_bigram_lm_short_docs_score_zero(spark):
    # NB: doc 2 is "a b c" (vocab 2) so its smoothed p < 1 and NLL > 0; a
    # vocab-1 corpus like ["a b"] alone scores p=(1+1)/(1+1)=1, NLL=0.
    out = {
        r.doc_id: r
        for r in bigram_lm_score(_docs(spark, ["solo", "", "a b c"])).collect()
    }
    assert (out[0].n_bigrams, out[0].nll_micro) == (0, 0)
    assert (out[1].n_bigrams, out[1].nll_micro) == (0, 0)
    assert out[2].n_bigrams == 2 and out[2].nll_micro > 0


def test_bigram_lm_rare_text_scores_worse(spark):
    # 20 fluent docs sharing bigram structure + 1 doc of unique gibberish:
    # the gibberish doc's per-bigram NLL must exceed every fluent doc's
    texts = ["the cat sat on the mat"] * 20 + ["zq xv qq vx zz qx"]
    rows = bigram_lm_score(_docs(spark, texts)).collect()
    per_tok = {r.doc_id: r.nll_micro / r.n_bigrams for r in rows}
    gibberish = per_tok[20]
    assert all(gibberish > per_tok[i] for i in range(20))


def test_bigram_lm_case_folds(spark):
    out = {
        r.doc_id: r.nll_micro
        for r in bigram_lm_score(_docs(spark, ["A B", "a b"])).collect()
    }
    assert out[0] == out[1]


def _docs_src(spark, rows):
    return spark.createDataFrame(
        [(i, t, s) for i, (t, s) in enumerate(rows)],
        "doc_id long, text string, source string",
    )


def test_dsir_prefers_target_domain_docs(spark):
    from geocode_spark.textops.lm import dsir_log_ratio

    # target domain "wiki" speaks one language, the rest another; a new
    # wiki-like doc must out-score a web-like doc
    rows = (
        [("alpha beta gamma alpha beta", "wiki")] * 5
        + [("spam click buy spam click", "web")] * 5
        + [("alpha beta gamma", "new"), ("spam click buy", "new")]
    )
    out = {
        r.doc_id: r
        for r in dsir_log_ratio(
            _docs_src(spark, rows), target_source="wiki"
        ).collect()
    }
    wiki_like, web_like = out[10], out[11]
    assert wiki_like.ratio_micro > web_like.ratio_micro
    assert wiki_like.ratio_micro > 0  # target model genuinely likes it


def test_dsir_short_docs_score_zero(spark):
    from geocode_spark.textops.lm import dsir_log_ratio

    rows = [("a b a b", "t"), ("solo", "x"), ("", "x")]
    out = {
        r.doc_id: r
        for r in dsir_log_ratio(_docs_src(spark, rows), target_source="t").collect()
    }
    assert (out[1].n_bigrams, out[1].ratio_micro) == (0, 0)
    assert (out[2].n_bigrams, out[2].ratio_micro) == (0, 0)


def test_dsir_unseen_in_target_gets_smoothed_floor(spark):
    import math

    from geocode_spark.textops.lm import LP_SCALE, dsir_log_ratio

    # target = {"a b"}; scored doc "c d" has NO target-seen bigrams:
    # lp_t = ln((0+1)/(0+V_t)) with V_t=1 -> ln(1) = 0
    # corpus model: bigrams (a,b):1 (c,d):1 -> each p = (1+1)/(1+2)=2/3
    rows = [("a b", "t"), ("c d", "x")]
    out = {
        r.doc_id: r
        for r in dsir_log_ratio(_docs_src(spark, rows), target_source="t").collect()
    }
    lp_c = round(math.log(2.0 / 3.0) * LP_SCALE)
    assert out[1].n_bigrams == 1
    assert out[1].ratio_micro == 0 - lp_c


def test_dsir_empty_target_raises(spark):
    import pytest as _pytest

    from geocode_spark.textops.lm import dsir_log_ratio

    rows = [("a b c", "x"), ("d e f", "y")]
    # the builder is eager (it counts the target model to size the
    # scoring join), so the raise happens at construction
    with _pytest.raises(Exception, match="matched no documents"):
        dsir_log_ratio(_docs_src(spark, rows), target_source="nope").collect()


def test_int_keep_low_threshold_ignores_nulls(spark):
    from geocode_spark.textops.lm import int_keep_low_threshold

    df = spark.createDataFrame(
        [(1,), (2,), (None,), (None,)], "v long"
    )
    # nulls excluded: 2 non-null rows, keep half -> threshold 1
    assert int_keep_low_threshold(df, "v", keep_ppk=500, bin_width=1) == 1
    allnull = df.filter("v is null")
    assert int_keep_low_threshold(allnull, "v", 500, 1) is None


def test_bpe_merge_steps_hand_checked(spark):
    from geocode_spark.textops.lm import bpe_merge_steps

    # corpus "ab ab ab" x2 + "abc": char pairs (a,b):7 wins step 1;
    # step 2 merges the next-best among the rewritten symbols
    rows = bpe_merge_steps(_docs(spark, ["ab ab ab", "ab ab ab", "abc"]),
                           steps=2).collect()
    assert (rows[0].step, rows[0].lhs, rows[0].rhs,
            rows[0].merged, rows[0].cnt) == (1, "a", "b", "ab", 7)
    # after step 1 every word is [ab] or [ab, c]; only pair left: (ab, c)
    assert (rows[1].step, rows[1].lhs, rows[1].rhs,
            rows[1].merged, rows[1].cnt) == (2, "ab", "c", "abc", 1)


def test_bpe_merge_greedy_overlap(spark):
    from geocode_spark.textops.lm import bpe_merge_steps

    # "aaaa" x3: step 1 pair (a,a) cnt 9; greedy leftmost rewrites
    # [a,a,a,a] -> [aa,aa] (never [a,aa,a]); step 2 must therefore see
    # pair (aa,aa) cnt 3 -- the no-overlap property made observable
    rows = bpe_merge_steps(_docs(spark, ["aaaa", "aaaa", "aaaa"]),
                           steps=2).collect()
    assert (rows[0].lhs, rows[0].rhs, rows[0].cnt) == ("a", "a", 9)
    assert (rows[1].lhs, rows[1].rhs, rows[1].cnt) == ("aa", "aa", 3)


def test_bpe_merge_steps_effect_size(spark, sf_dir):
    """>= 3 DISTINCT merges actually apply on the real corpus, merged
    symbols compound (some step reuses an earlier merge's output), and
    counts are non-increasing only where ties allow -- the loop is doing
    real successive work, not re-ranking the same pair table."""
    from geocode_spark.textops.lm import bpe_merge_steps

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rows = bpe_merge_steps(docs, steps=8).collect()
    assert len(rows) == 8
    merged = [r.merged for r in rows]
    assert len(set(merged)) == 8  # all distinct merges
    # compounding: some later step consumes an earlier merged symbol
    assert any(
        r.lhs in merged[: i] or r.rhs in merged[: i]
        for i, r in enumerate(rows)
    )
    assert all(r.cnt >= 1 for r in rows)


def test_perplexity_buckets_semantics(spark):
    """Exact discrete terciles over hand-sized score groups: three docs
    per distinct average NLL tier, ties share a bucket, short docs get
    the -1 sentinel and 'unscored'."""
    from geocode_spark.textops.lm import perplexity_buckets

    # three fluency tiers: repeated common bigrams (low NLL) vs
    # mixed vs all-distinct words (high NLL under the corpus's own LM)
    docs = spark.createDataFrame(
        [
            (0, "a b a b a b a b"),
            (1, "a b a b c d c d"),
            (2, "q w e r t y u i"),
            (3, "solo"),  # no bigrams
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in perplexity_buckets(docs).collect()}
    assert rows[3]["avg_nll_micro"] == -1
    assert rows[3]["bucket"] == "unscored"
    scored = [rows[i] for i in (0, 1, 2)]
    # ordering: more repeated structure -> lower avg NLL -> earlier bucket
    nlls = [r["avg_nll_micro"] for r in scored]
    assert nlls == sorted(nlls)
    assert [r["bucket"] for r in scored] == ["head", "middle", "tail"]


def test_perplexity_buckets_tie_sharing(spark):
    from geocode_spark.textops.lm import perplexity_buckets

    # identical docs -> identical avg NLL -> ONE bucket for all of them
    docs = spark.createDataFrame(
        [(i, "same text in every document here") for i in range(6)],
        "doc_id long, text string",
    )
    rows = perplexity_buckets(docs).collect()
    assert len({r.bucket for r in rows}) == 1 and rows[0].bucket == "head"


def test_bpe_encode_tokens_hand_checked(spark):
    from geocode_spark.textops.lm import bpe_encode_tokens

    # "ab ab ab": step 1 merges (a,b) -> every word encodes to ONE symbol
    rows = bpe_encode_tokens(_docs(spark, ["ab ab ab"]), steps=1).collect()
    assert (rows[0].n_words, rows[0].n_tokens_bpe) == (3, 3)
    # steps=0: no merges -> tokens == characters
    rows = bpe_encode_tokens(_docs(spark, ["ab ab ab"]), steps=0).collect()
    assert (rows[0].n_words, rows[0].n_tokens_bpe) == (3, 6)


def test_bpe_encode_merges_compound(spark):
    from geocode_spark.textops.lm import bpe_encode_tokens

    # "abc abc": round 1 (a,b) [tie with (b,c) broken on pair asc],
    # round 2 (ab,c) -> each word is one token
    rows = bpe_encode_tokens(_docs(spark, ["abc abc"]), steps=2).collect()
    assert (rows[0].n_words, rows[0].n_tokens_bpe) == (2, 2)


def test_bpe_encode_empty_and_bounds(spark):
    from geocode_spark.textops.lm import bpe_encode_tokens

    df = spark.createDataFrame(
        [(0, "alpha beta gamma alpha beta"), (1, ""), (2, None)],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in bpe_encode_tokens(df, steps=4).collect()}
    assert (rows[1].n_words, rows[1].n_tokens_bpe) == (0, 0)
    assert (rows[2].n_words, rows[2].n_tokens_bpe) == (0, 0)
    r = rows[0]
    total_chars = len("alphabetagammaalphabeta")
    # merges only ever shrink: n_words <= tokens < chars (4 rounds on a
    # corpus with repeated words MUST apply at least one merge)
    assert r.n_words == 5
    assert r.n_words <= r.n_tokens_bpe < total_chars


def test_trigram_lm_exact_arithmetic(spark):
    import math

    from geocode_spark.textops.lm import LP_SCALE, trigram_lm_score

    # "a b c a b c": trigrams (ab->c)x2, (bc->a), (ca->b); V = 3
    rows = {r.doc_id: r for r in trigram_lm_score(
        _docs(spark, ["a b c a b c", "a b"])).collect()}
    lp_abc = round(math.log((2 + 1.0) / (2 + 3)) * LP_SCALE)
    lp_other = round(math.log((1 + 1.0) / (1 + 3)) * LP_SCALE)
    assert rows[0].n_trigrams == 4
    assert rows[0].nll_micro == -(2 * lp_abc + 2 * lp_other)
    # < 3 words -> (0, 0)
    assert (rows[1].n_trigrams, rows[1].nll_micro) == (0, 0)


def test_trigram_vs_bigram_orders_are_distinct(spark):
    from geocode_spark.textops.lm import bigram_lm_score, trigram_lm_score

    docs = _docs(spark, ["x y z w x y z", "p q r s"])
    bi = {r.doc_id: r.n_bigrams for r in bigram_lm_score(docs).collect()}
    tri = {r.doc_id: r.n_trigrams for r in trigram_lm_score(docs).collect()}
    for d in (0, 1):
        assert tri[d] == bi[d] - 1  # one fewer position per doc


def test_bpe_encode_oracle_survives_merge_exhaustion(spark):
    """A corpus whose pairs run out before `steps` rounds: the engine
    breaks out of the loop and keeps the symbol relation; the unrolled
    twin must pass symbols through empty rounds rather than wiping them
    (the CROSS-JOIN-against-empty-top regression)."""
    import duckdb

    from geocode_spark.textops.lm import (
        bpe_encode_oracle_sql,
        bpe_encode_tokens,
    )

    df = _docs(spark, ["ab ab"])  # fully merged after ONE round
    got = bpe_encode_tokens(df, steps=10).collect()
    assert (got[0].n_words, got[0].n_tokens_bpe) == (2, 2)
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM (VALUES (0, 'ab ab'))"
        " t(doc_id, text)"
    )
    want = con.sql(bpe_encode_oracle_sql("documents", steps=10)).fetchall()
    assert want == [(0, 2, 2)]
