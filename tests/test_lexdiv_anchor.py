"""Round-5 webtext additions: lexical diversity, anchor-text top-k."""

import pandas as pd
from pyspark.sql import functions as F

from geocode_spark.operators.graph import (
    ANCHOR_WORDS,
    LINK_COEFFS,
    anchor_terms_topk,
)
from geocode_spark.textops.textstats import lexical_diversity


def test_lexical_diversity_hand_case(spark):
    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3],
                "text": [
                    "the cat sat on the mat",   # 6 tokens, 5 types, 4 hapax
                    "word word word",            # 3 tokens, 1 type, 0 hapax
                    "a  B\tb\nA",                # folds to a b b a
                ],
            }
        )
    )
    got = {r.doc_id: r for r in lexical_diversity(docs).collect()}
    assert (got[1].n_tokens, got[1].n_types, got[1].n_hapax) == (6, 5, 4)
    assert got[1].ttr_ppm == 5 * 1_000_000 // 6
    assert (got[2].n_tokens, got[2].n_types, got[2].n_hapax) == (3, 1, 0)
    assert got[2].ttr_ppm == 333_333
    # case folding + mixed whitespace: "a b b a" -> 4 tokens, 2 types
    assert (got[3].n_tokens, got[3].n_types, got[3].n_hapax) == (4, 2, 0)
    assert got[3].ttr_ppm == 500_000


def test_lexical_diversity_empty_doc_absent(spark):
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2], "text": ["hello world", "   "]})
    )
    got = lexical_diversity(docs).toPandas()
    # a whitespace-only doc has no tokens: no row (same as the oracle)
    assert got.doc_id.tolist() == [1]


def test_anchor_terms_hand_case(spark):
    """3 docs -> quadratic link graph mod 3; anchors are each doc's first
    ANCHOR_WORDS case-folded tokens. Verified against a full python
    recomputation of graph + counts + ranking."""
    texts = ["Alpha beta gamma", "beta GAMMA delta", "gamma alpha alpha"]
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0, 1, 2], "text": texts})
    )
    n = 3
    edges = [
        (src, (src * src * a2 + src * a1 + a0) % n)
        for src in range(n)
        for a2, a1, a0 in LINK_COEFFS
    ]
    counts = {}
    for src, dst in edges:
        for term in texts[src].lower().split()[:ANCHOR_WORDS]:
            counts[(dst, term)] = counts.get((dst, term), 0) + 1
    expect = set()
    for dst in range(n):
        terms = sorted(
            ((t, c) for (d, t), c in counts.items() if d == dst),
            key=lambda tc: (-tc[1], tc[0]),
        )
        for rank, (t, c) in enumerate(terms[:3], start=1):
            expect.add((dst, t, c, rank))
    got = {
        (r.doc_id, r.term, r.n_refs, r.rank)
        for r in anchor_terms_topk(docs).collect()
    }
    assert got == expect


def test_anchor_terms_rank_bounded(spark):
    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": list(range(40)),
                "text": [f"token{i % 7} filler{i % 3} rest" for i in range(40)],
            }
        )
    )
    pdf = anchor_terms_topk(docs, k=2).toPandas()
    assert pdf["rank"].max() <= 2
    per_dst = pdf.groupby("doc_id")["rank"].apply(
        lambda s: sorted(s.tolist())
    )
    for ranks in per_dst:
        assert ranks == list(range(1, len(ranks) + 1))
    # effect size: ranking is over real multi-term competition somewhere
    assert (pdf["n_refs"] > 1).any()


def test_flesch_hand_case(spark):
    from geocode_spark.textops.textstats import flesch_readability

    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2],
                "text": [
                    "The cat sat. It sat well!",   # 6 words, 2 sentences
                    "xyz",                          # no vowels -> 1-syl floor
                ],
            }
        )
    )
    got = {r.doc_id: r for r in flesch_readability(docs).collect()}
    r = got[1]
    # syllables: the(1) cat(1) sat.(1) it(1) sat(1) well!(1) = 6
    assert (r.n_words, r.n_sentences, r.n_syllables) == (6, 2, 6)
    w, s, syl = 6, 2, 6
    assert r.ease_milli == (206835 * w * s - 1015 * w * w
                            - 84600 * syl * s) // (w * s)
    assert r.grade_milli == (390 * w * w + 11800 * syl * s
                             - 15590 * w * s) // (w * s)
    assert got[2].n_syllables == 1  # vowel-less token floors at 1


def test_flesch_monotone_effect(spark):
    """Longer sentences with polysyllabic words must read harder (lower
    ease) — the effect-size guard against a degenerate constant formula."""
    from geocode_spark.textops.textstats import flesch_readability

    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2],
                "text": [
                    "I go. We sit. It is fun. We nap.",
                    "Incomprehensibility notwithstanding institutional "
                    "universality perpetuates multidimensional "
                    "epistemological considerations",
                ],
            }
        )
    )
    got = {r.doc_id: r for r in flesch_readability(docs).collect()}
    assert got[1].ease_milli > got[2].ease_milli
    assert got[1].grade_milli < got[2].grade_milli


def test_co_citation_hand_case(spark):
    from geocode_spark.operators.graph import co_citation_pairs

    n = 6
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": list(range(n)), "text": ["x"] * n})
    )
    # python recomputation of the quadratic graph + pair counts
    edges = {
        (src, (src * src * a2 + src * a1 + a0) % n)
        for src in range(n)
        for a2, a1, a0 in LINK_COEFFS
    }
    by_dst = {}
    for s, d in edges:
        by_dst.setdefault(d, set()).add(s)
    expect = {}
    for d, srcs in by_dst.items():
        ss = sorted(srcs)
        for i in range(len(ss)):
            for j in range(i + 1, len(ss)):
                expect[(ss[i], ss[j])] = expect.get((ss[i], ss[j]), 0) + 1
    expect = {k: v for k, v in expect.items() if v >= 2}
    got = {
        (r.doc_a, r.doc_b): r.n_common
        for r in co_citation_pairs(docs).collect()
    }
    assert got == expect


def test_co_citation_ordering_and_threshold(spark):
    from geocode_spark.operators.graph import co_citation_pairs

    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": list(range(30)), "text": ["x"] * 30})
    )
    pdf = co_citation_pairs(docs, min_common=1).toPandas()
    assert (pdf.doc_a < pdf.doc_b).all()
    assert (pdf.n_common >= 1).all()
    # min_common filters monotonically
    n2 = len(co_citation_pairs(docs, min_common=2).toPandas())
    assert n2 <= len(pdf)
