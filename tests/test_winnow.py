"""Winnowing fingerprint semantics (oracle parity is pinned by
test_entry_contract; these pin the paper's properties on hand-built docs).

The reference selection used below is an INDEPENDENT python
re-implementation (hashlib md5 + explicit window scan), so the engine's
Catalyst fold is cross-checked twice: against DuckDB relationally and
against imperative python here.
"""
import hashlib

import pytest

from geocode_spark.textops.winnow import (
    WINNOW_K,
    WINNOW_T,
    winnow_candidate_pairs,
    winnow_fingerprints,
)


def _gram_hash(words, i, k):
    s = " ".join(words[i - 1 : i - 1 + k]).lower()
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _ref_select(text, k=WINNOW_K, t=WINNOW_T):
    words = text.split()
    m = len(words) - k + 1
    if m < 1:
        return set()
    gh = {i: _gram_hash(words, i, k) for i in range(1, m + 1)}
    out = set()
    for s in range(1, max(m - t + 1, 1) + 1):
        best_h, best_p = None, None
        for j in range(s, min(s + t - 1, m) + 1):
            if best_h is None or gh[j] <= best_h:
                best_h, best_p = gh[j], j  # rightmost min
        out.add((best_p, best_h))
    return out


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _fps(spark, text, **kw):
    rows = winnow_fingerprints(_docs(spark, [(0, text)]), **kw).collect()
    return {(r.pos, r.gram_hash) for r in rows}


def test_matches_independent_reference(spark):
    text = (
        "the quick brown fox jumps over the lazy dog while the quick "
        "brown fox naps under the old oak tree near the river bank"
    )
    assert _fps(spark, text) == _ref_select(text)


def test_density_and_dedup(spark):
    # 30 distinct words -> 27 grams, 23 windows; selections must dedup to
    # well under one per window and cover the whole doc
    text = " ".join(f"w{i}" for i in range(30))
    got = _fps(spark, text)
    assert got == _ref_select(text)
    assert 1 <= len(got) <= 23


def test_rightmost_tie_on_constant_doc(spark):
    # 12 identical words -> 9 identical grams; every window picks its
    # RIGHTMOST position: s+t-1 for s=1..5 -> positions {5..9}
    text = " ".join(["x"] * 12)
    got = _fps(spark, text)
    assert {p for p, _ in got} == {5, 6, 7, 8, 9}
    assert len({h for _, h in got}) == 1


def test_short_docs(spark):
    # < k words: no grams, no fingerprints
    assert _fps(spark, "a b c") == set()
    # k <= words < k+t-1: one window over all grams
    text = "a b c d e"  # m = 2 grams
    got = _fps(spark, text)
    assert len(got) == 1
    assert got == _ref_select(text)


def test_guarantee_shared_substring_yields_shared_fingerprint(spark):
    # any shared substring of >= t+k-1 (=8) words must produce at least
    # one SHARED fingerprint hash between the two docs
    shared = "alpha beta gamma delta epsilon zeta eta theta"
    d0 = "one two " + shared + " three four"
    d1 = "five six seven " + shared + " eight"
    df = _docs(spark, [(0, d0), (1, d1)])
    rows = winnow_fingerprints(df).collect()
    h0 = {r.gram_hash for r in rows if r.doc_id == 0}
    h1 = {r.gram_hash for r in rows if r.doc_id == 1}
    assert h0 & h1


def test_candidate_pairs_find_overlap_only(spark):
    shared = "alpha beta gamma delta epsilon zeta eta theta"
    df = _docs(
        spark,
        [
            (0, "one two " + shared + " three four"),
            (1, "five six seven " + shared + " eight"),
            (2, "totally different words with no overlap at all here"),
        ],
    )
    rows = winnow_candidate_pairs(df).collect()
    assert [(r.id_a, r.id_b) for r in rows] == [(0, 1)]
    assert rows[0].n_shared >= 1


def test_case_insensitive_matching(spark):
    a = "Alpha Beta Gamma Delta Epsilon Zeta Eta Theta"
    b = a.lower()
    df = _docs(spark, [(0, a), (1, b)])
    rows = winnow_fingerprints(df).collect()
    h0 = {(r.pos, r.gram_hash) for r in rows if r.doc_id == 0}
    h1 = {(r.pos, r.gram_hash) for r in rows if r.doc_id == 1}
    assert h0 == h1 and h0
