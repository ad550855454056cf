"""Span-level dedup + BPE pair-induction edge cases.

The corpus-level differential gates live in the driver contract
(span_dup_stats / bpe_pair_stats vs their DuckDB oracles); these pin the
hand-checkable semantics: window arithmetic, the cross-doc criterion
(within-doc repeats do NOT count), short-doc behavior, and deterministic
pair ranking.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from geocode_spark.textops.lm import bpe_pair_stats
from geocode_spark.textops.spans import span_dedup_rewrite, span_dup_stats


def _docs(spark, texts):
    return spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )


def test_span_dup_cross_doc_counts(spark):
    # W=3: docs 0 and 1 share the window "a b c"; doc 2 shares nothing.
    out = {
        r.doc_id: r
        for r in span_dup_stats(
            _docs(spark, ["a b c d", "x a b c", "p q r s"]), window=3
        ).collect()
    }
    # each doc has 4-3+1 = 2 windows
    assert all(out[i].n_windows == 2 for i in range(3))
    assert out[0].dup_windows == 1  # "a b c" at position 1
    assert out[1].dup_windows == 1  # "a b c" at position 2
    assert out[2].dup_windows == 0


def test_span_dup_within_doc_repeat_not_counted(spark):
    # "a b a b a b" repeats window "a b a" internally but no OTHER doc
    # has it -> cross-doc criterion scores 0 duplicated windows.
    out = {
        r.doc_id: r
        for r in span_dup_stats(
            _docs(spark, ["a b a b a b", "z z z z"]), window=3
        ).collect()
    }
    assert out[0].n_windows == 4 and out[0].dup_windows == 0
    assert out[1].n_windows == 2 and out[1].dup_windows == 0


def test_span_dup_every_position_counts(spark):
    # identical docs: EVERY window position is cross-doc duplicated
    out = {
        r.doc_id: r
        for r in span_dup_stats(
            _docs(spark, ["a b c d e", "a b c d e"]), window=3
        ).collect()
    }
    assert all((out[i].n_windows, out[i].dup_windows) == (3, 3) for i in (0, 1))


def test_span_dup_short_docs_score_zero(spark):
    out = {
        r.doc_id: r
        for r in span_dup_stats(_docs(spark, ["a b", "", "a b c"]), window=3).collect()
    }
    assert (out[0].n_windows, out[0].dup_windows) == (0, 0)
    assert (out[1].n_windows, out[1].dup_windows) == (0, 0)
    assert (out[2].n_windows, out[2].dup_windows) == (1, 0)


def test_span_rewrite_cuts_covered_words(spark):
    # W=3: "a b c" duplicated across docs 0/1 -> its 3 words are cut from
    # both; surrounding words survive in order.
    out = {
        r.doc_id: r
        for r in span_dedup_rewrite(
            _docs(spark, ["x a b c y", "a b c z", "p q r s"]), window=3
        ).collect()
    }
    assert (out[0].n_removed, out[0].text_clean) == (3, "x y")
    assert (out[1].n_removed, out[1].text_clean) == (3, "z")
    assert (out[2].n_removed, out[2].text_clean) == (0, "p q r s")


def test_span_rewrite_overlapping_windows_merge(spark):
    # identical docs: every position covered -> fully cut, empty output
    out = {
        r.doc_id: r
        for r in span_dedup_rewrite(
            _docs(spark, ["a b c d e", "a b c d e"]), window=3
        ).collect()
    }
    for i in (0, 1):
        assert (out[i].n_words, out[i].n_removed, out[i].text_clean) == (
            5, 5, "",
        )


def test_span_rewrite_short_docs_pass_through(spark):
    out = {
        r.doc_id: r
        for r in span_dedup_rewrite(
            _docs(spark, ["a b", ""]), window=3
        ).collect()
    }
    assert (out[0].n_words, out[0].n_removed, out[0].text_clean) == (2, 0, "a b")
    assert (out[1].n_words, out[1].n_removed, out[1].text_clean) == (0, 0, "")


def test_span_matching_case_insensitive_output_case_preserved(spark):
    # windows match case-insensitively ("a b c" ~ "A B C"); the rewrite
    # cuts them from both docs but surviving words keep ORIGINAL casing
    docs = _docs(spark, ["Keep This a b c", "A B C x"])
    stats = {r.doc_id: r for r in span_dup_stats(docs, window=3).collect()}
    assert stats[0].dup_windows == 1 and stats[1].dup_windows == 1
    out = {r.doc_id: r for r in span_dedup_rewrite(docs, window=3).collect()}
    assert (out[0].n_removed, out[0].text_clean) == (3, "Keep This")
    assert (out[1].n_removed, out[1].text_clean) == (3, "x")


def test_span_rewrite_no_dedup_preserves_words_verbatim(spark):
    # nothing duplicated -> every word survives byte-identical (casing and
    # punctuation intact; only whitespace runs collapse — word-level contract)
    out = {
        r.doc_id: r
        for r in span_dedup_rewrite(
            _docs(spark, ["The  Cat, SAT!", "p q r s"]), window=3
        ).collect()
    }
    assert (out[0].n_removed, out[0].text_clean) == (0, "The Cat, SAT!")


def test_bpe_pair_counts_weighted_by_word_freq(spark):
    # corpus words: "ab" x3, "abc" x1 -> pairs: ab: 3+1=4, bc: 1
    rows = bpe_pair_stats(_docs(spark, ["ab ab", "ab abc"]), k=10).collect()
    got = {r.pair: (r.rank, r.cnt) for r in rows}
    assert got["ab"] == (1, 4)
    assert got["bc"] == (2, 1)
    assert len(rows) == 2  # single-char words contribute nothing


def test_bpe_pair_within_word_repeats_count(spark):
    # "aaa" -> "aa" twice per occurrence
    rows = bpe_pair_stats(_docs(spark, ["aaa aaa"]), k=5).collect()
    assert [(r.rank, r.pair, r.cnt) for r in rows] == [(1, "aa", 4)]


def test_bpe_pair_deterministic_tiebreak(spark):
    # "xy" and "pq" both count 1 -> ties rank by pair string ascending
    rows = bpe_pair_stats(_docs(spark, ["xy pq"]), k=5).collect()
    assert [(r.rank, r.pair) for r in rows] == [(1, "pq"), (2, "xy")]


def test_bpe_pair_k_truncates(spark):
    rows = bpe_pair_stats(_docs(spark, ["abcdefg"]), k=3).collect()
    assert len(rows) == 3 and [r.rank for r in rows] == [1, 2, 3]


# --------------------------------------------------------------- kernel fuzz
# The round-5 rolling-hash kernel (prefix-polynomial word hashes + two-lane
# Buzhash window keys) replaced the md5-string path; these pin it against a
# brute-force Python twin on randomized corpora with INJECTED duplications,
# asserting nonzero effect size (the vacuous-gate discipline: a gate that
# finds zero duplicates tests nothing).


def _brute_span_stats(texts, w):
    """Oracle-free reference: dict doc_id -> (n_windows, dup_windows)."""
    toks = [t.lower().split() for t in texts]
    wins = [
        [tuple(ws[i : i + w]) for i in range(max(len(ws) - w + 1, 0))]
        for ws in toks
    ]
    owners: dict = {}
    for d, lst in enumerate(wins):
        for win in set(lst):
            owners.setdefault(win, set()).add(d)
    return {
        d: (
            len(lst),
            sum(1 for win in lst if len(owners[win]) >= 2),
        )
        for d, lst in enumerate(wins)
    }


def _brute_rewrite(texts, w):
    """Reference rewrite: doc_id -> (n_words, n_removed, text_clean)."""
    toks_cased = [t.split() for t in texts]
    toks = [t.lower().split() for t in texts]
    owners: dict = {}
    for d, ws in enumerate(toks):
        for i in range(max(len(ws) - w + 1, 0)):
            owners.setdefault(tuple(ws[i : i + w]), set()).add(d)
    out = {}
    for d, ws in enumerate(toks):
        covered = set()
        for i in range(max(len(ws) - w + 1, 0)):
            if len(owners[tuple(ws[i : i + w])]) >= 2:
                covered.update(range(i, i + w))
        kept = [
            toks_cased[d][i] for i in range(len(ws)) if i not in covered
        ]
        out[d] = (len(ws), len(ws) - len(kept), " ".join(kept))
    return out


def _fuzz_corpus(seed, n_docs=60, vocab=40):
    import random

    rng = random.Random(seed)
    words = [f"w{i}" for i in range(vocab)]
    texts = [
        " ".join(rng.choice(words) for _ in range(rng.randrange(0, 30)))
        for _ in range(n_docs)
    ]
    # inject duplicated spans: pick a donor span, splice it into other docs
    # (mixed-case in half the recipients to exercise case-folding)
    for _ in range(6):
        donor = rng.randrange(n_docs)
        dt = texts[donor].split()
        if len(dt) < 6:
            continue
        i = rng.randrange(len(dt) - 5)
        span = dt[i : i + 6]
        for _ in range(rng.randrange(1, 4)):
            tgt = rng.randrange(n_docs)
            piece = " ".join(span)
            if rng.random() < 0.5:
                piece = piece.upper()
            tt = texts[tgt].split()
            j = rng.randrange(len(tt) + 1)
            texts[tgt] = " ".join(tt[:j] + [piece] + tt[j:])
    return texts


def test_span_kernel_fuzz_parity_vs_bruteforce(spark):
    import pytest

    total_dup = 0
    for seed in range(4):
        texts = _fuzz_corpus(seed)
        docs = _docs(spark, texts)
        got = {
            r.doc_id: (r.n_windows, r.dup_windows)
            for r in span_dup_stats(docs, window=4).collect()
        }
        want = _brute_span_stats(texts, 4)
        assert got == want, f"seed {seed}"
        got_rw = {
            r.doc_id: (r.n_words, r.n_removed, r.text_clean)
            for r in span_dedup_rewrite(docs, window=4).collect()
        }
        want_rw = _brute_rewrite(texts, 4)
        assert got_rw == want_rw, f"seed {seed}"
        total_dup += sum(d for _, d in want.values())
    # effect size: the injected spans MUST surface as duplicated windows
    assert total_dup >= 50, f"vacuous fuzz gate: only {total_dup} dup windows"


def test_span_kernel_window_keys_content_only(spark):
    """The same word window must key identically across positions, docs,
    Arrow chunks, and partitions; different windows must key apart."""
    from geocode_spark.textops.spans import _window_keys
    from pyspark.sql import functions as F

    # same 3-window at position 1 of doc 0 and position 5 of doc 1
    docs = _docs(
        spark,
        ["alpha beta gamma x", "p q r s alpha beta gamma", "alpha beta delta"],
    ).repartition(3)
    base = docs.select("doc_id", F.lower("text").alias("txt"))
    rows = _window_keys(base, 3).collect()
    keys = {(r.doc_id, r.p): (r.k1, r.k2) for r in rows}
    assert keys[(0, 1)] == keys[(1, 5)]  # content-only, position-free
    # 17 distinct 3-windows minus the one shared pair -> all others distinct
    distinct = {v for v in keys.values()}
    assert len(distinct) == len(keys) - 1


def test_span_kernel_chunk_boundary_consistent():
    """Keys agree when the same docs land in different kernel chunks.

    Driven driver-side through _kernel_chunk directly: patching
    spans._KERNEL_CHUNK_DOCS on the driver does NOT reach executor
    python workers (they re-import the module), so a Spark-side version
    of this test silently runs identical chunking on both sides — the
    zero-effect-gate trap. Direct chunk calls make the split real."""
    import pyarrow as pa

    import geocode_spark.textops.spans as spans

    texts = [f"a b c d shared span here tail{i}" for i in range(7)]
    batch = pa.RecordBatch.from_arrays(
        [pa.array(list(range(7)), pa.int64()), pa.array(texts)],
        names=["doc_id", "txt"],
    )
    out_schema = pa.schema(
        [
            pa.field("doc_id", pa.int64()),
            pa.field("p", pa.int32()),
            pa.field("k1", pa.int64()),
            pa.field("k2", pa.int64()),
        ]
    )

    def keys(chunk_docs):
        got = {}
        lo = 0
        while lo < batch.num_rows:
            out = spans._kernel_chunk(
                batch.slice(lo, chunk_docs), 3, out_schema
            )
            for r in out.to_pylist():
                got[(r["doc_id"], r["p"])] = (r["k1"], r["k2"])
            lo += chunk_docs
        return got

    big, small, single = keys(7), keys(2), keys(1)
    # 8 words per doc -> 6 window starts per doc, 7 docs
    assert big == small == single and len(big) == 7 * 6


def test_window_lane_no_rotation_period_collision():
    """Regression for the Buzhash period-64 class this module moved away
    from: at window=65, two windows that swap same-content words exactly
    64 offsets apart collided SYSTEMATICALLY in both rotation lanes.
    Polynomial lanes weight by in-window offset, so the swap must change
    both lanes — and equal content must still key equal at any start."""
    import numpy as np
    import pyarrow as pa

    from geocode_spark.textops.spans import (
        _flat_words,
        _window_lane,
        _word_hashes,
    )

    def lanes(doc, w):
        data, a, e, _ = _flat_words(pa.array([doc]))
        h = _word_hashes(data, a, e)
        return _window_lane(h, w, 0), _window_lane(h, w, 1)

    words = [f"w{i}" for i in range(70)]
    swapped = words[:]
    swapped[0], swapped[64] = swapped[64], swapped[0]
    k1a, k2a = lanes(" ".join(words), 65)
    k1b, k2b = lanes(" ".join(swapped), 65)
    assert not (k1a[0] == k1b[0] and k2a[0] == k2b[0])
    # start-offset invariance: the same window content at a shifted start
    k1c, k2c = lanes("pad " + " ".join(words), 65)
    assert (k1a == k1c[1:]).all() and (k2a == k2c[1:]).all()


def test_span_broadcast_and_keyed_paths_agree(spark, monkeypatch):
    """The broadcast-membership fast path and the exact keyed fallback
    (forced via the shared broadcast-budget env knob) must produce
    identical stats AND identical rewrites — including the mixed-repeat
    / short-doc / empty-doc edges."""
    texts = [
        "a b c d e f",          # shares "a b c" and "b c d" with doc 1
        "z a b c d y",
        "solo words only here",
        "a b",                   # shorter than the window
        "",                      # empty
        "a b c a b c a b c",     # within-doc repeats + cross-doc dup
    ]
    docs = _docs(spark, texts)

    def snap():
        stats = sorted(
            map(tuple, span_dup_stats(docs, window=3).collect())
        )
        rewrite = sorted(
            map(tuple, span_dedup_rewrite(docs, window=3).collect())
        )
        return stats, rewrite

    fast = snap()
    monkeypatch.setenv("SPARK_GRAFT_MODEL_BROADCAST_ROWS", "0")
    slow = snap()
    assert fast == slow


def test_probe_walks_mixed_key_collision_runs():
    """Two distinct (k1,k2) pairs CAN share a mixed sort key (constructed
    algebraically here: mix = splitmix64(k1 ^ k2*ODD), so
    k1b = k1a ^ k2a*ODD ^ k2b*ODD collides with (k1a, k2a)); the probe
    must resolve BOTH by walking the equal-mixed-key run and verifying
    lanes — membership stays exact on the 128-bit lane pair."""
    import numpy as np

    from geocode_spark.textops.spans import _MIX_ODD, _mix_lanes, _probe

    odd = np.uint64(_MIX_ODD)
    k1a, k2a, k2b = np.uint64(12345), np.uint64(777), np.uint64(999)
    with np.errstate(over="ignore"):  # wrapping uint64 math is the point
        k1b = k1a ^ (k2a * odd) ^ (k2b * odd)
    k1 = np.array([k1a, k1b, 42], np.uint64).view(np.int64)
    k2 = np.array([k2a, k2b, 43], np.uint64).view(np.int64)
    mixed = _mix_lanes(k1, k2)
    assert mixed[0] == mixed[1] and mixed[0] != mixed[2]  # real collision

    order = np.argsort(mixed, kind="stable")
    pack = {
        "mixed": mixed[order],
        "k1": k1[order],
        "k2": k2[order],
        "val": np.array([100, 200, 300], np.int64)[order],
    }
    found, idx = _probe(pack, k1, k2)
    assert found.all()
    assert (pack["k1"][idx] == k1).all() and (pack["k2"][idx] == k2).all()
    assert sorted(pack["val"][idx]) == [100, 200, 300]
    # same-mix NON-member (third lane pair colliding with the run) misses
    k2c = np.uint64(555)
    with np.errstate(over="ignore"):
        k1c = k1a ^ (k2a * odd) ^ (k2c * odd)
    f2, _ = _probe(
        pack,
        np.array([k1c], np.uint64).view(np.int64),
        np.array([k2c], np.uint64).view(np.int64),
    )
    assert not f2.any()


def test_chunk_bounds_byte_budget():
    """Chunking is bounded by BYTES, not only rows: a batch of large docs
    splits even below the row cap, and an over-budget single doc still
    yields its own chunk."""
    import pyarrow as pa

    import geocode_spark.textops.spans as spans

    old = spans._KERNEL_CHUNK_BYTES
    spans._KERNEL_CHUNK_BYTES = 100
    try:
        batch = pa.RecordBatch.from_arrays(
            [
                pa.array(list(range(4)), pa.int64()),
                pa.array(["x" * 60, "y" * 60, "z" * 250, "w" * 10]),
            ],
            names=["doc_id", "txt"],
        )
        ranges = list(spans._chunk_bounds(batch, (1,)))
        # 60+60 > 100 -> split; 250 alone over budget -> own chunk
        assert ranges == [(0, 1), (1, 1), (2, 1), (3, 1)]
        spans._KERNEL_CHUNK_BYTES = 130
        ranges = list(spans._chunk_bounds(batch, (1,)))
        assert ranges == [(0, 2), (2, 1), (3, 1)]
        assert sum(n for _, n in ranges) == 4
    finally:
        spans._KERNEL_CHUNK_BYTES = old
