"""Adversarial skew for the dedup candidate generators (VERDICT r02 #7).

The driver corpora are benign; this fixture is not: every doc shares one hot
boilerplate template (the classic web-corpus skew — nav bars, footers,
licenses), so the naive inverted-index self-join would generate ~n^2/2
candidate pairs from the template shingles alone. Prefix filtering and
banded MinHash must both keep candidates bounded by actual similarity — and
still find every injected true near-duplicate."""

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_BASE = 800
N_INJECT = 10
TEMPLATE = "all rights reserved terms of service privacy policy contact us about"


@pytest.fixture(scope="module")
def skewed_corpus(spark):
    """N_BASE docs: identical 10-word template + 40 unique words each
    (pairwise jaccard ~0.09 — far below 0.8). N_INJECT extra docs clone a
    base doc's text with ONE tail word changed (jaccard ~0.88 — true
    near-dups that must be found)."""
    import pandas as pd

    rows = []
    for i in range(N_BASE):
        tail = " ".join(f"u{i}w{j}" for j in range(40))
        rows.append((i, f"{TEMPLATE} {tail}"))
    for i in range(N_INJECT):
        tail = " ".join(
            f"u{i}w{j}" for j in range(39)
        ) + f" changed{i}"
        rows.append((N_BASE + i, f"{TEMPLATE} {tail}"))
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    df = spark.createDataFrame(pdf, "doc_id bigint, text string").cache()
    yield df
    df.unpersist()


def _n_pairs(n):
    return n * (n - 1) // 2


def test_prefix_filter_bounds_candidates_under_hot_template(spark, skewed_corpus):
    from geocode_spark.textops.dedup import (
        ngram_prefix_candidates,
        with_shingles,
    )

    sh = with_shingles(skewed_corpus).persist()
    n_cand = ngram_prefix_candidates(sh, threshold=0.8).count()
    total = _n_pairs(N_BASE + N_INJECT)
    # the hot template (df = every doc) must fall out of every prefix:
    # candidates stay within a small multiple of the true near-dup pairs
    # instead of the ~327k all-pairs blowup
    assert n_cand <= 50, f"{n_cand} candidates (of {total} possible)"
    sh.unpersist()


def test_minhash_bands_bound_candidates_under_hot_template(spark, skewed_corpus):
    from geocode_spark.textops.dedup import (
        minhash_band_candidates,
        with_shingles,
    )

    sh = with_shingles(skewed_corpus).persist()
    n_cand = minhash_band_candidates(sh).count()
    total = _n_pairs(N_BASE + N_INJECT)
    # band keys are whole signature slices: template-only overlap (~9%
    # jaccard -> band-collision prob ~32 * 0.09^4 ~ 0.2%) cannot flood the
    # join. 5% of all-pairs is a >20x safety margin over expectation.
    assert n_cand <= total * 0.05, f"{n_cand} candidates (of {total})"
    sh.unpersist()


@pytest.mark.parametrize("op", ["ngram", "minhash"])
def test_injected_near_dups_survive_skew(spark, skewed_corpus, op):
    """Bounding candidates must not cost recall: every injected clone pair
    (and nothing else) comes out, with identical jaccard from both paths."""
    from geocode_spark.textops.dedup import (
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
    )

    fn = ngram_jaccard_pairs if op == "ngram" else minhash_lsh_pairs
    out = fn(skewed_corpus, threshold=0.8).toPandas()
    got = set(zip(out["id_a"], out["id_b"]))
    want = {(i, N_BASE + i) for i in range(N_INJECT)}
    assert got == want
    assert (out["jaccard"] >= 0.8).all()
