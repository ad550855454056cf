"""Image perceptual byte hash: oracle parity for the hash, and handcrafted
Hamming-distance semantics for the chunk-join pair finder."""

import os
import sys

import pandas as pd
import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from compare_util import assert_frames_match, duck_to_pdf

SF_DIR = "/root/testdata/sf0.001"

HEADER = 8
# payload of 61 bytes -> sample j sits exactly at payload offset j
N_PAYLOAD = 61


def _img(payload: list) -> bytes:
    assert len(payload) == N_PAYLOAD
    return bytes(range(HEADER)) + bytes(payload)


@pytest.fixture(scope="module")
def crafted(spark):
    base = [10 if i % 2 == 0 else 200 for i in range(N_PAYLOAD)]
    near = list(base)
    near[30] = 10 if near[30] == 200 else 200   # flips bits 29 and 30 only
    far = [200 if i % 2 == 0 else 10 for i in range(N_PAYLOAD)]  # inverted
    pdf = pd.DataFrame({
        "url": ["a", "b", "c"],
        "html": [_img(base), _img(near), _img(far)],
    })
    return spark.createDataFrame(pdf)


def test_image_bytehash_oracle(spark):
    from geocode_spark.fixtures import ensure_fixtures
    from geocode_spark.textops.multimodal import (
        image_bytehash, image_bytehash_oracle_sql, image_dup_corpus,
    )

    fix = str(ensure_fixtures(SF_DIR))
    got = image_bytehash(
        image_dup_corpus(spark.read.parquet(f"{fix}/pages.parquet"))
    ).toPandas()
    want = duck_to_pdf(image_bytehash_oracle_sql(fix), SF_DIR)
    assert_frames_match(got, want, label="image_bytehash")
    # injected exact copies share their original's hash
    dups = got[got["url"].str.endswith("#imgdup")]
    assert len(dups) > 0
    by_url = got.set_index("url")["hash60"]
    for u in dups["url"]:
        assert by_url[u] == by_url[u.removesuffix("#imgdup")]


def test_image_hash_pairs_hamming_semantics(crafted):
    from geocode_spark.textops.multimodal import (
        image_bytehash, image_hash_pairs,
    )

    h = image_bytehash(crafted).toPandas().set_index("url")["hash60"]
    # flipping payload[30] (10 -> 200): bit 29 compares 200>200 (tie, stays
    # 0) and bit 30 flips 1 -> 0 — exactly ONE gradient bit changes
    assert bin(h["a"] ^ h["b"]).count("1") == 1
    assert bin(h["a"] ^ h["c"]).count("1") > 4

    pairs = image_hash_pairs(crafted).toPandas()
    assert set(zip(pairs["url_a"], pairs["url_b"])) == {("a", "b")}
    assert pairs.iloc[0]["hamming"] == 1


def test_image_hash_short_payload_is_null(spark):
    from geocode_spark.textops.multimodal import image_bytehash

    pdf = pd.DataFrame({
        "url": ["tiny", "empty"],
        "html": [bytes(range(HEADER + 1)), b""],
    })
    out = image_bytehash(spark.createDataFrame(pdf)).toPandas()
    assert out["hash60"].isna().all()


def test_synthetic_corpus_is_high_entropy_and_recovers_flips(spark, fixtures_dir):
    """VERDICT r02 #10: the synthetic md5-chain corpus must not collapse
    like the word-salad payloads (distinct hashes ~= images), and every
    injected byte-flip near-copy must come back at Hamming <= 2."""
    from geocode_spark.textops.multimodal import (
        image_bytehash,
        image_hash_pairs,
        synthetic_image_corpus,
    )

    pages = spark.read.parquet(f"{fixtures_dir}/pages.parquet")
    corpus = synthetic_image_corpus(pages).cache()
    sig = image_bytehash(corpus).toPandas()
    assert sig["hash60"].notna().all()
    # high entropy among the BASE images: collisions are 60-bit-hash rare,
    # not word-salad endemic (dup images legitimately collide when the byte
    # flip lands on already-matching gradient bits — hamming 0)
    base_sig = sig[~sig["url"].str.endswith("#syndup")]
    assert base_sig["hash60"].nunique() >= len(base_sig) - 1

    pairs = image_hash_pairs(corpus).toPandas()
    n_dups = corpus.filter(F.col("url").endswith("#syndup")).count()
    assert n_dups > 0 and len(pairs) == n_dups
    assert (pairs["hamming"] <= 2).all()
    got = set(zip(pairs["url_a"], pairs["url_b"]))
    want = {(u[: -len("#syndup")], u) for (u,) in
            corpus.filter(F.col("url").endswith("#syndup"))
            .select("url").collect()}
    assert got == want
    corpus.unpersist()


# ---------------------------------------------- audio sign-of-delta prints
def _clips(spark, rows):
    return spark.createDataFrame(rows, "url string, html binary")


def _pcm(header: int, samples: list) -> bytes:
    return bytes([0] * header) + bytes(samples)


def test_audio_fp_gain_invariance(spark):
    from geocode_spark.textops.multimodal import (
        HEADER_BYTES,
        audio_fingerprint,
    )

    # 4 windows of 16 samples with strictly ordered energies; doubling
    # every sample (<128, no clipping) scales each energy by exactly 4 —
    # order preserved, fingerprint identical
    base = [10] * 16 + [20] * 16 + [5] * 16 + [40] * 16
    rows = audio_fingerprint(
        _clips(
            spark,
            [
                ("a", _pcm(HEADER_BYTES, base)),
                ("b", _pcm(HEADER_BYTES, [2 * s for s in base])),
            ],
        )
    ).collect()
    fps = {r.url: (r.n_windows, r.fp) for r in rows}
    assert fps["a"] == fps["b"]
    # bits: e1>e0 (1), e2<e1 (0), e3>e2 (1) -> fp = 0b101 = 5
    assert fps["a"] == (4, 5)


def test_audio_fp_single_flip_within_hamming_2(spark):
    from geocode_spark.textops.multimodal import (
        HEADER_BYTES,
        audio_fingerprint_pairs,
    )

    base = list(range(1, 97))  # 6 windows, monotone energies
    corrupt = list(base)
    corrupt[40] = 0  # one sample in window 2
    rows = audio_fingerprint_pairs(
        _clips(
            spark,
            [
                ("orig", _pcm(HEADER_BYTES, base)),
                ("corrupt", _pcm(HEADER_BYTES, corrupt)),
            ],
        )
    ).collect()
    assert len(rows) == 1
    assert rows[0].hamming <= 2


def test_audio_fp_short_payloads_dropped(spark):
    from geocode_spark.textops.multimodal import (
        HEADER_BYTES,
        audio_fingerprint,
    )

    rows = audio_fingerprint(
        _clips(
            spark,
            [
                ("empty", b""),
                ("header_only", bytes(HEADER_BYTES)),
                ("one_window", _pcm(HEADER_BYTES, [7] * 4)),
            ],
        )
    ).collect()
    fps = {r.url: (r.n_windows, r.fp) for r in rows}
    assert set(fps) == {"one_window"}
    assert fps["one_window"] == (1, 0)  # no deltas -> fp 0
