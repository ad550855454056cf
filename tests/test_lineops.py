"""Boilerplate line removal + epoch shuffle edge cases.

The corpus-level differential gates live in the driver contract
(strip_boilerplate, epoch_shuffle); these pin the hand-checkable semantics:
df thresholding, order-preserving reassembly, all-boilerplate documents,
and the shuffle's determinism / seed-sensitivity / shard balance.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from geocode_spark.textops.lineops import epoch_shuffle, strip_boilerplate


def _docs(spark, texts):
    return spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )


def test_strip_removes_frequent_lines_keeps_order(spark):
    texts = [
        "unique one\nFOOTER\nmiddle\nFOOTER",  # footer twice in one doc
        "FOOTER\nunique two",
        "unique three\nFOOTER",
    ]
    out = {
        r.doc_id: r
        for r in strip_boilerplate(_docs(spark, texts), min_df=3).collect()
    }
    # FOOTER is in 3 distinct docs -> removed everywhere, incl. both copies
    assert out[0].clean_text == "unique one\nmiddle"
    assert (out[0].n_lines_kept, out[0].n_lines_removed) == (2, 2)
    assert out[1].clean_text == "unique two"
    assert out[2].clean_text == "unique three"


def test_strip_df_counts_documents_not_occurrences(spark):
    # "X" occurs 3 times but only in 2 distinct docs -> below min_df=3
    texts = ["X\nX\na", "X\nb", "c"]
    out = {
        r.doc_id: r.clean_text
        for r in strip_boilerplate(_docs(spark, texts), min_df=3).collect()
    }
    assert out[0] == "X\nX\na"


def test_strip_all_boilerplate_doc_survives_empty(spark):
    texts = ["only", "only", "only", "only\nextra"]
    out = {
        r.doc_id: r
        for r in strip_boilerplate(_docs(spark, texts), min_df=4).collect()
    }
    assert len(out) == 4
    assert out[0].clean_text == "" and out[0].n_lines_kept == 0
    assert out[3].clean_text == "extra"


def test_epoch_shuffle_deterministic_and_seed_sensitive(spark):
    docs = _docs(spark, ["t"] * 64)
    a = sorted(epoch_shuffle(docs, seed=1).collect())
    b = sorted(epoch_shuffle(docs, seed=1).collect())
    c = sorted(epoch_shuffle(docs, seed=2).collect())
    assert a == b
    assert a != c


def test_epoch_shuffle_positions_are_dense_per_shard(spark):
    rows = epoch_shuffle(_docs(spark, ["t"] * 100), seed=0,
                         n_shards=4).collect()
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r.shard_pos)
    assert set(by_shard) <= {0, 1, 2, 3}
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(len(poss))), shard
    # md5 balance: no shard takes more than half of 100 docs
    assert max(len(v) for v in by_shard.values()) <= 50
