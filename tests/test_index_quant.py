"""Inverted index, tokenizer fertility, and int8 embedding quantization:
hand-built semantics pins and DuckDB oracle parity (the sf0.001 twin of
the driver gate)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from compare_util import assert_frames_match, duck_to_pdf

from geocode_spark.textops.corpusops import (
    inverted_index,
    inverted_index_oracle_sql,
)
from geocode_spark.textops.lm import (
    tokenizer_fertility,
    tokenizer_fertility_oracle_sql,
)
from geocode_spark.textops.similarity import (
    embedding_quantize,
    embedding_quantize_oracle_sql,
)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


# --------------------------------------------------------- inverted index

def test_inverted_index_postings_order_and_df_bounds(spark):
    docs = _docs(spark, [
        (2, "a", "b b a"),
        (0, "a", "a a a b"),
        (1, "a", "a c"),
    ])
    out = (
        inverted_index(docs, min_df=1)
        .toPandas().set_index("term").sort_index()
    )
    # postings in doc_id order regardless of input order; tf exact
    assert out.loc["a"].postings == "0:3,1:1,2:1"
    assert out.loc["a"].df == 3 and out.loc["a"].cf == 5
    assert out.loc["b"].postings == "0:1,2:2"
    assert out.loc["c"].postings == "1:1"
    # min_df prunes the df-1 term, max_df prunes the stopword-scale one
    pruned = inverted_index(docs, min_df=2).toPandas()
    assert set(pruned.term) == {"a", "b"}
    capped = inverted_index(docs, min_df=1, max_df=2).toPandas()
    assert set(capped.term) == {"b", "c"}


def test_inverted_index_oracle_parity_sf(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    got = inverted_index(docs).toPandas()
    want = duck_to_pdf(inverted_index_oracle_sql(), SF_DIR)
    assert len(got) > 0 and (got.df > 1).all()
    assert_frames_match(got, want, label="inverted_index")


# ----------------------------------------------------- tokenizer fertility

def test_fertility_integer_ratios(spark):
    # vocab {ab, cd}: with 0 merge steps every word costs len(word)+1
    # symbols? No — steps come from the induced table; just pin the
    # invariants instead: fertility >= 1000 (a word is >= 1 token) and
    # bytes ratio consistent with the exact sums
    docs = _docs(spark, [
        (0, "s1", "ab ab cd"),
        (1, "s2", "ab"),
    ])
    out = tokenizer_fertility(docs).toPandas().set_index("source").sort_index()
    assert list(out.n_docs) == [1, 1]
    assert list(out.n_words) == [3, 1]
    assert list(out.n_bytes) == [8, 2]
    for _, r in out.iterrows():
        assert r.tokens_per_kword == r.n_tokens_bpe * 1000 // max(r.n_words, 1)
        assert r.bytes_per_ktoken == r.n_bytes * 1000 // max(r.n_tokens_bpe, 1)
        assert r.tokens_per_kword >= 1000


def test_fertility_oracle_parity_sf(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    got = tokenizer_fertility(docs).toPandas()
    want = duck_to_pdf(tokenizer_fertility_oracle_sql(), SF_DIR)
    assert len(got) > 1  # effect size: multiple sources
    assert (got.n_tokens_bpe < got.n_bytes).all()  # merges actually fired
    assert_frames_match(got, want, label="tokenizer_fertility")


# --------------------------------------------------- embedding quantization

def test_quantize_halfup_scale_and_zero_vector(spark):
    emb = spark.createDataFrame(
        [(0, [1.0, -0.5, 0.25, 0.0]), (1, [0.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    out = embedding_quantize(emb).toPandas().set_index("vec_id").sort_index()
    # scale = 1.0 -> lanes 127, floor(-63.5+0.5)=-63, floor(31.75+.5)=32, 0
    assert out.loc[0].q_csv == "127,-63,32,0"
    assert out.loc[0].scale_micro == 1_000_000
    assert out.loc[0].dim == 4
    # all-zero vector: scale 0, zero lanes (guarded division)
    assert out.loc[1].q_csv == "0,0"
    assert out.loc[1].scale_micro == 0


def test_quantize_oracle_parity_sf(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    got = embedding_quantize(emb).toPandas()
    want = duck_to_pdf(embedding_quantize_oracle_sql(), SF_DIR)
    assert len(got) > 0
    # effect size: the max-|v| lane of every vector quantizes to +-127
    assert got.q_csv.str.contains("127").all()
    assert_frames_match(got, want, label="embedding_quantize")
