"""PMI collocations + domain JS-divergence: hand-built semantics pins and
DuckDB oracle parity (the sf0.001 twin of the driver gate)."""
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from compare_util import assert_frames_match, duck_to_pdf

from geocode_spark.textops.corpusops import (
    domain_divergence,
    domain_divergence_oracle_sql,
    pmi_collocations,
    pmi_collocations_oracle_sql,
)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

LN2_NANO = round(math.log(2.0) * 1e9)  # JS divergence upper bound


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


# ----------------------------------------------------------------- PMI

def test_pmi_strong_collocation_and_min_count(spark):
    # "new york" always adjacent (8 occurrences); "alpha"/"beta" appear
    # often but never adjacent to each other; "rare pair" appears 3 times
    # (below min_count=5) and must be filtered out.
    rows = (
        [(i, "s", "new york alpha") for i in range(4)]
        + [(10 + i, "s", "new york beta") for i in range(4)]
        + [(20 + i, "s", "rare pair") for i in range(3)]
        + [(30, "s", "alpha beta")]  # adjacent once only -> filtered
    )
    out = pmi_collocations(_docs(spark, rows), min_count=5).toPandas()
    keys = {(r.w1, r.w2) for r in out.itertuples()}
    assert ("new", "york") in keys
    assert ("rare", "pair") not in keys  # min_count filter
    assert ("alpha", "beta") not in keys  # count 1 < min_count
    ny = out[(out.w1 == "new") & (out.w2 == "york")].iloc[0]
    assert ny.pair_cnt == 8
    # exact check: pmi = ln((c_ab/N_bi) / ((c_a/N_uni) * (c_b/N_uni)))
    n_uni, n_bi = 3 * 8 + 2 * 4, 2 * 8 + 1 * 4  # 32 words, 20 bigrams
    expect = math.log((8 / n_bi) / ((8 / n_uni) * (8 / n_uni)))
    assert abs(ny.pmi_micro - round(expect * 1e6)) <= 1


def test_pmi_positive_only(spark):
    # Five blocks of (a^10 b^10): both words frequent (50 each) but (a,b)
    # adjacent only 5 times — observed 5 << expected 50*50*99/100^2 ≈ 24.75,
    # so pmi(a,b) = ln(5*100^2/(50*50*99)) < 0 and the pair is excluded
    # despite meeting min_count; the within-block (a,a) pair (45 observed
    # vs the same expectation) is positive and kept.
    rows = [(0, "s", " ".join((["a"] * 10 + ["b"] * 10) * 5))]
    out = pmi_collocations(_docs(spark, rows), min_count=5).toPandas()
    keys = {(r.w1, r.w2) for r in out.itertuples()}
    assert ("a", "b") not in keys  # negative PMI filtered
    assert ("a", "a") in keys and ("b", "b") in keys


def test_pmi_oracle_parity_sf(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    got = pmi_collocations(docs).toPandas()
    want = duck_to_pdf(pmi_collocations_oracle_sql(), SF_DIR)
    assert len(got) > 0  # effect size: the gate is not vacuous
    assert_frames_match(got, want, label="pmi_collocations")


# ------------------------------------------------------- domain divergence

def test_jsd_identical_distribution_is_zero(spark):
    rows = [
        (0, "s1", "x x x y"),
        (1, "s2", "x x x y"),
    ]
    out = domain_divergence(_docs(spark, rows)).toPandas()
    assert set(out.source) == {"s1", "s2"}
    assert (out.js_nano == 0).all()
    assert (out.n_terms == 2).all()


def test_jsd_disjoint_sources_positive_and_symmetric(spark):
    rows = [(0, "s1", "x x x x"), (1, "s2", "y y y y")]
    out = domain_divergence(_docs(spark, rows)).toPandas().set_index("source")
    # corpus q = (.5, .5); each source is a point mass -> equal positive JS
    assert out.loc["s1", "js_nano"] == out.loc["s2", "js_nano"]
    assert 0 < out.loc["s1", "js_nano"] <= LN2_NANO


def test_jsd_top_v_restriction(spark):
    # top_v=2 keeps the two most frequent terms; "rare" is excluded from
    # the support entirely (n_terms == 2, and a source whose only
    # difference is in "rare" shows zero divergence on the kept head).
    rows = [
        (0, "s1", "x x x y rare"),
        (1, "s2", "x x x y"),
    ]
    out = domain_divergence(_docs(spark, rows), top_v=2).toPandas()
    assert (out.n_terms == 2).all()
    assert (out.js_nano == 0).all()  # both sources: p = q = (3/4, 1/4)


def test_jsd_oracle_parity_sf(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    got = domain_divergence(docs).toPandas()
    want = duck_to_pdf(domain_divergence_oracle_sql(), SF_DIR)
    assert len(got) > 0
    assert (got.js_nano > 0).any()  # effect size: sources differ
    assert_frames_match(got, want, label="domain_divergence")


# --------------------------------------------------- token apportionment

def test_apportionment_exact_sum_and_largest_remainder(spark):
    from geocode_spark.textops.corpusops import token_apportionment

    # token masses 5/3/2 over budget 10 -> quotas 5/3/2 exactly (no
    # remainder); masses 1/1/1 over budget 10 -> floors 3/3/3, leftover 1
    # goes to the LOWEST source name (all remainders tie)
    docs = spark.createDataFrame(
        [(0, "s1", "a a a a a"), (1, "s2", "b b b"), (2, "s3", "c c")],
        "doc_id long, source string, text string",
    )
    out = (
        token_apportionment(docs, budget=10)
        .toPandas().set_index("source").sort_index()
    )
    assert list(out.alloc) == [5, 3, 2]

    docs2 = spark.createDataFrame(
        [(0, "s1", "a"), (1, "s2", "b"), (2, "s3", "c")],
        "doc_id long, source string, text string",
    )
    out2 = (
        token_apportionment(docs2, budget=10)
        .toPandas().set_index("source").sort_index()
    )
    assert list(out2.alloc) == [4, 3, 3]
    assert out2.alloc.sum() == 10


def test_apportionment_oracle_parity_sf(spark):
    from compare_util import assert_frames_match, duck_to_pdf
    from geocode_spark.textops.corpusops import (
        APPORTION_BUDGET, token_apportionment,
        token_apportionment_oracle_sql,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    got = token_apportionment(docs).toPandas()
    want = duck_to_pdf(token_apportionment_oracle_sql(), SF_DIR)
    assert got.alloc.sum() == APPORTION_BUDGET
    assert got.alloc.nunique() > 1  # effect size: masses differ
    assert_frames_match(got, want, label="token_apportionment")
