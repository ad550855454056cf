"""Crawl snapshot diff + language-mixture table: semantics pins and
DuckDB oracle parity over the pages fixture."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from compare_util import assert_frames_match, duck_to_pdf

from geocode_spark.textops.packing import (
    snapshot_diff,
    snapshot_diff_oracle_sql,
    snapshot_split,
)
from geocode_spark.textops.textstats import (
    lang_mixture,
    lang_mixture_oracle_sql,
)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def _fix_dir():
    from geocode_spark.fixtures import ensure_fixtures

    return ensure_fixtures(SF_DIR)


# ---------------------------------------------------------- snapshot diff

def test_snapshot_diff_all_four_statuses(spark):
    new = spark.createDataFrame(
        [("u1", "a"), ("u2", "b"), ("u4", "new page")],
        "url string, text string",
    )
    old = spark.createDataFrame(
        [("u1", "a"), ("u2", "OLD"), ("u3", "gone")],
        "url string, text string",
    )
    out = snapshot_diff(new, old).toPandas().set_index("url").sort_index()
    assert out.loc["u1"].status == "unchanged"
    assert out.loc["u2"].status == "changed"
    assert out.loc["u3"].status == "removed"
    assert out.loc["u4"].status == "added"


def test_snapshot_diff_oracle_parity_fix(spark):
    fix = _fix_dir()
    pages = spark.read.parquet(f"{fix}/pages.parquet")
    new, old = snapshot_split(pages)
    got = snapshot_diff(new, old).toPandas()
    want = duck_to_pdf(
        snapshot_diff_oracle_sql(f"read_parquet('{fix}/pages.parquet')"),
        SF_DIR,
    )
    # effect size: the split must exercise every status class
    assert set(got.status) == {"added", "removed", "changed", "unchanged"}
    assert_frames_match(got, want, label="snapshot_diff")


# ---------------------------------------------------------- lang mixture

def test_lang_mixture_exact_shares(spark):
    pages = spark.createDataFrame(
        [("u1", "the of and to"), ("u2", "the of and"), ("u3", "el la de los y")],
        "url string, text string",
    )
    out = lang_mixture(pages).toPandas().set_index("lang").sort_index()
    assert out.loc["en"].n_pages == 2 and out.loc["es"].n_pages == 1
    assert out.loc["en"].permille_pages == 666
    assert out.loc["es"].permille_pages == 333
    tot_bytes = out.n_bytes.sum()
    for _, r in out.iterrows():
        assert r.permille_bytes == r.n_bytes * 1000 // tot_bytes


def test_lang_mixture_oracle_parity_fix(spark):
    fix = _fix_dir()
    pages = spark.read.parquet(f"{fix}/pages.parquet")
    got = lang_mixture(pages).toPandas()
    want = duck_to_pdf(
        lang_mixture_oracle_sql(f"read_parquet('{fix}/pages.parquet')"),
        SF_DIR,
    )
    assert len(got) == 4  # effect size: the fixture carries 4 languages
    assert_frames_match(got, want, label="lang_mixture")
