"""Replicates the driver's correctness gate locally: every queries() entry is
run on Spark and compared against its oracle_sql() DuckDB result at sf0.01."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod

from compare_util import assert_frames_match, duck_to_pdf

SF_DIR = entrymod.ORACLE_SF_DIR


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() >= 0
    assert len(df.schema.fields) == 11


@pytest.mark.parametrize("name", sorted(entrymod.queries().keys()))
def test_query_matches_oracle(spark, name):
    q = entrymod.queries()[name]
    oracles = entrymod.oracle_sql()
    got = q(spark, SF_DIR).toPandas()
    if name not in oracles:
        assert len(got) >= 0
        return
    want = duck_to_pdf(oracles[name])
    assert_frames_match(got, want, label=name)
