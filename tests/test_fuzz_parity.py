"""Cross-dialect differential fuzzing (hypothesis).

The byte-identical-per-url contract rests on THREE implementations agreeing:
the reference-parity Python functions (ground truth), the Spark/Catalyst
column expressions (Java regex), and the DuckDB oracle SQL (RE2). The
fixture corpus only exercises well-formed shapes, so this fuzzes arbitrary
strings — unicode soup, control characters, '&' runs, digit walls,
street-ish compositions — in BATCHES (one Spark job + one DuckDB query per
hypothesis example, ~40 strings each) and asserts elementwise equality."""

import os
import sys

import duckdb
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from geocode_spark.cleansing import (
    cleanse_street_col,
    cleanse_street_sql,
    cleanse_zone_col,
    cleanse_zone_sql,
    py_cleanse_street,
    py_cleanse_zone,
)
from geocode_spark.grammar import PARSE_FIELDS, parse_street_cols, parse_street_duckdb_sql

# printable-ish unicode + the characters the cleansing rules care about
_CHARS = st.characters(
    blacklist_categories=("Cs",),  # no lone surrogates (not encodable)
)
TEXTS = st.text(alphabet=_CHARS, max_size=50)
_DIRS = ["", "N", "S", "E", "W", "NORTH", "SOUTH", "EAST", "WEST", "WB"]
_TYPES = ["", "ST", "STREET", "AVE", "AV", "RD", "BLVD", "WAY", "XYZZY"]
STREETISH = st.builds(
    lambda h, pre, words, typ, suf: " ".join(
        p for p in [h, pre, *words, typ, suf] if p
    ),
    st.one_of(st.integers(0, 9_999_999).map(str), st.just(""), st.just("P O BOX 12")),
    st.sampled_from(_DIRS),
    st.lists(st.sampled_from(["MAIN", "Oak", "1300", "s", "foo&bar"]), max_size=3),
    st.sampled_from(_TYPES),
    st.sampled_from(_DIRS),
)
BATCH = st.lists(st.one_of(TEXTS, STREETISH), min_size=1, max_size=40)

_FUZZ_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _duck(strings, select_sql):
    con = duckdb.connect()
    try:
        con.register("t", pd.DataFrame({"s": pd.array(strings, dtype="string")}))
        return con.sql(f"SELECT {select_sql} FROM t").df()
    finally:
        con.close()


def _spark_eval(spark, strings, *cols):
    pdf = pd.DataFrame({"i": range(len(strings)),
                        "s": pd.array(strings, dtype="string")})
    return (
        spark.createDataFrame(pdf, "i bigint, s string")
        .orderBy("i")
        .select(*cols)
        .toPandas()
    )


@given(BATCH)
@settings(**_FUZZ_SETTINGS)
def test_cleanse_street_three_way_parity(spark, batch):
    want = [py_cleanse_street(s) for s in batch]
    got_spark = _spark_eval(
        spark, batch, cleanse_street_col(F.col("s")).alias("v")
    )["v"].tolist()
    got_duck = _duck(batch, f"{cleanse_street_sql('s')} AS v")["v"].tolist()
    assert got_spark == want
    assert got_duck == want


@given(BATCH)
@settings(**_FUZZ_SETTINGS)
def test_cleanse_zone_three_way_parity(spark, batch):
    want = [py_cleanse_zone(s) for s in batch]
    got_spark = _spark_eval(
        spark, batch, cleanse_zone_col(F.col("s")).alias("v")
    )["v"].tolist()
    got_duck = _duck(batch, f"{cleanse_zone_sql('s')} AS v")["v"].tolist()
    assert got_spark == want
    assert got_duck == want


@given(BATCH)
@settings(**_FUZZ_SETTINGS)
def test_parse_street_spark_duckdb_parity(spark, batch):
    """Grammar parity over CLEANSED input (the grammar's precondition)."""
    cleansed = [py_cleanse_street(s) for s in batch]
    cols = parse_street_cols(F.col("s"))
    got_spark = _spark_eval(
        spark, cleansed, *[cols[f].alias(f) for f in PARSE_FIELDS]
    )
    got_duck = _duck(cleansed, parse_street_duckdb_sql("s"))
    for f in PARSE_FIELDS:
        a = got_spark[f].tolist()
        b = got_duck[f].tolist()
        # house is nullable numeric: compare through pandas NA-safe equality
        assert len(a) == len(b)
        for x, y, src in zip(a, b, cleansed):
            ok = (x == y) or (pd.isna(x) and pd.isna(y))
            assert ok, f"{f}: {x!r} != {y!r} for input {src!r}"
