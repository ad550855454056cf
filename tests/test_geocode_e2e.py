"""End-to-end geocode pipeline vs the DuckDB oracle on deterministic fixtures.

Mirrors the reference's mocked end-to-end strategy (tests/test_geocode.py:104-177)
but with a real (synthetic) locator instead of a mocked HTTP API, plus exact
row-for-row comparison keyed on primary_key."""

import pytest
from pyspark.sql import functions as F

from geocode_spark.operators.geocode import geocode, geocode_metrics
from geocode_spark.oracle import geocode_oracle_sql

from compare_util import assert_frames_match, duck_to_pdf


def _locators(spark, fixtures_dir):
    return dict(
        address_points=spark.read.parquet(f"{fixtures_dir}/address_points.parquet"),
        road_centerlines=spark.read.parquet(
            f"{fixtures_dir}/road_centerlines.parquet"
        ),
        pobox_points=spark.read.parquet(f"{fixtures_dir}/pobox_points.parquet"),
    )


@pytest.fixture(scope="module")
def result(spark, fixtures_dir):
    addr = spark.read.parquet(f"{fixtures_dir}/addresses.parquet")
    return geocode(addr, pobox=True, **_locators(spark, fixtures_dir))


def test_matches_oracle_exactly(result, fixtures_dir):
    got = result.toPandas()
    want = duck_to_pdf(geocode_oracle_sql(fixtures_dir, pobox=True))
    assert_frames_match(got, want, label="geocode_all")


def test_row_accounting(result, spark, fixtures_dir):
    """One output row per input row (reference geocode.py:171-250)."""
    n_in = spark.read.parquet(f"{fixtures_dir}/addresses.parquet").count()
    assert result.count() == n_in
    assert result.select("primary_key").distinct().count() == n_in


def test_failure_rows_shape(result):
    """Failures: x=0, y=0, score=0, locator NULL, message set (geocode.py:182)."""
    fails = result.filter(F.col("message").isNotNull())
    bad = fails.filter(
        (F.col("x") != 0.0) | (F.col("y") != 0.0) | (F.col("score") != 0)
        | F.col("locator").isNotNull() | F.col("matchAddress").isNotNull()
    )
    assert bad.count() == 0
    assert fails.count() > 0


def test_success_rows_shape(result):
    ok = result.filter(F.col("message").isNull())
    bad = ok.filter(
        F.col("locator").isNull() | (F.col("score") < 70)
        | F.col("addressGrid").isNull() | F.col("standardizedAddress").isNull()
    )
    assert bad.count() == 0
    assert ok.count() > 0


def test_empty_zone_message_parity(result):
    """F4: empty cleansed zone -> 'Missing required parameters for URL: ...'
    (reference geocode.py:210-215, tests/test_geocode.py:139-155)."""
    rows = result.filter(F.col("input_zone") == "--").collect()
    assert rows, "fixture should contain '--' zones"
    for r in rows:
        assert r.message.startswith("Missing required parameters for URL")


def test_no_candidate_message_parity(result):
    """404 message pinned at reference tests/test_geocode.py:89."""
    msgs = (
        result.filter(F.col("message").isNotNull())
        .filter(~F.col("message").startswith("Missing required"))
        .select("message").distinct().collect()
    )
    assert msgs
    for m in msgs:
        assert m.message == (
            "No address candidates found with a score of 70 or better."
        )


def test_locator_selection(spark, fixtures_dir):
    """J1: locators='addressPoints' must yield no centerline matches."""
    addr = spark.read.parquet(f"{fixtures_dir}/addresses.parquet")
    only_ap = geocode(addr, locators="addressPoints", **_locators(spark, fixtures_dir))
    got = only_ap.select("locator").distinct().collect()
    names = {r.locator for r in got}
    assert "Centerlines.StatewideRoads" not in names
    want = duck_to_pdf(geocode_oracle_sql(fixtures_dir, locators="addressPoints"))
    assert_frames_match(only_ap.toPandas(), want, label="geocode_ap_only")


def test_metrics(result):
    m = geocode_metrics(result).first()
    assert m.total == m.success + m.fail
    assert 0 <= m.failure_rate <= 100
    assert m.average_score >= 70


def test_broadcast_join_in_plan(result):
    plan = result._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
