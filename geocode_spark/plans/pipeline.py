"""Pipeline assembly: pages -> extract -> geocode (SURVEY §3.4 lifecycle).

spark.read (Parquet/Iceberg scan, column-pruned to url+text)
  -> extract_addresses (one Arrow-vectorized mapInPandas-style stage)
  -> cleanse/parse (Catalyst column expressions, whole-stage codegen)
  -> broadcast locator joins + scoring (no shuffle of the big side)
  -> top-1 max_by aggregation (the single shuffle, keyed on unique url)
  -> 11-column contract
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..extraction import extract_addresses
from ..operators.geocode import geocode


def load_locators(spark: SparkSession, fixtures_dir: str) -> dict:
    return dict(
        address_points=spark.read.parquet(f"{fixtures_dir}/address_points.parquet"),
        road_centerlines=spark.read.parquet(
            f"{fixtures_dir}/road_centerlines.parquet"
        ),
        pobox_points=spark.read.parquet(f"{fixtures_dir}/pobox_points.parquet"),
    )


def geocode_pages(
    pages: DataFrame,
    locator_tables: dict,
    locators: str = "all",
    pobox: bool = True,
    accept_score: int = 70,
) -> DataFrame:
    """Flagship pipeline: web pages in, 11-column geocode results out.

    One output row per page (reference row-accounting, geocode.py:171-250);
    pages with no extractable address surface the F4 'Missing required
    parameters' failure (geocode.py:210-215)."""
    extracted = extract_addresses(pages, keep_all=True).withColumnRenamed(
        "url", "id"
    )
    return geocode(
        extracted,
        locators=locators,
        pobox=pobox,
        accept_score=accept_score,
        **locator_tables,
    )
