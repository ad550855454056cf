"""Pipeline assembly: pages -> extract -> geocode (SURVEY §3.4 lifecycle).

spark.read (Parquet/Iceberg scan, column-pruned to url+text)
  -> extract_and_parse (ONE Arrow-vectorized stage: extract+cleanse+parse)
  -> broadcast join against per-key candidate arrays (one row per page)
  -> row-local best-candidate selection (higher-order array functions)
  -> 11-column contract

ZERO shuffles end-to-end: every page is processed independently, so the plan
scales with executors and no key skew can concentrate load.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..extraction import extract_and_parse
from ..operators.geocode import geocode_parsed


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
    parameters' failure (geocode.py:210-215). Extraction, cleansing and
    grammar parsing run fused in ONE Arrow stage (extract_and_parse)."""
    return geocode_parsed(
        extract_and_parse(pages),
        locators=locators,
        pobox=pobox,
        accept_score=accept_score,
        **locator_tables,
    )
