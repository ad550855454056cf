"""Pipeline assembly: pages -> extract -> geocode (SURVEY §3.4 lifecycle).

spark.read (Parquet/Iceberg scan, column-pruned to url+text)
  -> extract_and_parse (ONE Arrow-vectorized stage: extract+cleanse+parse)
  -> broadcast join against per-key candidate arrays (one row per page)
  -> row-local best-candidate selection (higher-order array functions)
  -> 11-column contract

No shuffle of the input/probe side: every page is processed independently, so
the plan scales with executors and no key skew can concentrate load. The only
exchanges live under the locator-side BroadcastExchange (the small relation is
aggregated into per-key candidate arrays before broadcast), matching what
.explain shows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..extraction import extract_and_parse
from ..operators.geocode import geocode_parsed


def load_locators(spark: SparkSession, fixtures_dir: str) -> dict:
    """Load the three locator tables, failing fast with the reference's
    auth-failure exception type when a table is missing or unreadable.

    F2 parity: the reference raises InvalidAPIKeyException on the API's
    HTTP-400 config rejection (geocode.py:217-219,299-308); this engine has
    no API key, so its config-validation failure — unreadable locators — is
    the path that raises it, with the same message format."""
    from ..flowcontrol import InvalidAPIKeyException

    out = {}
    for name in ("address_points", "road_centerlines", "pobox_points"):
        path = f"{fixtures_dir}/{name}.parquet"
        try:
            out[name] = spark.read.parquet(path)
        except Exception as ex:
            raise InvalidAPIKeyException(
                0, None, f"locator table missing or unreadable: {path} ({ex})"
            ) from ex
    return out


def geocode_pages(
    pages: DataFrame,
    locator_tables: dict,
    locators: str = "all",
    pobox: bool = True,
    accept_score: int = 70,
    progress_acc=None,
) -> DataFrame:
    """Flagship pipeline: web pages in, 11-column geocode results out.

    One output row per page (reference row-accounting, geocode.py:171-250);
    pages with no extractable address surface the F4 'Missing required
    parameters' failure (geocode.py:210-215). Extraction, cleansing and
    grammar parsing run fused in ONE Arrow stage (extract_and_parse).
    progress_acc: optional row-count accumulator for A4 progress reporting
    (see extraction.extract_and_parse / progress.ProgressReporter)."""
    return geocode_parsed(
        extract_and_parse(pages, progress_acc=progress_acc),
        locators=locators,
        pobox=pobox,
        accept_score=accept_score,
        **locator_tables,
    )
