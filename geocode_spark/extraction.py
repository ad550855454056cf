"""Vectorized address extraction from web-page text (SURVEY §2.7).

The engine's true source is a Common-Crawl-style pages table
(url, warc_ts, html, text, lang — BASELINE.json input_hint); `url` plays the
reference's `primary_key` (geocode.py:125). Extraction is an Arrow-batched
pandas UDF (no per-row Python) and a pure per-row function of `text`, so the
result is byte-identical per url across runs and parallelism levels.

The pattern recognizes the fixture embedding convention: an uppercase postal
address `STREET, ZONE.` inside otherwise lowercase text — house-number streets
and PO boxes. Leftmost match wins (first address per page). The same pattern
string runs under Python `re` (engine) and DuckDB RE2 (oracle); it uses only
ASCII classes and non-capturing groups, which behave identically in both.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

ADDRESS_PATTERN = r"((?:[0-9]|PO BOX |P O BOX )[0-9A-Z ]*), ([0-9A-Z][0-9A-Z ]*)\."

_OUT_TYPE = StructType(
    [StructField("street", StringType()), StructField("zone", StringType())]
)


def _extract_batch(text: pd.Series) -> pd.DataFrame:
    ex = text.astype("string").str.extract(ADDRESS_PATTERN, expand=True)
    ex.columns = ["street", "zone"]
    return ex


# asNondeterministic: extraction is a pure function of `text`; the flag only
# stops Catalyst from substituting the UDF into pushed-down filters (which
# would run the Arrow stage twice) — it does not change results.
_extract_udf = F.pandas_udf(_extract_batch, _OUT_TYPE).asNondeterministic()


def extract_addresses(pages: DataFrame, keep_all: bool = True) -> DataFrame:
    """pages(url, text, ...) -> (url, street, zone).

    keep_all=True keeps pages without an address (street/zone NULL) so the
    downstream geocode preserves one-output-row-per-input-row accounting
    (reference geocode.py:171-250). Column pruning: only url+text are read.
    """
    out = pages.select(
        "url", _extract_udf(F.col("text")).alias("a")
    ).select("url", F.col("a.street").alias("street"), F.col("a.zone").alias("zone"))
    if not keep_all:
        out = out.filter(F.col("street").isNotNull())
    return out


def extract_oracle_sql(pages_path: str) -> str:
    """DuckDB mirror of extract_addresses (keep_all form)."""
    return f"""
SELECT url,
       nullif(regexp_extract(text, '{ADDRESS_PATTERN}', 1), '') AS street,
       nullif(regexp_extract(text, '{ADDRESS_PATTERN}', 2), '') AS zone
FROM read_parquet('{pages_path}')"""
