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

from .grammar import _PARSE_TYPE

ADDRESS_PATTERN = r"((?:[0-9]|PO BOX |P O BOX )[0-9A-Z ]*), ([0-9A-Z][0-9A-Z ]*)\."

# F5/P5 per-row error capture (reference geocode.py:253-254, pinned by its
# tests/test_geocode.py:158-177): any per-row failure becomes an ERROR ROW
# with message str(ex)[:500] and the job continues. The deterministic,
# oracle-mirrorable failure is the street-length guard below; the generic
# per-row try/except in _extract_parse_batch catches everything else.
MAX_STREET_LEN = 512
MSG_TRUNCATE = 500  # reference geocode.py:254


def street_too_long_msg(n: int) -> str:
    return f"street too long: {n} characters"

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


_FULL_TYPE = StructType(
    [
        StructField("street", StringType()),
        StructField("zone", StringType()),
        StructField("cleansed_street", StringType()),
        StructField("cleansed_zone", StringType()),
    ]
    + list(_PARSE_TYPE.fields)
    + [StructField("error", StringType())]
)


def _extract_parse_one(t, pd_cleanse_street, pd_cleanse_zone,
                       parse_street_py, PARSE_FIELDS) -> dict:
    """Row-at-a-time twin of the vectorized batch path (the per-row error
    capture fallback) — must produce identical values for healthy rows."""
    ex = pd.Series([t], dtype="string").str.extract(ADDRESS_PATTERN, expand=True)
    street, zone = ex.iloc[0, 0], ex.iloc[0, 1]
    street = None if pd.isna(street) else street
    zone = "" if pd.isna(zone) else zone
    cs = pd_cleanse_street(pd.Series([street])).fillna("").iloc[0]
    cz = pd_cleanse_zone(pd.Series([zone])).fillna("").iloc[0]
    row = {"street": street, "zone": zone or None,
           "cleansed_street": cs, "cleansed_zone": cz}
    row.update(parse_street_py(cs))
    row["error"] = (
        street_too_long_msg(len(street))
        if street is not None and len(street) > MAX_STREET_LEN else None
    )
    return row


def _extract_parse_batch(text: pd.Series) -> pd.DataFrame:
    """Fused extract + cleanse + parse — ONE Python round trip per batch.

    Semantically identical to extract_addresses -> cleanse_input ->
    parse_input (same regex, the tested pd_cleanse_* twins of the Catalyst
    cleansing, the same parse_street_py grammar); fused so the hot path pays
    one JVM<->Python Arrow boundary instead of two.

    Error capture (F5/P5): the vectorized path computes the deterministic
    street-length guard as a column; if the batch path itself throws, the
    batch re-runs row-at-a-time and any row that still throws becomes an
    error row carrying str(ex)[:500] (reference geocode.py:253-254) instead
    of failing the task — one poisoned row in a trillion must not kill a job.
    """
    from .cleansing import pd_cleanse_street, pd_cleanse_zone
    from .grammar import PARSE_FIELDS, parse_street_py

    try:
        out = _extract_batch(text)
        cs = pd_cleanse_street(out["street"]).fillna("")
        # missing zone cleanses to '' (cleanse_input coalesces the same way)
        cz = pd_cleanse_zone(out["zone"].fillna("")).fillna("")
        out["cleansed_street"] = cs
        out["cleansed_zone"] = cz
        parsed = pd.DataFrame(
            [parse_street_py(v) for v in cs], columns=list(PARSE_FIELDS),
            index=out.index,
        )
        slen = out["street"].str.len()
        err = pd.Series(
            [
                street_too_long_msg(int(n)) if pd.notna(n) and n > MAX_STREET_LEN
                else None
                for n in slen
            ],
            index=out.index, dtype="object",
        )
        return pd.concat([out, parsed, err.rename("error")], axis=1)
    except Exception:
        rows = []
        for t in text:
            try:
                rows.append(
                    _extract_parse_one(t, pd_cleanse_street, pd_cleanse_zone,
                                       parse_street_py, PARSE_FIELDS)
                )
            except Exception as ex:  # the reference's per-row capture
                row = {
                    "street": None, "zone": None,
                    "cleansed_street": "", "cleansed_zone": "",
                }
                row.update({f: None for f in PARSE_FIELDS})
                row["error"] = str(ex)[:MSG_TRUNCATE]
                rows.append(row)
        return pd.DataFrame(rows)


_extract_parse_udf = F.pandas_udf(_extract_parse_batch, _FULL_TYPE).asNondeterministic()


def extract_and_parse(pages: DataFrame, progress_acc=None) -> DataFrame:
    """pages -> the geocode_parsed() input schema, in one Arrow stage.

    Produces exactly what operators.geocode.parse_input(cleanse_input(
    extract_addresses(pages))) produces, with one Python boundary instead of
    two (the second boundary showed up as blocked executor time at high
    parallelism). zone_key stays a Catalyst expression on the materialized
    struct field.

    progress_acc (A4, reference geocode.py:256-258): an optional Spark
    accumulator receiving each Arrow batch's row count — the row-cadence
    source for progress.ProgressReporter. It must be captured in the UDF
    closure (counting_pandas_udf): forked Python workers re-import this
    module, so a driver-set global would be None worker-side. Default path
    reuses the module-level UDF unchanged.
    """
    if progress_acc is not None:
        from .progress import counting_pandas_udf

        udf = counting_pandas_udf(_extract_parse_batch, _FULL_TYPE,
                                  progress_acc)
    else:
        udf = _extract_parse_udf
    a = pages.select(
        F.col("url").cast("string").alias("primary_key"),
        udf(F.col("text")).alias("a"),
    )
    return a.select(
        "primary_key",
        F.col("a.street").alias("input_street"),
        F.col("a.zone").alias("input_zone"),
        F.col("a.cleansed_street").alias("cleansed_street"),
        F.col("a.cleansed_zone").alias("cleansed_zone"),
        F.col("a.addr_type").alias("addr_type"),
        F.col("a.house").alias("house"),
        F.col("a.predir").alias("predir"),
        F.col("a.street_name").alias("street_name"),
        F.col("a.stype").alias("stype"),
        F.col("a.sufdir").alias("sufdir"),
        F.upper(F.col("a.cleansed_zone")).alias("zone_key"),
        F.col("a.error").alias("error"),
    )


def extract_oracle_sql(pages_path: str) -> str:
    """DuckDB mirror of extract_addresses (keep_all form)."""
    return f"""
SELECT url,
       nullif(regexp_extract(text, '{ADDRESS_PATTERN}', 1), '') AS street,
       nullif(regexp_extract(text, '{ADDRESS_PATTERN}', 2), '') AS zone
FROM read_parquet('{pages_path}')"""
