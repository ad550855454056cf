"""The geocode match — broadcast locator joins + scoring + top-1 (SURVEY §2.3).

The reference performs this via one HTTP GET per row against the AGRC API
(reference geocode.py:198-208, parameterized by locators/pobox/acceptScore at
geocode.py:201-207). Here it is pure Spark data logic:

  J1  locator selection    — union of candidate sources gated by config
  J2  address-point match  — broadcast equi-join on (zone_key, street, house)
  J3  centerline match     — broadcast join on (zone_key, street) + range
                             predicate house BETWEEN from_addr AND to_addr,
                             x/y linearly interpolated along the segment
  J4  scoring + threshold  — deterministic penalty function, filter >= acceptScore
                             (default 70, geocode.py:28,206; 404 message pinned
                             at tests/test_geocode.py:89)
  J5  top-1 per input row  — max_by over a total-order rank key (map-side
                             partial agg; no window sort shuffle)
  J6  pobox                — extra broadcast source when pobox=True (geocode.py:27,117)
  J7  output x/y in the locator's spatial reference (26912, geocode.py:25)

Scoring spec (frozen — the reference's scorer is server-side and unobservable;
this is OUR contract, validated against the reference's thresholding + output
semantics):

  base: 100 address point / 100 USPS pobox / 90 road centerline
  direction penalty (prefix and suffix, each):
      equal (incl. both empty) -> 0
      input empty, locator set -> 5
      input set, locator empty -> 15
      both set, different      -> 25
  street-type penalty: equal -> 0 | input empty -> 5 | locator empty -> 10
      | different -> 15
  candidate priority for equal scores: USPS(0) > addressPoints(1) >
      roadCenterlines(2); final tiebreak lowest cand_id.

All shuffles: exactly one, the top-1 aggregation keyed on the (unique) primary
key. Locator joins are broadcast; the input side is never shuffled for them.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import DEFAULT_ACCEPT_SCORE, RESULT_COLUMNS
from ..cleansing import cleanse_street_col, cleanse_zone_col
from ..grammar import DIRECTION_WORDS, parse_street_cols

HOST = "api.mapserv.utah.gov"  # reference geocode.py:32
LOCATOR_AP = "AddressPoints.AddressGrid"
LOCATOR_RC = "Centerlines.StatewideRoads"
LOCATOR_USPS = "USPS Delivery Points"  # pinned at tests/test_geocode.py:112

BASE_SCORE_AP = 100
BASE_SCORE_RC = 90
BASE_SCORE_USPS = 100
PRIORITY = {"usps": 0, "ap": 1, "rc": 2}

# message parity: reference geocode.py:213 (F4) and tests/test_geocode.py:89 (404)
MSG_MISSING_TMPL = "Missing required parameters for URL: https://{host}/api/v1/geocode/{street}/{zone}"
MSG_NO_CANDIDATES = "No address candidates found with a score of {score} or better."


# ------------------------------------------------------------------ cleansing
def cleanse_input(df: DataFrame, id_col="id", street_col="street", zone_col="zone") -> DataFrame:
    """Project the reference input relation and attach cleansed columns."""
    return df.select(
        F.col(id_col).cast("string").alias("primary_key"),
        F.col(street_col).cast("string").alias("input_street"),
        F.col(zone_col).cast("string").alias("input_zone"),
        F.coalesce(cleanse_street_col(F.col(street_col)), F.lit("")).alias(
            "cleansed_street"
        ),
        F.coalesce(cleanse_zone_col(F.col(zone_col)), F.lit("")).alias(
            "cleansed_zone"
        ),
    )


def parse_input(df: DataFrame) -> DataFrame:
    """Attach parsed-address columns + the zone join key."""
    cols = parse_street_cols(F.col("cleansed_street"))
    return df.withColumns(cols).withColumn(
        "zone_key", F.upper(F.col("cleansed_zone"))
    )


# ------------------------------------------------------------------- scoring
def _dir_penalty(i: Column, l: Column) -> Column:
    return (
        F.when(i == l, 0).when(i == "", 5).when(l == "", 15).otherwise(25)
    )


def _type_penalty(i: Column, l: Column) -> Column:
    return (
        F.when(i == l, 0).when(i == "", 5).when(l == "", 10).otherwise(15)
    )


def _expand_dir(c: Column) -> Column:
    expr = None
    for k, v in DIRECTION_WORDS.items():
        cond = c == k
        expr = F.when(cond, v) if expr is None else expr.when(cond, v)
    return expr.otherwise(F.lit(None).cast("string"))


def _rank_key(score: Column, priority: int, cand_id: Column) -> Column:
    return (
        (score.cast("bigint") * 10 + (9 - priority)) * F.lit(100_000_000).cast("bigint")
        + (F.lit(99_999_999).cast("bigint") - cand_id)
    )


def _match_address(house: Column, predir: Column, name: Column, stype: Column,
                   sufdir: Column, grid: Column) -> Column:
    return F.concat(
        F.concat_ws(
            " ",
            house.cast("string"),
            F.nullif(predir, F.lit("")),
            name,
            F.nullif(stype, F.lit("")),
            F.nullif(sufdir, F.lit("")),
        ),
        F.lit(", "),
        grid,
    )


def _standardized(house: Column, predir: Column, name: Column, stype: Column,
                  sufdir: Column) -> Column:
    return F.lower(
        F.concat_ws(
            " ",
            house.cast("string"),
            _expand_dir(predir),
            F.nullif(name, F.lit("")),
            F.nullif(stype, F.lit("")),
            _expand_dir(sufdir),
        )
    )


_CAND_COLS = [
    "primary_key", "x", "y", "score", "locator", "matchAddress",
    "standardizedAddress", "addressGrid", "rank_key",
]


# ---------------------------------------------------------- candidate joins
def _with_zone_keys(locator: DataFrame) -> DataFrame:
    """Explode a locator to one row per zone join key (zip5 + grid name)."""
    return locator.withColumn("zone_key", F.col("zip5")).unionByName(
        locator.withColumn("zone_key", F.upper(F.col("grid")))
    )


def ap_candidates(parsed: DataFrame, address_points: DataFrame) -> DataFrame:
    """J2: equi-join on (zone_key, street_name, house_number). Broadcast build side."""
    l = _with_zone_keys(
        address_points.select(
            "cand_id", "grid", "house_number",
            F.col("predir").alias("l_predir"),
            "street_name",
            F.col("stype").alias("l_stype"),
            F.col("sufdir").alias("l_sufdir"),
            "zip5", "x", "y",
        )
    )
    j = parsed.filter(F.col("addr_type") == "STREET").join(
        F.broadcast(l),
        on=[
            parsed.zone_key == l.zone_key,
            parsed.street_name == l.street_name,
            parsed.house == l.house_number,
        ],
        how="inner",
    )
    score = (
        F.lit(BASE_SCORE_AP)
        - _dir_penalty(parsed.predir, F.col("l_predir"))
        - _dir_penalty(parsed.sufdir, F.col("l_sufdir"))
        - _type_penalty(parsed.stype, F.col("l_stype"))
    ).cast("bigint")
    return j.select(
        parsed.primary_key,
        F.col("x"), F.col("y"),
        score.alias("score"),
        F.lit(LOCATOR_AP).alias("locator"),
        _match_address(
            F.col("house_number"), F.col("l_predir"), l.street_name,
            F.col("l_stype"), F.col("l_sufdir"), F.col("grid")
        ).alias("matchAddress"),
        _standardized(
            parsed.house, parsed.predir, parsed.street_name, parsed.stype,
            parsed.sufdir
        ).alias("standardizedAddress"),
        F.col("grid").alias("addressGrid"),
        _rank_key(score, PRIORITY["ap"], F.col("cand_id")).alias("rank_key"),
    )


def rc_candidates(parsed: DataFrame, road_centerlines: DataFrame) -> DataFrame:
    """J3: broadcast join on (zone_key, street_name) + house range + interpolation."""
    l = _with_zone_keys(
        road_centerlines.select(
            "cand_id", "grid",
            F.col("predir").alias("l_predir"),
            "street_name",
            F.col("stype").alias("l_stype"),
            F.col("sufdir").alias("l_sufdir"),
            "zip5", "from_addr", "to_addr", "x0", "y0", "x1", "y1",
        )
    )
    j = parsed.filter(F.col("addr_type") == "STREET").join(
        F.broadcast(l),
        on=[
            parsed.zone_key == l.zone_key,
            parsed.street_name == l.street_name,
            parsed.house >= l.from_addr,
            parsed.house <= l.to_addr,
        ],
        how="inner",
    )
    t = (parsed.house - F.col("from_addr")).cast("double") / (
        F.col("to_addr") - F.col("from_addr")
    ).cast("double")
    score = (
        F.lit(BASE_SCORE_RC)
        - _dir_penalty(parsed.predir, F.col("l_predir"))
        - _dir_penalty(parsed.sufdir, F.col("l_sufdir"))
        - _type_penalty(parsed.stype, F.col("l_stype"))
    ).cast("bigint")
    return j.select(
        parsed.primary_key,
        (F.col("x0") + t * (F.col("x1") - F.col("x0"))).alias("x"),
        (F.col("y0") + t * (F.col("y1") - F.col("y0"))).alias("y"),
        score.alias("score"),
        F.lit(LOCATOR_RC).alias("locator"),
        _match_address(
            parsed.house, F.col("l_predir"), l.street_name, F.col("l_stype"),
            F.col("l_sufdir"), F.col("grid")
        ).alias("matchAddress"),
        _standardized(
            parsed.house, parsed.predir, parsed.street_name, parsed.stype,
            parsed.sufdir
        ).alias("standardizedAddress"),
        F.col("grid").alias("addressGrid"),
        _rank_key(score, PRIORITY["rc"], F.col("cand_id")).alias("rank_key"),
    )


def pobox_candidates(parsed: DataFrame, pobox_points: DataFrame) -> DataFrame:
    """J6: PO-box match on (zip5, box_number); zip-keyed zones only."""
    l = pobox_points.select("cand_id", "grid", "zip5", "box_number", "x", "y")
    j = parsed.filter(F.col("addr_type") == "POBOX").join(
        F.broadcast(l),
        on=[parsed.zone_key == l.zip5, parsed.house == l.box_number],
        how="inner",
    )
    score = F.lit(BASE_SCORE_USPS).cast("bigint")
    return j.select(
        parsed.primary_key,
        F.col("x"), F.col("y"),
        score.alias("score"),
        F.lit(LOCATOR_USPS).alias("locator"),
        F.concat(
            F.lit("P.O. BOX "), F.col("box_number").cast("string"),
            F.lit(", "), F.col("zip5")
        ).alias("matchAddress"),
        F.lower(F.concat(F.lit("po box "), parsed.house.cast("string"))).alias(
            "standardizedAddress"
        ),
        F.col("grid").alias("addressGrid"),
        _rank_key(score, PRIORITY["usps"], F.col("cand_id")).alias("rank_key"),
    )


# --------------------------------------------------------------- the operator
def geocode(
    input_df: DataFrame,
    address_points: DataFrame | None = None,
    road_centerlines: DataFrame | None = None,
    pobox_points: DataFrame | None = None,
    locators: str = "all",
    pobox: bool = False,
    accept_score: int = DEFAULT_ACCEPT_SCORE,
    spatial_reference: int = 26912,
) -> DataFrame:
    """Full geocode: cleansed+parsed input -> the 11-column result contract.

    input_df must have columns (id, street, zone) — pass through cleanse_input
    +parse_input yourself for custom schemas. `locators` in
    {'all','addressPoints','roadCenterlines'} (reference geocode.py:26,128).
    `spatial_reference` re-expresses output x/y (J7, geocode.py:25,115,204):
    26912 native or 4326 via the from-scratch transverse-Mercator inverse.
    """
    base = parse_input(cleanse_input(input_df))

    sources = []
    if locators in ("all", "addressPoints") and address_points is not None:
        sources.append(ap_candidates(base, address_points))
    if locators in ("all", "roadCenterlines") and road_centerlines is not None:
        sources.append(rc_candidates(base, road_centerlines))
    if pobox and pobox_points is not None:
        sources.append(pobox_candidates(base, pobox_points))
    if not sources:
        raise ValueError("no locator sources selected")

    cands = sources[0]
    for s in sources[1:]:
        cands = cands.unionByName(s)
    cands = cands.filter(F.col("score") >= accept_score)

    # J5: single shuffle — partial-aggregating max_by keyed on the unique pk.
    agg = [
        F.max_by(F.col(c), F.col("rank_key")).alias(c)
        for c in ("x", "y", "score", "locator", "matchAddress",
                  "standardizedAddress", "addressGrid")
    ]
    top1 = cands.groupBy("primary_key").agg(*agg)

    missing = (F.col("cleansed_street") == "") | (F.col("cleansed_zone") == "")
    msg_missing = F.concat(
        F.lit(f"Missing required parameters for URL: https://{HOST}/api/v1/geocode/"),
        F.col("cleansed_street"), F.lit("/"), F.col("cleansed_zone"),
    )
    msg_404 = F.lit(MSG_NO_CANDIDATES.format(score=accept_score))

    out = base.join(top1, on="primary_key", how="left")
    result = out.select(
        F.col("primary_key"),
        F.col("input_street"),
        F.col("input_zone"),
        F.coalesce(F.col("x"), F.lit(0.0)).alias("x"),
        F.coalesce(F.col("y"), F.lit(0.0)).alias("y"),
        F.coalesce(F.col("score"), F.lit(0).cast("bigint")).alias("score"),
        F.col("locator"),
        F.col("matchAddress"),
        # P6: prefer standardizedAddress, fall back to inputAddress
        # (reference geocode.py:234-237) — ours always sets it on success.
        F.col("standardizedAddress"),
        F.col("addressGrid"),
        F.when(F.col("score").isNull(),
               F.when(missing, msg_missing).otherwise(msg_404))
        .otherwise(F.lit(None).cast("string"))
        .alias("message"),
    )
    if spatial_reference != 26912:
        from .projection import reproject_result

        result = reproject_result(result, wkid=spatial_reference)
    return result


def geocode_metrics(result: DataFrame) -> DataFrame:
    """A1-A3: totals / failure rate / average score (reference geocode.py:136-158).

    failure_rate rounds like the reference (round-half-even is Python 3
    round(); we use bankers' rounding via bround) and avg score over successes.
    """
    failed = F.col("message").isNotNull()
    n_fail = F.sum(F.when(failed, 1).otherwise(0))
    # Rounding is floor(x+0.5) (half-up) for exact Spark/DuckDB agreement; the
    # reference uses Python round() (banker's) — divergence confined to exact
    # .5 fractions (geocode.py:151-158).
    return result.agg(
        F.count("*").cast("bigint").alias("total"),
        n_fail.cast("bigint").alias("fail"),
        F.sum(F.when(~failed, 1).otherwise(0)).cast("bigint").alias("success"),
        # ZeroDivisionError -> 100 (reference geocode.py:151-154)
        F.when(F.count("*") > 0,
               F.floor(F.lit(100.0) * n_fail / F.count("*") + 0.5))
        .otherwise(F.lit(100)).cast("bigint").alias("failure_rate"),
        F.floor(F.avg(F.when(~failed, F.col("score"))) + 0.5).cast("bigint").alias(
            "average_score"
        ),
    )


def geocode_metrics_by_grid(result: DataFrame, salt_buckets: int = 16) -> DataFrame:
    """Per-grid success metrics with a salted two-phase aggregation.

    The zone distribution is heavily skewed (SALT LAKE CITY dominates — the
    north-rule hot-cell mandate), so a naive groupBy(addressGrid) funnels most
    rows through one reducer. Phase 1 aggregates on (grid, salt) — spreading
    the hot grid over `salt_buckets` reducers — phase 2 combines the tiny
    partial table. Result is identical to the unsalted aggregation (the
    DuckDB oracle IS the unsalted form).
    """
    salted = (
        result.filter(F.col("message").isNull())
        .withColumn("_salt", F.pmod(F.hash("primary_key"), F.lit(salt_buckets)))
        .groupBy("addressGrid", "_salt")
        .agg(F.count("*").alias("_n"), F.sum("score").alias("_s"))
    )
    return salted.groupBy("addressGrid").agg(
        F.sum("_n").cast("bigint").alias("n_success"),
        F.sum("_s").cast("bigint").alias("sum_score"),
    )
