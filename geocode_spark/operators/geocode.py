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

Physical shape (what .explain must show): ONE pass over the input and ZERO
shuffles. All locator sources unify into a single small relation (exact
matches modeled as degenerate ranges from_addr = to_addr, so address points,
centerline ranges and PO boxes share one shape), pre-grouped per join key
(zone_key, join_name) into candidate ARRAYS and broadcast. The parsed input
LEFT-joins it once — BroadcastHashJoin emitting exactly ONE row per input row
— and the best candidate is selected row-locally with higher-order array
functions: filter (house-range + accept-score threshold) -> transform (score
+ rank_key-first struct) -> array_max (struct ordering = rank order; ranks
are unique, so ties are impossible). Unmatched keys / empty arrays surface as
NULL = the no-match row.

Every input row is handled independently and locally: no aggregation, no
window, no exchange — the plan is embarrassingly parallel by construction,
which is what makes N -> 4N executor scaling near-linear. Skew cannot
concentrate (there is no shuffle key to skew); the hot-zone (Salt Lake City)
mandate is handled by the locator ARRAY being bucket-scanned per probe row
exactly as a hash-join bucket would be.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .. import DEFAULT_ACCEPT_SCORE, RESULT_COLUMNS
from ..cleansing import cleanse_street_col, cleanse_zone_col
from ..grammar import DIRECTION_WORDS

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
    """Project the reference input relation and attach cleansed columns.

    Also attaches the F5/P5 `error` column (per-row failure capture,
    reference geocode.py:253-254): the deterministic street-length guard —
    the Catalyst twin of extraction's fused-kernel guard."""
    from ..extraction import MAX_STREET_LEN

    street = F.col(street_col).cast("string")
    return df.select(
        F.col(id_col).cast("string").alias("primary_key"),
        street.alias("input_street"),
        F.col(zone_col).cast("string").alias("input_zone"),
        F.coalesce(cleanse_street_col(F.col(street_col)), F.lit("")).alias(
            "cleansed_street"
        ),
        F.coalesce(cleanse_zone_col(F.col(zone_col)), F.lit("")).alias(
            "cleansed_zone"
        ),
        F.when(
            F.length(street) > MAX_STREET_LEN,
            F.concat(F.lit("street too long: "),
                     F.length(street).cast("string"), F.lit(" characters")),
        ).alias("error"),
    )


def parse_input(df: DataFrame) -> DataFrame:
    """Attach parsed-address columns + the zone join key.

    Parsing runs as one Arrow-vectorized stage (grammar.parse_street_struct);
    its output is a materialized struct, so downstream filters and join keys
    read fields instead of re-deriving the parse expression tree."""
    from ..grammar import parse_street_struct

    p = df.withColumn("_p", parse_street_struct(F.col("cleansed_street")))
    return p.select("*", "_p.*").drop("_p").withColumn(
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


def _rank_key(score: Column, priority: Column, cand_id: Column) -> Column:
    """Total order over candidates: score desc, source priority, cand_id asc."""
    return (
        (score.cast("bigint") * 10 + (F.lit(9) - priority)) * F.lit(100_000_000).cast("bigint")
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




# ------------------------------------------------------ unified locator build
# PO-box rows join under this synthetic street name; parsed street rows can
# never produce it (cleansing removes nothing that would create '#').
_POBOX_NAME = "#POBOX"

_UNIFIED_COLS = [
    "src", "pri", "base_score", "cand_id", "grid", "zone_key", "join_name",
    "l_street_name", "l_predir", "l_stype", "l_sufdir",
    "from_addr", "to_addr", "x0", "y0", "x1", "y1",
]


def _with_zone_keys(locator: DataFrame) -> DataFrame:
    """Explode a locator to one row per zone join key (zip5 + grid name)."""
    return locator.withColumn("zone_key", F.col("zip5")).unionByName(
        locator.withColumn("zone_key", F.upper(F.col("grid")))
    )


def unified_locators(
    address_points: DataFrame | None,
    road_centerlines: DataFrame | None,
    pobox_points: DataFrame | None,
    locators: str = "all",
    pobox: bool = False,
) -> DataFrame:
    """One broadcastable relation holding every selected candidate source.

    Exact matchers (address points J2, PO boxes J6) become degenerate ranges
    (from_addr = to_addr), so they share the centerline range join's (J3)
    shape and the probe side joins ONCE for all sources. Coordinates unify as
    segments (points have x0=x1), so one interpolation expression serves all.
    """
    parts = []
    if locators in ("all", "addressPoints") and address_points is not None:
        ap = address_points.select(
            F.lit("ap").alias("src"),
            F.lit(PRIORITY["ap"]).alias("pri"),
            F.lit(BASE_SCORE_AP).alias("base_score"),
            "cand_id", "grid", "zip5",
            F.col("street_name").alias("join_name"),
            F.col("street_name").alias("l_street_name"),
            F.col("predir").alias("l_predir"),
            F.col("stype").alias("l_stype"),
            F.col("sufdir").alias("l_sufdir"),
            F.col("house_number").alias("from_addr"),
            F.col("house_number").alias("to_addr"),
            F.col("x").alias("x0"), F.col("y").alias("y0"),
            F.col("x").alias("x1"), F.col("y").alias("y1"),
        )
        parts.append(_with_zone_keys(ap).select(*_UNIFIED_COLS))
    if locators in ("all", "roadCenterlines") and road_centerlines is not None:
        rc = road_centerlines.select(
            F.lit("rc").alias("src"),
            F.lit(PRIORITY["rc"]).alias("pri"),
            F.lit(BASE_SCORE_RC).alias("base_score"),
            "cand_id", "grid", "zip5",
            F.col("street_name").alias("join_name"),
            F.col("street_name").alias("l_street_name"),
            F.col("predir").alias("l_predir"),
            F.col("stype").alias("l_stype"),
            F.col("sufdir").alias("l_sufdir"),
            "from_addr", "to_addr", "x0", "y0", "x1", "y1",
        )
        parts.append(_with_zone_keys(rc).select(*_UNIFIED_COLS))
    if pobox and pobox_points is not None:
        # PO boxes match on zip zones only (no grid-name key) — no explode.
        pb = pobox_points.select(
            F.lit("usps").alias("src"),
            F.lit(PRIORITY["usps"]).alias("pri"),
            F.lit(BASE_SCORE_USPS).alias("base_score"),
            "cand_id", "grid",
            F.col("zip5").alias("zone_key"),
            F.lit(_POBOX_NAME).alias("join_name"),
            F.lit("").alias("l_street_name"),
            F.lit("").alias("l_predir"),
            F.lit("").alias("l_stype"),
            F.lit("").alias("l_sufdir"),
            F.col("box_number").alias("from_addr"),
            F.col("box_number").alias("to_addr"),
            F.col("x").alias("x0"), F.col("y").alias("y0"),
            F.col("x").alias("x1"), F.col("y").alias("y1"),
        )
        parts.append(pb.select(*_UNIFIED_COLS))
    if not parts:
        raise ValueError("no locator sources selected")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


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
    packed: DataFrame | None = None,
) -> DataFrame:
    """Full geocode: cleansed+parsed input -> the 11-column result contract.

    input_df must have columns (id, street, zone) — pass through cleanse_input
    +parse_input yourself for custom schemas. `locators` in
    {'all','addressPoints','roadCenterlines'} (reference geocode.py:26,128).
    `spatial_reference` re-expresses output x/y (J7, geocode.py:25,115,204):
    26912 native or 4326 via the from-scratch transverse-Mercator inverse.
    """
    return geocode_parsed(
        parse_input(cleanse_input(input_df)),
        address_points=address_points,
        road_centerlines=road_centerlines,
        pobox_points=pobox_points,
        locators=locators,
        pobox=pobox,
        accept_score=accept_score,
        spatial_reference=spatial_reference,
        packed=packed,
    )


def pack_locators(
    address_points: DataFrame | None = None,
    road_centerlines: DataFrame | None = None,
    pobox_points: DataFrame | None = None,
    locators: str = "all",
    pobox: bool = False,
) -> DataFrame:
    """The broadcast-side relation: locator rows pre-grouped into per-
    (zone_key, join_name) candidate arrays so the probe join emits exactly
    one row per input row. Exposed so callers running many geocode
    configurations over the same locators build (and persist) it ONCE —
    in production this is a materialized table, not a per-query groupBy."""
    from ..caching import model_memo, persist_tracked

    loc = unified_locators(
        address_points, road_centerlines, pobox_points,
        locators=locators, pobox=pobox,
    )

    def build():
        # one grouped+persisted pack per (locator set, session) — the
        # materialized-table production shape the docstring names; every
        # geocode configuration's broadcast then reads the cached
        # relation instead of re-running the locator groupBy (~1 s per
        # invocation at sf1.0 scale)
        return persist_tracked(
            loc.groupBy("zone_key", "join_name").agg(
                F.collect_list(
                    F.struct(
                        "src", "pri", "base_score", "cand_id", "grid",
                        "l_street_name", "l_predir", "l_stype", "l_sufdir",
                        "from_addr", "to_addr", "x0", "y0", "x1", "y1",
                    )
                ).alias("cands")
            )
        )

    return model_memo(("locator_pack", locators, pobox), loc, build)


def geocode_parsed(
    base: DataFrame,
    address_points: DataFrame | None = None,
    road_centerlines: DataFrame | None = None,
    pobox_points: DataFrame | None = None,
    locators: str = "all",
    pobox: bool = False,
    accept_score: int = DEFAULT_ACCEPT_SCORE,
    spatial_reference: int = 26912,
    packed: DataFrame | None = None,
) -> DataFrame:
    """geocode() over an already cleansed + parsed relation.

    `base` needs primary_key, input_street, input_zone, cleansed_street,
    cleansed_zone, zone_key and the six parse fields — the schema
    parse_input(cleanse_input(df)) produces. Exposed so sources that parse
    inside their own Arrow stage (extraction.extract_and_parse fuses
    extract+cleanse+parse into one Python round trip) skip re-parsing.
    Pass `packed` (a pack_locators result) to reuse one prebuilt broadcast
    relation across configurations; locators/pobox are ignored then.
    """
    if packed is None:
        packed = pack_locators(
            address_points, road_centerlines, pobox_points,
            locators=locators, pobox=pobox,
        )

    # Probe key: street rows join by street name, PO-box rows by the
    # synthetic PO-box name ('#' can never survive cleansing, so no street
    # can collide with it). Invalid rows have join_name '' and house NULL —
    # they match nothing and fall out of the left join as no-match rows.
    base = base.withColumn(
        "join_name",
        F.when(F.col("addr_type") == "POBOX", F.lit(_POBOX_NAME)).otherwise(
            F.col("street_name")
        ),
    )

    if "error" not in base.columns:  # custom callers without the F5 column
        base = base.withColumn("error", F.lit(None).cast("string"))

    j = base.join(
        F.broadcast(packed),
        on=[base.zone_key == packed.zone_key, base.join_name == packed.join_name],
        how="left",
    ).drop(packed.zone_key).drop(packed.join_name)

    house = F.col("house")

    def _score(c):
        # J4: deterministic penalty scoring against one candidate struct.
        return (
            c["base_score"]
            - _dir_penalty(F.col("predir"), c["l_predir"])
            - _dir_penalty(F.col("sufdir"), c["l_sufdir"])
            - _type_penalty(F.col("stype"), c["l_stype"])
        ).cast("bigint")

    def _in_range(c):
        return (house >= c["from_addr"]) & (house <= c["to_addr"])

    # J5 row-locally: ONE aggregate fold over the candidate array keeps
    # the best (rank_key asc-unique total order: score desc, priority,
    # cand_id) candidate that is in range and clears the accept score.
    # HOF lambdas are interpreted per element, so the previous
    # filter -> transform(14-field struct) -> array_max(struct compare)
    # chain allocated a full struct per eligible candidate and compared
    # structs pairwise; the fold carries (key, candidate-ref) and builds
    # a struct only when a candidate improves on the running best —
    # winner identical (ranks unique), measured ~2x less matcher time.
    cand_type = j.schema["cands"].dataType.elementType
    init = F.struct(
        F.lit(-1).cast("bigint").alias("k"),
        F.lit(None).cast(cand_type).alias("c"),
    )

    def _fold(acc, c):
        sc = _score(c)
        k = _rank_key(sc, c["pri"], c["cand_id"])
        better = _in_range(c) & (sc >= accept_score) & (k > acc["k"])
        return F.when(
            better, F.struct(k.alias("k"), c.alias("c"))
        ).otherwise(acc)

    best = F.aggregate(F.col("cands"), init, _fold)["c"]
    # F5 precedence: a captured per-row error forces the unmatched error-row
    # shape (x=0/y=0/score=0, message=error) even if a candidate would match
    # — the reference's exception capture fires before any match is written.
    j = j.withColumn(
        "m", F.when(F.col("error").isNull(), best)
    ).drop("cands")

    m = F.col("m")
    # the raw candidate struct carries no computed score; derive the
    # winner's once (same _score arithmetic the fold ranked it by)
    m_score = (
        m["base_score"]
        - _dir_penalty(F.col("predir"), m["l_predir"])
        - _dir_penalty(F.col("sufdir"), m["l_sufdir"])
        - _type_penalty(F.col("stype"), m["l_stype"])
    ).cast("bigint")
    # Position along the winning segment; exact matchers are degenerate
    # segments (from=to -> t=0 -> x0 bit-exact).
    t = F.when(
        m["to_addr"] > m["from_addr"],
        (house - m["from_addr"]).cast("double")
        / (m["to_addr"] - m["from_addr"]).cast("double"),
    ).otherwise(F.lit(0.0))

    locator_name = (
        F.when(m["src"] == "usps", F.lit(LOCATOR_USPS))
        .when(m["src"] == "ap", F.lit(LOCATOR_AP))
        .otherwise(F.lit(LOCATOR_RC))
    )
    match_addr = F.when(
        m["src"] == "usps",
        F.concat(
            F.lit("P.O. BOX "), house.cast("string"),
            F.lit(", "), F.col("zone_key"),
        ),
    ).otherwise(
        _match_address(
            house, m["l_predir"], m["l_street_name"], m["l_stype"],
            m["l_sufdir"], m["grid"],
        )
    )
    std_addr = F.when(
        m["src"] == "usps",
        F.lower(F.concat(F.lit("po box "), house.cast("string"))),
    ).otherwise(
        _standardized(house, F.col("predir"), F.col("street_name"),
                      F.col("stype"), F.col("sufdir"))
    )

    matched = m.isNotNull()
    missing = (F.col("cleansed_street") == "") | (F.col("cleansed_zone") == "")
    msg_missing = F.concat(
        F.lit(f"Missing required parameters for URL: https://{HOST}/api/v1/geocode/"),
        F.col("cleansed_street"), F.lit("/"), F.col("cleansed_zone"),
    )
    msg_404 = F.lit(MSG_NO_CANDIDATES.format(score=accept_score))

    result = j.select(
        F.col("primary_key"),
        F.col("input_street"),
        F.col("input_zone"),
        F.when(matched, m["x0"] + t * (m["x1"] - m["x0"]))
        .otherwise(F.lit(0.0)).alias("x"),
        F.when(matched, m["y0"] + t * (m["y1"] - m["y0"]))
        .otherwise(F.lit(0.0)).alias("y"),
        F.when(matched, m_score).otherwise(F.lit(0).cast("bigint"))
        .alias("score"),
        F.when(matched, locator_name).alias("locator"),
        F.when(matched, match_addr).alias("matchAddress"),
        # P6: prefer standardizedAddress, fall back to inputAddress
        # (reference geocode.py:234-237) — ours always sets it on success.
        F.when(matched, std_addr).alias("standardizedAddress"),
        F.when(matched, m["grid"]).alias("addressGrid"),
        F.when(~matched,
               F.coalesce(F.col("error"),
                          F.when(missing, msg_missing).otherwise(msg_404)))
        .alias("message"),
    )
    if spatial_reference != 26912:
        from .projection import reproject_result

        result = reproject_result(result, wkid=spatial_reference)
    return result


def metrics_rollup(result: DataFrame) -> DataFrame:
    """OLAP rollup of matched results over (addressGrid, locator):
    per-combination, per-grid subtotal, and grand-total rows in ONE pass
    (Catalyst expands the grouping sets map-side; a single exchange).

    grouping_id distinguishes subtotal NULLs from data NULLs — identical
    semantics to ANSI GROUP BY ROLLUP, which the DuckDB oracle uses
    directly. Scores aggregate as exact integer sums (scores are whole
    points), so every cell hash-matches."""
    matched = result.filter(F.col("message").isNull())
    return matched.rollup("addressGrid", "locator").agg(
        F.grouping_id().cast("bigint").alias("grouping_id"),
        F.count("*").cast("bigint").alias("n"),
        F.sum(F.col("score").cast("bigint")).alias("sum_score"),
        F.min(F.col("score").cast("bigint")).alias("min_score"),
        F.max(F.col("score").cast("bigint")).alias("max_score"),
    )


def metrics_rollup_oracle_sql(result_sql: str) -> str:
    return f"""
SELECT addressGrid, locator,
       CAST(GROUPING(addressGrid, locator) AS BIGINT) AS grouping_id,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(score AS BIGINT)) AS BIGINT) AS sum_score,
       CAST(min(CAST(score AS BIGINT)) AS BIGINT) AS min_score,
       CAST(max(CAST(score AS BIGINT)) AS BIGINT) AS max_score
FROM ({result_sql}) WHERE message IS NULL
GROUP BY ROLLUP(addressGrid, locator)
"""


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
