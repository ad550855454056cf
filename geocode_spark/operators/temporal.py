"""Temporal operators over the events stream: sessionization, as-of join,
tumbling-window rollups.

These are the event-time operators a web-scale training-data pipeline needs
next to the geocode core (crawl snapshots, user telemetry, label streams).
All three are single-shuffle shapes:

 - sessionize / session_stats: ONE hash exchange on user_id, then window
   functions evaluated within each sorted partition — the canonical
   sessionization plan. No driver loop, no second shuffle (session_stats's
   groupBy(user_id, session_idx) is partition-local after the window sort,
   and AQE coalesces it into the same exchange).
 - asof_last_purchase: the single-relation as-of join — each event picks the
   most recent strictly-preceding purchase row of the same user via
   last(..., ignorenulls) over a rows-frame. For the two-relation variant
   the same plan applies after a unionByName with a side tag; no range
   explosion, no per-row probe.
 - event_window_rollup: epoch-floor tumbling windows as a plain groupBy —
   partial aggregation map-side, one exchange on (window, event_type).

Scale notes (100 TB): the only skew risk is a hot user_id; the window shapes
tolerate it up to one-partition-per-user volume, beyond which sessionize
would salt by (user_id, day) and stitch boundaries — documented, not needed
at the tested scales. Timestamps are compared as epoch MICROSECONDS
(unix_micros / epoch_us) so both dialects do exact int64 arithmetic, and
money sums use integer cents — no float fold-order hazards anywhere.

Determinism: every window orders by (ts_us, event_id); event_id is unique,
so plans are total-ordered and results are identical across parallelism
levels (the north rule's two-cluster-size invariant).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_GAP_MINUTES = 30
DEFAULT_WINDOW_HOURS = 6


def _cents(col):
    return F.round(col * 100).cast("bigint")


def _with_ts_us(events: DataFrame) -> DataFrame:
    # ts arrives as TIMESTAMP_NTZ; the session timezone is pinned to UTC, so
    # the cast reads the naive value as UTC — exactly DuckDB's epoch_us(ts)
    return events.withColumn(
        "ts_us", F.unix_micros(F.col("ts").cast("timestamp"))
    )


def sessionize(events: DataFrame,
               gap_minutes: int = DEFAULT_GAP_MINUTES) -> DataFrame:
    """Assign gap-based sessions per user.

    A new session starts when the gap to the previous event of the same user
    exceeds gap_minutes. session_idx is 1-based per user; session_id is the
    stable string key "<user_id>-<session_idx>".
    """
    gap_us = gap_minutes * 60 * 1_000_000
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    e = _with_ts_us(events)
    prev = F.lag("ts_us").over(w)
    new_sess = F.when(
        prev.isNull() | ((F.col("ts_us") - prev) > gap_us), 1
    ).otherwise(0)
    return (
        e.withColumn("session_idx", F.sum(new_sess).over(w).cast("bigint"))
        .withColumn(
            "session_id",
            F.concat_ws("-", F.col("user_id"), F.col("session_idx")),
        )
        .select("event_id", "user_id", "ts_us", "session_idx", "session_id")
    )


def sessionize_salted(events: DataFrame,
                      gap_minutes: int = DEFAULT_GAP_MINUTES,
                      salt_hours: int = 24) -> DataFrame:
    """Skew-hardened sessionize: identical output, hot-user-proof plan.

    Plain sessionize puts each user in ONE window partition — correct until
    a single user carries more events than an executor holds (bots, SDK
    retry storms: the web-telemetry skew case). This variant salts the
    window by (user_id, time_bucket) so a hot user spreads across
    buckets, then stitches bucket boundaries with a per-(user, bucket)
    SUMMARY relation — days-per-user rows, metadata-scale — so the heavy
    phase never sees an unbounded partition:

      phase 1  local sessionization within (user_id, bucket)   [salted]
      phase 2  per-bucket summary -> merge flags + index offsets via one
               tiny window over each user's active buckets
      phase 3  join offsets back on (user_id, bucket), reindex locally

    A bucket's first local session merges with the previous active
    bucket's last session iff the boundary gap <= gap (m=1); the global
    index is offset + local_idx - m, where offset = sessions contributed
    by all earlier buckets (n_local - m each). Merge cascades across many
    consecutive buckets resolve in the single ordered summary window.
    Exactly equals sessionize() on any input (same oracle), pinned by
    tests.
    """
    gap_us = gap_minutes * 60 * 1_000_000
    salt_us = salt_hours * 3600 * 1_000_000
    e = _with_ts_us(events).withColumn(
        "_bucket", (F.col("ts_us") - F.col("ts_us") % salt_us).cast("bigint")
    )
    w_local = Window.partitionBy("user_id", "_bucket").orderBy(
        "ts_us", "event_id"
    )
    prev = F.lag("ts_us").over(w_local)
    new_sess = F.when(
        prev.isNull() | ((F.col("ts_us") - prev) > gap_us), 1
    ).otherwise(0)
    local = e.withColumn(
        "_local_idx", F.sum(new_sess).over(w_local).cast("bigint")
    )

    summ = local.groupBy("user_id", "_bucket").agg(
        F.min("ts_us").alias("_first_ts"),
        F.max("ts_us").alias("_last_ts"),
        F.max("_local_idx").alias("_n_local"),
    )
    w_buckets = Window.partitionBy("user_id").orderBy("_bucket")
    prev_last = F.lag("_last_ts").over(w_buckets)
    m = F.when(
        prev_last.isNotNull()
        & ((F.col("_first_ts") - prev_last) <= gap_us),
        1,
    ).otherwise(0)
    contrib = F.col("_n_local") - m
    offsets = summ.select(
        "user_id",
        "_bucket",
        m.alias("_m"),
        F.coalesce(
            F.sum(contrib).over(
                w_buckets.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).cast("bigint").alias("_offset"),
    )

    return (
        local.join(offsets, ["user_id", "_bucket"])
        .withColumn(
            "session_idx",
            (F.col("_offset") + F.col("_local_idx") - F.col("_m")).cast(
                "bigint"
            ),
        )
        .withColumn(
            "session_id",
            F.concat_ws("-", F.col("user_id"), F.col("session_idx")),
        )
        .select("event_id", "user_id", "ts_us", "session_idx", "session_id")
    )


def session_stats(events: DataFrame,
                  gap_minutes: int = DEFAULT_GAP_MINUTES) -> DataFrame:
    """Per-session rollup over sessionize()'s assignment.

    The groupBy keys are a superset of the window partition key, so the
    aggregation reuses the sessionize exchange (no extra wide shuffle).
    Money is summed in integer cents — order-independent exact arithmetic.
    """
    gap_us = gap_minutes * 60 * 1_000_000
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    e = _with_ts_us(events).withColumn("value_cents", _cents(F.col("value")))
    prev = F.lag("ts_us").over(w)
    new_sess = F.when(
        prev.isNull() | ((F.col("ts_us") - prev) > gap_us), 1
    ).otherwise(0)
    s = e.withColumn("session_idx", F.sum(new_sess).over(w).cast("bigint"))
    return (
        s.groupBy("user_id", "session_idx")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.min("ts_us").alias("start_us"),
            F.max("ts_us").alias("end_us"),
            (F.max("ts_us") - F.min("ts_us")).alias("duration_us"),
            F.sum("value_cents").alias("sum_value_cents"),
        )
        .withColumn(
            "session_id",
            F.concat_ws("-", F.col("user_id"), F.col("session_idx")),
        )
        .select(
            "user_id", "session_idx", "session_id", "n_events",
            "start_us", "end_us", "duration_us", "sum_value_cents",
        )
    )


def asof_last_purchase(events: DataFrame,
                       probe_type: str = "click",
                       build_type: str = "purchase") -> DataFrame:
    """As-of join within the event stream: each probe_type event joined to the
    same user's most recent strictly-preceding build_type event.

    "Strictly preceding" is row-frame semantics under the total order
    (ts_us, event_id): ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING.
    The three last(..., ignorenulls) projections share one frame and one
    order, so they all read the same build row — no struct packing needed.
    This is the shuffle-minimal as-of shape: one exchange on user_id, sorted
    once, no range join / per-row probes.
    """
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    e = _with_ts_us(events).withColumn("value_cents", _cents(F.col("value")))
    is_b = F.col("event_type") == build_type
    last_of = lambda c: F.last(F.when(is_b, c), ignorenulls=True).over(w)
    return (
        e.withColumn("purchase_event_id", last_of(F.col("event_id")))
        .withColumn("purchase_ts_us", last_of(F.col("ts_us")))
        .withColumn("purchase_value_cents", last_of(F.col("value_cents")))
        .filter(F.col("event_type") == probe_type)
        .select(
            "event_id", "user_id", "ts_us",
            "purchase_event_id", "purchase_ts_us", "purchase_value_cents",
        )
    )


def asof_join(
    probe: DataFrame,
    build: DataFrame,
    keys: tuple = ("user_id",),
    ts_col: str = "ts_us",
    order_col: str = "event_id",
    probe_cols: tuple = ("event_id",),
    build_cols: tuple = ("event_id", "ts_us", "value_cents"),
    prefix: str = "b_",
) -> DataFrame:
    """Generic two-relation as-of join: each probe row picks the latest
    build row of the same key with build.ts <= probe.ts (inclusive).

    The classic union trick: tag sides, sort one partition per key by
    (ts, side, order) — build rows sort before probe rows at equal ts, and
    among equal-ts build rows the largest order_col wins — then a single
    last(ignorenulls) over a rows-frame resolves every probe row. The build
    payload travels as ONE struct so the chosen row is atomic even when a
    payload column is null. ONE exchange on the key, no range join, no
    per-row probes — the same single-shuffle shape as the self-join form,
    and the plan a 100 TB as-of (trades joined to quotes, pages joined to
    crawl snapshots) needs.
    """
    keys = list(keys)
    bstruct_fields = [F.col(c).alias(c) for c in build_cols]
    b = build.select(
        *keys,
        F.col(ts_col).alias("_ts"),
        F.col(order_col).alias("_ord"),
        F.lit(0).alias("_side"),
        F.struct(*bstruct_fields).alias("_bs"),
        *[F.lit(None).cast(probe.schema[c].dataType).alias(f"_p_{c}")
          for c in probe_cols],
    )
    bs_type = b.schema["_bs"].dataType
    p = probe.select(
        *keys,
        F.col(ts_col).alias("_ts"),
        F.col(order_col).alias("_ord"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(bs_type).alias("_bs"),
        *[F.col(c).alias(f"_p_{c}") for c in probe_cols],
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy("_ts", "_side", "_ord")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    resolved = p.unionByName(b).withColumn(
        "_match", F.last("_bs", ignorenulls=True).over(w)
    )
    return resolved.filter(F.col("_side") == 1).select(
        *keys,
        F.col("_ts").alias(ts_col),
        *[F.col(f"_p_{c}").alias(c) for c in probe_cols],
        *[F.col("_match").getField(c).alias(f"{prefix}{c}")
          for c in build_cols],
    )


def asof_join_events(events: DataFrame,
                     probe_type: str = "view",
                     build_type: str = "purchase") -> DataFrame:
    """The two-relation as-of over the events table: probe_type events
    joined to the latest same-or-earlier build_type event per user."""
    e = _with_ts_us(events).withColumn("value_cents", _cents(F.col("value")))
    return asof_join(
        e.filter(F.col("event_type") == probe_type),
        e.filter(F.col("event_type") == build_type),
    )


def attribution_join(events: DataFrame,
                     probe_type: str = "click",
                     build_type: str = "purchase",
                     window_hours: int = 1) -> DataFrame:
    """Range (interval) join, bucketed: every probe event within
    [build_ts, build_ts + window] of a same-user build event — the
    click-after-purchase attribution shape.

    A naive range join is a per-key cross product with a residual filter —
    O(|probe|·|build|) per user. The scalable form turns the range into an
    equi-join: time is cut into buckets of the window length, each build
    interval replicates into the (at most two) buckets it overlaps, probes
    land in exactly one bucket, and the join runs on (user_id, bucket) with
    the BETWEEN as a residual filter. A pair can only meet in the probe's
    bucket, so no dedup pass is needed. General intervals replicate
    ceil(len/bucket)+1 times — bounded fan-out, never a cross product.
    """
    win_us = window_hours * 3600 * 1_000_000
    e = _with_ts_us(events)
    probes = e.filter(F.col("event_type") == probe_type).select(
        F.col("event_id").alias("probe_event_id"),
        "user_id",
        F.col("ts_us").alias("probe_ts_us"),
        (F.col("ts_us") - F.col("ts_us") % win_us).alias("bucket"),
    )
    b = e.filter(F.col("event_type") == build_type).select(
        F.col("event_id").alias("build_event_id"),
        "user_id",
        F.col("ts_us").alias("build_ts_us"),
    )
    builds = b.withColumn(
        "bucket",
        F.explode(
            F.array_distinct(
                F.array(
                    F.col("build_ts_us") - F.col("build_ts_us") % win_us,
                    (F.col("build_ts_us") + win_us)
                    - (F.col("build_ts_us") + win_us) % win_us,
                )
            )
        ),
    )
    return (
        probes.join(builds, ["user_id", "bucket"])
        .filter(
            (F.col("probe_ts_us") >= F.col("build_ts_us"))
            & (F.col("probe_ts_us") <= F.col("build_ts_us") + win_us)
        )
        .select(
            "probe_event_id",
            "user_id",
            "probe_ts_us",
            "build_event_id",
            "build_ts_us",
            (F.col("probe_ts_us") - F.col("build_ts_us")).alias("delay_us"),
        )
    )


def event_window_rollup(events: DataFrame,
                        window_hours: int = DEFAULT_WINDOW_HOURS) -> DataFrame:
    """Tumbling event-time windows per event_type.

    Window start = epoch-floored microseconds — integer arithmetic identical
    in both dialects (Structured Streaming's window() produces the same
    boundaries; the batch form keeps the oracle exact). count(distinct)
    is exact; at 100 TB swap for approx_count_distinct behind a flag.
    """
    win_us = window_hours * 3600 * 1_000_000
    e = _with_ts_us(events).withColumn("value_cents", _cents(F.col("value")))
    # pure int64 floor (ts_us - ts_us % w): no double division, exact in
    # both dialects for any representable timestamp
    win = (F.col("ts_us") - F.col("ts_us") % win_us).cast("bigint")
    return (
        e.withColumn("win_start_us", win)
        .groupBy("win_start_us", "event_type")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.countDistinct("user_id").cast("bigint").alias("n_users"),
            F.sum("value_cents").alias("sum_value_cents"),
            F.min("event_id").alias("first_event_id"),
        )
    )


# ---------------------------------------------------------------- oracle side
def _events_src(source: str = "events") -> str:
    return (
        f"(SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us,"
        f" CAST(round(value * 100) AS BIGINT) AS value_cents FROM {source})"
    )


def sessionize_oracle_sql(source: str = "events",
                          gap_minutes: int = DEFAULT_GAP_MINUTES) -> str:
    gap_us = gap_minutes * 60 * 1_000_000
    return f"""
WITH e AS (SELECT * FROM {_events_src(source)}),
flagged AS (
  SELECT event_id, user_id, ts_us,
         CASE WHEN lag(ts_us) OVER w IS NULL
                   OR ts_us - lag(ts_us) OVER w > {gap_us}
              THEN 1 ELSE 0 END AS new_sess
  FROM e
  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
)
SELECT event_id, user_id, ts_us,
       CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us, event_id)
            AS BIGINT) AS session_idx,
       user_id || '-' ||
       CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us, event_id)
            AS BIGINT) AS session_id
FROM flagged
"""


def session_stats_oracle_sql(source: str = "events",
                             gap_minutes: int = DEFAULT_GAP_MINUTES) -> str:
    gap_us = gap_minutes * 60 * 1_000_000
    return f"""
WITH e AS (SELECT * FROM {_events_src(source)}),
flagged AS (
  SELECT event_id, user_id, ts_us, value_cents,
         CASE WHEN lag(ts_us) OVER w IS NULL
                   OR ts_us - lag(ts_us) OVER w > {gap_us}
              THEN 1 ELSE 0 END AS new_sess
  FROM e
  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
),
assigned AS (
  SELECT *, CAST(sum(new_sess) OVER
       (PARTITION BY user_id ORDER BY ts_us, event_id) AS BIGINT) AS session_idx
  FROM flagged
)
SELECT user_id, session_idx,
       user_id || '-' || session_idx AS session_id,
       CAST(count(*) AS BIGINT) AS n_events,
       min(ts_us) AS start_us,
       max(ts_us) AS end_us,
       max(ts_us) - min(ts_us) AS duration_us,
       CAST(sum(value_cents) AS BIGINT) AS sum_value_cents
FROM assigned
GROUP BY user_id, session_idx
"""


def asof_last_purchase_oracle_sql(source: str = "events",
                                  probe_type: str = "click",
                                  build_type: str = "purchase") -> str:
    last = (
        "last_value(CASE WHEN event_type = '{b}' THEN {{c}} END IGNORE NULLS)"
        " OVER (PARTITION BY user_id ORDER BY ts_us, event_id"
        " ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)"
    ).format(b=build_type)
    return f"""
SELECT event_id, user_id, ts_us,
       purchase_event_id, purchase_ts_us, purchase_value_cents
FROM (
  SELECT event_id, user_id, ts_us, event_type,
         {last.format(c='event_id')} AS purchase_event_id,
         {last.format(c='ts_us')} AS purchase_ts_us,
         {last.format(c='value_cents')} AS purchase_value_cents
  FROM {_events_src(source)}
)
WHERE event_type = '{probe_type}'
"""


def asof_join_events_oracle_sql(source: str = "events",
                                probe_type: str = "view",
                                build_type: str = "purchase") -> str:
    """DuckDB's native ASOF LEFT JOIN (inclusive >=), with the build side
    deduped to the max-order row per (key, ts) — the same winner the Spark
    (ts, side, order) sort produces."""
    return f"""
WITH e AS (SELECT * FROM {_events_src(source)}),
p AS (SELECT * FROM e WHERE event_type = '{probe_type}'),
b AS (
  SELECT user_id, ts_us, event_id, value_cents FROM e
  WHERE event_type = '{build_type}'
  QUALIFY row_number() OVER
    (PARTITION BY user_id, ts_us ORDER BY event_id DESC) = 1
)
SELECT p.user_id, p.ts_us, p.event_id,
       b.event_id AS b_event_id,
       b.ts_us AS b_ts_us,
       b.value_cents AS b_value_cents
FROM p ASOF LEFT JOIN b
  ON p.user_id = b.user_id AND p.ts_us >= b.ts_us
"""


def attribution_join_oracle_sql(source: str = "events",
                                probe_type: str = "click",
                                build_type: str = "purchase",
                                window_hours: int = 1) -> str:
    win_us = window_hours * 3600 * 1_000_000
    return f"""
WITH e AS (SELECT * FROM {_events_src(source)})
SELECT p.event_id AS probe_event_id,
       p.user_id,
       p.ts_us AS probe_ts_us,
       b.event_id AS build_event_id,
       b.ts_us AS build_ts_us,
       p.ts_us - b.ts_us AS delay_us
FROM (SELECT * FROM e WHERE event_type = '{probe_type}') p
JOIN (SELECT * FROM e WHERE event_type = '{build_type}') b
  ON p.user_id = b.user_id
 AND p.ts_us BETWEEN b.ts_us AND b.ts_us + {win_us}
"""


def event_window_rollup_oracle_sql(
        source: str = "events",
        window_hours: int = DEFAULT_WINDOW_HOURS) -> str:
    win_us = window_hours * 3600 * 1_000_000
    return f"""
SELECT CAST(ts_us - ts_us % {win_us} AS BIGINT) AS win_start_us,
       event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(sum(value_cents) AS BIGINT) AS sum_value_cents,
       min(event_id) AS first_event_id
FROM {_events_src(source)}
GROUP BY 1, 2
"""


# ------------------------------------------------------------ funnel analysis
FUNNEL_STEPS = ("view", "click", "purchase")


def funnel_stages(events: DataFrame,
                  steps: tuple = FUNNEL_STEPS) -> DataFrame:
    """(user_id, steps_completed, t1_us, t2_us, t3_us): per user, the
    earliest-first greedy funnel chain through `steps` — t1 = the user's
    first step-1 event; t_{k+1} = their first step-(k+1) event STRICTLY
    after t_k. steps_completed counts how deep the chain got; timestamps
    beyond it are NULL; every user in the table appears (0 rows of funnel
    events => steps_completed 0).

    Engine formulation: one keyed groupBy collecting the user's funnel
    events as a sorted (ts_us, event_id, step_idx) struct array, then a
    Catalyst fold advancing a (done, t1, t2, t3) accumulator — ascending
    order makes "first qualifying event" exactly the sequential minimum,
    so the DuckDB twin can implement the INDEPENDENT sequential-min
    formulation (3 chained conditional aggregates) and the gate
    cross-checks the fold against it. Per-user array size is the user's
    funnel-event count — the sessionize_salted hot-user note applies
    verbatim if one user ever dominates.
    """
    assert len(steps) == 3  # output schema is 3-step; generalize as needed
    si = F.when(F.col("event_type") == steps[0], 0)
    for k, s in enumerate(steps[1:], start=1):
        si = si.when(F.col("event_type") == s, k)
    e = (
        _with_ts_us(events)
        .filter(F.col("event_type").isin(list(steps)))
        .select("user_id", "ts_us", "event_id", si.alias("si"))
    )
    arr = e.groupBy("user_id").agg(
        F.sort_array(
            F.collect_list(F.struct("ts_us", "event_id", "si"))
        ).alias("evs")
    )
    nil = F.lit(None).cast("bigint")
    init = F.struct(
        F.lit(0).alias("done"),
        nil.alias("t1"), nil.alias("t2"), nil.alias("t3"),
    )

    def upd(acc, x):
        last = (
            F.when(acc["done"] == 1, acc["t1"])
            .when(acc["done"] == 2, acc["t2"])
            .otherwise(F.lit(-(1 << 62)).cast("bigint"))
        )
        adv = (x["si"] == acc["done"]) & (x["ts_us"] > last) & (
            acc["done"] < 3
        )
        return F.when(
            adv,
            F.struct(
                (acc["done"] + 1).alias("done"),
                F.when(acc["done"] == 0, x["ts_us"]).otherwise(acc["t1"])
                .alias("t1"),
                F.when(acc["done"] == 1, x["ts_us"]).otherwise(acc["t2"])
                .alias("t2"),
                F.when(acc["done"] == 2, x["ts_us"]).otherwise(acc["t3"])
                .alias("t3"),
            ),
        ).otherwise(acc)

    folded = arr.select(
        "user_id", F.aggregate("evs", init, upd).alias("st")
    )
    users = events.select("user_id").distinct()
    return users.join(folded, "user_id", "left").select(
        "user_id",
        F.coalesce(F.col("st.done"), F.lit(0)).cast("bigint")
        .alias("steps_completed"),
        F.col("st.t1").alias("t1_us"),
        F.col("st.t2").alias("t2_us"),
        F.col("st.t3").alias("t3_us"),
    )


def funnel_stages_oracle_sql(source: str = "events",
                             steps: tuple = FUNNEL_STEPS) -> str:
    """DuckDB twin — the sequential-min formulation, independent of the
    engine's fold."""
    s1, s2, s3 = steps
    return f"""
WITH e AS (SELECT * FROM {_events_src(source)}),
u AS (SELECT DISTINCT user_id FROM e),
f1 AS (
  SELECT user_id, min(ts_us) AS t1 FROM e
  WHERE event_type = '{s1}' GROUP BY user_id
),
f2 AS (
  SELECT e.user_id, min(e.ts_us) AS t2
  FROM e JOIN f1 ON e.user_id = f1.user_id
  WHERE e.event_type = '{s2}' AND e.ts_us > f1.t1
  GROUP BY e.user_id
),
f3 AS (
  SELECT e.user_id, min(e.ts_us) AS t3
  FROM e JOIN f2 ON e.user_id = f2.user_id
  WHERE e.event_type = '{s3}' AND e.ts_us > f2.t2
  GROUP BY e.user_id
)
SELECT u.user_id,
       CAST(CASE WHEN f3.t3 IS NOT NULL THEN 3
                 WHEN f2.t2 IS NOT NULL THEN 2
                 WHEN f1.t1 IS NOT NULL THEN 1
                 ELSE 0 END AS BIGINT) AS steps_completed,
       f1.t1 AS t1_us, f2.t2 AS t2_us, f3.t3 AS t3_us
FROM u
LEFT JOIN f1 USING (user_id)
LEFT JOIN f2 USING (user_id)
LEFT JOIN f3 USING (user_id)"""


# ----------------------------------------------------------------- SCD2 build
def scd2_history(events: DataFrame,
                 change_type: str = "signup") -> DataFrame:
    """(user_id, value_cents, valid_from_us, valid_to_us, version,
    is_current): the slowly-changing-dimension type-2 history built from a
    change stream — one row per EFFECTIVE change (consecutive repeats of
    the same value collapse into the earlier row), valid_to = the next
    effective change's timestamp (NULL while current), version 1-based per
    key. The warehouse-merge primitive for dimension tables.

    Scale shape: ONE exchange — both window passes (the change-compression
    lag and the validity lead/version) share the (user_id) partitioning
    and (ts_us, event_id) ordering, so Catalyst reuses the sort; the
    filter between them is pipelined. Value rides as exact integer cents
    (_cents), the family's established float discipline."""
    e = (
        _with_ts_us(events)
        .filter(F.col("event_type") == change_type)
        .withColumn("value_cents", _cents(F.col("value")))
        .select("user_id", "ts_us", "event_id", "value_cents")
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    # null-safe change detection: value comparisons use IS DISTINCT FROM
    # semantics so a change TO or FROM a NULL value is a real version,
    # and "no previous row" is detected by a lag marker — lag(value)
    # alone cannot distinguish a NULL first value from a missing row
    prev_v = F.lag("value_cents").over(w)
    has_prev = F.lag(F.lit(1)).over(w)
    ch = (
        e.withColumn("prev_v", prev_v)
        .withColumn("has_prev", has_prev)
        .filter(
            F.col("has_prev").isNull()
            | ~F.col("value_cents").eqNullSafe(F.col("prev_v"))
        )
    )
    w2 = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    return ch.select(
        "user_id",
        "value_cents",
        F.col("ts_us").alias("valid_from_us"),
        F.lead("ts_us").over(w2).alias("valid_to_us"),
        F.row_number().over(w2).cast("bigint").alias("version"),
    ).withColumn(
        "is_current",
        F.when(F.col("valid_to_us").isNull(), F.lit(1)).otherwise(F.lit(0))
        .cast("bigint"),
    )


def scd2_history_oracle_sql(source: str = "events",
                            change_type: str = "signup") -> str:
    """DuckDB twin of scd2_history — same compression + validity windows."""
    return f"""
WITH e AS (
  SELECT user_id, ts_us, event_id, value_cents
  FROM {_events_src(source)} WHERE event_type = '{change_type}'
),
ch AS (
  SELECT * FROM (
    SELECT user_id, ts_us, event_id, value_cents,
           lag(value_cents) OVER w AS prev_v,
           lag(1) OVER w AS has_prev
    FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
  ) WHERE has_prev IS NULL OR value_cents IS DISTINCT FROM prev_v
)
SELECT user_id, value_cents,
       ts_us AS valid_from_us,
       lead(ts_us) OVER w AS valid_to_us,
       CAST(row_number() OVER w AS BIGINT) AS version,
       CAST(CASE WHEN lead(ts_us) OVER w IS NULL THEN 1 ELSE 0 END
            AS BIGINT) AS is_current
FROM ch WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)"""


# -------------------------------------------------------- cohort retention
# The classic product-analytics retention triangle: bucket users into
# weekly cohorts by their FIRST event, then count how many of each cohort
# are active k weeks later. Scale shape: one user-keyed min-aggregation
# (the cohort map), one user-keyed distinct over (user, week) — both
# partial-aggregated map-side — then a user-keyed join (the two sides share
# the partitioning, so AQE plans it exchange-free after the aggs) and a
# final metadata-sized rollup on (cohort, offset). Weeks are integer
# epoch-microsecond floors (ts_us div WEEK_US), so both engines do exact
# int64 arithmetic end to end.
WEEK_US = 7 * 86400 * 1_000_000
# The fixture's event stream is dense from t0, so every user's first event
# lands in week 0 — a one-cohort degenerate gate. stagger_mod shifts each
# user's clock by (user_id % mod) weeks (deterministic, mirrored in the
# oracle), which fans the fixture into `mod` distinct cohorts so the gate
# actually exercises the cohort join. Real event streams pass stagger_mod=0.
COHORT_STAGGER_MOD = 8


def cohort_retention(events: DataFrame,
                     stagger_mod: int = COHORT_STAGGER_MOD) -> DataFrame:
    """(cohort_week, week_offset, n_users): users of each first-event weekly
    cohort still active `week_offset` weeks after their cohort week."""
    mod = int(stagger_mod)
    shifted = (
        f"ts_us + (user_id % {mod}) * {WEEK_US}" if mod else "ts_us"
    )
    e = _with_ts_us(events).select(
        "user_id", F.expr(f"({shifted}) div {WEEK_US}").alias("wk")
    )
    cohorts = e.groupBy("user_id").agg(F.min("wk").alias("cohort_week"))
    active = e.distinct()
    # (user, wk) is distinct and each user has ONE cohort week, so a plain
    # count(*) equals count(DISTINCT user) — no Expand pass needed.
    return (
        active.join(cohorts, "user_id")
        .groupBy(
            "cohort_week",
            (F.col("wk") - F.col("cohort_week")).alias("week_offset"),
        )
        .agg(F.count("*").cast("bigint").alias("n_users"))
    )


def cohort_retention_oracle_sql(source: str = "events",
                                stagger_mod: int = COHORT_STAGGER_MOD) -> str:
    mod = int(stagger_mod)
    shifted = (
        f"ts_us + (user_id % {mod}) * {WEEK_US}" if mod else "ts_us"
    )
    return f"""
WITH e AS (
  SELECT user_id, ({shifted}) // {WEEK_US} AS wk
  FROM {_events_src(source)}
),
cohorts AS (
  SELECT user_id, min(wk) AS cohort_week FROM e GROUP BY user_id
),
active AS (SELECT DISTINCT user_id, wk FROM e)
SELECT c.cohort_week,
       a.wk - c.cohort_week AS week_offset,
       CAST(count(*) AS BIGINT) AS n_users
FROM active a JOIN cohorts c USING (user_id)
GROUP BY 1, 2"""
