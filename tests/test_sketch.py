"""Misra-Gries heavy hitters: the sketch path must reproduce the exact
full-groupBy answer under decrement pressure (oracle parity is pinned by
test_entry_contract; these pin the guarantee where the sketch actually
has to drop state)."""
from pyspark.sql import functions as F

from geocode_spark.textops.sketch import frequent_terms


def _skew(spark, n=20000, heavy_every=4, rare_mod=997):
    # one 25%-share token against ~1000 distinct rare tokens: capacity-4
    # summaries decrement constantly, so survival is the MG guarantee,
    # not slack capacity. Rare suffixes are letter-translated — TOKEN_RE
    # is [a-z]+ and digit suffixes would collapse into one token.
    return spark.range(0, n).select(
        F.col("id").alias("doc_id"),
        F.when(F.pmod("id", heavy_every) == 0, F.lit("heavy heavy"))
        .otherwise(
            F.concat(
                F.lit("rare"),
                F.translate(
                    F.pmod("id", rare_mod).cast("string"),
                    "0123456789",
                    "abcdefghij",
                ),
            )
        )
        .alias("text"),
    )


def test_heavy_hitter_survives_tiny_capacity(spark):
    got = frequent_terms(_skew(spark), k=4).collect()
    assert [(r.term, r.cnt) for r in got] == [("heavy", 10000)]


def test_exact_counts_and_threshold_boundary(spark):
    # 3 tokens: a x5, b x3, c x2 (n=10). k=3: threshold cnt*3 > 10 ->
    # a (15) and b (9 fails), boundary pinned strictly
    df = spark.createDataFrame(
        [(0, "a a a a a b b b c c")], "doc_id long, text string"
    )
    got = {(r.term, r.cnt) for r in frequent_terms(df, k=3).collect()}
    assert got == {("a", 5)}
    got2 = {(r.term, r.cnt) for r in frequent_terms(df, k=4).collect()}
    assert got2 == {("a", 5), ("b", 3)}  # 3*4 > 10, 2*4 < 10


def test_empty_and_null_docs(spark):
    df = spark.createDataFrame(
        [(0, ""), (1, None)], "doc_id long, text string"
    )
    assert frequent_terms(df, k=5).count() == 0


def test_parallelism_invariance(spark):
    # the candidate UNION depends on partitioning; the exact recount and
    # threshold must not
    df = _skew(spark, n=8000)
    a = {(r.term, r.cnt)
         for r in frequent_terms(df.repartition(1), k=4).collect()}
    b = {(r.term, r.cnt)
         for r in frequent_terms(df.repartition(13), k=4).collect()}
    assert a == b == {("heavy", 4000)}


# --------------------------------------------------------------- HyperLogLog
def _crawl(spark, n=6000, card=1500):
    # repeat-visitor stream: `card` distinct keys seen ~n/card times each,
    # two segments each seeing the FULL key range (segment from id//card
    # parity, so both halves of the range cycle through every key) —
    # card >= 2.5 * HLL_M keeps the raw-estimate regime
    return spark.range(0, n).select(
        F.when(F.pmod(F.expr(f"id DIV {card}"), 2) == 0, F.lit("a"))
        .otherwise(F.lit("b"))
        .alias("segment"),
        F.concat(F.lit("v"), F.pmod("id", card).cast("string"))
        .alias("visitor"),
    )


def test_hll_rho_matches_python(spark):
    # the string-ops rho ladder vs an honest bit-scan of the same md5 bits
    import hashlib

    from geocode_spark.textops.sketch import _hll_rho_sql

    keys = [f"v{i}" for i in range(200)]
    df = spark.createDataFrame([(k,) for k in keys], "visitor string")
    got = {
        r.visitor: r.rho
        for r in df.select(
            "visitor",
            F.expr(_hll_rho_sql("substring(md5(visitor), 3, 13)"))
            .alias("rho"),
        ).collect()
    }
    for k in keys:
        v = int(hashlib.md5(k.encode()).hexdigest()[2:15], 16)
        rho = 53 if v == 0 else 53 - v.bit_length()
        assert got[k] == rho, k


def test_hll_accuracy_band(spark):
    from geocode_spark.textops.sketch import hll_distinct

    rows = {r.segment: r for r in hll_distinct(_crawl(spark)).collect()}
    assert set(rows) == {"a", "b"}
    for r in rows.values():
        assert r.exact_distinct == 1500
        est = r.est_micro / 1e6
        # 3 sigma of the 1.04/sqrt(256) RSE band
        assert abs(est / r.exact_distinct - 1) < 3 * 1.04 / 16


def test_hll_parallelism_invariance(spark):
    # registers are max-folds of a pure row hash: any partitioning and
    # any arrival order must give identical registers and estimate
    from geocode_spark.textops.sketch import hll_distinct

    df = _crawl(spark, n=3000, card=800)
    a = sorted(map(tuple, hll_distinct(df.repartition(1)).collect()))
    b = sorted(map(tuple, hll_distinct(df.repartition(17)).collect()))
    assert a == b


def test_hll_registers_merge(spark):
    # the mergeable-summaries property the 100 TB union-of-crawls story
    # rests on: max-merging two disjoint halves' register relations gives
    # the full stream's registers (so denom and estimate follow)
    from geocode_spark.textops.sketch import hll_distinct

    df = _crawl(spark).withColumn(
        "half", F.pmod(F.xxhash64("visitor"), F.lit(2))
    )
    full = hll_distinct(df, with_exact=False)
    h0 = hll_distinct(df.filter("half = 0"), with_exact=False)
    h1 = hll_distinct(df.filter("half = 1"), with_exact=False)
    # merge at the denom level is not valid (zeros overlap); recompute
    # from unioned raw streams must equal the full run
    merged = hll_distinct(
        df.filter("half = 0").unionAll(df.filter("half = 1")),
        with_exact=False,
    )
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, full.collect())
    )
    # and each half estimates its own (smaller) cardinality sanely
    for part in (h0, h1):
        for r in part.collect():
            assert 0 < r.est_micro / 1e6 < 1500
