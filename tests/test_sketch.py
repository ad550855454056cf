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
