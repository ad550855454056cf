"""Tenth wave: count-min sketch term-frequency estimation."""

from pyspark.sql import functions as F


def _toy_docs(spark):
    rows = [
        (1, "alpha alpha alpha alpha beta beta gamma"),
        (2, "alpha beta delta epsilon zeta eta theta"),
        (3, "iota kappa lambda mu nu xi omicron pi"),
        (4, "alpha rho sigma tau upsilon phi chi psi"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_cms_exact_at_wide_width(spark):
    """With width >> vocabulary there are no collisions: the estimate IS
    the exact count for every probe term."""
    from geocode_spark.textops.sketch import cms_term_counts

    out = cms_term_counts(_toy_docs(spark), depth=4, width=4096, topk=5)
    rows = {r.term: (r.exact_cnt, r.cms_est) for r in out.collect()}
    assert rows["alpha"] == (6, 6)
    assert all(est == exact for exact, est in rows.values())


def test_cms_overestimates_under_collisions(spark):
    """A deliberately tiny sketch (width 4, depth 1) FORCES collisions
    over a 24-term vocabulary: every estimate must still dominate the
    exact count (the one-sided CMS bound), and at least one probe must
    strictly overestimate — the anti-vacuous-gate check that the sketch
    is really being consulted, not the exact counts echoed back."""
    from geocode_spark.textops.sketch import cms_term_counts

    out = cms_term_counts(_toy_docs(spark), depth=1, width=4, topk=10)
    rows = out.collect()
    assert len(rows) == 10
    assert all(r.cms_est >= r.exact_cnt for r in rows)
    assert any(r.cms_est > r.exact_cnt for r in rows)


def test_cms_cells_merge_by_addition(spark):
    """Mergeability: the sketch of a union equals the cell-wise SUM of
    the parts' sketches — the property that lets two crawls' sketches
    combine without re-scanning either."""
    from geocode_spark.textops.sketch import CMS_WIDTH, _cms_pos_sql

    docs = _toy_docs(spark)
    a, b = docs.filter("doc_id <= 2"), docs.filter("doc_id > 2")

    def cells(df):
        toks = df.select(
            F.explode(
                F.regexp_extract_all(F.lower(F.col("text")),
                                     F.lit("([a-z]+)"))
            ).alias("term")
        )
        pos = F.expr(_cms_pos_sql(0, "term", CMS_WIDTH, duck=False))
        return {
            r.pos: r.cell
            for r in toks.select(pos.alias("pos"))
            .groupBy("pos").agg(F.count("*").alias("cell")).collect()
        }

    whole, pa, pb = cells(docs), cells(a), cells(b)
    merged = {
        p: pa.get(p, 0) + pb.get(p, 0) for p in set(pa) | set(pb)
    }
    assert merged == whole


# ------------------------------------------------------------ bloom filter
def test_bloom_no_false_negatives_and_matches_exact_at_wide_m(spark):
    """Every exactly-blocked doc (packing.blocklist_filter keep=0) must be
    a bloom hit — the filter's one-sided guarantee."""
    from geocode_spark.textops.packing import (
        blocklist_filter,
        default_blocklist,
        synthetic_frontier_corpus,
    )
    from geocode_spark.textops.sketch import bloom_blocklist

    docs = spark.range(0, 200).withColumnRenamed("id", "doc_id")
    frontier = synthetic_frontier_corpus(docs)
    bl = default_blocklist(spark)
    exact_blocked = {
        r.doc_id
        for r in blocklist_filter(frontier, bl).filter("keep = 0").collect()
    }
    hits = {
        r.doc_id
        for r in bloom_blocklist(frontier, bl).filter("bloom_hit = 1")
        .collect()
    }
    assert exact_blocked  # fixture really exercises the blocklist
    assert exact_blocked <= hits


def test_bloom_false_positives_forced_at_tiny_m(spark):
    """m = 8 bits with a 5-entry x 3-hash blocklist saturates the bit
    array: unblocked hosts must now collide into hits (the anti-vacuous
    check that membership really goes through the bit relation), while
    the no-false-negative side still holds."""
    from geocode_spark.textops.packing import (
        blocklist_filter,
        default_blocklist,
        synthetic_frontier_corpus,
    )
    from geocode_spark.textops.sketch import bloom_blocklist

    docs = spark.range(0, 200).withColumnRenamed("id", "doc_id")
    frontier = synthetic_frontier_corpus(docs)
    bl = default_blocklist(spark)
    exact_blocked = {
        r.doc_id
        for r in blocklist_filter(frontier, bl).filter("keep = 0").collect()
    }
    hits = {
        r.doc_id
        for r in bloom_blocklist(frontier, bl, m_bits=8, k=3)
        .filter("bloom_hit = 1").collect()
    }
    assert exact_blocked <= hits
    assert hits - exact_blocked  # false positives present by design


# ------------------------------------------------------------- HLL merge
def test_hll_registers_merge_exactly(spark):
    """Registers of ANY disjoint split merged by per-bucket max equal the
    single-pass registers — max is associative/idempotent, so the merge
    invariant is exact, not approximate."""
    from geocode_spark.textops.sketch import hll_merge, hll_registers

    df = spark.range(0, 5000).select(
        (F.col("id") % 4).cast("string").alias("segment"),
        F.concat(F.lit("v"), (F.col("id") % 700).cast("string"))
        .alias("visitor"),
    )
    out = hll_merge(df).collect()
    assert len(out) == 4
    assert all(r.est_merged == r.est_single for r in out)

    # three-way split, merged pairwise in arbitrary order
    parts = [df.filter(F.pmod(F.col("id"), F.lit(3)) == i) for i in range(3)]
    merged = None
    for p in parts:
        r = hll_registers(p)
        merged = r if merged is None else (
            merged.unionByName(r).groupBy("segment", "bucket")
            .agg(F.max("rho").alias("rho"))
        )
    single = {(r.segment, r.bucket): r.rho
              for r in hll_registers(df).collect()}
    got = {(r.segment, r.bucket): r.rho for r in merged.collect()}
    assert got == single
