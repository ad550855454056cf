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
