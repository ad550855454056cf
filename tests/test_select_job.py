"""End-to-end spark-submit run of the LM-selection job (span-dedup rewrite
-> bigram-LM tail filter -> DSIR selection -> staged resumable write), plus
unit pins for the deterministic histogram-threshold helper it selects with."""

import json
import os
import subprocess
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from test_corpus_job import _build_pyfiles_zip, _spark_submit

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = "/root/testdata/sf0.001"


# ------------------------------------------------- threshold helper pins
def test_int_keep_low_threshold_exact(spark):
    from geocode_spark.textops.lm import int_keep_low_threshold

    df = spark.createDataFrame([(v,) for v in range(1, 11)], "v long")
    # keep half of 10 rows -> smallest edge covering >= 5 rows is 5
    assert int_keep_low_threshold(df, "v", keep_ppk=500, bin_width=1) == 5
    # keep everything -> edge at (or above) the max
    assert int_keep_low_threshold(df, "v", keep_ppk=1000, bin_width=1) >= 10
    # empty relation -> no threshold
    empty = df.filter("v > 100")
    assert int_keep_low_threshold(empty, "v", 500, 1) is None


def test_int_keep_low_threshold_bins_and_negatives(spark):
    from geocode_spark.textops.lm import int_keep_low_threshold

    # values -25..-21 and 21..25, width 10: bins -3 (count 5) and 2 (count 5)
    df = spark.createDataFrame(
        [(v,) for v in list(range(-25, -20)) + list(range(21, 26))], "v long"
    )
    # keeping half must stop at the negative bin's upper edge (-21 <= t < 0)
    t = int_keep_low_threshold(df, "v", keep_ppk=500, bin_width=10)
    assert t == -21
    got = df.filter(f"v <= {t}").count()
    assert got == 5


# ------------------------------------------------------------- end to end
@pytest.mark.slow
def test_select_job_end_to_end(spark, tmp_path):
    zip_path = str(tmp_path / "geocode_spark.zip")
    _build_pyfiles_zip(zip_path)

    def run(out):
        cmd = [
            _spark_submit(), "--master", "local[4]",
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--py-files", zip_path,
            os.path.join(REPO, "jobs", "select_job.py"),
            "--documents", f"{SF_DIR}/documents.parquet",
            "--output", out, "--batches", "3",
        ]
        env = {**os.environ, "PYSPARK_PYTHON": sys.executable,
               "PYSPARK_DRIVER_PYTHON": sys.executable}
        proc = subprocess.run(cmd, capture_output=True, text=True,
                              timeout=600, env=env)
        assert proc.returncode == 0, proc.stderr[-3000:]
        summary = json.loads(
            [ln for ln in proc.stdout.splitlines() if ln.startswith("{")][-1]
        )
        return summary

    out1 = str(tmp_path / "sel1")
    s = run(out1)
    assert s["status"] == "ok"
    assert s["docs_in"] == 500
    # stage accounting must tie out exactly
    assert (
        s["span_dedup_dropped"] + s["lm_tail_dropped"]
        + s["dsir_not_selected"] + s["docs_out"] == s["docs_in"]
    )
    # every stage has real effect on this corpus, and something survives
    assert 0 < s["docs_out"] < s["docs_in"]
    assert s["lm_tail_dropped"] > 0
    assert s["dsir_not_selected"] > 0

    got = spark.read.parquet(f"{out1}/selected")
    assert got.count() == s["docs_out"]
    # selected docs are a subset of the input corpus and carry rewritten text
    src = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    assert got.join(src.select("doc_id"), "doc_id").count() == s["docs_out"]
    assert got.filter("text = ''").count() == 0

    # the rewrite reduced cross-doc span duplication on the shipped corpus
    from geocode_spark.textops.spans import span_dup_stats

    def dup_frac(df):
        from pyspark.sql import functions as F

        r = span_dup_stats(df).agg(
            F.sum("dup_windows").alias("d"), F.sum("n_windows").alias("n")
        ).collect()[0]
        return (r.d or 0) / max(r.n or 0, 1)

    f_in = dup_frac(src)
    assert f_in > 0  # the input corpus genuinely has cross-doc spans
    assert dup_frac(got) < f_in

    # determinism: a second run selects the identical document set
    out2 = str(tmp_path / "sel2")
    s2 = run(out2)
    ids1 = sorted(r.doc_id for r in got.select("doc_id").collect())
    ids2 = sorted(
        r.doc_id
        for r in spark.read.parquet(f"{out2}/selected")
        .select("doc_id").collect()
    )
    assert ids1 == ids2 and s2["docs_out"] == s["docs_out"]
