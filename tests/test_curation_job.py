"""End-to-end spark-submit run of the curation job: decontaminate ->
repetition filter -> PII redact -> staged resumable write, verified against
the in-process operators."""

import json
import os
import subprocess
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from test_corpus_job import _build_pyfiles_zip, _spark_submit

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = "/root/testdata/sf0.001"


@pytest.mark.slow
def test_curation_job_end_to_end(spark, tmp_path):
    from pyspark.sql import functions as F

    from geocode_spark.textops.corpusops import decontaminate, doc_repetition

    zip_path = str(tmp_path / "geocode_spark.zip")
    _build_pyfiles_zip(zip_path)
    out = str(tmp_path / "curated_out")

    cmd = [
        _spark_submit(), "--master", "local[4]",
        "--conf", "spark.ui.enabled=false",
        "--conf", "spark.sql.shuffle.partitions=8",
        "--py-files", zip_path,
        os.path.join(REPO, "jobs", "curation_job.py"),
        "--documents", f"{SF_DIR}/documents.parquet",
        "--output", out, "--batches", "3", "--resume",
    ]
    env = {**os.environ, "PYSPARK_PYTHON": sys.executable,
           "PYSPARK_DRIVER_PYTHON": sys.executable}
    proc = subprocess.run(cmd, capture_output=True, text=True, timeout=600,
                          env=env, cwd=str(tmp_path))
    assert proc.returncode == 0, proc.stderr[-4000:]
    summary = json.loads(proc.stdout.strip().splitlines()[-1])
    assert summary["status"] == "ok"

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    # cross-check the job's accounting against the in-process operators
    decon = decontaminate(docs).toPandas()
    assert summary["contaminated_dropped"] == int(decon["is_contaminated"].sum())
    rep = doc_repetition(docs).toPandas()
    assert summary["repetitive_dropped"] == int((rep["repetition_ratio"] > 0.5).sum())
    assert summary["docs_in"] == docs.count()
    # survivors: non-benchmark, uncontaminated, non-repetitive
    expect_out = len(
        set(decon[decon["is_contaminated"] == 0]["doc_id"])
        & set(rep[rep["repetition_ratio"] <= 0.5]["doc_id"])
    )
    assert summary["docs_out"] == expect_out

    # the curated output carries redacted text + audit columns, and the
    # staged layout enables pruned resume (ledger complete)
    curated = spark.read.parquet(f"{out}/curated")
    assert {"n_emails", "n_phones"} <= set(curated.columns)
    assert curated.count() == expect_out
    ledger = os.listdir(f"{out}/curated/_ledger")
    assert len([f for f in ledger if f.endswith(".json")]) == 3
