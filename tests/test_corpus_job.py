"""End-to-end spark-submit run of the corpus dedup job: pairs -> clusters ->
canonical corpus, verified against the in-process operators."""

import json
import os
import shutil
import subprocess
import sys
import zipfile

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = "/root/testdata/sf0.001"


def _build_pyfiles_zip(path: str) -> None:
    with zipfile.ZipFile(path, "w") as z:
        pkg = os.path.join(REPO, "geocode_spark")
        for root, _dirs, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))


def _spark_submit() -> str:
    found = shutil.which("spark-submit")
    if found:
        return found
    import pyspark

    return os.path.join(pyspark.__path__[0], "bin", "spark-submit")


@pytest.mark.slow
def test_corpus_job_end_to_end(spark, tmp_path):
    from pyspark.sql import functions as F

    from geocode_spark.textops.dedup import near_dup_corpus

    # give the job a corpus that actually contains near-duplicates
    docs_path = str(tmp_path / "docs.parquet")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    corpus = near_dup_corpus(docs).join(
        docs.select("doc_id", "lang"), "doc_id", "left"
    ).withColumn("lang", F.coalesce("lang", F.lit("en")))
    corpus.write.mode("overwrite").parquet(docs_path)
    n_in = corpus.count()

    zip_path = str(tmp_path / "geocode_spark.zip")
    _build_pyfiles_zip(zip_path)
    out = str(tmp_path / "corpus_out")

    cmd = [
        _spark_submit(), "--master", "local[4]",
        "--conf", "spark.ui.enabled=false",
        "--conf", "spark.sql.shuffle.partitions=8",
        "--py-files", zip_path,
        os.path.join(REPO, "jobs", "corpus_job.py"),
        "--documents", docs_path,
        "--output", out, "--threshold", "0.8", "--stats",
    ]
    env = {**os.environ, "PYSPARK_PYTHON": sys.executable,
           "PYSPARK_DRIVER_PYTHON": sys.executable}
    proc = subprocess.run(cmd, capture_output=True, text=True, timeout=600,
                          env=env, cwd=str(tmp_path))
    assert proc.returncode == 0, proc.stderr[-4000:]
    summary = json.loads(proc.stdout.strip().splitlines()[-1])
    assert summary["status"] == "ok"
    assert summary["docs_in"] == n_in
    assert summary["near_dup_pairs"] > 0
    assert summary["docs_out"] < n_in           # duplicates were removed
    assert summary["docs_out"] == summary["clusters"]

    # canonical = exactly the min-id survivor of each cluster
    clusters = spark.read.parquet(f"{out}/clusters")
    canonical = spark.read.parquet(f"{out}/canonical")
    assert canonical.count() == summary["docs_out"]
    surv = set(r.doc_id for r in canonical.select("doc_id").collect())
    want = set(
        r.cluster_id for r in clusters.select("cluster_id").distinct().collect()
    )
    assert surv == want

    # stats stage wrote per-language quantiles over the canonical set
    stats = spark.read.parquet(f"{out}/stats")
    assert stats.count() > 0 and "p99" in stats.columns

    # canonical went through the resumable batcher: full ledger + batch dirs
    from geocode_spark.batching import completed_batches

    assert completed_batches(f"{out}/canonical") == set(range(8))
    assert os.path.isdir(f"{out}/canonical/batch_id=0")
