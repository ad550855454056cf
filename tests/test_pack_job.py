"""End-to-end spark-submit run of the sequence-pack job: boilerplate strip
-> epoch shuffle -> greedy pack -> shard write + manifest, verified against
the in-process operators and trainer-facing invariants."""

import json
import os
import subprocess
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from test_corpus_job import _build_pyfiles_zip, _spark_submit

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = "/root/testdata/sf0.001"
CONTEXT = 64


def _run(tmp_path, out_name, epoch):
    zip_path = str(tmp_path / "geocode_spark.zip")
    if not os.path.exists(zip_path):
        _build_pyfiles_zip(zip_path)
    out = str(tmp_path / out_name)
    cmd = [
        _spark_submit(), "--master", "local[4]",
        "--conf", "spark.ui.enabled=false",
        "--conf", "spark.sql.shuffle.partitions=8",
        "--py-files", zip_path,
        os.path.join(REPO, "jobs", "pack_job.py"),
        "--documents", f"{SF_DIR}/documents.parquet",
        "--output", out, "--epoch", str(epoch),
        "--shards", "4", "--context-len", str(CONTEXT), "--min-df", "5",
    ]
    env = {**os.environ, "PYSPARK_PYTHON": sys.executable,
           "PYSPARK_DRIVER_PYTHON": sys.executable}
    proc = subprocess.run(cmd, capture_output=True, text=True, timeout=600,
                          env=env, cwd=str(tmp_path))
    assert proc.returncode == 0, proc.stderr[-4000:]
    return out, json.loads(proc.stdout.strip().splitlines()[-1])


@pytest.mark.slow
def test_pack_job_end_to_end(spark, tmp_path):
    import pandas as pd
    from pyspark.sql import functions as F

    from geocode_spark.textops.lineops import strip_boilerplate

    out, summary = _run(tmp_path, "epoch0", epoch=0)
    assert summary["status"] == "ok"

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    # accounting vs the in-process operator: docs surviving the strip
    survivors = (
        strip_boilerplate(docs, min_df=5)
        .filter(F.length("clean_text") > 0).count()
    )
    assert summary["docs_packed"] == survivors
    assert summary["docs_in"] == docs.count()

    shards = spark.read.parquet(f"{out}/shards").toPandas()
    manifest = json.load(open(f"{out}/manifest.json"))
    assert summary["docs_packed"] == len(shards)

    # manifest totals match the shard files
    per = shards.groupby("shard").agg(
        n_docs=("doc_id", "count"), n_tokens=("tok_count", "sum"),
        n_seqs=("seq_idx", lambda s: int(s.max()) + 1),
    )
    for m in manifest["shards"]:
        row = per.loc[m["shard"]]
        assert (m["n_docs"], m["n_seqs"], m["n_tokens"]) == (
            row["n_docs"], row["n_seqs"], row["n_tokens"])

    # trainer invariants per shard: seq_idx dense & monotone in shard_pos
    # order, fill never exceeds context_len unless a single oversize doc
    for shard, g in shards.groupby("shard"):
        g = g.sort_values("shard_pos")
        seqs = g["seq_idx"].to_numpy()
        assert (pd.Series(seqs).diff().dropna() >= 0).all()
        fills = g.groupby("seq_idx").agg(
            fill=("tok_count", "sum"), n=("doc_id", "count"))
        over = fills[fills["fill"] > CONTEXT]
        assert (over["n"] == 1).all()


@pytest.mark.slow
def test_pack_job_epochs_reshuffle_deterministically(spark, tmp_path):
    out_a, _ = _run(tmp_path, "epochA", epoch=1)
    out_b, _ = _run(tmp_path, "epochB", epoch=1)
    out_c, _ = _run(tmp_path, "epochC", epoch=2)
    key = ["doc_id", "shard", "shard_pos", "seq_idx"]
    a = spark.read.parquet(f"{out_a}/shards").select(key).toPandas() \
        .sort_values("doc_id").reset_index(drop=True)
    b = spark.read.parquet(f"{out_b}/shards").select(key).toPandas() \
        .sort_values("doc_id").reset_index(drop=True)
    c = spark.read.parquet(f"{out_c}/shards").select(key).toPandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)          # same epoch -> byte-identical plan
    assert not a.equals(c)      # different epoch -> different permutation
