"""End-to-end spark-submit run of the mobility job: trip segmentation ->
OD matrix / dwell runs / bearing histogram, verified against the
in-process operators over the same track table."""

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
def test_mobility_job_end_to_end(spark, tmp_path):
    import __spark_entry__ as entrymod
    from geocode_spark.operators.spatial import (
        bearing_histogram,
        od_matrix,
        synthetic_tracks,
        track_segments,
    )

    tracks = synthetic_tracks(entrymod._success_points(spark, SF_DIR))
    tracks_path = str(tmp_path / "tracks.parquet")
    tracks.write.mode("overwrite").parquet(tracks_path)

    zip_path = str(tmp_path / "geocode_spark.zip")
    _build_pyfiles_zip(zip_path)
    out = str(tmp_path / "mobility_out")

    cmd = [
        _spark_submit(), "--master", "local[4]",
        "--conf", "spark.ui.enabled=false",
        "--conf", "spark.sql.shuffle.partitions=8",
        "--py-files", zip_path,
        os.path.join(REPO, "jobs", "mobility_job.py"),
        "--tracks", tracks_path,
        "--output", out,
    ]
    env = {**os.environ, "PYSPARK_PYTHON": sys.executable,
           "PYSPARK_DRIVER_PYTHON": sys.executable}
    proc = subprocess.run(cmd, capture_output=True, text=True, timeout=600,
                          env=env, cwd=str(tmp_path))
    assert proc.returncode == 0, proc.stderr[-4000:]
    summary = json.loads(proc.stdout.strip().splitlines()[-1])
    assert summary["status"] == "ok"

    # cross-check the job's accounting against the in-process operators
    df = spark.read.parquet(tracks_path)
    segs = track_segments(df).toPandas()
    assert summary["trips"] == len(segs)
    assert summary["total_path_km"] == round(
        int(segs["len_mm"].sum()) / 1e6, 3
    )
    assert summary["od_cells"] == od_matrix(df).count()
    assert summary["octants_seen"] == bearing_histogram(df).count()
    assert summary["fixes_in"] == df.count()

    # the partitioned OD output reads back with the partition column intact
    od_back = spark.read.parquet(f"{out}/od_matrix")
    assert "o_cx" in od_back.columns
    assert od_back.count() == summary["od_cells"]
