"""Whole-stage-codegen health gate (round-3 verdict item #2).

The TM-projection family (Snyder inverse series) and the dhash family
(60-bit gradient sum) used to inline subterms into single expressions whose
generated Java exceeded janino's 64 KB method limit: Spark logged
`ERROR CodeGenerator: Failed to compile the generated Java code` and fell
back to interpreted evaluation — correct results, but interpreted per-row
cost at 100x scale. Both families now stage their subterms as real columns
(projection.stage_utm_to_wgs84, multimodal._dhash_sample_array).

The check runs in a SUBPROCESS: CodeGenerator caches compiled (and failed)
source per generated text, so within a long-lived test session a prior
compile of the same plan would swallow the ERROR log and turn an in-session
capture into a false pass. A fresh JVM guarantees first-compile logging;
fd-level stderr capture sees the log4j console appender directly.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_PROBE = r"""
import sys
sys.path[:0] = [%(repo)r, %(repo)r + "/tests"]
from geocode_spark.session import get_spark
import __spark_entry__ as e

spark = get_spark("codegen-gate", parallelism=4, shuffle_partitions=4,
                  small_input=True)
spark.sparkContext.setLogLevel("ERROR")
qs = e.queries()
for name in ("geocode_wgs84", "utm_wgs84_roundtrip", "image_bytehash",
             "image_hash_pairs", "bigram_lm_score", "bpe_pair_stats",
             "span_dup_stats", "span_dedup_rewrite",
             "winnow_fingerprints", "bbox_zrange_query"):
    n = qs[name](spark, %(sf)r).count()
    print(f"DONE {name} {n}", flush=True)
"""


def test_codegen_compiles_projection_and_dhash_families(sf_dir):
    env = dict(os.environ)
    env["PYTHONPATH"] = f"{REPO}:{REPO}/tests"
    proc = subprocess.run(
        [sys.executable, "-c", _PROBE % {"repo": REPO, "sf": sf_dir}],
        capture_output=True, text=True, timeout=600, env=env,
    )
    out, err = proc.stdout, proc.stderr
    assert proc.returncode == 0, f"probe failed:\n{err[-3000:]}"
    for name in ("geocode_wgs84", "utm_wgs84_roundtrip", "image_bytehash",
                 "image_hash_pairs", "bigram_lm_score", "bpe_pair_stats",
                 "span_dup_stats", "span_dedup_rewrite",
                 "winnow_fingerprints", "bbox_zrange_query"):
        assert f"DONE {name} " in out, f"{name} did not complete:\n{out}"
    for marker in ("Failed to compile", "grows beyond 64 KB"):
        assert marker not in err, (
            "whole-stage codegen compile failure detected:\n"
            + "\n".join(
                ln for ln in err.splitlines() if "CodeGenerator" in ln
            )[:2000]
        )
