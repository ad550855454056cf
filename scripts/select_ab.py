"""Per-op A/B for the LM-selection scaling protocol: wall time of each of
the three pipeline ops separately at two parallelism levels."""
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

PROBE = r'''
import sys, time, json
sys.path.insert(0, %(repo)r)
from bench import _session, _scaled_docs, _force_full, SELECT_SCALE_REPL, SELECT_SCALE_PARTITIONS, SF_DIR
cpus = int(sys.argv[1]); op = sys.argv[2]
spark = _session(cpus, f"select-ab-{cpus}-{op}")
spark.conf.set("spark.sql.shuffle.partitions", str(SELECT_SCALE_PARTITIONS))
spark.sparkContext.setLogLevel("ERROR")
from geocode_spark.textops.lm import bigram_lm_score, dsir_log_ratio
from geocode_spark.textops.spans import span_dedup_rewrite
from geocode_spark.caching import clear_caches
fns = {"span": span_dedup_rewrite, "bigram": bigram_lm_score, "dsir": dsir_log_ratio}
docs = _scaled_docs(spark, SF_DIR, SELECT_SCALE_REPL, partitions=SELECT_SCALE_PARTITIONS)
docs.count()
fn = fns[op]
_force_full(fn(docs)); clear_caches(blocking=True)
best = float("inf")
for _ in range(2):
    t0 = time.perf_counter(); _force_full(fn(docs))
    best = min(best, time.perf_counter() - t0)
    clear_caches(blocking=True)
print(json.dumps({"op": op, "cpus": cpus, "sec": round(best, 3)}))
spark.stop()
'''

results = []
for op in sys.argv[1:] or ["span", "bigram", "dsir"]:
    for cpus in (4, 16):
        env = dict(os.environ); env["PYTHONPATH"] = REPO
        p = subprocess.run(
            [sys.executable, "-c", PROBE % {"repo": REPO}, str(cpus), op],
            capture_output=True, text=True, timeout=900, env=env)
        assert p.returncode == 0, p.stderr[-2000:]
        rec = json.loads(p.stdout.strip().splitlines()[-1])
        results.append(rec)
        print(rec, flush=True)
for op in {r["op"] for r in results}:
    lo = next(r["sec"] for r in results if r["op"] == op and r["cpus"] == 4)
    hi = next(r["sec"] for r in results if r["op"] == op and r["cpus"] == 16)
    print(f"{op}: {lo}s -> {hi}s speedup {lo/hi:.2f}x eff {lo/hi/4:.3f}")
