"""Ad-hoc single-query oracle check: `python scripts/check_query.py q1 q2 ...`

Runs the same Spark-vs-DuckDB compare as driver_sim.py, but only for the
named queries() keys — the fast feedback loop while developing an operator.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

from compare_util import duck_to_pdf, vhash

SF = os.environ.get("CHECK_SF_DIR", "/root/testdata/sf0.01")


def main(names):
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("check-query")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as mod

    qs, osql = mod.queries(), mod.oracle_sql()
    bad = 0
    for name in names:
        t0 = time.perf_counter()
        spdf = qs[name](spark, SF).toPandas()
        if name not in osql:
            print(f"rows-only {name}: {len(spdf)} rows")
            continue
        opdf = duck_to_pdf(osql[name], SF)
        ok = (
            len(spdf) == len(opdf)
            and sorted(spdf.columns) == sorted(opdf.columns)
            and vhash(spdf) == vhash(opdf)
        )
        bad += not ok
        print(
            f"{'OK ' if ok else 'MISMATCH'} {name}: spark={len(spdf)} "
            f"oracle={len(opdf)} cols={sorted(spdf.columns)} vs "
            f"{sorted(opdf.columns)} {time.perf_counter()-t0:.1f}s"
        )
        if not ok and len(spdf) and len(opdf):
            print("spark head:\n", spdf.head(5))
            print("oracle head:\n", opdf.head(5))
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main(sys.argv[1:])
