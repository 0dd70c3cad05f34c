"""One-off Spark-vs-DuckDB oracle sweep over a named query subset.

    python jobs/oracle_sweep.py --sf-dir /tmp/sf0.3 \
        --names q1,q2,... [--out bench_out/oracle_sweep.json]

Runs each registry query in Spark and its oracle_sql() twin in DuckDB
on the same parquet dir, compares row count, column names and values
with the SAME normalization as tests/test_queries_oracle.py, and writes
a JSON artifact.  Used for the beyond-tri-scale sweeps (VERDICT r3
'Next round' #7) where the per-round pytest mirror would be too slow to
run for every query at every scale.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def compare(spark, ddb, queries, oracles, name, sf_dir) -> dict:
    from ukrainian_ocr_pipeline_spark.oraclecompare import (
        normalize_frame,
        values_equal,
    )
    got = normalize_frame(queries[name](spark, sf_dir).toPandas())
    want = normalize_frame(ddb.execute(oracles[name]).df())
    res = {"rows": len(got), "oracle_rows": len(want),
           "columns_match": list(got.columns) == list(want.columns),
           "rows_match": len(got) == len(want), "values_match": None}
    if res["columns_match"] and res["rows_match"]:
        res["values_match"] = values_equal(got, want)
    return res


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="oracle sweep")
    p.add_argument("--sf-dir", required=True)
    p.add_argument("--names", required=True,
                   help="comma-separated query names, or @file with one "
                        "name per line")
    p.add_argument("--out", default=None)
    p.add_argument("--master", default=None)
    args = p.parse_args(argv)

    if args.names.startswith("@"):
        with open(args.names[1:]) as fh:
            names = [ln.strip() for ln in fh if ln.strip()]
    else:
        names = [n for n in args.names.split(",") if n]

    import duckdb

    import __spark_entry__ as em
    from pyspark.sql import SparkSession

    from ukrainian_ocr_pipeline_spark.sources.session import get_spark

    queries, oracles = em.queries(), em.oracle_sql()
    unknown = [n for n in names if n not in oracles]
    if unknown:
        p.error(f"no oracle for: {unknown}")

    existing = SparkSession.getActiveSession()
    spark = existing or get_spark(app="oracle-sweep", master=args.master)
    from ukrainian_ocr_pipeline_spark.oraclecompare import register_views

    ddb = duckdb.connect()
    register_views(ddb, args.sf_dir)
    results = {}
    n_fail = 0
    try:
        for n in names:
            try:
                results[n] = compare(spark, ddb, queries, oracles, n,
                                     args.sf_dir)
            except Exception as e:  # record, keep sweeping
                results[n] = {"error": f"{type(e).__name__}: {e}"[:500]}
            ok = results[n].get("values_match") is True
            if not ok:
                n_fail += 1
            print(f"  {n}: {'OK' if ok else results[n]}", file=sys.stderr)
    finally:
        if existing is None:
            spark.stop()
    artifact = {"sf_dir": args.sf_dir, "queries": len(names),
                "failed": n_fail, "results": results}
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(artifact, fh, indent=1, sort_keys=True)
            fh.write("\n")
    print(json.dumps({"sf_dir": args.sf_dir, "queries": len(names),
                      "failed": n_fail, "out": args.out}))
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
