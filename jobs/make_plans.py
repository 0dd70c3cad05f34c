"""Regenerate the committed physical-plan snapshots (bench_out/plans/).

    python jobs/make_plans.py [--out bench_out/plans] [--sf-dir ...]

Run after any deliberate plan-shape change, commit the diff, and let
tests/test_plan_snapshots.py pin the new shape.  See
ukrainian_ocr_pipeline_spark/plans/snapshot.py for what a signature
captures and why.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="plan-snapshot generator")
    p.add_argument("--out", default="bench_out/plans")
    p.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    p.add_argument("--master", default=None)
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession

    from ukrainian_ocr_pipeline_spark.plans.snapshot import write_snapshots
    from ukrainian_ocr_pipeline_spark.sources.session import get_spark

    existing = SparkSession.getActiveSession()
    spark = existing or get_spark(app="make-plans", master=args.master)
    try:
        sigs = write_snapshots(spark, args.out, sf_dir=args.sf_dir)
        print(json.dumps({"queries": len(sigs), "out": args.out}))
    finally:
        if existing is None:
            spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
