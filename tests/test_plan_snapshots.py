"""Committed plan-shape snapshots (bench_out/plans/signatures.json) vs
freshly-generated plans: a scale-relevant plan regression — an extra
exchange, a broadcast join degrading to sort-merge, a Python stage
appearing in a JVM-only query — fails here at review time instead of
surfacing as a slow bench rounds later.  Regenerate deliberately with
`python jobs/make_plans.py` and commit the diff."""

import json
import os

import pytest

SNAP = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "bench_out", "plans", "signatures.json")

with open(SNAP) as fh:
    COMMITTED = json.load(fh)


def test_snapshot_covers_the_top_query_set():
    from ukrainian_ocr_pipeline_spark.plans.snapshot import TOP_QUERIES
    assert sorted(COMMITTED) == sorted(TOP_QUERIES)


@pytest.mark.parametrize("name", sorted(COMMITTED))
def test_plan_shape_matches_committed_snapshot(spark, name):
    from ukrainian_ocr_pipeline_spark.plans.registry import QUERIES
    from ukrainian_ocr_pipeline_spark.plans.snapshot import (
        plan_signature,
        plan_text,
    )
    got = plan_signature(plan_text(QUERIES[name](
        spark, "/root/testdata/sf0.001")))
    assert got == COMMITTED[name], (
        f"{name}: plan shape drifted from the committed snapshot.\n"
        f"committed: {COMMITTED[name]}\n"
        f"current:   {got}\n"
        "If the change is deliberate, regenerate with "
        "`python jobs/make_plans.py` and commit.")
