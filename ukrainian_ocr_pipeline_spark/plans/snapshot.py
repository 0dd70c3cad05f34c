"""Physical-plan snapshots for the most expensive headline queries.

A wall-time regression tells you a plan got worse AFTER you paid for
it; a plan-shape diff tells you at review time.  jobs/make_plans.py
writes, for each query in TOP_QUERIES, the full EXPLAIN FORMATTED
output (for humans/judges) plus a SHAPE SIGNATURE — the counts of the
scale-critical node kinds (exchanges, join strategies, Python
boundaries, global sorts, cache scans).  tests/test_plan_snapshots.py
regenerates the signature per run and diffs it against the committed
one, so a 100x-scale-relevant plan change (a broadcast join silently
becoming sort-merge, an extra shuffle, a Python stage appearing in a
JVM-only query) fails CI instead of surfacing as a slow bench three
rounds later.

Signatures count node KINDS only — expression IDs, codegen stage ids,
and statistics vary run-to-run and are excluded by construction.
"""

from __future__ import annotations

import contextlib
import io
import json
import os
import re

# the persistently-expensive headline set (r03 bench walls) plus the
# queries whose shape regressed before (banded-mat, hybrid RRF).
# Eagerly-materializing queries are deliberately ABSENT:
# graph_pagerank / semantic_dedup run their iterative cores behind
# localCheckpoint and cdx_shard_boundaries is a two-pass driver-built
# frame, so explain() shows only a bare post-materialization scan — an
# empty signature that pins nothing while still paying the full job per
# regeneration (review finding); their shapes are pinned by dedicated
# tests instead (tests/test_graphrank.py for pagerank,
# tests/test_plans.py for semantic_dedup, tests/test_warc.py for the
# cdx boundary arithmetic).
TOP_QUERIES = [
    "dedup_embedding_cosine_banded_mat",
    "hll_distinct_parts",
    "dedup_cluster_best_keeper",
    "dedup_cluster_assign_star",
    "doc_winnow_fingerprints",
    "winnow_dup_candidates",
    "hybrid_search_rrf",
    "doc_fingerprints",
    "dedup_near_dup_verified",
    "dup_passage_excise",
    "url_host_blocklist",
]

# node kinds whose count is scale-critical; keys are display names,
# values the regex matched against '(n) Name' detail headers
_SHAPE_NODES = {
    # plain word: detail headers are '(n) Exchange'; BroadcastExchange
    # starts with 'Broadcast' so it can't collide at the anchor
    "Exchange": r"Exchange",
    "BroadcastExchange": r"BroadcastExchange",
    "BroadcastHashJoin": r"BroadcastHashJoin",
    "SortMergeJoin": r"SortMergeJoin",
    "ShuffledHashJoin": r"ShuffledHashJoin",
    "BroadcastNestedLoopJoin": r"BroadcastNestedLoopJoin",
    "CartesianProduct": r"CartesianProduct",
    "ArrowEvalPython": r"ArrowEvalPython",
    "BatchEvalPython": r"BatchEvalPython",
    "FlatMapGroupsInPandas": r"FlatMapGroupsInPandas",
    "MapInPandas": r"MapInPandas",
    "PythonMapInArrow": r"(?:PythonMapInArrow|MapInArrow)",
    "TakeOrderedAndProject": r"TakeOrderedAndProject",
    "WindowNode": r"Window(?!GroupLimit)",
    "Sort": r"Sort(?!MergeJoin|Aggregate)",
    "InMemoryTableScan": r"InMemoryTableScan",
    "HashAggregate": r"HashAggregate",
    "ObjectHashAggregate": r"ObjectHashAggregate",
    "SortAggregate": r"SortAggregate",
    "Generate": r"Generate",
}


def plan_text(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def plan_signature(plan: str) -> dict:
    """Counts of scale-critical physical node kinds, keyed by display
    name; zero-count kinds omitted so signatures read as the plan's
    shape, not a matrix of zeros."""
    sig = {}
    for name, pat in _SHAPE_NODES.items():
        n = len(re.findall(rf"^\(\d+\) (?:{pat})", plan, flags=re.M))
        if n:
            sig[name] = n
    return sig


def write_snapshots(spark, out_dir: str,
                    sf_dir: str = "/root/testdata/sf0.001",
                    queries: list[str] | None = None) -> dict:
    """Write <name>.plan.txt + a combined signatures.json; returns the
    signature dict."""
    from .registry import QUERIES

    os.makedirs(out_dir, exist_ok=True)
    sigs = {}
    for name in queries or TOP_QUERIES:
        text = plan_text(QUERIES[name](spark, sf_dir))
        with open(os.path.join(out_dir, f"{name}.plan.txt"), "w") as fh:
            fh.write(text)
        sigs[name] = plan_signature(text)
    with open(os.path.join(out_dir, "signatures.json"), "w") as fh:
        json.dump(sigs, fh, indent=1, sort_keys=True)
        fh.write("\n")
    return sigs
