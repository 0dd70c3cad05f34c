"""Unit tests for operators/graphrank.pagerank: semantics pinned on
tiny hand-checkable graphs against an independent pure-Python power
iteration, including the dangling-mass path that the registry query's
symmetric graph can never exercise (same lesson as the as-of-join
tie-break tests: corpus-invisible branches need synthetic rows)."""

import math

from pyspark.sql import functions as F

from ukrainian_ocr_pipeline_spark.operators import graphrank


def _py_pagerank(edges, d=0.85, n_iter=6):
    """Independent oracle: dict-based power iteration, same formula."""
    nodes = sorted({s for s, _, _ in edges} | {t for _, t, _ in edges})
    n = len(nodes)
    outw = {}
    for s, _, w in edges:
        outw[s] = outw.get(s, 0.0) + w
    pr = {v: 1.0 / n for v in nodes}
    for _ in range(n_iter):
        contrib = {v: 0.0 for v in nodes}
        for s, t, w in edges:
            contrib[t] += pr[s] * (w / outw[s])
        dm = sum(pr[v] for v in nodes if v not in outw)
        pr = {v: (1 - d) / n + d * (contrib[v] + dm / n) for v in nodes}
    return pr


def _run(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src long, dst long, weight double")
    got = {r.node: r.pr_rank for r in graphrank.pagerank(df, **kw).collect()}
    want = _py_pagerank(edges, **kw)
    assert set(got) == set(want)
    for v in want:
        assert math.isclose(got[v], want[v], rel_tol=0, abs_tol=1e-12), (
            v, got[v], want[v])
    return got


def test_weighted_triangle_matches_python_oracle(spark):
    # asymmetric weights: 1 favours 2 heavily over 3
    edges = [(1, 2, 9.0), (1, 3, 1.0), (2, 3, 1.0), (3, 1, 1.0)]
    got = _run(spark, edges)
    # every node has out-edges -> total rank conserved
    assert math.isclose(sum(got.values()), 1.0, abs_tol=1e-9)


def test_dangling_mass_redistributed_and_conserved(spark):
    # node 3 has NO out-edges: its rank must be redistributed uniformly,
    # not leaked (sum would decay toward (1-d) without redistribution)
    edges = [(1, 2, 1.0), (2, 3, 1.0)]
    got = _run(spark, edges)
    assert math.isclose(sum(got.values()), 1.0, abs_tol=1e-9)
    # 3 is the only sink fed by a dedicated chain -> highest rank
    assert got[3] > got[2] > 0


def test_disconnected_components_and_self_normalization(spark):
    # two disjoint symmetric pairs: uniform stationary ranks by symmetry
    edges = [(1, 2, 1.0), (2, 1, 1.0), (10, 11, 5.0), (11, 10, 5.0)]
    got = _run(spark, edges)
    assert math.isclose(got[1], 0.25, abs_tol=1e-12)
    assert math.isclose(got[10], 0.25, abs_tol=1e-12)


def test_empty_edges(spark):
    df = spark.createDataFrame([], "src long, dst long, weight double")
    assert graphrank.pagerank(df).count() == 0


def test_iteration_loop_stays_jvm_side(spark):
    """The per-iteration join/agg plan must contain no Python workers."""
    edges = spark.createDataFrame([(1, 2, 1.0), (2, 1, 1.0)],
                                  "src long, dst long, weight double")
    plan = (graphrank.pagerank(edges, n_iter=1)
            ._jdf.queryExecution().executedPlan().toString())
    assert "EvalPython" not in plan


def test_null_endpoints_dropped_mass_conserved(spark):
    """A NULL endpoint (unresolvable crawl edge, failed id cast) must
    be dropped at ingest — if it entered the node set it would join
    nothing (null keys never equal), vanish from ranks after round 1,
    and leak its share of the total mass."""
    df = spark.createDataFrame(
        [(1, 2, 1.0), (2, 1, 1.0), (None, 1, 1.0), (2, None, 3.0)],
        "src long, dst long, weight double")
    got = {r.node: r.pr_rank for r in graphrank.pagerank(df).collect()}
    # NULL never appears as a node; mass over the real nodes sums to 1
    assert set(got) == {1, 2}
    assert math.isclose(sum(got.values()), 1.0, abs_tol=1e-9)
