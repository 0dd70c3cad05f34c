"""Recall pin for the banded embedding LSH (similarity.py): on a
clustered corpus the multi-band variant must recover ~all true near-dup
pairs, while the single-signature variant provably drops pairs that
straddle one hyperplane (the round-1 VERDICT's recall-cliff finding)."""

import hashlib
import math

import pytest

DIM = 64
N_CLUSTERS = 24
PER_CLUSTER = 4
THRESH = 0.95


def _unit(vals):
    n = math.sqrt(sum(v * v for v in vals))
    return [v / n for v in vals]


def _h(s: str, lo: float = -0.5, hi: float = 0.5) -> float:
    """Deterministic pseudo-random in [lo, hi) from md5 — no RNG state."""
    x = int(hashlib.md5(s.encode()).hexdigest()[:8], 16) / 2**32
    return lo + x * (hi - lo)


def _clustered_vectors():
    """N_CLUSTERS centers, PER_CLUSTER members each: member = center +
    small deterministic perturbation, so within-cluster cosine ~0.99 and
    across-cluster cosine ~0 (random 64-dim directions)."""
    rows = []
    vid = 0
    for c in range(N_CLUSTERS):
        center = _unit([_h(f"c{c}:{i}") for i in range(DIM)])
        for m in range(PER_CLUSTER):
            noise = [_h(f"n{c}:{m}:{i}", -0.02, 0.02) for i in range(DIM)]
            vec = _unit([a + b for a, b in zip(center, noise)])
            rows.append((vid, [float(v) for v in vec]))
            vid += 1
    return rows


@pytest.fixture(scope="module")
def emb(spark):
    return spark.createDataFrame(_clustered_vectors(),
                                 "vec_id bigint, embedding array<float>")


def _truth_pairs(rows):
    """Brute-force ground truth >= THRESH (float32-quantized like the
    Spark path reads them)."""
    import numpy as np
    vecs = np.array([r[1] for r in rows], dtype=np.float32).astype(np.float64)
    norms = np.sqrt((vecs * vecs).sum(axis=1))
    sims = (vecs @ vecs.T) / np.outer(norms, norms)
    n = len(rows)
    return {(a, b) for a in range(n) for b in range(a + 1, n)
            if round(sims[a, b], 6) >= THRESH}


def test_banded_recall_vs_single_signature(spark, emb):
    from ukrainian_ocr_pipeline_spark.operators import similarity

    truth = _truth_pairs(_clustered_vectors())
    assert len(truth) >= N_CLUSTERS * 3  # fixture really is clustered

    banded = {(r.doc_a, r.doc_b) for r in similarity.cosine_near_dup_banded(
        emb, threshold=THRESH, n_bands=8, band_planes=4).collect()}
    single = {(r.doc_a, r.doc_b) for r in similarity.cosine_near_dup_pairs(
        emb, threshold=THRESH, n_planes=4).collect()}

    # verify stage guarantees precision for both
    assert banded <= truth and single <= truth

    banded_recall = len(banded & truth) / len(truth)
    single_recall = len(single & truth) / len(truth)
    # 8 OR-ed bands: miss prob per near-dup pair ~(1-p^4)^8 << 1
    assert banded_recall >= 0.95, (banded_recall, single_recall)
    # the single 4-bit signature must show the cliff the VERDICT called
    # out (if it ever reaches ~1.0 on this fixture, the fixture stopped
    # exercising the failure mode and this test needs a harder one)
    assert single_recall < banded_recall, (banded_recall, single_recall)


def test_banded_plan_is_jvm_only_equi_join(spark, emb):
    """No Python eval, no cartesian/nested-loop join: candidates come
    from an equi-join on (band, bucket)."""
    from ukrainian_ocr_pipeline_spark.operators import similarity
    import contextlib, io
    df = similarity.cosine_near_dup_banded(emb, threshold=THRESH)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "EvalPython" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_written_signature_table_join_only_path(spark, emb, tmp_path):
    """The production write-once path: signatures written to parquet,
    dedup re-run join-only over the read-back table.  Results must be
    identical to the stateless query, and the join-only plan must
    contain ZERO signature recomputation (no folded plane constants —
    the signature subtree lives behind the parquet scan) and no
    Python."""
    from ukrainian_ocr_pipeline_spark.operators import similarity

    path = str(tmp_path / "sigs")
    similarity.write_banded_signatures(emb, path, n_bands=8, band_planes=4)
    sigs = spark.read.parquet(path)

    join_only = similarity.cosine_near_dup_banded_materialized(
        emb, threshold=THRESH, n_bands=8, band_planes=4, signatures=sigs)
    stateless = similarity.cosine_near_dup_banded(
        emb, threshold=THRESH, n_bands=8, band_planes=4)
    got = {(r.doc_a, r.doc_b, r.cosine_r) for r in join_only.collect()}
    want = {(r.doc_a, r.doc_b, r.cosine_r) for r in stateless.collect()}
    assert got == want and got

    plan = join_only._jdf.queryExecution().executedPlan().toString()
    plane0 = repr(similarity._plane_component(0, 0))
    assert plane0 not in plan, "signature subtree recomputed in join-only path"
    assert "EvalPython" not in plan
    # and the signatures genuinely come from storage
    assert plan.count("Scan parquet") >= 1, plan


def test_quantized_topk_recall_vs_float(spark):
    """int8 quantization at dim=64 perturbs cosine by ~1e-3; on the
    real sf0.001 embeddings the quantized top-5 must recover almost all
    of the float top-5 (macro recall >= 0.9) and the rank-1 neighbor
    for at least 8 of 10 queries — if quantization were wired wrong
    (wrong scale, truncation instead of rounding, int overflow) recall
    collapses far below this."""
    from ukrainian_ocr_pipeline_spark.operators import similarity

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    qids = list(range(10))
    exact = similarity.brute_force_topk(emb, qids, k=5).collect()
    quant = similarity.quantized_topk(emb, qids, k=5).collect()
    want = {}
    got = {}
    for r in exact:
        want.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    for r in quant:
        got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    recall = sum(len(want[q] & got[q]) / len(want[q]) for q in want) / len(want)
    assert recall >= 0.9, f"macro recall@5 {recall:.3f}"
    top1_exact = {r["query_id"]: r["neighbor_id"] for r in exact
                  if r["rank"] == 1}
    top1_quant = {r["query_id"]: r["neighbor_id"] for r in quant
                  if r["rank"] == 1}
    hits = sum(top1_exact[q] == top1_quant[q] for q in top1_exact)
    assert hits >= 8, f"top-1 agreement {hits}/10"


def test_quantize_int8_bounds_and_zero_vector(spark):
    """Quantized components stay in [-127, 127]; max-magnitude
    component maps to +-127; an all-zero vector quantizes to zeros
    (epsilon guard, no NaN/overflow)."""
    from pyspark.sql import Row

    from ukrainian_ocr_pipeline_spark.operators import similarity

    rows = [Row(vec_id=0, embedding=[0.5, -1.0, 0.25, 0.0]),
            Row(vec_id=1, embedding=[0.0, 0.0, 0.0, 0.0])]
    out = {r["vec_id"]: r["qvec"] for r in
           similarity.quantize_int8(spark.createDataFrame(rows)).collect()}
    assert out[0] == [64, -127, 32, 0]   # floor(63.5+0.5), -127, floor(31.75+.5)
    assert out[1] == [0, 0, 0, 0]


def test_semantic_dedup_is_exact_subset_of_bruteforce(spark):
    """Every SemDeDup pair must appear in the all-pairs ground truth
    with the identical rounded cosine (the cluster fence may lose
    recall — the documented tradeoff — but must never invent pairs or
    change scores)."""
    from pyspark.sql import functions as F

    from ukrainian_ocr_pipeline_spark.operators import similarity

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    got = similarity.semantic_dedup(emb, k=8, n_iter=3, threshold=0.4)
    got_pairs = {(r["vec_a"], r["vec_b"]): r["cosine_r"]
                 for r in got.collect()}
    assert got_pairs, "fixture corpus should yield within-cluster pairs"

    e = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    a = e.select(F.col("vec_id").alias("vec_a"), F.col("v").alias("va"))
    b = e.select(F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"))
    dot = similarity._dot("va", "vb")
    na = similarity._dot("va", "va")
    nb = similarity._dot("vb", "vb")
    truth = (a.crossJoin(b).where(F.col("vec_a") < F.col("vec_b"))
             .withColumn("cosine_r", F.round(dot / F.sqrt(na * nb), 6))
             .where(F.col("cosine_r") >= 0.4))
    truth_pairs = {(r["vec_a"], r["vec_b"]): r["cosine_r"]
                   for r in truth.collect()}
    for pair, cos in got_pairs.items():
        assert truth_pairs.get(pair) == cos, pair


def test_zero_norm_vector_does_not_crash_ansi(spark):
    """Under the default ANSI session 0.0/0.0 throws DIVIDE_BY_ZERO;
    every cosine site must use try_divide (NULL — matching DuckDB) so
    one all-zero embedding cannot abort an ANN job."""
    from pyspark.sql import functions as F

    from ukrainian_ocr_pipeline_spark.operators import similarity

    rows = [(0, [1.0] * DIM), (1, [0.5] * DIM), (2, [0.0] * DIM)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = similarity.brute_force_topk(emb, [0], k=3).collect()
    # zero-norm neighbor present with NULL cosine, ranked after real ones
    by_n = {r.neighbor_id: r.cosine_r for r in out}
    assert by_n[1] is not None and by_n[2] is None
    qout = similarity.quantized_topk(emb, [0], k=3).collect()
    assert {r.neighbor_id for r in qout} == {1, 2}


def test_quantize_emits_tinyint_elements(spark):
    """qvec must store int8 (1 byte/element) — the narrowness IS the
    operator's reason to exist; bigint elements would be 2x wider than
    the float32 source."""
    from ukrainian_ocr_pipeline_spark.operators import similarity

    emb = spark.createDataFrame([(0, [1.0, -0.5])],
                                "vec_id long, embedding array<double>")
    q = similarity.quantize_int8(emb)
    assert q.schema["qvec"].dataType.simpleString() == "array<tinyint>"


def test_pca_rejects_degenerate_corpus(spark):
    from ukrainian_ocr_pipeline_spark.operators import similarity

    one = spark.createDataFrame([(0, [1.0] * DIM)],
                                "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match=">= 2 vectors"):
        similarity.pca_power(one, dim=DIM)


def test_ivf_from_index_with_duplicate_codebook_vectors(spark):
    """Two IDENTICAL codebook vectors leave the higher twin's inverted
    list empty; distinct-recovery drops that centroid, but passing the
    recorded n_centroids recovers the exact frozen codebook."""
    from pyspark.sql import functions as F

    from ukrainian_ocr_pipeline_spark.operators import similarity

    n_cent = 4
    rows = [(0, [1.0] + [0.0] * (DIM - 1)),
            (1, [1.0] + [0.0] * (DIM - 1))]  # duplicate of centroid 0
    rows += [(i, _unit([_h(f"v{i}:{j}") for j in range(DIM)]))
             for i in range(2, 12)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    index = similarity.ivf_assignments(emb, n_centroids=n_cent)
    # centroid 1's list is empty (ties break to centroid 0)
    assigned = {r.centroid_id for r in index.select("centroid_id")
                .distinct().collect()}
    assert 1 not in assigned
    want = sorted(map(tuple, similarity.ivf_topk(
        emb, [5], k=3, n_centroids=n_cent).collect()))
    got = sorted(map(tuple, similarity.ivf_topk_from_index(
        index, [5], k=3, n_centroids=n_cent).collect()))
    assert got == want
