"""Similarity search over an embedding column (array<float>).

Brute-force cosine top-k as the exact baseline, and an LSH-bucketed
(random-hyperplane signature) variant as the 100 TB scale path:
brute force is O(Q x N) — fine for a broadcast query set against a
scan; the LSH variant turns it into an equi-join on signature buckets.

Dot products run as zip_with + aggregate in DOUBLE with sequential
element order — bit-identical to the DuckDB oracle's generate_series
formulation, which is what lets the correctness gate compare ranks.
"""

from __future__ import annotations

import hashlib
import threading

from pyspark.sql import DataFrame, Window, functions as F

_DOT = "aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double)), cast(0 as double), (acc, v) -> acc + v)"


def _plane_component(p: int, i: int) -> float:
    """Component i of pseudo-hyperplane p in [-0.5, 0.5): the CPython
    twin of the SQL derivation `conv(substring(md5(concat(p,':',i)), 1,
    8), 16, 10) / 2^32 - 0.5` — verified bit-exact against Spark for all
    (p, i) used here.  Shared by every signature builder so the
    hyperplane/banded formula-compatibility is one definition, not two
    copies of a template string."""
    return int(hashlib.md5(f"{p}:{i}".encode()).hexdigest()[:8], 16) / 2**32 - 0.5


def _plane_array_sql(p: int, dim: int) -> str:
    """Plane p as a constant array literal, folded on the DRIVER: the
    components depend only on (p, i), so computing them per row (dim x
    planes md5+conv calls each, twice across a self-join) is pure waste.
    repr() round-trips doubles exactly through Spark's literal parser,
    and the DuckDB oracle twins still derive the same values from md5
    independently — the correctness gate cross-checks the fold."""
    vals = ", ".join(f"{_plane_component(p, i)!r}d" for i in range(dim))
    return f"array({vals})"


def _dot(a: str, b: str):
    return F.expr(_DOT.format(a=a, b=b))


def _cosine_r(va: str, vb: str, na: str, nb: str):
    """round(dot / sqrt(na * nb), 6) with SQUARED norms carried — the
    ONE ulp-exact cosine expression the DuckDB twins mirror
    (sqrt(na) * sqrt(nb) differs in the last ulp and would leak through
    the 6-dp round on ties).  Shared by every pair-scoring tail."""
    return F.round(F.try_divide(_dot(va, vb),
                                F.sqrt(F.col(na) * F.col(nb))), 6)


def with_norm(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    return emb.withColumn("norm", F.sqrt(_dot(vec_col, vec_col)))


def brute_force_topk(emb: DataFrame, query_ids: list[int], k: int = 5,
                     id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact cosine top-k: broadcast the (small) query set against the
    full embedding scan — one broadcast join, no shuffle of the big side,
    then a per-query top-k window.

    Cosine is rounded to 6 dp BEFORE ranking (tie-break by neighbor id)
    so rank order is reproducible across engines and float environments.
    """
    # norms are computed ONCE per vector before the join (not per pair —
    # the naive formulation does 3 dot products per candidate pair)
    normed = emb.withColumn("nn", _dot(vec_col, vec_col))
    queries = (normed.where(F.col(id_col).isin(query_ids))
               .select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"),
                       F.col("nn").alias("qn")))
    pairs = (normed.alias("n")
             .join(F.broadcast(queries), F.col(id_col) != F.col("query_id"))
             .withColumn("dot", _dot("qvec", vec_col))
             .withColumn("cosine_r", F.round(F.try_divide(F.col("dot"), F.sqrt(F.col("qn") * F.col("nn"))), 6)))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_r"), F.col(id_col))
    return (pairs
            .withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "rank", F.col(id_col).alias("neighbor_id"), "cosine_r"))


def hyperplane_signatures(emb: DataFrame, n_planes: int = 8,
                          id_col: str = "vec_id", vec_col: str = "embedding",
                          dim: int = 64) -> DataFrame:
    """Random-hyperplane LSH: sign pattern of <v, h_p> for n_planes
    deterministic pseudo-hyperplanes.  Plane p's component i is derived
    from md5(p:i) — reproducible with no RNG state, so signatures agree
    across runs and engines.

    The signature is the scale path: near neighbors collide in buckets,
    and candidate generation becomes a uniform equi-join.
    """
    sig = None
    for p in range(n_planes):
        plane = _plane_array_sql(p, dim)
        # NULL-propagating bit (no `.otherwise(0)`): a dim/array-length
        # mismatch makes zip_with pad with NULL and the dot NULL — an
        # otherwise(0) would silently fold EVERY such vector into
        # bucket 0 of every band, degenerating the candidate equi-join
        # to all-pairs; a NULL bucket instead drops out of the join
        bit = F.when(F.expr(_DOT.format(a=vec_col, b=plane)) >= 0,
                     F.lit(1)).when(
            F.expr(_DOT.format(a=vec_col, b=plane)) < 0, F.lit(0))
        sig = bit if sig is None else sig * 2 + bit
    return emb.select(F.col(id_col).alias("vec_id"), sig.alias("lsh_bucket"))


def cosine_near_dup_pairs(emb: DataFrame, threshold: float = 0.95,
                          n_planes: int = 4, id_col: str = "vec_id",
                          vec_col: str = "embedding", dim: int = 64) -> DataFrame:
    """Embedding-cosine near-duplicate detection: candidate pairs from
    LSH buckets, exact cosine verify, keep pairs >= threshold.

    The scale shape: an equi-join on hyperplane-signature buckets (never
    all-pairs), then per-pair exact re-scoring. With n_planes=4 a true
    near-dup (cosine ~1) collides with probability ~(1-θ/π)^4 ≈ high;
    raise n_planes for selectivity at larger N."""
    sigs = hyperplane_signatures(emb, n_planes, id_col, vec_col, dim)
    embs = (emb.join(sigs, emb[id_col] == sigs.vec_id).drop(sigs.vec_id)
            .withColumn("nrm", _dot(vec_col, vec_col)))
    a = embs.select(F.col(id_col).alias("doc_a"), F.col(vec_col).alias("va"),
                    F.col("lsh_bucket").alias("ba"), F.col("nrm").alias("na"))
    b = embs.select(F.col(id_col).alias("doc_b"), F.col(vec_col).alias("vb"),
                    F.col("lsh_bucket").alias("bb"), F.col("nrm").alias("nb"))
    return (a.join(b, (F.col("ba") == F.col("bb")) & (F.col("doc_a") < F.col("doc_b")))
            .withColumn("cosine_r", _cosine_r("va", "vb", "na", "nb"))
            .where(F.col("cosine_r") >= threshold)
            .select("doc_a", "doc_b", "cosine_r"))


def _band_sig_cols(vec_col: str, n_bands: int, band_planes: int, dim: int) -> list:
    """One Column per band: the band's band_planes sign bits packed into
    an int bucket.  Global plane gp = band * band_planes + j shares the
    md5(gp:i) component family with hyperplane_signatures, so the two
    stay formula-compatible."""
    band_cols = []
    for b in range(n_bands):
        sig = None
        for j in range(band_planes):
            gp = b * band_planes + j
            plane = _plane_array_sql(gp, dim)
            # NULL-propagating bit — same dim-mismatch guard as
            # hyperplane_signatures (see its comment)
            bit = F.when(F.expr(_DOT.format(a=vec_col, b=plane)) >= 0,
                         F.lit(1)).when(
                F.expr(_DOT.format(a=vec_col, b=plane)) < 0, F.lit(0))
            sig = bit if sig is None else sig * 2 + bit
        band_cols.append(sig)
    return band_cols


def banded_signatures(emb: DataFrame, n_bands: int = 8, band_planes: int = 4,
                      id_col: str = "vec_id", vec_col: str = "embedding",
                      dim: int = 64) -> DataFrame:
    """Multi-band hyperplane signatures: n_bands independent
    band_planes-bit buckets per vector.

    Returns (vec_id, band, bucket) exploded rows — the same banding
    MinHash-LSH uses (dedup.lsh_candidates): a pair is a candidate if it
    collides in ANY band (OR-amplification), which removes the
    single-signature recall cliff of cosine_near_dup_pairs: miss
    probability decays as (1 - p^band_planes)^n_bands instead of
    1 - p^n_planes."""
    band_cols = _band_sig_cols(vec_col, n_bands, band_planes, dim)
    return (emb.select(F.col(id_col).alias("vec_id"),
                       F.posexplode(F.array(*band_cols)).alias("band", "bucket")))


def banded_signature_table(emb: DataFrame, n_bands: int = 8, band_planes: int = 4,
                           id_col: str = "vec_id", vec_col: str = "embedding",
                           dim: int = 64) -> DataFrame:
    """The one-pass signature+norm corpus table:
    (vec_id, v, nrm, bands array<int>) — every per-vector quantity the
    banded near-dup pipeline needs, computed in a single scan.

    At 100 TB this is a real table written next to the corpus (signatures
    are tiny and reused across dedup runs); in a one-shot query the
    caller persists it so the n_bands x band_planes x dim dot products
    run ONCE instead of once per self-join side."""
    band_cols = _band_sig_cols(vec_col, n_bands, band_planes, dim)
    return emb.select(F.col(id_col).alias("vec_id"),
                      F.col(vec_col).alias("v"),
                      _dot(vec_col, vec_col).alias("nrm"),
                      F.array(*band_cols).alias("bands"))


# last internally-persisted signature table (a single slot — each new
# materialized-banded call releases the previous table under a lock),
# so a process sweeping scales/parameters pins at most ONE signature
# cache instead of accumulating an InMemoryRelation per input plan.
_MAT_SIG: list[DataFrame] = []
_MAT_SIG_LOCK = threading.Lock()


def _register_mat_signatures(base: DataFrame) -> None:
    with _MAT_SIG_LOCK:
        for handle in _MAT_SIG:
            try:
                # an equal-plan handle SHARES the new table's cache entry
                # (CacheManager dedupes by semantics): unpersisting it
                # would silently drop the cache we just registered
                if not handle.sameSemantics(base):
                    handle.unpersist(blocking=False)
            except Exception:
                pass  # stopped session's dead reference
        _MAT_SIG.clear()
        _MAT_SIG.append(base)


def write_banded_signatures(emb: DataFrame, path: str, n_bands: int = 8,
                            band_planes: int = 4, id_col: str = "vec_id",
                            vec_col: str = "embedding", dim: int = 64) -> None:
    """The production write-once path: materialize the signature table
    to storage next to the corpus.  Signature compute runs exactly once
    per corpus snapshot; every later dedup run is join-only over this
    table (pass `spark.read.parquet(path)` as `signatures` to
    cosine_near_dup_banded_materialized) — no corpus re-scan, no
    re-encode.  tests/test_banded_recall.py proves the read-back path
    is result-identical to the stateless query and that its plan
    contains zero signature recomputation."""
    (banded_signature_table(emb, n_bands, band_planes, id_col, vec_col, dim)
     .write.mode("overwrite").parquet(path))


def cosine_near_dup_banded_materialized(emb: DataFrame, threshold: float = 0.95,
                                        n_bands: int = 8, band_planes: int = 4,
                                        id_col: str = "vec_id",
                                        vec_col: str = "embedding",
                                        dim: int = 64,
                                        signatures: DataFrame | None = None) -> DataFrame:
    """Banded embedding near-dup over a MATERIALIZED signature table —
    same results as cosine_near_dup_banded, different physical plan: the
    signature subtree is persisted and every downstream read (both
    candidate-join sides and both exact-verify vector lookups) is an
    InMemoryTableScan, so the 32 folded-plane dot products per vector run
    exactly once (tests/test_plans.py pins the plane constants appearing
    once in the plan).  This is the in-query analog of the production
    shape: write banded_signature_table once, self-join it forever.

    Cache lifecycle: pass `signatures` (a banded_signature_table DataFrame
    you persist/unpersist yourself, or a table read back from storage) to
    own it; otherwise the table is persisted internally and the PREVIOUS
    internal table of this session is released, bounding cache growth to
    one signature table regardless of how many scales/parameter settings
    a session sweeps.

    Measured tradeoff (bench_out/mat_reuse_r3.json, BENCH.md round 3):
    at dim=64 / 32 planes the STATELESS variant is faster one-shot —
    recomputing folded-constant signatures in codegen costs less than
    round-tripping them through the columnar cache.  This variant's
    value is the write-once TABLE shape: at corpus scale the win is
    skipping a second full corpus scan+decode, which an in-memory cache
    on a small benchmark cannot emulate.  Also note: never warm the
    persist via count() — AQE coalesces the cached partitioning and
    slows every later join over it."""
    if signatures is not None:
        base = signatures
    else:
        base = banded_signature_table(emb, n_bands, band_planes,
                                      id_col, vec_col, dim).persist()
        _register_mat_signatures(base)
    sigs = base.select("vec_id", F.posexplode("bands").alias("band", "bucket"))
    a = sigs.select(F.col("vec_id").alias("doc_a"), "band", "bucket")
    b = sigs.select(F.col("vec_id").alias("doc_b"), "band", "bucket")
    cands = (a.join(b, ["band", "bucket"])
             .where(F.col("doc_a") < F.col("doc_b"))
             .select("doc_a", "doc_b").distinct())
    return (cands
            .join(base.select(F.col("vec_id").alias("doc_a"),
                              F.col("v").alias("va"), F.col("nrm").alias("na")),
                  "doc_a")
            .join(base.select(F.col("vec_id").alias("doc_b"),
                              F.col("v").alias("vb"), F.col("nrm").alias("nb")),
                  "doc_b")
            .withColumn("cosine_r", F.round(F.try_divide(
                _dot("va", "vb"),
                F.sqrt(F.col("na") * F.col("nb"))), 6))
            .where(F.col("cosine_r") >= threshold)
            .select("doc_a", "doc_b", "cosine_r"))


def cosine_near_dup_banded(emb: DataFrame, threshold: float = 0.95,
                           n_bands: int = 8, band_planes: int = 4,
                           id_col: str = "vec_id", vec_col: str = "embedding",
                           dim: int = 64) -> DataFrame:
    """Embedding near-dup detection, banded (the scale-correct shape):
    candidates = pairs colliding in >= 1 of n_bands independent
    band_planes-bit buckets, then ONE exact cosine verify per distinct
    pair, keep >= threshold.

    vs cosine_near_dup_pairs (single signature): recall for true
    near-dups no longer cliffs when a pair straddles one hyperplane —
    tests/test_banded_recall.py pins banded recall ~1.0 on a clustered
    fixture where the single-signature variant provably drops pairs.
    At larger N, raise band_planes (selectivity per band) and n_bands
    (recall) together; candidate generation stays an equi-join on
    (band, bucket), never all-pairs.  Note the signature subtree
    evaluates once per side of the self-join (no Python, folded plane
    constants, but 2x the dot products): a production pipeline
    materializes signatures once as a corpus column and self-joins the
    materialized table — the one-shot query form trades that for
    statelessness."""
    sigs = banded_signatures(emb, n_bands, band_planes, id_col, vec_col, dim)
    a = sigs.select(F.col("vec_id").alias("doc_a"), "band", "bucket")
    b = sigs.select(F.col("vec_id").alias("doc_b"), "band", "bucket")
    cands = (a.join(b, ["band", "bucket"])
             .where(F.col("doc_a") < F.col("doc_b"))
             .select("doc_a", "doc_b").distinct())
    normed = emb.select(F.col(id_col).alias("vid"), F.col(vec_col).alias("v"),
                        _dot(vec_col, vec_col).alias("nrm"))
    return (cands
            .join(normed.select(F.col("vid").alias("doc_a"),
                                F.col("v").alias("va"), F.col("nrm").alias("na")),
                  "doc_a")
            .join(normed.select(F.col("vid").alias("doc_b"),
                                F.col("v").alias("vb"), F.col("nrm").alias("nb")),
                  "doc_b")
            .withColumn("cosine_r", F.round(F.try_divide(
                _dot("va", "vb"),
                F.sqrt(F.col("na") * F.col("nb"))), 6))
            .where(F.col("cosine_r") >= threshold)
            .select("doc_a", "doc_b", "cosine_r"))


def _ivf_scored(emb: DataFrame, n_centroids: int,
                id_col: str, vec_col: str) -> DataFrame:
    """Vector x centroid similarity table, the shared IVF intermediate:
    (id, vec, nn, centroid_id, sim_r) — one broadcast cross-join against
    the `n_centroids` lowest-id vectors, the deterministic stand-in for
    an offline-trained k-means codebook (at 100 TB the codebook is
    trained once on a sample and broadcast; the plan shape is identical
    either way).  sim_r is rounded to 6 dp so downstream argmax/rank
    tie-breaks are reproducible across engines."""
    normed = emb.withColumn("nn", _dot(vec_col, vec_col))
    cents = (normed.where(F.col(id_col) < n_centroids)
             .select(F.col(id_col).alias("centroid_id"),
                     F.col(vec_col).alias("cvec"), F.col("nn").alias("cn")))
    return _score_against_codebook(normed, cents, vec_col)


def _score_against_codebook(normed: DataFrame, cents: DataFrame,
                            vec_col: str) -> DataFrame:
    """Score every (vector, centroid) pair against an EXPLICIT broadcast
    codebook (centroid_id, cvec, cn) — the shared kernel for the
    first-build path (codebook = lowest-id vectors) and the incremental
    path (codebook FROZEN from the base snapshot: increments must join
    the same inverted lists the base corpus was assigned to, or the
    index silently fragments across snapshots)."""
    return (normed.crossJoin(F.broadcast(cents))
            .withColumn("sim_r", F.round(F.try_divide(
                _dot(vec_col, "cvec"),
                F.sqrt(F.col("nn") * F.col("cn"))), 6))
            .drop("cvec", "cn"))


def _argmax_assign(scored: DataFrame, id_col: str,
                   vec_col: str) -> DataFrame:
    """THE nearest-centroid argmax tail (max sim_r, smaller-centroid-id
    tie-break via negated-id struct max) — one definition shared by the
    first-build and incremental paths so their tie-break can never
    drift (base + increment == from-scratch depends on it)."""
    best = F.max(F.struct(F.col("sim_r"),
                          (-F.col("centroid_id")).alias("ncid"))).alias("best")
    return (scored.groupBy(id_col)
            .agg(best, F.first(vec_col).alias(vec_col),
                 F.first("nn").alias("nn"))
            .select(id_col, vec_col, "nn",
                    (-F.col("best.ncid")).alias("centroid_id")))


def ivf_assign_to_codebook(emb: DataFrame, cents: DataFrame,
                           id_col: str = "vec_id",
                           vec_col: str = "embedding") -> DataFrame:
    """Assign vectors to their nearest centroid of an EXPLICIT codebook
    (centroid_id, cvec, cn) — the incremental-ingest half of IVF: the
    codebook was fixed at base-build time, new vectors slot into the
    existing inverted lists.  Same max_by aggregation, rounding, and
    smaller-centroid-id tie-break as ivf_assignments, so
    base + increment equals a from-scratch build whenever the codebook
    matches (pinned by test)."""
    normed = emb.withColumn("nn", _dot(vec_col, vec_col))
    scored = _score_against_codebook(normed, cents, vec_col)
    return _argmax_assign(scored, id_col, vec_col)


def ivf_assignments(emb: DataFrame, n_centroids: int = 8,
                    id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """IVF coarse quantizer: assign every vector to its nearest centroid
    (max sim_r, smaller-centroid-id tie-break) via map-side max_by
    aggregation — no shuffle of the big side beyond the groupBy on id.

    Returns (vec_id, embedding, nn, centroid_id).
    """
    scored = _ivf_scored(emb, n_centroids, id_col, vec_col)
    return _argmax_assign(scored, id_col, vec_col)


def ivf_topk(emb: DataFrame, query_ids: list[int], k: int = 5,
             n_centroids: int = 8, nprobe: int = 2,
             id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """IVF approximate top-k: probe the query's `nprobe` nearest inverted
    lists, exact cosine re-rank inside them.

    The 100 TB scale path alongside lsh_topk: candidate generation is an
    equi-join on centroid_id (selectivity ~nprobe/n_centroids of the
    corpus) instead of a full scan per query; recall is tuned by nprobe
    and n_centroids, both O(1) broadcast state.  `_ivf_scored` appears in
    two plan branches, but the corpus-wide N x C scoring runs ONCE (the
    assignments branch): in the probe branch Catalyst pushes the
    `id IN (query_ids)` filter through the cross join down to the parquet
    scan, so only |Q| x C pairs are re-scored there —
    tests/test_plans.py::test_ivf_probe_filter_pushdown pins this."""
    scored = _ivf_scored(emb, n_centroids, id_col, vec_col)
    assigned = ivf_assignments(emb, n_centroids, id_col, vec_col)
    wq = Window.partitionBy(id_col).orderBy(F.desc("sim_r"), F.col("centroid_id"))
    qprobes = (scored.where(F.col(id_col).isin(query_ids))
               .withColumn("pr", F.row_number().over(wq))
               .where(F.col("pr") <= nprobe)
               .select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"),
                       F.col("nn").alias("qn"), "centroid_id"))
    return _probe_and_rank(assigned, qprobes, k, id_col, vec_col)


def _probe_and_rank(assigned: DataFrame, qprobes: DataFrame, k: int,
                    id_col: str, vec_col: str) -> DataFrame:
    """The shared IVF candidate-join + exact-rerank tail: candidates
    from the centroid_id equi-join against the broadcast probe set,
    exact cosine (6 dp round, id tie-break), per-query top-k.  ONE
    definition for the stateless path (ivf_topk) and the index read
    path (ivf_topk_from_index) — their advertised result-parity holds
    by construction instead of by two hand-synchronized copies."""
    pairs = (assigned
             .join(F.broadcast(qprobes),
                   (assigned.centroid_id == qprobes.centroid_id)
                   & (F.col(id_col) != F.col("query_id")))
             .withColumn("dot", _dot("qvec", vec_col))
             .withColumn("cosine_r", F.round(F.try_divide(F.col("dot"), F.sqrt(F.col("qn") * F.col("nn"))), 6)))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_r"), F.col(id_col))
    return (pairs.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "rank", F.col(id_col).alias("neighbor_id"), "cosine_r"))


def lsh_topk(emb: DataFrame, query_ids: list[int], k: int = 5,
             n_planes: int = 8, id_col: str = "vec_id",
             vec_col: str = "embedding", dim: int = 64) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH bucket,
    then exact cosine re-rank inside the bucket."""
    sigs = hyperplane_signatures(emb, n_planes, id_col, vec_col, dim)
    embs = (emb.join(sigs, emb[id_col] == sigs.vec_id).drop(sigs.vec_id)
            .withColumn("nn", _dot(vec_col, vec_col)))
    queries = (embs.where(F.col(id_col).isin(query_ids))
               .select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"),
                       F.col("lsh_bucket").alias("qbucket"), F.col("nn").alias("qn")))
    pairs = (embs.alias("n")
             .join(F.broadcast(queries),
                   (F.col("lsh_bucket") == F.col("qbucket")) & (F.col(id_col) != F.col("query_id")))
             .withColumn("dot", _dot("qvec", vec_col))
             .withColumn("cosine_r", F.round(F.try_divide(F.col("dot"), F.sqrt(F.col("qn") * F.col("nn"))), 6)))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_r"), F.col(id_col))
    return (pairs.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "rank", F.col(id_col).alias("neighbor_id"), "cosine_r"))


def label_centroids(emb: DataFrame, vec_col: str = "embedding",
                    label_col: str = "label") -> DataFrame:
    """Per-label mean vector (class centroids), exploded to
    (label, dim_idx, centroid_r) rows — the embedding-pipeline building
    block behind per-class prototypes / nearest-class-mean classifiers
    and IVF codebook seeding.

    Shape: posexplode to (label, dim) then one partial-agg groupBy —
    map-side combine reduces each partition to n_labels x dim rows
    before the single shuffle, so the exchange is tiny regardless of
    corpus size.  Dimensionality follows the actual array lengths (the
    registry's DuckDB twin is pinned to the 64-dim fixture table)."""
    return (emb.select(F.col(label_col).alias("label"),
                       F.posexplode(F.col(vec_col)).alias("dim_idx", "v"))
            .groupBy("label", "dim_idx")
            .agg(F.round(F.avg(F.col("v").cast("double")), 6).alias("centroid_r"),
                 F.count("*").alias("n_vecs")))


_DOT_INT = ("aggregate(zip_with({a}, {b}, "
            "(x, y) -> cast(x as bigint) * cast(y as bigint)), "
            "cast(0 as bigint), (acc, v) -> acc + v)")


def quantize_int8(emb: DataFrame, id_col: str = "vec_id",
                  vec_col: str = "embedding") -> DataFrame:
    """Symmetric per-vector int8 quantization: q_i = round-half-up of
    v_i * 127 / max|v| (zero vectors quantize to all zeros via the
    epsilon guard).  Emits (id, qvec) with qvec bounded in [-127, 127].

    Why this exists at 100 TB: the embedding column dominates ANN
    shuffle and broadcast bytes, and int8 is 4x narrower than float32
    (8x narrower than the doubles Spark shuffles after a cast).  Cosine
    is SCALE-INVARIANT, so the per-vector scale factor cancels and
    never needs to be carried — quantized cosine is computable from the
    int arrays alone.  A bonus for the correctness gate: all dot
    products become exact int64 arithmetic (dim * 127^2 << 2^63), so
    the quantized scores are bit-identical across engines by
    construction rather than by identical-expression-tree argument.

    Round-half-up via floor(x + 0.5) — Spark round() uses HALF_UP while
    DuckDB round() uses banker's rounding; the floor form is the same
    IEEE operation in both."""
    qmax = (f"greatest(aggregate({vec_col}, cast(0 as double), "
            f"(acc, x) -> greatest(acc, abs(cast(x as double)))), "
            f"cast(1e-30 as double))")
    # stored as TINYINT (1 byte/element — the narrowness is the whole
    # point; a bigint element would make qvec 2x WIDER than the float32
    # source); _DOT_INT widens to bigint inside the multiply instead
    qv = (f"transform({vec_col}, x -> cast(floor(cast(x as double) "
          f"* 127.0D / _qmax + 0.5D) as tinyint))")
    return (emb
            .withColumn("_qmax", F.expr(qmax))
            .select(F.col(id_col).alias(id_col), F.expr(qv).alias("qvec")))


def quantized_topk(emb: DataFrame, query_ids: list[int], k: int = 5,
                   id_col: str = "vec_id",
                   vec_col: str = "embedding") -> DataFrame:
    """Cosine top-k over int8-quantized vectors: the brute-force plan
    shape (broadcast the query set, no shuffle of the big side, per-
    query top-k window) but every pairwise op runs on int arrays —
    4-8x less broadcast/scan width and exact integer dots.  Ranking
    uses the QUANTIZED score; recall vs the float path is pinned by
    test (quantization at dim=64 moves cosine by ~1e-3, far under the
    corpus's neighbor gaps)."""
    quant = quantize_int8(emb, id_col, vec_col)
    normed = quant.withColumn("nn", F.expr(_DOT_INT.format(a="qvec", b="qvec")))
    queries = (normed.where(F.col(id_col).isin(query_ids))
               .select(F.col(id_col).alias("query_id"),
                       F.col("qvec").alias("qq"), F.col("nn").alias("qn")))
    pairs = (normed
             .join(F.broadcast(queries), F.col(id_col) != F.col("query_id"))
             .withColumn("dot", F.expr(_DOT_INT.format(a="qq", b="qvec")))
             .withColumn("cosine_q",
                         F.round(F.try_divide(
                             F.col("dot"),
                             F.sqrt((F.col("qn") * F.col("nn"))
                                    .cast("double"))), 6)))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_q"), F.col(id_col))
    return (pairs
            .withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "rank", F.col(id_col).alias("neighbor_id"),
                    "cosine_q"))


def ivf_topk_from_index(index: DataFrame, query_ids: list[int], k: int = 5,
                        nprobe: int = 2, id_col: str = "vec_id",
                        vec_col: str = "embedding",
                        n_centroids: int | None = None) -> DataFrame:
    """IVF top-k over a PREBUILT assignment table (the output of
    ivf_assignments, typically written to storage by jobs/index.py):
    join-only -- no corpus re-scoring, no re-assignment.

    The codebook is recovered from the index itself.  Default
    (n_centroids=None): the distinct centroid_id values joined back to
    their own rows.  With the deterministic lowest-id codebook every
    centroid assigns to ITSELF (it scores 1.0 against itself; ties
    break to the smaller id), so the distinct assigned ids are exactly
    the build-time codebook -- UNLESS two codebook vectors are
    identical (pre-dedup corpora contain duplicates): then the
    higher-id twin's inverted list is empty, distinct-recovery misses
    it, and probe sets diverge from the stateless ivf_topk.  When the
    caller KNOWS the build's centroid count (jobs/index.py stores it
    in ann_meta), pass n_centroids and the codebook is recovered
    exactly as the rows with id < n_centroids — robust to duplicate
    codebook vectors.  A caller-supplied value that disagreed with the
    build would silently drop inverted lists (too small) or probe
    phantom centroids (too large) — only pass the recorded one.

    Queries are re-scored against the C broadcast centroids only
    (|Q| x C work); candidates and the exact rerank run through the
    same _probe_and_rank tail as the stateless ivf_topk, so the two
    paths are result-identical by construction (pinned by test).

    This is the production ANN read path at 100 TB: assignment costs
    one N x C pass and is paid ONCE per corpus snapshot at index-build
    time; every query run afterwards touches only its probed inverted
    lists."""
    if n_centroids is not None:
        cents = (index.where(F.col(id_col) < n_centroids)
                 .select(F.col(id_col).alias("cid"),
                         F.col(vec_col).alias("cvec"),
                         F.col("nn").alias("cn")))
    else:
        cent_ids = index.select(F.col("centroid_id").alias("cid")).distinct()
        cents = (index.join(F.broadcast(cent_ids),
                            index[id_col] == cent_ids.cid)
                 .select("cid", F.col(vec_col).alias("cvec"),
                         F.col("nn").alias("cn")))
    qscored = (index.where(F.col(id_col).isin(query_ids))
               .select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).alias("qvec"), F.col("nn").alias("qn"))
               .crossJoin(F.broadcast(cents))
               .withColumn("sim_r", F.round(F.try_divide(
                   _dot("qvec", "cvec"),
                   F.sqrt(F.col("qn") * F.col("cn"))), 6)))
    wq = Window.partitionBy("query_id").orderBy(F.desc("sim_r"), F.col("cid"))
    qprobes = (qscored.withColumn("pr", F.row_number().over(wq))
               .where(F.col("pr") <= nprobe)
               .select("query_id", "qvec", "qn",
                       F.col("cid").alias("centroid_id")))
    return _probe_and_rank(index, qprobes, k, id_col, vec_col)


def kmeans_lloyd(emb: DataFrame, k: int = 8, n_iter: int = 3,
                 vec_col: str = "embedding",
                 id_col: str = "vec_id") -> DataFrame:
    """(centroid_id, pos, coord_r, n_members): distributed Lloyd k-means
    over the embedding corpus — the TRAINED codebook the IVF path's
    lowest-id stand-in (`_ivf_scored` docstring) defers to, and the
    clustering stage of SemDeDup-style semantic dedup / corpus topic
    bucketing.

    Scale shape, per iteration:
      * assignment is a PROJECTION — the codebook is folded into one
        broadcast row (collect_list of k (centroid_id, cvec) structs)
        and each vector finds its argmin centroid via an in-row
        aggregate over that array: NO corpus shuffle, no driver
        round-trip, nothing leaves the scan stage.  (This one-row
        codebook caps k*dim at broadcast size — beyond ~10^6 floats use
        the IVF join+partial-agg shape instead.)
      * the centroid update is the ONLY exchange: posexplode + map-side
        partial avg on (centroid_id, pos) — k*dim rows per partition.
    Total corpus reads grow linearly with n_iter (one chained plan, no
    caching needed at fixed small n_iter; persist the scan for large
    n_iter).

    Determinism: init = the k lowest-id vectors (same convention as
    _ivf_scored); argmin ties break to the lowest centroid_id via an
    order-independent (dist, cid) min-fold (collect_list order cannot
    matter); BOTH the inter-round centroids AND the per-pair distances
    are ROUNDED TO 6 DP (file convention, same as _ivf_scored's sim_r),
    so both engines feed bit-identical codebooks forward and compare
    bit-identical distances — double-summation order differences are
    absorbed by the round, and a genuine 6-dp distance tie resolves by
    the deterministic centroid_id tiebreak.  Fixed n_iter (not
    convergence) keeps the result a pure function of the input, same as
    graphrank.pagerank.
    """
    best = kmeans_assignments(emb, k, n_iter, vec_col, id_col)
    return (_centroid_update(best)
            .select("centroid_id", "pos",
                    F.col("coord").alias("coord_r"), "n_members"))


def _centroid_update(best: DataFrame) -> DataFrame:
    """(centroid_id, pos, coord, n_members): 6-dp-rounded per-dimension
    means of the current assignment — THE one centroid-update
    definition for both the iteration loop and the final summary (the
    rounding must stay identical in both or the between-round
    bit-identity kmeans_lloyd promises silently breaks)."""
    return (best
            .select("centroid_id", F.posexplode("vec").alias("pos", "coord"))
            .groupBy("centroid_id", "pos")
            .agg(F.round(F.avg("coord"), 6).alias("coord"),
                 F.count("*").alias("n_members")))


def kmeans_assignments(emb: DataFrame, k: int = 8, n_iter: int = 3,
                       vec_col: str = "embedding",
                       id_col: str = "vec_id") -> DataFrame:
    """(vec_id, vec, centroid_id): the final-iteration Lloyd assignment
    kmeans_lloyd summarizes — exposed for cluster-scoped consumers
    (semantic_dedup's within-cluster candidate generation)."""
    v = emb.select(F.col(id_col).alias("vec_id"),
                   F.col(vec_col).cast("array<double>").alias("vec"))
    cents = (v.where(F.col("vec_id") < k)
             .select(F.col("vec_id").alias("centroid_id"),
                     F.col("vec").alias("cvec")))

    def assign(cents_df: DataFrame) -> DataFrame:
        cb = cents_df.agg(
            F.collect_list(F.struct("centroid_id", "cvec")).alias("cb"))
        start = F.struct(
            F.lit(float("inf")).alias("dist"),
            F.lit(-1).cast("bigint").alias("cid"))

        def step(acc, c):
            # distance rounded to 6 dp BEFORE the argmin (file
            # convention): cross-engine summation-order noise cannot
            # reorder two centroids unless they tie at 6 dp, and that
            # tie resolves by centroid_id below
            d = F.round(F.aggregate(
                F.zip_with(F.col("vec"), c["cvec"],
                           lambda a, b: (a - b) * (a - b)),
                F.lit(0.0), lambda s, x: s + x), 6)
            better = (d < acc["dist"]) | (
                (d == acc["dist"]) & (c["centroid_id"] < acc["cid"]))
            return F.when(better,
                          F.struct(d.alias("dist"),
                                   c["centroid_id"].alias("cid"))
                          ).otherwise(acc)

        return (v.crossJoin(F.broadcast(cb))
                .select("vec_id", "vec",
                        F.aggregate("cb", start, step)["cid"]
                        .alias("centroid_id")))

    best = assign(cents)
    for _ in range(n_iter - 1):
        cents = (_centroid_update(best)
                 .groupBy("centroid_id")
                 .agg(F.transform(
                     F.array_sort(F.collect_list(F.struct("pos", "coord"))),
                     lambda s: s["coord"]).alias("cvec")))
        best = assign(cents)
    return best


def semantic_dedup(emb: DataFrame, k: int = 8, n_iter: int = 3,
                   threshold: float = 0.95, vec_col: str = "embedding",
                   id_col: str = "vec_id") -> DataFrame:
    """(vec_a, vec_b, centroid_id, cosine_r): SemDeDup (Abbas et al.,
    2023) — cluster the corpus with k-means, then find near-duplicate
    pairs ONLY within each cluster.

    This is the published algorithm's actual scale argument: the
    quadratic pairwise stage is fenced inside clusters (sum of c_i^2,
    bounded by max cluster size — at web scale you raise k until
    clusters fit), and candidate generation is an equi-join on the
    cluster id, the same bucketed-candidates discipline as every other
    dedup family here.  Known recall tradeoff, documented in the paper:
    a near-dup pair split across a cluster boundary is missed — the
    banded-LSH path (cosine_near_dup_banded) is the recall-first
    alternative; this one is the throughput-first alternative.

    Pairs are (lower_id, higher_id); the drop policy (keep lowest id
    per component) is dedup.cluster_assign's job downstream, same as
    the MinHash pipeline."""
    # localCheckpoint materializes the 3-iteration assignment ONCE: both
    # sides of the self-join read the checkpointed table instead of
    # re-running k-means per side (the 2x-subtree trap the banded-cosine
    # operator documents; in production this is the persisted
    # cluster-assignment table an index build writes anyway)
    assigned = (kmeans_assignments(emb, k, n_iter, vec_col, id_col)
                .withColumn("nrm", _dot("vec", "vec"))
                .localCheckpoint(eager=False))
    a = assigned.select(F.col("vec_id").alias("vec_a"),
                        F.col("vec").alias("va"), F.col("nrm").alias("na"),
                        "centroid_id")
    b = assigned.select(F.col("vec_id").alias("vec_b"),
                        F.col("vec").alias("vb"), F.col("nrm").alias("nb"),
                        "centroid_id")
    return (a.join(b, "centroid_id")
            .where(F.col("vec_a") < F.col("vec_b"))
            .withColumn("cosine_r", _cosine_r("va", "vb", "na", "nb"))
            .where(F.col("cosine_r") >= threshold)
            .select("vec_a", "vec_b", "centroid_id", "cosine_r"))


def pca_power(emb: DataFrame, n_iter: int = 8, dim: int = 64,
              vec_col: str = "embedding", id_col: str = "vec_id",
              project: bool = False) -> DataFrame:
    """Principal component of the embedding corpus via POWER ITERATION
    — dimensionality reduction as a DataFrame plan (corpus
    visualization axes, embedding drift monitoring, 1-D curriculum /
    binning keys), the linear-algebra sibling of kmeans_lloyd.

    Three stages, all codegen, no Python:
      1. Covariance: posexplode to (vec_id, pos, coord), center by the
         per-position mean (broadcast, 64 rows), then ONE
         co-partitioned self-join on vec_id + groupBy (i, j) builds
         the dim x dim covariance matrix.  The exchange after map-side
         combine is dim^2 rows TOTAL (4096 here) regardless of corpus
         size — at 10^12 vectors the reduce side never sees more than
         the matrix.  Entries round to 6 dp so both engines iterate
         the identical matrix (the fixed-budget recipe of
         graph_pagerank / embedding_kmeans / logreg_train).
      2. Power iteration, `n_iter` fixed rounds: b' = C.b (a dim^2 x
         dim join — trivially broadcast), normalized by its L2 norm
         (one-row aggregate cross-joined back in-plan, no driver
         collect), re-rounded to 6 dp.  Deterministic all-positive
         start b0 = 1/sqrt(dim), so the eigenvector sign is a pure
         function of the data.
      3. Output (pos, pc1_r, eigenvalue_r) — eigenvalue_r is the final
         round's ||C.b|| (the standard power-iteration estimate; for a
         unit b, ||C.b|| -> lambda_1).

    With project=True, adds the per-vector projection instead:
    (vec_id, pc1_score_r) = round(dot(centered(v), b_final), 6) — the
    1-D embedding every downstream binning/curriculum query wants; one
    broadcast join against the 64-row component, scan-speed over the
    corpus.
    """
    if n_iter < 1:
        # the output schema (eigenvalue_r / a normalized component)
        # only exists after at least one matvec round
        raise ValueError(f"pca_power needs n_iter >= 1, got {n_iter}")
    vp = emb.select(
        F.col(id_col).alias("vec_id"),
        F.posexplode(F.col(vec_col).cast("array<double>"))
        .alias("pos", "coord"))
    mu = vp.groupBy("pos").agg(F.avg("coord").alias("mu"))
    cx = (vp.join(F.broadcast(mu), "pos")
          .select("vec_id", "pos", (F.col("coord") - F.col("mu")).alias("cx"))
          .localCheckpoint(eager=True))
    n = emb.count()  # plan constant: the 1/(n-1) covariance scale
    if n < 2:
        # n=1 would divide the covariance by 0.0 (ANSI DIVIDE_BY_ZERO
        # crash mid-job), n=0 by -1 (silently wrong sign) — the count
        # is already driver-side, so fail loudly at plan time
        raise ValueError(f"pca_power needs >= 2 vectors, got {n}")
    a, b = cx.alias("a"), cx.alias("b")
    cov = (a.join(b, "vec_id")
           .groupBy(F.col("a.pos").alias("i"), F.col("b.pos").alias("j"))
           .agg(F.round(F.sum(F.col("a.cx") * F.col("b.cx"))
                        / F.lit(float(n - 1)), 6).alias("cov"))
           .localCheckpoint(eager=True))
    bvec = (cov.select(F.col("i").alias("pos")).distinct()
            .withColumn("b", F.lit(round(1.0 / dim ** 0.5, 6))))
    for it in range(n_iter):
        u = (cov.join(F.broadcast(bvec.withColumnRenamed("pos", "j")), "j")
             .groupBy(F.col("i").alias("pos"))
             .agg(F.sum(F.col("cov") * F.col("b")).alias("u")))
        nrm = u.agg(F.sqrt(F.sum(F.col("u") * F.col("u"))).alias("nrm"))
        bvec = (u.crossJoin(F.broadcast(nrm))
                .select("pos", F.round(F.try_divide(F.col("u"), F.col("nrm")), 6).alias("b"),
                        F.col("nrm"))
                .localCheckpoint(eager=True))
    if project:
        comp = bvec.select(F.col("pos"), F.col("b"))
        return (cx.join(F.broadcast(comp), "pos")
                .groupBy("vec_id")
                .agg(F.round(F.sum(F.col("cx") * F.col("b")), 6)
                     .alias("pc1_score_r")))
    return bvec.select(F.col("pos").cast("int").alias("pos"),
                       F.col("b").alias("pc1_r"),
                       F.round(F.col("nrm"), 6).alias("eigenvalue_r"))


def bitext_margin_pairs(emb: DataFrame, label_a: int = 0, label_b: int = 1,
                        k: int = 4, margin_threshold: float = 1.05,
                        n_bands: int = 8, band_planes: int = 2,
                        id_col: str = "vec_id", vec_col: str = "embedding",
                        label_col: str = "label", dim: int = 64) -> DataFrame:
    """Margin-based bitext mining (the LASER/CCMatrix parallel-corpus
    shape, Artetxe & Schwenk 2019 ratio margin): mine aligned pairs
    between two embedding groups (two languages in a shared space;
    here two label partitions) as MUTUAL nearest neighbours whose
    cosine clears the local-density margin
    ``cos(x,y) / ((mean_k(x) + mean_k(y)) / 2)`` — raw cosine alone
    over-mines hubs, the margin normalizes by each side's
    neighbourhood density.

    Scale shape: candidates come from the SAME banded hyperplane-LSH
    equi-join as cosine_near_dup_banded (never all-pairs — at 100 TB
    the cross join of two languages is the classic mining blow-up);
    exact cosine runs once per candidate; top-k means, mutual-best
    ranks, and the margin all run over the candidate table with
    per-vector windows (bounded by the per-vector candidate count).
    The k-NN means are therefore *within-candidate* approximations of
    the true ones — the standard trade every LSH-gated miner makes;
    raise n_bands for recall, band_planes for selectivity.

    Determinism: cosines are 6-dp rounded BEFORE ranking/means
    (_cosine_r), rank ties break on the partner id, so both engines
    rank the identical point set; the margin is a ratio of means of
    <= k rounded values, rounded to 6 dp.

    A mutual-best pair's margin is >= 1.0 by construction (its cosine
    is the max on both sides, hence >= both top-k means), so
    margin_threshold=1.0 would mean RAW mutual-NN mining with no
    density filtering — the default is above 1 so the gate actually
    gates.  Ranks and both k-NN means are window functions over ONE
    scored-candidate pass (no groupBy branches re-deriving the
    candidate join per side)."""
    a_emb = emb.where(F.col(label_col) == label_a)
    b_emb = emb.where(F.col(label_col) == label_b)
    sa = (banded_signatures(a_emb, n_bands, band_planes, id_col, vec_col, dim)
          .select(F.col("vec_id").alias("a_id"), "band", "bucket"))
    sb = (banded_signatures(b_emb, n_bands, band_planes, id_col, vec_col, dim)
          .select(F.col("vec_id").alias("b_id"), "band", "bucket"))
    cands = sa.join(sb, ["band", "bucket"]).select("a_id", "b_id").distinct()
    na = a_emb.select(F.col(id_col).alias("a_id"), F.col(vec_col).alias("va"),
                      _dot(vec_col, vec_col).alias("na"))
    nb = b_emb.select(F.col(id_col).alias("b_id"), F.col(vec_col).alias("vb"),
                      _dot(vec_col, vec_col).alias("nb"))
    scored = (cands.join(na, "a_id").join(nb, "b_id")
              .select("a_id", "b_id",
                      _cosine_r("va", "vb", "na", "nb").alias("cos_r")))
    wa = Window.partitionBy("a_id").orderBy(F.desc("cos_r"), F.asc("b_id"))
    wb = Window.partitionBy("b_id").orderBy(F.desc("cos_r"), F.asc("a_id"))
    ranked = (scored.withColumn("ra", F.row_number().over(wa))
              .withColumn("rb", F.row_number().over(wb))
              .withColumn("ma", F.avg(F.when(F.col("ra") <= k,
                                             F.col("cos_r")))
                          .over(Window.partitionBy("a_id")))
              .withColumn("mb", F.avg(F.when(F.col("rb") <= k,
                                             F.col("cos_r")))
                          .over(Window.partitionBy("b_id"))))
    margin = F.round(F.col("cos_r") / ((F.col("ma") + F.col("mb")) / 2), 6)
    return (ranked.where((F.col("ra") == 1) & (F.col("rb") == 1))
            .withColumn("margin_r", margin)
            .where(F.col("margin_r") >= margin_threshold)
            .select("a_id", "b_id", F.col("cos_r").alias("cosine_r"),
                    "margin_r"))


def hashed_text_embeddings(docs: DataFrame, text_col: str = "text",
                           id_col: str = "doc_id",
                           dim: int = 16) -> DataFrame:
    """Model-free document embeddings by the feature-hashing trick
    (Weinberger et al. 2009): every canonical token hashes to one of
    ``dim`` buckets with a ±1 sign, and the embedding is the signed
    term-count vector — the classic fallback when no encoder model is
    available, and the in-engine bridge from raw text into the ANN /
    semantic-dedup layer (banded cosine, IVF, k-means all accept the
    ``vec`` column directly).

    Returns (id, vec array<bigint>, vec_norm array<double>) — one row
    PER INPUT DOCUMENT: a doc with NULL or whitespace-only text gets
    the zero vector (norm 0 → zero normalized view), never a silently
    missing row, so downstream ANN / semantic-dedup joins cannot lose
    failed-extraction docs.  The raw components are INTEGER sums of
    signed term frequencies, so the vector is engine- and
    partitioning-exact by construction; the L2-normalized view divides
    those exact integers by the exact sqrt of their sum of squares
    (both IEEE correctly-rounded ops, so the doubles are bit-identical
    cross-engine too).

    Scale shape: token explode -> (doc, term) tf partial agg ->
    (doc, bucket) partial agg -> one per-doc map assembly.  All
    shuffles are keyed on the doc id (never the vocabulary), the
    bucket/sign hashes are the shared md5 kernel (dedup._h32), and the
    dense array materializes only dim cells per document.  No Python,
    no joins, no vocabulary table.
    """
    from .dedup import _h32, word_array

    # explode_outer keeps token-less docs alive as one NULL-word row,
    # folded below into a (d=0, v=0) cell — the zero vector emerges
    # from the same aggregation path, no join needed
    words = (docs
             .select(F.col(id_col).alias("id"),
                     F.explode_outer(word_array(text_col)).alias("w"))
             .groupBy("id", "w").agg(F.count("*").alias("tf")))
    comp = (words
            .select("id",
                    F.coalesce(_h32(F.col("w"), seed="b") % dim,
                               F.lit(0)).alias("d"),
                    F.when(F.col("w").isNull(), F.lit(0)).otherwise(
                        F.when(_h32(F.col("w"), seed="s") % 2 == 0, -1)
                        .otherwise(1) * F.col("tf")).alias("v"))
            .groupBy("id", "d").agg(F.sum("v").alias("v")))
    assembled = (comp
                 .groupBy("id")
                 .agg(F.map_from_entries(
                     F.collect_list(F.struct("d", "v"))).alias("m"))
                 .select(
                     "id",
                     F.transform(
                         F.sequence(F.lit(0), F.lit(dim - 1)),
                         lambda i: F.coalesce(
                             F.element_at("m", i.cast("long")),
                             F.lit(0).cast("long"))).alias("vec")))
    # stage the norm as its own column: referenced inside the transform
    # lambda it would be INLINED and re-evaluated per element (and per
    # when-branch) — Catalyst does no CSE inside HOF lambdas (the
    # winnow_fingerprints lesson, at small scale here)
    normed = assembled.select(
        "id", "vec",
        F.sqrt(F.aggregate(
            "vec", F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double")))
        .alias("nrm"))
    return (normed
            .select(F.col("id").alias(id_col), "vec",
                    F.transform(
                        "vec",
                        lambda x: F.when(F.col("nrm") == 0, F.lit(0.0))
                        .otherwise(x.cast("double") / F.col("nrm")))
                    .alias("vec_norm")))
