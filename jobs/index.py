"""spark-submit entry point for the ANN index-build job.

    spark-submit --py-files engine.zip jobs/index.py \
        --embeddings /path/to/embeddings.parquet --warehouse /path/to/wh \
        --snapshot-id idx-001 [--bands 8] [--band-planes 4] \
        [--centroids 8] [--no-quantize]

The write-once half of the ANN story: every per-vector quantity the
similarity family needs is computed in ONE corpus pass each and
committed through the snapshot catalog, so query-time work is join-only
(no re-scoring, no re-assignment, no signature recomputation — the
100 TB shape, where the corpus scan is the cost and the index tables
are tiny beside it).

Index tables (all under the catalog, all per-snapshot):
  ann_meta        one row of build parameters (bands, band_planes,
                  centroids, vectors) — committed FIRST; re-runs under
                  the same snapshot-id are validated against it, so a
                  crash-resume with different flags or a different
                  corpus cannot commit a mixed-parameter snapshot.
  ann_signatures  banded hyperplane signatures + norms
                  (vec_id, v, nrm, bands) — near-dup candidates come
                  from equi-joins on (band, bucket); feed to
                  similarity.cosine_near_dup_banded_materialized.
  ann_ivf         IVF coarse-quantizer assignments
                  (vec_id, embedding, nn, centroid_id) — top-k via
                  similarity.ivf_topk_from_index probes inverted lists
                  with no corpus re-scan.
  ann_quantized   symmetric int8 vectors (vec_id, qvec) — 4-8x
                  narrower scans/broadcasts for quantized search
                  (similarity.quantized_topk's storage layout).

Size honesty: ann_signatures and ann_ivf each carry the full vector
column (so the verify/rerank steps are join-free) — together roughly
2x the corpus's embedding bytes, NOT tiny; the truly-narrow tables are
ann_quantized (4x under float32) and the signature/assignment columns
themselves.  Trade vector-free index tables + a corpus join-back if
storage dominates.

Idempotent: re-running the same --snapshot-id is a no-op per table
(is_committed short-circuit), so a crashed build resumes from the
first uncommitted table.

Incremental: --base-snapshot carries the base tables forward and
indexes ONLY the vectors not already present, assigning them against
the base's frozen codebook (daily-crawl ingest: the N x C cost is paid
on the delta, not the corpus).  With an unchanged codebook the result
is row-identical to a from-scratch build — pinned by test.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="ANN index build job")
    p.add_argument("--embeddings", required=True,
                   help="embeddings parquet path (vec_id, embedding)")
    p.add_argument("--warehouse", required=True, help="output catalog root")
    p.add_argument("--snapshot-id", required=True)
    p.add_argument("--bands", type=int, default=8,
                   help="banded-LSH bands for the signature table")
    p.add_argument("--band-planes", type=int, default=4,
                   help="hyperplanes (bits) per band")
    p.add_argument("--centroids", type=int, default=8,
                   help="IVF codebook size")
    p.add_argument("--no-quantize", action="store_true",
                   help="skip the int8 table")
    p.add_argument("--base-snapshot", default=None,
                   help="incremental build: carry the base snapshot's"
                        " tables forward and index only the vectors not"
                        " already in it, assigning them against the"
                        " base's FROZEN codebook (accepts the full"
                        " corpus or just the delta as --embeddings)")
    p.add_argument("--master", default=None)
    args = p.parse_args(argv)
    if args.bands < 1 or args.band_planes < 1 or args.centroids < 1:
        p.error("--bands/--band-planes/--centroids must be >= 1")

    import os

    from ukrainian_ocr_pipeline_spark.sources.pages import is_checkable_local_path
    if is_checkable_local_path(args.embeddings) \
            and not os.path.exists(args.embeddings):
        p.error(f"--embeddings path does not exist: {args.embeddings}")

    from pyspark.sql import SparkSession

    from ukrainian_ocr_pipeline_spark.operators import similarity
    from ukrainian_ocr_pipeline_spark.sources.catalog import SnapshotCatalog
    from ukrainian_ocr_pipeline_spark.sources.session import get_spark

    existing = SparkSession.getActiveSession()
    spark = existing or get_spark(app=f"index-{args.snapshot_id}",
                                  master=args.master)
    cat = SnapshotCatalog(args.warehouse)
    emb = spark.read.parquet(args.embeddings)

    params = {"bands": args.bands, "band_planes": args.band_planes,
              "centroids": args.centroids, "quantize": not args.no_quantize}

    def _param_mismatch(tag, committed):
        print(json.dumps({"error": f"parameter mismatch with {tag}",
                          "committed": committed, "requested": params},
                         sort_keys=True), file=sys.stderr)
        return 2

    if args.base_snapshot:
        # -- incremental: carry the base forward, index only new vectors,
        # assign them against the base's FROZEN codebook (increments must
        # land in the same inverted lists the base corpus uses)
        from pyspark.sql import functions as F
        base = args.base_snapshot
        for t in ("ann_meta", "ann_ivf", "ann_signatures"):
            if not cat.is_committed(t, base):
                p.error(f"--base-snapshot {base} has no committed {t}")
        bmeta = cat.read_snapshot(spark, "ann_meta", base).collect()[0].asDict()
        if {k: bmeta[k] for k in params} != params:
            return _param_mismatch("base snapshot",
                                   {k: bmeta[k] for k in params})
        base_ivf = cat.read_snapshot(spark, "ann_ivf", base)
        base_sigs = cat.read_snapshot(spark, "ann_signatures", base)
        new_emb = emb.join(base_ivf.select("vec_id"), "vec_id", "left_anti")
        # codebook = rows with vec_id < the RECORDED centroid count
        # (ann_meta), not the distinct assigned ids: a duplicate vector
        # pair inside the codebook leaves the higher twin's inverted
        # list empty, and distinct-recovery would drop that centroid,
        # fragmenting base vs from-scratch builds
        cents = (base_ivf.where(F.col("vec_id") < int(bmeta["centroids"]))
                 .select(F.col("vec_id").alias("centroid_id"),
                         F.col("embedding").alias("cvec"),
                         F.col("nn").alias("cn")))
        builders = {
            "ann_signatures": lambda: base_sigs.unionByName(
                similarity.banded_signature_table(
                    new_emb, n_bands=args.bands,
                    band_planes=args.band_planes)),
            "ann_ivf": lambda: base_ivf.unionByName(
                similarity.ivf_assign_to_codebook(new_emb, cents)),
        }
        if not args.no_quantize:
            base_q = cat.read_snapshot(spark, "ann_quantized", base)
            builders["ann_quantized"] = lambda: base_q.unionByName(
                similarity.quantize_int8(new_emb))
        fresh_vectors = bmeta["vectors"] + new_emb.count()
    else:
        builders = {
            "ann_signatures": lambda: similarity.banded_signature_table(
                emb, n_bands=args.bands, band_planes=args.band_planes),
            "ann_ivf": lambda: similarity.ivf_assignments(
                emb, n_centroids=args.centroids),
        }
        if not args.no_quantize:
            builders["ann_quantized"] = lambda: similarity.quantize_int8(emb)
        fresh_vectors = None  # computed lazily below (one footer count)

    # parameter manifest FIRST: a resume under the same snapshot-id with
    # different flags (or a different-size corpus) must fail loudly, not
    # mix tables built under different parameters into one snapshot
    if cat.is_committed("ann_meta", args.snapshot_id):
        meta = cat.read_snapshot(spark, "ann_meta",
                                 args.snapshot_id).collect()[0].asDict()
        committed = {k: meta[k] for k in params}
        if committed != params:
            return _param_mismatch("committed snapshot", committed)
        n_vectors = meta["vectors"]
        got = fresh_vectors if fresh_vectors is not None else emb.count()
        if got != n_vectors:
            print(json.dumps({"error": "corpus size differs from committed "
                              "snapshot", "committed_vectors": n_vectors},
                             sort_keys=True), file=sys.stderr)
            return 2
    else:
        n_vectors = (fresh_vectors if fresh_vectors is not None
                     else emb.count())
        cat.write_snapshot(
            spark.createDataFrame([{**params, "vectors": n_vectors}]),
            "ann_meta", args.snapshot_id)

    stats = {"vectors": n_vectors, "bands": args.bands,
             "band_planes": args.band_planes, "centroids": args.centroids}
    for table, build in builders.items():
        if not cat.is_committed(table, args.snapshot_id):
            cat.write_snapshot(build(), table, args.snapshot_id)
        stats[table] = cat.read_snapshot(spark, table,
                                         args.snapshot_id).count()

    print(json.dumps(stats, sort_keys=True))
    if existing is None:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
