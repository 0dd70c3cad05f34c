"""End-to-end test of the ANN index-build job (jobs/index.py): the
committed index tables are complete, re-runs are idempotent, and the
join-only query paths over the read-back tables are result-identical to
the stateless operators on the same corpus."""

import json
import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "jobs"))

EMB = "/root/testdata/sf0.001/embeddings.parquet"


def test_index_job_end_to_end(spark, tmp_path, capsys):
    import index as job

    from ukrainian_ocr_pipeline_spark.operators import similarity
    from ukrainian_ocr_pipeline_spark.sources.catalog import SnapshotCatalog

    wh = str(tmp_path / "wh")
    rc = job.main(["--embeddings", EMB, "--warehouse", wh,
                   "--snapshot-id", "i1"])
    assert rc == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    emb = spark.read.parquet(EMB)
    n = emb.count()
    cat = SnapshotCatalog(wh)
    assert stats["vectors"] == n
    assert stats["ann_ivf"] == n and stats["ann_quantized"] == n
    assert stats["ann_signatures"] == n  # one row per vector (bands array)

    # -- IVF read path: join-only top-k over the committed table equals
    # the stateless ivf_topk on the raw corpus
    index = cat.read_snapshot(spark, "ann_ivf", "i1")
    qids = list(range(10))
    got = {(r["query_id"], r["rank"], r["neighbor_id"], r["cosine_r"])
           for r in similarity.ivf_topk_from_index(
               index, qids, k=5, nprobe=2).collect()}
    want = {(r["query_id"], r["rank"], r["neighbor_id"], r["cosine_r"])
            for r in similarity.ivf_topk(
                emb, qids, k=5, n_centroids=8, nprobe=2).collect()}
    assert got == want and got

    # join-only means join-only: the plan must scan the WAREHOUSE table
    # and never touch the raw embeddings corpus (re-deriving assignments
    # from EMB is exactly the regression the index exists to prevent)
    plan = (similarity.ivf_topk_from_index(index, qids, k=5)
            ._jdf.queryExecution().executedPlan().toString())
    assert "EvalPython" not in plan
    assert EMB not in plan, plan
    # Spark elides long paths in plan strings — match the visible prefix
    assert "/wh/ann_" in plan, plan

    # -- signature read path: join-only banded near-dup over the
    # committed table equals the stateless query (threshold tuned to the
    # synthetic corpus like the registry query)
    sigs = cat.read_snapshot(spark, "ann_signatures", "i1")
    got_nd = {(r["doc_a"], r["doc_b"], r["cosine_r"]) for r in
              similarity.cosine_near_dup_banded_materialized(
                  emb, threshold=0.4, signatures=sigs).collect()}
    want_nd = {(r["doc_a"], r["doc_b"], r["cosine_r"]) for r in
               similarity.cosine_near_dup_banded(
                   emb, threshold=0.4).collect()}
    assert got_nd == want_nd and got_nd

    # -- quantized table: values match the operator output exactly
    q = cat.read_snapshot(spark, "ann_quantized", "i1")
    got_q = {r["vec_id"]: r["qvec"] for r in q.collect()}
    want_q = {r["vec_id"]: r["qvec"] for r in
              similarity.quantize_int8(emb).collect()}
    assert got_q == want_q

    # -- idempotent re-run: identical stats, one manifest per table
    rc2 = job.main(["--embeddings", EMB, "--warehouse", wh,
                    "--snapshot-id", "i1"])
    assert rc2 == 0
    stats2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats2 == stats
    import glob
    for t in ("ann_signatures", "ann_ivf", "ann_quantized"):
        assert len(glob.glob(f"{wh}/{t}/snapshots/*.json")) == 1


def test_index_job_param_mismatch_rejected(spark, tmp_path, capsys):
    """Resume under the same snapshot-id with different flags (or a
    different corpus) must fail loudly — never mix tables built under
    different parameters into one snapshot."""
    import index as job

    wh = str(tmp_path / "wh")
    assert job.main(["--embeddings", EMB, "--warehouse", wh,
                     "--snapshot-id", "m1", "--centroids", "8"]) == 0
    capsys.readouterr()
    assert job.main(["--embeddings", EMB, "--warehouse", wh,
                     "--snapshot-id", "m1", "--centroids", "16"]) == 2
    err = capsys.readouterr().err
    assert "parameter mismatch" in err
    # same flags still idempotent-OK
    assert job.main(["--embeddings", EMB, "--warehouse", wh,
                     "--snapshot-id", "m1", "--centroids", "8"]) == 0


def test_index_query_derives_codebook_at_any_size(spark, tmp_path, capsys):
    """ivf_topk_from_index takes NO n_centroids parameter: the codebook
    comes from the index itself, so a 16-centroid build queries
    correctly with no caller-supplied size (a wrong caller value used
    to silently drop inverted lists or probe phantom centroids)."""
    import index as job

    from ukrainian_ocr_pipeline_spark.operators import similarity
    from ukrainian_ocr_pipeline_spark.sources.catalog import SnapshotCatalog

    wh = str(tmp_path / "wh")
    assert job.main(["--embeddings", EMB, "--warehouse", wh,
                     "--snapshot-id", "c16", "--centroids", "16"]) == 0
    capsys.readouterr()
    index = SnapshotCatalog(wh).read_snapshot(spark, "ann_ivf", "c16")
    emb = spark.read.parquet(EMB)
    qids = list(range(10))
    got = {(r["query_id"], r["rank"], r["neighbor_id"], r["cosine_r"])
           for r in similarity.ivf_topk_from_index(
               index, qids, k=5, nprobe=2).collect()}
    want = {(r["query_id"], r["rank"], r["neighbor_id"], r["cosine_r"])
            for r in similarity.ivf_topk(
                emb, qids, k=5, n_centroids=16, nprobe=2).collect()}
    assert got == want and got


def test_index_job_incremental_equals_full_rebuild(spark, tmp_path,
                                                   capsys):
    """--base-snapshot: base(first 400 vectors) + increment(full corpus)
    must produce row-identical tables to a from-scratch 500-vector
    build — the codebook is frozen from the base (which contains the
    lowest-id vectors), so assignments, signatures, and quantized rows
    all coincide.  Also pins: delta-only N x C cost (the increment
    assigns 100 vectors, not 500) and base param validation."""
    import index as job

    from ukrainian_ocr_pipeline_spark.sources.catalog import SnapshotCatalog

    emb = spark.read.parquet(EMB)
    base_path = str(tmp_path / "base.parquet")
    emb.where("vec_id < 400").write.parquet(base_path)

    wh = str(tmp_path / "wh")
    assert job.main(["--embeddings", base_path, "--warehouse", wh,
                     "--snapshot-id", "base"]) == 0
    # increment with the FULL corpus (anti-join finds the 100 new rows)
    assert job.main(["--embeddings", EMB, "--warehouse", wh,
                     "--snapshot-id", "inc", "--base-snapshot",
                     "base"]) == 0
    # from-scratch reference build
    assert job.main(["--embeddings", EMB, "--warehouse", wh,
                     "--snapshot-id", "full"]) == 0
    capsys.readouterr()

    cat = SnapshotCatalog(wh)
    for table, key in (("ann_ivf", lambda r: (r["vec_id"],
                                              r["centroid_id"])),
                       ("ann_quantized", lambda r: (r["vec_id"],
                                                    tuple(r["qvec"]))),
                       ("ann_signatures", lambda r: (r["vec_id"],
                                                     tuple(r["bands"])))):
        inc = {key(r) for r in
               cat.read_snapshot(spark, table, "inc").collect()}
        full = {key(r) for r in
                cat.read_snapshot(spark, table, "full").collect()}
        assert inc == full and len(inc) == 500, table

    # mismatched params vs the base are rejected
    assert job.main(["--embeddings", EMB, "--warehouse", wh,
                     "--snapshot-id", "inc2", "--base-snapshot", "base",
                     "--centroids", "16"]) == 2
    assert "parameter mismatch" in capsys.readouterr().err
