"""End-to-end smoke of the training-export job (jobs/export.py):
export_docs matches the standalone operator (including the passthrough
text), the manifest matches the committed docs, shard token masses
respect the budget cut rule, and re-runs are idempotent."""

import json
import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "jobs"))

SF_DIR = "/root/testdata/sf0.001"


def test_export_job_end_to_end(spark, tmp_path, capsys):
    import export as job

    wh = str(tmp_path / "wh")
    docs_path = f"{SF_DIR}/documents.parquet"
    rc = job.main(["--docs", docs_path, "--warehouse", wh,
                   "--snapshot-id", "e1", "--budget", "512"])
    assert rc == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    from ukrainian_ocr_pipeline_spark.operators import packing
    from ukrainian_ocr_pipeline_spark.sources.catalog import SnapshotCatalog
    cat = SnapshotCatalog(wh)
    docs = spark.read.parquet(docs_path)
    exported = cat.read_snapshot(spark, "export_docs", "e1")
    manifest = cat.read_snapshot(spark, "export_manifest", "e1")

    # every input doc exported exactly once, text intact
    assert exported.count() == docs.count() == stats["docs"]
    want = packing.training_token_shards(
        docs, budget=512, passthrough=("lang", "text"))
    assert exported.exceptAll(want.select(*exported.columns)).count() == 0
    assert want.select(*exported.columns).exceptAll(exported).count() == 0

    # manifest == rollup of the committed docs; stats line adds up
    roll = (exported.groupBy("shard_id")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("n_tokens").alias("n_tokens")))
    got = {r["shard_id"]: (r["n_docs"], r["n_tokens"])
           for r in manifest.collect()}
    assert got == {r["shard_id"]: (r["n_docs"], r["n_tokens"])
                   for r in roll.collect()}
    assert stats["shards"] == manifest.count()
    assert stats["tokens"] == sum(v[1] for v in got.values())
    assert stats["max_shard_tokens"] == max(v[1] for v in got.values())

    # budget cut rule: every shard's token mass starts before its
    # boundary, so a shard exceeds the budget only by (one doc - 1)
    # tokens at most; with budget 512 every NON-LAST shard must carry
    # at least 512 tokens minus the largest single doc's spillover —
    # check the simple invariant instead: cumulative boundaries
    ordered = sorted(got.items())
    cum = 0
    for shard_id, (_, n_tokens) in ordered[:-1]:
        assert cum // 512 == shard_id  # shard starts where it should
        cum += n_tokens

    # shard ids are dense 0..k
    assert [s for s, _ in ordered] == list(range(len(ordered)))

    # idempotent re-run: identical stats, nothing rewritten
    rc = job.main(["--docs", docs_path, "--warehouse", wh,
                   "--snapshot-id", "e1", "--budget", "512"])
    assert rc == 0
    stats2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats2 == stats


def test_export_seed_changes_permutation_not_totals(spark, tmp_path,
                                                    capsys):
    import export as job

    wh = str(tmp_path / "wh")
    docs_path = f"{SF_DIR}/documents.parquet"
    out = {}
    for seed in ("a", "b"):
        rc = job.main(["--docs", docs_path, "--warehouse", wh,
                       "--snapshot-id", f"s-{seed}", "--budget", "512",
                       "--seed", seed])
        assert rc == 0
        out[seed] = json.loads(
            capsys.readouterr().out.strip().splitlines()[-1])
    # same corpus mass, different permutation
    assert out["a"]["tokens"] == out["b"]["tokens"]
    assert out["a"]["docs"] == out["b"]["docs"]

    from ukrainian_ocr_pipeline_spark.sources.catalog import SnapshotCatalog
    cat = SnapshotCatalog(wh)
    a = cat.read_snapshot(spark, "export_docs", "s-a")
    b = cat.read_snapshot(spark, "export_docs", "s-b")
    moved = (a.select("doc_id", "shard_id")
             .join(b.select("doc_id",
                            F.col("shard_id").alias("shard_b")), "doc_id")
             .where(F.col("shard_id") != F.col("shard_b")).count())
    assert moved > 0


def test_export_flag_bounds_rejected(tmp_path):
    import pytest

    import export as job

    with pytest.raises(SystemExit):
        job.main(["--docs", "x", "--warehouse", str(tmp_path),
                  "--snapshot-id", "z", "--budget", "0"])
    with pytest.raises(SystemExit):
        job.main(["--docs", "x", "--warehouse", str(tmp_path),
                  "--snapshot-id", "z", "--seed", ""])
