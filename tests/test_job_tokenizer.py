"""End-to-end tests of the tokenizer-training job (jobs/tokenizer.py):
trained-table parity with the pure-Python trainer, counts parity with
the spec encoder under the trained table, idempotent re-runs, and the
merges-mismatch resume guard."""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "jobs"))

SF_DIR = "/root/testdata/sf0.001"


def test_tokenizer_job_train_and_count(spark, tmp_path, capsys):
    import tokenizer as job

    from ukrainian_ocr_pipeline_spark.sources.catalog import SnapshotCatalog
    from ukrainian_ocr_pipeline_spark.spec import bpe

    docs_path = f"{SF_DIR}/documents.parquet"
    wh = str(tmp_path / "wh")
    rc = job.main(["--docs", docs_path, "--warehouse", wh,
                   "--snapshot-id", "tok1", "--merges", "10"])
    assert rc == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["merges_trained"] == 10
    assert stats["docs"] == 500
    assert stats["total_bpe_tokens"] > 0

    cat = SnapshotCatalog(wh)
    got_merges = [(r["a"], r["b"]) for r in
                  cat.read_snapshot(spark, "bpe_merges", "tok1")
                  .orderBy("rank").collect()]
    texts = [r["text"] for r in
             spark.read.parquet(docs_path).collect() if r["text"]]
    want_merges = bpe.train_merges(texts, n_merges=10)
    assert got_merges == want_merges

    # counts match the spec encoder under the SAME trained table
    ranks = bpe.merge_ranks(got_merges)
    counts = {r["doc_id"]: r["n_bpe_tokens"] for r in
              cat.read_snapshot(spark, "bpe_token_counts", "tok1")
              .collect()}
    for r in spark.read.parquet(docs_path).limit(25).collect():
        want = sum(len(bpe.encode(p, ranks))
                   for p in bpe.pretokenize(r["text"] or ""))
        assert counts[r["doc_id"]] == want, r["doc_id"]

    # idempotent re-run: no retraining, identical stats, one manifest
    rc = job.main(["--docs", docs_path, "--warehouse", wh,
                   "--snapshot-id", "tok1", "--merges", "10"])
    assert rc == 0
    stats2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats2 == stats
    for t in ("tok_meta", "bpe_merges", "bpe_token_counts"):
        assert len(os.listdir(os.path.join(wh, t, "snapshots"))) == 1

    # resume with a DIFFERENT --merges (fewer OR more) -> rc 2 — "more"
    # matters: without the recorded request, a 10-merge table is
    # indistinguishable from an exhausted 50-merge run
    for m in ("5", "50"):
        rc = job.main(["--docs", docs_path, "--warehouse", wh,
                       "--snapshot-id", "tok1", "--merges", m])
        assert rc == 2, m
        assert "mismatch" in capsys.readouterr().err

    # resume against a different corpus -> rc 2
    rc = job.main(["--docs", "/root/testdata/sf0.01/documents.parquet",
                   "--warehouse", wh, "--snapshot-id", "tok1",
                   "--merges", "10"])
    assert rc == 2
    assert "mismatch" in capsys.readouterr().err


def test_tokenizer_job_unigram_family(spark, tmp_path, capsys):
    """--family unigram: trained-table parity with the pure-Python
    trainer, counts parity with the spec Viterbi encoder, idempotent
    re-run, and the family/size mismatch guards."""
    import tokenizer as job

    from ukrainian_ocr_pipeline_spark.sources.catalog import SnapshotCatalog
    from ukrainian_ocr_pipeline_spark.spec import unigram as U

    docs_path = f"{SF_DIR}/documents.parquet"
    wh = str(tmp_path / "wh")
    base = ["--docs", docs_path, "--warehouse", wh,
            "--snapshot-id", "uni1", "--family", "unigram",
            "--vocab-size", "120", "--seed-pieces", "300"]
    rc = job.main(base)
    assert rc == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["family"] == "unigram"
    assert stats["docs"] == 500
    assert stats["total_unigram_tokens"] > 0

    cat = SnapshotCatalog(wh)
    got = [(r["piece"], r["count"]) for r in
           cat.read_snapshot(spark, "unigram_pieces", "uni1")
           .orderBy("rank").collect()]
    texts = [r["text"] for r in
             spark.read.parquet(docs_path).collect() if r["text"]]
    want = U.train_pieces(texts, vocab_size=120, n_seed=300)
    assert got == want
    assert stats["pieces_trained"] == len(want)

    # counts match the spec encoder under the SAME trained table
    logp = U.model_logprobs(dict(got))
    counts = {r["doc_id"]: r["n_unigram_tokens"] for r in
              cat.read_snapshot(spark, "unigram_token_counts", "uni1")
              .collect()}
    for r in spark.read.parquet(docs_path).limit(25).collect():
        assert counts[r["doc_id"]] == U.count_tokens(r["text"] or "", logp)

    # idempotent re-run: identical stats, one manifest per table
    rc = job.main(base)
    assert rc == 0
    stats2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats2 == stats
    for t in ("tok_meta", "unigram_pieces", "unigram_token_counts"):
        assert len(os.listdir(os.path.join(wh, t, "snapshots"))) == 1

    # resume under a different family or size knob -> rc 2
    for bad in (["--docs", docs_path, "--warehouse", wh,
                 "--snapshot-id", "uni1", "--merges", "10"],
                base[:-1] + ["600"],
                base[:-3] + ["80", "--seed-pieces", "300"]):
        rc = job.main(bad)
        assert rc == 2, bad
        assert "mismatch" in capsys.readouterr().err


def test_tokenizer_job_legacy_manifest_resume(spark, tmp_path, capsys):
    """A tok_meta committed by the pre-family job version (4 columns,
    bpe-only) must still resume under identical corpus + --merges, and
    still mismatch loudly under different parameters."""
    import tokenizer as job

    from pyspark.sql import functions as F

    from ukrainian_ocr_pipeline_spark.sources.catalog import SnapshotCatalog

    docs_path = f"{SF_DIR}/documents.parquet"
    wh = str(tmp_path / "wh")
    cat = SnapshotCatalog(wh)
    docs = spark.read.parquet(docs_path)
    rowhash = F.xxhash64("doc_id", F.coalesce("text", F.lit("")))
    legacy = docs.agg(
        F.count("*").alias("n_docs"),
        F.bit_xor(rowhash).alias("corpus_fp"),
        F.sum(F.pmod(rowhash, F.lit(1000003))).alias("corpus_fp2"),
        F.lit(10).alias("merges_requested"))
    cat.write_snapshot(legacy, "tok_meta", "old1")

    rc = job.main(["--docs", docs_path, "--warehouse", wh,
                   "--snapshot-id", "old1", "--merges", "10"])
    assert rc == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["merges_trained"] == 10
    # the legacy manifest is still the only one committed
    assert len(os.listdir(os.path.join(wh, "tok_meta", "snapshots"))) == 1

    # but a different family or merge count against it still fails
    for bad in (["--merges", "20"], ["--family", "unigram"]):
        rc = job.main(["--docs", docs_path, "--warehouse", wh,
                       "--snapshot-id", "old1"] + bad)
        assert rc == 2, bad
        assert "mismatch" in capsys.readouterr().err


def test_tokenizer_job_cross_family_knobs_rejected(capsys):
    """An explicit knob for the OTHER family is a parse-time error
    (argparse p.error -> SystemExit 2), not a silently ignored flag —
    the jobs/curate.py --neardup-threshold coherence convention."""
    import pytest

    import tokenizer as job

    for bad in (["--family", "unigram", "--merges", "5"],
                ["--family", "bpe", "--vocab-size", "100"],
                ["--vocab-size", "100"],     # family defaults to bpe
                ["--family", "bpe", "--seed-pieces", "50"]):
        with pytest.raises(SystemExit) as exc:
            job.main(["--docs", f"{SF_DIR}/documents.parquet",
                      "--warehouse", "/tmp/never-used",
                      "--snapshot-id", "x"] + bad)
        assert exc.value.code == 2, bad
        err = capsys.readouterr().err
        assert "applies to the" in err, (bad, err)
