"""End-to-end tests of the classifier-training job (jobs/train.py):
committed-table parity with the standalone operators, idempotent
re-runs, and the corpus/hyperparameter resume guard."""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "jobs"))

SF_DIR = "/root/testdata/sf0.001"


def test_train_job_trains_scores_and_evals(spark, tmp_path, capsys):
    import train as job

    from ukrainian_ocr_pipeline_spark.operators import textstats
    from ukrainian_ocr_pipeline_spark.sources.catalog import SnapshotCatalog

    docs_path = f"{SF_DIR}/documents.parquet"
    wh = str(tmp_path / "wh")
    rc = job.main(["--docs", docs_path, "--warehouse", wh,
                   "--snapshot-id", "clf1"])
    assert rc == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["docs"] == 500
    assert stats["weights"] >= 2  # bias + at least one feature bucket
    assert 0.0 <= stats["accuracy_r"] <= 1.0

    cat = SnapshotCatalog(wh)
    docs = spark.read.parquet(docs_path)

    # committed weights == the standalone trainer, cell-exact
    got_w = {r["feature"]: r["weight_r"] for r in
             cat.read_snapshot(spark, "clf_weights", "clf1").collect()}
    want_w = {r["feature"]: r["weight_r"] for r in
              textstats.logreg_train(docs).collect()}
    assert got_w == want_w

    # committed scores == applying the committed weights standalone
    got_s = {r["doc_id"]: (r["is_target"], r["p_target_r"], r["predicted"])
             for r in cat.read_snapshot(spark, "clf_scores",
                                        "clf1").collect()}
    weights = cat.read_snapshot(spark, "clf_weights", "clf1")
    want_s = {r["doc_id"]: (r["is_target"], r["p_target_r"], r["predicted"])
              for r in textstats.logreg_apply(docs, weights).collect()}
    assert got_s == want_s

    # committed eval is consistent with the committed scores
    ev = cat.read_snapshot(spark, "clf_eval", "clf1").collect()[0]
    assert ev["n_docs"] == 500
    assert ev["tp"] + ev["fp"] + ev["fn"] + ev["tn"] == 500
    assert ev["tp"] + ev["fn"] == sum(1 for v in got_s.values() if v[0])

    # idempotent re-run: no retraining, identical stats, one manifest
    rc = job.main(["--docs", docs_path, "--warehouse", wh,
                   "--snapshot-id", "clf1"])
    assert rc == 0
    stats2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats2 == stats
    for t in ("clf_meta", "clf_weights", "clf_scores", "clf_eval"):
        assert len(os.listdir(os.path.join(wh, t, "snapshots"))) == 1

    # resume with different hyperparameters -> rc 2, nothing rewritten
    rc = job.main(["--docs", docs_path, "--warehouse", wh,
                   "--snapshot-id", "clf1", "--iters", "5"])
    assert rc == 2
    err = json.loads(capsys.readouterr().err.strip().splitlines()[-1])
    assert "mismatch" in err["error"]
    rc = job.main(["--docs", docs_path, "--warehouse", wh,
                   "--snapshot-id", "clf1", "--target-lang", "fr"])
    assert rc == 2
    capsys.readouterr()
    for t in ("clf_meta", "clf_weights", "clf_scores", "clf_eval"):
        assert len(os.listdir(os.path.join(wh, t, "snapshots"))) == 1


def test_train_job_corpus_mismatch_and_arg_validation(spark, tmp_path,
                                                      capsys):
    import pytest
    import train as job

    docs_path = f"{SF_DIR}/documents.parquet"
    wh = str(tmp_path / "wh")
    rc = job.main(["--docs", docs_path, "--warehouse", wh,
                   "--snapshot-id", "clf1"])
    assert rc == 0
    capsys.readouterr()

    # same snapshot-id, different corpus -> rc 2 (fingerprint differs)
    other = str(tmp_path / "other.parquet")
    spark.read.parquet(docs_path).limit(100).write.parquet(other)
    rc = job.main(["--docs", other, "--warehouse", wh,
                   "--snapshot-id", "clf1"])
    assert rc == 2
    err = json.loads(capsys.readouterr().err.strip().splitlines()[-1])
    assert "mismatch" in err["error"]

    for bad in (["--buckets", "0"], ["--iters", "0"],
                ["--target-lang", ""], ["--lr", "0"], ["--lr", "-1"],
                ["--lr", "nan"], ["--lr", "inf"]):
        with pytest.raises(SystemExit):
            job.main(["--docs", docs_path, "--warehouse", wh,
                      "--snapshot-id", "x"] + bad)


def test_logreg_auc_math(spark):
    """AUC values on hand-computable score sets: perfect separation,
    midrank tie handling, the constant classifier, and the
    single-class NULL guard."""
    from ukrainian_ocr_pipeline_spark.operators import textstats

    def auc(rows):
        df = spark.createDataFrame(
            [(i, t, p, p >= 0.5) for i, (t, p) in enumerate(rows)],
            "doc_id long, is_target boolean, p_target_r double, "
            "predicted boolean")
        return textstats.logreg_auc(df).collect()[0]

    r = auc([(True, 0.9), (True, 0.8), (False, 0.7), (False, 0.1)])
    assert (r["n_pos"], r["n_neg"], r["auc_r"]) == (2, 2, 1.0)

    # midrank tie handling: pos=[0.5] vs neg=[0.5, 0.1] — the positive
    # fully beats 0.1 and half-credits the tied 0.5 -> (1 + 0.5)/2
    r = auc([(True, 0.5), (False, 0.5), (False, 0.1)])
    assert r["auc_r"] == 0.75

    # constant classifier scores exactly 0.5 under midranks
    r = auc([(True, 0.4), (False, 0.4), (True, 0.4), (False, 0.4)])
    assert r["auc_r"] == 0.5

    # single-class inputs -> NULL, not a crash or division error
    assert auc([(True, 0.9), (True, 0.1)])["auc_r"] is None
    assert auc([(False, 0.9)])["auc_r"] is None
