"""spark-submit entry point for the classifier-training job.

    spark-submit --py-files engine.zip jobs/train.py \
        --docs /path/to/documents.parquet --warehouse /path/to/wh \
        --snapshot-id clf-001 [--target-lang en] [--buckets 32] \
        [--iters 3] [--lr 5.0]

Trains the fastText-style language/quality gate ON the corpus
(textstats.logreg_train — full-batch logistic-regression gradient
descent over hashed bag-of-words features; the corpus is tokenized
once into a checkpointed feature table that also feeds the scorer),
scores every document with the trained weights (exact integer
micro-unit margin), and commits weights + scores + the one-row
evaluation report as one idempotent deployable job — the
train->score->measure cycle a curation pipeline runs before enabling
a model gate.

Output tables (all under the catalog, all per-snapshot):
  clf_meta     (n_docs, corpus_fp, corpus_fp2, target_lang, n_buckets,
               n_iter, lr) — committed FIRST; a resume under the same
               snapshot-id against a different corpus (fingerprinted
               over (doc_id, text, lang) — xor plus a
               multiplicity-sensitive modular sum) or different
               hyperparameters fails loudly (rc 2), including when a
               concurrent writer won the meta commit with different
               inputs.
  clf_weights  (feature, weight_r) — the trained weight table
               (feature -1 = bias); a resume skips retraining.
  clf_scores   (doc_id, is_target, p_target_r, predicted) — per-doc
               sigmoid score + exact 0-threshold decision under the
               committed weights.
  clf_eval     one row (n_docs, tp, fp, fn, tn, base_rate_r,
               accuracy_r, precision_r, recall_r, f1_r) — the
               model-quality report recorded next to the deployment.

Determinism: weights are a pure function of the corpus (6-dp rounding
between GD rounds; pinned by the quality_classifier_train oracle), and
the scorer's margin accumulates in BIGINT micro-units, so every
committed table is reproducible bit-for-bit under any partitioning.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="classifier training job")
    p.add_argument("--docs", required=True,
                   help="documents parquet path (doc_id, text, lang, ...)")
    p.add_argument("--warehouse", required=True, help="output catalog root")
    p.add_argument("--snapshot-id", required=True)
    p.add_argument("--target-lang", default="en",
                   help="positive-class language label (default en)")
    p.add_argument("--buckets", type=int, default=32,
                   help="hashed feature buckets (default 32)")
    p.add_argument("--iters", type=int, default=3,
                   help="gradient-descent rounds (default 3)")
    p.add_argument("--lr", type=float, default=5.0,
                   help="learning rate (default 5.0)")
    p.add_argument("--master", default=None)
    args = p.parse_args(argv)
    import math

    if args.buckets < 1:
        p.error("--buckets must be >= 1")
    if args.iters < 1:
        p.error("--iters must be >= 1")
    if not args.target_lang:
        p.error("--target-lang must be non-empty")
    # finite-positive also excludes NaN, which would break idempotent
    # re-runs (NaN != NaN in the manifest comparison)
    if not (math.isfinite(args.lr) and args.lr > 0):
        p.error("--lr must be a finite positive number")

    import os

    from ukrainian_ocr_pipeline_spark.sources.pages import is_checkable_local_path
    if is_checkable_local_path(args.docs) and not os.path.exists(args.docs):
        p.error(f"--docs path does not exist: {args.docs}")

    from pyspark.sql import SparkSession, functions as F

    from ukrainian_ocr_pipeline_spark.operators import textstats
    from ukrainian_ocr_pipeline_spark.sources.catalog import SnapshotCatalog
    from ukrainian_ocr_pipeline_spark.sources.session import get_spark

    existing = SparkSession.getActiveSession()
    spark = existing or get_spark(app=f"train-{args.snapshot_id}",
                                  master=args.master)
    cat = SnapshotCatalog(args.warehouse)
    docs = spark.read.parquet(args.docs)

    # manifest FIRST (the tokenizer.py discipline): hyperparameters +
    # an order-insensitive corpus fingerprint over everything the model
    # is a function of — (doc_id, text, lang) — so a resume under the
    # same snapshot-id with a different corpus or different
    # hyperparameters fails loudly instead of mixing provenance.
    # corpus_fp2 (a bounded modular SUM, multiplicity-sensitive) covers
    # the bit_xor blind spot: even-count duplicate rows XOR to zero, so
    # xor alone cannot see equal-count duplicate-pair substitutions.
    rowhash = F.xxhash64("doc_id", F.coalesce("text", F.lit("")),
                         F.coalesce("lang", F.lit("")))
    manifest = docs.agg(
        F.count("*").alias("n_docs"),
        F.bit_xor(rowhash).alias("corpus_fp"),
        F.sum(F.pmod(rowhash, F.lit(1000003))).alias("corpus_fp2"),
        F.lit(args.target_lang).alias("target_lang"),
        F.lit(args.buckets).alias("n_buckets"),
        F.lit(args.iters).alias("n_iter"),
        F.lit(args.lr).alias("lr"))
    # collect the requested manifest ONCE (one corpus pass), commit it
    # from the literal row, then compare against whatever row actually
    # won the commit — a lost race against a concurrent writer with a
    # different corpus/config must fail loudly, not proceed to train
    got = manifest.collect()[0].asDict()
    if not cat.is_committed("clf_meta", args.snapshot_id):
        cat.write_snapshot(
            spark.createDataFrame([got], manifest.schema),
            "clf_meta", args.snapshot_id)
    meta = cat.read_snapshot(spark, "clf_meta",
                             args.snapshot_id).collect()[0].asDict()
    if got != meta:
        print(json.dumps({"error": "corpus or hyperparameter mismatch "
                          "with committed snapshot", "committed": meta,
                          "requested": got}, sort_keys=True),
              file=sys.stderr)
        if existing is None:
            spark.stop()
        return 2

    # ONE tokenize pass feeds both the GD loop and the scorer — built
    # only when a table that actually consumes it is missing (an
    # eval-only resume reads committed clf_scores, no corpus pass)
    need_feats = not all(cat.is_committed(t, args.snapshot_id)
                         for t in ("clf_weights", "clf_scores"))
    if need_feats:
        feats = textstats._logreg_features(
            docs, args.target_lang, "text", "lang", args.buckets)
        if not cat.is_committed("clf_weights", args.snapshot_id):
            cat.write_snapshot(
                textstats.logreg_train(docs, target_lang=args.target_lang,
                                       n_buckets=args.buckets,
                                       n_iter=args.iters, lr=args.lr,
                                       feats=feats),
                "clf_weights", args.snapshot_id)
        weights = cat.read_snapshot(spark, "clf_weights", args.snapshot_id)
        if not cat.is_committed("clf_scores", args.snapshot_id):
            cat.write_snapshot(
                textstats.logreg_apply(docs, weights,
                                       target_lang=args.target_lang,
                                       n_buckets=args.buckets, feats=feats),
                "clf_scores", args.snapshot_id)

    # eval needs only the committed scores — no feature pass
    if not cat.is_committed("clf_eval", args.snapshot_id):
        cat.write_snapshot(
            textstats.logreg_eval(
                cat.read_snapshot(spark, "clf_scores", args.snapshot_id)),
            "clf_eval", args.snapshot_id)

    weights = cat.read_snapshot(spark, "clf_weights", args.snapshot_id)
    ev = cat.read_snapshot(spark, "clf_eval",
                           args.snapshot_id).collect()[0].asDict()
    # threshold-free ranking quality, derived from the committed scores
    # (deterministic, so re-runs print identical stats)
    auc = textstats.logreg_auc(
        cat.read_snapshot(spark, "clf_scores",
                          args.snapshot_id)).collect()[0]["auc_r"]
    stats = {"docs": ev["n_docs"], "weights": weights.count(),
             "predicted_positive": ev["tp"] + ev["fp"],
             "base_rate_r": ev["base_rate_r"],
             "accuracy_r": ev["accuracy_r"],
             "auc_r": auc}
    print(json.dumps(stats, sort_keys=True))
    if existing is None:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
