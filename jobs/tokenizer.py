"""spark-submit entry point for the distributed tokenizer-training job.

    spark-submit --py-files engine.zip jobs/tokenizer.py \
        --docs /path/to/documents.parquet --warehouse /path/to/wh \
        --snapshot-id tok-001 [--merges 50]

Trains a BPE merges table ON the corpus (textstats.bpe_train_merges —
the corpus is read once for the pretoken vocabulary; every merge round
runs over that Zipf-bounded vocab table only) and commits it together
with per-document token counts ENCODED WITH the freshly trained table —
the tokenizer-then-count step of a training-data pipeline, as one
idempotent deployable job.

Output tables (all under the catalog, all per-snapshot):
  tok_meta          (n_docs, corpus_fp, corpus_fp2, family,
                    merges_requested, vocab_requested, seed_requested)
                    — committed FIRST; a resume under the same
                    snapshot-id against a different corpus
                    (fingerprinted over (doc_id, text) — xor plus a
                    multiplicity-sensitive modular sum, so even
                    same-size reshuffles and duplicate-pair swaps are
                    caught) or a different --merges fails loudly
                    (rc 2), including when a concurrent writer won the
                    meta commit with different inputs.
  bpe_merges        (rank, a, b) — the trained merge table in training
                    order (rank = priority, lower merges first); a
                    resume skips retraining.
  bpe_token_counts  (doc_id, n_bpe_tokens) under the committed table.

With ``--family unigram`` the job trains the OTHER production
tokenizer family instead — the unigram-LM (SentencePiece-style) hard-EM
trainer (operators/unigramlm.unigram_train_pieces; same
corpus-read-once / bounded-vocab-table discipline) — and commits:
  unigram_pieces         (rank, piece, count) — integer Viterbi counts
                         in model order (count desc, piece desc).
  unigram_token_counts   (doc_id, n_unigram_tokens) encoded under the
                         freshly trained table.
The tok_meta manifest records the family plus the family's size knobs,
so resuming a snapshot-id under a different family, --merges,
--vocab-size or --seed-pieces fails loudly (rc 2).

Determinism: both trainers reproduce their pure-Python spec twins
bit-for-bit (spec/bpe.py train_merges, spec/unigram.py train_pieces;
pinned by tests), so each committed table is a pure function of the
corpus — re-training under a new snapshot-id yields the identical
table.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser(
        description="tokenizer training job (BPE or unigram-LM family)")
    p.add_argument("--docs", required=True,
                   help="documents parquet path (doc_id, text, ...)")
    p.add_argument("--warehouse", required=True, help="output catalog root")
    p.add_argument("--snapshot-id", required=True)
    p.add_argument("--merges", type=int, default=None,
                   help="number of merge rounds to train (default 50; "
                        "bpe family only)")
    p.add_argument("--family", choices=("bpe", "unigram"), default="bpe",
                   help="tokenizer family to train (default bpe)")
    p.add_argument("--vocab-size", type=int, default=None,
                   help="target piece-vocabulary size (unigram family "
                        "only; default 400)")
    p.add_argument("--seed-pieces", type=int, default=None,
                   help="multi-char seed candidates before pruning "
                        "(unigram family only; default 2000)")
    p.add_argument("--master", default=None)
    args = p.parse_args(argv)
    # family/knob coherence (the curate.py --neardup-threshold pattern):
    # a silently ignored knob is a wrong-output footgun, so an explicit
    # knob for the OTHER family is a parse-time error; defaults resolve
    # only after the check.
    if args.family == "unigram":
        if args.merges is not None:
            p.error("--merges applies to the bpe family only "
                    "(got --family unigram)")
    else:
        if args.vocab_size is not None:
            p.error("--vocab-size applies to the unigram family only "
                    "(got --family bpe)")
        if args.seed_pieces is not None:
            p.error("--seed-pieces applies to the unigram family only "
                    "(got --family bpe)")
    if args.merges is None:
        args.merges = 50
    if args.vocab_size is None:
        args.vocab_size = 400
    if args.seed_pieces is None:
        args.seed_pieces = 2000
    if args.merges < 1:
        p.error("--merges must be >= 1")
    if args.vocab_size < 1:
        p.error("--vocab-size must be >= 1")
    if args.seed_pieces < 1:
        p.error("--seed-pieces must be >= 1")

    import os

    from ukrainian_ocr_pipeline_spark.sources.pages import is_checkable_local_path
    if is_checkable_local_path(args.docs) and not os.path.exists(args.docs):
        p.error(f"--docs path does not exist: {args.docs}")

    from pyspark.sql import SparkSession, functions as F

    from ukrainian_ocr_pipeline_spark.operators import textstats
    from ukrainian_ocr_pipeline_spark.sources.catalog import SnapshotCatalog
    from ukrainian_ocr_pipeline_spark.sources.session import get_spark

    existing = SparkSession.getActiveSession()
    spark = existing or get_spark(app=f"tokenizer-{args.snapshot_id}",
                                  master=args.master)
    cat = SnapshotCatalog(args.warehouse)
    docs = spark.read.parquet(args.docs)

    # manifest FIRST (the textindex.py discipline): requested merge
    # count + an order-insensitive corpus fingerprint, so a resume under
    # the same snapshot-id with a different corpus OR a different
    # --merges fails loudly instead of mixing provenance (aggregate
    # totals alone cannot distinguish reshuffled-id corpora; "trained
    # with fewer --merges" is indistinguishable from "vocab exhausted"
    # without the recorded request)
    # corpus_fp2 (bounded modular SUM, multiplicity-sensitive) covers
    # bit_xor's blind spot: even-count duplicate rows xor to zero
    uni = args.family == "unigram"
    rowhash = F.xxhash64("doc_id", F.coalesce("text", F.lit("")))
    manifest = docs.agg(
        F.count("*").alias("n_docs"),
        F.bit_xor(rowhash).alias("corpus_fp"),
        F.sum(F.pmod(rowhash, F.lit(1000003))).alias("corpus_fp2"),
        F.lit(args.family).alias("family"),
        F.lit(-1 if uni else args.merges).alias("merges_requested"),
        F.lit(args.vocab_size if uni else -1).alias("vocab_requested"),
        F.lit(args.seed_pieces if uni else -1).alias("seed_requested"))
    # collect the requested manifest ONCE, commit it from the literal
    # row, then compare against whatever row actually won the commit —
    # a lost race against a concurrent writer with a different corpus
    # or --merges must fail loudly, not proceed to train
    got = manifest.collect()[0].asDict()
    if not cat.is_committed("tok_meta", args.snapshot_id):
        cat.write_snapshot(spark.createDataFrame([got], manifest.schema),
                           "tok_meta", args.snapshot_id)
    meta = cat.read_snapshot(spark, "tok_meta",
                             args.snapshot_id).collect()[0].asDict()
    if "family" not in meta:
        # pre-family manifest (bpe-only job versions recorded 4 keys):
        # a bpe resume with matching corpus + --merges must still work,
        # so compare on the legacy key set and treat the snapshot as
        # family=bpe — anything else is a real mismatch
        meta = {**meta, "family": "bpe",
                "vocab_requested": -1, "seed_requested": -1}
    if got != meta:
        print(json.dumps({"error": "corpus or tokenizer-parameter "
                          "mismatch with committed snapshot (corpus "
                          "fingerprint / family / --merges / "
                          "--vocab-size / --seed-pieces)",
                          "committed": meta,
                          "requested": got}, sort_keys=True),
              file=sys.stderr)
        if existing is None:
            spark.stop()
        return 2

    if uni:
        from ukrainian_ocr_pipeline_spark.operators import unigramlm

        if cat.is_committed("unigram_pieces", args.snapshot_id):
            pieces = [(r["piece"], r["count"]) for r in
                      cat.read_snapshot(spark, "unigram_pieces",
                                        args.snapshot_id)
                      .orderBy("rank").collect()]
        else:
            pieces = unigramlm.unigram_train_pieces(
                docs, vocab_size=args.vocab_size, n_seed=args.seed_pieces)
            cat.write_snapshot(
                spark.createDataFrame(
                    [(i, p, c) for i, (p, c) in enumerate(pieces)],
                    "rank long, piece string, count long"),
                "unigram_pieces", args.snapshot_id)
            pieces = [(r["piece"], r["count"]) for r in
                      cat.read_snapshot(spark, "unigram_pieces",
                                        args.snapshot_id)
                      .orderBy("rank").collect()]

        if not cat.is_committed("unigram_token_counts", args.snapshot_id):
            cat.write_snapshot(
                unigramlm.unigram_token_counts(docs, pieces=pieces),
                "unigram_token_counts", args.snapshot_id)
        counts = cat.read_snapshot(spark, "unigram_token_counts",
                                   args.snapshot_id)
        agg = counts.agg(
            F.count("*").alias("docs"),
            F.sum("n_unigram_tokens").alias("tokens")).collect()[0]
        print(json.dumps({"family": "unigram",
                          "pieces_trained": len(pieces),
                          "docs": agg["docs"],
                          "total_unigram_tokens": int(agg["tokens"] or 0)},
                         sort_keys=True))
        if existing is None:
            spark.stop()
        return 0

    if cat.is_committed("bpe_merges", args.snapshot_id):
        merges = [(r["a"], r["b"]) for r in
                  cat.read_snapshot(spark, "bpe_merges", args.snapshot_id)
                  .orderBy("rank").collect()]
    else:
        merges = textstats.bpe_train_merges(docs, n_merges=args.merges)
        cat.write_snapshot(
            spark.createDataFrame(
                [(i, a, b) for i, (a, b) in enumerate(merges)],
                "rank long, a string, b string"),
            "bpe_merges", args.snapshot_id)
        merges = [(r["a"], r["b"]) for r in
                  cat.read_snapshot(spark, "bpe_merges", args.snapshot_id)
                  .orderBy("rank").collect()]

    if not cat.is_committed("bpe_token_counts", args.snapshot_id):
        cat.write_snapshot(
            textstats.bpe_token_counts(docs, merges=merges),
            "bpe_token_counts", args.snapshot_id)
    counts = cat.read_snapshot(spark, "bpe_token_counts", args.snapshot_id)
    agg = counts.agg(F.count("*").alias("docs"),
                     F.sum("n_bpe_tokens").alias("tokens")).collect()[0]

    print(json.dumps({"merges_trained": len(merges),
                      "docs": agg["docs"],
                      "total_bpe_tokens": int(agg["tokens"] or 0)},
                     sort_keys=True))
    if existing is None:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
