"""spark-submit entry point for the text (inverted) index-build job.

    spark-submit --py-files engine.zip jobs/textindex.py \
        --docs /path/to/documents.parquet --warehouse /path/to/wh \
        --snapshot-id tix-001

The write-once half of the TEXT-retrieval story, the exact sibling of
jobs/index.py's ANN build: the corpus is tokenized ONCE, the postings
and statistics are committed through the snapshot catalog, and every
later BM25 query is join-only — the query-term IN filter lands on the
postings PARQUET SCAN (real predicate pushdown), so query cost is
proportional to the query's posting lists with zero corpus re-scan
(the 100 TB shape; pinned by tests/test_job_textindex.py).

Index tables (all under the catalog, all per-snapshot):
  text_stats     one row (n_docs, sum_dl, corpus_fp) — committed
                 FIRST; a resume under the same snapshot-id against a
                 different corpus fails loudly instead of mixing
                 tables (corpus_fp fingerprints the (doc_id, dl)
                 pairs, so even a same-size reshuffled-id corpus is
                 rejected).
  text_postings  (term, doc_id, tf) — the full inverted index.
  doc_lengths    (doc_id, dl) including zero-token docs.
  text_terms     (term, df, tf_total) — per-term stats (BM25's df).

Query parity (tests/test_job_textindex.py): bm25_topk_from_index over
the committed tables is row-identical to the stateless
textindex.bm25_topk over the raw corpus, for any query-term set.

Idempotent: re-running the same --snapshot-id is a no-op per table
(is_committed short-circuit), so a crashed build resumes from the
first uncommitted table.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="text index build job")
    p.add_argument("--docs", required=True,
                   help="documents parquet path (doc_id, text, ...)")
    p.add_argument("--warehouse", required=True, help="output catalog root")
    p.add_argument("--snapshot-id", required=True)
    p.add_argument("--master", default=None)
    args = p.parse_args(argv)

    import os

    from ukrainian_ocr_pipeline_spark.sources.pages import is_checkable_local_path
    if is_checkable_local_path(args.docs) and not os.path.exists(args.docs):
        p.error(f"--docs path does not exist: {args.docs}")

    from pyspark.sql import SparkSession

    from ukrainian_ocr_pipeline_spark.operators import textindex
    from ukrainian_ocr_pipeline_spark.sources.catalog import SnapshotCatalog
    from ukrainian_ocr_pipeline_spark.sources.session import get_spark

    existing = SparkSession.getActiveSession()
    spark = existing or get_spark(app=f"textindex-{args.snapshot_id}",
                                  master=args.master)
    cat = SnapshotCatalog(args.warehouse)
    docs = spark.read.parquet(args.docs)
    # ONE eager materialization of the tokenize pass: the stats
    # collect, the corpus-fingerprint guard, and the doc_lengths commit
    # all read this checkpoint instead of each re-tokenizing the corpus
    # (postings_table below is then the only other tokenize pass)
    doclens = textindex.doc_length_table(docs).localCheckpoint(eager=True)

    # corpus manifest FIRST: a resume against a different corpus must
    # fail loudly, not mix tables from two corpora into one snapshot.
    # Collect the requested stats ONCE, commit from the literal row,
    # then compare against whatever row actually won the commit — a
    # lost race against a concurrent writer with a different corpus
    # must also fail loudly, not proceed to build
    stats_df = textindex.corpus_stats_table(doclens)
    got = stats_df.collect()[0].asDict()
    if not cat.is_committed("text_stats", args.snapshot_id):
        cat.write_snapshot(spark.createDataFrame([got], stats_df.schema),
                           "text_stats", args.snapshot_id)
    meta = cat.read_snapshot(spark, "text_stats",
                             args.snapshot_id).collect()[0].asDict()
    if got != meta:
        print(json.dumps({"error": "corpus differs from committed "
                          "snapshot", "committed": meta,
                          "requested": got}, sort_keys=True),
              file=sys.stderr)
        if existing is None:
            spark.stop()
        return 2

    # postings first, terms derived from the COMMITTED postings so the
    # two tables can never disagree even across a crash-resume boundary
    if not cat.is_committed("text_postings", args.snapshot_id):
        cat.write_snapshot(textindex.postings_table(docs),
                           "text_postings", args.snapshot_id)
    postings = cat.read_snapshot(spark, "text_postings", args.snapshot_id)
    builders = {
        "doc_lengths": lambda: doclens,
        "text_terms": lambda: textindex.term_stats_table(postings),
    }
    stats = {}
    for table, build in builders.items():
        if not cat.is_committed(table, args.snapshot_id):
            cat.write_snapshot(build(), table, args.snapshot_id)
        stats[table] = cat.read_snapshot(spark, table,
                                         args.snapshot_id).count()
    stats["text_postings"] = postings.count()
    meta = cat.read_snapshot(spark, "text_stats",
                             args.snapshot_id).collect()[0]
    stats["n_docs"] = meta["n_docs"]
    stats["sum_dl"] = meta["sum_dl"]

    print(json.dumps(stats, sort_keys=True))
    if existing is None:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
