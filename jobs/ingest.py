"""spark-submit entry point for the WARC ingestion job.

    spark-submit --py-files engine.zip jobs/ingest.py \
        --warc /path/to/warcs --warehouse /path/to/warehouse \
        --snapshot-id crawl-2024-01 [--master local[8]]

The first mile: a directory of `.warc` / `.warc.gz` files (the Common
Crawl delivery format — ~64k gzip'd files per crawl) — or `.wacz` /
`.zip` web-archive containers, whose `*.warc(.gz)` members are walked
via the stdlib central-directory parse with `archive!member` lineage
paths — becomes the canonical `pages` table every downstream job
(extract, curate, index) reads.  Reference analog: the OCR pipeline's image-directory intake
(`ukrainian_ocr/utils/io.py:74-107`) — here the intake is WARC records
instead of image files.

Two tables per snapshot, committed through the snapshot catalog:
  pages       (url, warc_ts, html, text, lang) — clean HTTP-200
              response records, ready for jobs/extract.py
  ingest_log  per-WARC-file record counts by type + parse-error count
              — the per-partition lineage the north rule requires for
              the ingestion stage (one row per input file, so a
              corrupt file in a 64k-file crawl is locatable by name)

Idempotent: re-running the same --snapshot-id is a no-op per table
(catalog is_committed short-circuit), so a crashed ingest resumes.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="WARC ingestion job")
    p.add_argument("--warc", required=True,
                   help="directory or glob of .warc/.warc.gz files "
                        "and/or .wacz/.zip web-archive containers")
    p.add_argument("--warehouse", required=True, help="output catalog root")
    p.add_argument("--snapshot-id", required=True)
    p.add_argument("--cdx", action="store_true",
                   help="also commit the 'cdx' capture-index table "
                        "(SURT key, ts14, digest, byte length per page)")
    p.add_argument("--revisit", action="store_true",
                   help="also commit the 'revisit' table: digest-dup "
                        "captures marked as WARC revisit records with "
                        "WARC-Refers-To pointers (URL-agnostic dedup)")
    p.add_argument("--wat", action="store_true",
                   help="also commit the 'wat' metadata-sidecar table: "
                        "per capture, the WARC/1.0 metadata record whose "
                        "JSON payload carries the normalized <title> and "
                        "every href in document order")
    p.add_argument("--master", default=None)
    args = p.parse_args(argv)

    import os

    from pyspark.sql import SparkSession, functions as F

    from ukrainian_ocr_pipeline_spark.sources.catalog import SnapshotCatalog
    from ukrainian_ocr_pipeline_spark.sources.pages import is_checkable_local_path
    from ukrainian_ocr_pipeline_spark.sources.session import get_spark
    from ukrainian_ocr_pipeline_spark.sources.warc import (
        pages_from_warc, read_warc,
    )

    if is_checkable_local_path(args.warc) and not os.path.exists(args.warc):
        p.error(f"--warc path does not exist: {args.warc}")

    existing = SparkSession.getActiveSession()
    spark = existing or get_spark(app=f"ingest-{args.snapshot_id}",
                                  master=args.master)
    cat = SnapshotCatalog(args.warehouse)

    records = read_warc(spark, args.warc)
    # per-file lineage: one partial-agg exchange over (file, type);
    # tiny output (files x ~4 types) at any crawl size
    log = (records
           .groupBy("warc_file", "warc_type")
           .agg(F.count("*").alias("n_records"),
                F.count(F.col("error")).alias("n_errors"),
                F.sum(F.coalesce(F.col("content_length"), F.lit(0)))
                 .alias("payload_bytes")))
    # 0-byte files are INVISIBLE to binaryFile (no splits -> no rows),
    # so the parser's empty-file row never fires for them; synthesize
    # their lineage rows from a driver-side listing (local dirs only —
    # a failed download leaving a 0-byte .warc must stay locatable)
    if is_checkable_local_path(args.warc) and os.path.isdir(args.warc):
        zero = [os.path.join(args.warc, f)
                for f in sorted(os.listdir(args.warc))
                if f.endswith((".warc", ".warc.gz"))
                and os.path.isfile(os.path.join(args.warc, f))
                and os.path.getsize(os.path.join(args.warc, f)) == 0]
        if zero:
            log = log.unionByName(spark.createDataFrame(
                [(f"file:{os.path.abspath(f)}", None, 1, 1, 0)
                 for f in zero], schema=log.schema))
    cat.write_snapshot(log, "ingest_log", args.snapshot_id)

    # the parse runs once more for the pages write — two passes over
    # the raw bytes instead of caching a crawl-sized dataset in memory
    # (at 100 TB the re-read is the cheap option; the committed log
    # snapshot above makes the passes individually resumable)
    pages = pages_from_warc(read_warc(spark, args.warc))
    cat.write_snapshot(pages, "pages", args.snapshot_id)

    committed_log = cat.read_snapshot(spark, "ingest_log", args.snapshot_id)
    committed = cat.read_snapshot(spark, "pages", args.snapshot_id)
    # archive sidecars read the COMMITTED pages snapshot (not the raw
    # parse) so they are individually resumable and see exactly the
    # table downstream jobs see
    if args.cdx:
        from ukrainian_ocr_pipeline_spark.sources.warc import cdx_index
        cat.write_snapshot(cdx_index(committed), "cdx", args.snapshot_id)
    if args.revisit:
        from ukrainian_ocr_pipeline_spark.sources.warc import revisit_marks
        cat.write_snapshot(revisit_marks(committed), "revisit",
                           args.snapshot_id)
    if args.wat:
        from ukrainian_ocr_pipeline_spark.sources.warc import wat_records
        cat.write_snapshot(wat_records(committed), "wat", args.snapshot_id)
    by_type = {r["warc_type"]: r["n"] for r in
               (committed_log.groupBy("warc_type")
                .agg(F.sum("n_records").alias("n")).collect())}
    summary = {
        "snapshot_id": args.snapshot_id,
        "n_files": committed_log.select("warc_file").distinct().count(),
        "records_by_type": {str(k): int(v) for k, v in sorted(
            by_type.items(), key=lambda kv: str(kv[0]))},
        "n_parse_errors": int(committed_log.agg(
            F.sum("n_errors")).collect()[0][0] or 0),
        "n_pages": committed.count(),
    }
    if args.cdx:
        summary["n_cdx"] = cat.read_snapshot(
            spark, "cdx", args.snapshot_id).count()
    if args.revisit:
        rv = cat.read_snapshot(spark, "revisit", args.snapshot_id)
        counts = {r["record_type"]: r["n"] for r in
                  rv.groupBy("record_type").agg(
                      F.count("*").alias("n")).collect()}
        summary["revisit_by_type"] = {k: int(v) for k, v in
                                      sorted(counts.items())}
    if args.wat:
        wat = cat.read_snapshot(spark, "wat", args.snapshot_id)
        summary["n_wat"] = wat.count()
        summary["wat_links_total"] = int(
            wat.agg(F.sum("n_links")).collect()[0][0] or 0)
    print(json.dumps(summary, sort_keys=True))
    if existing is None:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
