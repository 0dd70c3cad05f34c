"""spark-submit entry point for the extraction job.

    spark-submit --py-files engine.zip jobs/extract.py \
        --pages /path/to/pages/parquet --warehouse /path/to/warehouse \
        --snapshot-id run-001 [--buckets 64] [--no-matches] [--lexicon f.txt]

Mirrors the reference CLI surface (ukrainian_ocr/cli.py:15-141: config
load, input resolution, dispatch, summary) recast for a cluster: the
pages table in, the extracted/metrics/lineage tables out through the
snapshot catalog (atomic commit + bucket-level resume).

Build engine.zip:  cd repo && zip -r engine.zip ukrainian_ocr_pipeline_spark
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="web-text extraction job")
    p.add_argument("--pages", required=True, help="pages parquet path")
    p.add_argument("--warehouse", required=True, help="output catalog root")
    p.add_argument("--snapshot-id", required=True)
    p.add_argument("--buckets", type=int, default=64,
                   help="resume-granularity buckets (0 = single-commit)")
    p.add_argument("--salt-buckets", type=int, default=None,
                   help="pre-UDF repartition width for skew spreading")
    p.add_argument("--no-matches", action="store_true")
    p.add_argument("--lexicon", default=None, help="file of lexicon terms, one per line")
    p.add_argument("--master", default=None)
    args = p.parse_args(argv)

    from ukrainian_ocr_pipeline_spark.operators.extract import (
        extract_pages, extracted_table, lineage_table, metrics_table, pipeline_stats,
    )
    from ukrainian_ocr_pipeline_spark.sources.catalog import SnapshotCatalog
    from ukrainian_ocr_pipeline_spark.sources.pages import read_pages, validate_pages
    from ukrainian_ocr_pipeline_spark.sources.session import get_spark

    from pyspark.sql import SparkSession
    existing = SparkSession.getActiveSession()
    spark = existing or get_spark(app=f"extract-{args.snapshot_id}", master=args.master)
    lexicon = None
    if args.lexicon:
        with open(args.lexicon, encoding="utf-8") as fh:
            lexicon = [line.strip() for line in fh if line.strip()]

    pages = validate_pages(read_pages(spark, args.pages))
    cat = SnapshotCatalog(args.warehouse)

    def transform(df):
        # ONE UDF pass producing every downstream table's columns; the
        # heavy html payload is dropped before the write
        return extract_pages(df, lexicon=lexicon,
                             salt_buckets=args.salt_buckets,
                             with_matches=not args.no_matches,
                             mode="packed").drop("html", "text")

    if args.buckets > 0:
        cat.write_snapshot_bucketed(pages, "enriched", args.snapshot_id,
                                    n_buckets=args.buckets, transform=transform)
    else:
        cat.write_snapshot(transform(pages), "enriched", args.snapshot_id)

    # extracted / metrics / lineage are cheap projections of the COMMITTED
    # enriched snapshot — no UDF re-execution
    enriched = cat.read_snapshot(spark, "enriched", args.snapshot_id)
    cat.write_snapshot(extracted_table(enriched), "extracted", args.snapshot_id)
    metrics = metrics_table(enriched).cache()
    cat.write_snapshot(metrics, "metrics", args.snapshot_id)
    import hashlib
    # keyed digest, NOT Python's salted hash(): lineage ids must be
    # reproducible across interpreter runs for the same --snapshot-id
    lineage_id = int.from_bytes(
        hashlib.sha256(args.snapshot_id.encode("utf-8")).digest()[:4], "big") & 0x7FFFFFFF
    cat.write_snapshot(lineage_table(enriched, snapshot_id=lineage_id),
                       "lineage", args.snapshot_id)

    stats = pipeline_stats(metrics).toPandas().iloc[0].to_dict()
    print(json.dumps({k: (v if not hasattr(v, "item") else v.item())
                      for k, v in stats.items()}))
    if existing is None:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
