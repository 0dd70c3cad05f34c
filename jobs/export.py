"""spark-submit entry point for the training-data export job.

    spark-submit --py-files engine.zip jobs/export.py \
        --docs /path/to/curated_documents.parquet \
        --warehouse /path/to/warehouse --snapshot-id exp-001 \
        [--budget 4096] [--seed shuffle]

The last mile of the pipeline: after curation (jobs/curate.py), the
corpus is put in ONE deterministic pseudo-random order (the global
shuffle a trainer wants baked into its data) and cut into CONTIGUOUS
shards of ~`--budget` tokens each (packing.training_token_shards), so
shard sizes are balanced by token mass rather than document count.
Two tables commit atomically through the snapshot catalog:

  export_docs      one row per document: (shard_id, shuffle_key,
                   doc_id, n_tokens, lang, text), repartitioned on
                   shard_id and sorted (shard_id, shuffle_key) within
                   partitions so each shard's rows are contiguous and
                   in shuffle order inside the files — a trainer reads
                   shard k in order with no further sort.  At
                   production scale the same frame writes through an
                   Iceberg spec partitioned on shard_id; the layout
                   contract (contiguous, pre-sorted shards) is
                   identical.
  export_manifest  one row per shard: doc/token totals plus the first/
                   last shuffle key — the balance proof published
                   before a training epoch, and the range index a
                   reader uses to locate a shuffle position without
                   scanning.

Determinism: the shuffle key is md5(seed:doc_id) and all shard
arithmetic is integer, so re-running the job on the same corpus —
any partitioning, any parallelism — commits byte-identical tables;
re-running the same --snapshot-id is an idempotent no-op (the same
contract as every other job here).

Scale shape: the global running token sum is the operator's 256-bucket
two-level prefix sum (never a single-partition window over corpus
rows); text rides through as a passthrough column — NO corpus-wide
re-join ships rows a second time; the manifest rollup is one
partial-agg shuffle bounded by shard count.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="training-data export job")
    p.add_argument("--docs", required=True,
                   help="curated documents parquet path")
    p.add_argument("--warehouse", required=True, help="output catalog root")
    p.add_argument("--snapshot-id", required=True)
    p.add_argument("--budget", type=int, default=4096,
                   help="target tokens per shard (default 4096 — a"
                        " fixture-scale value; production exports use"
                        " 10^8-ish)")
    p.add_argument("--seed", default="shuffle",
                   help="shuffle-order seed: a different seed is a"
                        " different deterministic corpus permutation")
    p.add_argument("--master", default=None,
                   help="override spark master (default from session)")
    args = p.parse_args(argv)

    if args.budget <= 0:
        # a non-positive budget would raise inside the operator, but
        # only after the Spark session spun up — same fail-before-work
        # contract as the other jobs
        p.error("--budget must be > 0")
    if not args.seed:
        # an empty seed still works mechanically but silently collides
        # with any other empty-seed export — make the permutation an
        # explicit decision
        p.error("--seed must be non-empty")

    import os

    from ukrainian_ocr_pipeline_spark.sources.pages import is_checkable_local_path
    if is_checkable_local_path(args.docs) and not os.path.exists(args.docs):
        p.error(f"--docs path does not exist: {args.docs}")

    from pyspark.sql import SparkSession, functions as F

    from ukrainian_ocr_pipeline_spark.operators import packing
    from ukrainian_ocr_pipeline_spark.sources.catalog import SnapshotCatalog
    from ukrainian_ocr_pipeline_spark.sources.session import get_spark

    existing = SparkSession.getActiveSession()
    spark = existing or get_spark(app=f"export-{args.snapshot_id}",
                                  master=args.master)
    cat = SnapshotCatalog(args.warehouse)
    docs = spark.read.parquet(args.docs)

    def build_docs():
        assigned = packing.training_token_shards(
            docs, budget=args.budget, seed=args.seed,
            passthrough=("lang", "text"))
        return (assigned
                .select("shard_id", "shuffle_key", "doc_id",
                        "n_tokens", "lang", "text")
                .repartition("shard_id")
                .sortWithinPartitions("shard_id", "shuffle_key"))

    if not cat.is_committed("export_docs", args.snapshot_id):
        cat.write_snapshot(build_docs(), "export_docs", args.snapshot_id)
    exported = cat.read_snapshot(spark, "export_docs", args.snapshot_id)

    def build_manifest():
        # rolled up from the COMMITTED docs table so the manifest can
        # never drift from what was actually written
        return (exported.groupBy("shard_id")
                .agg(F.count("*").cast("long").alias("n_docs"),
                     F.sum("n_tokens").cast("long").alias("n_tokens"),
                     F.min("shuffle_key").alias("first_key"),
                     F.max("shuffle_key").alias("last_key")))

    if not cat.is_committed("export_manifest", args.snapshot_id):
        cat.write_snapshot(build_manifest(), "export_manifest",
                           args.snapshot_id)
    manifest = cat.read_snapshot(spark, "export_manifest",
                                 args.snapshot_id)

    agg = manifest.agg(
        F.count("*").alias("shards"),
        F.sum("n_docs").alias("docs"),
        F.sum("n_tokens").alias("tokens"),
        F.min("n_tokens").alias("min_shard_tokens"),
        F.max("n_tokens").alias("max_shard_tokens")).collect()[0]
    stats = {"snapshot_id": args.snapshot_id, "budget": args.budget,
             "seed": args.seed,
             "shards": agg["shards"], "docs": agg["docs"],
             "tokens": int(agg["tokens"] or 0),
             "min_shard_tokens": int(agg["min_shard_tokens"] or 0),
             "max_shard_tokens": int(agg["max_shard_tokens"] or 0)}
    print(json.dumps(stats, sort_keys=True))

    if existing is None:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
