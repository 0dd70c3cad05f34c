"""spark-submit entry point for the corpus health-report job.

    spark-submit --py-files engine.zip jobs/report.py \
        --docs /path/to/documents.parquet --warehouse /path/to/warehouse \
        --snapshot-id rep-001 [--top-terms 20]

The monitoring artifact a corpus platform runs against every ingest
snapshot: one pass of cheap, mergeable statistics whose output is small
enough to diff between snapshots (the drift alarm for a 100 TB corpus
where re-reading yesterday's data to answer "what changed?" is not an
option).  Every statistic is an already-verified registry operator:

  report_lang     one row per language: doc count, token count, and the
                  HyperLogLog distinct-token estimate NEXT TO the exact
                  distinct (sketches.hll_distinct) — at production
                  scale the exact column is dropped and the sketch is
                  the answer; carrying both here keeps the report
                  self-auditing.
  report_terms    top-K heavy-hitter terms via the count-min sketch
                  (sketches.cm_heavy_hitters) with exact counts and
                  overcounts — boilerplate/spam phrase drift shows up
                  here first.
  report_mixture  one row per (lang, source) domain: the
                  temperature-weighted training-mixture table
                  (textstats.mixture_weights) — sampling weight,
                  expected token draw at --budget-tokens, implied
                  epochs; the table a training run's data loader is
                  configured from.
  report_summary  ONE row: doc counts, NULL/empty-text count, exact
                  content-duplicate rate (dedup.exact_duplicates),
                  mean quality-gate pass rate (textstats.quality_filter)
                  and mean doc length — the headline numbers.
  report_shards   (with --shards N) the deterministic md5 shard
                  manifest (packing.shard_manifest): per-shard
                  doc/token/byte totals + micro-fixed token share —
                  the balance proof a shard writer publishes before a
                  training epoch; every shard id reports a row, empty
                  shards as zeros.

All tables commit atomically through the snapshot catalog:
re-running the same --snapshot-id is an idempotent no-op, a crashed run
resumes from nothing-committed (the same contract as jobs/curate.py and
jobs/index.py).

Scale shape: the corpus is scanned a bounded number of times, each pass
ending in a partial-agg whose shuffle is sketch-sized (registers /
sketch cells / digest groups) or domain-sized (the mixture table's
(lang, source) rows), never row-sized; no Python workers, no collect —
the only driver-side rows are the final tiny stats line.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="corpus health report job")
    p.add_argument("--docs", required=True, help="documents parquet path")
    p.add_argument("--warehouse", required=True, help="output catalog root")
    p.add_argument("--snapshot-id", required=True)
    p.add_argument("--top-terms", type=int, default=20,
                   help="heavy-hitter terms to report")
    p.add_argument("--mixture-alpha", type=float, default=0.7,
                   help="temperature exponent for the report_mixture"
                        " training-mixture table")
    p.add_argument("--budget-tokens", type=int, default=10_000_000,
                   help="training token budget the report_mixture"
                        " expected-draw/epochs columns are computed at")
    p.add_argument("--min-words", type=int, default=5,
                   help="quality-gate minimum word count (summary rate)")
    p.add_argument("--shards", type=int, default=0,
                   help="if > 0, also commit report_shards: the"
                        " deterministic md5 shard manifest (per-shard"
                        " doc/token/byte totals + token share) a shard"
                        " writer publishes before a training epoch")
    p.add_argument("--zipf", action="store_true",
                   help="also commit report_zipf: per-language Zipf"
                        " rank-frequency slope over the top-500 terms"
                        " (textstats.term_zipf_slope) — boilerplate"
                        " floods flatten it, template traps steepen it")
    p.add_argument("--source-gate", action="store_true",
                   help="also commit report_sources: per-source doc"
                        " quality keep-rates + majority-rule verdict"
                        " (textstats.source_quality_gate) — the"
                        " domain-level drop candidates")
    p.add_argument("--master", default=None,
                   help="override spark master (default from session)")
    args = p.parse_args(argv)

    if not (0 <= args.mixture_alpha <= 1):
        # alpha > 1 overweights head domains and a NEGATIVE alpha turns
        # an all-empty-text domain into pow(0, a<0) = Infinity, zeroing
        # every real domain's weight; idempotent commits would then pin
        # the garbage table to the snapshot-id — reject at parse time
        # (same footgun contract as curate.py's --temperature-alpha)
        p.error("--mixture-alpha must be in [0, 1]")
    if args.budget_tokens <= 0:
        p.error("--budget-tokens must be > 0")
    if args.shards < 0:
        # shard_assign would raise anyway, but after the Spark session
        # spun up — same fail-before-work contract as the other flags
        p.error("--shards must be >= 0")

    from pyspark.sql import SparkSession, functions as F

    from ukrainian_ocr_pipeline_spark.operators import (dedup, packing,
                                                        sketches, textstats)
    from ukrainian_ocr_pipeline_spark.sources.catalog import SnapshotCatalog
    from ukrainian_ocr_pipeline_spark.sources.session import get_spark

    existing = SparkSession.getActiveSession()
    spark = existing or get_spark(app=f"report-{args.snapshot_id}",
                                  master=args.master)
    cat = SnapshotCatalog(args.warehouse)
    docs = spark.read.parquet(args.docs)

    # -- per-language table -------------------------------------------------
    def build_lang():
        words = docs.select(
            "lang",
            F.explode(F.coalesce(dedup.word_array("text"), F.array()))
            .alias("word"))
        counts = (words.groupBy("lang")
                  .agg(F.count("*").alias("n_tokens")))
        ndocs = docs.groupBy("lang").agg(F.count("*").alias("n_docs"))
        hll = sketches.hll_distinct(words, key_col="word", group_col="lang")
        # a lang whose docs are ALL NULL/empty text has zero word rows:
        # the left joins would leave NULLs exactly on the partition the
        # drift alarm exists to catch — report zeros, not NULLs
        return (ndocs.join(counts, "lang", "left")
                .join(hll, "lang", "left")
                .select("lang", "n_docs",
                        F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
                        F.coalesce("n_exact", F.lit(0))
                        .alias("distinct_tokens_exact"),
                        F.coalesce("hll_estimate_r", F.lit(0.0))
                        .alias("distinct_tokens_hll_r"),
                        F.coalesce("rel_err_r", F.lit(0.0)).alias("rel_err_r")))

    # -- heavy-hitter terms -------------------------------------------------
    def build_terms():
        return sketches.cm_heavy_hitters(docs, top_k=args.top_terms)

    # -- training-mixture table ----------------------------------------------
    def build_mixture():
        return textstats.mixture_weights(docs, alpha=args.mixture_alpha,
                                         budget_tokens=args.budget_tokens)

    # -- one-row summary ----------------------------------------------------
    def build_summary():
        dups = dedup.exact_duplicates(docs)
        dup_stats = dups.agg(
            F.count("*").alias("n_distinct_content"),
            F.sum(F.col("n_copies") - 1).alias("n_exact_dup_docs"))
        # quality_filter projects to (doc_id, keep, drop_reason) — the
        # text-derived stats come from the docs scan directly
        qf = textstats.quality_filter(docs, min_words=args.min_words)
        q_stats = qf.agg(
            F.count("*").alias("n_docs"),
            F.sum(F.when(F.col("keep"), 1).otherwise(0))
            .alias("n_quality_pass"))
        lens = docs.agg(
            F.sum(F.when(F.col("text").isNull()
                         | (F.length(F.trim("text")) == 0), 1).otherwise(0))
            .alias("n_empty_text"),
            F.round(F.avg(F.coalesce(F.length("text"), F.lit(0))), 2)
            .alias("mean_chars"))
        return (q_stats.crossJoin(dup_stats).crossJoin(lens)
                .select("n_docs", "n_empty_text",
                        "n_distinct_content", "n_exact_dup_docs",
                        F.round(F.col("n_exact_dup_docs")
                                / F.greatest(F.col("n_docs"), F.lit(1)), 6)
                        .alias("dup_rate_r"),
                        "n_quality_pass",
                        F.round(F.col("n_quality_pass")
                                / F.greatest(F.col("n_docs"), F.lit(1)), 6)
                        .alias("quality_pass_rate_r"),
                        "mean_chars"))

    # -- training-shard balance manifest (opt-in) -----------------------------
    def build_shards():
        return packing.shard_manifest(docs, n_shards=args.shards)

    # -- corpus-health extras (opt-in) ----------------------------------------
    def build_zipf():
        return textstats.term_zipf_slope(docs)

    def build_sources():
        # same --min-words as the summary's quality_pass_rate — one
        # report must not contradict itself across tables
        return textstats.source_quality_gate(docs,
                                             min_words=args.min_words)

    tables = [("report_lang", build_lang),
              ("report_terms", build_terms),
              ("report_mixture", build_mixture),
              ("report_summary", build_summary)]
    if args.shards > 0:
        tables.append(("report_shards", build_shards))
    if args.zipf:
        tables.append(("report_zipf", build_zipf))
    if args.source_gate:
        tables.append(("report_sources", build_sources))
    for table, build in tables:
        if not cat.is_committed(table, args.snapshot_id):
            cat.write_snapshot(build(), table, args.snapshot_id)

    summary = cat.read_snapshot(spark, "report_summary",
                                args.snapshot_id).collect()[0].asDict()
    n_langs = cat.read_snapshot(spark, "report_lang", args.snapshot_id).count()
    n_terms = cat.read_snapshot(spark, "report_terms", args.snapshot_id).count()
    n_domains = cat.read_snapshot(spark, "report_mixture",
                                  args.snapshot_id).count()
    stats = {"snapshot_id": args.snapshot_id, "langs": n_langs,
             "terms": n_terms, "mixture_domains": n_domains, **summary}
    if args.shards > 0:
        # read back the COMMITTED table (idempotent re-runs report the
        # pinned manifest, same as every other stats field)
        stats["shards"] = cat.read_snapshot(
            spark, "report_shards", args.snapshot_id).count()
    if args.zipf:
        stats["zipf_langs"] = cat.read_snapshot(
            spark, "report_zipf", args.snapshot_id).count()
    if args.source_gate:
        src = cat.read_snapshot(spark, "report_sources", args.snapshot_id)
        stats["sources"] = src.count()
        stats["sources_flagged"] = src.where(~F.col("keep_source")).count()
    print(json.dumps(stats))

    if existing is None:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
