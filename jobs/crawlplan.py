"""spark-submit entry point for the crawl-planning job.

    spark-submit --py-files engine.zip jobs/crawlplan.py \
        --robots robots.parquet --sitemaps sitemaps.parquet \
        --warehouse /path/to/warehouse --snapshot-id plan-001 \
        --as-of 2024-03-01 [--fetchlog fetchlog.parquet]
        [--redirects redirects.parquet] [--agent researchbot]
        [--budget N] [--max-age-days 45] [--default-delay 1.0]
        [--max-hops 8]

The planning half of a crawl cycle — everything a polite,
freshness-aware crawler decides BEFORE paying for a single fetch,
composed from the already-verified crawl-layer operators:

  1. robots.parse_robots_rules / parse_crawl_delay — per-host policy
     for --agent (RFC 9309 group election).
  2. robots.parse_sitemap_directives — sitemap discovery (committed as
     ``plan_sitemaps`` for the NEXT cycle's sitemap fetches).
  3. crawl.parse_sitemap — the per-host sitemap XML into page entries
     with lastmod/priority.
  4. crawl.recrawl_candidates — new / modified / aged / fresh against
     --fetchlog at the explicit --as-of date (no wall clock; without a
     fetch log every page is 'new').  Committed as ``plan_recrawl``,
     the full audit including pages NOT scheduled.
  5. redirect folding (--redirects): candidates whose URL is a known
     redirect are rewritten to their resolved terminal
     (crawl.resolve_redirects, pointer doubling; duplicate map srcs
     collapse deterministically first); dead chains (cycles /
     over-limit / missing Location) are dropped and counted.  A
     cross-host redirect is re-keyed to its TARGET host — rules,
     crawl-delay, and budget all follow the host actually fetched.
  6. robots.robots_gate — per-URL allow/deny under the parsed rules
     (a bare-host URL gates as path '/').  The folded+gated audit is
     committed as ``plan_candidates``; the frontier build and the
     stats line both read it instead of recomputing.
  7. crawl.frontier_assign — per-host politeness schedule
     (fetch_round, eta_seconds) over the surviving candidates, scored
     by sitemap priority.  Committed as ``plan_frontier``.
  8. (--budget N) crawl.allocate_crawl_budget — the largest-remainder
     fetch-budget split across hosts by candidate count.  Committed as
     ``plan_budget``; sum(quota) == N exactly.

All tables commit atomically through the snapshot catalog: re-running
the same --snapshot-id is an idempotent no-op, a crashed run resumes
from nothing-committed (the same contract as jobs/curate.py and
jobs/report.py).

Scale shape: every input here is host-sized or sitemap-entry-sized
(orders of magnitude below the page corpus); the only corpus-scale
join in the cycle — candidate URL x fetch log — is one shuffle
equi-join; the frontier window partitions by host, never globally.
No Python workers, no collect: the only driver-side rows are the
final stats line.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="crawl-planning job")
    p.add_argument("--robots", required=True,
                   help="per-host robots parquet (host, robots_txt)")
    p.add_argument("--sitemaps", required=True,
                   help="per-host sitemap parquet (host, sitemap_xml)")
    p.add_argument("--warehouse", required=True, help="output catalog root")
    p.add_argument("--snapshot-id", required=True)
    p.add_argument("--as-of", required=True,
                   help="ISO date the freshness decision is made AT "
                        "(explicit — the plan is a pure function of "
                        "its inputs, never a wall clock)")
    p.add_argument("--fetchlog", default=None,
                   help="committed fetch log parquet (url, last_fetch); "
                        "omitted = first cycle, every page is 'new'")
    p.add_argument("--redirects", default=None,
                   help="redirect map parquet (src, dst) from the "
                        "previous cycle's fetch responses")
    p.add_argument("--agent", default="*", help="robots user-agent token")
    p.add_argument("--max-age-days", type=int, default=45,
                   help="blind-refresh age for pages without lastmod")
    p.add_argument("--default-delay", type=float, default=1.0,
                   help="crawl delay for hosts without a directive")
    p.add_argument("--max-hops", type=int, default=8,
                   help="redirect-chain resolution bound")
    p.add_argument("--budget", type=int, default=0,
                   help="if > 0, also commit plan_budget: the "
                        "largest-remainder fetch-budget split across "
                        "hosts by candidate count")
    p.add_argument("--master", default=None,
                   help="override spark master (default from session)")
    args = p.parse_args(argv)

    import re
    if not re.match(r"^\d{4}-\d{2}-\d{2}$", args.as_of):
        p.error("--as-of must be an ISO date (YYYY-MM-DD)")
    if args.max_age_days <= 0:
        p.error("--max-age-days must be > 0")
    if args.max_hops <= 0:
        p.error("--max-hops must be > 0")
    if args.budget < 0:
        p.error("--budget must be >= 0")
    if args.default_delay < 0:
        p.error("--default-delay must be >= 0")

    from pyspark.sql import SparkSession, functions as F

    from ukrainian_ocr_pipeline_spark.operators import crawl, robots
    from ukrainian_ocr_pipeline_spark.sources.catalog import SnapshotCatalog
    from ukrainian_ocr_pipeline_spark.sources.session import get_spark

    existing = SparkSession.getActiveSession()
    spark = existing or get_spark(app=f"crawlplan-{args.snapshot_id}",
                                  master=args.master)
    cat = SnapshotCatalog(args.warehouse)

    # normalize EVERY host key to the canonical form candidates are
    # re-keyed to (lowercase, no www — webnorm.canonical_host's host
    # treatment): a robots row keyed 'www.Site.com' must still supply
    # the rules and Crawl-delay for candidates whose folded URLs say
    # 'site.com', else its policy silently drops to allow-all/default
    host_key = F.regexp_replace(F.lower(F.col("host")), "^www\\.", "")
    robots_tbl = (spark.read.parquet(args.robots)
                  .withColumn("host", host_key))
    sitemaps_tbl = (spark.read.parquet(args.sitemaps)
                    .withColumn("host", host_key))
    if args.fetchlog is not None:
        fetchlog = spark.read.parquet(args.fetchlog)
    else:
        fetchlog = spark.createDataFrame(
            [], "url string, last_fetch string")

    rules = robots.parse_robots_rules(robots_tbl, agent=args.agent)
    delays = robots.parse_crawl_delay(robots_tbl, agent=args.agent)

    def build_sitemaps_discovered():
        return robots.parse_sitemap_directives(robots_tbl)

    # sitemaps in the wild repeat locs (and two hosts can cross-submit
    # one URL): collapse to one row per (host, loc) BEFORE any join so
    # downstream counts never multiply — most recent lastmod, highest
    # declared priority
    pages = (crawl.parse_sitemap(sitemaps_tbl)
             .where(F.col("entry_type") == "page")
             .groupBy("host", "loc")
             .agg(F.max("lastmod").alias("lastmod"),
                  F.max("priority").alias("priority")))

    def build_recrawl():
        return crawl.recrawl_candidates(
            pages, fetchlog, as_of=args.as_of,
            max_age_days=args.max_age_days)

    def build_candidates():
        """Refetch set -> redirect-folded -> robots-gated audit table:
        one row per refetch candidate with the folded url, the TARGET
        host, and the dead/allowed verdicts.  Committed so the
        frontier build AND the stats line read one materialized
        result instead of re-running redirect resolution."""
        from ukrainian_ocr_pipeline_spark.operators import webnorm
        cand = (cat.read_snapshot(spark, "plan_recrawl", args.snapshot_id)
                .where(F.col("refetch"))
                .join(pages.select("host", "loc", "priority"),
                      ["host", "loc"]))
        if args.redirects is not None:
            # fetch-log-derived maps carry duplicate srcs (retries):
            # deterministic min-dst collapse, resolve_redirects
            # requires unique srcs (same discipline as
            # crawl.resolve_frontier_urls)
            rmap = (spark.read.parquet(args.redirects)
                    .groupBy("src").agg(F.min("dst").alias("dst")))
            res = crawl.resolve_redirects(rmap, max_hops=args.max_hops)
            cand = (cand.join(res, cand["loc"] == res["src"], "left")
                    .withColumn("dead_redirect",
                                F.col("src").isNotNull()
                                & ~F.coalesce(F.col("resolved"),
                                              F.lit(False)))
                    .withColumn("url", F.coalesce("final_url", "loc"))
                    .drop("src", "final_url", "hops", "resolved"))
        else:
            cand = (cand.withColumn("url", F.col("loc"))
                    .withColumn("dead_redirect", F.lit(False)))
        # a cross-host redirect must be gated by and scheduled under
        # the TARGET's host — rules, crawl-delay, and budget all key on
        # the host actually fetched (robots/sitemap host keys are
        # canonical: lowercase, no www — the canonical_host contract)
        cand = cand.withColumn("host", webnorm.canonical_host("url"))
        # the gate matches PATHS against prefix rules; RFC 9309 treats
        # the match target as path(+query) with an empty path read as
        # '/', so anything not starting with '/' (bare host, or a
        # query-only URL like 'https://h?x=1') gets the slash
        # prepended — else 'Disallow: /' is bypassed
        p = F.regexp_extract("url", "^[A-Za-z]+://[^/?#]+([^#]*)", 1)
        cand = cand.withColumn(
            "path", F.when(p.startswith("/"), p)
                     .otherwise(F.concat(F.lit("/"), p)))
        gated = robots.robots_gate(cand, F.broadcast(rules))
        # one audit row per fetchable (host, url): two locs can fold
        # onto one target (redirect merge, cross-host sitemap
        # cross-submission after re-keying) — without this collapse
        # the audit counts disagree with the deduped frontier.  The
        # gate verdict is a pure function of (host, path), so grouped
        # rows agree on it; loc/priority collapse deterministically
        return (gated
                .groupBy("host", "url")
                .agg(F.min("loc").alias("loc"),
                     F.max("priority").alias("priority"),
                     F.min("reason").alias("reason"),
                     F.max("dead_redirect").alias("dead_redirect"),
                     F.min("allowed").alias("allowed"),
                     F.max("matched_prefix").alias("matched_prefix"))
                .select("host", "loc", "url", "priority", "reason",
                        "dead_redirect", "allowed", "matched_prefix"))

    def build_frontier():
        cand = cat.read_snapshot(spark, "plan_candidates",
                                 args.snapshot_id)
        allowed = (cand
                   .where(F.col("allowed") & ~F.col("dead_redirect"))
                   .groupBy("host", "url")
                   .agg(F.max("priority").alias("score")))
        return crawl.frontier_assign(
            allowed, F.broadcast(delays),
            default_delay=args.default_delay)

    def build_budget():
        frontier = cat.read_snapshot(spark, "plan_frontier",
                                     args.snapshot_id)
        per_host = frontier.groupBy("host").agg(
            F.count("*").alias("score"))
        return crawl.allocate_crawl_budget(per_host, args.budget)

    tables = [("plan_sitemaps", build_sitemaps_discovered),
              ("plan_recrawl", build_recrawl),
              ("plan_candidates", build_candidates),
              ("plan_frontier", build_frontier)]
    if args.budget > 0:
        tables.append(("plan_budget", build_budget))
    for table, build in tables:
        if not cat.is_committed(table, args.snapshot_id):
            cat.write_snapshot(build(), table, args.snapshot_id)

    recrawl = cat.read_snapshot(spark, "plan_recrawl", args.snapshot_id)
    reasons = {f"pages_{r['reason']}": r["n"] for r in
               recrawl.groupBy("reason").agg(F.count("*").alias("n"))
               .collect()}
    frontier = cat.read_snapshot(spark, "plan_frontier", args.snapshot_id)
    # all stats read COMMITTED tables (the jobs/report.py discipline):
    # an idempotent re-run reports the pinned plan without re-running
    # redirect resolution or the gate
    cand = cat.read_snapshot(spark, "plan_candidates", args.snapshot_id)
    audit = cand.agg(
        F.count("*").alias("n_refetch"),
        F.sum(F.when(F.col("dead_redirect"), 1).otherwise(0))
         .alias("n_dead"),
        F.sum(F.when(~F.col("dead_redirect") & ~F.col("allowed"), 1)
               .otherwise(0)).alias("n_denied")).collect()[0]
    stats = {"snapshot_id": args.snapshot_id, "agent": args.agent,
             "as_of": args.as_of,
             "sitemap_pages": recrawl.count(),
             **reasons,
             "refetch_candidates": audit["n_refetch"],
             "dead_redirects": int(audit["n_dead"] or 0),
             "denied_robots": int(audit["n_denied"] or 0),
             "frontier_urls": frontier.count(),
             "hosts": frontier.select("host").distinct().count(),
             "sitemaps_discovered": cat.read_snapshot(
                 spark, "plan_sitemaps", args.snapshot_id).count()}
    if args.budget > 0:
        budget = cat.read_snapshot(spark, "plan_budget", args.snapshot_id)
        stats["budget_quota_total"] = (
            budget.agg(F.sum("quota")).collect()[0][0] or 0)
    print(json.dumps(stats))

    if existing is None:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
