"""Crawl-side operators: sitemap parsing and frontier scheduling.

A production web pipeline does not only consume crawls — it plans
them.  Two pieces the engine needs for that, both pure DataFrame
algebra:

* ``parse_sitemap`` — sitemaps.org XML (``<urlset>`` page entries and
  ``<sitemapindex>`` nested-sitemap entries) into a flat URL table
  with lastmod / priority.  Like robots.txt, sitemaps are per-HOST
  documents: the input is orders of magnitude smaller than the pages
  table, and parsing is regexp extraction at scan speed — split on the
  entry close tags, one regexp_extract per field, JVM-only.
* ``frontier_assign`` — politeness-aware fetch scheduling: rank
  candidate URLs per host by priority score, assign each a per-host
  ``fetch_round`` and an ``eta_seconds`` derived from the host's
  Crawl-delay (robots.parse_crawl_delay).  The window partitions by
  HOST — the natural crawl unit — so a 10^9-URL frontier never sorts
  globally; skew (one mega-host) is bounded by that host's own URL
  count, which is exactly the politeness bottleneck a real crawler
  has anyway.

Subset honesty: regexp-based XML field extraction (no entity decoding,
no namespace handling beyond ignoring attributes) — the same
scan-speed tradeoff as the HTML metadata operators, documented there.

Reference analog: directory listing -> ordered, validated work list
(ukrainian_ocr/utils/io.py:74-107, core/batch_processor.py:164-193);
here the work list is a crawl frontier instead of an image batch.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window, functions as F

from .dedup import WS_CHARS, WS_CLASS

__all__ = ["parse_sitemap", "frontier_assign", "resolve_redirects",
           "resolve_frontier_urls", "allocate_crawl_budget",
           "recrawl_candidates"]

# one capture per field; inline (?i) and char classes only, so the
# Java-regex == RE2 == DuckDB cross-engine contract holds.  Whitespace
# is the explicit class DERIVED from dedup.WS_CHARS, not \s: Java \s
# matches \x0B where RE2 \s does not.
SITEMAP_LOC = f"(?i)<loc>{WS_CLASS}*([^<>]+?){WS_CLASS}*</loc>"
SITEMAP_LASTMOD = f"(?i)<lastmod>{WS_CLASS}*([^<>]+?){WS_CLASS}*</lastmod>"
SITEMAP_PRIORITY = f"(?i)<priority>{WS_CLASS}*([0-9.]+){WS_CLASS}*</priority>"
# entry separator: close of a page entry or of a nested-sitemap entry
SITEMAP_ENTRY_SPLIT = "(?i)</url>|(?i)</sitemap>"
SITEMAP_NESTED_OPEN = f"(?i)<sitemap[{WS_CHARS}>]"


def parse_sitemap(smaps: DataFrame, *, host_col: str = "host",
                  xml_col: str = "sitemap_xml") -> DataFrame:
    """Parse a per-host sitemap table into one row per entry:
    (host, entry_type 'page'|'sitemap', loc, lastmod, priority).

    ``<urlset>`` entries become ``page`` rows; ``<sitemapindex>``
    entries become ``sitemap`` rows (their locs are nested sitemap
    URLs — a driver loop over committed snapshots fetches and re-feeds
    them; the flat parse itself is one narrow pass).  ``lastmod`` is
    kept as the raw W3C datetime string (date-only and full-timestamp
    forms both appear in the wild); ``priority`` defaults to 0.5 per
    the protocol.  Chunks without a ``<loc>`` (prologue, trailing
    close tags) produce no rows."""
    chunk = (smaps
             .select(host_col,
                     F.explode(F.split(F.col(xml_col), SITEMAP_ENTRY_SPLIT))
                      .alias("chunk"))
             .withColumn("loc", F.regexp_extract("chunk", SITEMAP_LOC, 1))
             .where(F.col("loc") != ""))
    lastmod = F.regexp_extract("chunk", SITEMAP_LASTMOD, 1)
    prio = F.regexp_extract("chunk", SITEMAP_PRIORITY, 1)
    return chunk.select(
        host_col,
        F.when(F.col("chunk").rlike(SITEMAP_NESTED_OPEN), F.lit("sitemap"))
         .otherwise(F.lit("page")).alias("entry_type"),
        "loc",
        F.when(lastmod != "", lastmod).alias("lastmod"),
        F.coalesce(F.nullif(prio, F.lit("")).cast("double"),
                   F.lit(0.5)).alias("priority"))


def frontier_assign(urls: DataFrame, delays: DataFrame, *,
                    host_col: str = "host", score_col: str = "score",
                    url_col: str = "url",
                    default_delay: float = 1.0) -> DataFrame:
    """Politeness-aware frontier scheduling.

    ``urls``: candidate fetches (url, host, score — any priority
    signal: sitemap priority, host pagerank, recrawl staleness).
    ``delays``: per-host crawl delays (robots.parse_crawl_delay);
    hosts absent from it get ``default_delay``.

    Adds per URL:
      fetch_round — 1-based rank within its host (score desc, url asc
                    as the deterministic tiebreak),
      eta_seconds — (fetch_round - 1) * crawl_delay: the earliest
                    politeness-legal start offset for that fetch.

    Scale shape: ONE window partitioned by host (no global sort), one
    left equi-join on host against the per-host delay table.  The
    caller chooses whether to broadcast that side (pass
    ``F.broadcast(delays)``) — at most one row per host with a
    Crawl-delay directive, but a 10^8-host crawl can exceed the
    broadcast limit, the same contract as ``robots.robots_gate``."""
    w = (Window.partitionBy(host_col)
         .orderBy(F.col(score_col).desc(), F.col(url_col)))
    return (urls
            .join(delays, host_col, "left")
            .withColumn("crawl_delay",
                        F.coalesce(F.col("crawl_delay"),
                                   F.lit(float(default_delay))))
            .withColumn("fetch_round", F.row_number().over(w))
            .withColumn("eta_seconds",
                        (F.col("fetch_round") - F.lit(1))
                        * F.col("crawl_delay")))


def resolve_redirects(redirects: DataFrame, *, max_hops: int = 8,
                      src_col: str = "src",
                      dst_col: str = "dst") -> DataFrame:
    """Resolve HTTP redirect chains to their final destination by
    pointer doubling: (src, final_url, hops, resolved).

    ``redirects`` is a redirect MAP — one row per redirecting URL
    (src unique; src -> its Location target).  For every src:

      resolved  — the chain reaches a terminal URL (one that does not
                  itself redirect) within ``max_hops`` hops,
      final_url — that terminal (NULL when unresolved),
      hops      — chain length (NULL when unresolved).

    Cycles (self-loops, A<->B, longer), chains beyond ``max_hops``,
    and rows whose target is NULL (a redirect response with a
    missing/unparseable Location header) come out resolved=false — a
    crawler treats all three as dead ends.  A NULL dst would otherwise
    masquerade as a terminal: the null-safe src-set probe never
    matches, so the walk stops "done" at a URL that does not exist.

    Scale shape: pointer doubling, NOT per-hop iteration — round k
    composes the map with itself so every pointer advances up to 2^k
    hops; ceil(log2(max_hops)) shuffle joins total (3 rounds for the
    default 8, vs 8 for naive iteration; a 10^9-row redirect table at
    browser-limit max_hops=20 needs 5).  Each round is one equi-join
    of the map with itself on the current pointer plus a projection —
    no Python, no driver-side loop over rows (the Python loop here is
    over ROUNDS, fixed at plan-build time).  Like the repo's other
    iterative-join operators (graphrank.pagerank, dedup.cluster_assign)
    each round is `localCheckpoint`ed: without it the self-join
    duplicates its own subtree and lineage doubles per round (2^k-1
    join nodes by round k); with it every round is ONE join over a
    materialized pointer table — same storage caveat as pagerank (use
    reliable checkpoints on a real cluster).  DuckDB twin: WITH
    RECURSIVE bounded at max_hops.

    Reference analog: bounded retry/fallback chasing in the page
    pipeline (core/batch_processor.py fallback ladder); here the chase
    is across rows instead of within one."""
    srcs = redirects.select(F.col(src_col).alias("_term_probe")).distinct()
    # m: src -> (cur = pointer after <=2^k hops, hops walked, done =
    # cur is terminal).  Initially one hop: done iff dst never redirects.
    m = (redirects
         .join(srcs, F.col(dst_col) == F.col("_term_probe"), "left")
         .select(F.col(src_col).alias("src"),
                 F.col(dst_col).alias("cur"),
                 F.lit(1).alias("hops"),
                 F.col("_term_probe").isNull().alias("done"))
         .localCheckpoint(eager=True))
    for _ in range(max(1, math.ceil(math.log2(max(2, max_hops))))):
        r = m.select(F.col("src").alias("r_src"),
                     F.col("cur").alias("r_cur"),
                     F.col("hops").alias("r_hops"),
                     F.col("done").alias("r_done"))
        # an un-done cur is by construction a src, so the left join
        # always matches for rows still walking
        m = (m.join(r, m["cur"] == r["r_src"], "left")
             .select("src",
                     F.when(F.col("done"), F.col("cur"))
                      .otherwise(F.col("r_cur")).alias("cur"),
                     F.when(F.col("done"), F.col("hops"))
                      .otherwise(F.col("hops") + F.col("r_hops"))
                      .alias("hops"),
                     F.when(F.col("done"), F.lit(True))
                      .otherwise(F.coalesce(F.col("r_done"), F.lit(True)))
                      .alias("done"))
             .localCheckpoint(eager=True))
    # cur IS NULL == the chain ran into a missing Location target;
    # "done" there is an artifact of the probe miss, not a terminal
    ok = (F.col("done") & (F.col("hops") <= max_hops)
          & F.col("cur").isNotNull())
    return m.select("src",
                    F.when(ok, F.col("cur")).alias("final_url"),
                    F.when(ok, F.col("hops")).alias("hops"),
                    ok.alias("resolved"))


def resolve_frontier_urls(pages: DataFrame, redirects: DataFrame, *,
                          max_hops: int = 8,
                          url_col: str = "url",
                          src_col: str = "src",
                          dst_col: str = "dst") -> DataFrame:
    """Frontier alias collapse — the step a crawler runs between URL
    discovery and scheduling: canonicalize every raw URL
    (webnorm.canonical_url: case/www/utm/fragment/trailing-slash
    noise), fold known redirect chains through ``resolve_redirects``,
    and classify each row:

      status='direct'      the canonical URL is not a known redirect;
                           final_url = canonical_url
      status='redirected'  the chain resolves within max_hops;
                           final_url = the terminal
      status='dead'        a cycle, an over-limit chain, or a missing
                           Location target; final_url = NULL (a
                           frontier drops these before scheduling)

    Output: (doc_id, raw_url, canonical_url, final_url, status) — one
    row per input row; grouping by final_url where status != 'dead'
    gives the alias groups that one fetch will satisfy.

    Both SIDES are canonicalized: the redirect map (harvested from
    fetch logs, so its src/dst carry the same www/utm/fragment noise
    raw page URLs do) goes through the same webnorm.canonical_url
    before chain resolution — otherwise a redirecting URL whose map
    row is spelled differently silently classifies 'direct', and
    chains terminating at spelling variants split alias groups.  Two
    raw map rows that collapse onto one canonical src keep the
    lexicographically smallest canonical target (deterministic under
    any partitioning); resolve_redirects requires unique srcs.

    Invalid raw URLs (NULL, no scheme, empty host) classify 'dead' —
    final_url stays NULL exactly when status='dead', so grouping by
    final_url over non-dead rows never creates a bogus NULL/garbage
    fetch group.

    Scale shape: canonicalization is narrow in-row work during the
    scan; the redirect map joins on canonical_url with a plain shuffle
    equi-join (both sides corpus-sized at 100 TB — no broadcast
    assumption); the map collapse is one partial-agg groupBy on the
    map side only; resolve_redirects contributes its own
    ceil(log2(max_hops)) materialized rounds.  No Python anywhere."""
    from . import webnorm  # deferred: keep module import cost flat

    canon = pages.select(
        F.col("doc_id"),
        F.col(url_col).alias("raw_url"),
        webnorm.canonical_url(url_col).alias("canonical_url"))
    rmap = (redirects
            .select(webnorm.canonical_url(src_col).alias("src"),
                    webnorm.canonical_url(dst_col).alias("dst"))
            .groupBy("src").agg(F.min("dst").alias("dst")))
    res = resolve_redirects(rmap, max_hops=max_hops).select(
        F.col("src"), F.col("final_url").alias("_target"),
        F.col("resolved").alias("_resolved"))
    joined = canon.join(res, canon["canonical_url"] == res["src"], "left")
    ok_url = (F.col("canonical_url").isNotNull()
              & F.col("canonical_url").rlike("^[a-z]+://[^/?#]"))
    status = (F.when(~F.coalesce(ok_url, F.lit(False)), F.lit("dead"))
               .when(F.col("src").isNull(), F.lit("direct"))
               .when(F.col("_resolved"), F.lit("redirected"))
               .otherwise(F.lit("dead")))
    final = (F.when(status == "dead", F.lit(None).cast("string"))
              .when(F.col("src").isNull(), F.col("canonical_url"))
              .otherwise(F.col("_target")))
    return joined.select("doc_id", "raw_url", "canonical_url",
                         final.alias("final_url"), status.alias("status"))


def allocate_crawl_budget(host_scores: DataFrame, budget: int, *,
                          host_col: str = "host",
                          score_col: str = "score") -> DataFrame:
    """Allocate a fixed crawl budget (page fetches per cycle) across
    hosts proportionally to a non-negative integer score (pagerank
    rank mass, quality-weighted page count, ...) using the LARGEST
    REMAINDER method: quota_i = floor(budget * s_i / total) plus one
    top-up fetch for the ``budget - sum(floor(...))`` hosts with the
    largest integer remainder (budget*s_i mod total), ties broken by
    host ascending.  sum(quota) == budget exactly — the property
    driver-style schedulers need (no over-commit, no stranded budget).

    All arithmetic is BIGINT-exact and engine-portable: the only
    division is budget*s/total with budget*s kept under 2^53
    (budget ~1e9 x score ~1e6 fits; the caller scales scores down
    otherwise), and the remainder ranking uses the exact integer mod.
    A zero/NULL total (no positive scores) allocates nothing.

    Scale shape: the input is HOST-sized (~1e8 rows at web scale, tiny
    next to pages); two one-row broadcast aggregates (total, floor
    sum) and ONE global window for the remainder ranking — a sort of
    the host table, the same work any top-k scheduler does per cycle.

    Reference analog: get_optimal_batch_size / thread-pool width
    division (utils/gpu.py:94-129) — a fixed resource split across
    work units, here proportional instead of uniform."""
    s = F.col(score_col).cast("long")
    tot = host_scores.agg(F.sum(s).alias("_tot"))
    base_tbl = (host_scores
                .crossJoin(F.broadcast(tot))
                .select(F.col(host_col).alias("host"),
                        s.alias("score"),
                        F.when((F.col("_tot") > 0) & (s > 0),
                               F.floor((s * budget) / F.col("_tot")))
                         .otherwise(F.lit(0)).cast("long").alias("base"),
                        F.when((F.col("_tot") > 0) & (s > 0),
                               (s * budget) % F.col("_tot"))
                         .otherwise(F.lit(0)).cast("long").alias("rem"),
                        (F.col("_tot") > 0).alias("_has_mass")))
    leftover = base_tbl.agg(
        (F.when(F.max(F.col("_has_mass").cast("int")) == 1,
                F.lit(budget) - F.sum("base"))
          .otherwise(F.lit(0))).cast("long").alias("_left"))
    w = Window.orderBy(F.desc("rem"), F.asc("host"))
    return (base_tbl
            .crossJoin(F.broadcast(leftover))
            .withColumn("_rk", F.row_number().over(w))
            .select("host", "score",
                    (F.col("base")
                     + F.when(F.col("_rk") <= F.col("_left"), F.lit(1))
                        .otherwise(F.lit(0))).cast("long").alias("quota")))


def recrawl_candidates(sitemap_pages: DataFrame, fetched: DataFrame, *,
                       as_of: str, max_age_days: int = 45,
                       host_col: str = "host", loc_col: str = "loc",
                       lastmod_col: str = "lastmod",
                       url_col: str = "url",
                       fetch_col: str = "last_fetch") -> DataFrame:
    """Freshness-driven recrawl scheduling: join the sitemap's page
    entries (crawl.parse_sitemap output) against the committed
    snapshot's per-URL last-fetch table and classify every sitemap
    page, first matching reason wins:

      'new'       never fetched (no snapshot row)
      'modified'  lastmod declared and strictly after the last fetch
      'aged'      no lastmod declared and the last fetch is older than
                  ``max_age_days`` before ``as_of`` (blind refresh —
                  what a crawler does when the site gives no signal)
      'fresh'     everything else (declared-unmodified pages are
                  trusted even past max_age — the sitemap says so)

    ``refetch`` = reason != 'fresh'.  ``as_of`` (an ISO date string)
    is an explicit parameter, never a wall clock — the decision is a
    pure function of its inputs, re-runnable and oracle-matchable.

    Timestamp discipline (subset honesty): W3C lastmod values are
    compared as NORMALIZED STRINGS — a trailing UTC designator
    (``+00:00`` / ``Z``) is stripped and date-only values compare as
    their midnight prefix; non-UTC zone offsets are NOT normalized
    (Common Crawl fetch logs are UTC; a real multi-zone deployment
    parses full W3C datetimes).  String comparison over ISO-8601 UTC
    is order-identical to timestamp comparison, and — unlike engine
    timestamp parsing — bit-identical across Spark and DuckDB.

    Scale shape: the sitemap side is per-URL-declared (~1e9), the
    fetch log corpus-sized; ONE shuffle equi-join on URL plus scan
    pressure only — every predicate is a string/date expression, no
    Python, no window."""
    lm = F.regexp_replace(F.col(lastmod_col), "(\\+00:00|Z)$", "")
    cutoff = F.date_sub(F.lit(as_of).cast("date"), max_age_days)
    joined = (sitemap_pages
              .join(fetched.select(F.col(url_col).alias(loc_col),
                                   F.col(fetch_col)),
                    loc_col, "left"))
    reason = (F.when(F.col(fetch_col).isNull(), F.lit("new"))
               .when(F.col(lastmod_col).isNotNull()
                     & (lm > F.col(fetch_col)), F.lit("modified"))
               .when(F.col(lastmod_col).isNull()
                     & (F.substring(F.col(fetch_col), 1, 10).cast("date")
                        < cutoff), F.lit("aged"))
               .otherwise(F.lit("fresh")))
    return (joined.select(host_col, loc_col, lastmod_col, fetch_col,
                          reason.alias("reason"))
            .withColumn("refetch", F.col("reason") != "fresh"))
