"""robots.txt parsing and URL gating — crawl politeness at corpus scale.

A Common-Crawl-style pipeline must be able to re-evaluate robots rules
over an archived corpus (takedown sweeps, per-agent republication
policy, building a compliant crawl frontier).  This implements the
RFC 9309 core as pure DataFrame algebra:

* group lines into user-agent blocks (consecutive ``User-agent`` lines
  stack onto one block),
* pick the applicable blocks for an agent — exact agent-token blocks
  if any exist for the host, else the ``*`` blocks (RFC 9309 §2.2.1:
  the most specific matching group, never both),
* match URL paths against Allow/Disallow prefixes: LONGEST prefix
  wins, Allow wins length ties, no match means allowed (§2.2.2).

Wildcards: ``*`` (any octet run) and a trailing ``$`` (end anchor) are
supported per RFC 9309 §2.2.3 ("crawlers MUST support them"): a rule
containing either is compiled — by a chain of LITERAL character
replaces, so the translation is bit-identical in Spark and DuckDB —
into an anchored RE2/Java-safe regex; plain rules keep the fast
startswith path.  Rule precedence is pattern length (octets of the
rule as written, the reference Google parser's tiebreak), Allow wins
length ties.  Empty-value directives (``Disallow:``) are ignored per
spec.

Subset honesty: rules and paths are compared AS GIVEN — the RFC's
percent-encoding normalization (§2.2.2: compare both sides in a
common encoding) is not applied, so callers must feed rules and URLs
from the same encoder (true for anything produced by
webnorm.canonical_url, which never re-encodes).

Scale shape: the robots table is per-HOST (~10^7-10^8 rows vs 10^12
pages).  Parsing is two window passes over exploded lines, partitioned
by host — narrow, JVM-only, done ONCE; the per-URL gate is an equi-join
on host (rules side usually broadcastable) followed by a
prefix-match argmax per URL, so the page-side cost is one join plus a
per-URL top-1 — no Python, no per-row regex compilation.

Reference analog: input validation / skip-list gating before the
expensive stage (core/batch_processor.py:164-193) — here the skip rule
is a parsed per-host policy instead of a file-extension check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .dedup import WS_CLASS

__all__ = ["parse_robots_rules", "parse_crawl_delay", "robots_gate",
           "parse_sitemap_directives", "rule_regex"]

# characters escaped literally when a robots rule body compiles to a
# regex — backslash MUST be first; '*' is handled separately (it is
# the wildcard) and a TRAILING '$' is stripped before escaping (it is
# the anchor), so the '$' here only ever hits interior dollars
RULE_REGEX_SPECIALS = ["\\", ".", "+", "?", "(", ")", "[", "]",
                       "{", "}", "^", "|", "$"]


def rule_regex(prefix):
    """Compile a robots path rule to an anchored regex: literal chars
    escaped via a chain of plain (non-regex) replaces, ``*`` -> ``.*``,
    a trailing ``$`` kept as the end anchor.  Only literal string ops,
    so the identical chain in DuckDB produces the identical pattern —
    the cross-engine contract the gate twin certifies."""
    p = F.col(prefix) if isinstance(prefix, str) else prefix
    anchored = p.endswith("$")
    body = F.when(anchored, p.substr(F.lit(1), F.length(p) - 1)) \
            .otherwise(p)
    for ch in RULE_REGEX_SPECIALS:
        body = F.replace(body, F.lit(ch), F.lit("\\" + ch))
    body = F.replace(body, F.lit("*"), F.lit(".*"))
    return F.concat(F.lit("^"), body,
                    F.when(anchored, F.lit("$")).otherwise(F.lit("")))


def _directive_lines(robots: DataFrame, host_col: str, txt_col: str):
    """Explode a robots table into parsed directive lines:
    (host, ln_idx, ln, key, val, is_ua) — comments/CR stripped, key
    lowercased, value case-preserved, non-directive lines dropped.
    Shared by the group-scoped parsers and the global Sitemap scan."""
    return (robots
            .select(host_col,
                    F.posexplode(F.split(F.col(txt_col), "\n"))
                     .alias("ln_idx", "raw"))
            # strip comments, CR, surrounding whitespace
            .withColumn("ln", F.trim(F.regexp_replace(
                F.regexp_replace("raw", "#.*$", ""), "\r", "")))
            # explicit whitespace class from dedup.WS_CLASS, not \s
            # (Java \s matches \x0B where the DuckDB twin's RE2 \s
            # does not)
            .withColumn("key", F.lower(F.regexp_extract(
                "ln", f"^([A-Za-z-]+){WS_CLASS}*:", 1)))
            .withColumn("val", F.trim(F.regexp_extract(
                "ln", f"^[A-Za-z-]+{WS_CLASS}*:(.*)$", 1)))
            .withColumn("is_ua", F.col("key") == "user-agent")
            # RFC 9309: comments and blank lines are ignorable
            # ANYWHERE, including between stacked User-agent lines —
            # they must not split a group.  Drop them (and any
            # garbage non-directive line) BEFORE block grouping.
            .where(F.col("key") != ""))


def _applicable_blocks(robots: DataFrame, agent: str,
                       host_col: str, txt_col: str):
    """Shared front half of robots parsing: explode lines, group into
    user-agent blocks, pick the applicable blocks for `agent`.
    Returns (blocks, picked) — `blocks` carries every directive line
    with its block_id, `picked` the (host, block_id) pairs that apply."""
    w = Window.partitionBy(host_col).orderBy("ln_idx")

    # RFC 9309 §2.2.4 / the reference Google parser: lines that are not
    # group directives (Sitemap:, Host:, any unrecognized key) are
    # ignored BY GROUP PARSING entirely — in particular a Sitemap line
    # between two stacked User-agent lines must NOT split the run.
    # Only recognized group directives participate in block grouping.
    lines = _directive_lines(robots, host_col, txt_col).where(
        F.col("key").isin("user-agent", "allow", "disallow",
                          "crawl-delay"))

    # block id: consecutive User-agent lines start ONE block; a
    # group directive line after a UA run closes the run
    blocks = (lines
              .withColumn("run_start",
                          (F.col("is_ua")
                           & ~F.coalesce(F.lag("is_ua").over(w),
                                         F.lit(False))).cast("int"))
              .withColumn("block_id", F.sum("run_start").over(w)))

    agents = (blocks.where(F.col("is_ua"))
              .select(host_col, "block_id", F.lower("val").alias("ua")))
    # specificity: exact agent token beats '*'; a host with BOTH uses
    # only the agent blocks (min rank per host)
    cand = (agents
            .where((F.col("ua") == agent.lower()) | (F.col("ua") == "*"))
            .withColumn("rank", F.when(F.col("ua") == agent.lower(), 1)
                                 .otherwise(2)))
    best = cand.groupBy(host_col).agg(F.min("rank").alias("best_rank"))
    picked = (cand.join(best, host_col)
              .where(F.col("rank") == F.col("best_rank"))
              .select(host_col, "block_id").distinct())
    return blocks, picked


def parse_robots_rules(robots: DataFrame, *, agent: str = "*",
                       host_col: str = "host",
                       txt_col: str = "robots_txt") -> DataFrame:
    """Parse a per-host robots.txt table into applicable prefix rules
    for `agent`: (host, allow boolean, prefix, prefix_len).

    Hosts whose robots has no applicable block produce no rows —
    downstream treats absent rules as allow-all."""
    blocks, picked = _applicable_blocks(robots, agent, host_col, txt_col)
    return (blocks
            .where(F.col("key").isin("allow", "disallow")
                   & (F.col("val") != ""))
            .join(picked, [host_col, "block_id"])
            .select(host_col,
                    (F.col("key") == "allow").alias("allow"),
                    F.col("val").alias("prefix"),
                    F.length("val").alias("prefix_len"))
            .distinct())


def parse_crawl_delay(robots: DataFrame, *, agent: str = "*",
                      host_col: str = "host",
                      txt_col: str = "robots_txt") -> DataFrame:
    """Per-host ``Crawl-delay`` (seconds) for `agent`: (host,
    crawl_delay double).  The directive is a de-facto extension (not
    RFC 9309, but honored by major crawlers); it obeys the same
    group-applicability rules as Allow/Disallow.  Hosts without an
    applicable numeric Crawl-delay produce no rows — the frontier
    scheduler substitutes its default.  Multiple applicable values
    collapse to the MOST CONSERVATIVE (max)."""
    blocks, picked = _applicable_blocks(robots, agent, host_col, txt_col)
    return (blocks
            .where((F.col("key") == "crawl-delay")
                   & F.col("val").rlike(r"^[0-9]+(\.[0-9]+)?$"))
            .join(picked, [host_col, "block_id"])
            .groupBy(host_col)
            .agg(F.max(F.col("val").cast("double")).alias("crawl_delay")))


def robots_gate(urls: DataFrame, rules: DataFrame, *,
                host_col: str = "host",
                path_col: str = "path") -> DataFrame:
    """Gate a URL table (must carry `host_col` and `path_col`) against
    parsed rules: adds `allowed` (boolean) and `matched_prefix` (the
    winning rule's prefix, '' when no rule matched).

    One equi-join on host (broadcast the rules side when it fits — the
    caller knows its host cardinality) + a longest-prefix argmax per
    input row.  Rows with no applicable or matching rule are allowed.

    The argmax keys on a transient per-row id, NOT on the URL columns
    (duplicate input rows must each survive), and uses max(struct) —
    a partial-aggregable shuffle, no window sort."""
    with_id = urls.withColumn("__rid", F.monotonically_increasing_id())
    # wildcard rules compile ONCE on the (tiny) rules side — Catalyst
    # pushes this projection below the join; literal rules keep the
    # cheap startswith path (per-pair regex only where the rule needs it)
    rules2 = rules.withColumn(
        "__wild", F.col("prefix").contains("*")
                  | F.col("prefix").endswith("$")) \
        .withColumn("__pat", rule_regex("prefix"))
    matched = (with_id.join(rules2, host_col, "left")
               .withColumn("hit",
                           F.col("prefix").isNotNull()
                           & F.when(F.col("__wild"),
                                    F.regexp_like(F.col(path_col),
                                                  F.col("__pat")))
                              .otherwise(F.col(path_col)
                                          .startswith(F.col("prefix")))))
    # top-1 per input row: hit beats miss, longest prefix wins, allow
    # wins length ties; max prefix last for full determinism
    best = F.max(F.struct(
        F.col("hit"), F.col("prefix_len"), F.col("allow"),
        F.col("prefix"))).alias("best")
    kept = [F.first(c).alias(c) for c in urls.columns]
    return (matched
            .groupBy("__rid").agg(*kept, best)
            .select(*urls.columns,
                    F.when(F.col("best.hit"), F.col("best.allow"))
                     .otherwise(F.lit(True)).alias("allowed"),
                    F.when(F.col("best.hit"), F.col("best.prefix"))
                     .otherwise(F.lit("")).alias("matched_prefix")))


def parse_sitemap_directives(robots: DataFrame, *,
                             host_col: str = "host",
                             txt_col: str = "robots_txt") -> DataFrame:
    """Per-host ``Sitemap:`` directives: (host, sitemap_url) — the
    discovery half of the sitemaps.org protocol (a crawler learns a
    site's sitemaps from its robots.txt, then fetches and parses them
    with crawl.parse_sitemap).

    Sitemap lines are GLOBAL per the protocol — independent of
    user-agent groups — so unlike Allow/Disallow/Crawl-delay there is
    no group election: every non-empty ``Sitemap:`` value anywhere in
    the file counts, value case preserved (URLs are case-sensitive),
    duplicates collapsed per host.  Hosts that declare none produce no
    rows.

    Scale shape: the same single exploded-lines pass the rule parsers
    use, minus their two window passes — one filter + distinct on the
    per-HOST table."""
    return (_directive_lines(robots, host_col, txt_col)
            .where((F.col("key") == "sitemap") & (F.col("val") != ""))
            .select(host_col, F.col("val").alias("sitemap_url"))
            .distinct())
