"""Web-hygiene operators: URL canonicalization and PII redaction.

Both are pure JVM-side expressions (regexp + array higher-order
functions — whole-stage codegen, no Python workers), because at crawl
scale these run against every page and must execute at scan speed.

URL canonicalization is the web-tier dedup primitive the reference's
per-page identity has no analog for (its pages are locally unique
image files, `ukrainian_ocr/core/config.py` path handling): a crawl
sees the same page under tracking-parameter / fragment / host-case /
www-prefix variants, and collapsing those BEFORE content dedup removes
the bulk of exact duplicates with a string expression instead of a
content hash.

PII redaction is standard pre-training hygiene: strip emails / IP
addresses from the text column while recording per-document match
counts for the curation report.  Patterns deliberately use only
constructs with identical semantics in Java regex and RE2 (no \\b, no
lookaround) so the DuckDB oracle twin is exact.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

# cross-engine-safe patterns (Java regex == RE2 semantics)
EMAIL_PATTERN = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
IPV4_PATTERN = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"


def canonical_host(url) -> Column:
    """Canonical host of a URL column: lowercased, leading ``www.``
    stripped.  The grouping key for every per-site operation (host
    stats, per-host caps, domain blocklists); the extraction regex
    stops at ``/``, ``?``, and ``#`` so it is safe on raw URLs with
    fragments still attached."""
    u = F.col(url) if isinstance(url, str) else url
    return F.regexp_replace(
        F.lower(F.regexp_extract(u, "^[A-Za-z]+://([^/?#]+)", 1)),
        "^www\\.", "")


# the DuckDB rendering of canonical_host (format with col=...) — the
# single SQL mirror for oracle twins that need a host key (same
# contract as dedup.WORD_ARRAY_SQL)
CANONICAL_HOST_SQL = (r"regexp_replace(lower(regexp_extract({col},"
                      r" '^[A-Za-z]+://([^/?#]+)', 1)), '^www\.', '')")


def _defragged(url) -> Column:
    """URL with the fragment dropped FIRST: a '?' inside an SPA-style
    fragment route ('#/search?q=...') must not be resurrected as query
    parameters by the later extractors."""
    raw = F.col(url) if isinstance(url, str) else url
    return F.regexp_extract(raw, "^([^#]*)", 1)


def _raw_path(u: Column) -> Column:
    """Path component with a trailing slash stripped (case preserved —
    canonical_url keeps path case, surt_key folds it)."""
    return F.regexp_replace(
        F.regexp_extract(u, "^[A-Za-z]+://[^/?#]+([^?#]*)", 1), "/$", "")


def _kept_query(u: Column, *, fold_case: bool) -> Column:
    """The surviving query string: ``utm_*`` tracking parameters and
    empty fragments dropped, the rest sorted.  ONE definition of the
    equivalence grammar, shared by canonical_url (the dedup key, case
    preserved) and surt_key (the archive sort key, case folded) so the
    two can never disagree about which URLs are equivalent."""
    query = F.regexp_extract(u, "\\?(.*)", 1)
    if fold_case:
        query = F.lower(query)
    return F.array_join(
        F.array_sort(F.filter(
            F.split(query, "&"),
            lambda p: (~p.startswith("utm_")) & (p != F.lit("")))),
        "&")


def canonical_url(url) -> Column:
    """Canonical form of a URL column: lowercase scheme and host, strip
    a leading ``www.``, drop the fragment, drop ``utm_*`` tracking
    parameters, sort the surviving query parameters, and strip a
    trailing slash from the path.

    Everything is regexp_extract + array HOFs on one row — narrow, no
    shuffle, safe to apply inline during the scan of a 10^12-row page
    table."""
    u = _defragged(url)
    scheme = F.lower(F.regexp_extract(u, "^([A-Za-z]+)://", 1))
    host = canonical_host(u)
    kept = _kept_query(u, fold_case=False)
    return F.concat(
        scheme, F.lit("://"), host, _raw_path(u),
        F.when(kept == "", F.lit("")).otherwise(F.concat(F.lit("?"), kept)))


def surt_key(url) -> Column:
    """SURT (Sort-friendly URI Reordering Transform) key of a URL
    column — the canonical sort key of web-archive CDX indexes:
    ``https://www.Example.com:443/A/b?b=2&a=1`` becomes
    ``com,example)/a/b?a=1&b=2``.

    Transform (the public webarchive-commons / pywb convention):
    scheme dropped, host lowercased with a leading ``www.`` stripped,
    default ports (80/443) dropped and any other port kept after the
    reversed host, host labels REVERSED and joined with commas (so one
    registrable domain's captures sort contiguously), ``)`` separator,
    then the lowercased path (trailing slash stripped) and the sorted
    query string (tracking ``utm_*`` parameters dropped, matching
    canonical_url).  Fragments never reach the key.

    Pure regexp + array HOFs on one row — whole-stage codegen, no
    shuffle; at 10^12 rows this is the scan-speed sort key that makes
    the CDX table range-queryable by domain prefix."""
    u = _defragged(url)
    host = canonical_host(u)
    port = F.regexp_extract(host, ":([0-9]+)$", 1)
    hostname = F.regexp_replace(host, ":[0-9]+$", "")
    rev = F.array_join(F.reverse(F.split(hostname, "\\.")), ",")
    port_sfx = F.when(port.isin("", "80", "443"), F.lit("")) \
        .otherwise(F.concat(F.lit(":"), port))
    path = F.lower(_raw_path(u))
    kept = _kept_query(u, fold_case=True)
    return F.concat(
        rev, port_sfx, F.lit(")"), path,
        F.when(kept == "", F.lit("")).otherwise(F.concat(F.lit("?"), kept)))


def url_dedup_groups(pages: DataFrame, url_col: str = "url") -> DataFrame:
    """Group a page table by canonical URL: one row per canonical URL
    with the variant count, the distinct-raw-URL count, and the keeper
    (min doc_id).  One partial-agg shuffle on the canonical string —
    the same shape as exact content dedup, but run on the URL column
    alone so it needs no text bytes at all (column pruning keeps the
    scan to two columns)."""
    return (pages
            .select(canonical_url(url_col).alias("canonical_url"),
                    F.col(url_col).alias("raw_url"), "doc_id")
            .groupBy("canonical_url")
            .agg(F.count("*").alias("n_variants"),
                 F.countDistinct("raw_url").alias("n_distinct_raw"),
                 F.min("doc_id").alias("keeper_doc_id")))


def redact_text(t) -> Column:
    """The PII replacement chain alone (emails first, then IPs on the
    email-redacted text): the ONE redaction definition shared by the
    pii_redaction report query and the curation job's --pii-redact
    stage — two copies would let the deployed corpus diverge from what
    the report claims was scrubbed."""
    t = F.col(t) if isinstance(t, str) else t
    after_email = F.regexp_replace(t, EMAIL_PATTERN, "<EMAIL>")
    return F.regexp_replace(after_email, IPV4_PATTERN, "<IP>")


def email_count(t) -> Column:
    """Email matches on the RAW text — the first half of the order-aware
    count rule (see ip_count)."""
    t = F.col(t) if isinstance(t, str) else t
    return F.size(F.regexp_extract_all(t, F.lit(EMAIL_PATTERN), F.lit(0)))


def ip_count(t) -> Column:
    """IPv4 matches on the EMAIL-REDACTED text: an IPv4-shaped substring
    consumed by an email match (digits/dots are legal in a local part)
    is counted once as email, never twice.  email_count/ip_count/
    pii_count/redact_text all derive from the same two patterns and the
    same replacement order, so the report query and the curation job can
    never disagree about what was scrubbed."""
    t = F.col(t) if isinstance(t, str) else t
    after_email = F.regexp_replace(t, EMAIL_PATTERN, "<EMAIL>")
    return F.size(F.regexp_extract_all(after_email, F.lit(IPV4_PATTERN),
                                       F.lit(0)))


def pii_count(t) -> Column:
    """Total replacement count redact_text will make."""
    return (email_count(t) + ip_count(t)).cast("long")


def pii_redact(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document PII scrub: replace every email address with
    ``<EMAIL>`` and every IPv4-shaped number run with ``<IP>``,
    recording match counts.  Narrow (per-row regexp), runs at scan
    speed; the counts feed the curation report, the redacted column
    feeds the training corpus."""
    t = F.col(text_col)
    redacted = redact_text(t)
    # counts come from the shared order-aware helpers (email_count /
    # ip_count) — the same definitions the curation job's stats use.
    # tail sample via explicit 1-based clamp, NOT substring(col, -48):
    # Spark's negative-pos substring returns '' when |pos| > length while
    # DuckDB's right() clamps — the clamp form is identical in both
    return (docs
            .withColumn("_pii_redacted", redacted)
            .select(
                "doc_id",
                email_count(t).alias("n_emails"),
                ip_count(t).alias("n_ips"),
                F.length("_pii_redacted").alias("redacted_len"),
                F.expr("substring(_pii_redacted,"
                       " greatest(length(_pii_redacted) - 47, 1), 48)")
                .alias("redacted_tail"),
            ))


def host_cap_sample(pages: DataFrame, host_col: str = "host",
                    id_col: str = "doc_id", cap: int = 8,
                    salt_buckets: int = 16) -> DataFrame:
    """Deterministic per-host cap-K sampling (crawl-curation staple: no
    single site may contribute more than ``cap`` documents).  Selection
    order is the md5-derived hash of the document id — a pure function
    of the key, so membership is stable across runs, engines, and
    repartitionings, and statistically uniform (no 'first K by crawl
    order' bias).

    Returns the KEPT sample only: one row per surviving document with
    (host, id, sample_rank in 1..cap).

    Scale shape — the naive plan is a window over ``partitionBy(host)``,
    which serializes a megahost's 10^8 rows through one task.  Instead:
    exact top-K in two bounded stages.  Stage 1 ranks within
    (host, salt) where salt = hash % ``salt_buckets`` and keeps the
    per-salt top ``cap``; any row ranked <= cap for its host globally
    has at most cap-1 rows ahead of it in ITS salt bucket too, so stage
    1 provably never discards a final-sample member.  Stage 2 ranks the
    <= salt_buckets * cap survivors per host — a bounded partition no
    matter how large the host.  Both exchanges carry bounded partitions;
    the same pattern scales from this sandbox to a 1000-executor
    cluster by raising salt_buckets."""
    h = F.conv(F.substring(
        F.md5(F.concat(F.lit("hostcap:"),
                       F.col(id_col).cast("string")).cast("binary")),
        1, 8), 16, 10).cast("bigint")
    salted = pages.select(
        F.col(host_col).alias("host"), F.col(id_col).alias(id_col),
        h.alias("_h"), (h % salt_buckets).alias("_salt"))
    w_local = Window.partitionBy("host", "_salt").orderBy("_h", id_col)
    survivors = (salted
                 .withColumn("_lr", F.row_number().over(w_local))
                 .where(F.col("_lr") <= cap))
    w_host = Window.partitionBy("host").orderBy("_h", id_col)
    return (survivors
            .withColumn("sample_rank", F.row_number().over(w_host))
            .where(F.col("sample_rank") <= cap)
            .select("host", id_col, "sample_rank"))


def host_suffixes(host) -> Column:
    """All dot-suffixes of a host, most-specific first: ``a.b.c`` ->
    ``['a.b.c', 'b.c', 'c']``.  Bounded by the label count (public
    hostnames rarely exceed ~6 labels), so the downstream explode is a
    constant-factor expansion, never data-dependent blowup.  Pure array
    HOFs — codegen, no Python."""
    h = F.col(host) if isinstance(host, str) else host
    parts = F.split(h, "\\.")
    n = F.size(parts)
    return F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.array_join(F.slice(parts, i, n - i + F.lit(1)), "."))


def validated_blocklist(entries) -> list:
    """Normalize + validate a domain blocklist: lowercase-fold, dedup,
    reject empties / whitespace / leading-or-trailing dots.  Shared by
    the registry query and the curation job's --host-blocklist stage so
    a malformed list fails loudly at parse time, not silently at scan
    time."""
    out = sorted({e.lower() for e in entries})
    if not out:
        raise ValueError("host blocklist must be non-empty")
    for e in out:
        if (not e) or any(c.isspace() for c in e) or e != e.strip(".")\
                or ".." in e or any(c in e for c in "/?#:@"):
            # a pasted URL or URL fragment ('http://x', 'x.com/path',
            # 'x.com:443', 'x.com?utm=1') would silently never match
            # any host suffix — reject it loudly instead
            raise ValueError(
                f"blocklist entries must be bare whitespace-free domains "
                f"(no scheme/path/port/query, no leading/trailing/empty "
                f"labels) — got {e!r}")
    return out


def folded_host(host) -> Column:
    """Matching form of a host for blocklist comparison: lowercased,
    ``:port`` stripped, trailing dots stripped.  validated_blocklist
    lowercase-folds the entry side; this folds the host side so
    ``Ads.Example``, ``ads.example:8443`` and ``ads.example.`` all
    match the entry ``ads.example`` (case/port asymmetry would
    silently pass listed domains through the gate)."""
    h = F.col(host) if isinstance(host, str) else host
    return F.regexp_replace(
        F.regexp_replace(F.lower(h), ":[0-9]+$", ""), "\\.+$", "")


# the DuckDB rendering of folded_host (format with col=...) — THE one
# SQL mirror every oracle twin that folds a host must interpolate, so a
# fold-rule change has a single SQL representation (same contract as
# dedup.WORD_ARRAY_SQL).  End-anchored patterns, so the default
# first-occurrence replace semantics match Spark's replace-all.
FOLDED_HOST_SQL = (r"regexp_replace(regexp_replace(lower({col}),"
                   r" ':[0-9]+$', ''), '\.+$', '')")


def host_blocklist_filter(pages: DataFrame, blocklist: DataFrame,
                          host_col: str = "host",
                          id_col: str = "doc_id") -> DataFrame:
    """UT1-style domain blocklist gate: a page is blocked when its host
    equals a blocklist entry OR sits under one (``ads.example`` blocks
    ``cdn.ads.example``).  Returns one row per page:
    (id, host, matched_suffix or NULL, blocked).

    Scale shape — the naive form regex-scans the blocklist per row
    (O(rows x entries)); real lists (UT1) hold millions of domains, so
    this instead EQUI-JOINS: explode each host into its bounded
    dot-suffix set (<= label count, ~4-6 rows per page) and hash-join
    the suffixes against the blocklist.  The blocklist side is
    broadcast here (fits executor memory even at millions of entries);
    drop the hint and the same plan shuffle-joins if a list ever
    outgrows that.  One bounded explode + one partial-agg shuffle on
    (id, host) — no per-row list scan anywhere.

    The host is folded (lower/port/trailing-dot, `folded_host`) before
    suffix expansion so matching is symmetric with the lowercase-folded
    entry side; the emitted ``host`` column keeps the original value."""
    suf = pages.select(
        F.col(id_col), F.col(host_col),
        F.explode_outer(host_suffixes(folded_host(host_col)))
        .alias("_suffix"))
    marks = blocklist.select(F.col("entry").alias("_suffix"),
                             F.lit(True).alias("_hit"))
    agg = (suf.join(F.broadcast(marks), "_suffix", "left")
           .groupBy(id_col, host_col)
           .agg(F.min(F.when(F.col("_hit"), F.col("_suffix")))
                .alias("matched_suffix")))
    return agg.select(
        id_col, host_col, "matched_suffix",
        F.col("matched_suffix").isNotNull().alias("blocked"))


# href extraction pattern — inline (?i) and the char classes behave
# identically in Java regex and RE2, so the DuckDB twin is exact; both
# quote styles matched, unquoted hrefs deliberately ignored (crawl
# parsers treat them as malformed)
HREF_PATTERN = "(?i)href=[\"']([^\"']+)[\"']"


def outlink_host_edges(pages: DataFrame, html_col: str = "html",
                       url_col: str = "url") -> DataFrame:
    """Crawl link-graph construction: (src_host, dst_host, n_links)
    edges from every absolute http(s) anchor in the page markup — the
    input to host ranking (feed `graphrank.pagerank` after mapping
    hosts to node ids), crawl frontier prioritization, and spam-cluster
    detection.  Relative links are dropped (they are same-host
    navigation, not graph signal); self-edges between a host and itself
    via absolute URLs are kept (internal-absolute linking is real
    structure).

    Scale shape: href extraction is one regexp_extract_all per page at
    scan speed (codegen, no Python); the explode is bounded by the
    page's anchor count; the only corpus-wide exchange is the final
    partial-agg groupBy on (src_host, dst_host), which collapses to
    host-pair cardinality — orders of magnitude below page count.
    Hosts are canonicalized (lowercase, www-stripped) on both ends so
    the graph never splits a site across case/www variants."""
    links = pages.select(
        canonical_host(url_col).alias("src_host"),
        F.explode(F.regexp_extract_all(F.col(html_col).cast("string"),
                                       F.lit(HREF_PATTERN), F.lit(1)))
        .alias("_link"))
    # BOTH endpoints guarded: a schemeless/NULL source url (canonical
    # host '' or NULL) must not inject a phantom node that absorbs
    # rank mass downstream, same as an unparseable link target
    absolute = links.where(F.col("_link").rlike("(?i)^https?://")
                           & (F.col("src_host") != ""))
    return (absolute
            .select("src_host", canonical_host(F.col("_link"))
                    .alias("dst_host"))
            .where(F.col("dst_host") != "")
            .groupBy("src_host", "dst_host")
            .agg(F.count("*").alias("n_links")))


# the DuckDB rendering of the href explode (format with col=...);
# DuckDB regexp_extract_all takes the group index as the third arg and
# honors the same inline (?i), so the mirror is exact
HREF_EXTRACT_SQL = \
    "regexp_extract_all({col}, '(?i)href=[\"'']([^\"'']+)[\"'']', 1)"


# <link rel="canonical" href="..."> in either attribute order; inline
# (?i) and the classes are Java-regex == RE2, so the DuckDB twin is
# exact.  Two patterns ORed at the expression level (RE2 has no
# backreferences to unify the orders in one pattern).
CANONICAL_REL_HREF = ("(?i)<link[^>]*rel=[\"']canonical[\"']"
                      "[^>]*href=[\"']([^\"']+)[\"']")
CANONICAL_HREF_REL = ("(?i)<link[^>]*href=[\"']([^\"']+)[\"']"
                      "[^>]*rel=[\"']canonical[\"']")


def declared_canonical(html_col, url_col) -> Column:
    """The page's effective canonical URL: the absolute
    ``<link rel=canonical>`` target if the markup declares one (either
    attribute order), else the canonicalized fetch URL.  Relative or
    non-http declared targets fall back to the fetch URL (resolving
    relative canonicals needs base-URL joining — out of scope at scan
    speed, and crawlers commonly treat them as malformed).  Pure
    regexp expressions — codegen, no Python."""
    h = (F.col(html_col) if isinstance(html_col, str)
         else html_col).cast("string")
    link = _first_of(h, CANONICAL_REL_HREF, CANONICAL_HREF_REL)
    return F.when(link.rlike("(?i)^https?://"),
                  canonical_url(link)).otherwise(canonical_url(url_col))


def canonical_link_dedup(pages: DataFrame, html_col: str = "html",
                         url_col: str = "url",
                         id_col: str = "doc_id") -> DataFrame:
    """Dedup by the DECLARED canonical: group pages on
    ``declared_canonical`` — the web-native collapse URL normalization
    alone cannot make (a site serves the same article under
    /article/123, /amp/123, and ?session=... variants, all declaring
    one canonical target).  One row per canonical: variant count, how
    many variants DECLARED it (vs fell back to their fetch URL), and
    the keeper (min id).

    Scale shape: the regexp extraction runs at scan speed; the only
    exchange is the partial-agg groupBy on the canonical string — the
    same shape as exact content dedup but needing no text bytes.

    The two full-document canonical regexes are extracted ONCE in a
    staging projection (`_link`); Catalyst's CollapseProject keeps the
    barrier because regexp_extract is non-cheap and `_link` is used
    twice — so each page's HTML is scanned 2x, not 4x."""
    h = F.col(html_col).cast("string")
    staged = pages.select(
        F.col(id_col),
        F.col(url_col).alias("_url"),
        _first_of(h, CANONICAL_REL_HREF, CANONICAL_HREF_REL).alias("_link"))
    # rlike('') is false, so is_abs doubles as "declared a usable link"
    is_abs = F.col("_link").rlike("(?i)^https?://")
    return (staged
            .select(F.col(id_col),
                    F.when(is_abs, canonical_url(F.col("_link")))
                     .otherwise(canonical_url(F.col("_url")))
                     .alias("canonical_url"),
                    is_abs.cast("int").alias("_declared"))
            .groupBy("canonical_url")
            .agg(F.count("*").alias("n_variants"),
                 F.sum("_declared").cast("long").alias("n_declared"),
                 F.min(id_col).alias("keeper_doc_id")))


# HTML metadata patterns.  Same cross-engine contract as the canonical
# -link pair: inline (?i) + char classes only (Java regex == RE2), each
# attribute-order variant is its own pattern (no backreferences).
TITLE_PATTERN = "(?i)<title[^>]*>([^<]*)</title>"
OG_TITLE_PROP_CONTENT = ("(?i)<meta[^>]*property=[\"']og:title[\"']"
                         "[^>]*content=[\"']([^\"']*)[\"']")
OG_TITLE_CONTENT_PROP = ("(?i)<meta[^>]*content=[\"']([^\"']*)[\"']"
                         "[^>]*property=[\"']og:title[\"']")
META_DESC_NAME_CONTENT = ("(?i)<meta[^>]*name=[\"']description[\"']"
                          "[^>]*content=[\"']([^\"']*)[\"']")
META_DESC_CONTENT_NAME = ("(?i)<meta[^>]*content=[\"']([^\"']*)[\"']"
                          "[^>]*name=[\"']description[\"']")
ROBOTS_NOINDEX_NAME_CONTENT = ("(?i)<meta[^>]*name=[\"']robots[\"']"
                               "[^>]*content=[\"'][^\"']*noindex")
ROBOTS_NOINDEX_CONTENT_NAME = ("(?i)<meta[^>]*content=[\"'][^\"']*noindex"
                               "[^\"']*[\"'][^>]*name=[\"']robots[\"']")


def _norm_ws(c: Column) -> Column:
    """Whitespace-normalized metadata string: trim + collapse internal
    runs (titles wrap across source lines in real markup).  Explicit
    class, not \\s: see dedup.WS_RUN (Java-\\s-vs-RE2 \\x0B hazard)."""
    from .dedup import WS_RUN
    return F.trim(F.regexp_replace(c, WS_RUN, " "))


def _first_of(h: Column, pat_a: str, pat_b: str) -> Column:
    """First non-empty capture across the two attribute-order variants
    of a meta pattern."""
    a = F.regexp_extract(h, pat_a, 1)
    return F.when(a != "", a).otherwise(F.regexp_extract(h, pat_b, 1))


def html_metadata(pages: DataFrame, html_col: str = "html",
                  url_col: str = "url",
                  id_col: str = "doc_id") -> DataFrame:
    """Per-page HTML metadata at scan speed: the effective title
    (``og:title`` wins over ``<title>`` — social-card metadata is
    curated while title tags carry site-name suffixes), the meta
    description, and the robots ``noindex`` compliance flag (a page
    whose publisher declared noindex must not enter a training corpus
    — the extraction-side analog of respecting robots.txt).  Both
    attribute orders matched for every meta pattern; titles are
    whitespace-normalized (real markup wraps them across lines).
    Anchor/nested-markup titles (``<title><b>..`` ) yield '' — the
    capture stops at markup, same convention as the anchor-text
    extractor.

    Everything is regexp at scan speed (codegen, no Python, narrow —
    zero exchanges); column pruning keeps the scan to the html/url/id
    columns.  Reference analog: the per-page Description /
    sourceImageInformation header the OCR pipeline writes into its ALTO
    export (`ukrainian_ocr/core/pipeline.py:423-427`), recast as
    metadata EXTRACTION from web markup."""
    h = F.col(html_col).cast("string")
    og = _first_of(h, OG_TITLE_PROP_CONTENT, OG_TITLE_CONTENT_PROP)
    title_tag = F.regexp_extract(h, TITLE_PATTERN, 1)
    eff = F.when(_norm_ws(og) != "", _norm_ws(og)) \
           .otherwise(_norm_ws(title_tag))
    desc = _norm_ws(_first_of(h, META_DESC_NAME_CONTENT,
                              META_DESC_CONTENT_NAME))
    noindex = (h.rlike(ROBOTS_NOINDEX_NAME_CONTENT)
               | h.rlike(ROBOTS_NOINDEX_CONTENT_NAME))
    return pages.select(
        F.col(id_col),
        canonical_host(url_col).alias("host"),
        eff.alias("title"),
        (_norm_ws(og) != "").alias("has_og_title"),
        desc.alias("description"),
        noindex.alias("noindex"))


def title_dup_groups(pages: DataFrame, html_col: str = "html",
                     url_col: str = "url",
                     id_col: str = "doc_id") -> DataFrame:
    """Title-based near-dup heuristic: pages on the SAME host sharing
    the same whitespace-normalized effective title are republication
    variants (print views, pagination, session-keyed reposts) that URL
    canonicalization and declared-canonical collapse both miss when
    the site declares nothing.  Returns only real dup groups
    (n_docs >= 2); noindex pages and empty titles are excluded (an
    empty title would glue a host's whole untitled long tail into one
    false mega-group).

    Scale shape: metadata extraction at scan speed, ONE exchange — the
    partial-agg groupBy on (host, title); the >=2 gate runs post-agg so
    the filter costs nothing extra."""
    m = html_metadata(pages, html_col, url_col, id_col)
    return (m.where((~F.col("noindex")) & (F.col("title") != ""))
            .groupBy("host", "title")
            .agg(F.count("*").alias("n_docs"),
                 F.min(id_col).alias("keeper_doc_id"))
            .where(F.col("n_docs") >= 2))


# anchor-with-text pattern: group 1 = href, group 2 = the text run up
# to the next markup.  Anchors whose text opens with a nested tag
# (<a..><b>bold</b></a>) do not match at all — a deliberate scan-speed
# convention (full nesting needs a parser, not a regex), exercised in
# the unit test.
ANCHOR_PATTERN = "(?i)<a[^>]*href=[\"']([^\"']+)[\"'][^>]*>([^<]*)</a>"


def anchor_text_terms(pages: DataFrame,
                      html_col: str = "html") -> DataFrame:
    """Anchor-text aggregation per destination host: tokenize the
    visible text of every absolute http(s) anchor and count term
    occurrences per canonical target host — the classic web-search /
    link-context signal (anchor text describes the TARGET better than
    the target's own page; used for ranking and as weak supervision).

    Scale shape: the pattern is extracted twice (group 1 = href, group
    2 = text) — two regexp_extract_all over the same pattern yield
    index-aligned arrays, zipped narrow with zip_with; the explode is
    bounded by the page's anchor count x anchor-text token count; the
    ONLY corpus-wide exchange is the final partial-agg groupBy on
    (dst_host, term), which collapses to vocabulary-per-host
    cardinality.  Tokenization is dedup.word_array — the corpus's one
    token definition."""
    from . import dedup

    h = F.col(html_col).cast("string")
    hrefs = F.regexp_extract_all(h, F.lit(ANCHOR_PATTERN), F.lit(1))
    texts = F.regexp_extract_all(h, F.lit(ANCHOR_PATTERN), F.lit(2))
    pairs = (pages
             .select(F.explode(F.zip_with(
                 hrefs, texts,
                 lambda a, b: F.struct(a.alias("link"), b.alias("txt"))))
                 .alias("_p"))
             .select(F.col("_p.link").alias("_link"),
                     F.col("_p.txt").alias("_txt")))
    absolute = (pairs
                .where(F.col("_link").rlike("(?i)^https?://"))
                .select(canonical_host(F.col("_link")).alias("dst_host"),
                        "_txt")
                .where(F.col("dst_host") != ""))
    return (absolute
            .select("dst_host",
                    F.explode(dedup.word_array("_txt")).alias("term"))
            .groupBy("dst_host", "term")
            .agg(F.count("*").alias("n_anchors")))


def host_blocklist_blocked_ids(pages: DataFrame, blocklist: DataFrame,
                               host_col: str = "host",
                               id_col: str = "doc_id") -> DataFrame:
    """Gate form of the blocklist: just the distinct ids of blocked
    pages.  Unlike host_blocklist_filter (which is TOTAL — one verdict
    row per page, so it must re-group the whole corpus), a gate only
    needs the matched side: left_semi the bounded suffix explode
    against the broadcast list, then distinct over ONLY the matched
    rows.  The full-corpus partial-agg shuffle disappears; the one
    remaining exchange carries the (tiny) blocked set."""
    suf = pages.select(
        F.col(id_col),
        F.explode(host_suffixes(folded_host(host_col))).alias("_suffix"))
    marks = blocklist.select(F.col("entry").alias("_suffix"))
    return (suf.join(F.broadcast(marks), "_suffix", "left_semi")
            .select(id_col).distinct())


def host_diversity_stats(pages: DataFrame, group_col: str = "lang",
                         host_col: str = "host") -> DataFrame:
    """Corpus-health concentration metrics per group: document count,
    distinct-host count, the top host's share, and the Shannon entropy
    of the host distribution — the numbers a curation run reports to
    show one megahost is not secretly most of the corpus (C4/RefinedWeb
    both cap and report per-site concentration).

    Share and entropy are emitted micro-fixed (floor(x * 1e6) as
    BIGINT) per the repo's cross-engine idiom: share via pure integer
    division, entropy by flooring each host's -(c/n)*ln(c/n) term
    BEFORE the sum so engines never disagree in late bits.

    Scale shape: one partial-agg shuffle on (group, host) collapses the
    page table to <= |groups| x |hosts| rows; everything after runs on
    that aggregated table (window partitions = one group's hosts), so
    the heavy exchange is the first groupBy only."""
    counts = (pages.groupBy(group_col, host_col)
              .agg(F.count("*").alias("_c")))
    w = Window.partitionBy(group_col)
    n = F.sum("_c").over(w)
    p = F.col("_c").cast("double") / n.cast("double")
    term = F.floor(-(p * F.log(p)) * F.lit(1000000.0)).cast("long")
    enriched = counts.select(
        F.col(group_col), F.col("_c"), n.alias("_n"), term.alias("_term"))
    return (enriched.groupBy(group_col)
            .agg(F.max("_n").alias("_nd"),
                 F.count("*").alias("n_hosts"),
                 F.expr("CAST(max(_c) * 1000000 DIV max(_n) AS BIGINT)")
                 .alias("top_host_share_micro"),
                 F.sum("_term").alias("host_entropy_micro"))
            .select(F.col(group_col),
                    F.col("_nd").cast("long").alias("n_docs"),
                    F.col("n_hosts").cast("long").alias("n_hosts"),
                    "top_host_share_micro",
                    F.col("host_entropy_micro").cast("long")
                    .alias("host_entropy_micro")))


def url_quality_features(pages: DataFrame, url_col: str = "url", *,
                         max_depth: int = 6, max_digit_run: int = 8,
                         max_params: int = 4,
                         max_host_hyphens: int = 3) -> DataFrame:
    """RefinedWeb-style URL quality gate — the filter a corpus builder
    runs BEFORE fetching or even storing a page, on the URL string
    alone: (doc_id, url, host, path_depth, n_params, digit_ratio_r,
    longest_digit_run, host_hyphens, keep, drop_reason).

    Features (each a published URL-spam signal):
      path_depth        non-empty path segments — calendar/faceted
                        crawl traps run deep
      longest_digit_run longest [0-9]+ run in the path — session ids /
                        tracking tokens
      n_params          query parameters — faceted-navigation traps
      host_hyphens      hyphens in the host — spam domain pattern
      digit_ratio_r     digits / path chars (rounded 6dp, reported
                        not gated — the continuous signal for a
                        downstream classifier)

    First-failing-rule-wins drop_reason ('' when kept), the same
    deterministic-audit contract as textstats.quality_filter; a NULL,
    scheme-less, or host-less URL fails first as 'invalid' — junk
    frontier entries must not sail through the gate as all-zero
    feature rows.  The fragment is dropped BEFORE the query extract
    (same hazard canonical_url documents: a '?' inside an SPA-style
    fragment route must not count as query parameters).  Pure
    scan-speed string expressions — at 10^12 URLs this is the cheapest
    gate in the pipeline and it runs before every byte of content is
    paid for."""
    u = F.regexp_extract(F.col(url_col), "^([^#]*)", 1)
    host = canonical_host(u)
    path = F.regexp_extract(u, "^[A-Za-z]+://[^/?#]*([^?#]*)", 1)
    query = F.regexp_extract(u, "\\?(.*)", 1)
    valid = F.col(url_col).isNotNull() & u.rlike("^[A-Za-z]+://[^/?#]")
    depth = F.size(F.filter(F.split(path, "/"),
                            lambda s: s != F.lit("")))
    n_params = F.size(F.filter(F.split(query, "&"),
                               lambda s: s != F.lit("")))
    digit_run = F.coalesce(
        F.array_max(F.transform(
            F.regexp_extract_all(path, F.lit("[0-9]+"), F.lit(0)),
            lambda x: F.length(x))),
        F.lit(0))
    hyphens = F.length(host) - F.length(F.regexp_replace(host, "-", ""))
    n_path = F.length(path)
    digit_ratio = F.round(
        (n_path - F.length(F.regexp_replace(path, "[0-9]", "")))
        / F.greatest(n_path, F.lit(1)), 6)
    reason = (F.when(~F.coalesce(valid, F.lit(False)), F.lit("invalid"))
               .when(depth > max_depth, F.lit("path_depth"))
               .when(digit_run > max_digit_run, F.lit("digit_run"))
               .when(n_params > max_params, F.lit("n_params"))
               .when(hyphens > max_host_hyphens, F.lit("host_hyphens"))
               .otherwise(F.lit("")))
    return pages.select(
        "doc_id", F.col(url_col).alias("url"), host.alias("host"),
        depth.alias("path_depth"),
        n_params.alias("n_params"),
        digit_ratio.alias("digit_ratio_r"),
        digit_run.alias("longest_digit_run"),
        hyphens.alias("host_hyphens"),
        (reason == "").alias("keep"),
        reason.alias("drop_reason"))


def url_template_census(pages: DataFrame, url_col: str = "url", *,
                        trap_min_urls: int = 50,
                        trap_max_distinct_ratio: float = 0.02
                        ) -> DataFrame:
    """Crawl-trap detection by URL-template census: normalize every
    path's digit runs to 'N' and count URLs per (host, template) —
    calendar pages, session-id mirrors, and faceted listings collapse
    onto one template with an exploding URL count while real content
    spreads across many templates.  Output one row per (host,
    template): n_urls, n_distinct_nodigit (distinct URLs AFTER digit
    removal — near-1 for pure digit churn), distinct_ratio_r, and
    is_trap when the template has >= ``trap_min_urls`` URLs whose
    digit-stripped forms collapse to <= ``trap_max_distinct_ratio`` of
    them.  A frontier drops (or rate-caps) trap templates before
    fetching; the census itself is the audit a crawl operator reads.

    Scale shape: one in-row normalization during the scan + ONE
    partial-agg shuffle on (host, template) — the same cost as exact
    URL dedup; no window, no join, no Python."""
    u = F.regexp_extract(F.col(url_col), "^([^#]*)", 1)
    host = canonical_host(u)
    path = F.regexp_extract(u, "^[A-Za-z]+://[^/?#]*([^?#]*)", 1)
    template = F.regexp_replace(path, "[0-9]+", "N")
    nodigit = F.regexp_replace(u, "[0-9]+", "")
    # both distinct counts run on the FRAGMENT-STRIPPED form: fragment
    # variants of one fetchable page must not inflate n_urls (a page
    # with 50 '#sec-x' anchors is one URL, not a trap)
    out = (pages
           .select(host.alias("host"), template.alias("template"),
                   u.alias("u"), nodigit.alias("nd"))
           .groupBy("host", "template")
           .agg(F.countDistinct("u").alias("n_urls"),
                F.countDistinct("nd").alias("n_distinct_nodigit")))
    ratio = F.round(F.col("n_distinct_nodigit")
                    / F.greatest(F.col("n_urls"), F.lit(1)), 6)
    return out.select(
        "host", "template", "n_urls", "n_distinct_nodigit",
        ratio.alias("distinct_ratio_r"),
        ((F.col("n_urls") >= trap_min_urls)
         & (ratio <= trap_max_distinct_ratio)).alias("is_trap"))
