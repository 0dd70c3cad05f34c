"""Unit tests for operators/crawl.py (sitemap parse + frontier
scheduling) and dedup.host_boilerplate_lines."""

from pyspark.sql import functions as F

from ukrainian_ocr_pipeline_spark.operators import crawl, dedup, robots


def _parse(spark, xml, host="h"):
    df = spark.createDataFrame([(host, xml)],
                               "host string, sitemap_xml string")
    return sorted((r.entry_type, r.loc, r.lastmod, r.priority)
                  for r in crawl.parse_sitemap(df).collect())


def test_urlset_fields_and_defaults(spark):
    xml = ('<urlset><url><loc>https://h/a</loc>'
           '<lastmod>2024-01-03</lastmod><priority>0.8</priority></url>'
           '<url><loc>https://h/b</loc></url></urlset>')
    assert _parse(spark, xml) == [
        ("page", "https://h/a", "2024-01-03", 0.8),
        ("page", "https://h/b", None, 0.5),
    ]


def test_uppercase_tags_and_whitespace_loc(spark):
    xml = "<URLSET><URL><LOC>  https://h/c  </LOC></URL></URLSET>"
    assert _parse(spark, xml) == [("page", "https://h/c", None, 0.5)]


def test_sitemapindex_entries_are_typed_sitemap(spark):
    xml = ('<sitemapindex><sitemap><loc>https://h/s1.xml</loc>'
           '<lastmod>2024-03-01</lastmod></sitemap>'
           '<sitemap><loc>https://h/s2.xml</loc></sitemap></sitemapindex>')
    assert _parse(spark, xml) == [
        ("sitemap", "https://h/s1.xml", "2024-03-01", 0.5),
        ("sitemap", "https://h/s2.xml", None, 0.5),
    ]


def test_entry_free_sitemap_yields_no_rows(spark):
    assert _parse(spark, '<?xml version="1.0"?><urlset></urlset>') == []


def test_frontier_rounds_and_eta(spark):
    urls = spark.createDataFrame(
        [("slow.example", "https://slow.example/a", 9.0),
         ("slow.example", "https://slow.example/b", 5.0),
         ("slow.example", "https://slow.example/c", 5.0),
         ("fast.example", "https://fast.example/x", 1.0)],
        "host string, url string, score double")
    delays = spark.createDataFrame([("slow.example", 10.0)],
                                   "host string, crawl_delay double")
    got = {r.url: (r.fetch_round, r.eta_seconds, r.crawl_delay)
           for r in crawl.frontier_assign(urls, delays).collect()}
    # score desc, then url asc as the deterministic tiebreak
    assert got["https://slow.example/a"] == (1, 0.0, 10.0)
    assert got["https://slow.example/b"] == (2, 10.0, 10.0)
    assert got["https://slow.example/c"] == (3, 20.0, 10.0)
    # host without a delay row gets the default (1.0)
    assert got["https://fast.example/x"] == (1, 0.0, 1.0)


def test_parse_crawl_delay_specificity_and_validation(spark):
    txt = ("User-agent: *\nCrawl-delay: 2\n\n"
           "User-agent: bot\nCrawl-delay: 7\nCrawl-delay: 3\n\n"
           "User-agent: junk\nCrawl-delay: soon\n")
    df = spark.createDataFrame([("h", txt)],
                               "host string, robots_txt string")
    # exact-agent group wins; multiple values collapse to max
    assert robots.parse_crawl_delay(df, agent="bot").collect()[0] \
        .crawl_delay == 7.0
    assert robots.parse_crawl_delay(df, agent="other").collect()[0] \
        .crawl_delay == 2.0
    # non-numeric value: no row (frontier falls back to its default)
    assert robots.parse_crawl_delay(df, agent="junk").count() == 0


def test_host_boilerplate_census(spark):
    rows = []
    for i in range(10):
        lines = ["nav | h1"]                      # every page
        if i % 2 == 0:
            lines.append("footer h1")             # half the pages
        if i == 0:
            lines.append("one-off line")          # once: below min_pages
        lines.append(f"body {i}")                 # unique
        # odd pages use CRLF + a blank line: \r must not leak into the
        # line key (LF and CRLF pages share boilerplate) nor survive
        # the non-empty filter as a ghost "\r" line
        sep = "\n" if i % 2 == 0 else "\r\n"
        rows.append((i, "h1", sep.join(lines) + sep))
    rows.append((99, "h2", "nav | h1"))           # other host: 1 page only
    docs = spark.createDataFrame(rows, "doc_id long, host string, text string")
    got = {(r.host, r.line): (r.n_pages, r.host_pages, r.frac)
           for r in dedup.host_boilerplate_lines(
               docs, min_frac=0.4, min_pages=2).collect()}
    assert got == {
        ("h1", "nav | h1"): (10, 10, 1.0),
        ("h1", "footer h1"): (5, 10, 0.5),
    }  # h2's single page can never pass min_pages=2


def test_crawl_plans_are_jvm_only(spark):
    urls = spark.createDataFrame([("h", "https://h/a", 1.0)],
                                 "host string, url string, score double")
    delays = spark.createDataFrame([("h", 2.0)],
                                   "host string, crawl_delay double")
    for df in (crawl.parse_sitemap(spark.createDataFrame(
                   [("h", "<urlset><url><loc>x</loc></url></urlset>")],
                   "host string, sitemap_xml string")),
               crawl.frontier_assign(urls, delays)):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "EvalPython" not in plan
    # caller-side broadcast hint (the operator's contract) -> hash join
    fplan = crawl.frontier_assign(urls, F.broadcast(delays)) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in fplan
    assert "BroadcastNestedLoop" not in fplan


def _resolve(spark, edges, max_hops=8):
    df = spark.createDataFrame(edges, "src string, dst string")
    return {r.src: (r.final_url, r.hops, r.resolved)
            for r in crawl.resolve_redirects(df, max_hops=max_hops)
                          .collect()}


def test_redirect_chain_exact_hops(spark):
    got = _resolve(spark, [("a", "b"), ("b", "c"), ("c", "d")])
    assert got == {"a": ("d", 3, True),
                   "b": ("d", 2, True),
                   "c": ("d", 1, True)}


def test_redirect_cycles_unresolved(spark):
    got = _resolve(spark, [("x", "y"), ("y", "x"),   # 2-cycle
                           ("s", "s"),               # self-loop
                           ("in", "x")])             # chain INTO a cycle
    assert got == {"x": (None, None, False),
                   "y": (None, None, False),
                   "s": (None, None, False),
                   "in": (None, None, False)}


def test_redirect_max_hops_boundary(spark):
    # chain of length 9: head unresolved at max_hops=8, second node
    # (length 8) resolves exactly at the bound
    edges = [(f"n{i}", f"n{i+1}") for i in range(9)]  # n0->..->n9
    got = _resolve(spark, edges, max_hops=8)
    assert got["n0"] == (None, None, False)
    assert got["n1"] == ("n9", 8, True)
    # and a roomier bound resolves the head too, hop count exact
    assert _resolve(spark, edges, max_hops=9)["n0"] == ("n9", 9, True)


def test_redirect_plan_jvm_only_and_bounded_joins(spark):
    df = spark.createDataFrame([("a", "b")], "src string, dst string")
    out = crawl.resolve_redirects(df, max_hops=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
    # each doubling round is localCheckpoint'ed, so the returned plan is
    # ONE join over the materialized last round — not a 2^rounds-deep
    # self-join tree (the pre-checkpoint shape had 15 join nodes)
    lplan = out._jdf.queryExecution().optimizedPlan().toString()
    assert lplan.count("Join") <= 1


def test_redirect_null_dst_is_dead_end(spark):
    # a missing/unparseable Location header (NULL dst) must not
    # masquerade as a terminal — neither for its own src nor for a
    # chain that runs into it
    got = _resolve(spark, [("a", "b"), ("b", None), ("ok", "t")])
    assert got["a"] == (None, None, False)
    assert got["b"] == (None, None, False)
    assert got["ok"] == ("t", 1, True)


def test_frontier_url_resolve_statuses(spark):
    pages = spark.createDataFrame(
        [(1, "HTTPS://WWW.h.example/a?utm_x=1#f"),  # canonicalizes into map
         (2, "https://h.example/b/"),               # trailing slash -> chain
         (3, "https://h.example/dead"),             # chain into a cycle
         (4, "https://h.example/plain")],           # not in the map
        "doc_id long, url string")
    redirects = spark.createDataFrame(
        [("https://h.example/a", "https://h.example/t"),
         ("https://h.example/b", "https://h.example/a"),
         ("https://h.example/dead", "https://h.example/loop"),
         ("https://h.example/loop", "https://h.example/loop")],
        "src string, dst string")
    got = {r.doc_id: (r.canonical_url, r.final_url, r.status)
           for r in crawl.resolve_frontier_urls(pages, redirects).collect()}
    assert got == {
        1: ("https://h.example/a", "https://h.example/t", "redirected"),
        2: ("https://h.example/b", "https://h.example/t", "redirected"),
        3: ("https://h.example/dead", None, "dead"),
        4: ("https://h.example/plain", "https://h.example/plain", "direct"),
    }


def test_sitemap_directive_discovery(spark):
    txt = ("Sitemap: https://h/top.xml\n"          # before any group
           "User-agent: *\nDisallow: /x\n"
           "Sitemap: HTTPS://h/Nested.XML # c\n"   # inside a group, case
           "Sitemap: HTTPS://h/Nested.XML\n"       # duplicate collapses
           "Sitemap:\n")                            # empty value ignored
    df = spark.createDataFrame([("h", txt), ("empty.example", "User-agent: *\nAllow: /\n")],
                               "host string, robots_txt string")
    got = sorted((r.host, r.sitemap_url)
                 for r in robots.parse_sitemap_directives(df).collect())
    assert got == [("h", "HTTPS://h/Nested.XML"),
                   ("h", "https://h/top.xml")]


def test_frontier_url_resolve_dirty_map_and_invalid_urls(spark):
    # the redirect map itself carries crawl noise: the operator must
    # canonicalize BOTH sides before chaining; invalid raw URLs are
    # dead, never a bogus 'direct' fetch group
    pages = spark.createDataFrame(
        [(1, "https://h.example/a"),
         (2, None),
         (3, "not a url"),
         (4, "://missing-scheme/x")],
        "doc_id long, url string")
    redirects = spark.createDataFrame(
        [("HTTPS://WWW.h.example/a?utm_x=1#f", "https://h.example/t/"),
         # duplicate canonical src with a conflicting target: the
         # deterministic collapse keeps the lexicographically smaller
         # canonical dst ('.../t' < '.../t0')
         ("https://h.example/a/", "https://h.example/t0")],
        "src string, dst string")
    got = {r.doc_id: (r.final_url, r.status)
           for r in crawl.resolve_frontier_urls(pages, redirects).collect()}
    assert got[1] == ("https://h.example/t", "redirected")
    assert got[2] == (None, "dead")
    assert got[3] == (None, "dead")
    assert got[4] == (None, "dead")


def test_budget_allocation_largest_remainder(spark):
    # budget 10 over scores 5:3:1:1(+0): ideals 5.0/3.0/1.0/1.0 exact
    # -> no remainders; budget 11 -> ideals 5.5/3.3/1.1/1.1: base
    # 5/3/1/1 (sum 10), one top-up to the largest remainder (a: .5)
    hs = spark.createDataFrame(
        [("a", 5), ("b", 3), ("c", 1), ("d", 1), ("z", 0)],
        "host string, score long")
    q10 = {r.host: r.quota
           for r in crawl.allocate_crawl_budget(hs, 10).collect()}
    assert q10 == {"a": 5, "b": 3, "c": 1, "d": 1, "z": 0}
    q11 = {r.host: r.quota
           for r in crawl.allocate_crawl_budget(hs, 11).collect()}
    assert q11 == {"a": 6, "b": 3, "c": 1, "d": 1, "z": 0}
    assert sum(q11.values()) == 11
    # remainder ties break by host asc: scores 1:1:1, budget 4 ->
    # base 1 each, one top-up to 'a'
    hs3 = spark.createDataFrame([("c", 1), ("a", 1), ("b", 1)],
                                "host string, score long")
    q4 = {r.host: r.quota
          for r in crawl.allocate_crawl_budget(hs3, 4).collect()}
    assert q4 == {"a": 2, "b": 1, "c": 1}


def test_budget_allocation_zero_mass(spark):
    hs = spark.createDataFrame([("a", 0), ("b", 0)],
                               "host string, score long")
    assert {r.host: r.quota
            for r in crawl.allocate_crawl_budget(hs, 7).collect()} \
        == {"a": 0, "b": 0}


def test_recrawl_reasons(spark):
    pages = spark.createDataFrame(
        [("h", "https://h/fresh", "2024-01-03"),
         ("h", "https://h/mod", "2024-02-05T10:00:00+00:00"),
         ("h", "https://h/modz", "2024-02-05T10:00:00Z"),
         ("h", "https://h/new", None),
         ("h", "https://h/aged", None),
         ("h", "https://h/young", None)],
        "host string, loc string, lastmod string")
    fetched = spark.createDataFrame(
        [("https://h/fresh", "2024-01-20T00:00:00"),
         ("https://h/mod", "2024-01-10T00:00:00"),
         ("https://h/modz", "2024-01-10T00:00:00"),
         ("https://h/aged", "2023-11-01T00:00:00"),
         ("https://h/young", "2024-02-20T00:00:00")],
        "url string, last_fetch string")
    out = crawl.recrawl_candidates(pages, fetched,
                                   as_of="2024-03-01", max_age_days=45)
    got = {r.loc: (r.reason, r.refetch) for r in out.collect()}
    assert got == {
        "https://h/fresh": ("fresh", False),   # lastmod before fetch
        "https://h/mod": ("modified", True),   # +00:00 stripped, after
        "https://h/modz": ("modified", True),  # Z stripped, after
        "https://h/new": ("new", True),        # no snapshot row
        "https://h/aged": ("aged", True),      # blind refresh past 45d
        "https://h/young": ("fresh", False),   # within max_age
    }


def test_resolve_redirects_randomized_matches_python_walk(spark):
    """Random redirect maps (chains, merges, cycles, self-loops,
    chains into cycles, NULL targets) vs a pure-Python bounded walk:
    (final_url, hops, resolved) must be cell-exact for every src."""
    import random

    rng = random.Random(20260819)
    for trial in range(3):
        n = rng.randint(8, 40)
        max_hops = rng.choice([3, 8, 11])
        nodes = [f"u{i}" for i in range(n)]
        edges = {}
        for i, s in enumerate(nodes):
            if rng.random() < 0.7:        # ~30% of nodes are terminals
                edges[s] = rng.choice(
                    [None] if rng.random() < 0.1
                    else [rng.choice(nodes)])
        if not edges:
            continue

        want = {}
        for s in edges:
            cur, hops, seen = s, 0, set()
            res = (None, None, False)
            while True:
                if hops >= max_hops and cur in edges:
                    break
                if cur in edges:
                    if cur in seen:
                        break
                    seen.add(cur)
                    nxt = edges[cur]
                    if nxt is None:
                        break
                    cur, hops = nxt, hops + 1
                else:
                    res = (cur, hops, True)
                    break
            want[s] = res
        df = spark.createDataFrame(list(edges.items()),
                                   "src string, dst string")
        got = {r.src: (r.final_url, r.hops, r.resolved)
               for r in crawl.resolve_redirects(
                   df, max_hops=max_hops).collect()}
        assert got == want, f"trial {trial} max_hops {max_hops}"


def test_budget_allocation_randomized_invariants(spark):
    """Random score tables: sum(quota) == budget exactly whenever any
    score is positive; zero-score hosts get 0; quota is within 1 of
    the exact proportional share; result is a pure function of the
    input (re-run identical)."""
    import random

    rng = random.Random(20260820)
    for trial in range(3):
        budget = rng.choice([7, 97, 1000])
        hosts = [(f"h{i}", rng.choice([0, 0, rng.randint(1, 500)]))
                 for i in range(rng.randint(3, 30))]
        df = spark.createDataFrame(hosts, "host string, score long")
        got = {r.host: r.quota
               for r in crawl.allocate_crawl_budget(df, budget).collect()}
        total = sum(s for _, s in hosts)
        if total == 0:
            assert set(got.values()) == {0}
            continue
        assert sum(got.values()) == budget, f"trial {trial}"
        for h, s in hosts:
            if s == 0:
                assert got[h] == 0
            else:
                exact = budget * s / total
                assert exact - 1 < got[h] < exact + 1, (h, s, got[h])
        rerun = {r.host: r.quota
                 for r in crawl.allocate_crawl_budget(df, budget)
                              .collect()}
        assert rerun == got
