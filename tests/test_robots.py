"""Unit tests for operators/robots.py — RFC 9309 core semantics.

Covers: block grouping with stacked User-agent lines, comment and CRLF
stripping, empty-Disallow skip, agent specificity (exact token beats
'*'; a host with only unrelated agents yields NO rules = allow-all),
longest-prefix-wins, Allow-wins-ties, duplicate input rows surviving
the gate, and the plan staying JVM-only (no Python eval)."""

import pytest

from ukrainian_ocr_pipeline_spark.operators import robots


def _rules(spark, txt, agent="bot", host="h"):
    df = spark.createDataFrame([(host, txt)], "host string, robots_txt string")
    out = robots.parse_robots_rules(df, agent=agent)
    return {(r.host, r.allow, r.prefix, r.prefix_len)
            for r in out.collect()}


def test_star_block_when_no_exact_agent(spark):
    txt = ("User-agent: gptbot\nDisallow: /\n\n"
           "User-agent: *\nDisallow: /private/\nAllow: /pub/\n")
    assert _rules(spark, txt) == {
        ("h", False, "/private/", 9), ("h", True, "/pub/", 5)}


def test_exact_agent_beats_star(spark):
    txt = ("User-agent: *\nDisallow: /a/\n\n"
           "User-agent: bot\nDisallow: /b/\n")
    # only the exact-agent block applies, never both (RFC 9309 2.2.1)
    assert _rules(spark, txt) == {("h", False, "/b/", 3)}


def test_stacked_user_agent_lines_share_one_block(spark):
    txt = "User-agent: bot\nUser-agent: *\nDisallow: /x/\n"
    assert _rules(spark, txt) == {("h", False, "/x/", 3)}


def test_comment_between_stacked_user_agents_does_not_split_group(spark):
    # RFC 9309: comments/blank lines are ignorable anywhere — a comment
    # between stacked User-agent lines must NOT start a new group.
    txt = ("User-agent: bot\n"
           "# note\n"
           "\n"
           "User-agent: other\n"
           "Disallow: /x/\n")
    assert _rules(spark, txt) == {("h", False, "/x/", 3)}


def test_unrelated_agent_only_yields_no_rules(spark):
    txt = "User-agent: otherbot\nDisallow: /\n"
    assert _rules(spark, txt) == set()


def test_comments_crlf_empty_value_and_case(spark):
    txt = ("# policy\r\n"
           "USER-AGENT: BOT\r\n"
           "Disallow: /secret/  # inline\r\n"
           "Disallow:\r\n"              # empty value: ignored per spec
           "allow: /secret/pub/\r\n")
    assert _rules(spark, txt) == {
        ("h", False, "/secret/", 8), ("h", True, "/secret/pub/", 12)}


def _gate(spark, rules_txt, paths, agent="bot"):
    rules = robots.parse_robots_rules(
        spark.createDataFrame([("h", rules_txt)],
                              "host string, robots_txt string"),
        agent=agent)
    urls = spark.createDataFrame([("h", p) for p in paths],
                                 "host string, path string")
    out = robots.robots_gate(urls, rules)
    return {r.path: (r.allowed, r.matched_prefix) for r in out.collect()}


def test_longest_prefix_wins_and_allow_breaks_ties(spark):
    txt = ("User-agent: *\n"
           "Disallow: /private/\n"
           "Allow: /private/press/\n"
           "Disallow: /tie\n"
           "Allow: /tie\n")
    got = _gate(spark, txt, ["/private/x", "/private/press/kit",
                             "/tie/page", "/elsewhere"])
    assert got["/private/x"] == (False, "/private/")
    assert got["/private/press/kit"] == (True, "/private/press/")
    assert got["/tie/page"] == (True, "/tie")        # allow wins the tie
    assert got["/elsewhere"] == (True, "")           # no match => allowed


def test_host_without_rules_allows_everything(spark):
    rules = robots.parse_robots_rules(
        spark.createDataFrame([("other", "User-agent: *\nDisallow: /\n")],
                              "host string, robots_txt string"))
    urls = spark.createDataFrame([("h", "/x")], "host string, path string")
    row = robots.robots_gate(urls, rules).collect()[0]
    assert (row.allowed, row.matched_prefix) == (True, "")


def test_duplicate_input_rows_each_survive(spark):
    rules = robots.parse_robots_rules(
        spark.createDataFrame([("h", "User-agent: *\nDisallow: /x\n")],
                              "host string, robots_txt string"))
    urls = spark.createDataFrame([("h", "/x")] * 3 + [("h", "/ok")] * 2,
                                 "host string, path string")
    out = robots.robots_gate(urls, rules).collect()
    assert len(out) == 5
    assert sum(not r.allowed for r in out) == 3


def test_wildcard_star_and_end_anchor(spark):
    # RFC 9309 §2.2.3: '*' matches any octet run, trailing '$' anchors
    txt = ("User-agent: *\n"
           "Disallow: /a*/b\n"
           "Disallow: /*.pdf$\n")
    got = _gate(spark, txt, ["/a*/bx", "/anything/b", "/x/y",
                             "/doc.pdf", "/doc.pdf?dl=1", "/doc_pdf"])
    assert got["/a*/bx"] == (False, "/a*/b")      # '*' spans '*' too
    assert got["/anything/b"] == (False, "/a*/b")
    assert got["/x/y"] == (True, "")
    assert got["/doc.pdf"] == (False, "/*.pdf$")
    assert got["/doc.pdf?dl=1"] == (True, "")     # anchor holds
    assert got["/doc_pdf"] == (True, "")          # '.' is literal


def test_wildcard_precedence_by_pattern_length(spark):
    # a longer wildcard Allow re-opens a path inside a shorter
    # Disallow (Google-parser tiebreak: rule length as written)
    txt = ("User-agent: *\n"
           "Disallow: /articles/\n"
           "Allow: /articles/*/print\n")
    got = _gate(spark, txt, ["/articles/3", "/articles/3/print"])
    assert got["/articles/3"] == (False, "/articles/")
    assert got["/articles/3/print"] == (True, "/articles/*/print")


def test_wildcard_interior_dollar_is_literal(spark):
    # only a TRAILING '$' anchors; interior dollars are path chars
    txt = "User-agent: *\nDisallow: /a$b\n"
    got = _gate(spark, txt, ["/a$bc", "/ab"])
    assert got["/a$bc"] == (False, "/a$b")
    assert got["/ab"] == (True, "")


def test_parse_and_gate_plans_are_jvm_only(spark):
    df = spark.createDataFrame([("h", "User-agent: *\nDisallow: /x\n")],
                               "host string, robots_txt string")
    rules = robots.parse_robots_rules(df)
    urls = spark.createDataFrame([("h", "/x")], "host string, path string")
    gated = robots.robots_gate(urls, rules)
    for plan_df in (rules, gated):
        plan = plan_df._jdf.queryExecution().executedPlan().toString()
        assert "EvalPython" not in plan


def test_sitemap_line_does_not_split_stacked_ua_run(spark):
    # RFC 9309 §2.2.4: non-group lines (Sitemap, unknown keys) are
    # invisible to group parsing — a Sitemap line between two stacked
    # User-agent lines must NOT split the run, so the Disallow below
    # binds to BOTH agents
    txt = ("User-agent: a\n"
           "Sitemap: https://h/s.xml\n"
           "Unknown-key: v\n"
           "User-agent: b\n"
           "Disallow: /private/\n")
    df = spark.createDataFrame([("h", txt)],
                               "host string, robots_txt string")
    for agent in ("a", "b"):
        rules = robots.parse_robots_rules(df, agent=agent).collect()
        assert [(r.allow, r.prefix) for r in rules] == \
            [(False, "/private/")], agent
    # and the sitemap is still discovered
    assert robots.parse_sitemap_directives(df).collect()[0] \
        .sitemap_url == "https://h/s.xml"
