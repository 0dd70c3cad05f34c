"""End-to-end tests for jobs/crawlplan.py: the full planning cycle
(robots policy -> sitemap pages -> recrawl decision -> redirect fold ->
robots gate -> politeness frontier -> budget split), cross-checked
against the standalone operators, plus idempotency and the loud-failure
parse guards."""

import json
import os

import pytest
from pyspark.sql import functions as F

from jobs.crawlplan import main as crawlplan_main

ROBOTS_TXT = ("Sitemap: https://__H__/sitemap.xml\n"
              "User-agent: planbot\n"
              "Disallow: /private/\n"
              "Crawl-delay: 10\n"
              "\n"
              "User-agent: *\n"
              "Disallow: /\n")

SITEMAP_XML = ("<urlset>"
               "<url><loc>https://__H__/fresh</loc>"
               "<lastmod>2024-01-03</lastmod></url>"
               "<url><loc>https://__H__/stale</loc>"
               "<lastmod>2024-02-05T10:00:00+00:00</lastmod>"
               "<priority>0.9</priority></url>"
               "<url><loc>https://__H__/new</loc></url>"
               "<url><loc>https://__H__/moved</loc>"
               "<lastmod>2024-02-20</lastmod></url>"
               "<url><loc>https://__H__/dead</loc>"
               "<lastmod>2024-02-20</lastmod></url>"
               "<url><loc>https://__H__/private/kit</loc></url>"
               "</urlset>")

HOSTS = ["h1.example", "h2.example"]


def _write_inputs(spark, root):
    paths = {}
    robots = spark.createDataFrame(
        [(h, ROBOTS_TXT.replace("__H__", h)) for h in HOSTS],
        "host string, robots_txt string")
    sitemaps = spark.createDataFrame(
        [(h, SITEMAP_XML.replace("__H__", h)) for h in HOSTS],
        "host string, sitemap_xml string")
    fetchlog = spark.createDataFrame(
        [(f"https://{h}/fresh", "2024-01-20T00:00:00") for h in HOSTS]
        + [(f"https://{h}/stale", "2024-01-10T00:00:00") for h in HOSTS]
        + [(f"https://{h}/moved", "2024-01-10T00:00:00") for h in HOSTS]
        + [(f"https://{h}/dead", "2024-01-10T00:00:00") for h in HOSTS],
        "url string, last_fetch string")
    redirects = spark.createDataFrame(
        [(f"https://{h}/moved", f"https://{h}/target") for h in HOSTS]
        + [(f"https://{h}/dead", f"https://{h}/loop") for h in HOSTS]
        + [(f"https://{h}/loop", f"https://{h}/dead") for h in HOSTS],
        "src string, dst string")
    for name, df in [("robots", robots), ("sitemaps", sitemaps),
                     ("fetchlog", fetchlog), ("redirects", redirects)]:
        paths[name] = os.path.join(root, name + ".parquet")
        df.write.mode("overwrite").parquet(paths[name])
    return paths


def _run(spark, paths, wh, snap="plan-001", extra=()):
    argv = ["--robots", paths["robots"], "--sitemaps", paths["sitemaps"],
            "--fetchlog", paths["fetchlog"],
            "--redirects", paths["redirects"],
            "--warehouse", wh, "--snapshot-id", snap,
            "--as-of", "2024-03-01", "--agent", "planbot",
            "--budget", "11"] + list(extra)
    rc = crawlplan_main(argv)
    assert rc == 0
    return rc


def test_crawlplan_end_to_end(spark, tmp_path, capsys):
    paths = _write_inputs(spark, str(tmp_path / "in"))
    wh = str(tmp_path / "wh")
    _run(spark, paths, wh)
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    # per host: fresh (lastmod before fetch) + 1 new + 1 stale-modified
    # + moved (modified, redirect-folds to /target) + dead (modified,
    # chain is a 2-cycle) + /private/kit (new, robots-denied)
    assert stats["sitemap_pages"] == 12
    assert stats["pages_fresh"] == 2
    assert stats["pages_new"] == 4          # /new + /private/kit per host
    assert stats["pages_modified"] == 6     # stale, moved, dead per host
    assert stats["refetch_candidates"] == 10
    assert stats["dead_redirects"] == 2
    assert stats["denied_robots"] == 2
    # frontier: stale, new, moved->target per host
    assert stats["frontier_urls"] == 6
    assert stats["hosts"] == 2
    assert stats["sitemaps_discovered"] == 2
    assert stats["budget_quota_total"] == 11

    # committed frontier cross-checked: redirect folded, politeness
    # delay from robots, per-host rounds dense from 1
    from ukrainian_ocr_pipeline_spark.sources.catalog import SnapshotCatalog
    cat = SnapshotCatalog(wh)
    frontier = cat.read_snapshot(spark, "plan_frontier", "plan-001")
    rows = {(r.host, r.url): (r.fetch_round, r.eta_seconds, r.crawl_delay)
            for r in frontier.collect()}
    for h in HOSTS:
        assert (h, f"https://{h}/target") in rows      # folded
        assert (h, f"https://{h}/moved") not in rows
        assert (h, f"https://{h}/dead") not in rows    # dead chain
        assert (h, f"https://{h}/private/kit") not in rows  # denied
        per_host = sorted(v[0] for (hh, _), v in rows.items() if hh == h)
        assert per_host == [1, 2, 3]
        assert all(v[2] == 10.0 for (hh, _), v in rows.items() if hh == h)
    # highest sitemap priority fetched first
    assert rows[(HOSTS[0], f"https://{HOSTS[0]}/stale")][0] == 1

    # budget: largest remainder over candidate counts (3 vs 3, 11 ->
    # 6/5 split with the tie top-up to the lexicographically first)
    budget = {r.host: r.quota
              for r in cat.read_snapshot(spark, "plan_budget",
                                         "plan-001").collect()}
    assert budget == {"h1.example": 6, "h2.example": 5}


def test_crawlplan_idempotent_rerun(spark, tmp_path, capsys):
    paths = _write_inputs(spark, str(tmp_path / "in"))
    wh = str(tmp_path / "wh")
    _run(spark, paths, wh)
    first = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    _run(spark, paths, wh)
    second = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert first == second
    # one manifest per table, not two
    for table in ["plan_sitemaps", "plan_recrawl", "plan_candidates",
                  "plan_frontier", "plan_budget"]:
        snapdir = os.path.join(wh, table, "snapshots")
        assert len(os.listdir(snapdir)) == 1, table


def test_crawlplan_first_cycle_without_fetchlog(spark, tmp_path, capsys):
    paths = _write_inputs(spark, str(tmp_path / "in"))
    wh = str(tmp_path / "wh")
    argv = ["--robots", paths["robots"], "--sitemaps", paths["sitemaps"],
            "--warehouse", wh, "--snapshot-id", "plan-002",
            "--as-of", "2024-03-01", "--agent", "planbot"]
    assert crawlplan_main(argv) == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["pages_new"] == stats["sitemap_pages"] == 12
    assert "budget_quota_total" not in stats  # opt-in table absent


def test_crawlplan_parse_guards(spark, tmp_path):
    paths = _write_inputs(spark, str(tmp_path / "in"))
    wh = str(tmp_path / "wh")
    base = ["--robots", paths["robots"], "--sitemaps", paths["sitemaps"],
            "--warehouse", wh, "--snapshot-id", "x"]
    for bad in (["--as-of", "March 1"],
                ["--as-of", "2024-03-01", "--max-age-days", "0"],
                ["--as-of", "2024-03-01", "--budget", "-1"],
                ["--as-of", "2024-03-01", "--max-hops", "0"]):
        with pytest.raises(SystemExit):
            crawlplan_main(base + bad)


def test_crawlplan_cross_host_redirect_follows_target_policy(
        spark, tmp_path, capsys):
    """A redirect to ANOTHER host must be gated by and scheduled under
    the TARGET host's rules/delay — not the source's."""
    root = str(tmp_path / "in")
    os.makedirs(root, exist_ok=True)
    robots = spark.createDataFrame(
        [("open.example", "User-agent: *\nAllow: /\nCrawl-delay: 2\n"),
         ("strict.example",
          "User-agent: *\nDisallow: /private/\nCrawl-delay: 9\n")],
        "host string, robots_txt string")
    sitemaps = spark.createDataFrame(
        [("open.example",
          "<urlset><url><loc>https://open.example/moved1</loc></url>"
          "<url><loc>https://open.example/moved2</loc></url></urlset>")],
        "host string, sitemap_xml string")
    redirects = spark.createDataFrame(
        [("https://open.example/moved1", "https://strict.example/ok"),
         ("https://open.example/moved2", "https://strict.example/private/x"),
         # duplicate src rows (a retry): must collapse, not multiply
         ("https://open.example/moved1", "https://strict.example/ok")],
        "src string, dst string")
    paths = {}
    for name, df in [("robots", robots), ("sitemaps", sitemaps),
                     ("redirects", redirects)]:
        paths[name] = os.path.join(root, name + ".parquet")
        df.write.mode("overwrite").parquet(paths[name])
    wh = str(tmp_path / "wh")
    rc = crawlplan_main(
        ["--robots", paths["robots"], "--sitemaps", paths["sitemaps"],
         "--redirects", paths["redirects"], "--warehouse", wh,
         "--snapshot-id", "x1", "--as-of", "2024-03-01"])
    assert rc == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["refetch_candidates"] == 2      # dup src did not multiply
    assert stats["denied_robots"] == 1           # strict's /private/ rule
    from ukrainian_ocr_pipeline_spark.sources.catalog import SnapshotCatalog
    cat = SnapshotCatalog(wh)
    rows = {r.url: (r.host, r.crawl_delay) for r in cat.read_snapshot(
        spark, "plan_frontier", "x1").collect()}
    # scheduled under the TARGET host with the TARGET's delay
    assert rows == {"https://strict.example/ok": ("strict.example", 9.0)}


def test_crawlplan_bare_host_and_duplicate_sitemap_entries(
        spark, tmp_path, capsys):
    """A bare-host loc gates as path '/' (Disallow: / must catch it);
    a loc repeated in the sitemap produces ONE candidate row."""
    root = str(tmp_path / "in")
    os.makedirs(root, exist_ok=True)
    robots = spark.createDataFrame(
        [("closed.example", "User-agent: *\nDisallow: /\n"),
         ("open.example", "User-agent: *\nAllow: /x\n")],
        "host string, robots_txt string")
    sitemaps = spark.createDataFrame(
        [("closed.example",
          "<urlset><url><loc>https://closed.example</loc></url></urlset>"),
         ("open.example",
          "<urlset><url><loc>https://open.example/dup</loc>"
          "<priority>0.3</priority></url>"
          "<url><loc>https://open.example/dup</loc>"
          "<priority>0.8</priority></url></urlset>")],
        "host string, sitemap_xml string")
    paths = {}
    for name, df in [("robots", robots), ("sitemaps", sitemaps)]:
        paths[name] = os.path.join(root, name + ".parquet")
        df.write.mode("overwrite").parquet(paths[name])
    wh = str(tmp_path / "wh")
    rc = crawlplan_main(
        ["--robots", paths["robots"], "--sitemaps", paths["sitemaps"],
         "--warehouse", wh, "--snapshot-id", "x2",
         "--as-of", "2024-03-01"])
    assert rc == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["sitemap_pages"] == 2           # dup collapsed pre-join
    assert stats["denied_robots"] == 1           # bare host hit Disallow: /
    assert stats["frontier_urls"] == 1
    from ukrainian_ocr_pipeline_spark.sources.catalog import SnapshotCatalog
    cat = SnapshotCatalog(wh)
    f = cat.read_snapshot(spark, "plan_frontier", "x2").collect()
    assert [(r.url, r.score) for r in f] == \
        [("https://open.example/dup", 0.8)]     # max declared priority


def test_crawlplan_www_host_keys_still_apply_policy(spark, tmp_path,
                                                    capsys):
    """robots/sitemap tables keyed 'www.Site.com' must still supply
    rules + Crawl-delay for candidates whose canonicalized URLs say
    'site.com'; a query-only URL gates as path '/'."""
    root = str(tmp_path / "in")
    os.makedirs(root, exist_ok=True)
    robots = spark.createDataFrame(
        [("www.Closed.example",
          "User-agent: *\nDisallow: /\nCrawl-delay: 5\n")],
        "host string, robots_txt string")
    sitemaps = spark.createDataFrame(
        [("www.Closed.example",
          "<urlset><url><loc>https://www.closed.example?sid=1</loc>"
          "</url></urlset>")],
        "host string, sitemap_xml string")
    paths = {}
    for name, df in [("robots", robots), ("sitemaps", sitemaps)]:
        paths[name] = os.path.join(root, name + ".parquet")
        df.write.mode("overwrite").parquet(paths[name])
    wh = str(tmp_path / "wh")
    rc = crawlplan_main(
        ["--robots", paths["robots"], "--sitemaps", paths["sitemaps"],
         "--warehouse", wh, "--snapshot-id", "x3",
         "--as-of", "2024-03-01"])
    assert rc == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # the query-only URL canonicalizes to the bare host, gates as '/',
    # and is denied under the www-keyed robots' 'Disallow: /'
    assert stats["denied_robots"] == 1
    assert stats["frontier_urls"] == 0
