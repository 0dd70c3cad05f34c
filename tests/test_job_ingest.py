"""End-to-end tests of the WARC ingestion job (jobs/ingest.py):
committed pages parity with the fixture rows, per-file lineage log,
parse-error accounting, and idempotent re-runs."""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "jobs"))

from ukrainian_ocr_pipeline_spark.sources import warc


def _rows(n, host="site"):
    return [{"url": f"https://{host}{i}.example/p/{i}",
             "date": f"2024-01-01T00:{i % 60:02d}:00Z",
             "html": f"<html><body>{host} page {i}</body></html>".encode()}
            for i in range(n)]


def test_ingest_job_end_to_end_and_idempotent(spark, tmp_path, capsys):
    import ingest as job

    from ukrainian_ocr_pipeline_spark.sources.catalog import SnapshotCatalog

    warcs = tmp_path / "warcs"
    warcs.mkdir()
    rows_a, rows_b = _rows(4, "a"), _rows(3, "b")
    rows_b[1]["status"] = 301  # redirect: parsed, logged, not a page
    warc.write_fixture_warc(str(warcs / "a.warc"), rows_a)
    warc.write_fixture_warc(str(warcs / "b.warc.gz"), rows_b, gz=True)
    # one file with a poisoned record between two good ones
    good = warc.build_record("response", warc.build_http_response(b"fine"),
                             url="https://ok.example/1",
                             date="2024-01-02T00:00:00Z")
    bad = good.replace(b"Content-Length: ", b"Content-Length: NaN", 1)
    with open(warcs / "c.warc", "wb") as f:
        f.write(good + bad + good)

    wh = str(tmp_path / "wh")
    rc = job.main(["--warc", str(warcs), "--warehouse", wh,
                   "--snapshot-id", "crawl-1"])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["n_files"] == 3
    assert summary["records_by_type"]["warcinfo"] == 2
    assert summary["records_by_type"]["request"] == 7
    assert summary["records_by_type"]["response"] == 10  # 7 + 3 in c.warc
    assert summary["n_parse_errors"] == 1
    # 4 from a + 2 from b (301 dropped) + 2 good from c
    assert summary["n_pages"] == 8

    cat = SnapshotCatalog(wh)
    pages = {r["url"]: r for r in
             cat.read_snapshot(spark, "pages", "crawl-1").collect()}
    assert set(pages) == ({r["url"] for r in rows_a}
                          | {r["url"] for i, r in enumerate(rows_b) if i != 1}
                          | {"https://ok.example/1"})
    got = pages[rows_a[2]["url"]]
    assert bytes(got["html"]) == rows_a[2]["html"]
    assert got["text"] is None and got["lang"] is None

    log = cat.read_snapshot(spark, "ingest_log", "crawl-1")
    errs = {os.path.basename(r["warc_file"]): r["n_errors"]
            for r in log.where("warc_type = 'response'").collect()}
    assert errs == {"a.warc": 0, "b.warc.gz": 0, "c.warc": 1}

    # idempotent: the second run is a catalog no-op with the same output
    rc2 = job.main(["--warc", str(warcs), "--warehouse", wh,
                    "--snapshot-id", "crawl-1"])
    assert rc2 == 0
    summary2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary2 == summary
    assert len(cat.snapshots("pages")) == 1


def test_ingest_job_missing_path_fails_fast(tmp_path):
    import pytest

    import ingest as job
    with pytest.raises(SystemExit):
        job.main(["--warc", str(tmp_path / "nope"), "--warehouse",
                  str(tmp_path / "wh"), "--snapshot-id", "x"])


def test_ingest_job_cdx_and_revisit_sidecars(spark, tmp_path, capsys):
    """--cdx commits one index row per committed page; --revisit marks
    digest-duplicate captures with pointers to the earliest capture."""
    import hashlib

    import ingest as job

    from ukrainian_ocr_pipeline_spark.sources.catalog import SnapshotCatalog

    warcs = tmp_path / "warcs"
    warcs.mkdir()
    rows = _rows(5, "c")
    # two later captures of row 0's exact payload under other urls/times
    for i, ts in ((1, "00:30"), (2, "00:40")):
        rows[i]["html"] = rows[0]["html"]
        rows[i]["date"] = f"2024-01-01T{ts}:00Z"
    warc.write_fixture_warc(str(warcs / "a.warc"), rows)

    wh = str(tmp_path / "wh")
    rc = job.main(["--warc", str(warcs), "--warehouse", wh,
                   "--snapshot-id", "crawl-cx", "--cdx", "--revisit"])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["n_cdx"] == summary["n_pages"] == 5
    assert summary["revisit_by_type"] == {"response": 3, "revisit": 2}

    cat = SnapshotCatalog(wh)
    cdx = {r.url: r for r in
           cat.read_snapshot(spark, "cdx", "crawl-cx").collect()}
    assert len(cdx) == 5
    r0 = cdx["https://c0.example/p/0"]
    assert r0.surt == "example,c0)/p/0"
    assert r0.ts14 == "20240101000000"
    assert r0.digest == hashlib.md5(rows[0]["html"]).hexdigest()
    assert r0.n_bytes == len(rows[0]["html"])

    rv = {r.url: r for r in
          cat.read_snapshot(spark, "revisit", "crawl-cx").collect()}
    assert rv["https://c0.example/p/0"].record_type == "response"
    for u in ("https://c1.example/p/1", "https://c2.example/p/2"):
        assert rv[u].record_type == "revisit"
        assert rv[u].refers_to_url == "https://c0.example/p/0"

    # idempotent: re-run commits nothing new for the sidecars either
    assert job.main(["--warc", str(warcs), "--warehouse", wh,
                     "--snapshot-id", "crawl-cx", "--cdx",
                     "--revisit"]) == 0
    for t in ("cdx", "revisit"):
        assert len(os.listdir(os.path.join(wh, t, "snapshots"))) == 1


def test_ingest_job_wat_sidecar(spark, tmp_path, capsys):
    """--wat commits one WARC/1.0 metadata record per committed page;
    each parses back through the codec and carries the page's title
    and hrefs in document order."""
    import ingest as job

    from ukrainian_ocr_pipeline_spark.sources.catalog import SnapshotCatalog

    warcs = tmp_path / "warcs"
    warcs.mkdir()
    rows = _rows(3, "w")
    rows[0]["html"] = (b'<html><head><title>T zero</title></head><body>'
                       b'<a href="https://x.example/a">x</a>'
                       b"<a href='/rel'>y</a></body></html>")
    warc.write_fixture_warc(str(warcs / "a.warc"), rows)

    wh = str(tmp_path / "wh")
    rc = job.main(["--warc", str(warcs), "--warehouse", wh,
                   "--snapshot-id", "crawl-wat", "--wat"])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["n_wat"] == summary["n_pages"] == 3
    assert summary["wat_links_total"] == 2

    cat = SnapshotCatalog(wh)
    wat = {r.url: r for r in
           cat.read_snapshot(spark, "wat", "crawl-wat").collect()}
    r0 = wat["https://w0.example/p/0"]
    assert r0.n_links == 2
    recs = list(warc.iter_warc_records(r0.wat_record.encode("utf-8")))
    assert len(recs) == 1 and recs[0]["error"] is None
    assert recs[0]["warc_type"] == "metadata"
    meta = json.loads(recs[0]["payload"].decode("utf-8"))
    env = meta["Envelope"]
    assert env["WARC-Header-Metadata"]["WARC-Date"] == "2024-01-01T00:00:00Z"
    hm = env["Payload-Metadata"]["HTML-Metadata"]
    assert hm["Head"]["Title"] == "T zero"
    assert [l["url"] for l in hm["Links"]] == ["https://x.example/a", "/rel"]

    # idempotent re-run: still one committed manifest for the sidecar
    assert job.main(["--warc", str(warcs), "--warehouse", wh,
                     "--snapshot-id", "crawl-wat", "--wat"]) == 0
    assert len(os.listdir(os.path.join(wh, "wat", "snapshots"))) == 1


def test_ingest_wacz_archive(tmp_path, spark):
    """A .wacz delivery ingests through the same job surface: ZIP walk
    -> member WARCs (plain AND gzip members) -> pages table, with
    archive!member lineage paths in the ingest log."""
    from ukrainian_ocr_pipeline_spark.sources import warc as w

    rows = [{"url": f"https://z{i}.example/p/{i}",
             "date": f"2024-01-01T00:{i:02d}:00Z",
             "html": f"<html><body>wacz page {i}</body></html>".encode()}
            for i in range(8)]
    plain = b"".join(
        w.build_record("response", w.build_http_response(r["html"]),
                       url=r["url"], date=r["date"],
                       content_type="application/http; msgtype=response")
        for r in rows[:5])
    gz = w.compress_warc_members(
        w.build_record("response", w.build_http_response(r["html"]),
                       url=r["url"], date=r["date"],
                       content_type="application/http; msgtype=response")
        for r in rows[5:])
    blob = w.build_fixture_wacz([
        ("datapackage.json", b"{}", False),
        ("archive/a.warc", plain, True),
        ("archive/b.warc.gz", gz, False),
    ])
    d = tmp_path / "wacz"
    d.mkdir()
    (d / "crawl.wacz").write_bytes(blob)

    records = w.read_warc(spark, str(d))
    got = records.where("warc_type = 'response'").collect()
    assert len(got) == 8
    assert sorted(r["url"] for r in got) == sorted(r["url"] for r in rows)
    files = {r["warc_file"] for r in got}
    assert any(f.endswith("crawl.wacz!archive/a.warc") for f in files)
    assert any(f.endswith("crawl.wacz!archive/b.warc.gz") for f in files)
    pages = w.pages_from_warc(records)
    assert pages.count() == 8
