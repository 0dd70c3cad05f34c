"""End-to-end smoke of the corpus health-report job (jobs/report.py):
the three committed tables cross-check against the standalone operators,
and re-runs are idempotent no-ops."""

import json
import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "jobs"))

SF_DIR = "/root/testdata/sf0.001"


def test_report_job_end_to_end(spark, tmp_path, capsys):
    import report as job

    wh = str(tmp_path / "wh")
    docs_path = f"{SF_DIR}/documents.parquet"
    rc = job.main(["--docs", docs_path, "--warehouse", wh,
                   "--snapshot-id", "r1"])
    assert rc == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    from ukrainian_ocr_pipeline_spark.operators import dedup, sketches, textstats
    from ukrainian_ocr_pipeline_spark.sources.catalog import SnapshotCatalog
    cat = SnapshotCatalog(wh)
    for t in ["report_lang", "report_terms", "report_summary"]:
        assert cat.is_committed(t, "r1")

    docs = spark.read.parquet(docs_path)
    n_docs = docs.count()
    assert stats["n_docs"] == n_docs
    assert stats["langs"] == docs.select("lang").distinct().count()
    assert stats["terms"] == 20

    # summary cross-checks vs standalone operators
    assert stats["n_distinct_content"] == dedup.exact_duplicates(docs).count()
    n_pass = (textstats.quality_filter(docs)
              .where(F.col("keep")).count())
    assert stats["n_quality_pass"] == n_pass
    assert stats["quality_pass_rate_r"] == round(n_pass / n_docs, 6)

    # per-lang table: doc counts exact, HLL estimate sits next to the
    # exact distinct with the recorded rel_err
    lang = cat.read_snapshot(spark, "report_lang", "r1")
    want = {r["lang"]: r["cnt"] for r in docs.groupBy("lang")
            .agg(F.count("*").alias("cnt")).collect()}
    got = {r["lang"]: r for r in lang.collect()}
    assert {k: v["n_docs"] for k, v in got.items()} == want
    for r in got.values():
        assert r["distinct_tokens_hll_r"] is not None
        assert abs(r["rel_err_r"]) < 0.30  # 4-sigma HLL bound at m=256

    # terms table == the standalone CM heavy hitters verbatim
    terms = cat.read_snapshot(spark, "report_terms", "r1")
    want_terms = sketches.cm_heavy_hitters(docs, top_k=20).collect()
    got_terms = terms.orderBy(F.desc("cm_estimate"), "word").collect()
    assert [(r["word"], r["cm_estimate"], r["exact_count"])
            for r in got_terms] == \
        [(r["word"], r["cm_estimate"], r["exact_count"]) for r in want_terms]

    # idempotent re-run: same stats, still exactly one manifest per table
    rc2 = job.main(["--docs", docs_path, "--warehouse", wh,
                    "--snapshot-id", "r1"])
    assert rc2 == 0
    stats2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats2 == stats
    for t in ["report_lang", "report_terms", "report_summary"]:
        snapdir = os.path.join(wh, t, "snapshots")
        assert len(os.listdir(snapdir)) == 1


def test_report_lang_zeroes_for_all_null_text_lang(spark, tmp_path, capsys):
    # regression: a lang whose docs ALL have NULL/empty text must get
    # 0 / 0.0 in report_lang, not NULLs (the drift-alarm partition)
    import report as job
    from pyspark.sql import Row
    docs = spark.createDataFrame(
        [Row(doc_id=0, text="real words here for quality", lang="en",
             source="a"),
         Row(doc_id=1, text=None, lang="xx", source="b"),
         Row(doc_id=2, text="", lang="xx", source="b")])
    path = str(tmp_path / "docs.parquet")
    docs.write.parquet(path)
    wh = str(tmp_path / "wh")
    assert job.main(["--docs", path, "--warehouse", wh,
                     "--snapshot-id", "rz"]) == 0
    capsys.readouterr()
    from ukrainian_ocr_pipeline_spark.sources.catalog import SnapshotCatalog
    lang = {r["lang"]: r for r in SnapshotCatalog(wh)
            .read_snapshot(spark, "report_lang", "rz").collect()}
    assert lang["xx"]["n_docs"] == 2
    assert lang["xx"]["n_tokens"] == 0
    assert lang["xx"]["distinct_tokens_exact"] == 0
    assert lang["xx"]["distinct_tokens_hll_r"] == 0.0
    assert lang["xx"]["rel_err_r"] == 0.0


def test_report_mixture_table_matches_operator(spark, tmp_path, capsys):
    """report_mixture must equal the standalone mixture_weights operator
    cell-for-cell at the job's flag values."""
    import report as job

    from ukrainian_ocr_pipeline_spark.operators import textstats

    wh = str(tmp_path / "wh")
    docs_path = f"{SF_DIR}/documents.parquet"
    rc = job.main(["--docs", docs_path, "--warehouse", wh,
                   "--snapshot-id", "rmix", "--mixture-alpha", "0.5",
                   "--budget-tokens", "1000000"])
    assert rc == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    from ukrainian_ocr_pipeline_spark.sources.catalog import SnapshotCatalog
    got = (SnapshotCatalog(wh).read_snapshot(spark, "report_mixture", "rmix")
           .orderBy("lang", "source").collect())
    want = (textstats.mixture_weights(spark.read.parquet(docs_path),
                                      alpha=0.5, budget_tokens=1000000)
            .orderBy("lang", "source").collect())
    assert [r.asDict() for r in got] == [r.asDict() for r in want]
    assert stats["mixture_domains"] == len(want) > 0


def test_report_mixture_flag_bounds_rejected(tmp_path):
    import pytest

    import report as job

    for bad in (["--mixture-alpha", "-1"], ["--mixture-alpha", "1.5"],
                ["--budget-tokens", "0"]):
        with pytest.raises(SystemExit):
            job.main(["--docs", f"{SF_DIR}/documents.parquet",
                      "--warehouse", str(tmp_path / "wh"),
                      "--snapshot-id", "rbad", *bad])


def test_report_shards_table_matches_operator(spark, tmp_path, capsys):
    """--shards N commits report_shards == packing.shard_manifest on the
    same corpus; re-run is an idempotent no-op; default runs commit no
    shard table; negative N rejected at parse time."""
    import pytest
    import report as job

    wh = str(tmp_path / "wh")
    docs_path = f"{SF_DIR}/documents.parquet"
    rc = job.main(["--docs", docs_path, "--warehouse", wh,
                   "--snapshot-id", "rs1", "--shards", "8"])
    assert rc == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["shards"] == 8

    from ukrainian_ocr_pipeline_spark.operators import packing
    from ukrainian_ocr_pipeline_spark.sources.catalog import SnapshotCatalog
    cat = SnapshotCatalog(wh)
    got = (cat.read_snapshot(spark, "report_shards", "rs1")
           .toPandas().sort_values("shard_id").reset_index(drop=True))
    want = (packing.shard_manifest(spark.read.parquet(docs_path), n_shards=8)
            .toPandas().sort_values("shard_id").reset_index(drop=True))
    assert got.equals(want)

    # idempotent re-run: identical stats, still one committed manifest
    rc = job.main(["--docs", docs_path, "--warehouse", wh,
                   "--snapshot-id", "rs1", "--shards", "8"])
    assert rc == 0
    stats2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats2 == stats

    # default run: no shard table, no shards key
    rc = job.main(["--docs", docs_path, "--warehouse", wh,
                   "--snapshot-id", "rs2"])
    assert rc == 0
    stats3 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "shards" not in stats3
    assert not cat.is_committed("report_shards", "rs2")

    with pytest.raises(SystemExit):
        job.main(["--docs", docs_path, "--warehouse", str(tmp_path / "w2"),
                  "--snapshot-id", "rs3", "--shards", "-1"])


def test_report_zipf_and_sources_tables_match_operators(
        spark, tmp_path, capsys):
    """--zipf / --source-gate commit report_zipf == term_zipf_slope and
    report_sources == source_quality_gate on the same corpus; default
    runs commit neither table nor stats keys."""
    import report as job

    wh = str(tmp_path / "wh")
    docs_path = f"{SF_DIR}/documents.parquet"
    rc = job.main(["--docs", docs_path, "--warehouse", wh,
                   "--snapshot-id", "rz1", "--zipf", "--source-gate"])
    assert rc == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["zipf_langs"] > 0
    assert stats["sources"] > 0
    assert 0 <= stats["sources_flagged"] <= stats["sources"]

    from ukrainian_ocr_pipeline_spark.operators import textstats
    from ukrainian_ocr_pipeline_spark.sources.catalog import SnapshotCatalog
    cat = SnapshotCatalog(wh)
    docs = spark.read.parquet(docs_path)
    got_z = (cat.read_snapshot(spark, "report_zipf", "rz1")
             .toPandas().sort_values("lang").reset_index(drop=True))
    want_z = (textstats.term_zipf_slope(docs)
              .toPandas().sort_values("lang").reset_index(drop=True))
    assert got_z.equals(want_z)
    got_s = (cat.read_snapshot(spark, "report_sources", "rz1")
             .toPandas().sort_values("source").reset_index(drop=True))
    want_s = (textstats.source_quality_gate(docs)
              .toPandas().sort_values("source").reset_index(drop=True))
    assert got_s.equals(want_s)

    rc = job.main(["--docs", docs_path, "--warehouse", wh,
                   "--snapshot-id", "rz2"])
    assert rc == 0
    stats2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "zipf_langs" not in stats2 and "sources" not in stats2
    assert not cat.is_committed("report_zipf", "rz2")
    assert not cat.is_committed("report_sources", "rz2")
