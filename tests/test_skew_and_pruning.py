"""Explicit skew handling + partition pruning — the north rule's
'partitioning / shuffle / skew handled explicitly' clause, asserted."""

import pandas as pd
import pytest
from pyspark.sql import functions as F


def test_salted_repartition_balances_megahost(spark):
    """A host-sorted input (all megahost rows adjacent — the worst-case
    crawl layout) must spread near-uniformly after the salted
    repartition that extract_pages applies before its heavy UDF."""
    from ukrainian_ocr_pipeline_spark.functions.schemas import PAGES_SCHEMA
    from ukrainian_ocr_pipeline_spark.fixtures import gen_pages
    rows = sorted(gen_pages(400), key=lambda r: r["url"])  # groups megahost together
    pdf = pd.DataFrame(rows)
    pdf["warc_ts"] = pd.to_datetime(pdf["warc_ts"], utc=True).dt.tz_localize(None)
    pages = spark.createDataFrame(pdf, schema=PAGES_SCHEMA).coalesce(2)

    n_parts = 8
    salted = pages.repartition(n_parts, F.xxhash64("url"))
    per_part = (salted
                .select(F.spark_partition_id().alias("pid"),
                        F.length("html").alias("b"),
                        F.col("url").contains("megahost").alias("is_mega"))
                .groupBy("pid")
                .agg(F.count("*").alias("n"), F.sum("b").alias("bytes"),
                     F.sum(F.col("is_mega").cast("int")).alias("megas"))
                .toPandas())
    assert len(per_part) == n_parts
    # megahost rows (30% of corpus) spread across ALL partitions
    assert (per_part.megas > 0).all(), per_part
    # row-count balance: no partition holds more than 2x the mean
    assert per_part.n.max() <= 2 * per_part.n.mean(), per_part


def test_catalog_bucket_layout_prunes_partitions(spark, t2_rows, tmp_path):
    """The bucketed snapshot layout (bucket=K directories) must give
    partition pruning on bucket-targeted reads — the Iceberg
    bucket(url)-spec analog, visible as PartitionFilters in the scan."""
    import contextlib, io
    from ukrainian_ocr_pipeline_spark.functions.schemas import PAGES_SCHEMA
    from ukrainian_ocr_pipeline_spark.sources.catalog import SnapshotCatalog
    pdf = pd.DataFrame(t2_rows[:60])
    pdf["warc_ts"] = pd.to_datetime(pdf["warc_ts"], utc=True).dt.tz_localize(None)
    pages = spark.createDataFrame(pdf, schema=PAGES_SCHEMA)
    cat = SnapshotCatalog(str(tmp_path / "wh"))
    cat.write_snapshot_bucketed(pages, "t", "s1", n_buckets=4,
                                transform=lambda df: df.select("url", "lang"))
    m = cat.latest_snapshot("t")
    df = (spark.read.option("basePath", m["data_dir"]).parquet(m["data_dir"])
          .where(F.col("bucket") == 2))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan
    pf_line = [line for line in plan.splitlines() if "PartitionFilters" in line][0]
    assert "bucket" in pf_line, pf_line
    # and the pruned read returns exactly that bucket's rows
    got = df.toPandas()
    assert 0 < len(got) < 60
