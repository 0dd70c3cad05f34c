"""Iceberg seam — the production table layer, behind the same contract
as the SnapshotCatalog fallback.

The north rule's storage design is Iceberg: url-hash bucket partition
spec, atomic snapshot commits, WAP (write-audit-publish) branch flow,
`MERGE INTO ... ON url` idempotent upserts, snapshot/timestamp
incremental reads, `expire_snapshots` maintenance.  This sandbox has no
Iceberg runtime jar (verified at import time, below), so the tested path
is sources/catalog.SnapshotCatalog, which reproduces the commit + resume
contract on plain parquet.  This module pins down exactly what flips
over when the jar is present, so the swap is configuration, not code.

Production session config (spark-submit --packages org.apache.iceberg:
iceberg-spark-runtime-...):

    spark.sql.catalog.wh                  org.apache.iceberg.spark.SparkCatalog
    spark.sql.catalog.wh.type             hadoop   (or hive/rest)
    spark.sql.catalog.wh.warehouse        s3://bucket/warehouse
"""

from __future__ import annotations

import re
from datetime import datetime

from pyspark.sql import DataFrame, SparkSession

# dotted table/view identifiers only — interpolated into SQL text below,
# so anything else (quotes, parens, semicolons) must be rejected first
_IDENT_RE = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*(\.[A-Za-z_][A-Za-z0-9_]*)*$")


def _check_ident(name: str) -> str:
    if not _IDENT_RE.match(name or ""):
        raise ValueError(f"invalid SQL identifier: {name!r}")
    return name


def _check_ts(ts: str) -> str:
    """older_than timestamps are interpolated into a TIMESTAMP literal —
    parse first so a malformed value fails here, not inside SQL."""
    for fmt in ("%Y-%m-%d %H:%M:%S", "%Y-%m-%d %H:%M:%S.%f", "%Y-%m-%d"):
        try:
            datetime.strptime(ts, fmt)
            return ts
        except (ValueError, TypeError):
            continue
    raise ValueError(f"invalid timestamp literal: {ts!r}")


def iceberg_available(spark: SparkSession) -> bool:
    """True when an Iceberg SparkCatalog can actually be instantiated."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


def create_pages_table(spark: SparkSession, table: str = "wh.db.pages",
                       url_buckets: int = 1024) -> None:
    """The north-rule partition spec: url-hash buckets spread megapage
    hosts, days(warc_ts) gives crawl-time pruning."""
    _require(spark)
    _check_ident(table)
    url_buckets = int(url_buckets)
    spark.sql(f"""
        CREATE TABLE IF NOT EXISTS {table} (
            url string, warc_ts timestamp, html binary, text string, lang string)
        USING iceberg
        PARTITIONED BY (bucket({url_buckets}, url), days(warc_ts))
    """)


def append_snapshot(df: DataFrame, table: str) -> None:
    """Atomic append — one Iceberg snapshot per job commit."""
    _require(df.sparkSession)
    df.writeTo(table).append()


def merge_extracted(spark: SparkSession, source_view: str,
                    table: str = "wh.db.extracted") -> None:
    """Idempotent re-run semantics: MERGE ON url replaces rows a retried
    job re-produces — the Iceberg twin of SnapshotCatalog's
    re-run-is-a-no-op manifest check."""
    _require(spark)
    _check_ident(table)
    _check_ident(source_view)
    spark.sql(f"""
        MERGE INTO {table} t USING {source_view} s ON t.url = s.url
        WHEN MATCHED THEN UPDATE SET *
        WHEN NOT MATCHED THEN INSERT *
    """)


def read_incremental(spark: SparkSession, table: str,
                     from_snapshot_id: int) -> DataFrame:
    """Rows appended after a snapshot — the resume read path
    (SnapshotCatalog twin: manifests newer than the recorded parent)."""
    _require(spark)
    return (spark.read.format("iceberg")
            .option("start-snapshot-id", str(from_snapshot_id))
            .load(table))


def expire_snapshots(spark: SparkSession, table: str,
                     older_than_ts: str) -> None:
    """Maintenance twin of the reference's temp cleanup
    (ukrainian_ocr/utils/io.py:274-309) at table scale.  The procedure
    lives in the table's own catalog (first identifier component)."""
    _require(spark)
    _check_ident(table)
    _check_ts(older_than_ts)
    catalog = table.split(".", 1)[0]
    spark.sql(f"CALL {catalog}.system.expire_snapshots(table => '{table}', "
              f"older_than => TIMESTAMP '{older_than_ts}')")


def _require(spark: SparkSession) -> None:
    if not iceberg_available(spark):
        raise RuntimeError(
            "Iceberg runtime jar not on the classpath — use "
            "sources.catalog.SnapshotCatalog (same commit/resume contract) "
            "or launch with --packages org.apache.iceberg:iceberg-spark-runtime")
