"""Sources for the `pages` input table.

Production: an Iceberg table bucket-partitioned by url hash
(`bucket(N, url)`) + `days(warc_ts)`, read with
spark.read.table("pages") — partition pruning and snapshot min-max file
skipping come free.  This sandbox has no Iceberg runtime jar, so the
tested path is plain Parquet with the same schema; the catalog module
provides snapshot/commit semantics on top (sources.catalog).

Analog of the reference's input surface: directory listing + extension
filter + sort (ukrainian_ocr/utils/io.py:74-107) and input validation
(core/batch_processor.py:164-193) become a scan plus declarative filters
that Catalyst pushes into the Parquet reader.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.schemas import PAGES_SCHEMA


def is_checkable_local_path(path: str) -> bool:
    """True when `path` is a plain local filesystem path a driver-side
    existence check may validate.  Scheme-qualified URIs (hdfs://,
    s3a://, and the single-slash form file:/x Hadoop also accepts) and
    glob patterns must be left to Spark — a local os.path check would
    wrongly reject them (they are valid inputs to spark.read)."""
    import re as _re
    if _re.match(r"[A-Za-z][A-Za-z0-9+.\-]*:", path):
        return False  # any URI scheme, with or without //
    return not any(ch in path for ch in "*?[{")


def _resolve_catalog_dir(path: str) -> str:
    """If `path` is a SnapshotCatalog staging root (.../<table>/data-<id>)
    with a COMMITTED manifest, return the manifest's data_dir — the
    winning attempt dir (full mode) or the staging root itself
    (bucketed mode).

    This keeps the catalog invariant "readers only ever follow the
    manifest" even when a user passes the staging root on the CLI
    (jobs/extract.py --pages wh/pages/data-crawl-001): a recursive
    listing of the staging root would also pick up any live concurrent
    attempt-<uuid> dir (duplicated rows) and trip over its
    attempt-*.writer.json sibling.  Non-catalog paths pass through."""
    import json
    import os
    base = os.path.basename(os.path.normpath(path))
    if not base.startswith("data-"):
        return path
    manifest = os.path.join(os.path.dirname(os.path.normpath(path)),
                            "snapshots", base[len("data-"):] + ".json")
    try:
        with open(manifest, encoding="utf-8") as fh:
            return json.load(fh)["data_dir"]
    except (OSError, ValueError, KeyError):
        return path


def read_pages(spark: SparkSession, path: str) -> DataFrame:
    """Read a pages parquet dataset with the canonical schema.

    recursiveFileLookup so a catalog snapshot data dir (which nests the
    files under an attempt-<uuid> commit dir, sources/catalog.py) can
    be passed directly — e.g. chaining jobs/ingest.py's committed
    `pages` table straight into jobs/extract.py.  Catalog staging roots
    are resolved through the committed manifest first
    (_resolve_catalog_dir), so readers never list uncommitted attempt
    dirs."""
    if is_checkable_local_path(path):
        path = _resolve_catalog_dir(path)
    return (spark.read.schema(PAGES_SCHEMA)
            .option("recursiveFileLookup", "true").parquet(path))


def validate_pages(df: DataFrame) -> DataFrame:
    """Input validation as pushed-down predicates (analog of
    validate_inputs, core/batch_processor.py:164-193): non-null key,
    sane url shape, payload present."""
    return df.filter(
        F.col("url").isNotNull()
        & F.col("url").rlike("^https?://")
        & F.col("html").isNotNull()
    )


def pages_from_fixtures(spark: SparkSession, n_rows: int, seed: int = 42,
                        partitions: int | None = None) -> DataFrame:
    """Generate the deterministic fixture table directly into Spark.

    Row content is a pure function of (i, seed), so generation is done
    DISTRIBUTED: parallelize the index range, build rows inside
    mapInPandas — no driver-side materialization of page bytes (matters
    at bench scale).
    """
    import pandas as pd

    from ..fixtures import page_row

    n_parts = partitions or spark.sparkContext.defaultParallelism

    def gen(iterator):
        for pdf in iterator:
            rows = [page_row(int(i), seed) for i in pdf["i"]]
            out = pd.DataFrame(rows)
            out["warc_ts"] = pd.to_datetime(out["warc_ts"], utc=True).dt.tz_localize(None)
            yield out

    idx = spark.range(0, n_rows, 1, n_parts).withColumnRenamed("id", "i")
    return idx.mapInPandas(gen, PAGES_SCHEMA)
