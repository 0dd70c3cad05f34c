"""AvailableNow incremental extraction: second run is a no-op, new files
are picked up exactly once, output matches the oracle byte-for-byte."""

import os

import pandas as pd
import pytest

from ukrainian_ocr_pipeline_spark.streaming.incremental import run_incremental_extraction


def _write_pages(rows, path):
    import pyarrow as pa
    import pyarrow.parquet as pq
    df = pd.DataFrame(rows)
    df["warc_ts"] = pd.to_datetime(df["warc_ts"], utc=True).dt.tz_localize(None)
    schema = pa.schema([("url", pa.string()), ("warc_ts", pa.timestamp("us")),
                        ("html", pa.binary()), ("text", pa.string()), ("lang", pa.string())])
    pq.write_table(pa.Table.from_pandas(df, schema=schema, preserve_index=False), path)


def test_incremental_exactly_once(spark, t2_rows, oracle_golden, tmp_path):
    pages_dir = tmp_path / "pages"
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    pages_dir.mkdir()

    _write_pages(t2_rows[:60], str(pages_dir / "part-0.parquet"))
    n1 = run_incremental_extraction(spark, str(pages_dir), out_dir, ckpt,
                                    with_matches=False)
    assert n1 >= 1
    got1 = spark.read.parquet(out_dir).toPandas()
    assert len(got1) == 60 and got1.url.is_unique

    # re-run with no new files: nothing re-processes
    run_incremental_extraction(spark, str(pages_dir), out_dir, ckpt,
                               with_matches=False)
    assert spark.read.parquet(out_dir).count() == 60

    # add a file: only the new rows process, exactly once
    _write_pages(t2_rows[60:90], str(pages_dir / "part-1.parquet"))
    run_incremental_extraction(spark, str(pages_dir), out_dir, ckpt,
                               with_matches=False)
    got = spark.read.parquet(out_dir).orderBy("url").toPandas()
    assert len(got) == 90 and got.url.is_unique

    # byte-identical to the oracle
    want = (oracle_golden["extracted"][oracle_golden["extracted"].url.isin(got.url)]
            .sort_values("url").reset_index(drop=True))
    assert (got.extracted_text.values == want.extracted_text.values).all()
