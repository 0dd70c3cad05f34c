"""applyInPandasWithState: per-host counters accumulate across
micro-batches within a run and across restarts via the checkpoint."""

import pandas as pd
import pytest

from ukrainian_ocr_pipeline_spark.streaming.stateful import run_stateful_host_counts
from tests.test_streaming_incremental import _write_pages


def _latest_counts(spark, out_dir):
    df = spark.read.parquet(out_dir).toPandas()
    # last emitted total per host = row with max batch_id then max n_pages
    df = df.sort_values(["host", "batch_id", "n_pages"])
    return df.groupby("host").tail(1).set_index("host")


def test_state_accumulates_across_runs(spark, t2_rows, tmp_path):
    pages_dir = tmp_path / "pages"
    out_dir = str(tmp_path / "counts")
    ckpt = str(tmp_path / "ckpt")
    pages_dir.mkdir()

    first, second = t2_rows[:60], t2_rows[60:120]
    _write_pages(first, str(pages_dir / "a.parquet"))
    run_stateful_host_counts(spark, str(pages_dir), out_dir, ckpt)
    got1 = _latest_counts(spark, out_dir)

    exp1 = pd.Series([r["url"].split("/")[2] for r in first]).value_counts()
    for host, n in exp1.items():
        assert got1.loc[host, "n_pages"] == n, host

    # second increment: totals must CARRY OVER through checkpointed state
    _write_pages(second, str(pages_dir / "b.parquet"))
    run_stateful_host_counts(spark, str(pages_dir), out_dir, ckpt)
    got2 = _latest_counts(spark, out_dir)

    exp2 = pd.Series([r["url"].split("/")[2] for r in first + second]).value_counts()
    for host, n in exp2.items():
        assert got2.loc[host, "n_pages"] == n, host
    # byte totals are cumulative and positive
    assert (got2.n_bytes > 0).all()
    assert got2.n_pages.sum() == 120
