"""Watermarked event-time windows: finalized windows emit exactly once,
late events inside the watermark update not-yet-final windows, and
too-late events are dropped without corrupting emitted windows."""

import pandas as pd

from ukrainian_ocr_pipeline_spark.streaming.windowed import run_windowed_counts


def _write_events(rows, path):
    import pyarrow as pa
    import pyarrow.parquet as pq
    df = pd.DataFrame(rows, columns=["ts", "category"])
    df["ts"] = pd.to_datetime(df["ts"])
    schema = pa.schema([("ts", pa.timestamp("us")), ("category", pa.string())])
    pq.write_table(pa.Table.from_pandas(df, schema=schema, preserve_index=False), path)


def _read(spark, out_dir):
    return (spark.read.parquet(out_dir)
            .orderBy("window_start", "category")
            .toPandas())


def test_watermark_window_lifecycle(spark, tmp_path):
    events_dir = tmp_path / "events"
    events_dir.mkdir()
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    # run 1: events in the 10:00 window only — watermark (max-5min = 10:04)
    # has not passed the window end, so NOTHING finalizes yet
    _write_events([("2026-01-01 10:00:30", "a"),
                   ("2026-01-01 10:03:00", "a"),
                   ("2026-01-01 10:09:00", "b")],
                  str(events_dir / "f0.parquet"))
    run_windowed_counts(spark, str(events_dir), out_dir, ckpt)
    try:
        n0 = len(_read(spark, out_dir))
    except Exception:
        n0 = 0  # sink dir may not exist before first commit
    assert n0 == 0

    # run 2: a 10:30 event advances the watermark to 10:25 — the 10:00
    # window finalizes and emits exactly once
    _write_events([("2026-01-01 10:30:00", "a")],
                  str(events_dir / "f1.parquet"))
    run_windowed_counts(spark, str(events_dir), out_dir, ckpt)
    got = _read(spark, out_dir)
    assert [(str(r.window_start), r.category, r.n_events)
            for r in got.itertuples()] == [
        ("2026-01-01 10:00:00", "a", 2),
        ("2026-01-01 10:00:00", "b", 1),
    ]

    # run 3: a too-late event for the already-finalized 10:00 window is
    # DROPPED (watermark 10:25 > window end 10:10); an on-time 10:31
    # event updates the still-open 10:30 window (not emitted yet)
    _write_events([("2026-01-01 10:02:00", "a"),      # too late: dropped
                   ("2026-01-01 10:31:00", "b")],
                  str(events_dir / "f2.parquet"))
    run_windowed_counts(spark, str(events_dir), out_dir, ckpt)
    got = _read(spark, out_dir)
    # emitted set unchanged — no duplicate, no corrupted recount
    assert len(got) == 2 and got.n_events.tolist() == [2, 1]

    # run 4: advance watermark past 10:40 — the 10:30 window finalizes
    # with both its events (10:30 a from run 2, 10:31 b from run 3) and
    # WITHOUT the dropped too-late event
    _write_events([("2026-01-01 11:00:00", "c")],
                  str(events_dir / "f3.parquet"))
    run_windowed_counts(spark, str(events_dir), out_dir, ckpt)
    got = _read(spark, out_dir)
    assert [(str(r.window_start), r.category, r.n_events)
            for r in got.itertuples()] == [
        ("2026-01-01 10:00:00", "a", 2),
        ("2026-01-01 10:00:00", "b", 1),
        ("2026-01-01 10:30:00", "a", 1),
        ("2026-01-01 10:30:00", "b", 1),
    ]
