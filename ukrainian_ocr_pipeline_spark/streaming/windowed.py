"""Watermarked event-time windowed aggregation (late-data handling).

The reference has no streaming surface (SURVEY.md §2.9); this is part of
the beyond-reference training-data-pipeline tier: tumbling event-time
windows with a watermark bounding state and dropping too-late events —
the canonical Structured Streaming shape for rollups over a live crawl
feed (pages/sec per host, entities/min, ...).

Semantics (all built-in, no custom state):
  * `withWatermark(ts, W)` bounds aggregation state: a window finalizes
    once the watermark (max event time seen minus W) passes its end.
  * Append output mode emits each window exactly once, on finalization —
    an idempotent, exactly-once parquet sink with no MERGE needed.
  * Events older than the watermark are dropped, never corrupting
    already-emitted windows.

The checkpoint persists source offsets AND the watermark across runs, so
repeated Trigger.AvailableNow invocations over a growing directory form
an incremental, resumable rollup — same contract as the batch snapshot
catalog, provided by the engine runtime instead of our manifest code.
"""

from __future__ import annotations

from pyspark.sql import SparkSession, functions as F
from pyspark.sql import types as T

EVENTS_STREAM_SCHEMA = T.StructType([
    T.StructField("ts", T.TimestampType(), True),
    T.StructField("category", T.StringType(), True),
])


def run_windowed_counts(spark: SparkSession, events_dir: str, out_dir: str,
                        checkpoint_dir: str, window: str = "10 minutes",
                        watermark: str = "5 minutes") -> None:
    """One AvailableNow increment of the windowed rollup. Blocks until done.

    Emits (window_start, window_end, category, n_events) rows to parquet,
    each finalized window exactly once across all invocations.
    """
    stream = (spark.readStream
              .schema(EVENTS_STREAM_SCHEMA)
              .option("maxFilesPerTrigger", 1)
              .parquet(events_dir))
    agg = (stream
           .withWatermark("ts", watermark)
           .groupBy(F.window("ts", window).alias("w"), "category")
           .agg(F.count("*").alias("n_events"))
           .select(F.col("w.start").alias("window_start"),
                   F.col("w.end").alias("window_end"),
                   "category", "n_events"))
    q = (agg.writeStream
         .outputMode("append")
         .format("parquet")
         .option("path", out_dir)
         .option("checkpointLocation", checkpoint_dir)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
