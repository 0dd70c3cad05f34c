"""Custom stateful streaming operator — applyInPandasWithState.

The reference has no streaming surface (SURVEY §2.9); this is the
beyond-reference piece of the streaming story: a running per-host page
counter whose state lives in the Spark state store, so it accumulates
across micro-batches AND across job restarts (via the checkpoint) —
the pattern a production crawl-ingest monitor uses for per-host quota /
politeness accounting at 10^12-document scale (state is partitioned by
host, the natural key).

Kept deliberately minimal: one state tuple per host. Real extensions
(rate windows, TTL via GroupStateTimeout) hang off the same skeleton.
"""

from __future__ import annotations

import os

from typing import Iterator

import pandas as pd
from pyspark.sql import SparkSession, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..functions.schemas import PAGES_SCHEMA

OUTPUT_SCHEMA = "host string, n_pages bigint, n_bytes bigint"
STATE_SCHEMA = "n_pages bigint, n_bytes bigint"


def _update_host_state(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
    n_pages, n_bytes = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        n_pages += len(pdf)
        n_bytes += int(pdf["page_bytes"].sum())
    state.update((n_pages, n_bytes))
    yield pd.DataFrame({"host": [key[0]], "n_pages": [n_pages], "n_bytes": [n_bytes]})


def run_stateful_host_counts(spark: SparkSession, pages_dir: str,
                             out_dir: str, checkpoint_dir: str) -> None:
    """One AvailableNow increment of the running per-host counters.
    Each run emits the updated cumulative totals for hosts seen in the
    increment; totals carry over across runs through the checkpointed
    state store."""
    stream = (spark.readStream.schema(PAGES_SCHEMA)
              .option("maxFilesPerTrigger", 4)
              .parquet(pages_dir)
              .select(F.expr("parse_url(url, 'HOST')").alias("host"),
                      F.octet_length("html").alias("page_bytes")))
    counts = (stream.groupBy("host")
              .applyInPandasWithState(_update_host_state, OUTPUT_SCHEMA,
                                      STATE_SCHEMA, "update",
                                      GroupStateTimeout.NoTimeout))

    def sink(batch_df, batch_id):
        # per-batch overwrite subdir: a replayed batch rewrites itself
        # instead of appending duplicates (the batch_id partition column
        # is recovered on read from the directory name)
        batch_df.withColumn("batch_id", F.lit(batch_id)) \
            .write.mode("overwrite") \
            .parquet(os.path.join(out_dir, f"batch={batch_id}"))

    q = (counts.writeStream.foreachBatch(sink)
         .outputMode("update")
         .option("checkpointLocation", checkpoint_dir)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
