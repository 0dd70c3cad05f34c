"""Custom stateful streaming operator — applyInPandasWithState.

The reference has no streaming surface (SURVEY §2.9); this is the
beyond-reference piece of the streaming story: a running per-host page
counter whose state lives in the Spark state store, so it accumulates
across micro-batches AND across job restarts (via the checkpoint) —
the pattern a production crawl-ingest monitor uses for per-host quota /
politeness accounting at 10^12-document scale (state is partitioned by
host, the natural key).

Kept deliberately minimal: one state tuple per host.  Scale honesty:
NoTimeout means state cardinality equals DISTINCT HOSTS EVER SEEN and
never shrinks — correct for the cumulative-totals contract this
implements, but an open-web deployment whose quota logic only needs
RECENT activity should add eviction (EventTimeTimeout + a watermark on
warc_ts, expiring hosts idle past the horizon) off this same skeleton,
or checkpoint state grows monotonically with one-off spam/typo
domains.
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
    # try_parse_url, NOT parse_url: under the default ANSI session one
    # malformed URL would fail the micro-batch, and because the failed
    # batch's offsets are already in the checkpoint WAL every restart
    # replays the same files and crashes again — a poison pill that
    # stops per-host accounting until the checkpoint is deleted.
    # Hostless garbage rows are dropped (no host to account against).
    stream = (spark.readStream.schema(PAGES_SCHEMA)
              .option("maxFilesPerTrigger", 4)
              .parquet(pages_dir)
              .select(F.expr("try_parse_url(url, 'HOST')").alias("host"),
                      F.octet_length("html").alias("page_bytes"))
              .where(F.col("host").isNotNull()))
    counts = (stream.groupBy("host")
              .applyInPandasWithState(_update_host_state, OUTPUT_SCHEMA,
                                      STATE_SCHEMA, "update",
                                      GroupStateTimeout.NoTimeout))

    def sink(batch_df, batch_id):
        # per-batch overwrite subdir: a replayed batch rewrites itself
        # instead of appending duplicates.  The subdir name matches
        # jobs/stream.py's batch_id=<id> layout (uniform streaming
        # outputs); batch_id is partition-DISCOVERED on a read of the
        # root — no physical column, which would collide with the
        # directory key and break that read
        batch_df.write.mode("overwrite") \
            .parquet(os.path.join(out_dir, f"batch_id={batch_id}"))

    q = (counts.writeStream.foreachBatch(sink)
         .outputMode("update")
         .option("checkpointLocation", checkpoint_dir)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
