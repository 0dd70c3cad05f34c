"""Incremental / streaming extraction — Trigger.AvailableNow over a
growing pages dataset.

The reference is purely batch (SURVEY.md §2.9: no streaming surface), so
parity does not require this; it exists because the north rule's resume
semantics map naturally onto Structured Streaming's checkpointed source
offsets.  Production shape:

    spark.readStream.format("iceberg")
         .option("stream-from-timestamp", ...)  ->  extraction chain
         -> writeStream.trigger(availableNow=True)
         .option("checkpointLocation", ...).toTable("extracted")

Sandbox shape (no Iceberg jar): a file-source stream over the pages
parquet directory.  Each AvailableNow run processes exactly the files
not yet recorded in the checkpoint — run it again, nothing re-processes;
add files, only those process.  Exactly-once via checkpoint + the
idempotent file sink.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from ..functions.schemas import PAGES_SCHEMA
from ..operators.extract import extract_pages, extracted_table


def run_incremental_extraction(spark: SparkSession, pages_dir: str,
                               out_dir: str, checkpoint_dir: str,
                               with_matches: bool = True) -> int:
    """One AvailableNow increment: extract all not-yet-processed page
    files. Returns number of micro-batches executed. Blocks until done."""
    from ..sources.pages import validate_pages

    # recursiveFileLookup + validate_pages mirror the batch reader
    # (sources/pages.py): without the former, files nested under
    # catalog attempt-dirs are silently invisible to the stream (a
    # zero-row run that looks like 'no new data'); without the latter,
    # rows the batch path filters (NULL html, non-http urls) would leak
    # into the streaming output and break batch/stream parity
    stream = (spark.readStream
              .schema(PAGES_SCHEMA)
              .option("maxFilesPerTrigger", 8)
              .option("recursiveFileLookup", "true")
              .parquet(pages_dir))
    enriched = extract_pages(validate_pages(stream),
                             with_matches=with_matches, with_regions=False)
    # spans KEPT: the output schema must match the batch extracted
    # table (url, warc_ts, extracted_text, spans) — dropping it made
    # this twin silently lose all entity data vs jobs/stream.py
    out = extracted_table(enriched)
    n_batches = {"n": 0}

    def sink(batch_df, batch_id):
        # idempotent by batch_id: a batch replayed after a crash-before-
        # checkpoint-commit OVERWRITES its own subdir instead of appending
        # duplicate rows (blind append breaks the exactly-once claim)
        n_batches["n"] += 1
        batch_df.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"batch_id={batch_id}"))

    q = (out.writeStream
         .foreachBatch(sink)
         .option("checkpointLocation", checkpoint_dir)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    return n_batches["n"]
