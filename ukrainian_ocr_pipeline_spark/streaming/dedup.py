"""Streaming deduplication — dropDuplicatesWithinWatermark over a pages
stream.

The batch dedup family (operators/dedup.py) answers "which documents in
this corpus are duplicates"; a crawl INGEST pipeline needs the streaming
form: suppress re-crawled / mirrored documents as they arrive, with
bounded state.  Structured Streaming's dropDuplicatesWithinWatermark
keys state by the digest and expires it once the event-time watermark
passes, so state size is (arrival rate x watermark horizon), not the
corpus — the only shape that works at 10^12 documents.

Exact-hash keying matches operators/dedup.exact_duplicates (md5 of the
raw text); near-dup streaming would key on a MinHash band bucket the
same way.  No reference twin (the reference is batch-only, SURVEY §2.9);
verified by tests/test_streaming_dedup.py: duplicates inside the
watermark horizon are suppressed, re-appearances after watermark expiry
pass through (by design — they re-enter as fresh state).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def dedup_stream(pages: DataFrame, watermark: str = "1 hour",
                 text_col: str = "text",
                 ts_col: str = "warc_ts") -> DataFrame:
    """pages stream -> stream with exact duplicates (same text digest)
    suppressed within the watermark horizon.

    The digest column is kept in the output so downstream sinks can
    partition or join on it (e.g. the extracted table's lineage).
    """
    return (pages
            .withColumn("digest", F.md5(F.coalesce(F.col(text_col), F.lit(""))))
            .withWatermark(ts_col, watermark)
            .dropDuplicatesWithinWatermark(["digest"]))
