"""Streaming deduplication — dropDuplicatesWithinWatermark over a pages
stream.

The batch dedup family (operators/dedup.py) answers "which documents in
this corpus are duplicates"; a crawl INGEST pipeline needs the streaming
form: suppress re-crawled / mirrored documents as they arrive, with
bounded state.  Structured Streaming's dropDuplicatesWithinWatermark
keys state by the digest and expires it once the event-time watermark
passes, so state size is (arrival rate x watermark horizon), not the
corpus — the only shape that works at 10^12 documents.

Exact-hash keying matches operators/dedup.exact_duplicates; near-dup
streaming would key on a MinHash band bucket the same way.  No reference
twin (the reference is batch-only, SURVEY §2.9); verified by
tests/test_streaming_dedup.py: duplicates inside the watermark horizon
are suppressed, re-appearances after watermark expiry pass through (by
design — they re-enter as fresh state).

SEMANTICS CAVEAT (inherent to watermarking): the watermark horizon is
ALSO a late-arrival cutoff — a row whose event time lags the observed
stream maximum by more than the horizon is dropped as late, duplicate
or not.  Enable in-stream dedup only when `warc_ts` is near-monotonic
in arrival order (a live crawl); for backfills of old crawls, dedup in
batch instead (operators/dedup.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def dedup_stream(pages: DataFrame, watermark: str = "1 hour",
                 ts_col: str = "warc_ts") -> DataFrame:
    """pages stream -> stream with exact duplicates (same page digest)
    suppressed within the watermark horizon.

    Keyed on md5 of the raw `html` payload (the authoritative content —
    the crawl-side `text` column is untrusted and often NULL, and
    coalescing NULLs to one sentinel would collapse DISTINCT null-text
    pages into false duplicates).  Pages with NULL html fall back to a
    url-derived digest, which never collides across distinct urls.

    The digest column is kept in the output so downstream sinks can
    partition or join on it (e.g. the extracted table's lineage).
    """
    return (pages
            .withColumn("digest",
                        F.coalesce(F.md5(F.col("html")),
                                   F.concat(F.lit("url:"), F.col("url"))))
            .withWatermark(ts_col, watermark)
            .dropDuplicatesWithinWatermark(["digest"]))
