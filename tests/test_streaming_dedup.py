"""Streaming exact-dedup (dropDuplicatesWithinWatermark): duplicates
arriving within the watermark horizon are suppressed exactly; state
expires with the watermark so re-appearances far later pass through."""

import datetime

import pandas as pd

from ukrainian_ocr_pipeline_spark.streaming.dedup import dedup_stream

T0 = datetime.datetime(2026, 1, 1, 10, 0, 0)


def _write_pages(rows, path):
    import pyarrow as pa
    import pyarrow.parquet as pq
    df = pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text", "lang"])
    df["warc_ts"] = pd.to_datetime(df["warc_ts"])
    schema = pa.schema([("url", pa.string()), ("warc_ts", pa.timestamp("us")),
                        ("html", pa.binary()), ("text", pa.string()),
                        ("lang", pa.string())])
    pq.write_table(pa.Table.from_pandas(df, schema=schema,
                                        preserve_index=False), path)


def _row(url, minutes, text):
    # html is the dedup identity (the text column is untrusted/raw)
    html = f"<p>{text}</p>".encode()
    return (url, T0 + datetime.timedelta(minutes=minutes), html, text, "en")


def _run(spark, pages_dir, out_dir, ckpt):
    from ukrainian_ocr_pipeline_spark.functions.schemas import PAGES_SCHEMA
    stream = (spark.readStream.schema(PAGES_SCHEMA)
              .option("maxFilesPerTrigger", 1).parquet(str(pages_dir)))
    deduped = dedup_stream(stream, watermark="10 minutes")
    q = (deduped.select("url", "warc_ts", "digest")
         .writeStream.format("parquet")
         .option("path", out_dir)
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()


def test_streaming_dedup_suppresses_within_watermark(spark, tmp_path):
    pages_dir = tmp_path / "pages"
    pages_dir.mkdir()
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    # batch 1: original + an in-horizon recrawl (same text, different url)
    _write_pages([_row("u1", 0, "alpha body"),
                  _row("u2-mirror", 1, "alpha body"),
                  _row("u3", 2, "beta body")],
                 str(pages_dir / "f0.parquet"))
    _run(spark, pages_dir, out_dir, ckpt)
    got = spark.read.parquet(out_dir).toPandas()
    assert len(got) == 2  # mirror suppressed
    assert set(got.digest.value_counts().values) == {1}

    # batch 2: another duplicate still within the horizon -> suppressed;
    # a fresh document passes
    _write_pages([_row("u4-mirror", 3, "alpha body"),
                  _row("u5", 4, "gamma body")],
                 str(pages_dir / "f1.parquet"))
    _run(spark, pages_dir, out_dir, ckpt)
    got = spark.read.parquet(out_dir).toPandas()
    assert len(got) == 3
    assert "u4-mirror" not in set(got.url)

    # batch 3: a fresh document far in the future advances the watermark
    # past the alpha digest's state horizon (watermark only moves AFTER a
    # batch completes, so the expiry is visible to the NEXT batch)
    _write_pages([_row("u6", 120, "delta body")],
                 str(pages_dir / "f2.parquet"))
    _run(spark, pages_dir, out_dir, ckpt)

    # batch 4: with the alpha state expired, the same text re-enters as
    # fresh (bounded-state design: state is rate x horizon, not corpus)
    _write_pages([_row("u7-latecrawl", 125, "alpha body")],
                 str(pages_dir / "f3.parquet"))
    _run(spark, pages_dir, out_dir, ckpt)
    got = spark.read.parquet(out_dir).toPandas()
    assert "u7-latecrawl" in set(got.url)
    assert len(got) == 5


def test_null_text_pages_are_not_false_duplicates(spark, tmp_path):
    """Review regression: distinct pages with NULL text (the common
    crawl case — html is the payload) must all survive; only true
    same-html duplicates drop.  NULL-html pages fall back to a
    url-keyed digest and never collide."""
    pages_dir = tmp_path / "pages"
    pages_dir.mkdir()
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    rows = [
        ("n1", T0, b"<p>one</p>", None, "en"),
        ("n2", T0 + datetime.timedelta(minutes=1), b"<p>two</p>", None, "en"),
        ("n3", T0 + datetime.timedelta(minutes=2), b"<p>three</p>", None, "en"),
        # a true duplicate of n1's html, text also null -> must drop
        ("n4-dup", T0 + datetime.timedelta(minutes=3), b"<p>one</p>", None, "en"),
        # two null-HTML pages: url-keyed fallback, both survive
        ("h1", T0 + datetime.timedelta(minutes=4), None, None, "en"),
        ("h2", T0 + datetime.timedelta(minutes=5), None, None, "en"),
    ]
    _write_pages(rows, str(pages_dir / "f0.parquet"))
    _run(spark, pages_dir, out_dir, ckpt)
    got = spark.read.parquet(out_dir).toPandas()
    assert set(got.url) == {"n1", "n2", "n3", "h1", "h2"}
