"""Golden end-to-end: the Spark job must match the committed
oracle-produced golden corpus byte-for-byte on extracted_text per url,
and exactly on spans/matches/regions/metrics (the north rule's
correctness gate). Also checks partitioning invariance — the same
answer regardless of how rows are distributed across tasks."""

import os

import pandas as pd
import pytest

from tests.conftest import GOLDEN_DIR


def _load_golden(name):
    return pd.read_parquet(os.path.join(GOLDEN_DIR, f"{name}.parquet"))


@pytest.fixture(scope="module")
def enriched(spark, t2_rows):
    from ukrainian_ocr_pipeline_spark.functions.schemas import PAGES_SCHEMA
    from ukrainian_ocr_pipeline_spark.operators.extract import extract_pages
    pdf = pd.DataFrame(t2_rows)
    pdf["warc_ts"] = pd.to_datetime(pdf["warc_ts"], utc=True).dt.tz_localize(None)
    pages = spark.createDataFrame(pdf, schema=PAGES_SCHEMA)
    return extract_pages(pages, salt_buckets=16).cache()


def test_extracted_text_byte_identical(enriched):
    got = (enriched.select("url", "extracted_text").orderBy("url").toPandas())
    want = _load_golden("extracted").sort_values("url").reset_index(drop=True)
    assert list(got.url) == list(want.url)
    neq = got.extracted_text.values != want.extracted_text.values
    assert neq.sum() == 0, f"{neq.sum()} urls differ, e.g. {got.url[neq.argmax()]}"
    # byte-for-byte, not just str equality
    for g, w in zip(got.extracted_text[:50], want.extracted_text[:50]):
        assert g.encode("utf-8") == w.encode("utf-8")


def test_spans_exact(spark, enriched):
    from pyspark.sql import functions as F
    got = (enriched.select("url", F.explode("spans").alias("s"))
           .select("url", "s.*")
           .orderBy("url", "start", "end", "label", "text").toPandas())
    want = (_load_golden("spans")
            .sort_values(["url", "start", "end", "label", "text"]).reset_index(drop=True))
    assert len(got) == len(want)
    pd.testing.assert_frame_equal(
        got[["url", "text", "label", "start", "end", "block_id"]],
        want[["url", "text", "label", "start", "end", "block_id"]],
        check_dtype=False)
    assert (got.confidence.values == want.confidence.values).all()


def test_matches_exact(spark, enriched):
    from pyspark.sql import functions as F
    got = (enriched.select("url", F.explode("matches").alias("m"))
           .select("url", "m.*")
           .orderBy("url", "word_idx", "found_text").toPandas())
    want = (_load_golden("matches")
            .sort_values(["url", "word_idx", "found_text"]).reset_index(drop=True))
    assert len(got) == len(want)
    pd.testing.assert_frame_equal(
        got[["url", "found_text", "matched_term", "word_idx", "context"]],
        want[["url", "found_text", "matched_term", "word_idx", "context"]],
        check_dtype=False)
    # fuzzy confidences are floats from difflib — must be bit-equal since
    # both sides run the identical pure function
    assert (got.confidence.values == want.confidence.values).all()


def test_regions_exact(spark, enriched):
    from pyspark.sql import functions as F
    got = (enriched.select("url", F.explode("regions").alias("r"))
           .select("url", "r.*").orderBy("url", "start").toPandas())
    want = _load_golden("regions").sort_values(["url", "start"]).reset_index(drop=True)
    assert len(got) == len(want)
    pd.testing.assert_frame_equal(
        got[["url", "start", "end", "n_entities"]],
        want[["url", "start", "end", "n_entities"]], check_dtype=False)


def test_metrics_match(spark, enriched):
    from ukrainian_ocr_pipeline_spark.operators.extract import metrics_table
    got = (metrics_table(enriched)
           .select("url", "success", "kind", "charset", "fallback_level",
                   "blocks_detected", "blocks_kept", "entities", "matches")
           .orderBy("url").toPandas())
    want = (_load_golden("metrics")
            .rename(columns={})
            .sort_values("url").reset_index(drop=True))
    for col in ["success", "kind", "charset", "fallback_level",
                "blocks_detected", "blocks_kept", "entities", "matches"]:
        assert (got[col].values == want[col].values).all(), col
    assert got.success.all()


def test_partitioning_invariance(spark, t2_rows, oracle_golden):
    """Same rows, pathological partitioning (2 and 64 partitions, reversed
    input order) -> identical extracted text. Guards the determinism
    invariant the north rule is really about."""
    from ukrainian_ocr_pipeline_spark.functions.schemas import PAGES_SCHEMA
    from ukrainian_ocr_pipeline_spark.operators.extract import extract_pages
    pdf = pd.DataFrame(list(reversed(t2_rows[:120])))
    pdf["warc_ts"] = pd.to_datetime(pdf["warc_ts"], utc=True).dt.tz_localize(None)
    want = (oracle_golden["extracted"][
        oracle_golden["extracted"].url.isin(pdf.url)]
        .sort_values("url").reset_index(drop=True))
    for nparts in (2, 64):
        pages = spark.createDataFrame(pdf, schema=PAGES_SCHEMA).repartition(nparts)
        got = (extract_pages(pages, with_matches=False, with_regions=False)
               .select("url", "extracted_text").orderBy("url").toPandas())
        assert (got.extracted_text.values == want.extracted_text.values).all(), nparts


def test_packed_mode_byte_identical(spark, t2_rows):
    """mode='packed' (single fused UDF) must equal the staged chain and
    the golden corpus byte-for-byte — same spec, different physical plan."""
    from ukrainian_ocr_pipeline_spark.functions.schemas import PAGES_SCHEMA
    from ukrainian_ocr_pipeline_spark.operators.extract import extract_pages, metrics_table
    from pyspark.sql import functions as F
    pdf = pd.DataFrame(t2_rows[:150])
    pdf["warc_ts"] = pd.to_datetime(pdf["warc_ts"], utc=True).dt.tz_localize(None)
    pages = spark.createDataFrame(pdf, schema=PAGES_SCHEMA)
    packed = extract_pages(pages, mode="packed")
    got = packed.select("url", "extracted_text").orderBy("url").toPandas()
    want = _load_golden("extracted")
    want = want[want.url.isin(got.url)].sort_values("url").reset_index(drop=True)
    assert (got.extracted_text.values == want.extracted_text.values).all()
    # spans too
    got_spans = (packed.select("url", F.explode("spans").alias("s")).select("url", "s.*")
                 .orderBy("url", "start", "end", "label", "text").toPandas())
    want_spans = _load_golden("spans")
    want_spans = (want_spans[want_spans.url.isin(got.url)]
                  .sort_values(["url", "start", "end", "label", "text"]).reset_index(drop=True))
    assert len(got_spans) == len(want_spans)
    assert (got_spans.text.values == want_spans.text.values).all()
    # metrics table works off packed mode
    m = metrics_table(packed).toPandas()
    assert m.success.all() and len(m) == 150


def test_lineage_covers_all_rows(spark, enriched):
    from ukrainian_ocr_pipeline_spark.operators.extract import lineage_table
    lin = lineage_table(enriched, snapshot_id=7).toPandas()
    assert lin.n_rows.sum() == 500
    assert lin.n_ok.sum() == 500 and lin.n_err.sum() == 0
    assert (lin.snapshot_id == 7).all()
    assert (lin.min_url <= lin.max_url).all()


def test_pipeline_stats(spark, enriched, oracle_golden):
    from ukrainian_ocr_pipeline_spark.operators.extract import metrics_table, pipeline_stats
    stats = pipeline_stats(metrics_table(enriched)).toPandas().iloc[0]
    m = oracle_golden["metrics"]
    assert stats.pages_processed == len(m)
    assert stats.total_entities == m.entities.sum()
    assert stats.total_blocks == m.blocks_detected.sum()


def test_arrow_mode_byte_identical(spark, t2_rows):
    """mode='arrow' (mapInArrow, flat child-array construction) must equal
    the golden corpus byte-for-byte — same spec, third physical plan.
    Promoted to the throughput default in round 3: interleaved A/B pairs
    read ~1.1x over packed at pinned 8 cores and ~2x at 32 (where the box
    is memory-bandwidth bound — exactly what skipping the pandas
    nested-struct conversion saves; bench_out/mode_ab_r3.json)."""
    from ukrainian_ocr_pipeline_spark.functions.schemas import PAGES_SCHEMA
    from ukrainian_ocr_pipeline_spark.operators.extract import extract_pages, metrics_table
    pdf = pd.DataFrame(t2_rows[:120])
    pdf["warc_ts"] = pd.to_datetime(pdf["warc_ts"], utc=True).dt.tz_localize(None)
    pages = spark.createDataFrame(pdf, schema=PAGES_SCHEMA)
    arrow = extract_pages(pages, mode="arrow")
    got = arrow.select("url", "extracted_text").orderBy("url").toPandas()
    want = _load_golden("extracted")
    want = want[want.url.isin(got.url)].sort_values("url").reset_index(drop=True)
    assert (got.extracted_text.values == want.extracted_text.values).all()
    m = metrics_table(arrow).toPandas()
    assert m.success.all() and len(m) == 120
    # non-payload input columns must pass through (same committed
    # snapshot schema as packed mode minus html/text — a silent `lang`
    # drop on the mode switch was a review finding)
    assert "lang" in arrow.columns and "html" not in arrow.columns
    lang_got = arrow.select("url", "lang").orderBy("url").toPandas()
    lang_want = pdf[["url", "lang"]].sort_values("url").reset_index(drop=True)
    assert (lang_got.lang.values == lang_want.lang.values).all()


def test_edge_pages_spark_matches_oracle_inline(spark):
    """Spark parity for the review-found edge cases (UTF-16 HTML,
    unterminated script, deep-nested boilerplate) — pages handcrafted
    here, oracle computed inline, so coverage doesn't depend on the
    fixture corpus happening to contain these shapes."""
    import datetime
    from ukrainian_ocr_pipeline_spark.functions.schemas import PAGES_SCHEMA
    from ukrainian_ocr_pipeline_spark.operators.extract import extract_pages
    from ukrainian_ocr_pipeline_spark.spec import LexiconMatcher, default_lexicon
    from ukrainian_ocr_pipeline_spark.spec.pipeline import extract_page

    body = "<html><body><p>" + "слово word " * 30 + "</p></body></html>"
    edge_htmls = {
        "https://e.example/utf16le": b"\xff\xfe" + body.encode("utf-16-le"),
        "https://e.example/utf16be": b"\xfe\xff" + body.encode("utf-16-be"),
        "https://e.example/unterminated-script":
            b"<html><body><script>var secret = 1; f();",
        "https://e.example/deep-nav":
            ("<html><body><nav><table><tr><td><p>" + "linky words " * 20
             + "</p></td></tr></table></nav><p>" + "real content " * 30
             + "</p></body></html>").encode(),
        "https://e.example/utf16-pdfish": b"\xff\xfe" + "%PDF-1.4 nope".encode("utf-16-le"),
    }
    ts = datetime.datetime(2025, 1, 1)
    rows = [(u, ts, h, None, "uk") for u, h in sorted(edge_htmls.items())]
    pages = spark.createDataFrame(rows, schema=PAGES_SCHEMA)

    matcher = LexiconMatcher(default_lexicon(), 0.8)
    want = {u: extract_page(u, h, matcher) for u, h in edge_htmls.items()}

    for mode in ("staged", "packed", "arrow"):
        got = (extract_pages(pages, mode=mode)
               .select("url", "extracted_text", "kind", "fallback_level",
                       "blocks_kept", "success").orderBy("url").toPandas())
        for r in got.itertuples():
            w = want[r.url]
            assert r.success and w.success, (mode, r.url)
            assert r.extracted_text == w.extracted_text, (mode, r.url)
            assert r.kind == w.kind, (mode, r.url)
            assert r.fallback_level == w.fallback_level, (mode, r.url)
            assert r.blocks_kept == w.blocks_kept, (mode, r.url)
