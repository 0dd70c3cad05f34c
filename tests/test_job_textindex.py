"""End-to-end tests of the text-index build job (jobs/textindex.py):
committed-table parity with the stateless BM25, idempotent re-runs,
corpus-mismatch rejection, and the predicate-pushdown property that is
the index's whole reason to exist."""

import json
import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "jobs"))

SF_DIR = "/root/testdata/sf0.001"
TERMS = ("spark", "merge", "vector")


def _tables(spark, wh, sid):
    from ukrainian_ocr_pipeline_spark.sources.catalog import SnapshotCatalog
    cat = SnapshotCatalog(wh)
    return tuple(cat.read_snapshot(spark, t, sid) for t in
                 ("text_postings", "doc_lengths", "text_terms",
                  "text_stats"))


def test_textindex_job_build_and_join_only_query_parity(spark, tmp_path,
                                                        capsys):
    import textindex as job

    from ukrainian_ocr_pipeline_spark.operators import textindex as tix

    docs_path = f"{SF_DIR}/documents.parquet"
    wh = str(tmp_path / "wh")
    rc = job.main(["--docs", docs_path, "--warehouse", wh,
                   "--snapshot-id", "t1"])
    assert rc == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["n_docs"] == 500
    assert stats["doc_lengths"] == 500
    assert stats["text_terms"] <= stats["text_postings"]

    postings, doclens, terms, cstats = _tables(spark, wh, "t1")
    # committed terms table == a fresh rollup of the committed postings
    want_terms = tix.term_stats_table(postings)
    assert sorted(map(tuple, terms.collect())) == \
        sorted(map(tuple, want_terms.collect()))

    # join-only BM25 over the index == stateless BM25 over the corpus
    docs = spark.read.parquet(docs_path)
    got = tix.bm25_topk_from_index(postings, doclens, terms, cstats,
                                   TERMS, k=10).collect()
    want = tix.bm25_topk(docs, TERMS, k=10).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    # and for a second, single-term query (different df path)
    got1 = tix.bm25_topk_from_index(postings, doclens, terms, cstats,
                                    ("customer",), k=5).collect()
    want1 = tix.bm25_topk(docs, ("customer",), k=5).collect()
    assert [tuple(r) for r in got1] == [tuple(r) for r in want1]

    # idempotent re-run: identical stats, one manifest per table
    rc = job.main(["--docs", docs_path, "--warehouse", wh,
                   "--snapshot-id", "t1"])
    assert rc == 0
    stats2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats2 == stats
    for t in ("text_stats", "text_postings", "doc_lengths", "text_terms"):
        snaps = os.listdir(os.path.join(wh, t, "snapshots"))
        assert len(snaps) == 1, (t, snaps)


def test_textindex_job_rejects_different_corpus_same_id(spark, tmp_path,
                                                        capsys):
    import textindex as job

    wh = str(tmp_path / "wh")
    rc = job.main(["--docs", f"{SF_DIR}/documents.parquet",
                   "--warehouse", wh, "--snapshot-id", "t2"])
    assert rc == 0
    capsys.readouterr()
    # different corpus (another sf) under the SAME snapshot id -> rc 2
    rc = job.main(["--docs", "/root/testdata/sf0.01/documents.parquet",
                   "--warehouse", wh, "--snapshot-id", "t2"])
    assert rc == 2
    err = capsys.readouterr().err
    assert "corpus differs" in err


def test_textindex_query_term_filter_reaches_postings_scan(spark,
                                                           tmp_path,
                                                           capsys):
    """THE index property: the query's IN filter must be pushed into
    the committed postings parquet scan, so query cost ~ posting lists,
    never a corpus re-scan."""
    import textindex as job

    from ukrainian_ocr_pipeline_spark.operators import textindex as tix

    wh = str(tmp_path / "wh")
    rc = job.main(["--docs", f"{SF_DIR}/documents.parquet",
                   "--warehouse", wh, "--snapshot-id", "t3"])
    assert rc == 0
    capsys.readouterr()
    postings, doclens, terms, cstats = _tables(spark, wh, "t3")
    df = tix.bm25_topk_from_index(postings, doclens, terms, cstats,
                                  TERMS, k=10)
    import contextlib
    import io
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain()
    plan = buf.getvalue()
    assert "PushedFilters" in plan
    assert "In(term, [merge,spark,vector])" in plan, plan
    assert "EvalPython" not in plan, plan


def test_textindex_job_rejects_reshuffled_ids_same_totals(spark, tmp_path,
                                                          capsys):
    """Aggregate totals alone can't catch a resume against a corpus
    with identical (n_docs, sum_dl) but reassigned doc_ids — the
    corpus_fp fingerprint must."""
    import textindex as job

    a = str(tmp_path / "a.parquet")
    b = str(tmp_path / "b.parquet")
    spark.createDataFrame([(1, "w1 w2 w3"), (2, "v1 v2 v3 v4 v5")],
                          "doc_id long, text string").write.parquet(a)
    # same doc count, same total tokens — ids swapped across lengths
    spark.createDataFrame([(2, "w1 w2 w3"), (1, "v1 v2 v3 v4 v5")],
                          "doc_id long, text string").write.parquet(b)
    wh = str(tmp_path / "wh")
    assert job.main(["--docs", a, "--warehouse", wh,
                     "--snapshot-id", "t4"]) == 0
    capsys.readouterr()
    assert job.main(["--docs", b, "--warehouse", wh,
                     "--snapshot-id", "t4"]) == 2
    assert "corpus differs" in capsys.readouterr().err


def test_textindex_job_rejects_substituted_words_same_shape(spark, tmp_path,
                                                            capsys):
    """Shape alone — identical (doc_id, dl) pairs — can't catch a
    resume against a corpus whose words were substituted 1:1 (an OCR
    re-run, a different extraction); the content term in corpus_fp
    must.  Serving corpus-A postings for corpus B would be silent
    index staleness."""
    import textindex as job

    a = str(tmp_path / "a.parquet")
    b = str(tmp_path / "b.parquet")
    spark.createDataFrame([(1, "kyiv dnipro odesa"), (2, "lviv kharkiv")],
                          "doc_id long, text string").write.parquet(a)
    # same doc_ids, same per-doc token counts — every word different
    spark.createDataFrame([(1, "red green blue"), (2, "black white")],
                          "doc_id long, text string").write.parquet(b)
    wh = str(tmp_path / "wh")
    assert job.main(["--docs", a, "--warehouse", wh,
                     "--snapshot-id", "t5"]) == 0
    capsys.readouterr()
    assert job.main(["--docs", b, "--warehouse", wh,
                     "--snapshot-id", "t5"]) == 2
    assert "corpus differs" in capsys.readouterr().err
