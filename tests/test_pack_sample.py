"""Behavioral invariants for the round-3 curation additions: greedy
sequence packing, temperature sampling, hashed classifier scoring, and
SimHash Hamming banding.  (Value-exactness vs DuckDB is covered by the
oracle mirror; these pin the SEMANTIC guarantees the oracle twin alone
would not explain.)"""

import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"
BUDGET = 128


@pytest.fixture(scope="module")
def packed(spark):
    from ukrainian_ocr_pipeline_spark.operators import packing
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    return (packing.sequence_pack(docs, budget=BUDGET)
            .toPandas().sort_values(["lang", "doc_id"]).reset_index(drop=True))


def test_pack_sequences_fit_budget_unless_single_oversized_doc(packed):
    """A sequence over budget must contain exactly one content-bearing
    doc (zero-token docs are weightless and may share any sequence)."""
    for (_, seq), g in packed.groupby(["lang", "seq_id"]):
        assert (g["n_tokens"].sum() <= BUDGET
                or (g["n_tokens"] > 0).sum() == 1), (seq, g)


def test_pack_offsets_are_running_fill(packed):
    for _, g in packed.groupby(["lang", "seq_id"]):
        g = g.sort_values("doc_id")
        assert g["seq_offset"].iloc[0] == 0
        assert (g["seq_offset"] == g["n_tokens"].cumsum().shift(
            1, fill_value=0)).all(), g


def test_pack_is_greedy_no_premature_splits(packed):
    """A new sequence may open only because the doc did not fit (or the
    previous fill was an oversized doc already past budget)."""
    for _, g in packed.groupby("lang"):
        g = g.sort_values("doc_id").reset_index(drop=True)
        for i in range(1, len(g)):
            if g["seq_id"][i] != g["seq_id"][i - 1]:
                prev_fill = g["seq_offset"][i - 1] + g["n_tokens"][i - 1]
                assert prev_fill > 0 and prev_fill + g["n_tokens"][i] > BUDGET


def test_pack_seq_ids_dense_and_docs_complete(packed, spark):
    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert len(packed) == n_docs
    for _, g in packed.groupby("lang"):
        seqs = sorted(g["seq_id"].unique())
        assert seqs == list(range(len(seqs)))


def test_pack_zero_token_and_oversized_docs(spark):
    """The fixture corpus has no empty-text or over-budget docs, so pin
    the edge semantics synthetically: NULL/empty docs are weightless
    (fill stays 0, so a following oversized doc shares their sequence),
    an oversized doc closes any non-empty sequence before it and the
    next doc opens a fresh one after it."""
    from ukrainian_ocr_pipeline_spark.operators import packing
    big = " ".join(["w"] * 200)          # > BUDGET tokens
    docs = spark.createDataFrame(
        [(1, None, "uk"), (2, "", "uk"), (3, big, "uk"),
         (4, "a b c", "uk"), (5, big, "uk"), (6, "d e", "uk")],
        "doc_id long, text string, lang string")
    out = (packing.sequence_pack(docs, budget=BUDGET)
           .toPandas().sort_values("doc_id").reset_index(drop=True))
    assert out["n_tokens"].tolist() == [0, 0, 200, 3, 200, 2]
    # docs 1,2 weightless at fill 0 -> oversized doc 3 joins seq 0;
    # doc 4 can't fit after 200 -> seq 1; oversized doc 5 -> seq 2;
    # doc 6 can't fit after 200 -> seq 3
    assert out["seq_id"].tolist() == [0, 0, 0, 1, 2, 3]
    assert out["seq_offset"].tolist() == [0, 0, 0, 0, 0, 0]


@pytest.fixture(scope="module")
def sampled(spark):
    from ukrainian_ocr_pipeline_spark.operators import textstats
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    return textstats.temperature_sample(docs, alpha=0.6).toPandas()


def test_temperature_rarest_lang_kept_entirely(sampled, spark):
    counts = (spark.read.parquet(f"{SF}/documents.parquet")
              .groupBy("lang").count().toPandas())
    rarest = counts.sort_values(["count", "lang"]).iloc[0]["lang"]
    g = sampled[sampled["lang"] == rarest]
    assert (g["rate_millionths"] == 1000000).all()
    assert g["kept"].all()


def test_temperature_rates_monotone_in_lang_size(sampled, spark):
    counts = (spark.read.parquet(f"{SF}/documents.parquet")
              .groupBy("lang").count().toPandas().set_index("lang")["count"])
    rates = sampled.groupby("lang")["rate_millionths"].first()
    merged = pd.DataFrame({"n": counts, "rate": rates}).sort_values("n")
    assert (merged["rate"].diff().dropna() <= 0).all(), merged


def test_temperature_alpha_one_keeps_everything(spark):
    from ukrainian_ocr_pipeline_spark.operators import textstats
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = textstats.temperature_sample(docs, alpha=1.0).toPandas()
    assert (out["rate_millionths"] == 1000000).all()
    assert out["kept"].all()


def test_classifier_keep_is_exact_sign_of_margin(spark):
    from ukrainian_ocr_pipeline_spark.operators import textstats
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = textstats.hashed_classifier_score(docs).toPandas()
    assert (out["keep"] == (out["wsum_milli"] >= 0)).all()
    assert ((out["score_r"] > 0) & (out["score_r"] < 1)).all()
    assert (out["keep"] == (out["score_r"] >= 0.5)).all()


def test_simhash_hamming_rejects_lossy_band_config():
    from ukrainian_ocr_pipeline_spark.operators import dedup
    with pytest.raises(AssertionError):
        dedup.simhash_hamming_pairs(None, max_hamming=4, n_bands=4)


def test_classifier_is_total_empty_docs_get_prior(spark):
    """Zero-token docs (empty/whitespace/NULL text) must still be
    scored: margin 0, score 0.5, keep=true — absent rows would let them
    bypass the curate job's classifier gate unexamined."""
    from ukrainian_ocr_pipeline_spark.operators import textstats
    docs = spark.createDataFrame(
        [(1, None), (2, ""), (3, "   "), (4, "real words here")],
        "doc_id long, text string")
    out = (textstats.hashed_classifier_score(docs)
           .toPandas().sort_values("doc_id").reset_index(drop=True))
    assert len(out) == 4
    empty = out[out.doc_id != 4]
    assert (empty["n_tokens"] == 0).all()
    assert (empty["wsum_milli"] == 0).all()
    assert (empty["score_r"] == 0.5).all()
    assert empty["keep"].all()
