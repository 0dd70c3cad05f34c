"""Behavioral invariants for the cross-lingual mining and bigram-LM
additions.  (Value-exactness vs DuckDB is covered by the oracle
mirror; these pin the SEMANTIC guarantees — mutuality, margin
normalization, transition-awareness — that a hash match alone would
not explain.)"""

import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def mined(spark):
    from ukrainian_ocr_pipeline_spark.operators import similarity
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    return (similarity.bitext_margin_pairs(emb, margin_threshold=1.0)
            .toPandas())


def test_bitext_pairs_are_mutual_best(mined):
    """Each side of a mined pair appears exactly once: mutual-best is a
    partial matching, never a hub fanning out to many partners."""
    assert len(mined) > 0
    assert mined["a_id"].is_unique and mined["b_id"].is_unique


def test_bitext_margin_lower_bound_and_threshold(mined, spark):
    """A mutual-best pair's cosine is the max on both sides, so the
    margin (cos over the mean of both sides' top-k) is >= 1 by
    construction; a higher threshold strictly filters."""
    from ukrainian_ocr_pipeline_spark.operators import similarity
    assert (mined["margin_r"] >= 1.0).all()
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    strict = (similarity.bitext_margin_pairs(emb, margin_threshold=1.2)
              .toPandas())
    want = mined[mined["margin_r"] >= 1.2]
    got = set(map(tuple, strict[["a_id", "b_id"]].values))
    assert got == set(map(tuple, want[["a_id", "b_id"]].values))
    assert 0 < len(strict) < len(mined)


def test_bigram_lm_penalizes_word_salad(spark):
    """The discriminative power the unigram gate lacks: a document with
    the SAME unigram distribution but scrambled transitions must score
    strictly lower than the natural-order original."""
    from ukrainian_ocr_pipeline_spark.operators import textstats
    sent = "the cat sat on the mat and the dog sat on the rug"
    natural = " ".join([sent] * 8)
    words = natural.split()
    # deterministic derangement of transitions: interleave halves
    half = len(words) // 2
    salad = " ".join(w for p in zip(words[:half], words[half:]) for w in p)
    docs = spark.createDataFrame(
        [(0, natural), (1, salad)], "doc_id long, text string")
    out = {r["doc_id"]: r for r in textstats.bigram_logprob(docs).collect()}
    # identical token multiset -> identical unigram scores; transitions
    # differ -> bigram scores must separate, natural on top
    uni = {r["doc_id"]: r["avg_logprob_r"]
           for r in textstats.unigram_logprob(docs).collect()}
    assert uni[0] == uni[1]
    assert out[0]["avg_logprob_r"] > out[1]["avg_logprob_r"]
    assert out[0]["n_bigrams"] == len(words) - 1


def test_bigram_lm_short_docs_absent(spark):
    """Docs with < 2 tokens have no transitions: absent from the output
    rather than scored 0/NULL."""
    from ukrainian_ocr_pipeline_spark.operators import textstats
    docs = spark.createDataFrame(
        [(0, "one"), (1, ""), (2, None), (3, "two words")],
        "doc_id long, text string")
    got = {r["doc_id"] for r in textstats.bigram_logprob(docs).collect()}
    assert got == {3}


def test_source_concentration_known_values(spark):
    """Exact Gini/HHI on a hand-computable distribution: counts
    (1, 1, 2, 4) -> HHI = 22/64, Gini via the sorted-rank identity
    = 2*(1*1+2*1+3*2+4*4)/(4*8) - 5/4 = 50/32 - 40/32 = 0.3125."""
    from ukrainian_ocr_pipeline_spark.operators import textstats
    rows = [(i, "t", "en", src) for i, src in enumerate(
        ["a", "b", "c", "c", "d", "d", "d", "d"])]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string")
    got = textstats.source_concentration(docs).collect()[0]
    assert got["n_sources"] == 4 and got["n_docs"] == 8
    assert got["hhi_r"] == round(22 / 64, 6)
    assert got["gini_r"] == 0.3125
    assert got["top_share_r"] == 0.5


def test_length_drift_psi_self_is_zero_and_orders_drift(spark):
    """The reference language's own PSI row is exactly 0 (calibration);
    a same-shape language drifts less than a shifted one."""
    from ukrainian_ocr_pipeline_spark.operators import textstats
    mk = lambda n: " ".join(["w"] * n)
    rows = ([(i, mk(4), "en", "s") for i in range(20)]
            + [(100 + i, mk(4), "fr", "s") for i in range(18)]
            + [(200 + i, mk(64), "fr", "s") for i in range(2)]
            + [(300 + i, mk(64), "de", "s") for i in range(20)])
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string")
    got = {r["lang"]: r["psi_r"]
           for r in textstats.length_drift_psi(docs).collect()}
    assert got["en"] == 0.0
    assert 0 < got["fr"] < got["de"]
