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
