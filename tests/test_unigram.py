"""Unigram-LM tokenizer: spec unit tests, committed-table drift
guards, and distributed-trainer parity (operators/unigramlm.py vs
spec/unigram.py, bit-for-bit — the same gate test_bpe.py applies to
the BPE trainer)."""

import math

import pytest

from ukrainian_ocr_pipeline_spark.fixtures import gen_pages
from ukrainian_ocr_pipeline_spark.oracle import run_oracle
from ukrainian_ocr_pipeline_spark.spec import unigram as U

TOY = [
    "the cat sat on the mat",
    "the dog sat on the log",
    "Привіт світ, привіт котик",
    "the theater is there",
] * 3


class TestSpecUnit:
    def test_seed_counts_every_position(self):
        # 'aaa' has two 'aa' occurrences and three 'a' occurrences
        c = U.seed_counts(["aaa"])
        assert c["a"] == 3 and c["aa"] == 2 and c["aaa"] == 1

    def test_seed_vocab_keeps_all_singles(self):
        v = U.seed_vocab(TOY, n_seed=5)
        chars = {ch for t in TOY for w in U.pretokenize(t) for ch in w}
        assert chars <= set(v)

    def test_viterbi_prefers_frequent_piece(self):
        logp = U.model_logprobs({"ab": 100, "a": 1, "b": 1, "c": 1})
        assert U.viterbi("abc", logp) == ["ab", "c"]

    def test_viterbi_unknown_char_survives(self):
        logp = U.model_logprobs({"a": 1})
        assert U.viterbi("aXa", logp) == ["a", "X", "a"]

    def test_viterbi_tie_prefers_longer_final_piece(self):
        # equal logp for both segmentations -> earliest start wins at j
        logp = {"ab": math.log(0.25), "a": math.log(0.25),
                "b": math.log(0.25)}
        assert U.viterbi("ab", logp) == ["ab"]

    def test_encode_concatenation_roundtrip(self):
        pieces = U.train_pieces(TOY, vocab_size=60, n_seed=200)
        logp = U.model_logprobs(dict(pieces))
        for t in TOY:
            assert "".join(U.encode(t, logp)) == "".join(U.pretokenize(t))

    def test_count_matches_encode(self):
        pieces = U.train_pieces(TOY, vocab_size=60, n_seed=200)
        logp = U.model_logprobs(dict(pieces))
        for t in TOY:
            assert U.count_tokens(t, logp) == len(U.encode(t, logp))

    def test_trainer_deterministic(self):
        assert (U.train_pieces(TOY, vocab_size=60, n_seed=200)
                == U.train_pieces(TOY, vocab_size=60, n_seed=200))

    def test_trainer_respects_vocab_size(self):
        pieces = U.train_pieces(TOY, vocab_size=60, n_seed=200)
        singles = {p for p, _ in pieces if len(p) == 1}
        chars = {ch for t in TOY for w in U.pretokenize(t) for ch in w}
        assert chars <= singles          # singles never pruned
        assert len(pieces) <= max(60, len(singles))


class TestCommittedTables:
    """Drift guards: ONLY jobs/make_unigram.py writes the committed
    tables; these tests recompute both in-memory and fail loudly on
    any fixture/spec drift."""

    @pytest.fixture(scope="class")
    def golden240(self):
        return run_oracle(list(gen_pages(240)))

    def test_pieces_drift_guard(self, golden240):
        from ukrainian_ocr_pipeline_spark.spec.unigram_pieces import PIECES
        texts = golden240["extracted"]["extracted_text"].tolist()
        assert U.train_pieces(texts, vocab_size=400, n_seed=2000) == PIECES

    def test_expected_counts_drift_guard(self, golden240):
        from ukrainian_ocr_pipeline_spark.plans.expected_unigram import (
            UNIGRAM_EXPECTED,
        )
        logp = U.piece_logprobs()
        cache: dict = {}
        got = [(r.url, U.count_tokens(r.extracted_text, logp, cache=cache))
               for r in golden240["extracted"].itertuples(index=False)]
        assert got == UNIGRAM_EXPECTED


class TestDistributedParity:
    """The Spark trainer must reproduce the spec trainer bit-for-bit:
    same pieces, same integer counts, same order — on a crafted toy
    corpus AND on the multilingual fixture corpus."""

    def test_toy_corpus_parity(self, spark):
        from ukrainian_ocr_pipeline_spark.operators.unigramlm import (
            unigram_train_pieces,
        )
        docs = spark.createDataFrame([(i, t) for i, t in enumerate(TOY)],
                                     "doc_id long, text string")
        got = unigram_train_pieces(docs, vocab_size=60, n_seed=200)
        want = U.train_pieces(TOY, vocab_size=60, n_seed=200)
        assert got == want

    def test_fixture_corpus_parity(self, spark):
        from ukrainian_ocr_pipeline_spark.operators.unigramlm import (
            unigram_train_pieces,
        )
        golden = run_oracle(list(gen_pages(60)))
        texts = golden["extracted"]["extracted_text"].tolist()
        docs = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)],
            "doc_id long, text string")
        got = unigram_train_pieces(docs, vocab_size=120, n_seed=400,
                                   em_iters=1)
        want = U.train_pieces(texts, vocab_size=120, n_seed=400,
                              em_iters=1)
        assert got == want

    def test_token_counts_match_spec(self, spark):
        from ukrainian_ocr_pipeline_spark.operators.unigramlm import (
            unigram_token_counts,
        )
        docs = spark.createDataFrame([(i, t) for i, t in enumerate(TOY)],
                                     "doc_id long, text string")
        rows = unigram_token_counts(docs).collect()
        logp = U.piece_logprobs()
        for r in rows:
            assert r["n_unigram_tokens"] == U.count_tokens(
                TOY[r["doc_id"]], logp)
