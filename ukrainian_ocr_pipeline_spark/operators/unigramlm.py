"""Distributed unigram-LM (SentencePiece-style) tokenizer training.

The second production tokenizer family, next to the distributed BPE
trainer (textstats.bpe_train_merges): Kudo 2018's unigram language
model, trained by hard EM over the Zipf-bounded pretoken vocabulary.
``spec/unigram.py`` is the driver-side reference trainer; this module
is the same algorithm AT SCALE, bit-for-bit parity pinned by
tests/test_unigram.py.

Scale shape (the same discipline as the BPE trainer):

- the corpus is read ONCE to build the distinct-pretoken frequency
  table (Zipf-bounded — a fraction of corpus size), localCheckpoint'ed;
- seeding is one substring explode over that bounded table (positions ×
  lengths ≤ max_piece_len — a constant ≤ ~6·len blowup of a bounded
  input), one partial-agg shuffle, one vocab-sized collect;
- every EM round is one Arrow-batched Viterbi pass over the pretoken
  table (model ships in the UDF closure — it is vocab-sized by
  construction) + one piece-count partial-agg shuffle + one vocab-sized
  collect.  Pruning and re-normalization are driver-side arithmetic on
  the integer count table, shared verbatim with the spec.

Counts stay integers end to end (hard EM), so the committed model is
engine- and partitioning-exact; summation order never matters.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..spec import unigram as uspec
from .textstats import java_pretokens


def unigram_seed_candidates(docs: DataFrame, text_col: str = "text",
                            top_k: int = 20,
                            max_piece_len: int = 6) -> DataFrame:
    """(piece, occurrences, score): the top-k seed pieces of unigram-LM
    training — every substring of length 2..max_piece_len of every
    pretoken, weighted by pretoken frequency, ranked by SentencePiece's
    ``count * len`` seed heuristic (ties to the lexicographically
    largest piece).

    This is the seeding stage of spec/unigram.py's trainer as one
    declarative plan: pretoken vocab (one corpus pass, Zipf-bounded),
    then a positions × lengths substring explode over the DISTINCT
    table only, one partial-agg shuffle, TakeOrdered top-k.  Uses the
    RE2-safe Java pretokenizer (the oracle-twinned boundary dialect,
    same as bpe_merge_candidates); the trainer proper uses the spec
    pretokenizer via Arrow, same split as the BPE pair.
    """
    vocab = (docs
             .select(F.explode(java_pretokens(text_col)).alias("pretok"))
             .groupBy("pretok").agg(F.count("*").alias("freq")))
    subs = (vocab
            .where(F.length("pretok") >= 2)
            .select("freq", "pretok",
                    F.explode(F.sequence(F.lit(1), F.length("pretok")))
                    .alias("i"))
            .where(F.length("pretok") - F.col("i") + 1 >= 2)
            .select("freq", "pretok", "i",
                    F.explode(F.sequence(
                        F.lit(2),
                        F.least(F.lit(max_piece_len),
                                F.length("pretok") - F.col("i") + 1)))
                    .alias("l"))
            .select(F.col("pretok").substr(F.col("i"), F.col("l"))
                    .alias("piece"), "freq"))
    return (subs
            .groupBy("piece")
            .agg(F.sum("freq").alias("occurrences"))
            .select("piece", "occurrences",
                    (F.col("occurrences") * F.length("piece"))
                    .alias("score"))
            .orderBy(F.desc("score"), F.desc("piece"))
            .limit(top_k))


def _pretoken_vocab(docs: DataFrame, text_col: str) -> DataFrame:
    """Distinct-pretoken frequency table under the SPEC pretokenizer
    (Arrow batch; one corpus pass) — the trainer's working set."""
    from pyspark.sql.functions import pandas_udf

    from ..spec import bpe

    @pandas_udf("array<string>")
    def pretok(s: pd.Series) -> pd.Series:
        return s.map(lambda t: bpe.pretokenize(t or ""))

    return (docs.select(F.explode(pretok(F.col(text_col))).alias("pretok"))
            .groupBy("pretok").agg(F.count("*").alias("freq")))


def unigram_train_pieces(docs: DataFrame, vocab_size: int = 400,
                         n_seed: int = 2000, max_piece_len: int = 6,
                         em_iters: int = 2, prune_frac: float = 0.25,
                         text_col: str = "text") -> list:
    """DISTRIBUTED unigram-LM trainer — same loop, same integer state,
    same tie rules as spec/unigram.py train_pieces, with the two
    corpus-shaped stages (seed substring counting, EM Viterbi counting)
    running as Spark plans over the bounded pretoken table.  Returns
    the identical ``[(piece, count), ...]`` list, sorted (count desc,
    piece desc), ready to commit.

    Each E-step ships the CURRENT integer count table in the UDF
    closure (vocab-sized), Viterbi-segments every distinct pretoken
    once (spec.viterbi — the exact function the reference trainer
    calls, so float DP arithmetic is bit-identical), and reduces
    frequency-weighted integer piece counts in one partial-agg
    shuffle.  M-step and pruning are the spec's own driver-side
    arithmetic over integers, where no partitioning exists to matter.
    """
    vocab = _pretoken_vocab(docs, text_col).localCheckpoint(eager=True)

    # ---- seeding: substring occurrence counts over the vocab table --
    subs = (vocab
            .select("freq", "pretok",
                    F.explode(F.sequence(F.lit(1), F.length("pretok")))
                    .alias("i"))
            .select("freq", "pretok", "i",
                    F.explode(F.sequence(
                        F.lit(1),
                        F.least(F.lit(max_piece_len),
                                F.length("pretok") - F.col("i") + 1)))
                    .alias("l"))
            .select(F.col("pretok").substr(F.col("i"), F.col("l"))
                    .alias("piece"), "freq")
            .groupBy("piece").agg(F.sum("freq").alias("occ")))
    singles = {r["piece"]: r["occ"]
               for r in subs.where(F.length("piece") == 1).collect()}
    multi = (subs.where(F.length("piece") >= 2)
             .select("piece", "occ",
                     (F.col("occ") * F.length("piece")).alias("score"))
             .orderBy(F.desc("score"), F.desc("piece"))
             .limit(n_seed).collect())
    counts = dict(singles)
    for r in multi:
        counts[r["piece"]] = r["occ"]
    single_set = set(singles)

    # ---- EM over the distributed pretoken table ---------------------
    def estep(c: dict) -> dict:
        from pyspark.sql.functions import pandas_udf

        logp = uspec.model_logprobs(c)

        @pandas_udf("array<struct<piece:string,n:long>>")
        def seg(pret: pd.Series, freq: pd.Series) -> pd.Series:
            out = []
            for w, f in zip(pret, freq):
                used: dict = {}
                for p in uspec.viterbi(w, logp, max_piece_len):
                    used[p] = used.get(p, 0) + int(f)
                out.append([{"piece": p, "n": n} for p, n in used.items()])
            return pd.Series(out)

        rows = (vocab.select(F.explode(seg("pretok", "freq")).alias("u"))
                .groupBy("u.piece").agg(F.sum("u.n").alias("n"))
                .collect())
        used = {r["piece"]: r["n"] for r in rows}
        return {p: used.get(p, 0) for p in c}

    def em(c: dict, iters: int) -> dict:
        for _ in range(iters):
            c = estep(c)
        return c

    # ---- the spec's prune loop, verbatim control flow ---------------
    counts = em(counts, em_iters)
    while True:
        prunable = sorted(
            ((c, p) for p, c in counts.items() if p not in single_set),
            key=lambda t: (t[0], t[1]),
        )
        n_over = len(counts) - vocab_size
        if n_over <= 0 or not prunable:
            break
        n_drop = max(sum(1 for c, _ in prunable if c == 0),
                     min(n_over, max(1, int(len(prunable) * prune_frac))))
        drop = {p for _, p in prunable[:n_drop]}
        counts = {p: c for p, c in counts.items() if p not in drop}
        counts = em(counts, em_iters)
    counts = em(counts, 1)
    return sorted(counts.items(), key=lambda t: (t[1], t[0]), reverse=True)


def unigram_token_counts(docs: DataFrame, text_col: str = "text",
                         id_col: str = "doc_id",
                         pieces=None) -> DataFrame:
    """Per-document token counts under the COMMITTED unigram piece
    table (spec/unigram_pieces.py, trained once on the fixture corpus
    by jobs/make_unigram.py) — the unigram twin of bpe_token_counts.
    Viterbi decoding is genuinely imperative, so this is the sanctioned
    Arrow-batched slow path: logprob table built once on the driver,
    shipped in the closure; per-pretoken segmentation cache persists
    across Arrow batches within a task (Zipf amortization), size-capped.
    """
    from pyspark.sql.functions import pandas_udf

    logp = uspec.piece_logprobs(pieces)
    cache: dict = {}

    @pandas_udf("long")
    def n_uni(s: pd.Series) -> pd.Series:
        if len(cache) > 200_000:
            cache.clear()
        return s.map(lambda t: uspec.count_tokens(t or "", logp, cache=cache))

    return (docs.select(F.col(id_col),
                        n_uni(F.col(text_col)).alias("n_unigram_tokens"))
            .orderBy(id_col))
