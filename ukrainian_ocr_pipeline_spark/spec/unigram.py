"""Unigram-LM (SentencePiece-style) tokenizer: deterministic trainer
and Viterbi encoder.

Completes the tokenizer-training surface: ``spec/bpe.py`` covers the
merge-based family (GPT-2); this module covers the other production
family — Kudo 2018's unigram language model (SentencePiece's default),
where the vocabulary is a set of scored pieces and encoding is the
max-likelihood segmentation.  Reference analog: none — beyond-reference
LLM-pipeline surface, same status as BPE.

Design constraints, in order:

1. **Determinism with no RNG and no dict-order dependence.**  Piece
   counts are integers end to end (hard-EM / Viterbi counts, not
   forward-backward expectations), so model state is exactly
   reproducible across engines and partitionings; log-probabilities are
   derived from the integer counts at use time with one fixed formula.
   Every selection (seeding, pruning) orders by ``(score, piece)`` with
   lexicographically-largest ties, the same convention as
   ``bpe.train_merges``.

2. **Pretokenizer parity with the BPE path.**  Training and encoding
   both run over ``bpe.pretokenize`` pretokens, so BPE counts and
   unigram counts are comparable per document and the distributed
   trainer can reuse the same Zipf-bounded pretoken-vocabulary shape
   (corpus read ONCE; every round runs over the distinct-pretoken
   table).

3. **Hard EM, documented as such.**  SentencePiece proper uses
   forward-backward expectations; the Viterbi-count variant keeps all
   state integral (constraint 1) at the cost of slightly greedier
   convergence.  For a corpus-statistics engine whose gate is
   bit-reproducibility, that is the right trade.

The committed piece table (``spec/unigram_pieces.py``) is trained once
on the oracle-extracted text of the deterministic fixture corpus by
``jobs/make_unigram.py`` and regenerated only there;
``tests/test_unigram.py`` retrains in-memory and fails loudly on drift.
"""

from __future__ import annotations

import math
from collections import Counter

from .bpe import pretokenize

# Viterbi penalty for a character absent from the piece table: worse
# than any real piece (total counts are < 2^40 in any corpus we train
# on, so a real logp is > -ln(2^40) ≈ -27.7); chosen large but finite
# so unknown characters segment as single-char pieces instead of
# failing.
_UNK_LOGP = -1e4


def seed_counts(texts, max_piece_len: int = 6) -> Counter:
    """Occurrence counts of every substring (length 1..max_piece_len)
    of every pretoken, weighted by pretoken frequency.  Every
    *position* counts: 'aaa' contributes 2 occurrences of 'aa' — the
    same arithmetic the distributed seeding reproduces with a
    sequence×substring explode."""
    pret = Counter()
    for t in texts:
        for w in pretokenize(t):
            pret[w] += 1
    subs: Counter = Counter()
    for w, f in pret.items():
        n = len(w)
        for i in range(n):
            for j in range(i + 1, min(i + max_piece_len, n) + 1):
                subs[w[i:j]] += f
    return subs


def seed_vocab(texts, n_seed: int = 2000, max_piece_len: int = 6) -> dict:
    """Initial model: ALL single characters (mandatory — they are never
    pruned, so any string stays segmentable) plus the top ``n_seed``
    multi-character substrings by ``count * len`` (SentencePiece's
    seed heuristic), ties to the lexicographically largest piece.
    Returns piece -> integer seed count."""
    subs = seed_counts(texts, max_piece_len)
    singles = {p: c for p, c in subs.items() if len(p) == 1}
    multi = sorted(
        ((c * len(p), p) for p, c in subs.items() if len(p) > 1),
        key=lambda t: (t[0], t[1]),
        reverse=True,
    )[:n_seed]
    vocab = dict(singles)
    for _, p in multi:
        vocab[p] = subs[p]
    return vocab


def model_logprobs(counts: dict) -> dict:
    """piece -> ln(count/total) over the integer count table.  Pieces
    with count 0 keep a floor just above the UNK penalty so they can
    re-enter a segmentation only when nothing better exists."""
    total = sum(counts.values())
    out = {}
    for p, c in counts.items():
        out[p] = math.log(c / total) if c > 0 else _UNK_LOGP / 2
    return out


def viterbi(pretoken: str, logp: dict, max_piece_len: int = 6) -> list:
    """Max-likelihood segmentation of one pretoken under the unigram
    model.  DP over end positions; on exact score ties the EARLIER
    start (longer final piece) wins — a fixed rule, so the same floats
    give the same segmentation in every engine."""
    n = len(pretoken)
    best = [0.0] + [-math.inf] * n
    back = [0] * (n + 1)
    for j in range(1, n + 1):
        for i in range(max(0, j - max_piece_len), j):
            piece = pretoken[i:j]
            lp = logp.get(piece)
            if lp is None:
                if j - i > 1:
                    continue
                lp = _UNK_LOGP
            s = best[i] + lp
            # strict > : the earliest i examined wins ties
            if s > best[j]:
                best[j] = s
                back[j] = i
    out = []
    j = n
    while j > 0:
        i = back[j]
        out.append(pretoken[i:j])
        j = i
    out.reverse()
    return out


def _estep_counts(pret_vocab: Counter, counts: dict,
                  max_piece_len: int = 6) -> Counter:
    """One hard-EM E-step: Viterbi-segment every distinct pretoken and
    accumulate frequency-weighted integer piece counts."""
    logp = model_logprobs(counts)
    used: Counter = Counter()
    for w, f in pret_vocab.items():
        for p in viterbi(w, logp, max_piece_len):
            used[p] += f
    return used


def train_pieces(texts, vocab_size: int = 400, n_seed: int = 2000,
                 max_piece_len: int = 6, em_iters: int = 2,
                 prune_frac: float = 0.25) -> list:
    """Deterministic unigram-LM trainer.  Returns the final model as a
    list of ``(piece, count)`` sorted by (count desc, piece desc) —
    integer counts, ready to commit.

    Loop: ``em_iters`` hard-EM iterations, then prune the
    lowest-count ``prune_frac`` of *prunable* pieces (multi-char; a
    piece with count 0 is always dropped), repeat until the vocabulary
    fits ``vocab_size``, then one final EM pass so the committed counts
    are consistent with the committed vocabulary."""
    pret = Counter()
    for t in texts:
        for w in pretokenize(t):
            pret[w] += 1
    counts = seed_vocab(texts, n_seed=n_seed, max_piece_len=max_piece_len)
    singles = {p for p in counts if len(p) == 1}

    def em(c: dict, iters: int) -> dict:
        for _ in range(iters):
            used = _estep_counts(pret, c, max_piece_len)
            c = {p: used.get(p, 0) for p in c}
        return c

    counts = em(counts, em_iters)
    while True:
        prunable = sorted(
            ((c, p) for p, c in counts.items() if p not in singles),
            key=lambda t: (t[0], t[1]),
        )
        n_over = len(counts) - vocab_size
        if n_over <= 0 or not prunable:
            break
        # drop dead pieces outright, then the weakest prune_frac slice
        n_drop = max(sum(1 for c, _ in prunable if c == 0),
                     min(n_over, max(1, int(len(prunable) * prune_frac))))
        drop = {p for _, p in prunable[:n_drop]}
        counts = {p: c for p, c in counts.items() if p not in drop}
        counts = em(counts, em_iters)
    counts = em(counts, 1)
    return sorted(counts.items(), key=lambda t: (t[1], t[0]), reverse=True)


def piece_logprobs(pieces=None) -> dict:
    """piece -> logprob for the committed table (or any (piece, count)
    list) — the encoder-side loader."""
    if pieces is None:
        from .unigram_pieces import PIECES
        pieces = PIECES
    return model_logprobs(dict(pieces))


def encode(text: str, logp: dict, max_piece_len: int = 6,
           cache: dict | None = None) -> list:
    """Unigram-encode a document: Viterbi per pretoken, concatenated.
    ``cache`` memoizes per-pretoken segmentations across calls (word
    frequency is Zipfian — same batch-scoped trick as bpe.count_tokens)."""
    out = []
    if cache is None:
        cache = {}
    for w in pretokenize(text):
        seg = cache.get(w)
        if seg is None:
            seg = viterbi(w, logp, max_piece_len)
            cache[w] = seg
        out.extend(seg)
    return out


def count_tokens(text: str, logp: dict, max_piece_len: int = 6,
                 cache: dict | None = None) -> int:
    n = 0
    if cache is None:
        cache = {}
    for w in pretokenize(text):
        c = cache.get(w)
        if c is None:
            c = len(viterbi(w, logp, max_piece_len))
            cache[w] = c
        n += c
    return n
