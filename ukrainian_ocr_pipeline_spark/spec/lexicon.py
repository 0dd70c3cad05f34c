"""Stage 5 — fuzzy lexicon matching over extracted text.

Mirrors the reference's SurnameMatcher
(ukrainian_ocr/core/surname_matcher.py:96-271) semantics:

  * normalize_text: lower -> NFD -> strip combining marks -> keep only
    [\\w\\s\\u0400-\\u04FF] -> strip                       (:96-113)
  * tokenization: re.findall(r"\\b[\\w\\u0400-\\u04FF]+\\b")  (:238)
  * similarity: difflib SequenceMatcher ratio with length penalty
    ratio * (1 - len_diff/max_len * 0.3), blended 0.7*char + 0.3*phonetic
    over 11 Cyrillic phonetic groups                        (:160-219)
  * per-word argmax over the lexicon, threshold 0.8, min word length 3
    (:240-255); context = words[idx-2 : idx+3]              (:256-259)

One deliberate determinism fix vs the reference: the reference iterates
``self.surnames`` (a Python set — hash order) and breaks ties with
strict ``>``, so tie winners depend on set order.  We iterate the
lexicon in sorted() order, making tie-breaks reproducible across
processes and partitions — required for the byte-identical invariant.
"""

from __future__ import annotations

import re
import unicodedata
from dataclasses import dataclass
from difflib import SequenceMatcher

_WORD_RE = re.compile(r"\b[\wЀ-ӿ]+\b")
_KEEP_RE = re.compile(r"[^\w\sЀ-ӿ]")

# parity with core/surname_matcher.py:166-170
_PHONETIC_GROUPS = [
    ["б", "п"], ["в", "ф"], ["г", "к", "х"], ["д", "т"],
    ["ж", "ш", "щ"], ["з", "с", "ц"], ["е", "є", "э"],
    ["і", "ї", "ы", "и"], ["о", "а"], ["у", "ю"], ["я", "а"],
]
DEFAULT_THRESHOLD = 0.8
DEFAULT_MIN_LENGTH = 3


@dataclass(frozen=True)
class Match:
    found_text: str
    matched_term: str
    confidence: float
    word_idx: int
    context: str
    block_id: int = -1


def normalize_text(text: str) -> str:
    if not text:
        return ""
    text = text.lower()
    text = "".join(
        c for c in unicodedata.normalize("NFD", text)
        if unicodedata.category(c) != "Mn"
    )
    return _KEEP_RE.sub("", text).strip()


def _phonetic(text: str) -> str:
    # sequential replace like the reference, not simultaneous translate:
    # core/surname_matcher.py:173-179 applies group replacements in order,
    # so e.g. 'я'->'а' happens after 'о'->... — emulate exactly.
    result = text.lower()
    for group in _PHONETIC_GROUPS:
        rep = group[0]
        for ch in group[1:]:
            result = result.replace(ch, rep)
    return result


def similarity(text1: str, text2: str, use_phonetic: bool = True) -> float:
    """Parity with calculate_similarity (core/surname_matcher.py:186-219)."""
    if not text1 or not text2:
        return 0.0
    norm1 = normalize_text(text1)
    norm2 = normalize_text(text2)
    if norm1 == norm2:
        return 1.0
    len_diff = abs(len(norm1) - len(norm2))
    max_len = max(len(norm1), len(norm2))
    if max_len == 0:
        return 0.0
    len_penalty = len_diff / max_len
    char_sim = SequenceMatcher(None, norm1, norm2).ratio() * (1 - len_penalty * 0.3)
    if use_phonetic:
        phon_sim = SequenceMatcher(None, _phonetic(text1), _phonetic(text2)).ratio()
        return 0.7 * char_sim + 0.3 * phon_sim
    return char_sim


class LexiconMatcher:
    """Deterministic fuzzy matcher; one instance is broadcast per executor.

    Hot-path engineering (results remain EXACTLY those of `similarity`):
      * per-word normalize/phonetic computed once, not once per term,
      * per-term SequenceMatcher objects pre-built with seq2 set (difflib
        caches its b2j index on seq2 — the reference rebuilds it for every
        (word, term) pair),
      * sound upper-bound prune: ratio() <= real_quick_ratio() =
        2*min(len)/(len1+len2), so a term whose bound is below the
        threshold cannot match and is skipped without running difflib.
    """

    def __init__(self, terms: list[str], threshold: float = DEFAULT_THRESHOLD,
                 use_phonetic: bool = True, min_length: int = DEFAULT_MIN_LENGTH):
        self.threshold = threshold
        self.use_phonetic = use_phonetic
        self.min_length = min_length
        terms_set = set()
        for t in terms:
            if len(t) >= min_length:
                terms_set.add(t)
                norm = normalize_text(t)
                if norm != t and len(norm) >= min_length:
                    terms_set.add(norm)
        self.terms = sorted(terms_set)  # sorted: the determinism fix
        # per-instance bounded memo (NOT @lru_cache on the method, which
        # would key a process-global cache by self and pin dead matcher
        # instances — and their prepped SequenceMatchers — forever)
        self._best_cache: dict[str, tuple[str, float] | None] = {}
        # precomputed per-term state: (term, norm, len(norm), sm_char with
        # seq2=norm, phon, len(phon), sm_phon with seq2=phon)
        self._prepped = []
        for term in self.terms:
            norm = normalize_text(term)
            smc = SequenceMatcher(None)
            smc.set_seq2(norm)
            phon = _phonetic(term)
            smp = SequenceMatcher(None)
            smp.set_seq2(phon)
            self._prepped.append((term, norm, len(norm), smc, phon, len(phon), smp))
        # alphabet-disjointness prune: SequenceMatcher.ratio() is 0 when
        # the two strings share no characters, so a word whose chars are
        # disjoint from EVERY term's chars (both the normalized and the
        # phonetic alphabets) has sim == 0.0 exactly — for a Cyrillic
        # lexicon this rejects every latin word in O(len(word)), which
        # is the dominant case on a web-scale corpus (the 66-term difflib
        # scan otherwise runs once per distinct latin word)
        self._norm_chars = frozenset("".join(p[1] for p in self._prepped))
        self._phon_chars = frozenset("".join(p[4] for p in self._prepped))

    def _best(self, word: str) -> tuple[str, float] | None:
        try:
            return self._best_cache[word]
        except KeyError:
            pass
        r = self._best_uncached(word)
        if len(self._best_cache) < 65536:
            self._best_cache[word] = r
        return r

    def _best_uncached(self, word: str) -> tuple[str, float] | None:
        norm_w = normalize_text(word)
        phon_w = _phonetic(word) if self.use_phonetic else ""
        if (self._norm_chars.isdisjoint(norm_w)
                and (not self.use_phonetic
                     or self._phon_chars.isdisjoint(phon_w))):
            # both ratios are exactly 0 against every term -> sim 0.0,
            # below any positive threshold (threshold <= 0 never matches
            # anything above it either way, since 0.0 >= thr still needs
            # sim > best_sim = 0.0 to select — and 0.0 > 0.0 is False)
            return None
        lw, lpw = len(norm_w), len(phon_w)
        thr = self.threshold
        best_term, best_sim = None, 0.0
        for term, norm_t, lt, smc, phon_t, lpt, smp in self._prepped:
            if not norm_w or not word or not term:
                continue
            if norm_w == norm_t:
                if 1.0 >= thr and 1.0 > best_sim:
                    best_sim, best_term = 1.0, term
                continue
            if lt == 0:
                continue
            # upper bound: char ratio <= 2*min/(sum); phon ratio likewise
            max_len = lt if lt > lw else lw
            len_factor = 1 - (abs(lw - lt) / max_len) * 0.3
            char_bound = (2 * min(lw, lt) / (lw + lt)) * len_factor if (lw + lt) else 0.0
            if self.use_phonetic:
                phon_bound = 2 * min(lpw, lpt) / (lpw + lpt) if (lpw + lpt) else 0.0
                bound = 0.7 * char_bound + 0.3 * phon_bound
            else:
                bound = char_bound
            if bound < thr - 1e-12 or bound <= best_sim - 1e-12:
                continue
            smc.set_seq1(norm_w)
            char_sim = smc.ratio() * len_factor
            if self.use_phonetic:
                smp.set_seq1(phon_w)
                sim = 0.7 * char_sim + 0.3 * smp.ratio()
            else:
                sim = char_sim
            if sim >= thr and sim > best_sim:
                best_sim, best_term = sim, term
        if best_term is None:
            return None
        return best_term, best_sim

    def find_in_text(self, text: str) -> list[Match]:
        """Parity with find_in_text (core/surname_matcher.py:221-271)."""
        if not text:
            return []
        words = _WORD_RE.findall(text)
        matches: list[Match] = []
        # hot loop: cache consulted inline (one dict.get per word instead
        # of a method call — measured ~10% of whole-pipeline time at the
        # typical >99% hit rate)
        cache_get = self._best_cache.get
        min_length = self.min_length
        miss = ("miss",)
        for idx, word in enumerate(words):
            if len(word) < min_length:
                continue
            hit = cache_get(word, miss)
            if hit is miss:
                hit = self._best(word)
            if hit is None:
                continue
            term, sim = hit
            ctx = " ".join(words[max(0, idx - 2):min(len(words), idx + 3)])
            matches.append(Match(word, term, sim, idx, ctx))
        return matches


def default_lexicon() -> list[str]:
    """The reference's 40 common Ukrainian surnames
    (core/surname_matcher.py:405-419) — public test lexicon."""
    return [
        "Шевченко", "Коваленко", "Бондаренко", "Ткаченко", "Кравченко",
        "Олійник", "Шевчук", "Поліщук", "Мельник", "Гавриленко",
        "Петренко", "Іваненко", "Михайленко", "Василенко", "Григоренко",
        "Ковальчук", "Савченко", "Левченко", "Павленко", "Марченко",
        "Жук", "Козлов", "Мороз", "Кравець", "Швець",
        "Гончар", "Коваль", "Столяр", "Рибалко", "Терещенко",
        "Данилко", "Федорко", "Василько", "Петрук", "Іванко",
        "Романко", "Степанко", "Максимко", "Дмитрук", "Андрійко",
    ]
