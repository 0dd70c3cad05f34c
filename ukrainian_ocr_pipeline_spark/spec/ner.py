"""Stage 4 — entity-tag: extracted text -> char-offset entity spans.

Mirrors the reference's deterministic rule-based NER backend
(ukrainian_ocr/core/ner.py:295-348) exactly: same person/location
patterns, same confidences (PERSON 0.8, LOCATION 0.7), same emission
order (all person patterns in order, then all location patterns), and
the same 7-word false-positive stoplist filter applied afterwards
(core/ner.py:360-368, 403-408).  The model-backed backends
(spaCy/transformers/OpenAI, core/ner.py:43-292) are out of scope for
parity — nondeterministic and unavailable offline; this backend is the
reference's own fallback (core/ner.py:389-396) and our default.

Offsets are char positions into the extracted text (analog of the
reference's start_pos/end_pos into the concatenated line text,
core/ner.py:429-447).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

# Ukrainian/Russian person name patterns — parity with core/ner.py:301-310
_PERSON_PATTERNS = [
    # Full names: First Middle Last
    re.compile(r"\b[А-ЯІЇЄЁ][а-яіїєё]{2,15}\s+[А-ЯІЇЄЁ][а-яіїєё]{2,15}\s+[А-ЯІЇЄЁ][а-яіїєё]{2,15}\b"),
    # First Last
    re.compile(r"\b[А-ЯІЇЄЁ][а-яіїєё]{2,15}\s+[А-ЯІЇЄЁ][а-яіїєё]{2,15}\b"),
    # Common Ukrainian surname suffixes
    re.compile(r"\b[А-ЯІЇЄЁ][а-яіїєё]*(?:енко|ський|цький|ич|юк|як|ук|ко)\b"),
]

# Location patterns — parity with core/ner.py:312-316
_LOCATION_PATTERNS = [
    re.compile(r"\b(?:місто|село|селище|хутір|станція)\s+[А-ЯІЇЄЁ][а-яіїєё]{2,20}\b"),
    re.compile(r"\b[А-ЯІЇЄЁ][а-яіїєё]{3,20}(?:ськ|цьк|івка|івці|ичі|енко|ове|іно)\b"),
]

# parity with core/ner.py:360-368
FALSE_POSITIVE_WORDS = frozenset({
    "ім'я", "прізвище", "по-батькові", "особа", "людина", "чоловік", "жінка",
})

PERSON_CONFIDENCE = 0.8
LOCATION_CONFIDENCE = 0.7

# every pattern requires at least one Cyrillic capital — one cheap scan
# short-circuits all five pattern passes on latin-only documents (the
# common case in a web-scale corpus); semantics unchanged
_CYR_GATE = re.compile(r"[А-ЯІЇЄЁ]")

# Maximal Cyrillic-anchored regions: every char any pattern can consume
# is Cyrillic (U+0400-U+04FF) or whitespace, and every match starts and
# ends on a Cyrillic letter, so all matches lie inside maximal runs of
# [Ѐ-ӿ\s] trimmed to their Cyrillic endpoints.  Scanning only those
# regions (one C-level pass) replaces five whole-document regex passes —
# on mostly-latin web text the patterns then touch a tiny fraction of
# the input.  Semantics preserved exactly: regions are padded by one
# context char on each side so \b at region edges evaluates against the
# true neighbor chars (a latin letter adjacent to a Cyrillic run
# correctly suppresses the boundary), and padding chars are non-Cyrillic
# by maximality so no pattern can consume them.
_CYR_REGION = re.compile(r"[Ѐ-ӿ](?:[Ѐ-ӿ\s]*[Ѐ-ӿ])?")


@dataclass(frozen=True)
class Span:
    text: str
    label: str
    confidence: float
    start: int
    end: int
    block_id: int = -1  # filled by the pipeline from kept-block offsets
    context: str = ""   # ±2-kept-block window, filled with block_id


def tag_entities(text: str) -> list[Span]:
    """Extract entity spans. Deterministic; never raises on str input.

    Emission order is the reference's (all person patterns in document
    order, then all location patterns); the region gating below is a
    pure scan optimization — identical output, pinned by the golden
    corpus and test_spec_unit's region-equivalence property."""
    if not text or _CYR_GATE.search(text) is None:
        return []
    # (substring with ±1 context char, offset of substring start)
    regions: list[tuple[str, int]] = []
    n = len(text)
    for m in _CYR_REGION.finditer(text):
        if _CYR_GATE.search(text, m.start(), m.end()) is None:
            continue  # lowercase-only run: no pattern can start here
        lo = m.start() - 1 if m.start() > 0 else 0
        hi = m.end() + 1 if m.end() < n else n
        regions.append((text[lo:hi], lo))
    spans: list[Span] = []
    for pat in _PERSON_PATTERNS:
        for seg, base in regions:
            for m in pat.finditer(seg):
                spans.append(Span(m.group(), "PERSON", PERSON_CONFIDENCE,
                                  base + m.start(), base + m.end()))
    for pat in _LOCATION_PATTERNS:
        for seg, base in regions:
            for m in pat.finditer(seg):
                spans.append(Span(m.group(), "LOCATION", LOCATION_CONFIDENCE,
                                  base + m.start(), base + m.end()))
    # stoplist filter — parity with core/ner.py:403-408
    return [s for s in spans if s.text.lower() not in FALSE_POSITIVE_WORDS]


# --------------------------------------------------------------------------
# backend dispatch seam — parity with the reference's abstract backend
# registry (core/ner.py:29-40): a backend is any callable
# ``text -> list[Span]``.  The rule-based backend above is the default
# (the reference's own offline fallback, core/ner.py:389-396); model
# backends (spaCy/transformers/...) plug in here without touching the
# UDF layer — factories accept either a registered name or a picklable
# callable, which cloudpickle ships to executors in the UDF closure.
def null_backend(text: str) -> list[Span]:
    """Tag nothing (ner.enabled=false in job config): spans and regions
    come out empty while the rest of the pipeline runs unchanged."""
    return []


NER_BACKENDS: dict[str, object] = {"rule": tag_entities, "none": null_backend}


def register_ner_backend(name: str, fn) -> None:
    """Register a backend callable (text -> list[Span]) under a name.

    Note: name-based lookup resolves in the DRIVER process; when passing
    a *name* to a UDF factory the resolved callable travels in the
    closure, so executors never need the registration."""
    NER_BACKENDS[name] = fn


def get_ner_backend(backend) -> object:
    """Resolve a backend: None -> rule default, str -> registry lookup,
    callable -> itself."""
    if backend is None:
        return tag_entities
    if callable(backend):
        return backend
    try:
        return NER_BACKENDS[backend]
    except KeyError:
        raise KeyError(
            f"unknown NER backend {backend!r}; registered: "
            f"{sorted(NER_BACKENDS)}") from None


def attach_block_ids(spans: list[Span], kept_offsets: list[tuple[int, int, int]],
                     text: str = "") -> list[Span]:
    """Assign each span the block_id of the kept block containing its
    start, plus the ±2-kept-block context window around it.

    Replaces the reference's fragile text-equality regroup
    (core/pipeline.py:257-271) / substring containment join
    (core/ner.py:515-520): offsets are carried through the pipeline, so
    this is a deterministic interval lookup, not a fuzzy join.

    `context` is the exact analog of find_context (core/ner.py:505-513):
    the space-joined texts of kept blocks [i-2, i+2] around the span's
    block — except keyed by the carried block index instead of the
    reference's first-line-containing-the-text scan.  Block texts are
    sliced from `text` via kept_offsets (the rendered stream IS the
    kept blocks), so no extra payload rides through the pipeline; with
    the default empty `text`, context stays "" (offset-only callers).
    """
    if not spans:
        return []
    # kept_offsets are ascending, non-overlapping intervals of the
    # rendered stream (cumulative offsets), so the first-match linear
    # scan is equivalent to a bisect on the interval starts — O(log b)
    # per span instead of O(b), which matters for block-heavy pages
    from bisect import bisect_right
    starts = [start for _, start, _ in kept_offsets]
    ctx_cache: dict[int, str] = {}
    out: list[Span] = []
    for s in spans:
        bid = -1
        ctx = ""
        i = bisect_right(starts, s.start) - 1
        if i >= 0:
            block_id, start, end = kept_offsets[i]
            if s.start < end + 1:  # +1 admits the '\n' boundary
                bid = block_id
                if text:
                    ctx = ctx_cache.get(i)
                    if ctx is None:
                        lo = max(0, i - 2)
                        ctx = " ".join(text[b0:b1] for _, b0, b1
                                       in kept_offsets[lo:i + 3])
                        ctx_cache[i] = ctx
        out.append(Span(s.text, s.label, s.confidence, s.start, s.end, bid, ctx))
    return out
