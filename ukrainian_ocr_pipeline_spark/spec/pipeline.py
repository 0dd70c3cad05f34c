"""Per-row extraction pipeline: the composition the oracle and every
Spark UDF share.

Analog of the reference's process_single_image
(ukrainian_ocr/core/pipeline.py:183-355): load -> segment -> recognize ->
export -> entity-tag -> fuzzy-match -> enhance, with per-row error
capture (:348-355) so one bad page never fails a batch/task.

Everything returned is plain Python scalars/lists (Arrow-friendly); no
numpy, no objects — so the same dict renders identically through the
oracle's pandas path and Spark's Arrow path.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from .decode import decode_page
from .segment import segment_blocks, Block
from .classify import classify_blocks
from .render import render_text
from .ner import tag_entities, attach_block_ids, Span
from .lexicon import LexiconMatcher, Match
from .regions import dense_regions, Region


@dataclass
class PageResult:
    url: str
    success: bool
    error: str | None
    extracted_text: str
    blocks: list[Block] = field(default_factory=list)
    spans: list[Span] = field(default_factory=list)
    matches: list[Match] = field(default_factory=list)
    regions: list[Region] = field(default_factory=list)
    # metrics fields — analog of the result record core/pipeline.py:322-346
    kind: str = "html"
    charset: str = "utf-8"
    fallback_level: int = 0
    blocks_detected: int = 0
    blocks_kept: int = 0
    entities: int = 0
    matches_found: int = 0


def extract_page(url: str, html: bytes | None,
                 matcher: LexiconMatcher | None = None,
                 ner=None, with_regions: bool = True) -> PageResult:
    """Run the full extraction spec on one page. Never raises.

    ``ner`` is the backend seam (spec/ner.py NER_BACKENDS): any callable
    text -> list[Span]; None = the rule-based default.  ``with_regions``
    skips the region-clustering pass when the caller will discard it —
    at corpus scale computing-then-filtering is real wasted CPU."""
    try:
        tagger = tag_entities if ner is None else ner
        dec = decode_page(html)
        blocks, fallback_level = segment_blocks(dec.text, dec.kind)
        classify_blocks(blocks)
        text, kept_offsets = render_text(blocks)
        spans = attach_block_ids(tagger(text), kept_offsets, text)
        matches: list[Match] = []
        if matcher is not None and text:
            matches = matcher.find_in_text(text)
        regions = dense_regions(spans, len(text)) if with_regions else []
        return PageResult(
            url=url, success=True, error=None, extracted_text=text,
            blocks=blocks, spans=spans, matches=matches, regions=regions,
            kind=dec.kind, charset=dec.charset, fallback_level=fallback_level,
            blocks_detected=len(blocks),
            blocks_kept=sum(1 for b in blocks if b.is_content),
            entities=len(spans), matches_found=len(matches),
        )
    except Exception as e:  # per-row error capture: core/pipeline.py:348-355
        # kind/charset/fallback_level use the ERROR sentinels the staged
        # mode's segment stage emits, so a failing page carries the same
        # guaranteed-column values in every mode (the dataclass defaults
        # 'html'/'utf-8'/0 would mislabel a page that never decoded)
        return PageResult(
            url=url, success=False, error=f"{type(e).__name__}: {e}",
            extracted_text="", kind="error", charset="",
            fallback_level=-1,
        )
