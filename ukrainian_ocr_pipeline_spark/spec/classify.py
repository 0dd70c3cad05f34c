"""Stage 3 — recognize: per-block main-content classification.

Web-text analog of the reference's TrOCR line recognition
(ukrainian_ocr/core/ocr.py:60-105): where the reference fills
line['text'] and a fixed line['confidence']=0.95 per line
(core/ocr.py:202), we fill Block.is_content and Block.confidence per
block with a deterministic boilerpipe/readability-style rule classifier
(NumWordsRules flavour) over (prev, curr, next) block features.

Rules (applied in order, first hit wins):
  1. boilerplate ancestor (nav/header/footer/aside/form in tag_path) -> drop
  2. link_density > 0.33                                             -> drop
  3. emergency-fallback blocks (level >= 2) keep their sentinel verdict
  4. curr.n_words > 40                                               -> keep
  5. curr.n_words >= 16 and neighbour context wordy                  -> keep
  6. short blocks sandwiched between kept long blocks (headings)     -> keep
  7. otherwise                                                       -> drop

Confidence is a deterministic score in [0,1] derived from the rule that
fired — analog of per-line OCR confidence.
"""

from __future__ import annotations

from .segment import Block, FALLBACK_CHUNK, _BOILER_ANCESTORS

LINK_DENSITY_MAX = 0.33
WORDS_STRONG = 40
WORDS_CONTEXT = 16
HEADING_MAX_WORDS = 12


def _is_boiler_path(tag_path: str) -> bool:
    parts = tag_path.split("/")
    return any(p in _BOILER_ANCESTORS for p in parts)


def _is_heading_path(tag_path: str) -> bool:
    last = tag_path.rsplit("/", 1)[-1]
    return last in ("h1", "h2", "h3", "h4", "h5", "h6")


def classify_blocks(blocks: list[Block]) -> list[Block]:
    """Mutates and returns blocks with is_content / confidence filled.

    Two deterministic passes: core keep/drop on local features, then a
    heading-rescue pass that needs the core verdict of the next block.
    """
    n = len(blocks)
    for i, b in enumerate(blocks):
        if b.fallback_level >= FALLBACK_CHUNK:
            # sentinel verdict assigned at segmentation (0.3 / 0.1)
            continue
        if b.tag_path == "(pdf)":
            # PDF text chunks have no link/boiler structure for the HTML
            # rules to score: they keep the segmenter's verdict (0.9) —
            # re-scoring by word count wrongly drops short PDFs entirely
            continue
        prev_w = blocks[i - 1].n_words if i > 0 else 0
        next_w = blocks[i + 1].n_words if i + 1 < n else 0
        if _is_boiler_path(b.tag_path):
            b.is_content, b.confidence = False, 0.95
        elif b.link_density > LINK_DENSITY_MAX:
            b.is_content, b.confidence = False, 0.9
        elif b.n_words > WORDS_STRONG:
            b.is_content, b.confidence = True, 0.95
        elif b.n_words >= WORDS_CONTEXT and (prev_w >= WORDS_CONTEXT or next_w >= WORDS_CONTEXT):
            b.is_content, b.confidence = True, 0.8
        else:
            b.is_content, b.confidence = False, 0.6

    # heading rescue: a short low-link heading directly before kept content
    for i, b in enumerate(blocks):
        if (not b.is_content
                and b.fallback_level < FALLBACK_CHUNK
                and _is_heading_path(b.tag_path)
                and not _is_boiler_path(b.tag_path)
                and b.n_words <= HEADING_MAX_WORDS
                and b.link_density <= LINK_DENSITY_MAX
                and i + 1 < n and blocks[i + 1].is_content
                and blocks[i + 1].confidence >= 0.8):
            b.is_content, b.confidence = True, 0.7
    return blocks
