"""Stage 6 — export: kept blocks -> the byte-identical extracted text.

Web-text analog of the reference's ALTO XML serializer
(ukrainian_ocr/core/pipeline.py:410-542): where the reference emits an
ALTO v4 tree with TextLine elements in reading order, we emit a plain
string — kept blocks, document order, joined by a single '\n', no
trailing newline.  This string is the payload the north rule requires to
be byte-identical per url between the Spark job and the oracle, so:

  * explicit '\n' join (no platform line endings)
  * no float formatting, no locale, no pretty-printing nondeterminism
    (the reference's minidom toprettyxml is exactly the kind of
    nondeterminism we avoid)
  * block order is pinned by block_id (char-offset order), never by
    arrival order of a distributed shuffle
"""

from __future__ import annotations

from .segment import Block


def render_text(blocks: list[Block]) -> tuple[str, list[tuple[int, int, int]]]:
    """Render kept blocks to the final extracted text.

    Returns (extracted_text, kept_offsets) where kept_offsets[i] =
    (block_id, start, end) gives each kept block's char span *inside the
    extracted text* (the geometry analog of the reference's per-line bbox,
    re-based onto the rendered stream).
    """
    kept = sorted((b for b in blocks if b.is_content), key=lambda b: b.block_id)
    parts: list[str] = []
    offsets: list[tuple[int, int, int]] = []
    pos = 0
    for b in kept:
        start = pos
        parts.append(b.text)
        pos += len(b.text)
        offsets.append((b.block_id, start, pos))
        pos += 1  # the '\n' separator
    return "\n".join(parts), offsets
