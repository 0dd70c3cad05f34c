"""Stage 2 — segment: document string -> ordered content blocks.

Web-text analog of Kraken line segmentation
(ukrainian_ocr/core/segmentation.py:63-175): where the reference produces
line dicts {id, baseline, polygon, bbox} from an image, we produce Block
records {block_id, start, end, tag_path, text, densities} from HTML.
Char offsets (start/end into the concatenated block text stream) replace
bbox/polygon geometry.

Fallback ladder mirrors core/segmentation.py:344-407 (kraken -> CPU retry
-> conservative retry -> emergency horizontal strips -> placeholder):

  level 0  html.parser structural segmentation        (confidence from classifier)
  level 1  tolerant re-parse after tag-soup scrubbing (confidence capped later)
  level 2  fixed-size text chunking, sentinel 0.3     (core/segmentation.py:388)
  level 3  single placeholder block, sentinel 0.1     (core/segmentation.py:406)

Determinism: block order is document order; whitespace runs collapse to
single spaces via _norm_ws (join/split — byte-identical to the regex
form, property-pinned); no dict-iteration-order or locale dependence
anywhere.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from html import unescape

FALLBACK_NONE = 0
FALLBACK_TOLERANT = 1
FALLBACK_CHUNK = 2
FALLBACK_PLACEHOLDER = 3

# sentinel confidences carried by emergency-fallback blocks, mirroring the
# reference's 0.3 / 0.1 at core/segmentation.py:388,406
CHUNK_CONFIDENCE = 0.3
PLACEHOLDER_CONFIDENCE = 0.1

# tags whose subtree never contributes text
_SKIP_SUBTREE = {"script", "style", "noscript", "template", "svg", "head", "iframe"}

# tags that open/close a text block
_BLOCK_TAGS = {
    "p", "div", "h1", "h2", "h3", "h4", "h5", "h6", "li", "td", "th",
    "article", "section", "nav", "header", "footer", "aside", "main",
    "blockquote", "pre", "figure", "figcaption", "ul", "ol", "table",
    "tr", "form", "dd", "dt", "caption", "summary", "details", "body",
}

# semantic ancestors recorded in tag_path that the classifier treats as
# boilerplate containers
_BOILER_ANCESTORS = ("nav", "header", "footer", "aside", "form")

def _norm_ws(s: str) -> str:
    """Collapse whitespace runs to single spaces and strip the ends —
    byte-identical to ``re.sub(r"\\s+", " ", s).strip()`` (CPython
    implements ``\\s`` for str via the same Py_UNICODE_ISSPACE
    predicate str.split() uses) but ~3.4x faster, and this is the
    hottest string op in the whole extraction path (every block finish
    + every in-anchor text token).  Equivalence pinned by property test
    including \\x1c-\\x1f / NBSP / \\x85 edge cases."""
    return " ".join(s.split())


_WORD_RE = re.compile(r"\S+")

# tag-soup scrubbers for the tolerant re-parse (level 1)
_BROKEN_TAG_RE = re.compile(r"<[^>]*$")            # unterminated trailing tag
_NULS_RE = re.compile("\x00")
# skip-subtree spans, for the "page has no real text" check (a script-only
# page must yield a clean empty result, not chunked JavaScript)
_SKIP_SPAN_RE = re.compile(
    r"<(script|style|noscript|template|svg|iframe)\b.*?(?:</\1\s*>|$)"
    # head mirrors _SKIP_CLOSE_RE["head"]: stop at </head> or (zero-width)
    # at <body> — but NOT at EOF.  An unterminated <head> with no <body>
    # swallows real content in the structural parse; the check must see
    # that content so the page reaches the tolerant/chunk fallback instead
    # of being classified clean-empty.
    r"|<head\b.*?(?:</head\s*>|(?=<body[\s>]))",
    re.IGNORECASE | re.DOTALL)  # |$: an unterminated <script> swallows to
                                # EOF, matching the parser's skip-to-close
                                # behavior — else truncated-crawl JS leaks
                                # into the level-2 chunk fallback as "text"
_CHUNK_SIZE = 2000  # chars per emergency chunk (level 2)


@dataclass
class Block:
    block_id: int
    start: int               # char offset into the block text stream
    end: int
    tag_path: str            # e.g. "body/div/p"
    text: str                # whitespace-normalized block text
    n_words: int
    n_chars: int
    link_chars: int          # chars inside <a> within the block
    text_density: float      # words per 80-char wrapped line (boilerpipe-style)
    link_density: float      # link_chars / n_chars
    fallback_level: int = FALLBACK_NONE
    # filled by classify stage:
    is_content: bool = False
    confidence: float = 0.0


def _finish(raw_parts: list[str],
            link_chars: int) -> tuple[str, int, int, int, float, float] | None:
    text = _norm_ws(unescape("".join(raw_parts)))
    if not text:
        return None
    n_chars = len(text)
    # text is whitespace-normalized (single spaces, stripped), so words are
    # exactly space-count + 1 — identical to len(_WORD_RE.findall(text))
    n_words = text.count(" ") + 1
    link_chars = min(link_chars, n_chars)
    wrapped_lines = max(1, -(-n_chars // 80))  # ceil
    text_density = n_words / wrapped_lines
    link_density = link_chars / n_chars
    return (text, n_words, n_chars, link_chars, text_density, link_density)


# single-pass HTML markup scanner (replaces html.parser in the hot path —
# measured ~3x faster; html.parser spends most time in per-callback
# dispatch).  Only consulted at '<' positions — text runs take the
# doc.find fast path in feed().  Token kinds: comment/cdata/doctype/PI,
# end tag, start tag, stray '<'.
_HTML_TOKEN_RE = re.compile(
    r"<!--.*?(?:-->|$)"                                  # comment
    r"|<!\[CDATA\[.*?(?:\]\]>|$)"                        # cdata
    r"|<![^>]*>"                                         # doctype/decl
    r"|<\?[^>]*>"                                        # processing instr
    r"|</\s*([a-zA-Z][a-zA-Z0-9\-]*)[^>]*>"              # end tag -> g1
    r"|<([a-zA-Z][a-zA-Z0-9\-]*)"                        # start tag -> g2
    r"((?:\"[^\"]*\"|'[^']*'|[^>\"'])*)(/?)>"            #   attrs g3, self g4
    r"|<",                                               # stray '<'
    re.DOTALL,
)

# per-tag "scan directly to the closing tag" patterns for raw-text /
# skipped subtrees (script can't nest; browsers do the same)
_SKIP_CLOSE_RE = {
    t: re.compile(rf"</\s*{t}[^>]*>", re.IGNORECASE) for t in _SKIP_SUBTREE
}
# a page missing </head> must not swallow its body: also stop (zero-width)
# at the <body> tag
_SKIP_CLOSE_RE["head"] = re.compile(r"</\s*head[^>]*>|(?=<body[\s>])", re.IGNORECASE)


class _BlockParser:
    """Single-pass segmenter: emits a Block at every block-tag boundary."""

    def __init__(self, fallback_level: int = FALLBACK_NONE):
        self.blocks: list[Block] = []
        self._parts: list[str] = []
        self._link_chars = 0
        self._skip_depth = 0
        self._anchor_depth = 0
        self._stack: list[str] = []
        self._offset = 0
        self._fallback = fallback_level

    # -- block lifecycle -------------------------------------------------
    def _flush(self):
        if not self._parts:
            self._link_chars = 0
            return
        fin = _finish(self._parts, self._link_chars)
        self._parts = []
        self._link_chars = 0
        if fin is None:
            return
        text, n_words, n_chars, link_chars, td, ld = fin
        start = self._offset
        end = start + n_chars
        self._offset = end + 1  # +1 for the '\n' separator in the rendered stream
        self.blocks.append(Block(
            block_id=len(self.blocks), start=start, end=end,
            tag_path=self._path(), text=text, n_words=n_words,
            n_chars=n_chars, link_chars=link_chars,
            text_density=td, link_density=ld,
            fallback_level=self._fallback,
        ))

    def _path(self) -> str:
        sem = [t for t in self._stack if t in _BLOCK_TAGS or t in _SKIP_SUBTREE or t == "a"]
        if not sem:
            return ""
        keep = sem[-4:]
        # never truncate away a boilerplate ancestor: the classifier's
        # drop rule keys on nav/header/footer/aside/form appearing in the
        # path, and deep nesting (nav>table>tr>td>p) must not escape it
        for t in sem[:-4]:
            if t in _BOILER_ANCESTORS:
                keep = [t] + keep
                break
        return "/".join(keep)

    # -- token loop --------------------------------------------------------
    def feed(self, doc: str):
        """Anchored token scan. Skip-subtree tags (script/style/head/...)
        jump straight to their closing tag — emitting nothing — which
        matches browser raw-text element semantics and avoids per-token
        state checks."""
        pos, n = 0, len(doc)
        parts = self._parts
        while pos < n:
            # text-run fast path: equivalent to the regex's [^<]+ branch
            # (a text token runs exactly to the next '<' or end of doc)
            if doc[pos] != "<":
                nxt = doc.find("<", pos)
                if nxt == -1:
                    nxt = n
                tok = doc[pos:nxt]
                parts.append(tok)
                if self._anchor_depth:
                    self._link_chars += len(_norm_ws(unescape(tok)))
                pos = nxt
                continue
            m = _HTML_TOKEN_RE.match(doc, pos)
            tok_end = m.end()
            start_name = m.group(2)
            if start_name is not None:
                tag = start_name.lower()
                if m.group(4):  # self-closing: only <br/> contributes
                    if tag == "br":
                        parts.append(" ")
                elif tag in _SKIP_SUBTREE:
                    c = _SKIP_CLOSE_RE[tag].search(doc, tok_end)
                    pos = c.end() if c else n
                    continue
                else:
                    if tag in _BLOCK_TAGS:
                        self._flush()
                        parts = self._parts
                    if tag == "a":
                        self._anchor_depth += 1
                    elif tag == "br":
                        parts.append(" ")
                    self._stack.append(tag)
                pos = tok_end
                continue
            end_name = m.group(1)
            if end_name is not None:
                tag = end_name.lower()
                if tag in _BLOCK_TAGS:
                    # flush BEFORE popping: tag_path includes the block tag
                    self._flush()
                    parts = self._parts
                self._pop(tag)
                if tag == "a" and self._anchor_depth:
                    self._anchor_depth -= 1
                pos = tok_end
                continue
            if m.group(0) == "<":
                # stray '<' kept as text, like html.parser soup
                parts.append("<")
                if self._anchor_depth:
                    self._link_chars += 1
            # comments / doctype / PI / CDATA: dropped
            pos = tok_end

    def _pop(self, tag):
        # pop the nearest matching open tag (tolerant of tag soup)
        for i in range(len(self._stack) - 1, -1, -1):
            if self._stack[i] == tag:
                del self._stack[i]
                break

    def close(self):
        self._flush()


def _chunk_blocks(text: str, level: int, confidence: float) -> list[Block]:
    """Emergency fixed-size chunking (level 2/3), mirroring the reference's
    horizontal-strip fallback at core/segmentation.py:344-407."""
    clean = _norm_ws(text)
    blocks: list[Block] = []
    offset = 0
    if not clean:
        return blocks
    for i in range(0, len(clean), _CHUNK_SIZE):
        chunk = clean[i:i + _CHUNK_SIZE].strip()
        if not chunk:
            continue
        n_chars = len(chunk)
        n_words = chunk.count(" ") + 1  # chunk is normalized + stripped
        wrapped = max(1, -(-n_chars // 80))
        blocks.append(Block(
            block_id=len(blocks), start=offset, end=offset + n_chars,
            tag_path="(chunk)", text=chunk, n_words=n_words, n_chars=n_chars,
            link_chars=0, text_density=n_words / wrapped, link_density=0.0,
            fallback_level=level, is_content=True, confidence=confidence,
        ))
        offset += n_chars + 1
    return blocks


def segment_blocks(doc: str, kind: str = "html") -> tuple[list[Block], int]:
    """Segment a decoded document into blocks.

    Returns (blocks, fallback_level). Never raises.
    """
    if doc is None or not doc.strip():
        return [], FALLBACK_NONE

    if kind == "pdf":
        from .pdfmini import extract_pdf_text
        txt = extract_pdf_text(doc)
        if txt.strip():
            blocks = _chunk_blocks(txt, FALLBACK_NONE, 0.9)
            for b in blocks:
                b.tag_path = "(pdf)"
            return blocks, FALLBACK_NONE
        return _chunk_blocks(doc, FALLBACK_PLACEHOLDER, PLACEHOLDER_CONFIDENCE)[:1], FALLBACK_PLACEHOLDER

    if kind in ("text", "binary"):
        level = FALLBACK_CHUNK if kind == "text" else FALLBACK_PLACEHOLDER
        conf = CHUNK_CONFIDENCE if kind == "text" else PLACEHOLDER_CONFIDENCE
        blocks = _chunk_blocks(doc, level, conf)
        if level == FALLBACK_PLACEHOLDER:
            blocks = blocks[:1]
        return blocks, level

    # level 0: structural parse
    try:
        p = _BlockParser(FALLBACK_NONE)
        p.feed(doc)
        p.close()
        if p.blocks:
            return p.blocks, FALLBACK_NONE
        # parse succeeded and the page genuinely has no text (e.g. empty
        # <body>, or script/style-only): a valid empty result, not a
        # fallback case
        visible = re.sub(r"<[^>]*>", " ", _SKIP_SPAN_RE.sub(" ", doc))
        if not _norm_ws(unescape(visible)):
            return [], FALLBACK_NONE
    except Exception:
        pass

    # level 1: tolerant re-parse after scrubbing
    try:
        scrubbed = _NULS_RE.sub("", _BROKEN_TAG_RE.sub("", doc))
        p = _BlockParser(FALLBACK_TOLERANT)
        p.feed(scrubbed)
        p.close()
        if p.blocks:
            return p.blocks, FALLBACK_TOLERANT
    except Exception:
        pass

    # level 2: strip tags crudely, chunk
    try:
        stripped = re.sub(r"<[^>]*>", " ", doc)
        blocks = _chunk_blocks(unescape(stripped), FALLBACK_CHUNK, CHUNK_CONFIDENCE)
        if blocks:
            return blocks, FALLBACK_CHUNK
    except Exception:
        pass

    # level 3: single placeholder
    blocks = _chunk_blocks(doc[:_CHUNK_SIZE], FALLBACK_PLACEHOLDER, PLACEHOLDER_CONFIDENCE)[:1]
    return blocks, FALLBACK_PLACEHOLDER
