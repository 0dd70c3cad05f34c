"""Minimal PDF text-object extractor — the PDF/layout-parse seam.

The north rule names "PDF/layout parse" as part of the extraction
surface; no PDF library exists in this sandbox, so this is a minimal,
deterministic extractor covering the two layouts that dominate real
crawls: UNCOMPRESSED text objects (BT ... ET), and — round 5 —
FlateDecode content streams, inflated with stdlib zlib before the same
BT/ET pass (sole-/FlateDecode streams only: filter chains like
ASCII85+Flate and image filters are left untouched and yield no text,
falling through to the placeholder fallback with the limitation
documented).  The production seam would swap in a real parser behind
the same function signature.

Semantics:
  * BT/ET are matched as standalone tokens (\\bBT\\b), so 'ET' inside a
    string literal like (NET gain) does not terminate the text object.
  * Within a text object, ALL strings — literal (...) AND hex <4865>
    (round 5) — are emitted in document order; this covers Tj and TJ
    operands uniformly (the only string operators inside text objects),
    keeps reading order when a page mixes Tj and TJ, and is immune to
    ']' inside literals.  Hex bytes decode through the same latin-1
    shadow as the rest of the document.
  * Escapes follow the PDF spec: named escapes, octal \\ooo with octal
    digits only ('\\8' is a literal '8'), and backslash+other → other.
  * Never raises: any internal error yields ''.
"""

from __future__ import annotations

import re

_BT_ET_RE = re.compile(r"\bBT\b(.*?)\bET\b", re.DOTALL)
# both PDF string forms, matched in document order: literal (...) with
# escapes, and hex <4865...> (ISO 32000 §7.3.4.3 — whitespace allowed
# between digits, odd digit count implies a trailing '0').  '<<' dict
# delimiters cannot match: the char after the first '<' must be a hex
# digit, whitespace, or the closing '>'.
_STR_RE = re.compile(r"\((?:[^()\\]|\\.)*\)|<[0-9A-Fa-f\s]*>")
_OCTAL_DIGITS = "01234567"

_NAMED_ESCAPES = {"n": "\n", "r": "\r", "t": "\t", "b": "\b", "f": "\f",
                  "(": "(", ")": ")", "\\": "\\"}


def _unescape_pdf(s: str) -> str:
    out = []
    i = 0
    n = len(s)
    while i < n:
        c = s[i]
        if c == "\\" and i + 1 < n:
            nxt = s[i + 1]
            mapped = _NAMED_ESCAPES.get(nxt)
            if mapped is not None:
                out.append(mapped)
                i += 2
                continue
            if nxt in _OCTAL_DIGITS:  # octal escape \o, \oo, \ooo
                j = i + 1
                while j < n and j < i + 4 and s[j] in _OCTAL_DIGITS:
                    j += 1
                out.append(chr(int(s[i + 1:j], 8) & 0xFF))
                i = j
                continue
            # PDF spec: reverse solidus before any other char -> that char
            out.append(nxt)
            i += 2
            continue
        out.append(c)
        i += 1
    return "".join(out)


# stream payloads delimited per ISO 32000 §7.3.8: keyword 'stream',
# EOL, data, 'endstream'.  Compressed bytes live in the doc's latin-1
# shadow (spec/decode.py gives PDF payloads a byte-preserving latin-1
# decode), so encode('latin-1') recovers them exactly.
_STREAM_RE = re.compile(r"stream\r?\n(.*?)endstream", re.DOTALL)
# sole-FlateDecode filter declaration: the bare name (a non-array
# /Filter is single by grammar — following tokens like /DecodeParms
# are other dict keys) or a 1-element array; multi-filter chains stay
# untouched — inflating only the first stage of a chain would hand
# garbage to the text pass
_FLATE_RE = re.compile(
    r"/Filter\s*(?:/FlateDecode\b|\[\s*/FlateDecode\s*\])")
# decompression-bomb caps: a 100-byte stream can inflate to gigabytes;
# this runs inside hot extraction tasks
_MAX_INFLATED_STREAM = 8 * 1024 * 1024
_MAX_INFLATED_TOTAL = 64 * 1024 * 1024
# how far back from 'stream' the owning dict can start: fixture dicts
# are tiny, real dicts with font/resource refs fit comfortably
_DICT_LOOKBACK = 512


def _inflate_flate_streams(doc: str) -> str:
    """Rewrite of ``doc`` with every sole-FlateDecode stream body
    replaced by its inflated latin-1 text (so the BT/ET pass reads
    real content operators).  Streams that are not Flate, fail to
    inflate (truncated/corrupt), or blow the bomb caps keep their raw
    segment — which contains no parseable text objects and therefore
    extracts nothing, matching the pre-round-5 behavior.  A document
    with no Flate streams is returned CHARACTER-IDENTICAL, so the
    uncompressed golden corpus is unaffected by construction."""
    import zlib
    out: list[str] = []
    pos = 0
    total = 0
    for m in _STREAM_RE.finditer(doc):
        out.append(doc[pos:m.start()])
        pos = m.end()
        seg = m.group(0)
        head = doc[max(0, m.start() - _DICT_LOOKBACK):m.start()]
        dict_start = head.rfind("<<")
        if dict_start != -1 and _FLATE_RE.search(head[dict_start:]):
            try:
                data = m.group(1).encode("latin-1")
                d = zlib.decompressobj()
                inflated = d.decompress(data, _MAX_INFLATED_STREAM)
                if (d.eof and not d.unconsumed_tail
                        and total + len(inflated) <= _MAX_INFLATED_TOTAL):
                    total += len(inflated)
                    seg = ("stream\n" + inflated.decode("latin-1")
                           + "\nendstream")
            except (zlib.error, UnicodeEncodeError):
                pass
        out.append(seg)
    out.append(doc[pos:])
    return "".join(out)


def extract_pdf_text(doc: str) -> str:
    """Extract text from PDF text objects — uncompressed or inside
    sole-FlateDecode content streams (inflated first); '' if none.
    Never raises."""
    try:
        if "/FlateDecode" in doc:
            doc = _inflate_flate_streams(doc)
        parts: list[str] = []
        for obj in _BT_ET_RE.finditer(doc):
            for m in _STR_RE.finditer(obj.group(1)):
                parts.append(_string_operand_text(m.group(0)))
        return " ".join(p for p in parts if p)
    except Exception:
        return ""


def _escape_pdf_literal(s: str) -> str:
    return (s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)"))


def build_fixture_pdf(texts, compress: bool = True,
                      hex_strings: bool = False) -> bytes:
    """Serialize a minimal well-formed PDF (catalog / pages / page /
    contents, real xref offsets, trailer) whose single content stream
    draws ``texts`` as one Tj line each — Flate-compressed by default,
    raw when ``compress=False``; operands as literal strings by
    default, hex strings when ``hex_strings=True``.  Deterministic for
    fixture corpora; extract_pdf_text must recover
    ``' '.join(texts)`` from every combination."""
    import zlib

    def operand(t: str) -> str:
        if hex_strings:
            return "<" + t.encode("latin-1").hex().upper() + ">"
        return "(" + _escape_pdf_literal(t) + ")"

    content = "".join(
        f"BT /F1 12 Tf 72 {700 - 20 * i} Td "
        f"{operand(t)} Tj ET\n"
        for i, t in enumerate(texts)).encode("latin-1")
    if compress:
        # 'endstream' appearing inside compressed bytes would truncate
        # the non-greedy stream regex; vanishingly unlikely, but the
        # builder must be deterministic-safe, so walk levels until the
        # payload is clean (level 0 is stored: our Tj lines never
        # contain the keyword)
        for level in (6, 9, 1, 0):
            data = zlib.compress(content, level)
            if b"endstream" not in data:
                break
        filt = " /Filter /FlateDecode"
    else:
        data = content
        filt = ""
    objs = [
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n",
        b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n",
        b"3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R "
        b"/MediaBox [0 0 612 792] >> endobj\n",
        (f"4 0 obj << /Length {len(data)}{filt} >>\n".encode("latin-1")
         + b"stream\n" + data + b"\nendstream\nendobj\n"),
    ]
    header = b"%PDF-1.4\n"
    offsets = []
    pos = len(header)
    for o in objs:
        offsets.append(pos)
        pos += len(o)
    xref = (b"xref\n0 5\n0000000000 65535 f \n"
            + b"".join(f"{off:010d} 00000 n \n".encode("latin-1")
                       for off in offsets))
    trailer = (b"trailer << /Size 5 /Root 1 0 R >>\nstartxref\n"
               + str(pos).encode("latin-1") + b"\n%%EOF")
    return header + b"".join(objs) + xref + trailer


_NUM = r"-?\d+(?:\.\d+)?"
# inside a text object, the three position-bearing events in document
# order: Tm (set text matrix absolutely; e/f are the translation), Td /
# TD (translate relative to the previous line origin; TD also sets
# leading, same translation semantics), and string operands
_LAYOUT_RE = re.compile(
    rf"({_NUM})\s+({_NUM})\s+({_NUM})\s+({_NUM})\s+({_NUM})\s+({_NUM})\s+Tm\b"
    rf"|({_NUM})\s+({_NUM})\s+T[dD]\b"
    rf"|\((?:[^()\\]|\\.)*\)|<[0-9A-Fa-f\s]*>",
    re.DOTALL)


def _string_operand_text(s: str) -> str:
    if s[0] == "(":
        return _unescape_pdf(s[1:-1])
    digits = "".join(s[1:-1].split())
    if len(digits) % 2:
        digits += "0"
    return bytes.fromhex(digits).decode("latin-1")


def extract_pdf_layout(doc: str) -> list:
    """Layout-aware extraction: [(x, y, text)] per string operand with
    the text-line origin in effect — ISO 32000 §9.4.2 semantics for the
    operators fixtures and simple real streams use: each BT resets the
    origin to (0, 0); Td/TD translate RELATIVE to the previous line
    origin (cumulative); Tm sets it ABSOLUTELY from the matrix's e/f.
    T*/leading and full-matrix composition are out of scope (the
    production seam — a real layout engine tracks the whole CTM).
    Flate streams are inflated first, like extract_pdf_text.  Never
    raises; [] on any internal error."""
    try:
        if "/FlateDecode" in doc:
            doc = _inflate_flate_streams(doc)
        out: list = []
        for obj in _BT_ET_RE.finditer(doc):
            x = y = 0.0
            for m in _LAYOUT_RE.finditer(obj.group(1)):
                if m.group(1) is not None:       # Tm: absolute e, f
                    x, y = float(m.group(5)), float(m.group(6))
                elif m.group(7) is not None:     # Td/TD: relative
                    x, y = x + float(m.group(7)), y + float(m.group(8))
                else:
                    t = _string_operand_text(m.group(0))
                    if t:
                        out.append((x, y, t))
        return out
    except Exception:
        return []
