"""Stage 1 — preprocess: raw page bytes -> unicode document string.

Web-text analog of the reference's image load + color-space normalize
(ukrainian_ocr/utils/io.py:20-45, core/segmentation.py:80-94): where the
reference turns a file path into a normalized ndarray and returns None on
failure, we turn ``html:binary`` into a str plus a content-type verdict,
and never raise — failures degrade (errors='replace') and are recorded in
the result so the per-row error-capture contract (core/pipeline.py:348-355)
holds downstream.

Charset resolution order (deterministic):
  1. BOM sniff (utf-8-sig / utf-16 le,be)
  2. strict utf-8
  3. declared charset from <meta charset=...> / http-equiv content-type
     (scanned over a latin-1 shadow of the first 2048 bytes)
  4. cp1251 heuristic fallback (Cyrillic web legacy), strict
  5. utf-8 with errors='replace'  -> degraded=True
"""

from __future__ import annotations

import codecs
import re
from dataclasses import dataclass

# content kinds
KIND_HTML = "html"
KIND_PDF = "pdf"
KIND_TEXT = "text"
KIND_BINARY = "binary"

_META_CHARSET_RE = re.compile(
    r"""<meta[^>]+charset\s*=\s*["']?\s*([a-zA-Z0-9_\-]+)""", re.IGNORECASE
)

# canonical names we accept from meta declarations
_KNOWN_CHARSETS = {
    "utf-8", "utf8", "windows-1251", "cp1251", "koi8-r", "koi8-u",
    "iso-8859-1", "latin-1", "latin1", "windows-1252", "cp1252", "ascii",
    "utf-16", "utf-16le", "utf-16be",
}

_TAG_SNIFF_RE = re.compile(
    rb"<\s*(?:!doctype|html|head|body|div|p|a|meta|title|h[1-6]|span|table)\b",
    re.IGNORECASE,
)


@dataclass(frozen=True)
class DecodeResult:
    text: str          # decoded document (may be "" for empty input)
    kind: str          # KIND_* verdict from magic-byte / structure sniff
    charset: str       # charset actually used
    degraded: bool     # True when errors='replace' fallback fired


def _sniff_kind(data: bytes) -> str:
    if data[:5] == b"%PDF-":
        return KIND_PDF
    head = data[:4096]
    if _TAG_SNIFF_RE.search(head):
        return KIND_HTML
    # control-byte ratio on the first KB decides text vs binary
    # (high bytes are NOT evidence of binary — they're normal in utf-8/cp1251)
    sample = head[:1024]
    if not sample:
        return KIND_TEXT
    control = sum(1 for b in sample if b < 32 and b not in (9, 10, 13))
    return KIND_BINARY if control / len(sample) > 0.05 else KIND_TEXT


def _sniff_kind_text(text: str) -> str:
    """Kind sniff over already-decoded text — used for BOM-decoded pages,
    where sniffing the raw bytes would misread UTF-16 HTML as binary
    (interleaved NULs hide the tags and look like control bytes)."""
    if text[:5] == "%PDF-":
        return KIND_PDF
    head = text[:4096]
    if _TAG_SNIFF_TEXT_RE.search(head):
        return KIND_HTML
    sample = head[:1024]
    if not sample:
        return KIND_TEXT
    control = sum(1 for c in sample if ord(c) < 32 and ord(c) not in (9, 10, 13))
    return KIND_BINARY if control / len(sample) > 0.05 else KIND_TEXT


_TAG_SNIFF_TEXT_RE = re.compile(
    r"<\s*(?:!doctype|html|head|body|div|p|a|meta|title|h[1-6]|span|table)\b",
    re.IGNORECASE,
)


def _declared_charset(data: bytes) -> str | None:
    shadow = data[:2048].decode("latin-1", errors="replace")
    m = _META_CHARSET_RE.search(shadow)
    if not m:
        return None
    name = m.group(1).lower()
    if name not in _KNOWN_CHARSETS:
        return None
    try:
        codecs.lookup(name)
    except LookupError:
        return None
    return name


def decode_page(data: bytes) -> DecodeResult:
    """Decode raw page bytes. Never raises."""
    if data is None:
        return DecodeResult("", KIND_TEXT, "utf-8", False)

    # BOM handling FIRST: kind is sniffed on the decoded text, because a
    # raw-byte sniff misclassifies UTF-16 HTML as binary
    if data[:3] == b"\xef\xbb\xbf":
        text = data[3:].decode("utf-8", errors="replace")
        return DecodeResult(text, _sniff_kind_text(text), "utf-8-sig", False)
    if data[:2] == b"\xff\xfe":
        text = data.decode("utf-16-le", errors="replace")[1:]
        return DecodeResult(text, _sniff_kind_text(text), "utf-16-le", False)
    if data[:2] == b"\xfe\xff":
        text = data.decode("utf-16-be", errors="replace")[1:]
        return DecodeResult(text, _sniff_kind_text(text), "utf-16-be", False)

    kind = _sniff_kind(data)

    if kind == KIND_PDF:
        # PDF payloads are parsed byte-wise by spec.pdfmini; give a latin-1
        # shadow so downstream stays str-typed.
        return DecodeResult(data.decode("latin-1", errors="replace"), kind, "latin-1", False)

    try:
        return DecodeResult(data.decode("utf-8", errors="strict"), kind, "utf-8", False)
    except UnicodeDecodeError:
        pass

    declared = _declared_charset(data)
    if declared:
        try:
            return DecodeResult(data.decode(declared, errors="strict"), kind, declared, False)
        except (UnicodeDecodeError, LookupError):
            pass

    # cp1251 never fails byte-wise except on undefined 0x98; try strict
    try:
        return DecodeResult(data.decode("cp1251", errors="strict"), kind, "cp1251", False)
    except UnicodeDecodeError:
        pass

    return DecodeResult(data.decode("utf-8", errors="replace"), kind, "utf-8", True)
