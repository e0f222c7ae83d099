"""WebVTT caption parser — from-scratch per the W3C WebVTT spec
(https://www.w3.org/TR/webvtt1/): the caption/subtitle side of the
multimodal tier, pairing timed text with the video documents a crawl
carries (q81). The reference repo has no caption surface (sax-wasm is
an XML tokenizer, ``/root/reference/src/sax/parser.rs:1``); this
belongs to the assignment's training-data scope — caption↔video
alignment is a first-class LLM-pipeline signal.

Scope (the crawl-relevant subset, lenient like the HTML kernel):

- ``WEBVTT`` signature (optional BOM, optional trailing text) then
  blocks separated by blank lines.
- Cue blocks: optional identifier line (any line without ``-->``),
  a timing line ``[hh:]mm:ss.mmm --> [hh:]mm:ss.mmm [settings…]``,
  payload lines until the next blank line.
- ``NOTE``/``STYLE``/``REGION`` blocks are skipped per spec.
- Cue-text cleanup: voice/class/ruby/italic/bold/underline/lang spans
  (``<v Speaker>``, ``<c.cls>``, ``<i>``…) and inline timestamps
  (``<00:01.000>``) are stripped to their text content; the five
  WebVTT character references (``&amp; &lt; &gt; &lrm; &rlm;``) plus
  ``&nbsp;`` are decoded. Unknown ``&…;`` sequences pass through
  verbatim (crawl truth beats strictness).

Malformed structure raises typed ``VttError`` so poison payloads
degrade to ``status='error:*'`` rows in the Spark operator; individual
malformed TIMING LINES skip just that cue (the browser behavior —
real-crawl VTT is full of them).
"""

from __future__ import annotations

import re
from dataclasses import dataclass


class VttError(ValueError):
    """Typed failure for payloads that are not WebVTT at all."""


_TS = re.compile(
    r"(?:(\d{1,4}):)?(\d{1,2}):(\d{2})\.(\d{3})"
)
_TIMING = re.compile(
    rf"^\s*((?:\d{{1,4}}:)?\d{{1,2}}:\d{{2}}\.\d{{3}})"
    rf"\s*-->\s*"
    rf"((?:\d{{1,4}}:)?\d{{1,2}}:\d{{2}}\.\d{{3}})"
    rf"(?:[ \t]+(.*))?$"
)
_TAG = re.compile(r"</?(?:v|c|i|b|u|lang|ruby|rt)(?:[.\t ][^>]*)?>|<\d[^>]*>")
_REFS = {
    "&amp;": "&",
    "&lt;": "<",
    "&gt;": ">",
    "&lrm;": "‎",
    "&rlm;": "‏",
    "&nbsp;": " ",
}
_REF_RE = re.compile("|".join(_REFS))


@dataclass
class VttCue:
    cue_id: str | None
    start_ms: int
    end_ms: int
    settings: str | None
    text: str  # cleaned: spans stripped, references decoded


def _parse_ts(s: str) -> int:
    m = _TS.fullmatch(s.strip())
    if m is None:  # caller pre-matched; defensive
        raise VttError(f"bad timestamp {s!r}")
    h = int(m.group(1) or 0)
    return ((h * 60 + int(m.group(2))) * 60 + int(m.group(3))) * 1000 + int(
        m.group(4)
    )


def clean_cue_text(raw: str) -> str:
    """Strip markup spans and inline timestamps, decode the WebVTT
    character references."""
    out = _TAG.sub("", raw)
    return _REF_RE.sub(lambda m: _REFS[m.group(0)], out)


def parse_vtt(data: bytes | str) -> list[VttCue]:
    """Parse a WebVTT file → cues. ``VttError`` when the signature is
    missing; malformed individual cues are skipped (browser policy)."""
    if isinstance(data, (bytes, bytearray, memoryview)):
        text = bytes(data).decode("utf-8", errors="replace")
    else:
        text = data
    if text.startswith("﻿"):
        text = text[1:]
    # normalize newlines per spec (CRLF / CR → LF)
    text = text.replace("\r\n", "\n").replace("\r", "\n")
    if not (text.startswith("WEBVTT") and text[6:7] in ("", "\n", " ", "\t")):
        raise VttError("missing WEBVTT signature")

    cues: list[VttCue] = []
    blocks = re.split(r"\n(?:[ \t]*\n)+", text)  # whitespace-only = blank
    # blocks[0] is the header block (signature + optional header
    # metadata lines); cues always start after the first blank line.
    for block in blocks[1:]:
        lines = list(block.split("\n"))
        # drop leading/trailing empties (EOF newline), skip empty blocks
        while lines and not lines[0].strip():
            lines.pop(0)
        while lines and not lines[-1].strip():
            lines.pop()
        if not lines:
            continue
        head = lines[0]
        # comment/metadata blocks: the keyword alone or followed by
        # whitespace — 'NOTES for scene 1' is a cue IDENTIFIER, not a
        # NOTE block (spec: NOTE then space/tab/EOL)
        kw = head.split(None, 1)[0] if head.strip() else ""
        if kw in ("NOTE", "STYLE", "REGION", "WEBVTT") and (
            head.startswith((kw + " ", kw + "\t")) or head.rstrip() == kw
            or kw == "WEBVTT"
        ):
            continue
        cue_id: str | None = None
        if "-->" not in head:
            cue_id = head.strip()
            lines = lines[1:]
            if not lines:
                continue
        m = _TIMING.match(lines[0])
        if m is None:
            continue  # malformed timing → skip this cue, keep walking
        start, end = _parse_ts(m.group(1)), _parse_ts(m.group(2))
        settings = m.group(3).strip() if m.group(3) else None
        payload = "\n".join(lines[1:])
        cues.append(VttCue(cue_id, start, end, settings, clean_cue_text(payload)))
    return cues


# ---------------------------------------------------------------------------
# SubRip (.srt) — the crawl's OTHER subtitle wire format. No formal
# spec; the de-facto grammar (universally produced/consumed): blocks
# separated by blank lines, each block = counter line, timing line
# ``HH:MM:SS,mmm --> HH:MM:SS,mmm`` (comma millisecond separator, hours
# mandatory), then payload lines. Inline markup is the HTML-ish subset
# (<i> <b> <u> <font …>) — stripped to text; SRT has no character
# references, so '&' is literal.

_SRT_TIMING = re.compile(
    r"^\s*(\d{1,3}):(\d{1,2}):(\d{1,2}),(\d{3})"
    r"\s*-->\s*"
    r"(\d{1,3}):(\d{1,2}):(\d{1,2}),(\d{3})\s*(.*)$"
)
_SRT_TAG = re.compile(r"</?(?:i|b|u|font)(?:\s[^>]*)?>", re.IGNORECASE)


def parse_srt(data: bytes | str) -> list[VttCue]:
    """Parse a SubRip file → the same ``VttCue`` shape the WebVTT
    parser emits (``cue_id`` = the counter line, ``settings`` = any
    trailing text on the timing line, markup stripped). ``VttError``
    when no block parses at all; individual malformed blocks are
    skipped (player behavior)."""
    if isinstance(data, (bytes, bytearray, memoryview)):
        text = bytes(data).decode("utf-8", errors="replace")
    else:
        text = data
    if text.startswith("﻿"):
        text = text[1:]
    text = text.replace("\r\n", "\n").replace("\r", "\n")
    cues: list[VttCue] = []
    for block in re.split(r"\n(?:[ \t]*\n)+", text):
        lines = list(block.split("\n"))
        while lines and not lines[0].strip():
            lines.pop(0)
        while lines and not lines[-1].strip():
            lines.pop()
        if not lines:
            continue
        cue_id: str | None = None
        if _SRT_TIMING.match(lines[0]) is None:
            cue_id = lines[0].strip()
            lines = lines[1:]
            if not lines:
                continue
        m = _SRT_TIMING.match(lines[0])
        if m is None:
            continue  # malformed block → skip, keep walking
        g = [int(x) for x in m.groups()[:8]]
        start = ((g[0] * 60 + g[1]) * 60 + g[2]) * 1000 + g[3]
        end = ((g[4] * 60 + g[5]) * 60 + g[6]) * 1000 + g[7]
        settings = m.group(9).strip() or None
        payload = _SRT_TAG.sub("", "\n".join(lines[1:]))
        cues.append(VttCue(cue_id, start, end, settings, payload))
    if not cues:
        raise VttError("no SubRip cues parsed")
    return cues


def sniff_captions(data: bytes | str) -> str:
    """'vtt' | 'srt' — the crawl arrives with both formats in one
    column. WEBVTT signature wins; otherwise a comma-millisecond
    timing line anywhere in the first KiB marks SubRip."""
    if isinstance(data, (bytes, bytearray, memoryview)):
        head = bytes(data)[:1024].decode("utf-8", errors="replace")
    else:
        head = data[:1024]
    if head.lstrip("﻿").startswith("WEBVTT"):
        return "vtt"
    for ln in head.replace("\r\n", "\n").replace("\r", "\n").split("\n"):
        if _SRT_TIMING.match(ln):
            return "srt"
    return "vtt"  # default: the stricter signature check will reject
