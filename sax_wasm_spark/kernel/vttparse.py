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
