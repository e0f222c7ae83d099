"""Deterministic WebVTT corpus twin for the caption-parse oracle (q81).

Same pattern as the other writer twins: every cue is a closed form of
``(doc_id, k, i)`` so a DuckDB oracle reproduces the PARSED output —
timing arithmetic, span stripping, character-reference decoding, and
multi-line payload joining — in pure SQL without touching a VTT byte.

Closed forms (all arithmetic in integers):

    n_caps(doc_id)       = 1 + doc_id % 2          caption files per doc
    n_cues(doc_id, k)    = 1 + (doc_id + k) % 4
    start_ms(d, k, i)    = 1000*i + 100*((d + 3*k + i) % 7)
    end_ms               = start_ms + 500 + 100*((d + k + 2*i) % 5)
    speaker s            = (d + k + i) % 5
    token t              = (3*d + i) % 9
    parsed text          = 'Line <i> by S<s> tok&<t>'
                           (+ '\\n' + 'cont <i>' when i is odd)

Wire-format coverage the parser must strip/decode to reach that text:
a NOTE block and a STYLE block per file, cue identifiers on even
cues, an hours-less timing line on odd k, a ``<v Speaker N>`` voice
span, a ``<c.cls>`` class span, an inline timestamp tag, and
``&amp;``. The reference repo has no caption surface (sax-wasm is an
XML tokenizer, ``/root/reference/src/sax/parser.rs:1``).
"""

from __future__ import annotations


def vtt_shape(doc_id: int, k: int) -> int:
    """n_cues of caption file ``k``."""
    return 1 + (doc_id + k) % 4


def cue_times(doc_id: int, k: int, i: int) -> tuple[int, int]:
    start = 1000 * i + 100 * ((doc_id + 3 * k + i) % 7)
    return start, start + 500 + 100 * ((doc_id + k + 2 * i) % 5)


def cue_text(doc_id: int, k: int, i: int) -> str:
    """The PARSED (cleaned) text the oracle computes in SQL."""
    s = (doc_id + k + i) % 5
    t = (3 * doc_id + i) % 9
    text = f"Line {i} by S{s} tok&{t}"
    if i % 2:
        text += f"\ncont {i}"
    return text


def _fmt_ts(ms: int, with_hours: bool) -> str:
    h, rem = divmod(ms, 3_600_000)
    m, rem = divmod(rem, 60_000)
    s, frac = divmod(rem, 1000)
    if with_hours:
        return f"{h:02d}:{m:02d}:{s:02d}.{frac:03d}"
    return f"{h * 60 + m:02d}:{s:02d}.{frac:03d}"


def build_vtt(doc_id: int, k: int) -> bytes:
    """Caption file ``k`` of ``doc_id`` — the writer twin."""
    lines = ["WEBVTT - corpus captions", "", "NOTE", f"synthetic doc {doc_id}", ""]
    lines += ["STYLE", "::cue { color: gray }", ""]
    hours = k % 2 == 0
    for i in range(vtt_shape(doc_id, k)):
        start, end = cue_times(doc_id, k, i)
        if i % 2 == 0:
            lines.append(f"cue-{doc_id}-{k}-{i}")
        settings = " align:start" if i % 3 == 0 else ""
        lines.append(
            f"{_fmt_ts(start, hours)} --> {_fmt_ts(end, hours)}{settings}"
        )
        s = (doc_id + k + i) % 5
        t = (3 * doc_id + i) % 9
        lines.append(
            f"<v Speaker {s}>Line {i} by <c.spk>S{s}</c> "
            f"<00:{i:02d}.000>tok&amp;{t}</v>"
        )
        if i % 2:
            lines.append(f"cont {i}")
        lines.append("")
    return "\n".join(lines).encode("utf-8")


# ---------------------------------------------------------------------------
# SubRip twin (q84's mixed-format corpus): same cue-count/timing closed
# forms as the VTT twin, SRT-specific text forms — italic tags stripped,
# literal '&' (SRT has no character references), comma-millisecond
# timing lines, counter-line cue ids, X1-coordinate settings on every
# third cue:
#
#   cue_id  = str(i + 1)
#   settings = 'X1:10' when i % 3 == 0
#   parsed text = 'Sub <i> & S<s>' (+ '\n' + 'more <i>' when i odd),
#                 s = (doc_id + k + i) % 5


def srt_cue_text(doc_id: int, k: int, i: int) -> str:
    s = (doc_id + k + i) % 5
    text = f"Sub {i} & S{s}"
    if i % 2:
        text += f"\nmore {i}"
    return text


def _fmt_srt_ts(ms: int) -> str:
    h, rem = divmod(ms, 3_600_000)
    m, rem = divmod(rem, 60_000)
    s, frac = divmod(rem, 1000)
    return f"{h:02d}:{m:02d}:{s:02d},{frac:03d}"


def build_srt(doc_id: int, k: int) -> bytes:
    """SubRip caption file ``k`` of ``doc_id`` — the writer twin."""
    lines: list[str] = []
    for i in range(vtt_shape(doc_id, k)):
        start, end = cue_times(doc_id, k, i)
        lines.append(str(i + 1))
        settings = " X1:10" if i % 3 == 0 else ""
        lines.append(f"{_fmt_srt_ts(start)} --> {_fmt_srt_ts(end)}{settings}")
        s = (doc_id + k + i) % 5
        lines.append(f"<i>Sub</i> {i} & <font color=\"red\">S{s}</font>")
        if i % 2:
            lines.append(f"more {i}")
        lines.append("")
    return "\n".join(lines).encode("utf-8")
