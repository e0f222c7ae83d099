"""Deterministic synthetic PDF writer (test/bench corpus only).

``build_pdf(text, variant)`` renders ``text`` into a small but fully
valid PDF 1.4 file whose text round-trips byte-for-byte through
:mod:`sax_wasm_spark.kernel.pdftext` — the closed-form oracle the
``pdf_extract_roundtrip`` query and the pytest suite rely on
(``extract_pdf_text(build_pdf(t, v)) == t`` for any ``t`` free of
control characters other than ``\\n``, any variant).

Variants exercise distinct parser surfaces so one query covers them all:

* 0 — literal-string ``Tj`` per line, uncompressed content stream.
* 1 — same content FlateDecode-compressed, indirect ``/Length``.
* 2 — ``TJ`` arrays: words as alternating literal/hex strings with
  ``-250`` kerning adjustments standing in for inter-word spaces,
  compressed.
* 3 — two content streams (``/Contents`` as an array) split mid-page +
  an incremental-update tail that redefines the info object (exercises
  last-definition-wins).

Non-Latin-1 text is emitted as BOM-tagged UTF-16BE hex strings (the
spec's text-string encoding), so any Unicode round-trips.

Layout constants match the extractor's assembly rules: one text line per
source line, leading 14 pt from y=720, x=72. ``two_column=True`` writes
the SECOND half of the lines first at x=320, then the first half at
x=72 — stream order deliberately scrambled so only a layout-aware
reader reconstructs the original line order.
"""

from __future__ import annotations

import zlib

from ..kernel.pdftext import SPACE_KERN  # noqa: F401  (doc cross-link)

_X0, _X1 = 72, 320
_Y0, _LEAD = 720.0, 14.0


def _lit(s: str) -> bytes:
    """Literal or UTF-16BE-hex string for arbitrary text."""
    try:
        raw = s.encode("latin-1")
    except UnicodeEncodeError:
        return b"<" + (b"\xfe\xff" + s.encode("utf-16-be")).hex().encode() + b">"
    return b"(" + raw.replace(b"\\", rb"\\").replace(b"(", rb"\(").replace(b")", rb"\)") + b")"


def _hex(s: str) -> bytes:
    try:
        raw = s.encode("latin-1")
    except UnicodeEncodeError:
        raw = b"\xfe\xff" + s.encode("utf-16-be")
    return b"<" + raw.hex().encode() + b">"


def _tj_array(line: str) -> bytes:
    """Words as alternating literal/hex strings, spaces as -250 kerns."""
    words = line.split(" ")
    parts = []
    for i, w in enumerate(words):
        if i:
            parts.append(b"-250")
        parts.append(_hex(w) if i % 2 else _lit(w))
    return b"[" + b" ".join(parts) + b"] TJ"


def _content_ops(lines: list[str], variant: int, two_column: bool) -> list[bytes]:
    ops = [b"BT", b"/F1 12 Tf", b"%.1f TL" % _LEAD]
    order: list[tuple[int, float, str]] = []
    if two_column:
        half = (len(lines) + 1) // 2
        for i, ln in enumerate(lines[half:]):
            order.append((_X1, _Y0 - _LEAD * (half + i), ln))
        for i, ln in enumerate(lines[:half]):
            order.append((_X0, _Y0 - _LEAD * i, ln))
    else:
        for i, ln in enumerate(lines):
            order.append((_X0, _Y0 - _LEAD * i, ln))
    for x, y, ln in order:
        ops.append(b"1 0 0 1 %d %.1f Tm" % (x, y))
        if variant == 2:
            ops.append(_tj_array(ln))
        else:
            ops.append(_lit(ln) + b" Tj")
    ops.append(b"ET")
    return ops


def build_pdf(
    text: str,
    variant: int = 0,
    two_column: bool = False,
    lines_per_page: int | None = None,
) -> bytes:
    """Render ``text`` (lines split on \\n) into a deterministic PDF."""
    lines = text.split("\n") if text else [""]
    page_lines: list[list[str]]
    if lines_per_page:
        page_lines = [lines[i : i + lines_per_page] for i in range(0, len(lines), lines_per_page)]
    else:
        page_lines = [lines]

    objs: dict[int, bytes] = {}
    n_pages = len(page_lines)
    kids = b" ".join(b"%d 0 R" % (3 + i) for i in range(n_pages))
    objs[1] = b"<< /Type /Catalog /Pages 2 0 R >>"
    objs[2] = b"<< /Type /Pages /Kids [" + kids + b"] /Count %d >>" % n_pages

    next_num = 3 + n_pages
    font_num = next_num
    objs[font_num] = b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    next_num += 1

    streams: dict[int, tuple[bytes, bytes]] = {}  # num -> (dict, raw)
    for pi, plines in enumerate(page_lines):
        ops = _content_ops(plines, variant, two_column)
        if variant == 3 and len(ops) > 4:
            split = len(ops) // 2
            chunks = [b"\n".join(ops[:split]), b"\n".join(ops[split:])]
        else:
            chunks = [b"\n".join(ops)]
        content_refs = []
        for chunk in chunks:
            num = next_num
            next_num += 1
            content_refs.append(b"%d 0 R" % num)
            if variant in (1, 2):
                raw = zlib.compress(chunk)
                if variant == 1:  # indirect /Length
                    len_num = next_num
                    next_num += 1
                    objs[len_num] = b"%d" % len(raw)
                    sd = b"<< /Length %d 0 R /Filter /FlateDecode >>" % len_num
                else:
                    sd = b"<< /Length %d /Filter /FlateDecode >>" % len(raw)
            else:
                raw = chunk
                sd = b"<< /Length %d >>" % len(raw)
            streams[num] = (sd, raw)
        contents = (
            content_refs[0] if len(content_refs) == 1 else b"[" + b" ".join(content_refs) + b"]"
        )
        objs[3 + pi] = (
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] /Contents "
            + contents
            + b" /Resources << /Font << /F1 %d 0 R >> >> >>" % font_num
        )

    # serialize body
    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets: dict[int, int] = {}
    for num in sorted(set(objs) | set(streams)):
        offsets[num] = len(out)
        if num in streams:
            sd, raw = streams[num]
            out += b"%d 0 obj\n" % num + sd + b"\nstream\n" + raw + b"\nendstream\nendobj\n"
        else:
            out += b"%d 0 obj\n" % num + objs[num] + b"\nendobj\n"

    max_num = max(offsets)
    xref_pos = len(out)
    out += b"xref\n0 %d\n" % (max_num + 1)
    out += b"0000000000 65535 f \n"
    for num in range(1, max_num + 1):
        if num in offsets:
            out += b"%010d 00000 n \n" % offsets[num]
        else:
            out += b"0000000000 65535 f \n"
    out += (
        b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n" % (max_num + 1, xref_pos)
    )

    if variant == 3:
        # incremental update: append a redefinition of an /Info object —
        # both definitions live in the file; readers must take the last.
        info_num = max_num + 1
        out += b"%d 0 obj\n<< /Producer (gen-a) >>\nendobj\n" % info_num
        upd_off = len(out)
        out += b"%d 0 obj\n<< /Producer (gen-b) >>\nendobj\n" % info_num
        out += (
            b"trailer\n<< /Size %d /Root 1 0 R /Prev %d >>\nstartxref\n%d\n%%%%EOF\n"
            % (info_num + 1, xref_pos, upd_off)
        )
    return bytes(out)
