"""Deterministic EPUB corpus twin for the ebook-extraction oracle
(q88).

EPUB (IDPF/W3C) is a ZIP package: a STORED ``mimetype`` member first,
``META-INF/container.xml`` pointing at the OPF package document, and
the OPF's ``<manifest>`` (id → href) + ``<spine>`` (reading order by
idref) resolving to XHTML chapters. The twin makes the indirection
REAL: spine order is ROTATED against manifest order by ``doc_id``, so
a reader that walks the manifest (or the archive) instead of the spine
hash-fails the oracle.

Closed forms:

    n_chapters(d)   = 1 + d % 3
    spine slot s    → chapter id ch<(s + d) % n>   (the rotation)
    chapter j title = 'c<j>'
    chapter j text  = 'Chapter <j> body of doc <d % 1000>'
      (each chapter is a boilerplate-wrapped XHTML page — head/script/
       nav/footer that the main-content classifier must strip, same
       shape as the sax_extract_roundtrip fixture)

The reference repo has no container surface (sax-wasm is an XML
tokenizer, ``/root/reference/src/sax/parser.rs:1``); this corpus
chains that tokenizer through BOTH the package metadata (container +
OPF are parsed by the kernel) and the chapter extraction.
"""

from __future__ import annotations

from ..kernel.zipread import zip_write

_CONTAINER = (
    '<?xml version="1.0" encoding="UTF-8"?>'
    '<container version="1.0"'
    ' xmlns="urn:oasis:names:tc:opendocument:xmlns:container">'
    '<rootfiles><rootfile full-path="OEBPS/content.opf"'
    ' media-type="application/oebps-package+xml"/></rootfiles></container>'
)


def n_chapters(doc_id: int) -> int:
    return 1 + doc_id % 3


def chapter_title(doc_id: int, j: int) -> str:
    return f"c{j}"


def chapter_text(doc_id: int, j: int) -> str:
    return f"Chapter {j} body of doc {doc_id % 1000}"


def spine_chapter(doc_id: int, s: int) -> int:
    """Chapter index occupying spine slot ``s`` — rotated by doc_id."""
    return (s + doc_id) % n_chapters(doc_id)


def chapter_xhtml(doc_id: int, j: int) -> bytes:
    """Boilerplate-wrapped chapter page (classifier strips everything
    but the single <p>)."""
    return (
        "<html><head>"
        '<script src="app.js">var q = 1 &lt; 2;</script>'
        f"<title>{chapter_title(doc_id, j)}</title></head>"
        '<body><nav><a href="/toc">contents</a>'
        '<a href="/next">next</a></nav>'
        f"<p>{chapter_text(doc_id, j)}</p>"
        '<footer><a href="/about">about</a> copyright</footer>'
        "</body></html>"
    ).encode("utf-8")


def content_opf(doc_id: int) -> bytes:
    n = n_chapters(doc_id)
    items = "".join(
        f'<item id="ch{j}" href="ch{j}.xhtml"'
        ' media-type="application/xhtml+xml"/>'
        for j in range(n)
    )
    refs = "".join(
        f'<itemref idref="ch{spine_chapter(doc_id, s)}"/>' for s in range(n)
    )
    return (
        '<?xml version="1.0" encoding="UTF-8"?>'
        '<package xmlns="http://www.idpf.org/2007/opf" version="3.0"'
        ' unique-identifier="uid">'
        "<metadata/>"
        f"<manifest>{items}</manifest>"
        f"<spine>{refs}</spine></package>"
    ).encode("utf-8")


def build_epub(doc_id: int) -> bytes:
    """The full EPUB package — the q88 writer twin. ``mimetype`` is
    STORED and first per spec; everything else deflates."""
    members = [
        ("mimetype", b"application/epub+zip", False),
        ("META-INF/container.xml", _CONTAINER.encode(), True),
        ("OEBPS/content.opf", content_opf(doc_id), True),
    ]
    for j in range(n_chapters(doc_id)):
        members.append((f"OEBPS/ch{j}.xhtml", chapter_xhtml(doc_id, j), True))
    return zip_write(members)
