"""Deterministic DOCX corpus twin for the office-text oracle (q87).

OOXML word processing documents are ZIP archives whose text lives in
``word/document.xml`` (ECMA-376 WordprocessingML): paragraphs are
``<w:p>``, runs ``<w:r>``, text ``<w:t>``, with ``<w:tab/>`` and
``<w:br/>`` as non-text content marks. The writer twin builds REAL
minimal packages ([Content_Types].xml + _rels/.rels + document.xml,
deflate members via kernel/zipread.zip_write) whose extracted text is
a closed form of ``doc_id`` so a DuckDB oracle reproduces it without
touching a ZIP byte.

Closed forms (text of paragraph ``i``, paragraphs joined per-row):

    n_paras(d) = 1 + d % 4
    base(i, d) = 'Para ' || i || ' of doc ' || (d % 1000)
      — split across FOUR <w:t> runs (one bolded, one with
        xml:space="preserve" trailing space) so run concatenation is
        actually exercised;
    i % 2 == 1 → a <w:tab/> + 'tabbed ' || i is appended
      (extracted as '\\t' + …);
    the LAST paragraph appends a <w:br/> + 'after break'
      (extracted as '\\n' + …).

The reference repo has no container surface (sax-wasm is an XML
tokenizer, ``/root/reference/src/sax/parser.rs:1``); this corpus
chains that tokenizer into the OOXML tier.
"""

from __future__ import annotations

from ..kernel.zipread import zip_write

_CONTENT_TYPES = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
    '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
    '<Default Extension="xml" ContentType="application/xml"/>'
    '<Override PartName="/word/document.xml" ContentType="application/vnd.openxmlformats-officedocument.wordprocessingml.document.main+xml"/>'
    "</Types>"
)
_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="word/document.xml"/>'
    "</Relationships>"
)


def n_docx_paras(doc_id: int) -> int:
    return 1 + doc_id % 4


def docx_para_text(doc_id: int, i: int) -> str:
    """The closed-form EXTRACTED text of paragraph ``i``."""
    text = f"Para {i} of doc {doc_id % 1000}"
    if i % 2 == 1:
        text += f"\ttabbed {i}"
    if i == n_docx_paras(doc_id) - 1:
        text += "\nafter break"
    return text


def _para_xml(doc_id: int, i: int) -> str:
    d = doc_id % 1000
    runs = [
        "<w:r><w:t>Para</w:t></w:r>",
        # preserve the leading space (ECMA-376: xml:space required)
        f'<w:r><w:rPr><w:b/></w:rPr><w:t xml:space="preserve"> {i}</w:t></w:r>',
        '<w:r><w:t xml:space="preserve"> of doc </w:t></w:r>',
        f"<w:r><w:t>{d}</w:t></w:r>",
    ]
    if i % 2 == 1:
        runs.append(f'<w:r><w:tab/><w:t xml:space="preserve">tabbed {i}</w:t></w:r>')
    if i == n_docx_paras(doc_id) - 1:
        runs.append('<w:r><w:br/><w:t xml:space="preserve">after break</w:t></w:r>')
    return "<w:p>" + "".join(runs) + "</w:p>"


def docx_document_xml(doc_id: int) -> bytes:
    body = "".join(_para_xml(doc_id, i) for i in range(n_docx_paras(doc_id)))
    return (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<w:document xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main">'
        "<w:body>" + body + "</w:body></w:document>"
    ).encode("utf-8")


def build_docx(doc_id: int) -> bytes:
    """The full OOXML package — the q87 writer twin (odd doc_ids store
    members uncompressed, even deflate, so both ZIP methods cycle)."""
    return zip_write(
        [
            ("[Content_Types].xml", _CONTENT_TYPES.encode()),
            ("_rels/.rels", _RELS.encode()),
            ("word/document.xml", docx_document_xml(doc_id)),
        ],
        deflate=doc_id % 2 == 0,
    )
