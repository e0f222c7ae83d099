"""PDF text/layout extraction as a DataFrame operator.

The north rule's extraction pipeline covers "HTML boilerplate strip,
PDF/layout parse, DOM heuristics"; this module is the PDF leg, layered
on the from-scratch parser in :mod:`sax_wasm_spark.kernel.pdftext` the
same way operators/extract.py layers on the SAX kernel:

* CPU-bound pure-Python work runs inside ``mapInArrow`` (one Arrow batch
  in, one out — no pandas object-dtype intermediate), so it scales with
  executor cores exactly like the HTML extract stage and inherits the
  same repartition-before-Python guidance (see queries._wrapped_docs).
* Poison documents (truncated files, unsupported filters, non-PDFs)
  produce a per-row ``status='error:<Type>'`` instead of failing the
  task — at 10^12 documents some WILL be malformed.

``render_pdf_column`` is the synthesis twin (sources/pdfgen.py) used by
tests and the oracle query to materialize a deterministic PDF corpus
from the documents table at small scale; no external data is read.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..kernel.pdftext import PdfDocument, _runs_from_content

PDF_EXTRACT_FIELDS = [
    StructField("text", StringType(), True),
    StructField("n_pages", IntegerType(), False),
    StructField("n_runs", IntegerType(), False),
    StructField("status", StringType(), False),
]


def extract_pdf_document(data: bytes) -> tuple[str | None, int, int, str]:
    """Single document → (text, n_pages, n_runs, status)."""
    from ..kernel.pdftext import _assemble  # noqa: PLC0415

    try:
        doc = PdfDocument(data)
        pages = doc.pages()
        texts = []
        n_runs = 0
        for page in pages:
            fonts = doc.page_fonts(page)
            xobjs = doc.page_xobjects(page)
            runs = _runs_from_content(doc.page_content(page), fonts, xobjs)
            n_runs += len(runs)
            texts.append(_assemble(runs))
        return "\n".join(texts), len(pages), n_runs, "ok"
    except Exception as e:  # defensive: poison docs must not kill the task
        return None, 0, 0, f"error:{type(e).__name__}"


def extract_pdf(
    df: DataFrame, pdf_col: str = "pdf", id_cols: tuple[str, ...] = ("url",)
) -> DataFrame:
    """pages(id…, pdf:binary) → (id…, text, n_pages, n_runs, status)."""
    import pyarrow as pa  # noqa: PLC0415

    from pyspark.sql.pandas.types import to_arrow_type  # noqa: PLC0415

    id_fields = [df.schema[c] for c in id_cols]
    out_schema = StructType(list(id_fields) + PDF_EXTRACT_FIELDS)
    arrow_fields = [
        pa.field(f.name, to_arrow_type(f.dataType), f.nullable) for f in out_schema.fields
    ]
    arrow_schema = pa.schema(arrow_fields)
    src = df.select(*id_cols, pdf_col)
    n_id = len(id_cols)

    def run(batches):
        for rb in batches:
            ids = [rb.column(j).to_pylist() for j in range(n_id)]
            pdfs = rb.column(n_id).to_pylist()
            texts, n_pages, n_runs, status = [], [], [], []
            for data in pdfs:
                t, p, r, s = extract_pdf_document(data if data is not None else b"")
                texts.append(t)
                n_pages.append(p)
                n_runs.append(r)
                status.append(s)
            arrays = [pa.array(ids[j], type=arrow_fields[j].type) for j in range(n_id)] + [
                pa.array(texts, pa.string()),
                pa.array(n_pages, pa.int32()),
                pa.array(n_runs, pa.int32()),
                pa.array(status, pa.string()),
            ]
            yield pa.RecordBatch.from_arrays(arrays, schema=arrow_schema)

    return src.mapInArrow(run, schema=out_schema)


PDF_IMAGE_FIELDS = [
    StructField("page_idx", IntegerType(), False),
    StructField("img_name", StringType(), False),
    StructField("width", IntegerType(), False),
    StructField("height", IntegerType(), False),
    StructField("bpc", IntegerType(), False),
    StructField("filter", StringType(), False),
    StructField("colorspace", StringType(), False),
    StructField("n_bytes", IntegerType(), False),
    # JPEG wire truth for pure-/DCTDecode payloads (SOF frame header,
    # kernel/jpegmeta.py); NULL for every other filter
    StructField("codec_w", IntegerType(), True),
    StructField("codec_h", IntegerType(), True),
    StructField("codec_nc", IntegerType(), True),
    StructField("codec_progressive", IntegerType(), True),
]

PDF_DECODE_FIELDS = [
    StructField("page_idx", IntegerType(), False),
    StructField("img_name", StringType(), False),
    StructField("width", IntegerType(), True),
    StructField("height", IntegerType(), True),
    StructField("n_channels", IntegerType(), True),
    StructField("pixel_sum", LongType(), True),
    StructField("pixel_min", IntegerType(), True),
    StructField("pixel_max", IntegerType(), True),
    StructField("status", StringType(), False),
]

PDF_FIELD_FIELDS = [
    StructField("field_ord", IntegerType(), False),
    StructField("field_name", StringType(), False),
    StructField("field_value", StringType(), False),
]

PDF_OUTLINE_FIELDS = [
    StructField("item_ord", IntegerType(), False),
    StructField("depth", IntegerType(), False),
    StructField("title", StringType(), False),
]


def _per_pdf_rows(
    df: DataFrame,
    pdf_col: str,
    id_cols: tuple[str, ...],
    item_fields: list,
    fn,
) -> DataFrame:
    """Shared explode shape for per-document PDF inventories: ``fn``
    maps one document's bytes to a list of row tuples matching
    ``item_fields``; id columns replicate per row. Poison documents
    contribute zero rows (document-level health is the extract query's
    ``status`` column; inventories are analytics projections)."""
    import pyarrow as pa  # noqa: PLC0415

    from pyspark.sql.pandas.types import to_arrow_type  # noqa: PLC0415

    id_fields = [df.schema[c] for c in id_cols]
    out_schema = StructType(list(id_fields) + item_fields)
    arrow_fields = [
        pa.field(f.name, to_arrow_type(f.dataType), f.nullable) for f in out_schema.fields
    ]
    arrow_schema = pa.schema(arrow_fields)
    src = df.select(*id_cols, pdf_col)
    n_id = len(id_cols)

    def run(batches):
        for rb in batches:
            ids = [rb.column(j).to_pylist() for j in range(n_id)]
            pdfs = rb.column(n_id).to_pylist()
            out_ids: list[list] = [[] for _ in range(n_id)]
            cols: list[list] = [[] for _ in item_fields]
            for row, data in enumerate(pdfs):
                try:
                    recs = fn(data if data is not None else b"")
                except Exception:  # poison doc → zero inventory rows
                    continue
                for rec in recs:
                    for j in range(n_id):
                        out_ids[j].append(ids[j][row])
                    for c, v in zip(cols, rec):
                        c.append(v)
            arrays = [
                pa.array(out_ids[j], type=arrow_fields[j].type) for j in range(n_id)
            ] + [
                pa.array(cols[k], type=arrow_fields[n_id + k].type)
                for k in range(len(item_fields))
            ]
            yield pa.RecordBatch.from_arrays(arrays, schema=arrow_schema)

    return src.mapInArrow(run, schema=out_schema)


def pdf_images(
    df: DataFrame, pdf_col: str = "pdf", id_cols: tuple[str, ...] = ("doc_id",)
) -> DataFrame:
    """pages(id…, pdf:binary) → one row per image XObject reachable
    from any page (incl. images inside nested form XObjects): (id…,
    page_idx, img_name, width, height, bpc, filter, colorspace,
    n_bytes). Metadata only — sample streams stay encoded, so the
    operator needs no image codec and its cost is the object-layer
    parse it shares with text extraction."""
    from ..kernel.pdftext import pdf_image_stats  # noqa: PLC0415

    return _per_pdf_rows(df, pdf_col, id_cols, PDF_IMAGE_FIELDS, pdf_image_stats)


def pdf_decode_images(
    df: DataFrame, pdf_col: str = "pdf", id_cols: tuple[str, ...] = ("doc_id",)
) -> DataFrame:
    """pages(id…, pdf:binary) → one row per image XObject with REAL
    pixel decode for /DCTDecode payloads (from-scratch baseline JPEG
    codec, kernel/jpegcodec.py — prefix filters like Flate+DCT applied
    first): (id…, page_idx, img_name, width, height, n_channels,
    pixel_sum, pixel_min, pixel_max, status). Codec facts, not dict
    claims; non-DCT images are ``skip:*`` rows and poison payloads
    ``error:*`` rows. Per-row CPU inside Arrow batches, zero shuffle —
    the 100-TB decode-stage shape, and under the §7.6 encrypting
    variants it proves decode-under-encryption end to end."""
    from ..kernel.pdftext import pdf_decode_image_stats  # noqa: PLC0415

    return _per_pdf_rows(df, pdf_col, id_cols, PDF_DECODE_FIELDS, pdf_decode_image_stats)


def pdf_form_fields(
    df: DataFrame, pdf_col: str = "pdf", id_cols: tuple[str, ...] = ("doc_id",)
) -> DataFrame:
    """pages(id…, pdf:binary) → one row per terminal AcroForm field:
    (id…, field_ord, field_name, field_value) in tree order — the
    filled-form text surface (§12.7) real crawls extract alongside
    body text; values decode as TEXT strings (and decrypt
    transparently under the §7.6 handlers)."""
    from ..kernel.pdftext import PdfDocument  # noqa: PLC0415

    def fn(data: bytes):
        fields = PdfDocument(data).form_fields()
        return [(i, n, v) for i, (n, v) in enumerate(fields)]

    return _per_pdf_rows(df, pdf_col, id_cols, PDF_FIELD_FIELDS, fn)


def pdf_outline(
    df: DataFrame, pdf_col: str = "pdf", id_cols: tuple[str, ...] = ("doc_id",)
) -> DataFrame:
    """pages(id…, pdf:binary) → one row per outline item (§12.3.3
    bookmarks) in reading order: (id…, item_ord, depth, title)."""
    from ..kernel.pdftext import PdfDocument  # noqa: PLC0415

    def fn(data: bytes):
        items = PdfDocument(data).outline_titles()
        return [(i, d, t) for i, (d, t) in enumerate(items)]

    return _per_pdf_rows(df, pdf_col, id_cols, PDF_OUTLINE_FIELDS, fn)


def render_pdf_column(
    df: DataFrame,
    text_col: str = "text",
    id_cols: tuple[str, ...] = ("doc_id",),
    variant_col: str | None = None,
    images_col: str | None = None,
    fields_col: str | None = None,
    outline_col: str | None = None,
    real_images_col: str | None = None,
) -> DataFrame:
    """(id…, text) → (id…, pdf:binary). Deterministic synthesis — the
    variant defaults to ``first_id % N_VARIANTS`` so the corpus exercises
    every generator/parser surface (uncompressed, flate+indirect-length,
    TJ/hex, split streams+incremental update, LZW, ToUnicode CID);
    identical regardless of partitioning. ``images_col`` (int) embeds
    that many deterministic image XObjects per page (q58's inventory
    corpus); 0/absent keeps the text-only corpus byte-identical."""
    import pyarrow as pa  # noqa: PLC0415

    from pyspark.sql.pandas.types import to_arrow_type  # noqa: PLC0415

    from ..sources.pdfgen import N_VARIANTS, build_pdf  # noqa: PLC0415

    id_fields = [df.schema[c] for c in id_cols]
    out_schema = StructType(list(id_fields) + [StructField("pdf", BinaryType(), False)])
    arrow_fields = [
        pa.field(f.name, to_arrow_type(f.dataType), f.nullable) for f in out_schema.fields
    ]
    arrow_schema = pa.schema(arrow_fields)
    extra_cols = [
        c
        for c in (variant_col, images_col, fields_col, outline_col, real_images_col)
        if c
    ]
    cols = list(id_cols) + [text_col] + extra_cols
    src = df.select(*cols)
    n_id = len(id_cols)

    def run(batches):
        for rb in batches:
            ids = [rb.column(j).to_pylist() for j in range(n_id)]
            texts = rb.column(n_id).to_pylist()
            col = n_id + 1
            extras: dict[str, list] = {}
            for name in (
                variant_col, images_col, fields_col, outline_col, real_images_col
            ):
                if name:
                    extras[name] = rb.column(col).to_pylist()
                    col += 1
            zero = [0] * len(texts)
            variants = (
                extras[variant_col]
                if variant_col
                else [int(i) % N_VARIANTS for i in ids[0]]
            )
            images = extras[images_col] if images_col else zero
            fields = extras[fields_col] if fields_col else zero
            outlines = extras[outline_col] if outline_col else zero
            real_imgs = extras[real_images_col] if real_images_col else zero
            pdfs = [
                build_pdf(
                    t if t is not None else "",
                    variant=int(v) % N_VARIANTS,
                    n_images=int(ni or 0),
                    n_fields=int(nf or 0),
                    n_outline=int(no or 0),
                    n_real_images=int(nr or 0),
                )
                for t, v, ni, nf, no, nr in zip(
                    texts, variants, images, fields, outlines, real_imgs
                )
            ]
            arrays = [pa.array(ids[j], type=arrow_fields[j].type) for j in range(n_id)] + [
                pa.array(pdfs, pa.binary())
            ]
            yield pa.RecordBatch.from_arrays(arrays, schema=arrow_schema)

    return src.mapInArrow(run, schema=out_schema)
