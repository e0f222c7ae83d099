"""Crawl ingestion: WARC shards → pages rows, as a DataFrame operator.

The north rule's input is "an Iceberg table of Common-Crawl-style web
pages" — this operator is how such a table gets POPULATED from what a
crawl actually produces (WARC shards, see sources/warc.py). Layered
exactly like the PDF leg (operators/pdf.py):

* ``warc_to_pages``: (id…, warc:binary) → one row per response record
  (url, warc_date, http_status, content_type, html) via ``mapInArrow``
  — CPU-bound pure-Python record parsing scales with executor cores; a
  poison shard yields a single ``status='error:<Type>'`` row instead of
  killing the task (at crawl scale some shards WILL be truncated).
* ``render_warc_column``: the deterministic synthesis twin used by the
  ``warc_roundtrip`` oracle and tests — no external data.

Scale notes: one input row = one WARC shard (CC shards are ~1 GB; in
production the binary column comes from ``spark.read.format("binaryFile")``
or an Iceberg table of shard blobs). Record explosion happens inside the
Arrow batch, so the shuffle only ever carries the *output* page rows;
downstream stages (extract → filter → dedup) consume these rows exactly
as they consume synthesized pages today.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

WARC_PAGE_FIELDS = [
    StructField("url", StringType(), True),
    StructField("warc_date", StringType(), True),
    StructField("http_status", IntegerType(), True),
    StructField("content_type", StringType(), True),
    StructField("html", BinaryType(), True),
    StructField("status", StringType(), False),
    # malformed records skipped while parsing this row's shard (lenient
    # mode: one junk record must not discard a ~1 GB shard's good pages)
    StructField("n_bad_records", IntegerType(), False),
    # segment records (WARC-Segment-Number / continuation) left
    # UNassembled in this row's shard: complete within-shard chains are
    # reassembled into ordinary pages (ISO 28500 §5.20); chains whose
    # other segments live in another shard are skipped with this count
    StructField("n_segment_records", IntegerType(), False),
]


def warc_to_pages(
    df: DataFrame, warc_col: str = "warc", id_cols: tuple[str, ...] = ("shard_id",)
) -> DataFrame:
    """(id…, warc:binary) → (id…, url, warc_date, http_status,
    content_type, html, status). One output row per response record;
    one error row per unparseable shard."""
    import pyarrow as pa  # noqa: PLC0415

    from pyspark.sql.pandas.types import to_arrow_type  # noqa: PLC0415

    from ..sources.warc import parse_warc_lenient  # noqa: PLC0415

    id_fields = [df.schema[c] for c in id_cols]
    out_schema = StructType(list(id_fields) + WARC_PAGE_FIELDS)
    arrow_fields = [
        pa.field(f.name, to_arrow_type(f.dataType), f.nullable) for f in out_schema.fields
    ]
    arrow_schema = pa.schema(arrow_fields)
    src = df.select(*id_cols, warc_col)
    n_id = len(id_cols)

    def run(batches):
        for rb in batches:
            ids = [rb.column(j).to_pylist() for j in range(n_id)]
            blobs = rb.column(n_id).to_pylist()
            out_ids: list[list] = [[] for _ in range(n_id)]
            urls, dates, statuses, ctypes, htmls, row_status, bad, seg = (
                [], [], [], [], [], [], [], [],
            )

            def emit(r, url, date, status, ctype, html, st, n_bad, n_seg):
                for j in range(n_id):
                    out_ids[j].append(ids[j][r])
                urls.append(url)
                dates.append(date)
                statuses.append(status)
                ctypes.append(ctype)
                htmls.append(html)
                row_status.append(st)
                bad.append(n_bad)
                seg.append(n_seg)

            for r, blob in enumerate(blobs):
                try:
                    pages, n_skipped, n_segmented = parse_warc_lenient(
                        blob if blob is not None else b""
                    )
                except Exception as e:  # wholly unreadable shard → one error row
                    emit(r, None, None, None, None, None,
                         f"error:{type(e).__name__}", 1, 0)
                    continue
                if not pages:
                    # a shard that yields no pages must not vanish: an
                    # auditor reconciling input shards against output
                    # rows needs one row per shard regardless of why it
                    # produced nothing (ADVICE r4 + round-5 review).
                    # 'segmented' = only cross-shard segments, 'empty' =
                    # records skipped, 'no_responses' = a valid shard of
                    # warcinfo/request/metadata records only.
                    if n_segmented and not n_skipped:
                        st = "segmented"
                    elif n_skipped:
                        st = "empty"
                    else:
                        st = "no_responses"
                    emit(r, None, None, None, None, None, st,
                         n_skipped, n_segmented)
                    continue
                for p in pages:
                    emit(
                        r, p.url, p.warc_date, p.status, p.content_type,
                        p.body, "truncated" if p.truncated else "ok",
                        n_skipped, n_segmented,
                    )
            arrays = [
                pa.array(out_ids[j], type=arrow_fields[j].type) for j in range(n_id)
            ] + [
                pa.array(urls, pa.string()),
                pa.array(dates, pa.string()),
                pa.array(statuses, pa.int32()),
                pa.array(ctypes, pa.string()),
                pa.array(htmls, pa.binary()),
                pa.array(row_status, pa.string()),
                pa.array(bad, pa.int32()),
                pa.array(seg, pa.int32()),
            ]
            yield pa.RecordBatch.from_arrays(arrays, schema=arrow_schema)

    return src.mapInArrow(run, schema=out_schema)


def render_warc_column(
    df: DataFrame,
    text_col: str = "text",
    id_cols: tuple[str, ...] = ("doc_id",),
    url_col: str | None = None,
) -> DataFrame:
    """(id…, text) → (id…, warc:binary): one 3-record gzipped WARC file
    per document (warcinfo + request + response — the reader's record
    filtering is always exercised). The response shape cycles
    ``first_id % 6`` (identity / chunked / gzip HTTP bodies, a
    WARC-Truncated record, a lone segment-1 record, and a complete
    reassemblable segment chain — see ``build_warc``); url defaults to a deterministic function of the
    first id. Partitioning-invariant. Oracle twin of warc_to_pages —
    change the cycle in BOTH or the warc_roundtrip oracle breaks."""
    import pyarrow as pa  # noqa: PLC0415

    from pyspark.sql.pandas.types import to_arrow_type  # noqa: PLC0415

    from ..sources.warc import build_warc  # noqa: PLC0415

    id_fields = [df.schema[c] for c in id_cols]
    out_schema = StructType(list(id_fields) + [StructField("warc", BinaryType(), False)])
    arrow_fields = [
        pa.field(f.name, to_arrow_type(f.dataType), f.nullable) for f in out_schema.fields
    ]
    arrow_schema = pa.schema(arrow_fields)
    cols = list(id_cols) + [text_col] + ([url_col] if url_col else [])
    src = df.select(*cols)
    n_id = len(id_cols)

    def run(batches):
        for rb in batches:
            ids = [rb.column(j).to_pylist() for j in range(n_id)]
            texts = rb.column(n_id).to_pylist()
            urls = (
                rb.column(n_id + 1).to_pylist()
                if url_col
                else [f"https://synth.example.com/p/{i}" for i in ids[0]]
            )
            blobs = [
                build_warc(
                    u,
                    "2024-01-01T00:00:00Z",
                    (t if t is not None else "").encode("utf-8"),
                    variant=int(i) % 6,
                )
                for i, u, t in zip(ids[0], urls, texts)
            ]
            arrays = [pa.array(ids[j], type=arrow_fields[j].type) for j in range(n_id)] + [
                pa.array(blobs, pa.binary())
            ]
            yield pa.RecordBatch.from_arrays(arrays, schema=arrow_schema)

    return src.mapInArrow(run, schema=out_schema)
