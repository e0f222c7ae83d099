"""From-scratch WARC/1.0 reader + deterministic writer (stdlib only).

Common-Crawl-style corpora arrive as WARC files (ISO 28500): gzip
members, one per record, each record = CRLF header block + body framed
by ``Content-Length``. A pipeline over "Common-Crawl-style web pages"
(the north rule's input) therefore needs a crawl-ingestion leg that
turns WARC bytes into the pages table. This module is that leg's
kernel, built from the public WARC 1.0 spec and RFC 9112 (HTTP/1.1
message framing) — the reference repo has no counterpart (sax-wasm is
a tokenizer), and no WARC library exists in the container.

Reader scope (``parse_warc``):

* plain or gzip input; multi-member gzip (the Common Crawl layout —
  one member per record) and single-stream gzip both handled;
* record header block parsed case-insensitively; body framed by
  ``Content-Length`` (mandatory per spec) with the trailing CRLFCRLF
  record separator consumed;
* ``WARC-Type: response`` records yield pages; ``revisit`` records
  yield body-less pages naming their referred capture (§6.7.2);
  ``conversion`` records — the entirety of a Common Crawl WET file —
  yield pages whose body is the converted payload directly (§6.8);
  warcinfo / request / metadata records are skipped (but must parse,
  since they share the stream);
* the HTTP response inside a response record is split into status
  line + headers + body; ``Transfer-Encoding: chunked`` is de-chunked
  (RFC 9112 §7.1) and ``Content-Encoding: gzip`` is decompressed —
  both appear constantly in real crawls;
* malformed records raise :class:`WarcError`; the DataFrame operator
  maps that to a per-row error status (poison files never kill a task).

Writer scope (``build_warc``): the deterministic synthesis twin used by
tests and the ``warc_roundtrip`` oracle — per document it emits a
warcinfo record, a request record, and a response record (so the
reader's type filtering is always exercised), each its own gzip member
with ``mtime=0`` for byte-determinism.
"""

from __future__ import annotations

import gzip
import io
import zlib
from typing import NamedTuple

__all__ = [
    "WarcError",
    "WarcPage",
    "build_warc",
    "build_wet",
    "parse_warc",
    "parse_warc_lenient",
    "parse_warc_with_segments",
]

_CRLF = b"\r\n"


class WarcError(ValueError):
    """Input is not parseable as WARC within this module's scope."""


class WarcPage(NamedTuple):
    url: str
    warc_date: str  # ISO-8601 string as recorded (e.g. 2024-01-01T00:00:00Z)
    status: int
    content_type: str  # HTTP Content-Type of the payload ('' if absent)
    body: bytes  # decoded payload (de-chunked, de-gzipped)
    # WARC-Truncated reason ('' = complete): real crawls length-cap big
    # responses and SET this header (ISO 28500 §5.13) — such bodies must
    # not pass silently as complete (VERDICT r4 item 4)
    truncated: str = ""
    # Non-None = this page is a REVISIT record (ISO 28500 §6.7.2): the
    # crawler fetched the url again and the payload matched a previous
    # capture (identical-payload-digest profile — Common Crawl's
    # crawl-level dedup). The value is the referred capture
    # (WARC-Refers-To-Target-URI, else the WARC-Refers-To record id;
    # may be '' when the record declares neither). ``body`` is empty —
    # the payload lives at the referred capture.
    revisit_of: str | None = None
    # True = a §6.8 CONVERSION record: the body is a transformed
    # rendition of another capture (Common Crawl's WET files are
    # entirely conversion records — the extracted text of each page).
    # The block is the converted payload directly, NOT an HTTP
    # message, so http fields are 0/''.
    conversion: bool = False
    # True = a METADATA record (ISO 28500 §6.9): application/warc-fields
    # describing a concurrent capture — Common Crawl ships one per
    # response carrying the page's outlinks and fetch timing, the raw
    # material of crawl-graph and politeness analysis. ``outlinks`` /
    # ``fetch_ms`` hold the parsed fields; ``body`` is empty and http
    # fields are 0/''.
    metadata: bool = False
    outlinks: tuple[str, ...] = ()
    fetch_ms: int | None = None


# ---------------------------------------------------------------------------
# reader


def _gunzip_members(data: bytes) -> bytes:
    """Decompress a possibly multi-member gzip stream (CC layout)."""
    out = bytearray()
    d = zlib.decompressobj(wbits=31)
    buf = data
    try:
        while buf:
            out += d.decompress(buf)
            buf = d.unused_data
            if not d.eof and not buf:
                raise WarcError("truncated gzip stream")
            if buf:
                d = zlib.decompressobj(wbits=31)
    except zlib.error as exc:  # corrupt member / trailing garbage
        raise WarcError(f"bad gzip member: {exc}") from exc
    return bytes(out)


def _parse_headers(block: bytes) -> dict[str, str]:
    """CRLF-separated Name: Value lines, case-insensitive names, with
    obs-fold continuation lines joined (both WARC and HTTP use this
    grammar)."""
    headers: dict[str, str] = {}
    last: str | None = None
    for line in block.split(b"\r\n"):
        if not line:
            continue
        if line[:1] in (b" ", b"\t") and last is not None:
            headers[last] += " " + line.strip().decode("latin-1")
            continue
        name, sep, value = line.partition(b":")
        if not sep:
            raise WarcError(f"malformed header line {line[:40]!r}")
        last = name.strip().decode("latin-1").lower()
        headers[last] = value.strip().decode("latin-1")
    return headers


def _parse_warc_fields(block: bytes) -> list[tuple[str, str]]:
    """application/warc-fields body → ordered (name, value) pairs.
    Same Name: Value grammar as the record headers (ISO 28500 §4), but
    names REPEAT (one ``outlink`` line per discovered link), so this
    returns pairs instead of a dict. Lenient: malformed lines are
    skipped — a metadata block is descriptive, never load-bearing for
    framing."""
    fields: list[tuple[str, str]] = []
    for line in block.split(b"\r\n"):
        if not line:
            continue
        if line[:1] in (b" ", b"\t") and fields:
            name, value = fields[-1]
            fields[-1] = (name, value + " " + line.strip().decode("latin-1"))
            continue
        name, sep, value = line.partition(b":")
        if not sep:
            continue
        fields.append(
            (name.strip().decode("latin-1").lower(),
             value.strip().decode("latin-1"))
        )
    return fields


def _dechunk(body: bytes) -> bytes:
    """RFC 9112 §7.1 chunked transfer decoding (trailers discarded)."""
    out = bytearray()
    pos = 0
    n = len(body)
    while True:
        eol = body.find(_CRLF, pos)
        if eol < 0:
            raise WarcError("chunked: missing size line")
        size_tok = body[pos:eol].split(b";", 1)[0].strip()
        try:
            size = int(size_tok, 16)
        except ValueError as exc:
            raise WarcError(f"chunked: bad size {size_tok[:16]!r}") from exc
        pos = eol + 2
        if size == 0:
            return bytes(out)  # trailers (if any) discarded per scope
        if pos + size > n:
            raise WarcError("chunked: truncated chunk")
        out += body[pos : pos + size]
        pos += size
        if body[pos : pos + 2] != _CRLF:
            raise WarcError("chunked: missing chunk CRLF")
        pos += 2


def _parse_http_response(payload: bytes) -> tuple[int, str, bytes]:
    """(status, content_type, decoded body) from a raw HTTP response."""
    sep = payload.find(b"\r\n\r\n")
    if sep < 0:
        raise WarcError("http: no header/body separator")
    head, body = payload[:sep], payload[sep + 4 :]
    status_line, _, header_block = head.partition(b"\r\n")
    parts = status_line.split(None, 2)
    if len(parts) < 2 or not parts[0].startswith(b"HTTP/"):
        raise WarcError(f"http: bad status line {status_line[:40]!r}")
    try:
        status = int(parts[1])
    except ValueError as exc:
        raise WarcError("http: bad status code") from exc
    headers = _parse_headers(header_block) if header_block else {}
    if "chunked" in headers.get("transfer-encoding", "").lower():
        body = _dechunk(body)
    enc = headers.get("content-encoding", "").lower()
    if enc in ("gzip", "x-gzip"):
        try:
            body = gzip.decompress(body)
        except OSError as exc:
            raise WarcError(f"http: bad gzip body: {exc}") from exc
    elif enc == "deflate":
        # RFC 9112 names the zlib wrapper (RFC 1950), but a long tail
        # of real servers sends raw DEFLATE (RFC 1951) under the same
        # token — try wrapped first, fall back to raw
        try:
            body = zlib.decompress(body)
        except zlib.error:
            try:
                body = zlib.decompress(body, -zlib.MAX_WBITS)
            except zlib.error as exc:
                raise WarcError(f"http: bad deflate body: {exc}") from exc
    elif enc in ("", "identity"):
        pass
    else:
        raise WarcError(f"http: unsupported content-encoding {enc!r}")
    return status, headers.get("content-type", ""), body


def _parse_http_head(block: bytes) -> tuple[int, str]:
    """(status, content_type) from an HTTP header block WITHOUT body
    decoding — for §6.7.2 revisit records, whose block replays the
    original response's headers verbatim but carries NO payload.
    Running the full response parser there is wrong at the root: a
    copied ``Content-Encoding: gzip`` or ``Transfer-Encoding:
    chunked`` header would try to decode the empty body (round-6
    review: gzip.decompress(b"") raises EOFError, which escaped every
    handler and turned one revisit record into a whole-shard error).
    Unparseable heads degrade to (0, '')."""
    head = block.split(b"\r\n\r\n", 1)[0]
    status_line, _, header_block = head.partition(b"\r\n")
    parts = status_line.split(None, 2)
    if len(parts) < 2 or not parts[0].startswith(b"HTTP/"):
        return 0, ""
    try:
        status = int(parts[1])
    except ValueError:
        return 0, ""
    try:
        headers = _parse_headers(header_block) if header_block else {}
    except WarcError:
        return status, ""
    return status, headers.get("content-type", "")


def _parse_records(
    data: bytes, strict: bool
) -> tuple[list[WarcPage], int, int, list[tuple[dict, bytes]]]:
    if data[:2] == b"\x1f\x8b":
        data = _gunzip_members(data)
    if not data.startswith(b"WARC/"):
        raise WarcError("missing WARC/ version line")
    pages: list[WarcPage] = []
    skipped = 0
    segmented = 0
    segment_records: list[tuple[dict, bytes]] = []
    pos = 0
    n = len(data)
    while pos < n:
        rec_start = pos
        try:
            if data[pos : pos + 5] != b"WARC/":
                raise WarcError(f"expected record at byte {pos}")
            head_end = data.find(b"\r\n\r\n", pos)
            if head_end < 0:
                raise WarcError("truncated record header")
            version_line, _, header_block = data[pos:head_end].partition(b"\r\n")
            if not version_line.startswith(b"WARC/1."):
                raise WarcError(f"unsupported version {version_line[:20]!r}")
            headers = _parse_headers(header_block)
            try:
                length = int(headers["content-length"])
            except (KeyError, ValueError) as exc:
                raise WarcError("record missing Content-Length") from exc
            body_start = head_end + 4
            if body_start + length > n:
                raise WarcError("record body exceeds file")
            body = data[body_start : body_start + length]
            pos = body_start + length
            if data[pos : pos + 4] != b"\r\n\r\n":
                raise WarcError("record missing CRLFCRLF separator")
            pos += 4
        except WarcError:
            # framing broken: in lenient mode resync to the next record
            # marker so one junk/truncated record costs one record, not
            # the whole ~1 GB shard (crawl shards contain bad records
            # routinely)
            if strict:
                raise
            skipped += 1
            nxt = data.find(b"WARC/1.", rec_start + 5)
            if nxt < 0:
                break
            pos = nxt
            continue
        warc_type = headers.get("warc-type", "").lower()
        # ISO 28500 segmentation (§5.18-5.20): a response carrying
        # WARC-Segment-Number holds only the FIRST piece of its payload;
        # the rest lives in 'continuation' records. Chains whose every
        # segment is in THIS input are reassembled at EOF (the common
        # same-crawl-file case); incomplete chains — continuation in
        # another shard — are skipped WITH accounting (never emitted as
        # if complete). Strict mode refuses either way: a
        # "round-trippable" single file should not need reassembly.
        if warc_type == "continuation" or (
            warc_type in ("response", "conversion")
            and "warc-segment-number" in headers
        ):
            if strict:
                raise WarcError("segmented record (strict mode)")
            segment_records.append((headers, body))
            continue
        if warc_type == "metadata":
            # §6.9: an application/warc-fields block describing a
            # concurrent capture (CC ships outlinks + fetch timing per
            # response). Parsed into a metadata page instead of skipped:
            # the fields feed crawl-graph/politeness analysis, and
            # silently dropping them would make link topology invisible
            # to an auditor reconciling records against rows.
            fields = _parse_warc_fields(body)
            links = tuple(v for k, v in fields if k == "outlink" and v)
            fetch_ms = None
            for k, v in fields:
                if k == "fetchtimems":
                    try:
                        fetch_ms = int(v)
                    except ValueError:
                        fetch_ms = None
            pages.append(
                WarcPage(
                    url=headers.get("warc-target-uri", ""),
                    warc_date=headers.get("warc-date", ""),
                    status=0,
                    content_type=headers.get("content-type", ""),
                    body=b"",
                    metadata=True,
                    outlinks=links,
                    fetch_ms=fetch_ms,
                )
            )
            continue
        if warc_type == "revisit":
            # §6.7.2: the block carries only the NEW response's HTTP
            # headers (the payload was identical to the referred
            # capture, so it is not re-stored). Surfaced as a body-less
            # page with ``revisit_of`` set — downstream resolves the
            # dedup; dropping these silently would make a crawl's
            # re-fetches vanish from accounting.
            ref = (
                headers.get("warc-refers-to-target-uri")
                or headers.get("warc-refers-to", "")
            ).strip()
            status, ctype = _parse_http_head(body)
            pages.append(
                WarcPage(
                    url=headers.get("warc-target-uri", ""),
                    warc_date=headers.get("warc-date", ""),
                    status=status,
                    content_type=ctype,
                    body=b"",
                    revisit_of=ref,
                )
            )
            continue
        if warc_type == "conversion":
            # §6.8: the block IS the converted payload (WET: text/plain
            # extracted text) — no HTTP envelope to parse. §5.13 allows
            # WARC-Truncated on ANY record: capped converted text must
            # carry the flag exactly like the response path does.
            pages.append(
                WarcPage(
                    url=headers.get("warc-target-uri", ""),
                    warc_date=headers.get("warc-date", ""),
                    status=0,
                    content_type=headers.get("content-type", ""),
                    body=body,
                    truncated=(
                        headers["warc-truncated"].strip().lower() or "unspecified"
                        if "warc-truncated" in headers
                        else ""
                    ),
                    conversion=True,
                )
            )
            continue
        if warc_type == "response":
            truncated = ""
            if "warc-truncated" in headers:
                # header present = payload was cut by the crawler; an
                # empty reason is still a truncation (§5.13)
                truncated = headers["warc-truncated"].strip().lower() or "unspecified"
            try:
                status, ctype, decoded = _parse_http_response(body)
            except WarcError:
                if truncated:
                    # a cut body may break mid-chunk/mid-gzip: salvage
                    # the raw bytes after the HTTP header if present —
                    # flagged rows are for accounting/repair, not text
                    sep = body.find(b"\r\n\r\n")
                    status, ctype, decoded = 0, "", body[sep + 4 :] if sep >= 0 else b""
                elif strict:
                    # framing was fine — skip just this record's payload
                    raise
                else:
                    skipped += 1
                    continue
            pages.append(
                WarcPage(
                    url=headers.get("warc-target-uri", ""),
                    warc_date=headers.get("warc-date", ""),
                    status=status,
                    content_type=ctype,
                    body=decoded,
                    truncated=truncated,
                )
            )
    leftover_segments: list[tuple[dict, bytes]] = []
    if segment_records:
        reassembled, leftover_segments = _reassemble_segments(segment_records)
        segmented += len(leftover_segments)
        for headers, payload in reassembled:
            trunc = (
                headers["warc-truncated"].strip().lower() or "unspecified"
                if "warc-truncated" in headers
                else ""
            )
            if headers.get("warc-type", "").lower() == "conversion":
                # a reassembled conversion chain's payload IS the
                # converted text — no HTTP envelope to parse
                pages.append(
                    WarcPage(
                        url=headers.get("warc-target-uri", ""),
                        warc_date=headers.get("warc-date", ""),
                        status=0,
                        content_type=headers.get("content-type", ""),
                        body=payload,
                        truncated=trunc,
                        conversion=True,
                    )
                )
                continue
            try:
                status, ctype, decoded = _parse_http_response(payload)
            except WarcError:
                skipped += 1
                continue
            pages.append(
                WarcPage(
                    url=headers.get("warc-target-uri", ""),
                    warc_date=headers.get("warc-date", ""),
                    status=status,
                    content_type=ctype,
                    body=decoded,
                    truncated=trunc,
                )
            )
    return pages, skipped, segmented, leftover_segments


def _reassemble_segments(
    records: list[tuple[dict, bytes]],
) -> tuple[list[tuple[dict, bytes]], list[tuple[dict, bytes]]]:
    """Within-input segment reassembly (ISO 28500 §5.20): group the
    stashed segment-1 responses and continuation records by the chain
    id (segment 1's WARC-Record-ID == the continuations'
    WARC-Segment-Origin-ID), and for every chain whose segments
    1..N are all present — N known from the final continuation's
    WARC-Segment-Total-Length, which must equal the concatenated
    length — return (segment-1 headers, joined payload). Returns
    (completed chains in input order, the RECORDS left unassembled —
    their counterpart segments live in another shard; the cross-shard
    stitcher in operators/warc.py consumes these as rows)."""
    chains: dict[str, dict[int, bytes]] = {}
    heads: dict[str, dict] = {}
    totals: dict[str, int] = {}
    order: list[str] = []
    poisoned: set[str] = set()
    rec_lists: dict[str, list[tuple[dict, bytes]]] = {}
    leftover: list[tuple[dict, bytes]] = []
    for headers, body in records:
        try:
            seg_no = int(headers.get("warc-segment-number", ""))
        except ValueError:
            leftover.append((headers, body))
            continue
        is_cont = headers.get("warc-type", "").lower() == "continuation"
        key = (
            headers.get("warc-segment-origin-id", "")
            if is_cont
            else headers.get("warc-record-id", "")
        )
        if not key:
            leftover.append((headers, body))
            continue
        rec_lists.setdefault(key, []).append((headers, body))
        parts = chains.setdefault(key, {})
        if seg_no in parts:
            # duplicate (chain, segment) — e.g. re-crawled records with
            # colliding ids. Which body is right is undecidable here, so
            # the whole chain is poisoned: emitting head A's url with
            # body B would be silent corruption.
            poisoned.add(key)
        parts[seg_no] = body
        # only a RESPONSE record can head a chain — a malformed
        # continuation claiming segment 1 must not masquerade as one
        if not is_cont and seg_no == 1 and key not in heads:
            heads[key] = headers
            order.append(key)
        if "warc-segment-total-length" in headers:
            try:
                totals[key] = int(headers["warc-segment-total-length"])
            except ValueError:
                pass
    done: list[tuple[dict, bytes]] = []
    for key in order:
        parts = chains.pop(key)
        top = max(parts)
        if key not in poisoned and set(parts) == set(range(1, top + 1)) and key in totals:
            payload = b"".join(parts[i] for i in range(1, top + 1))
            if len(payload) == totals[key]:
                done.append((heads[key], payload))
                rec_lists.pop(key)
                continue
        leftover.extend(rec_lists.pop(key))  # RECORDS — duplicates count
    # chains with no segment 1 at all (head in another shard)
    for key in chains:
        leftover.extend(rec_lists[key])
    return done, leftover


def parse_warc(data: bytes) -> list[WarcPage]:
    """Every ``WARC-Type: response`` record of a WARC file as a
    :class:`WarcPage`; other record types are parsed and skipped.
    Strict: the first malformed or segmented record raises (test/oracle
    mode). Truncated responses are returned with their ``truncated``
    reason set — present-but-cut data is data, not an error."""
    return _parse_records(data, strict=True)[0]


def parse_warc_lenient(data: bytes) -> tuple[list[WarcPage], int, int]:
    """(pages, n_skipped, n_segmented): malformed records are skipped
    with a resync to the next ``WARC/1.`` marker instead of aborting
    the shard — the production ingestion mode (operators/warc.py);
    segmented records (see :func:`_parse_records`) are counted
    separately. A wholly unreadable input (bad gzip, no WARC header)
    still raises."""
    pages, skipped, segmented, _ = _parse_records(data, strict=False)
    return pages, skipped, segmented


def parse_warc_with_segments(
    data: bytes,
) -> tuple[list[WarcPage], int, list[tuple[dict, bytes]]]:
    """Lenient parse that SURFACES the unassembled segment records
    instead of just counting them: (pages, n_skipped, leftovers) where
    each leftover is (headers dict, body bytes). Feed the leftovers to
    ``operators.warc.stitch_segments`` to reassemble chains whose
    segments are spread across shards (a shuffle on the chain id —
    the only WARC path that cannot stay shard-local)."""
    pages, skipped, _, leftover = _parse_records(data, strict=False)
    return pages, skipped, leftover


# ---------------------------------------------------------------------------
# deterministic writer (synthesis twin)


def build_wet(
    docs: list[tuple[str, str]],
    date: str = "2024-01-01T00:00:00Z",
    gzipped: bool = True,
) -> bytes:
    """A Common-Crawl-style WET file: one warcinfo record + one
    ``conversion`` record per (url, text) — the extracted-text
    distribution format (each record's block is the plain text, no
    HTTP envelope). Deterministic; each record its own gzip member
    when ``gzipped``."""
    info = _record(
        "warcinfo",
        [("WARC-Record-ID", "<urn:det:wet#info>"), ("WARC-Date", date)],
        b"software: sax-wasm-spark-synth\r\nformat: WARC-WET\r\n",
    )
    records = [info]
    for url, text in docs:
        records.append(
            _record(
                "conversion",
                [
                    ("WARC-Record-ID", f"<urn:det:{url}#wet>"),
                    ("WARC-Date", date),
                    ("WARC-Target-URI", url),
                    ("WARC-Refers-To", f"<urn:det:{url}#resp>"),
                    ("Content-Type", "text/plain"),
                ],
                text.encode("utf-8"),
            )
        )
    if not gzipped:
        return b"".join(records)
    out = io.BytesIO()
    for rec in records:
        out.write(gzip.compress(rec, mtime=0))
    return out.getvalue()


def _record(warc_type: str, headers: list[tuple[str, str]], body: bytes) -> bytes:
    lines = [b"WARC/1.0", b"WARC-Type: " + warc_type.encode()]
    lines += [f"{k}: {v}".encode() for k, v in headers]
    lines.append(b"Content-Length: %d" % len(body))
    return b"\r\n".join(lines) + b"\r\n\r\n" + body + b"\r\n\r\n"


def _http_response(
    body: bytes, content_type: str, variant: int
) -> bytes:
    """variant 0: identity; 1: chunked (two chunks); 2: gzip body;
    6: deflate body (zlib-wrapped for even body lengths, raw DEFLATE
    for odd — both shapes real servers send under the token)."""
    headers = [b"HTTP/1.1 200 OK", b"Content-Type: " + content_type.encode()]
    if variant == 1:
        half = len(body) // 2
        chunks = b""
        for part in (body[:half], body[half:]):
            if part:
                chunks += b"%X\r\n" % len(part) + part + b"\r\n"
        payload = chunks + b"0\r\n\r\n"
        headers.append(b"Transfer-Encoding: chunked")
    elif variant == 2:
        payload = gzip.compress(body, mtime=0)
        headers.append(b"Content-Encoding: gzip")
        headers.append(b"Content-Length: %d" % len(payload))
    elif variant == 6:
        if len(body) % 2 == 0:
            payload = zlib.compress(body)
        else:
            co = zlib.compressobj(wbits=-zlib.MAX_WBITS)
            payload = co.compress(body) + co.flush()
        headers.append(b"Content-Encoding: deflate")
        headers.append(b"Content-Length: %d" % len(payload))
    else:
        payload = body
        headers.append(b"Content-Length: %d" % len(payload))
    return b"\r\n".join(headers) + b"\r\n\r\n" + payload


def build_warc(
    url: str,
    date: str,
    body: bytes,
    variant: int = 0,
    content_type: str = "text/html",
    gzipped: bool = True,
) -> bytes:
    """One document as a 3-record WARC file (warcinfo + request +
    response), each record its own deterministic gzip member when
    ``gzipped`` (the Common Crawl layout). ``variant`` picks the
    response shape: 0 identity, 1 chunked, 2 gzip, 6 deflate (zlib or
    raw by body-length parity) HTTP bodies; 3 an
    identity body whose record carries ``WARC-Truncated: length`` (the
    crawler flagged a length-capped fetch — the reader must surface it,
    not pass it as complete); 4 a LONE ``WARC-Segment-Number: 1``
    record (its continuation lives in another shard — the reader must
    skip it with accounting, never emit the fragment as a page); 5 a
    COMPLETE two-segment chain (segment-1 response + continuation with
    WARC-Segment-Origin-ID and WARC-Segment-Total-Length, §5.20 — the
    reader reassembles it into an ordinary page); 7 a §6.7.2 REVISIT
    record (identical-payload-digest: HTTP headers only, no payload,
    WARC-Refers-To-* naming an earlier capture of the same url — the
    reader surfaces it as a body-less revisit page); 8 an identity
    response PLUS a §6.9 METADATA record (application/warc-fields:
    two closed-form ``outlink`` lines derived from the url and a
    ``fetchTimeMs`` equal to the body's octet length — the CC
    per-capture shape; the reader surfaces it as a metadata row);
    9 a §6.7.1 SERVER-NOT-MODIFIED revisit (the server answered 304,
    no payload transferred; the block is the 304 head — surfaces as a
    revisit page with http status 304; NOT in the default %9 roundtrip
    cycle, exercised by q52 and the pytest suite)."""
    extra_resp: list[tuple[str, str]] = []
    segmented_chain = False
    revisit = False
    not_modified = False
    with_metadata = False
    if variant == 3:
        extra_resp.append(("WARC-Truncated", "length"))
        variant = 0
    elif variant == 4:
        extra_resp.append(("WARC-Segment-Number", "1"))
        variant = 0
    elif variant == 5:
        segmented_chain = True
        variant = 0
    elif variant == 7:
        revisit = True
        variant = 0
    elif variant == 8:
        with_metadata = True
        variant = 0
    elif variant == 9:
        revisit = True
        not_modified = True
        variant = 0
    info = _record(
        "warcinfo",
        [("WARC-Record-ID", f"<urn:det:{url}#info>"), ("WARC-Date", date)],
        b"software: sax-wasm-spark-synth\r\n",
    )
    req = _record(
        "request",
        [
            ("WARC-Record-ID", f"<urn:det:{url}#req>"),
            ("WARC-Date", date),
            ("WARC-Target-URI", url),
        ],
        b"GET / HTTP/1.1\r\nHost: synthetic\r\n\r\n",
    )
    payload = _http_response(body, content_type, variant)
    if revisit:
        # §6.7.2 identical-payload-digest revisit: the record block is
        # the NEW response's HTTP headers only; the payload lives at
        # the referred (earlier) capture of the same url.
        # §6.7.1 server-not-modified (variant 9): the server answered
        # 304 and transferred NO payload at all — the block is the 304
        # head (no Content-Type of the entity; there was no entity)
        if not_modified:
            head = b"HTTP/1.1 304 Not Modified\r\nETag: \"det\"\r\n\r\n"
            profile = "http://netpreserve.org/warc/1.1/revisit/server-not-modified"
        else:
            head = (
                b"HTTP/1.1 200 OK\r\nContent-Type: "
                + content_type.encode()
                + b"\r\n\r\n"
            )
            profile = (
                "http://netpreserve.org/warc/1.1/revisit/"
                "identical-payload-digest"
            )
        resp = _record(
            "revisit",
            [
                ("WARC-Record-ID", f"<urn:det:{url}#rev>"),
                ("WARC-Date", date),
                ("WARC-Target-URI", url),
                ("WARC-Profile", profile),
                ("WARC-Refers-To", f"<urn:det:{url}#resp>"),
                ("WARC-Refers-To-Target-URI", url),
                ("WARC-Refers-To-Date", "2023-01-01T00:00:00Z"),
            ],
            head,
        )
        records = (info, req, resp)
    elif segmented_chain:
        half = len(payload) // 2
        resp = _record(
            "response",
            [
                ("WARC-Record-ID", f"<urn:det:{url}#resp>"),
                ("WARC-Date", date),
                ("WARC-Target-URI", url),
                ("WARC-Segment-Number", "1"),
            ],
            payload[:half],
        )
        cont = _record(
            "continuation",
            [
                ("WARC-Record-ID", f"<urn:det:{url}#cont>"),
                ("WARC-Date", date),
                ("WARC-Segment-Number", "2"),
                ("WARC-Segment-Origin-ID", f"<urn:det:{url}#resp>"),
                ("WARC-Segment-Total-Length", str(len(payload))),
            ],
            payload[half:],
        )
        records = (info, req, resp, cont)
    else:
        resp = _record(
            "response",
            [
                ("WARC-Record-ID", f"<urn:det:{url}#resp>"),
                ("WARC-Date", date),
                ("WARC-Target-URI", url),
                *extra_resp,
            ],
            payload,
        )
        records = (info, req, resp)
    if with_metadata:
        # §6.9 per-capture metadata, concurrent to the response. The
        # field values are CLOSED-FORM in (url, body) so the
        # q54/roundtrip oracles can reconstruct them in SQL: two
        # deterministic outlinks and fetchTimeMs = octet length.
        fields = (
            f"fetchTimeMs: {len(body)}\r\n"
            f"outlink: {url}/ref/a\r\n"
            f"outlink: {url}/ref/b\r\n"
        ).encode()
        meta = _record(
            "metadata",
            [
                ("WARC-Record-ID", f"<urn:det:{url}#meta>"),
                ("WARC-Date", date),
                ("WARC-Target-URI", url),
                ("WARC-Concurrent-To", f"<urn:det:{url}#resp>"),
                ("Content-Type", "application/warc-fields"),
            ],
            fields,
        )
        records = (*records, meta)
    if not gzipped:
        return b"".join(records)
    out = io.BytesIO()
    for rec in records:
        out.write(gzip.compress(rec, mtime=0))
    return out.getvalue()
