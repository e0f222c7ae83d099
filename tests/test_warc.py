"""WARC crawl-ingestion leg: from-scratch reader (sources/warc.py)
against the deterministic writer, plus DataFrame operator semantics
(operators/warc.py) and poison-shard behavior."""

from __future__ import annotations

import gzip

import pytest

from sax_wasm_spark.sources.warc import WarcError, build_warc, parse_warc

URL = "https://ex.com/p/1"
DATE = "2024-01-01T00:00:00Z"


@pytest.mark.parametrize("variant", [0, 1, 2, 6])
@pytest.mark.parametrize("gzipped", [True, False])
def test_roundtrip_variants(variant, gzipped):
    body = f"héllo wörld 漢字 \U0001f600 v{variant}\nline2".encode()
    pages = parse_warc(build_warc(URL, DATE, body, variant=variant, gzipped=gzipped))
    assert len(pages) == 1  # warcinfo + request records skipped
    p = pages[0]
    assert (p.url, p.warc_date, p.status, p.body) == (URL, DATE, 200, body)
    assert p.content_type == "text/html"


def test_concatenated_shard_multi_member_gzip():
    """The Common Crawl layout: many records, one gzip member each,
    appended into one shard blob."""
    blob = b"".join(
        build_warc(f"https://ex.com/{i}", DATE, b"doc%d" % i, variant=i % 3)
        for i in range(10)
    )
    pages = parse_warc(blob)
    assert [p.body for p in pages] == [b"doc%d" % i for i in range(10)]
    assert [p.url for p in pages] == [f"https://ex.com/{i}" for i in range(10)]


def test_empty_and_one_byte_chunked_bodies():
    assert parse_warc(build_warc(URL, DATE, b"", variant=1))[0].body == b""
    assert parse_warc(build_warc(URL, DATE, b"x", variant=1))[0].body == b"x"


def test_header_case_insensitive_and_obs_fold():
    raw = build_warc(URL, DATE, b"body bytes", variant=0, gzipped=False)
    # same-length lowercase swap keeps Content-Length framing intact
    raw = raw.replace(b"WARC-Target-URI: ", b"warc-target-uri: ")
    p = parse_warc(raw)[0]
    assert p.url == URL and p.body == b"body bytes"
    # obs-fold continuations join with a space (checked at parser level —
    # folding inside a record body would change its Content-Length)
    from sax_wasm_spark.sources.warc import _parse_headers

    h = _parse_headers(b"Content-Type: text/\r\n html\r\nX-A: b")
    assert h == {"content-type": "text/ html", "x-a": "b"}


def test_malformed_inputs_raise_warcerror():
    with pytest.raises(WarcError):
        parse_warc(b"not a warc at all")
    ok = build_warc(URL, DATE, b"abc", gzipped=False)
    with pytest.raises(WarcError):
        parse_warc(ok[: len(ok) // 2])  # truncated record
    with pytest.raises(WarcError):
        parse_warc(gzip.compress(b"WARC/1.0\r\nno-colon-line\r\n\r\n"))
    # unsupported content-encoding must raise, not return garbage
    raw = build_warc(URL, DATE, b"abc", variant=0, gzipped=False)
    raw = raw.replace(b"HTTP/1.1 200 OK\r\n", b"HTTP/1.1 200 OK\r\nContent-Encoding: br\r\n")
    with pytest.raises(WarcError):
        parse_warc(raw)


def test_non_response_only_file_yields_no_pages():
    full = build_warc(URL, DATE, b"abc", gzipped=False)
    # keep only the warcinfo + request records (drop the response)
    cut = full.find(b"WARC-Type: response") - len(b"WARC/1.0\r\n")
    assert parse_warc(full[:cut]) == []


def test_spark_operator_roundtrip_and_poison(spark):
    from pyspark.sql import functions as F

    from sax_wasm_spark.operators.warc import render_warc_column, warc_to_pages

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(30)
    shards = render_warc_column(d.select("doc_id", "text"), id_cols=("doc_id",))
    pages = warc_to_pages(shards, warc_col="warc", id_cols=("doc_id",))
    rows = (
        pages.join(d.select("doc_id", F.col("text").alias("want")), "doc_id")
        .select("doc_id", "url", "html", "want", "status", "outlinks")
        .collect()
    )
    n_meta_docs = sum(1 for r in rows if r.status == "metadata")
    assert n_meta_docs >= 1  # the 30-doc slice covers the %9=8 shape
    assert len(rows) == 30 + n_meta_docs
    for r in rows:
        mod = r.doc_id % 9
        if r.status == "metadata":
            # §6.9 metadata record: its own row with parsed fields
            assert mod == 8 and r.html is None
            assert r.outlinks == f"{r.url}/ref/a {r.url}/ref/b"
            continue
        if mod == 8:
            # the metadata-shape doc's RESPONSE row is an ordinary page
            assert r.status == "ok"
            assert bytes(r.html).decode() == r.want, r.doc_id
            continue
        if mod == 7:
            # revisit record: body-less page naming the referred capture
            assert r.status == "revisit" and r.html is None
            assert r.url == f"https://synth.example.com/p/{r.doc_id}"
            continue
        if mod == 4:
            # lone segment-1 record: skipped with accounting, no page
            # fields (its continuation is in another shard)
            assert r.status == "segmented" and r.url is None and r.html is None
            continue
        # mod 5 is a complete chain — reassembled into an ordinary page
        assert r.status == ("truncated" if mod == 3 else "ok")
        assert r.url == f"https://synth.example.com/p/{r.doc_id}"
        assert bytes(r.html).decode() == r.want, r.doc_id

    poison = spark.createDataFrame(
        [(0, b"garbage"), (1, None)], "shard_id long, warc binary"
    )
    got = warc_to_pages(poison, id_cols=("shard_id",)).collect()
    assert len(got) == 2
    assert all(r.status.startswith("error:") and r.html is None for r in got)


def test_streaming_warc_ingestion(spark, tmp_path):
    """WARC shards landing in a directory stream into pages rows via
    the binaryFile source + the batch operator lifted unchanged."""
    from sax_wasm_spark.streaming.stream import read_warc_stream

    in_dir = tmp_path / "shards"
    in_dir.mkdir()
    for i in range(3):
        blob = b"".join(
            build_warc(f"https://s{i}.com/{j}", DATE, b"doc %d-%d" % (i, j), variant=j % 3)
            for j in range(4)
        )
        (in_dir / f"shard-{i}.warc.gz").write_bytes(blob)
    (in_dir / "poison.warc.gz").write_bytes(b"not a warc")

    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    q = (
        read_warc_stream(spark, str(in_dir))
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    ok = got.where(got.status == "ok")
    assert ok.count() == 12
    bodies = {bytes(r.html) for r in ok.collect()}
    assert b"doc 2-3" in bodies
    err = got.where(got.status != "ok").collect()
    assert len(err) == 1 and err[0].shard_path.endswith("poison.warc.gz")


def test_lenient_parse_skips_bad_records_keeps_good():
    """One corrupted record mid-shard must cost one record, not the
    shard (round-4 self-review): strict raises, lenient salvages."""
    from sax_wasm_spark.sources.warc import parse_warc_lenient

    recs = [
        build_warc(f"https://ex.com/{i}", DATE, b"doc%d" % i, gzipped=False)
        for i in range(5)
    ]
    # corrupt doc 2's records: mangle Content-Length so framing breaks
    recs[2] = recs[2].replace(b"Content-Length", b"Content-Lxngth")
    blob = b"".join(recs)
    with pytest.raises(WarcError):
        parse_warc(blob)  # strict mode still raises
    pages, skipped, _seg = parse_warc_lenient(blob)
    assert [p.body for p in pages] == [b"doc0", b"doc1", b"doc3", b"doc4"]
    assert skipped >= 1  # doc2's three broken records
    # payload-level corruption: bad chunked framing skips just that record
    recs2 = [
        build_warc(f"https://ex.com/{i}", DATE, b"chunked doc %d" % i, variant=1, gzipped=False)
        for i in range(3)
    ]
    recs2[1] = recs2[1].replace(b"Transfer-Encoding: chunked", b"Transfer-Encoding: chunkex")
    pages, skipped, _seg = parse_warc_lenient(b"".join(recs2))
    # record 1 now parses as identity encoding with chunk framing bytes
    # left in the body OR fails — either way records 0 and 2 survive
    bodies = [p.body for p in pages]
    assert b"chunked doc 0" in bodies[0] and any(b"chunked doc 2" in b for b in bodies)


def test_operator_reports_n_bad_records(spark):
    from sax_wasm_spark.operators.warc import warc_to_pages

    good = b"".join(
        build_warc(f"https://ex.com/{i}", DATE, b"ok%d" % i, gzipped=False)
        for i in range(3)
    )
    i1 = good.find(b"ok1")  # corrupt only doc 1's region
    bad_mid = good[:i1] + good[i1:].replace(b"ok1", b"o", 1)  # shrink body vs Content-Length
    df = spark.createDataFrame([(0, good), (1, bad_mid)], "shard_id long, warc binary")
    rows = warc_to_pages(df, id_cols=("shard_id",)).collect()
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r.shard_id, []).append(r)
    assert len(by_shard[0]) == 3 and all(r.n_bad_records == 0 for r in by_shard[0])
    assert len(by_shard[1]) == 2 and all(r.n_bad_records == 1 for r in by_shard[1])
    assert all(r.status == "ok" for r in by_shard[1])


def test_truncated_record_flagged_not_silent():
    """ISO 28500 §5.13: WARC-Truncated marks a length-capped fetch —
    the page is KEPT (data is data) but must carry the reason instead
    of passing as a complete body (VERDICT r4 item 4)."""
    raw = build_warc(URL, DATE, b"partial body", variant=3, gzipped=False)
    p = parse_warc(raw)[0]
    assert p.truncated == "length"
    assert (p.status, p.body) == (200, b"partial body")
    # gzipped shard path too
    p = parse_warc(build_warc(URL, DATE, b"x", variant=3))[0]
    assert p.truncated == "length"
    # an empty reason is still a truncation
    from sax_wasm_spark.sources.warc import _record

    http = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\nbody"
    rec = _record(
        "response",
        [("WARC-Date", DATE), ("WARC-Target-URI", URL), ("WARC-Truncated", "")],
        http,
    )
    assert parse_warc(rec)[0].truncated == "unspecified"


def test_truncated_cut_payload_salvaged():
    """A truncated body may break mid-chunk: the HTTP decode fails but
    the flagged record still surfaces (status 0, raw remainder) rather
    than being silently skipped."""
    from sax_wasm_spark.sources.warc import _record, parse_warc_lenient

    http = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
        b"Transfer-Encoding: chunked\r\n\r\n5\r\nhel"  # cut mid-chunk
    )
    rec = _record(
        "response",
        [("WARC-Date", DATE), ("WARC-Target-URI", URL), ("WARC-Truncated", "length")],
        http,
    )
    pages, skipped, segmented = parse_warc_lenient(rec)
    assert (skipped, segmented) == (0, 0)
    p = pages[0]
    assert p.truncated == "length" and p.status == 0 and p.body == b"5\r\nhel"
    # WITHOUT the truncation flag the same cut payload is a skip
    rec2 = _record(
        "response", [("WARC-Date", DATE), ("WARC-Target-URI", URL)], http
    )
    pages, skipped, segmented = parse_warc_lenient(rec2)
    assert pages == [] and skipped == 1


def test_segmented_records_skip_with_accounting():
    """§5.18-5.20: segment-1 responses and continuation records hold
    PARTIAL payloads; emitting them as pages would be corruption.
    Lenient mode skips them with a separate count; strict refuses."""
    from sax_wasm_spark.sources.warc import _record, parse_warc_lenient

    raw = build_warc(URL, DATE, b"seg one payload", variant=4, gzipped=False)
    with pytest.raises(WarcError):
        parse_warc(raw)
    pages, skipped, segmented = parse_warc_lenient(raw)
    assert pages == [] and skipped == 0 and segmented == 1
    cont = _record(
        "continuation",
        [
            ("WARC-Date", DATE),
            ("WARC-Segment-Number", "2"),
            ("WARC-Segment-Origin-ID", "<urn:det:x#resp>"),
        ],
        b"rest of payload",
    )
    pages, skipped, segmented = parse_warc_lenient(raw + cont)
    assert pages == [] and segmented == 2
    # a good record alongside still parses; counts ride with the shard
    good = build_warc("https://ex.com/g", DATE, b"whole", gzipped=False)
    pages, skipped, segmented = parse_warc_lenient(raw + good)
    assert [p.body for p in pages] == [b"whole"] and segmented == 1


def test_operator_empty_shard_accounting_rows(spark):
    """A shard whose records ALL fail (or are all segmented) must not
    vanish: one accounting row carries the counts (ADVICE r4)."""
    from sax_wasm_spark.operators.warc import warc_to_pages

    all_bad = b"WARC/1.0\r\nWARC-Type: response\r\n\r\nno content-length"
    all_seg = build_warc(URL, DATE, b"seg", variant=4, gzipped=False)
    good = build_warc("https://ex.com/g", DATE, b"whole", gzipped=False)
    df = spark.createDataFrame(
        [(0, all_bad), (1, all_seg), (2, good)], "shard_id long, warc binary"
    )
    # a VALID shard of only warcinfo/request records (crawl-metadata
    # WARCs): zero pages, zero skips — still one accounting row
    full = build_warc("https://ex.com/m", DATE, b"x", gzipped=False)
    cut = full.find(b"WARC-Type: response") - len(b"WARC/1.0\r\n")
    no_resp = full[:cut]
    df2 = spark.createDataFrame([(3, no_resp)], "shard_id long, warc binary")
    rows = {r.shard_id: r for r in warc_to_pages(df, id_cols=("shard_id",)).collect()}
    rows.update(
        {r.shard_id: r for r in warc_to_pages(df2, id_cols=("shard_id",)).collect()}
    )
    assert rows[0].status == "empty" and rows[0].n_bad_records == 1
    assert rows[0].url is None and rows[0].html is None
    assert rows[1].status == "segmented" and rows[1].n_segment_records == 1
    assert rows[2].status == "ok" and bytes(rows[2].html) == b"whole"
    assert rows[3].status == "no_responses"
    assert rows[3].n_bad_records == 0 and rows[3].n_segment_records == 0


def test_segment_chain_reassembled_within_shard():
    """§5.20: a complete chain (segment-1 response + continuation with
    origin id + total length) in ONE input reassembles into an
    ordinary page; out-of-order arrival and multi-doc shards work;
    wrong totals or missing segments stay skipped-with-accounting."""
    from sax_wasm_spark.sources.warc import _record, parse_warc_lenient

    body = "chain content héllo \U0001f600 end".encode()
    raw = build_warc(URL, DATE, body, variant=5, gzipped=False)
    pages, skipped, segmented = parse_warc_lenient(raw)
    assert (skipped, segmented) == (0, 0)
    assert pages[0].url == URL and pages[0].body == body and pages[0].status == 200
    # gzipped members too
    pages, _, segmented = parse_warc_lenient(build_warc(URL, DATE, body, variant=5))
    assert pages[0].body == body and segmented == 0
    # a normal doc alongside a chain: both come back
    other = build_warc("https://ex.com/o", DATE, b"plain", gzipped=False)
    pages, _, segmented = parse_warc_lenient(other + raw)
    assert {p.body for p in pages} == {b"plain", body} and segmented == 0

    # out-of-order: continuation BEFORE its segment-1 record
    i = raw.find(b"WARC/1.0\r\nWARC-Type: continuation")
    j = raw.find(b"WARC/1.0\r\nWARC-Type: response")
    reordered = raw[:j] + raw[i:] + raw[j:i]
    pages, _, segmented = parse_warc_lenient(reordered)
    assert pages and pages[0].body == body and segmented == 0

    # wrong total length: chain refused, records counted
    bad = raw.replace(b"WARC-Segment-Total-Length: ", b"WARC-Segment-Total-Length: 9")
    pages, _, segmented = parse_warc_lenient(bad)
    assert pages == [] and segmented == 2

    # continuation without its head (head in another shard)
    cont_only = _record(
        "continuation",
        [
            ("WARC-Date", DATE),
            ("WARC-Segment-Number", "2"),
            ("WARC-Segment-Origin-ID", "<urn:elsewhere>"),
            ("WARC-Segment-Total-Length", "10"),
        ],
        b"tail bytes",
    )
    pages, _, segmented = parse_warc_lenient(cont_only)
    assert pages == [] and segmented == 1

    # a malformed CONTINUATION claiming segment 1 must not masquerade
    # as a chain head (it has no target-uri; emitting it would produce
    # a page from a fragment)
    fake_head = _record(
        "continuation",
        [
            ("WARC-Record-ID", "<c1>"),
            ("WARC-Date", DATE),
            ("WARC-Segment-Number", "1"),
            ("WARC-Segment-Origin-ID", "<x>"),
            ("WARC-Segment-Total-Length", "4"),
        ],
        b"frag",
    )
    pages, _, segmented = parse_warc_lenient(fake_head)
    assert pages == [] and segmented == 1

    # duplicate (chain, segment) records poison the chain: which body
    # is right is undecidable, so emitting either would risk pairing
    # head A's url with body B — refuse with full record accounting
    i2 = raw.find(b"WARC/1.0\r\nWARC-Type: response")
    j2 = raw.find(b"WARC/1.0\r\nWARC-Type: continuation")
    dup = raw[i2:j2].replace(b"chain content", b"EVIL  content")
    pages, _, segmented = parse_warc_lenient(raw[:j2] + dup + raw[j2:])
    assert pages == [] and segmented == 3


def test_cross_shard_segment_stitching(spark):
    """The one WARC path that can't stay shard-local: segment 1 lands
    in shard A, its continuation in shard B. emit_segments surfaces
    them as status='segment' rows and stitch_segments reassembles the
    chain with ONE groupBy on the chain id; incomplete chains come
    back as accountable segment_error rows."""
    from sax_wasm_spark.operators.warc import stitch_segments, warc_to_pages

    body = "cross-shard body héllo \U0001f600 tail".encode()
    full = build_warc(URL, DATE, body, variant=5, gzipped=False)
    i = full.find(b"WARC/1.0\r\nWARC-Type: continuation")
    seg1_shard = full[:i]  # warcinfo + request + segment-1 response
    cont_shard = full[i:]  # the continuation record alone
    normal = build_warc("https://ex.com/n", DATE, b"plain doc", gzipped=False)
    # an incomplete chain: segment-1 whose continuation never arrives
    lone = build_warc("https://ex.com/lone", DATE, b"never completes", variant=4, gzipped=False)
    df = spark.createDataFrame(
        [(0, seg1_shard), (1, cont_shard), (2, normal), (3, lone)],
        "shard_id long, warc binary",
    )
    rows = warc_to_pages(df, id_cols=("shard_id",), emit_segments=True)
    by_status = {}
    for r in rows.collect():
        by_status.setdefault(r.status, []).append(r)
    assert len(by_status["ok"]) == 1  # the normal doc
    segs = by_status["segment"]
    assert len(segs) == 3  # seg1 + continuation + the lone seg1
    assert {s.shard_id for s in segs} == {0, 1, 3}
    assert all(s.segment_origin for s in segs)

    stitched = stitch_segments(rows, id_cols=("shard_id",)).collect()
    ok = [r for r in stitched if r.status == "ok"]
    err = [r for r in stitched if r.status == "segment_error"]
    assert len(ok) == 1 and len(err) == 1
    assert ok[0].url == URL and bytes(ok[0].html) == body
    assert ok[0].http_status == 200 and ok[0].shard_id == 0  # min shard
    assert err[0].url == "https://ex.com/lone"
    assert err[0].n_segment_records == 1  # accounting survives

    # plan shape: exactly one shuffle (the chain-id groupBy)
    plan = rows._sc._jvm.PythonSQLUtils.explainString(
        stitch_segments(rows, id_cols=("shard_id",))._jdf.queryExecution(),
        "formatted",
    )
    import re

    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1, plan[:2000]


# ---------------------------------------------------------------------------
# property-based robustness (hypothesis)

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@settings(max_examples=150, deadline=None)
@given(seed=st.integers(0, 2**31), n_mut=st.integers(1, 30))
def test_mutation_fuzz_lenient_parse_contract(seed, n_mut):
    """ANY byte-mutated shard either parses leniently (some tuple) or
    raises WarcError — never another exception, never a hang. This is
    the contract warc_to_pages' poison handling relies on."""
    import random

    from sax_wasm_spark.sources.warc import parse_warc_lenient

    rng = random.Random(seed)
    base = bytearray(
        b"".join(
            build_warc(
                f"https://f.com/{i}", DATE, b"fuzz doc %d" % i,
                variant=i % 9, gzipped=(i % 2 == 0),
            )
            for i in range(3)
        )
    )
    for _ in range(n_mut):
        op = rng.randrange(3)
        pos = rng.randrange(len(base))
        if op == 0:
            base[pos] = rng.randrange(256)
        elif op == 1 and len(base) > 10:
            del base[pos]
        else:
            base.insert(pos, rng.randrange(256))
    try:
        pages, skipped, segmented = parse_warc_lenient(bytes(base))
    except WarcError:
        return  # wholly unreadable — the operator maps this to an error row
    assert isinstance(pages, list) and skipped >= 0 and segmented >= 0


def test_stitch_rejects_headless_and_orphan_chains(spark):
    """Cross-shard masquerade guard (round-5 review): a chain of
    CONTINUATIONS numbered 1..N with a matching total must not stitch
    into an 'ok' page — only a segment-1 RESPONSE may head a chain.
    And a continuation with no WARC-Segment-Origin-ID still yields an
    accountable segment_error row instead of vanishing."""
    from sax_wasm_spark.operators.warc import stitch_segments, warc_to_pages
    from sax_wasm_spark.sources.warc import _record

    body = b"fake payload pretending to be a page"
    half = len(body) // 2
    cont1 = _record(
        "continuation",
        [
            ("WARC-Record-ID", "<urn:c1>"),
            ("WARC-Date", DATE),
            ("WARC-Target-URI", "https://evil.com/masquerade"),
            ("WARC-Segment-Number", "1"),
            ("WARC-Segment-Origin-ID", "<urn:lost-head>"),
        ],
        body[:half],
    )
    cont2 = _record(
        "continuation",
        [
            ("WARC-Record-ID", "<urn:c2>"),
            ("WARC-Date", DATE),
            ("WARC-Segment-Number", "2"),
            ("WARC-Segment-Origin-ID", "<urn:lost-head>"),
            ("WARC-Segment-Total-Length", str(len(body))),
        ],
        body[half:],
    )
    orphan = _record(
        "continuation",
        [
            ("WARC-Record-ID", "<urn:c3>"),
            ("WARC-Date", DATE),
            ("WARC-Segment-Number", "2"),
            # no WARC-Segment-Origin-ID at all
            ("WARC-Segment-Total-Length", "10"),
        ],
        b"tail bytes",
    )
    df = spark.createDataFrame(
        [(0, cont1), (1, cont2), (2, orphan)], "shard_id long, warc binary"
    )
    rows = warc_to_pages(df, id_cols=("shard_id",), emit_segments=True)
    segs = rows.where(rows.status == "segment").collect()
    assert len(segs) == 3 and all(s.segment_is_head is False for s in segs)
    stitched = stitch_segments(rows, id_cols=("shard_id",)).collect()
    assert all(r.status == "segment_error" for r in stitched), stitched
    # headless chain (2 records) + orphan (1 record) both reconcile
    assert sorted(r.n_segment_records for r in stitched) == [1, 2]


def test_deflate_both_framings_and_poison():
    """Content-Encoding: deflate (VERDICT r5 item 8): the writer emits
    zlib-wrapped (RFC 1950) for even body lengths and raw DEFLATE
    (RFC 1951) for odd — the reader must accept both; undecodable
    deflate raises WarcError (poison row, not a task kill)."""
    import zlib

    from sax_wasm_spark.sources.warc import WarcError, parse_warc

    even, odd = b"ab" * 8, b"xyz" * 5  # len 16 / 15
    for body in (even, odd):
        shard = build_warc(URL, DATE, body, variant=6)
        (p,) = parse_warc(shard)
        assert p.body == body and p.status == 200
    plain = build_warc(URL, DATE, even, variant=6, gzipped=False)
    assert b"Content-Encoding: deflate" in plain
    # framing really differs: the even body's payload is zlib-wrapped
    assert zlib.compress(even) in plain
    raw_co = zlib.compressobj(wbits=-zlib.MAX_WBITS)
    assert (raw_co.compress(odd) + raw_co.flush()) in build_warc(
        URL, DATE, odd, variant=6, gzipped=False
    )
    # poison: garbage bytes under the deflate token
    shard = bytearray(build_warc(URL, DATE, even, variant=6, gzipped=False))
    i = shard.rindex(b"\r\n\r\n", 0, shard.rindex(b"\r\n\r\n")) + 4
    shard[i:i + 4] = b"\x00\x01\x02\x03"
    with pytest.raises(WarcError, match="deflate"):
        parse_warc(bytes(shard))


def test_revisit_records_surface_with_reference():
    """ISO 28500 §6.7.2 identical-payload-digest revisit records
    (Common Crawl's crawl-level dedup): surfaced as body-less pages
    with revisit_of naming the referred capture — never silently
    dropped, never passed off as a full capture."""
    from sax_wasm_spark.sources.warc import parse_warc, parse_warc_lenient

    w = build_warc(URL, DATE, b"payload irrelevant", variant=7)
    (p,) = parse_warc(w)
    assert p.revisit_of == URL and p.body == b"" and p.status == 200
    assert p.url == URL and p.content_type == "text/html"
    # ordinary responses have revisit_of None (not ''):
    (q,) = parse_warc(build_warc(URL, DATE, b"x", variant=0))
    assert q.revisit_of is None
    # a revisit whose block is unparseable still surfaces (status 0)
    plain = build_warc(URL, DATE, b"y", variant=7, gzipped=False)
    broken = plain.replace(b"HTTP/1.1 200 OK", b"NOT-HTTP GARBAGE!")
    pages, skipped, _ = parse_warc_lenient(broken)
    assert len(pages) == 1 and pages[0].revisit_of == URL
    assert pages[0].status == 0


def test_resolve_revisits_operator(spark):
    """resolve_revisits: resolvable revisit rows take the referred
    capture's payload (latest capture wins), unresolvable ones stay
    'revisit' (or drop with keep_unresolved=False); non-revisit rows
    pass through untouched."""
    from pyspark.sql import functions as F

    from sax_wasm_spark.operators.warc import (
        render_warc_column,
        resolve_revisits,
        warc_to_pages,
    )

    d = spark.createDataFrame(
        [(i, f"text of doc {i}") for i in range(6)], "doc_id long, text string"
    )
    url = F.concat(F.lit("https://r.example/p/"), F.col("doc_id").cast("string"))
    a = d.select("doc_id", "text", F.lit(0).alias("v"), url.alias("u"))
    b = d.select(
        (F.col("doc_id") + 100).alias("doc_id"),
        "text",
        F.lit(7).alias("v"),
        F.when(F.col("doc_id") % 2 == 0, url)
        .otherwise(F.concat(url, F.lit("-missing")))
        .alias("u"),
    )
    shards = render_warc_column(
        a, id_cols=("doc_id",), url_col="u", variant_col="v"
    ).unionByName(
        render_warc_column(b, id_cols=("doc_id",), url_col="u", variant_col="v")
    )
    pages = warc_to_pages(shards, warc_col="warc", id_cols=("doc_id",))
    got = {r.doc_id: r for r in resolve_revisits(pages).collect()}
    assert len(got) == 12
    for i in range(6):
        assert got[i].status == "ok"
        if i % 2 == 0:
            assert got[100 + i].status == "revisit_resolved"
            assert bytes(got[100 + i].html).decode() == f"text of doc {i}"
        else:
            assert got[100 + i].status == "revisit" and got[100 + i].html is None
    dropped = resolve_revisits(pages, keep_unresolved=False)
    assert dropped.where(F.col("status") == "revisit").count() == 0
    assert dropped.count() == 9  # 6 ok + 3 resolved


def test_revisit_with_copied_encoding_headers_costs_nothing():
    """Round-6 review regression: revisit blocks replay the ORIGINAL
    response's headers verbatim — including Content-Encoding: gzip /
    Transfer-Encoding: chunked. The head-only parse must surface the
    record (status+ctype intact) without attempting to decode the
    absent body; previously gzip.decompress(b'') raised EOFError and
    erased the whole shard."""
    from sax_wasm_spark.sources.warc import parse_warc_lenient

    plain = build_warc(URL, DATE, b"x", variant=7, gzipped=False)
    for hdr in (b"Content-Encoding: gzip", b"Transfer-Encoding: chunked"):
        # swap the Content-Type header for the poison one (same-length
        # irrelevant — record Content-Length spans the whole block, and
        # we rebuild it)
        base = plain.replace(
            b"Content-Type: text/html", hdr + b"\r\nContent-Type: text/html"
        )
        # fix the WARC Content-Length for the enlarged block
        # (rebuild instead: simpler — construct via build_warc pieces)
        pages, skipped, _ = parse_warc_lenient(_fix_length(base))
        assert len(pages) == 1, (hdr, skipped)
        p = pages[0]
        assert p.revisit_of == URL and p.status == 200
        assert p.content_type == "text/html"
    # shard context: the revisit record must not poison its neighbors
    shard = (
        build_warc("https://a.com/1", DATE, b"doc1", gzipped=False)
        + _fix_length(
            plain.replace(
                b"Content-Type: text/html",
                b"Content-Encoding: gzip\r\nContent-Type: text/html",
            )
        )
        + build_warc("https://a.com/2", DATE, b"doc2", gzipped=False)
    )
    pages, skipped, _ = parse_warc_lenient(shard)
    assert [p.body for p in pages if p.revisit_of is None] == [b"doc1", b"doc2"]
    assert skipped == 0


def _fix_length(raw: bytes) -> bytes:
    """Recompute each record's Content-Length after header surgery."""
    out = []
    for chunk in raw.split(b"WARC/1.0\r\n"):
        if not chunk:
            continue
        head, _, rest = chunk.partition(b"\r\n\r\n")
        body = rest[: rest.rfind(b"\r\n\r\n")] if rest.endswith(b"\r\n\r\n") else rest
        import re as _re

        head = _re.sub(
            rb"Content-Length: \d+", b"Content-Length: %d" % len(body), head
        )
        out.append(b"WARC/1.0\r\n" + head + b"\r\n\r\n" + body + b"\r\n\r\n")
    return b"".join(out)


def test_wet_conversion_records(spark):
    """Common Crawl WET files (§6.8 conversion records — the extracted
    -text distribution format): the reader surfaces each record's body
    as a page with conversion=True and no HTTP fields; through the
    operator they arrive as status='conversion' rows ready to feed the
    documents table directly."""
    from sax_wasm_spark.sources.warc import build_wet, parse_warc

    docs = [(f"https://wet.example/{i}", f"extracted text {i}\nline two") for i in range(5)]
    wet = build_wet(docs)
    pages = parse_warc(wet)
    assert [(p.url, p.body.decode()) for p in pages] == [
        (u, t) for u, t in docs
    ]
    assert all(p.conversion and p.content_type == "text/plain" for p in pages)

    from sax_wasm_spark.operators.warc import warc_to_pages

    shards = spark.createDataFrame([(0, wet)], "shard_id long, warc binary")
    rows = warc_to_pages(shards, id_cols=("shard_id",)).collect()
    assert len(rows) == 5
    for r in sorted(rows, key=lambda r: r.url):
        assert r.status == "conversion" and r.http_status is None
    texts = {r.url: bytes(r.html).decode() for r in rows}
    assert texts == dict(docs)


def test_segmented_and_truncated_conversion_records():
    """Round-6 third review: conversion records carrying
    WARC-Segment-Number must enter the reassembly stash (previously
    the first segment masqueraded as the full converted text), and a
    §5.13 WARC-Truncated conversion record keeps its truncation
    signal (status='conversion_truncated' through the operator)."""
    from sax_wasm_spark.sources.warc import (
        _record,
        parse_warc_lenient,
    )

    # complete in-shard conversion chain: must reassemble to full text
    head = _record(
        "conversion",
        [
            ("WARC-Record-ID", "<urn:det:c#1>"),
            ("WARC-Date", DATE),
            ("WARC-Target-URI", "https://c.example/x"),
            ("Content-Type", "text/plain"),
            ("WARC-Segment-Number", "1"),
        ],
        b"FIRST-HALF-",
    )
    cont = _record(
        "continuation",
        [
            ("WARC-Record-ID", "<urn:det:c#2>"),
            ("WARC-Date", DATE),
            ("WARC-Segment-Number", "2"),
            ("WARC-Segment-Origin-ID", "<urn:det:c#1>"),
            ("WARC-Segment-Total-Length", str(len(b"FIRST-HALF-SECOND-HALF"))),
        ],
        b"SECOND-HALF",
    )
    pages, skipped, segmented = parse_warc_lenient(head + cont)
    assert skipped == 0 and segmented == 0
    (p,) = pages
    assert p.conversion and p.body == b"FIRST-HALF-SECOND-HALF"

    # lone segment-1 conversion: stashed with accounting, NOT emitted
    pages, skipped, segmented = parse_warc_lenient(head)
    assert pages == [] and segmented == 1

    # truncated conversion record: flag carried through the operator
    trunc = _record(
        "conversion",
        [
            ("WARC-Record-ID", "<urn:det:t#1>"),
            ("WARC-Date", DATE),
            ("WARC-Target-URI", "https://c.example/t"),
            ("Content-Type", "text/plain"),
            ("WARC-Truncated", "length"),
        ],
        b"cut tex",
    )
    (p,), _, _ = parse_warc_lenient(trunc)
    assert p.conversion and p.truncated == "length"


def test_conversion_truncated_status_through_operator(spark):
    from sax_wasm_spark.sources.warc import _record

    rec = _record(
        "conversion",
        [
            ("WARC-Record-ID", "<urn:det:t#1>"),
            ("WARC-Date", DATE),
            ("WARC-Target-URI", "https://c.example/t"),
            ("WARC-Truncated", "length"),
        ],
        b"cut tex",
    )
    from sax_wasm_spark.operators.warc import warc_to_pages

    shards = spark.createDataFrame([(0, rec)], "shard_id long, warc binary")
    (row,) = warc_to_pages(shards, id_cols=("shard_id",)).collect()
    assert row.status == "conversion_truncated"
    assert bytes(row.html) == b"cut tex"


# ---------------------------------------------------------------------------
# §6.9 metadata records (round 7)


def test_metadata_record_roundtrip():
    """Variant 8: response + concurrent warc-fields metadata record.
    The reader surfaces BOTH — the page and a metadata row with the
    parsed outlinks and fetchTimeMs."""
    body = "méta dôc".encode()
    for gz in (True, False):
        pages = parse_warc(build_warc(URL, DATE, body, variant=8, gzipped=gz))
        assert len(pages) == 2
        page = next(p for p in pages if not p.metadata)
        meta = next(p for p in pages if p.metadata)
        assert (page.url, page.status, page.body) == (URL, 200, body)
        assert meta.url == URL and meta.body == b""
        assert meta.outlinks == (f"{URL}/ref/a", f"{URL}/ref/b")
        assert meta.fetch_ms == len(body)
        assert meta.content_type == "application/warc-fields"


def test_warc_fields_grammar():
    """Repeated keys preserved in order, obs-fold continuation joined,
    malformed lines skipped (lenient — metadata is descriptive), bad
    fetchTimeMs ignored."""
    from sax_wasm_spark.sources.warc import _parse_warc_fields

    block = (
        b"outlink: https://a.example/1\r\n"
        b"fetchTimeMs: 123\r\n"
        b"outlink: https://a.example/2\r\n"
        b"  continued-bit\r\n"
        b"no-colon-line\r\n"
        b"Outlink: https://a.example/3\r\n"
    )
    fields = _parse_warc_fields(block)
    assert fields == [
        ("outlink", "https://a.example/1"),
        ("fetchtimems", "123"),
        ("outlink", "https://a.example/2 continued-bit"),
        ("outlink", "https://a.example/3"),
    ]


def test_metadata_record_hand_rolled_edge_cases():
    """A metadata record with no outlinks and an unparseable
    fetchTimeMs still yields a metadata page (empty links, NULL ms);
    a metadata-ONLY shard yields rows, not 'no_responses'."""
    from sax_wasm_spark.sources.warc import _record

    info = _record(
        "warcinfo",
        [("WARC-Record-ID", "<urn:x#i>"), ("WARC-Date", DATE)],
        b"software: t\r\n",
    )
    meta = _record(
        "metadata",
        [
            ("WARC-Record-ID", "<urn:x#m>"),
            ("WARC-Date", DATE),
            ("WARC-Target-URI", URL),
            ("Content-Type", "application/warc-fields"),
        ],
        b"fetchTimeMs: not-a-number\r\nvia: https://ref.example/\r\n",
    )
    pages = parse_warc(info + meta)
    assert len(pages) == 1
    p = pages[0]
    assert p.metadata and p.outlinks == () and p.fetch_ms is None


def test_metadata_rows_through_operator(spark):
    """warc_to_pages surfaces metadata rows with comma-joined outlinks
    and fetch_ms; empty-outlink blocks come through as NULL."""
    from pyspark.sql import functions as F

    from sax_wasm_spark.operators.warc import render_warc_column, warc_to_pages

    d = spark.createDataFrame(
        [(i, f"meta doc {i}") for i in range(4)], "doc_id long, text string"
    ).withColumn("v", F.lit(8))
    shards = render_warc_column(d, id_cols=("doc_id",), variant_col="v")
    pages = warc_to_pages(shards, warc_col="warc", id_cols=("doc_id",))
    meta = pages.where(F.col("status") == "metadata").orderBy("doc_id").collect()
    assert len(meta) == 4
    for r in meta:
        assert r.outlinks == f"{r.url}/ref/a {r.url}/ref/b"
        assert r.fetch_ms == len(f"meta doc {r.doc_id}".encode())
        assert r.html is None and r.http_status is None


def test_server_not_modified_revisit_profile():
    """§6.7.1: the server answered 304 and transferred no payload; the
    record surfaces as a body-less revisit page with http status 304
    and the referred capture in revisit_of."""
    pages = parse_warc(build_warc(URL, DATE, b"ignored", variant=9))
    assert len(pages) == 1
    p = pages[0]
    assert p.revisit_of == URL and p.body == b"" and p.status == 304
    # profile is visible on the wire: the raw record carries the
    # server-not-modified profile URI, not identical-payload-digest
    raw = build_warc(URL, DATE, b"ignored", variant=9, gzipped=False)
    assert b"revisit/server-not-modified" in raw
    assert b"identical-payload-digest" not in raw


def test_resolve_revisits_mixes_both_profiles(spark):
    """A §6.7.1 revisit resolves exactly like a §6.7.2 one (payload
    from the referred capture, capture's http status); unresolvable
    §6.7.1 rows keep their own 304."""
    from pyspark.sql import functions as F

    from sax_wasm_spark.operators.warc import (
        render_warc_column,
        resolve_revisits,
        warc_to_pages,
    )

    cap = spark.createDataFrame(
        [(1, "cap text")], "doc_id long, text string"
    ).select("doc_id", "text", F.lit(0).alias("v"), F.lit("https://r.com/1").alias("u"))
    rev = spark.createDataFrame(
        [(11, "x", 9, "https://r.com/1"), (12, "x", 9, "https://r.com/gone")],
        "doc_id long, text string, v int, u string",
    )
    shards = render_warc_column(cap, id_cols=("doc_id",), url_col="u", variant_col="v").unionByName(
        render_warc_column(rev, id_cols=("doc_id",), url_col="u", variant_col="v")
    )
    rows = {
        r.doc_id: r
        for r in resolve_revisits(
            warc_to_pages(shards, warc_col="warc", id_cols=("doc_id",))
        ).collect()
    }
    assert rows[11].status == "revisit_resolved"
    assert bytes(rows[11].html).decode() == "cap text"
    assert rows[11].http_status == 200  # the capture's, not the 304
    assert rows[12].status == "revisit" and rows[12].html is None
    assert rows[12].http_status == 304  # wire truth kept when unresolved
