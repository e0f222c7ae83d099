"""Charset sniff + transcode semantics (functions/charset.py).

Pins the WHATWG-subset precedence (BOM > meta prescan > utf-8
fallback), the spec quirks, and the never-throws degradation contract
— pure-python first, then the Spark column plumbing."""

from __future__ import annotations

from sax_wasm_spark.functions.charset import (
    decode_page,
    detect_encoding,
    pages_to_utf8,
)


def test_bom_beats_contradicting_meta():
    page = b"\xff\xfe" + (
        '<html><head><meta charset="shift_jis"></head>'
        "<body>café</body></html>"
    ).encode("utf-16-le")
    enc, text = decode_page(page)
    assert enc == "utf-16-le"
    assert "café" in text
    assert "shift_jis" in text  # the meta survives as text, not as truth


def test_utf8_bom_stripped():
    enc, text = decode_page(b"\xef\xbb\xbf<p>x</p>")
    assert enc == "utf-8"
    assert text == "<p>x</p>"  # BOM is not part of the text


def test_meta_prescan_simple_and_http_equiv():
    assert detect_encoding(b'<meta charset="windows-1251">')[0] == "cp1251"
    assert (
        detect_encoding(
            b'<meta http-equiv="Content-Type" '
            b'content="text/html; charset=iso-8859-1">'
        )[0]
        == "cp1252"  # WHATWG alias: iso-8859-1 label IS windows-1252
    )


def test_meta_beyond_1024_bytes_is_ignored():
    page = b"<!--" + b"x" * 1100 + b'--><meta charset="shift_jis">'
    assert detect_encoding(page)[0] == "utf-8"


def test_unknown_label_falls_back_to_utf8():
    assert detect_encoding(b'<meta charset="no-such-enc-999">')[0] == "utf-8"


def test_meta_declared_utf16_is_treated_as_utf8():
    # spec quirk: a page you could ASCII-prescan cannot be utf-16
    assert detect_encoding(b'<meta charset="utf-16">')[0] == "utf-8"
    assert detect_encoding(b'<meta charset="UTF-16LE">')[0] == "utf-8"


def test_undecodable_bytes_degrade_to_replacement():
    enc, text = decode_page(b'<meta charset="utf-8"><p>\xff\xfe\xfa</p>')
    assert enc == "utf-8"
    assert "�" in text and text.startswith("<meta")


def test_gb2312_label_maps_to_gbk():
    assert detect_encoding(b'<meta charset="gb2312">')[0] == "gbk"


def test_null_page_is_empty_utf8():
    assert decode_page(None) == ("utf-8", "")


def test_pages_to_utf8_byte_identity_for_utf8_majority(spark):
    """The transcode front porch must leave BOM-less utf-8 pages
    byte-identical (the extraction byte-identity invariant holds for
    the utf-8 majority) and must transcode a cp1252 page to the utf-8
    bytes of the same text."""
    rows = [
        (0, "<p>café utf8</p>".encode("utf-8")),
        (1, b'<meta charset="windows-1252"><p>caf\xe9</p>'),
    ]
    df = spark.createDataFrame(rows, "doc_id long, html binary")
    got = {
        r["doc_id"]: r
        for r in pages_to_utf8(df).select("doc_id", "html", "encoding").collect()
    }
    assert bytes(got[0]["html"]) == rows[0][1]
    assert got[0]["encoding"] == "utf-8"
    assert got[1]["encoding"] == "windows-1252"
    assert (
        bytes(got[1]["html"])
        == '<meta charset="windows-1252"><p>café</p>'.encode("utf-8")
    )


def test_streaming_extraction_with_transcode(spark, tmp_path):
    """The charset front porch lifts into Structured Streaming
    unchanged: a mixed utf-8 / utf-16-le / windows-1252 corpus streams
    through pages_to_utf8 → extract and lands with the same extracted
    text the batch path produces, plus the detected encoding column."""
    from sax_wasm_spark.streaming.stream import extract_stream

    body = "<html><body><p>stream café %d</p></body></html>"
    rows = []
    for i in range(12):
        t = body % i
        if i % 3 == 0:
            raw = t.encode("utf-8")
        elif i % 3 == 1:
            raw = b"\xff\xfe" + t.encode("utf-16-le")
        else:
            raw = (
                b'<meta charset="windows-1252">' + t.encode("cp1252")
            )
        rows.append((str(i), raw))
    df = spark.createDataFrame(rows, "url string, html binary")
    in_path = str(tmp_path / "enc_in")
    out_path = str(tmp_path / "enc_out")
    ckpt = str(tmp_path / "enc_ckpt")
    df.write.mode("overwrite").parquet(in_path)
    q = extract_stream(
        spark, in_path, out_path, ckpt, available_now=True, transcode=True
    )
    q.awaitTermination(120)
    got = {r.url: r for r in spark.read.parquet(out_path).collect()}
    assert len(got) == 12
    for i in range(12):
        r = got[str(i)]
        assert bytes(r.text_bytes).decode("utf-8") == "stream café %d" % i
        assert r.encoding == ("utf-8", "utf-16-le", "windows-1252")[i % 3]


def test_charset_roundtrip_property():
    """Property: for ANY text encodable in a declared encoding, a page
    built as '<meta charset=L>' + encode(text) sniffs to that encoding
    and decodes to exactly the original text (hypothesis over the
    supported label set)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    labels = [
        ("utf-8", "utf-8"),
        ("windows-1252", "cp1252"),
        ("iso-8859-1", "cp1252"),
        ("shift_jis", "shift_jis"),
        ("euc-kr", "euc-kr"),
        ("koi8-r", "koi8-r"),
        ("gb18030", "gb18030"),
    ]

    @settings(max_examples=200, deadline=None, derandomize=True)
    @given(
        st.sampled_from(labels),
        st.text(
            alphabet=st.characters(
                codec="utf-8", exclude_characters='"<>&',
                exclude_categories=("Cs",),
            ),
            max_size=60,
        ),
    )
    def check(pair, text):
        label, codec = pair
        try:
            payload = text.encode(codec)
        except (UnicodeEncodeError, ValueError):
            return  # text not representable in this encoding — vacuous
        page = f'<meta charset="{label}"><p>'.encode("ascii") + payload
        enc, got = decode_page(page)
        assert got == f'<meta charset="{label}"><p>' + payload.decode(codec)
        assert got.endswith(text)

    check()


def test_sniff_hardening_review_findings():
    """Round-7 review regressions: (a) 'charset=' outside a <meta> tag
    (URLs, script srcs) must not hijack the sniff; (b) labels resolving
    to bytes-to-bytes codecs ('hex', 'zlib') must not crash the
    never-throws contract; (c) the utf-16 quirk covers the whole family
    under ANY label spelling python resolves ('utf16', 'u16')."""
    assert detect_encoding(b'<a href="/x?charset=koi8-r">caf\xc3\xa9')[0] == "utf-8"
    enc, text = decode_page(b'<a href="/x?charset=koi8-r"><p>caf\xc3\xa9</p>')
    assert enc == "utf-8" and "café" in text
    enc, _ = decode_page(b'<meta charset="hex"><p>\x01\x02')  # must not raise
    assert enc == "utf-8"
    assert detect_encoding(b'<meta charset="zlib">')[0] == "utf-8"
    assert detect_encoding(b'<meta charset="utf16">')[0] == "utf-8"
    assert detect_encoding(b'<meta charset="u16">')[0] == "utf-8"
    # the anchored form still resolves, case-insensitive, both shapes
    assert detect_encoding(b'<META CHARSET="KOI8-R">')[0] == "koi8-r"
    assert detect_encoding(b'<meta charset="cp437">')[0] == "cp437"


def test_sniff_second_review_findings():
    """(a) a generator string containing 'charset=<junk>' must not
    shadow a later resolvable <meta charset>; (b) '<metadata' and other
    longer tag names must not match the <meta prescan anchor."""
    assert (
        detect_encoding(
            b'<meta name="generator" content="cms; charset=x-legacy">'
            b'<meta charset="shift_jis">'
        )[0]
        == "shift_jis"
    )
    assert detect_encoding(b'<metadata charset="koi8-r"></metadata>')[0] == "utf-8"


def test_undeclared_legacy_falls_back_to_cp1252():
    """Content fallback: an UNDECLARED page (no BOM, no meta) that
    fails strict UTF-8 validation decodes as windows-1252 (the western
    legacy default) instead of a row of U+FFFD; valid UTF-8 and pure
    ASCII stay utf-8 (the byte-identity invariant)."""
    enc, text = decode_page(b"<html><body><p>caf\xe9 legacy</p></body></html>")
    assert enc == "windows-1252" and "café legacy" in text
    assert detect_encoding(b"<p>plain ascii</p>")[0] == "utf-8"
    assert detect_encoding("<p>café utf8</p>".encode("utf-8"))[0] == "utf-8"
