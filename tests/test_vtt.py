"""WebVTT parser (kernel/vttparse.py): timing forms, block skipping,
cue-text cleanup, lenient malformed-cue policy, typed rejections, and
the vttgen corpus twin's closed forms behind q81."""

from __future__ import annotations

import pytest

from sax_wasm_spark.kernel.vttparse import (
    VttError,
    clean_cue_text,
    parse_vtt,
)
from sax_wasm_spark.sources.vttgen import (
    build_vtt,
    cue_text,
    cue_times,
    vtt_shape,
)


def _vtt(body: str) -> bytes:
    return ("WEBVTT\n\n" + body).encode()


class TestParsing:
    def test_basic_cue(self):
        cues = parse_vtt(_vtt("00:01.000 --> 00:02.500\nhello\n"))
        assert len(cues) == 1
        c = cues[0]
        assert (c.start_ms, c.end_ms, c.text) == (1000, 2500, "hello")
        assert c.cue_id is None and c.settings is None

    def test_hours_and_settings(self):
        cues = parse_vtt(
            _vtt("01:02:03.456 --> 01:02:04.000 align:start line:0\nx")
        )
        c = cues[0]
        assert c.start_ms == 3_723_456
        assert c.settings == "align:start line:0"

    def test_identifier_line(self):
        cues = parse_vtt(_vtt("intro\n00:00.000 --> 00:01.000\nhi"))
        assert cues[0].cue_id == "intro"

    def test_multiline_payload(self):
        cues = parse_vtt(_vtt("00:00.000 --> 00:01.000\nline one\nline two"))
        assert cues[0].text == "line one\nline two"

    def test_note_style_region_skipped(self):
        cues = parse_vtt(
            _vtt(
                "NOTE a comment\nspanning lines\n\n"
                "STYLE\n::cue { color: red }\n\n"
                "REGION\nid:r1\n\n"
                "00:00.000 --> 00:01.000\nreal"
            )
        )
        assert len(cues) == 1 and cues[0].text == "real"

    def test_header_metadata_block(self):
        data = "WEBVTT - with title\nKind: captions\n\n00:00.000 --> 00:01.000\nx"
        assert parse_vtt(data.encode())[0].text == "x"

    def test_malformed_timing_skips_cue_only(self):
        cues = parse_vtt(
            _vtt(
                "00:00.000 --> garbage\nbad\n\n"
                "00:05.000 --> 00:06.000\ngood"
            )
        )
        assert len(cues) == 1 and cues[0].start_ms == 5000

    def test_crlf_and_bom(self):
        data = "﻿WEBVTT\r\n\r\n00:00.000 --> 00:01.000\r\nx\r\n"
        assert parse_vtt(data.encode("utf-8"))[0].text == "x"

    def test_whitespace_only_blank_line(self):
        data = "WEBVTT\n \t\n00:00.000 --> 00:01.000\nx"
        assert parse_vtt(data.encode())[0].text == "x"

    def test_not_vtt_typed(self):
        with pytest.raises(VttError, match="signature"):
            parse_vtt(b"SRT or something\n1\n00:00:00,000 --> 00:00:01,000")
        with pytest.raises(VttError, match="signature"):
            parse_vtt(b"WEBVTTX\n\n")  # signature must end the token

    def test_identifier_only_block_skipped(self):
        cues = parse_vtt(_vtt("orphan id line\n\n00:01.000 --> 00:02.000\nx"))
        assert len(cues) == 1


class TestCleanup:
    def test_voice_and_class_spans(self):
        assert (
            clean_cue_text("<v Jim Hall>hello <c.loud>WORLD</c></v>")
            == "hello WORLD"
        )

    def test_inline_timestamps(self):
        assert clean_cue_text("a<00:01:02.000>b<00:05.000>c") == "abc"

    def test_references(self):
        # &nbsp; is U+00A0 per spec, not an ASCII space
        assert clean_cue_text("a &amp; b &lt;tag&gt;&nbsp;!") == "a & b <tag>\xa0!"

    def test_unknown_reference_passes_through(self):
        assert clean_cue_text("caf&eacute;") == "caf&eacute;"

    def test_italic_bold_ruby(self):
        assert (
            clean_cue_text("<i>it</i> <b>bo</b> <ruby>r<rt>anno</rt></ruby>")
            == "it bo ranno"
        )

    def test_comparison_text_untouched(self):
        # a bare '<' that is not a known span survives (crawl truth)
        assert clean_cue_text("3 < 5 but <i>styled</i>") == "3 < 5 but styled"


class TestTwin:
    @pytest.mark.parametrize("doc_id", [0, 1, 7, 42, 999])
    def test_closed_forms(self, doc_id):
        for k in range(1 + doc_id % 2):
            cues = parse_vtt(build_vtt(doc_id, k))
            assert len(cues) == vtt_shape(doc_id, k)
            for i, c in enumerate(cues):
                assert (c.start_ms, c.end_ms) == cue_times(doc_id, k, i)
                assert c.text == cue_text(doc_id, k, i)
                assert (c.cue_id == f"cue-{doc_id}-{k}-{i}") == (i % 2 == 0)
                assert (c.settings == "align:start") == (i % 3 == 0)


class TestReviewFixes:
    """Round-7 review findings on the caption tier, pinned."""

    def test_note_prefix_is_a_cue_id(self):
        """'NOTES for scene 1' is a cue IDENTIFIER (spec: NOTE must be
        followed by whitespace/EOL to open a comment block)."""
        cues = parse_vtt(_vtt("NOTES for scene 1\n00:01.000 --> 00:02.000\nx"))
        assert len(cues) == 1 and cues[0].cue_id == "NOTES for scene 1"
        cues = parse_vtt(_vtt("REGIONAL-2\n00:01.000 --> 00:02.000\ny"))
        assert len(cues) == 1 and cues[0].cue_id == "REGIONAL-2"
        # the bare keyword still opens a comment block
        assert parse_vtt(_vtt("NOTE\nreal note\n\nNOTE with text")) == []

    def test_empty_file_yields_status_row(self, spark):
        """A valid cue-less WEBVTT file must surface as status='empty',
        never vanish from the operator output."""
        from sax_wasm_spark.operators.multimodal import parse_caption_cues

        rows = [(0, 0, b"WEBVTT\n"), (1, 0, b"not vtt"), (2, 0, build_vtt(2, 0))]
        df = spark.createDataFrame(rows, "doc_id long, cap_idx int, vtt binary")
        got = parse_caption_cues(df, id_cols=("doc_id", "cap_idx")).collect()
        by_doc = {}
        for r in got:
            by_doc.setdefault(r.doc_id, []).append(r)
        assert by_doc[0][0].status == "empty" and by_doc[0][0].text is None
        assert by_doc[1][0].status.startswith("error:")
        assert all(r.status == "ok" for r in by_doc[2])


class TestSrt:
    """SubRip parser + sniff (q84's second wire format)."""

    def test_basic(self):
        from sax_wasm_spark.kernel.vttparse import parse_srt

        cues = parse_srt(
            b"1\n00:00:01,500 --> 00:00:03,000\nhello <i>world</i>\n\n"
            b"2\n00:00:04,000 --> 00:00:05,250 X1:10\nsecond\nline"
        )
        assert len(cues) == 2
        assert (cues[0].cue_id, cues[0].start_ms, cues[0].end_ms) == ("1", 1500, 3000)
        assert cues[0].text == "hello world"
        assert cues[1].settings == "X1:10" and cues[1].text == "second\nline"

    def test_literal_ampersand_kept(self):
        from sax_wasm_spark.kernel.vttparse import parse_srt

        cues = parse_srt(b"1\n00:00:00,000 --> 00:00:01,000\nA &amp; B & C")
        assert cues[0].text == "A &amp; B & C"  # SRT has no references

    def test_malformed_block_skipped(self):
        from sax_wasm_spark.kernel.vttparse import parse_srt

        cues = parse_srt(
            b"1\nnot a timing line\nx\n\n2\n00:00:01,000 --> 00:00:02,000\nok"
        )
        assert len(cues) == 1 and cues[0].text == "ok"

    def test_not_srt_typed(self):
        from sax_wasm_spark.kernel.vttparse import VttError, parse_srt

        with pytest.raises(VttError, match="SubRip"):
            parse_srt(b"just some prose, no cues anywhere")

    def test_sniff(self):
        from sax_wasm_spark.kernel.vttparse import sniff_captions

        assert sniff_captions(b"WEBVTT\n\n...") == "vtt"
        assert sniff_captions("﻿WEBVTT - x".encode()) == "vtt"
        assert sniff_captions(b"1\n00:00:01,000 --> 00:00:02,000\nx") == "srt"
        assert sniff_captions(b"garbage") == "vtt"  # strict parse rejects

    @pytest.mark.parametrize("doc_id", [0, 3, 17, 205])
    def test_twin_closed_forms(self, doc_id):
        from sax_wasm_spark.kernel.vttparse import parse_srt
        from sax_wasm_spark.sources.vttgen import (
            build_srt,
            srt_cue_text,
        )

        for k in (0, 1):
            cues = parse_srt(build_srt(doc_id, k))
            assert len(cues) == vtt_shape(doc_id, k)
            for i, c in enumerate(cues):
                assert c.cue_id == str(i + 1)
                assert (c.start_ms, c.end_ms) == cue_times(doc_id, k, i)
                assert c.text == srt_cue_text(doc_id, k, i)
