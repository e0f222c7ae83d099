"""ZIP reader (kernel/zipread.py) and the OOXML/DOCX tier behind q87:
central-directory truth, CRC verification, stdlib interop in both
directions, typed rejections, and the docxgen twin's closed forms."""

from __future__ import annotations

import io
import struct
import zipfile

import pytest

from sax_wasm_spark.kernel.zipread import (
    ZipError,
    zip_entries,
    zip_find,
    zip_read,
    zip_write,
)
from sax_wasm_spark.sources.docxgen import (
    build_docx,
    docx_document_xml,
    docx_para_text,
    n_docx_paras,
)

MEMBERS = [
    ("a.txt", b"hello world"),
    ("dir/b.xml", b"<x>" + b"data" * 500 + b"</x>"),
    ("empty", b""),
]


class TestZip:
    @pytest.mark.parametrize("deflate", [True, False])
    def test_roundtrip_and_stdlib_reads_ours(self, deflate):
        blob = zip_write(MEMBERS, deflate=deflate)
        assert [e.name for e in zip_entries(blob)] == [m[0] for m in MEMBERS]
        for e, (_nm, body) in zip(zip_entries(blob), MEMBERS):
            assert zip_read(blob, e) == body
        zf = zipfile.ZipFile(io.BytesIO(blob))
        for nm, body in MEMBERS:
            assert zf.read(nm) == body

    def test_we_read_stdlib(self):
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
            for nm, body in MEMBERS:
                zf.writestr(nm, body)
        blob = buf.getvalue()
        for nm, body in MEMBERS:
            assert zip_find(blob, nm) == body

    def test_trailing_comment_eocd_scan(self):
        blob = zip_write(MEMBERS) + b"\x00" * 100  # junk after EOCD? no—
        # a REAL comment: patch the EOCD comment length instead
        base = zip_write(MEMBERS)
        data = bytearray(base + b"x" * 40)
        struct.pack_into("<H", data, len(base) - 2, 40)
        assert zip_find(bytes(data), "a.txt") == b"hello world"
        del blob

    def test_missing_member_typed(self):
        with pytest.raises(ZipError, match="not found"):
            zip_find(zip_write(MEMBERS), "nope")

    def test_not_a_zip_typed(self):
        with pytest.raises(ZipError):
            zip_entries(b"PK\x03\x04 but no central directory")

    def test_crc_mismatch_typed(self):
        blob = bytearray(zip_write(MEMBERS, deflate=False))
        at = blob.index(b"hello world")
        blob[at] = ord("H")
        entries = zip_entries(bytes(blob))
        with pytest.raises(ZipError, match="CRC"):
            zip_read(bytes(blob), entries[0])

    def test_encrypted_rejected(self):
        blob = bytearray(zip_write(MEMBERS))
        # set the encryption bit in the first CD entry's flags
        at = blob.index(b"PK\x01\x02") + 8
        struct.pack_into("<H", blob, at, 0x0801)
        with pytest.raises(ZipError, match="encrypted"):
            zip_entries(bytes(blob))

    def test_cd_is_authoritative_over_local(self):
        """Smuggled local-header sizes must not matter: only name/extra
        lengths are read from the local header."""
        blob = bytearray(zip_write(MEMBERS, deflate=False))
        at = blob.index(b"PK\x03\x04") + 18  # local compressed size
        struct.pack_into("<I", blob, at, 3)  # lie
        assert zip_find(bytes(blob), "a.txt") == b"hello world"


class TestDocxTwin:
    @pytest.mark.parametrize("doc_id", [0, 1, 2, 3, 7, 1003])
    def test_closed_forms_via_stdlib_unzip(self, doc_id):
        """The package is REAL: stdlib zipfile extracts it and the
        document.xml matches the generator's XML."""
        zf = zipfile.ZipFile(io.BytesIO(build_docx(doc_id)))
        assert set(zf.namelist()) == {
            "[Content_Types].xml", "_rels/.rels", "word/document.xml",
        }
        assert zf.read("word/document.xml") == docx_document_xml(doc_id)

    def test_para_text_forms(self):
        # paragraph text: base + tab-extension on odd + break on last
        assert docx_para_text(2, 0) == "Para 0 of doc 2"
        assert docx_para_text(3, 1) == "Para 1 of doc 3\ttabbed 1"
        n = n_docx_paras(7)
        assert docx_para_text(7, n - 1).endswith("\nafter break")

    def test_zip_method_cycles_by_parity(self):
        even = zip_entries(build_docx(2))
        odd = zip_entries(build_docx(3))
        assert all(e.method == 8 for e in even)
        assert all(e.method == 0 for e in odd)


class TestEpub:
    """EPUB package resolution + chapter extraction (q88)."""

    @pytest.mark.parametrize("doc_id", [0, 1, 2, 5, 1001])
    def test_spine_rotation(self, doc_id):
        from sax_wasm_spark.operators.metadata import epub_spine
        from sax_wasm_spark.sources.epubgen import (
            build_epub,
            chapter_text,
            n_chapters,
            spine_chapter,
        )

        chapters = epub_spine(build_epub(doc_id))
        assert len(chapters) == n_chapters(doc_id)
        for s, path, xhtml in chapters:
            j = spine_chapter(doc_id, s)
            assert path == f"OEBPS/ch{j}.xhtml"
            assert chapter_text(doc_id, j).encode() in xhtml

    def test_mimetype_stored_first(self):
        from sax_wasm_spark.sources.epubgen import build_epub

        data = build_epub(4)
        entries = zip_entries(data)
        assert entries[0].name == "mimetype" and entries[0].method == 0
        # spec: the stored mimetype's BYTES start at a fixed offset (30
        # + len('mimetype')) so magic-sniffers can read it raw
        assert data[38:58] == b"application/epub+zip"

    def test_stdlib_reads_the_package(self):
        import io
        import zipfile

        from sax_wasm_spark.sources.epubgen import build_epub, content_opf

        zf = zipfile.ZipFile(io.BytesIO(build_epub(5)))
        assert zf.read("mimetype") == b"application/epub+zip"
        assert zf.read("OEBPS/content.opf") == content_opf(5)

    def test_broken_spine_typed(self):
        from sax_wasm_spark.operators.metadata import epub_spine
        from sax_wasm_spark.sources.epubgen import (
            _CONTAINER,
            chapter_xhtml,
            content_opf,
        )

        opf = content_opf(2).replace(b'idref="ch', b'idref="zz', 1)
        data = zip_write(
            [
                ("mimetype", b"application/epub+zip", False),
                ("META-INF/container.xml", _CONTAINER.encode()),
                ("OEBPS/content.opf", opf),
                ("OEBPS/ch0.xhtml", chapter_xhtml(2, 0)),
            ]
        )
        with pytest.raises(ValueError, match="not in manifest"):
            epub_spine(data)

    def test_missing_container_typed(self):
        from sax_wasm_spark.kernel.zipread import ZipError
        from sax_wasm_spark.operators.metadata import epub_spine

        with pytest.raises(ZipError):
            epub_spine(zip_write([("a", b"b")]))


class TestReviewFixes:
    def test_deflate_bomb_capped(self):
        """A member whose deflate stream inflates past the declared
        uncompressed size dies typed WITHOUT full inflation."""
        import zlib

        bomb = zlib.compressobj(9, zlib.DEFLATED, -15)
        payload = bomb.compress(b"\x00" * (1 << 22)) + bomb.flush()
        blob = bytearray(zip_write([("a", b"tiny")], deflate=True))
        # graft the bomb in place of the real member data, keep CD sizes
        entries = zip_entries(bytes(blob))
        e = entries[0]
        # rebuild: local header + name + bomb, CD claiming tiny sizes
        import struct as _s

        local_end = blob.index(b"PK\x01\x02")
        head = bytes(blob[: 30 + 1])  # local header + name 'a'
        cd = bytes(blob[local_end:])
        out = bytearray(head) + payload
        cd_off = len(out)
        out += cd
        # patch local+CD comp_size to the bomb's size, EOCD cd offset
        _s.pack_into("<I", out, 18, len(payload))
        cd_at = out.index(b"PK\x01\x02")
        _s.pack_into("<I", out, cd_at + 20, len(payload))
        eocd_at = out.rindex(b"PK\x05\x06")
        _s.pack_into("<I", out, eocd_at + 16, cd_off)
        entry = zip_entries(bytes(out))[0]
        assert entry.comp_size == len(payload) and entry.uncomp_size == 4
        with pytest.raises(ZipError):
            zip_read(bytes(out), entry)
        del e


class TestXlsxTwin:
    """q90's SpreadsheetML corpus + operator edge cases."""

    @pytest.mark.parametrize("doc_id", [0, 1, 2, 5, 1002])
    def test_package_is_real(self, doc_id):
        import io
        import zipfile

        from sax_wasm_spark.sources.xlsxgen import build_xlsx

        zf = zipfile.ZipFile(io.BytesIO(build_xlsx(doc_id)))
        assert "xl/worksheets/sheet1.xml" in zf.namelist()
        assert b"<sheetData>" in zf.read("xl/worksheets/sheet1.xml")

    def test_missing_shared_strings_degrades(self, spark):
        """A sheet referencing a shared string the table lacks yields
        NULL value, never a crash; packages WITHOUT a sharedStrings
        member still extract their number/inline cells."""
        from sax_wasm_spark.kernel.zipread import zip_write
        from sax_wasm_spark.operators.metadata import extract_xlsx_cells

        sheet = (
            b'<worksheet><sheetData><row r="1">'
            b'<c r="A1" t="s"><v>7</v></c>'
            b'<c r="B1"><v>42</v></c>'
            b"</row></sheetData></worksheet>"
        )
        pkg = zip_write([("xl/worksheets/sheet1.xml", sheet)])
        df = spark.createDataFrame([(0, pkg)], "doc_id long, xlsx binary")
        got = {(r.row_idx, r.col_idx): r for r in extract_xlsx_cells(df).collect()}
        assert got[(0, 0)].kind == "shared" and got[(0, 0)].value is None
        assert got[(0, 1)].kind == "number" and got[(0, 1)].value == "42"


class TestTar:
    """ustar reader/writer (kernel/tarread.py) behind q91."""

    @pytest.mark.parametrize("gz", [False, True])
    def test_roundtrip_and_stdlib_interop(self, gz):
        import io
        import tarfile

        from sax_wasm_spark.kernel.tarread import tar_members, tar_write

        members = [("d/", b""), ("d/a.txt", b"hello"), ("b.bin", bytes(300))]
        blob = tar_write(members, gzip_wrap=gz)
        got = tar_members(blob)
        assert [(m.name, m.typeflag) for m in got] == [
            ("d/", "5"), ("d/a.txt", "0"), ("b.bin", "0"),
        ]
        assert got[1].data == b"hello"
        tf = tarfile.open(fileobj=io.BytesIO(blob), mode="r:gz" if gz else "r:")
        assert tf.extractfile("d/a.txt").read() == b"hello"

    def test_we_read_stdlib(self):
        import io
        import tarfile

        from sax_wasm_spark.kernel.tarread import tar_members

        buf = io.BytesIO()
        with tarfile.open(fileobj=buf, mode="w") as tf:
            info = tarfile.TarInfo("x.txt")
            info.size = 3
            tf.addfile(info, io.BytesIO(b"abc"))
        assert tar_members(buf.getvalue())[0].data == b"abc"

    def test_checksum_verified(self):
        from sax_wasm_spark.kernel.tarread import (
            TarError,
            tar_members,
            tar_write,
        )

        blob = bytearray(tar_write([("a.txt", b"x")]))
        blob[50] ^= 1
        with pytest.raises(TarError, match="checksum"):
            tar_members(bytes(blob))

    def test_gzip_bomb_capped(self):
        import zlib

        from sax_wasm_spark.kernel.tarread import TarError, gunzip

        co = zlib.compressobj(9, zlib.DEFLATED, 31)
        bomb = co.compress(b"\x00" * (1 << 22)) + co.flush()
        with pytest.raises(TarError, match="max_out"):
            gunzip(bomb, max_out=1 << 16)

    def test_extension_typeflags_typed(self):
        from sax_wasm_spark.kernel.tarread import (
            TarError,
            tar_members,
            tar_write,
        )

        blob = bytearray(tar_write([("a.txt", b"x")]))
        blob[156] = ord("x")  # pax extended header
        # fix the checksum for the mutated byte
        chk = sum(blob[:148]) + 8 * 0x20 + sum(blob[156:512])
        blob[148:156] = b"%06o\x00 " % chk
        with pytest.raises(TarError, match="typeflag"):
            tar_members(bytes(blob))

    def test_truncated_member_typed(self):
        from sax_wasm_spark.kernel.tarread import (
            TarError,
            tar_members,
            tar_write,
        )

        blob = tar_write([("a.txt", b"y" * 600)])
        with pytest.raises(TarError, match="truncated"):
            tar_members(blob[:700])


class TestThirdReviewFixes:
    """Third round-7 review findings (q89-q91 block), pinned."""

    def test_tar_unknown_typeflag_data_skipped(self):
        """POSIX: skip size-rounded data for typeflags we don't decode
        — a type-7 member with data must not desync the walk."""
        import io
        import tarfile

        from sax_wasm_spark.kernel.tarread import tar_members

        buf = io.BytesIO()
        with tarfile.open(fileobj=buf, mode="w") as tf:
            info = tarfile.TarInfo("cont.dat")
            info.type = tarfile.CONTTYPE
            info.size = 600
            tf.addfile(info, io.BytesIO(b"z" * 600))
            info2 = tarfile.TarInfo("after.txt")
            info2.size = 3
            tf.addfile(info2, io.BytesIO(b"abc"))
        got = tar_members(buf.getvalue())
        assert got[0].typeflag == "7" and got[0].data == b"z" * 600
        assert got[1].data == b"abc"

    def test_tar_truncation_always_typed(self):
        from sax_wasm_spark.kernel.tarread import (
            TarError,
            tar_members,
            tar_write,
        )

        plain = tar_write([("a.txt", b"y")])
        with pytest.raises(TarError, match="marker"):
            tar_members(plain[:-1024])  # ends ON a member boundary
        with pytest.raises(TarError):
            tar_members(b"")

    def test_truncated_gzip_typed(self):
        import zlib

        from sax_wasm_spark.kernel.tarread import (
            TarError,
            tar_members,
            tar_write,
        )

        co = zlib.compressobj(6, zlib.DEFLATED, 31)
        full = co.compress(tar_write([("a.txt", b"y" * 40000)])) + co.flush()
        with pytest.raises(TarError):
            tar_members(full[: len(full) // 2])

    def test_tar_empty_archive_row_survives(self, spark):
        from sax_wasm_spark.kernel.tarread import tar_write
        from sax_wasm_spark.operators.metadata import extract_tar_members

        df = spark.createDataFrame(
            [(0, tar_write([]))], "doc_id long, tarball binary"
        )
        r = extract_tar_members(df).collect()[0]
        assert r.kind == "empty" and r.member_idx is None

    def test_xlsx_wide_columns_and_error_rows(self, spark):
        from sax_wasm_spark.operators.metadata import extract_xlsx_cells

        sheet = (
            b'<worksheet><sheetData><row r="2">'
            b'<c r="AA2" t="inlineStr"><is><t>two\nlines</t></is></c>'
            b"</row></sheetData></worksheet>"
        )
        rows = [(0, zip_write([("xl/worksheets/sheet1.xml", sheet)])),
                (1, b"not a zip")]
        df = spark.createDataFrame(rows, "doc_id long, xlsx binary")
        got = {r.doc_id: r for r in extract_xlsx_cells(df).collect()}
        assert (got[0].row_idx, got[0].col_idx) == (1, 26)
        assert got[0].value == "two\nlines"  # newline fragments rejoin
        assert got[1].kind.startswith("error:")

    def test_feed_trailing_decoy_and_multiline(self, spark):
        from sax_wasm_spark.operators.metadata import parse_feed_items

        xml = (
            b'<rss version="2.0"><channel>'
            b"<item><title>Line one\nLine two</title></item>"
            b"<link>https://decoy/</link>"
            b"</channel></rss>"
        )
        df = spark.createDataFrame([(0, xml)], "doc_id long, xml binary")
        r = parse_feed_items(df).collect()[0]
        assert r.title == "Line one\nLine two"
        assert r.link is None  # the trailing channel link never attaches
