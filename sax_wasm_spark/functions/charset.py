"""Charset sniffing + transcoding for raw crawl pages.

Real Common-Crawl HTML is served in dozens of encodings; the SAX kernel
(like the reference parser, /root/reference/src/sax/parser.rs — UTF-8
grapheme cursor) consumes UTF-8 bytes. This module is the front porch:
sniff the page's encoding the way browsers do (a WHATWG-encoding-spec
subset), decode to unicode, and hand the pipeline UTF-8.

Sniff precedence (https://encoding.spec.whatwg.org + HTML §13.2.3.2,
reimplemented from the public spec text):

1. **BOM** — EF BB BF → utf-8, FF FE → utf-16-le, FE FF → utf-16-be.
   The BOM wins over everything, including a contradicting <meta>.
2. **meta prescan** — the first 1024 bytes are scanned (ASCII-superset
   safe) for a ``charset=`` declaration; this covers both
   ``<meta charset=x>`` and ``<meta http-equiv="Content-Type"
   content="text/html; charset=x">`` since both carry the literal
   ``charset=``. Labels normalize per the WHATWG encodings table
   (subset below); per the spec's quirk, a meta claiming utf-16 is
   treated as utf-8 (a page readable enough to prescan cannot be
   utf-16), and x-user-defined maps to windows-1252 in the meta path.
3. **content fallback** — strict-validate as UTF-8 first (UTF-8 is
   self-synchronizing: real UTF-8 essentially never fails validation,
   and legacy single-byte text with high bytes essentially never
   passes it), else windows-1252 — the browsers' western legacy
   default and the overwhelmingly most common undeclared legacy
   encoding in practice. (The spec's locale-default table is a crawler
   policy knob, not page evidence; this pair covers the reality.)

Decoding never throws: undecodable byte sequences become U+FFFD so a
mislabeled page degrades, it doesn't poison the partition.

All of it is vectorized: one Arrow-batched pandas UDF per column, no
per-row Python UDFs (the per-element loop runs over a materialized
pandas block inside the batch, exactly like the kernel's other
binary-column front-ends).
"""

from __future__ import annotations

import codecs
import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType, StructField, StructType

# WHATWG label → python codec (subset of the encodings table; every
# label the table maps to windows-1252 — ascii, latin1, iso-8859-1 and
# friends — lands on cp1252, which is WHATWG-correct and also matches
# the kernel's WinAnsi show-string convention).
_LABELS: dict[str, str] = {
    "utf-8": "utf-8",
    "utf8": "utf-8",
    "unicode-1-1-utf-8": "utf-8",
    "us-ascii": "cp1252",
    "ascii": "cp1252",
    "iso-8859-1": "cp1252",
    "iso8859-1": "cp1252",
    "latin1": "cp1252",
    "latin-1": "cp1252",
    "l1": "cp1252",
    "windows-1252": "cp1252",
    "cp1252": "cp1252",
    "x-cp1252": "cp1252",
    "iso-8859-2": "iso8859-2",
    "latin2": "iso8859-2",
    "iso-8859-5": "iso8859-5",
    "iso-8859-7": "iso8859-7",
    "iso-8859-9": "cp1254",  # WHATWG: iso-8859-9 label → windows-1254
    "iso-8859-15": "iso8859-15",
    "windows-1250": "cp1250",
    "windows-1251": "cp1251",
    "cp1251": "cp1251",
    "windows-1254": "cp1254",
    "windows-1256": "cp1256",
    "koi8-r": "koi8-r",
    "koi8-u": "koi8-u",
    "shift_jis": "shift_jis",
    "shift-jis": "shift_jis",
    "sjis": "shift_jis",
    "x-sjis": "shift_jis",
    "ms_kanji": "shift_jis",
    "euc-jp": "euc-jp",
    "iso-2022-jp": "iso2022_jp",
    "gbk": "gbk",
    "gb2312": "gbk",  # WHATWG maps the gb2312 label to GBK
    "gb_2312": "gbk",
    "chinese": "gbk",
    "gb18030": "gb18030",
    "big5": "big5",
    "big5-hkscs": "big5hkscs",
    "euc-kr": "euc-kr",
    "korean": "euc-kr",
    "ks_c_5601-1987": "euc-kr",
    "utf-16": "utf-8",  # spec quirk: meta-declared utf-16 → utf-8
    "utf-16le": "utf-8",
    "utf-16be": "utf-8",
    "x-user-defined": "cp1252",
}

# canonical label reported per python codec (what `encoding` columns say)
_REPORT: dict[str, str] = {
    "utf-8": "utf-8",
    "utf-16-le": "utf-16-le",
    "utf-16-be": "utf-16-be",
    "cp1252": "windows-1252",
    "cp1250": "windows-1250",
    "cp1251": "windows-1251",
    "cp1254": "windows-1254",
    "cp1256": "windows-1256",
    "iso8859-2": "iso-8859-2",
    "iso8859-5": "iso-8859-5",
    "iso8859-7": "iso-8859-7",
    "iso8859-15": "iso-8859-15",
    "shift_jis": "shift_jis",
    "euc-jp": "euc-jp",
    "iso2022_jp": "iso-2022-jp",
    "gbk": "gbk",
    "gb18030": "gb18030",
    "big5": "big5",
    "big5hkscs": "big5-hkscs",
    "euc-kr": "euc-kr",
    "koi8-r": "koi8-r",
    "koi8-u": "koi8-u",
}

# charset= is honored only INSIDE a <meta ...> tag (covers both the
# charset attribute and the http-equiv content= form) — a bare
# "charset=" in a URL or script src in the first KiB must NOT hijack
# the sniff (the WHATWG prescan walks meta attributes; this is the
# bounded-regex approximation of that rule).
_META_RE = re.compile(
    rb"<meta[\s/][^>]{0,512}?charset\s*=\s*[\"']?\s*([a-zA-Z0-9_:.+-]+)",
    re.IGNORECASE,
)
_PRESCAN = 1024


def _codec_for_label(label: bytes) -> str | None:
    name = label.decode("ascii", "replace").strip().lower()
    codec = _LABELS.get(name)
    if codec is not None:
        return codec
    # Permissive tail: any label python itself knows — but ONLY real
    # text encodings (codecs.lookup also resolves bytes-to-bytes codecs
    # like 'hex'/'zlib', whose .decode would raise LookupError inside
    # the never-throws UDF), and the WHATWG utf-16 quirk applies to the
    # whole family regardless of label spelling ('utf16', 'u16', …).
    try:
        info = codecs.lookup(name)
    except LookupError:
        return None
    if not getattr(info, "_is_text_encoding", True):
        return None
    if info.name.startswith(("utf-16", "utf-32")):
        return "utf-8"  # spec quirk: ASCII-prescannable page cannot be
    return info.name


def detect_encoding(data: bytes) -> tuple[str, int]:
    """→ (python codec name, BOM length to strip). Pure function of the
    first KiB; never raises."""
    if data[:3] == b"\xef\xbb\xbf":
        return "utf-8", 3
    if data[:2] == b"\xff\xfe":
        return "utf-16-le", 2
    if data[:2] == b"\xfe\xff":
        return "utf-16-be", 2
    # keep walking like the WHATWG prescan: an earlier meta whose
    # content merely CONTAINS 'charset=<junk>' (generator strings) must
    # not shadow a later resolvable declaration
    for m in _META_RE.finditer(data[:_PRESCAN]):
        codec = _codec_for_label(m.group(1))
        if codec is not None:
            return codec, 0
    # undeclared: validate as utf-8, else the western legacy default —
    # an undeclared cp1252 page decodes to its real text instead of a
    # row of U+FFFD
    try:
        data.decode("utf-8")
        return "utf-8", 0
    except UnicodeDecodeError:
        return "cp1252", 0


def decode_page(data: bytes | None) -> tuple[str, str]:
    """→ (reported encoding label, decoded text). NULL-safe; undecodable
    sequences become U+FFFD."""
    if data is None:
        return "utf-8", ""
    codec, bom = detect_encoding(bytes(data))
    text = bytes(data)[bom:].decode(codec, "replace")
    return _REPORT.get(codec, codec), text


_DECODE_SCHEMA = StructType(
    [
        StructField("encoding", StringType(), False),
        StructField("text", StringType(), False),
    ]
)


@pandas_udf(_DECODE_SCHEMA)
def _decode_udf(data: pd.Series) -> pd.DataFrame:
    pairs = [decode_page(d) for d in data]
    return pd.DataFrame(pairs, columns=["encoding", "text"], dtype=object)


def decode_html_column(
    df: DataFrame,
    html_col: str = "html",
    out_text: str = "html_text",
    out_encoding: str = "encoding",
) -> DataFrame:
    """Adds (out_encoding:string, out_text:string) sniff-decoded from
    ``html_col``; the binary column passes through untouched."""
    dec = _decode_udf(F.col(html_col))
    return df.withColumns(
        {out_encoding: dec["encoding"], out_text: dec["text"]}
    )


def pages_to_utf8(
    df: DataFrame, html_col: str = "html", out_encoding: str = "encoding"
) -> DataFrame:
    """The pipeline front porch: sniff + transcode ``html_col`` IN
    PLACE to UTF-8 bytes (what the tokenizer consumes) and record the
    source encoding. Pages already utf-8 without BOM re-encode to the
    identical bytes, so downstream byte-identity is preserved for the
    utf-8 majority."""
    decoded = decode_html_column(df, html_col, "__t", out_encoding)
    return decoded.withColumn(
        html_col, F.encode(F.col("__t"), "UTF-8")
    ).drop("__t")


@pandas_udf(StringType())
def _nfc_udf(texts: pd.Series) -> pd.Series:
    import unicodedata  # noqa: PLC0415

    return pd.Series(
        [
            unicodedata.normalize("NFC", t) if isinstance(t, str) else t
            for t in texts
        ],
        dtype=object,
    )


def nfc_normalize_column(
    df: DataFrame, text_col: str = "text", out_col: str | None = None
) -> DataFrame:
    """Unicode NFC normalization (the canonical-composition pass real
    text pipelines run before hashing/dedup — 'café' spelled with a
    combining acute and 'café' precomposed must hash identically).
    Vectorized pandas UDF (Spark has no normalization built-in);
    NULL-safe; ``out_col=None`` rewrites ``text_col`` in place."""
    return df.withColumn(out_col or text_col, _nfc_udf(F.col(text_col)))
