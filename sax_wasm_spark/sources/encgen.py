"""Writer twin for charset-sniff testing: deterministic non-UTF-8 pages.

Mirrors the pdfgen/warc-writer pattern: a vectorized UDF renders each
document's html *bytes* in a deterministically-cycled encoding so the
corpus exercises every sniff path of functions/charset.py — UTF-8 with
a <meta charset>, BOM'd UTF-16-LE, windows-1252 declared through the
http-equiv form (under its WHATWG alias label iso-8859-1), Shift_JIS,
and an undeclared-ASCII default-fallback page. The variant is a pure
function of the id column, so the bytes are identical regardless of
partitioning and the decoded text has a closed SQL form.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import BinaryType

N_ENC_VARIANTS = 5

# (python codec, BOM bytes, reported label after sniff)
_VARIANTS: list[tuple[str, bytes, str]] = [
    ("utf-8", b"", "utf-8"),
    ("utf-16-le", b"\xff\xfe", "utf-16-le"),
    ("cp1252", b"", "windows-1252"),
    ("shift_jis", b"", "shift_jis"),
    ("utf-8", b"", "utf-8"),
]

# head fragment per variant (part of the page TEXT, pre-encoding)
META = [
    '<meta charset="utf-8">',
    "",
    '<meta http-equiv="Content-Type"'
    ' content="text/html; charset=iso-8859-1">',
    '<meta charset="shift_jis">',
    "",
]

# non-ASCII tail per variant — each encodable in its variant's codec
SUFFIX = [
    " résumé ✓",  # utf-8: résumé ✓
    " balloon \U0001f388",  # utf-16-le: astral plane
    " café …±",  # cp1252: 0xE9, 0x85, 0xB1 high bytes
    " カタカナ",  # shift_jis: katakana
    " plain",  # undeclared ascii → default utf-8
]


@pandas_udf(BinaryType())
def _encode_variant_udf(text: pd.Series, variant: pd.Series) -> pd.Series:
    out = []
    for t, v in zip(text, variant):
        codec, bom, _ = _VARIANTS[int(v) % N_ENC_VARIANTS]
        # errors='replace': a corpus character outside the variant's
        # repertoire degrades to '?' instead of killing the task (the
        # oracle suffixes are chosen encodable, so closed forms hold)
        out.append(bom + t.encode(codec, errors="replace"))
    return pd.Series(out, dtype=object)


def render_encoded_pages(
    df: DataFrame, text_col: str = "html_text", variant_col: str = "variant",
    out_col: str = "html",
) -> DataFrame:
    """(id…, html_text:string, variant:int) → adds ``out_col:binary`` =
    the page text encoded per the variant cycle (BOM included where the
    variant declares one)."""
    return df.withColumn(
        out_col, _encode_variant_udf(F.col(text_col), F.col(variant_col))
    )
