"""SQL surface for the tokenizer: a Python UDTF so the event stream is
queryable directly from Spark SQL via LATERAL join —

    SELECT d.doc_id, s.event, s.name, s.value
    FROM docs d, LATERAL sax_parse(d.html) s

This is the UDF/UDTF row of SURVEY.md §2.4: the same kernel, exposed as
a table function for SQL-first users (the DataFrame operators in
operators/tokenize.py remain the Arrow-batched hot path)."""

from __future__ import annotations

from pyspark.sql.functions import udtf

_RETURN_SCHEMA = (
    "event int, event_idx int, name string, value binary, attr_name binary, "
    "attr_value binary, attr_type int, self_closing boolean, target binary, "
    "content binary, line_start bigint, char_start bigint, line_end bigint, "
    "char_end bigint, byte_start bigint, byte_end bigint"
)


@udtf(returnType=_RETURN_SCHEMA)
class SaxParseUDTF:
    """One output row per SAX event of the input document."""

    def eval(self, html, events: int = 0x3FF):  # noqa: D401
        from ..kernel.fastsax import parse_doc_flat  # noqa: PLC0415

        if html is None:
            return
        if isinstance(html, (bytearray, memoryview)):
            html = bytes(html)
        elif isinstance(html, str):
            html = html.encode()
        for r in parse_doc_flat(html, events):
            # drop open_end/close_start pairs (kept in the DataFrame
            # operator; trimmed here to a lean SQL-facing schema)
            yield (*r[:14], r[18], r[19])


def register(spark, name: str = "sax_parse"):
    spark.udtf.register(name, SaxParseUDTF)
    return name
