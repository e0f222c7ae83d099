"""Kernel golden tests.

Two layers:
1. direct ports of the reference's inline Rust assertions
   (/root/reference/src/sax/parser.rs:1352-2288) — exact values,
   line/character positions, and byte ranges;
2. frozen full-event-stream goldens (tests/goldens/kernel_events.json),
   generated from the kernel after it was validated byte-for-byte against
   the reference's compiled WASM over 16k differential jobs
   (tools/diff_ref.py).
"""

import base64
import json
import os
import sys

sys.path.insert(0, "/root/repo/tools")

from sax_wasm_spark.kernel.saxkernel import (
    EVT_ATTRIBUTE,
    EVT_CDATA,
    EVT_CLOSE_TAG,
    EVT_COMMENT,
    EVT_DECLARATION,
    EVT_DOCTYPE,
    EVT_PROC_INST,
    EVT_TEXT,
    Attribute,
    ProcInst,
    SaxParser,
    Tag,
    TextNode,
)

GOLDENS = os.path.join(os.path.dirname(__file__), "goldens", "kernel_events.json")


def run(doc, events, split=None):
    out = []
    p = SaxParser(events=events, handler=lambda c, e: out.append((c, e)))
    b = doc if isinstance(doc, bytes) else doc.encode()
    if split is None:
        p.write(b)
    else:
        p.write(b[:split])
        p.write(b[split:])
    p.end()
    return out


def ents(evs, kind, code=None):
    return [e for c, e in evs if isinstance(e, kind) and (code is None or c == code)]


def test_attribute_position():
    # ref parser.rs:1352-1393
    evs = run(
        "\n        <div x=1\n            y=3>\n        </div>",
        (1 << EVT_ATTRIBUTE) | (1 << EVT_CLOSE_TAG),
    )
    a0, a1 = ents(evs, Attribute)
    assert a0.name.value == b"x"
    assert a0.name.start == (1, 13) and a0.name.end == (1, 14)
    assert (a0.name.b0, a0.name.b1) == (14, 15)
    assert a0.value.value == b"1"
    assert a0.value.start == (1, 15) and a0.value.end == (1, 16)
    assert (a0.value.b0, a0.value.b1) == (16, 17)
    assert a1.name.value == b"y"
    assert a1.name.start == (2, 12) and a1.name.end == (2, 13)
    assert (a1.name.b0, a1.name.b1) == (30, 31)
    assert a1.value.value == b"3"
    assert (a1.value.b0, a1.value.b1) == (32, 33)


def test_attribute_mixed_forms():
    # ref parser.rs:1457-1516
    evs = run(
        '<body class="" id=myId></body> <component data-id="user_1234"key="23" disabled />',
        (1 << EVT_ATTRIBUTE) | (1 << EVT_CLOSE_TAG) | (1 << EVT_TEXT),
    )
    attrs = ents(evs, Attribute)
    texts = ents(evs, TextNode, EVT_TEXT)
    assert len(attrs) == 5 and len(texts) == 1
    assert texts[0].value == b" "
    assert attrs[0].name.value == b"class" and attrs[0].value.value == b""
    assert attrs[0].name.start == (0, 6) and attrs[0].name.end == (0, 11)
    assert attrs[0].value.start == (0, 13) and attrs[0].value.end == (0, 13)
    assert attrs[1].name.value == b"id" and attrs[1].value.value == b"myId"
    assert attrs[2].name.value == b"data-id" and attrs[2].value.value == b"user_1234"
    assert attrs[3].name.value == b"key" and attrs[3].value.value == b"23"
    assert attrs[4].name.value == b"disabled" and attrs[4].value.value == b""


def test_orphan_close_tag_as_text():
    # ref parser.rs:1599-1660
    evs = run(
        '<div><a href="http://github.com">GitHub</a></orphan></div>',
        (1 << EVT_CLOSE_TAG) | (1 << EVT_TEXT),
    )
    tags = ents(evs, Tag)
    texts = ents(evs, TextNode)
    assert len(tags) == 2 and len(texts) == 2
    assert texts[0].value == b"GitHub" and texts[1].value == b"</orphan>"
    assert texts[0].start == (0, 33) and texts[0].end == (0, 39)
    assert tags[0].name == b"a" and tags[0].close_start[1] == 39
    assert tags[1].name == b"div" and tags[1].close_start[1] == 52


def test_whitespace_only_text_suppressed():
    # ref parser.rs:1713-1740 — 2 tags, 3 per-line texts
    doc = (
        '<?xml version="1.0" encoding="UTF-8"?>\n<plugin\n    version       =   "1.0.0"   >\n\n'
        "    <description>\n    The current\n    version of\nthe plugin\n"
        "                </description>\n</plugin>"
    )
    evs = run(doc, (1 << EVT_CLOSE_TAG) | (1 << EVT_TEXT))
    assert len(ents(evs, Tag)) == 2
    assert len(ents(evs, TextNode)) == 3


def test_comment_and_fake_comment():
    # ref parser.rs:1741-1769
    doc = "<!--name='test 3 attr' this is a comment--> <-- name='test 3 attr' this is just text -->"
    evs = run(doc, (1 << EVT_COMMENT) | (1 << EVT_TEXT))
    texts = ents(evs, TextNode)
    assert len(texts) == 2
    assert (texts[0].b0, texts[0].b1) == (0, 43)
    assert texts[0].value == b"name='test 3 attr' this is a comment"
    assert (texts[1].b0, texts[1].b1) == (43, 88)
    assert texts[1].value == b" <-- name='test 3 attr' this is just text -->"


def test_4_byte_grapheme_chunk_split():
    # ref parser.rs:1825-1845
    doc = ("🏴📚📚" * 10).encode()
    evs = run(doc, 1 << EVT_TEXT, split=14)
    texts = ents(evs, TextNode)
    assert len(texts) == 1
    assert texts[0].value == doc


def test_doctype_with_entities():
    # ref parser.rs:1924-1952 — Declaration events use the Cdata code quirk
    doc = (
        '\n        <!DOCTYPE movie [\n          <!ENTITY COM "Comedy">\n'
        '          <!LIST title xml:lang TOKEN "EN" id ID #IMPLIED>\n'
        '          <!ENTITY SF "Science Fiction">\n'
        "          <!ELEMENT movie (title+,genre,year)>\n"
        "          <!ELEMENT title (#DATA)>\n          <!ELEMENT genre (#DATA)>\n"
        "          <!ELEMENT year (#DATA)>\n        ]>"
    )
    evs = run(doc, (1 << EVT_DOCTYPE) | (1 << EVT_DECLARATION))
    texts = ents(evs, TextNode)
    assert len(texts) == 8
    assert texts[0].value == b'ENTITY COM "Comedy"'
    assert texts[1].value == b'LIST title xml:lang TOKEN "EN" id ID #IMPLIED'
    assert texts[7].value == b"movie"
    # the declaration quirk: first 7 dispatched with the Cdata code
    codes = [c for c, e in evs if isinstance(e, TextNode)]
    assert codes[:7] == [EVT_CDATA] * 7
    assert codes[7] == EVT_DOCTYPE


def test_proc_inst():
    # ref parser.rs:1981-2006
    doc = (
        '<?xml-stylesheet\n        type="text/xsl"\n        href="main.xsl"\n'
        '        media="screen"\n        title="Default Style"\n        alternate="no"?>'
    )
    evs = run(doc, 1 << EVT_PROC_INST)
    pis = ents(evs, ProcInst)
    assert len(pis) == 1
    assert (pis[0].b0, pis[0].b1) == (0, 142)
    assert pis[0].target.value == b"xml-stylesheet"


def test_jsx_component_byte_ranges():
    # ref parser.rs:2007-2038
    doc = (
        "\n            <Component>\n                {this.authenticated ? "
        "<User props={this.userProps}/> : <SignIn props={this.signInProps}/>}"
        "\n            </Component>"
    )
    evs = run(doc, 1 << EVT_CLOSE_TAG)
    tags = ents(evs, Tag)
    assert len(tags) == 3
    assert len(tags[0].attributes) == 1 and (tags[0].b0, tags[0].b1) == (63, 93)
    assert len(tags[1].attributes) == 1 and (tags[1].b0, tags[1].b1) == (96, 130)
    assert len(tags[2].attributes) == 0 and (tags[2].b0, tags[2].b1) == (13, 156)


def test_self_closing_variants():
    # ref parser.rs:2039-2074
    doc = (
        '\n        <Div>\n            <Div type="JS" viewName="myapp.view.Home" />\n'
        '            <Div type="JSON" viewName="myapp.view.Home" />\n'
        '            <Div type="HTML" viewName="myapp.view.Home" />\n'
        '            <Div type="Template" viewName="myapp.view.Home" />\n\n'
        '            <!-- This one will be correctly "closed" -->\n'
        '            <AnotherSelfClosingDiv type="Template" viewName={myapp.view.Home}/>\n'
        '            <Div type="Template" viewName=myapp.view.Home/>\n        </Div>'
    )
    evs = run(doc, 1 << EVT_CLOSE_TAG)
    tags = ents(evs, Tag)
    assert len(tags) == 7
    assert (tags[0].b0, tags[0].b1) == (27, 71)
    assert all(t.self_closing for t in tags[:6]) and not tags[6].self_closing


def test_jsx_expression_text():
    # ref parser.rs:1897-1922
    evs = run("<foo>{bar < baz ? <div></div> : <></>}</foo>", (1 << EVT_TEXT) | (1 << EVT_CLOSE_TAG))
    texts = ents(evs, TextNode)
    tags = ents(evs, Tag)
    assert [t.value for t in texts] == [b"{bar < baz ? ", b" : ", b"}"]
    assert len(tags) == 3
    assert len(tags[2].text_nodes) == 3


def test_script_unquoted_attribute():
    # ref parser.rs:2147-2186 — '/' inside unquoted value isn't self-close
    evs = run("<script type=text/javascript>\n\n</script>", (1 << EVT_ATTRIBUTE) | (1 << EVT_CLOSE_TAG))
    tags = ents(evs, Tag)
    attrs = ents(evs, Attribute)
    assert len(tags) == 1 and tags[0].name == b"script"
    assert tags[0].attributes[0].value.value == b"text/javascript"
    assert len(attrs) == 1


def test_no_value_attribute_positions():
    # ref parser.rs:2216-2258
    evs = run(
        '\n            <div noValueAttr\n                x="abc">\n            </div>',
        (1 << EVT_ATTRIBUTE) | (1 << EVT_CLOSE_TAG),
    )
    a0, a1 = ents(evs, Attribute)
    assert a0.name.value == b"noValueAttr" and a0.value.value == b""
    assert a0.name.start == (1, 17) and a0.name.end == (1, 28)
    assert (a0.name.b0, a0.name.b1) == (18, 29)
    assert a0.value.start == (0, 0) and a0.value.end == (0, 0)
    assert a1.name.value == b"x" and a1.value.value == b"abc"
    assert (a1.value.b0, a1.value.b1) == (49, 52)


def test_single_character_boolean_attribute():
    # ref parser.rs:1517-1543
    evs = run(
        "<element attribute1='value1'a attribute3='value3'></element>",
        (1 << EVT_ATTRIBUTE) | (1 << EVT_CLOSE_TAG) | (1 << EVT_TEXT),
    )
    attrs = ents(evs, Attribute)
    assert [(a.name.value, a.value.value) for a in attrs] == [
        (b"attribute1", b"value1"),
        (b"a", b""),
        (b"attribute3", b"value3"),
    ]
    assert len(ents(evs, TextNode, EVT_TEXT)) == 0


def test_empty_cdata():
    # ref parser.rs:1954-1979
    doc = "<div>\n<div>\n  <![CDATA[]]>\n</div>\n<div>\n  <![CDATA[something]]>\n</div>\n</div>"
    evs = run(doc, 1 << EVT_CDATA)
    cd = ents(evs, TextNode)
    assert len(cd) == 2
    assert cd[0].value == b"" and cd[1].value == b"something"


def test_frozen_golden_streams():
    """Every frozen stream (validated against the reference WASM) must
    reproduce exactly."""
    from diff_ref import py_parse  # noqa: PLC0415

    with open(GOLDENS) as f:
        goldens = json.load(f)
    assert len(goldens) >= 300
    for g in goldens:
        doc = base64.b64decode(g["doc"])
        got = py_parse(doc, g["mask"], -1)
        assert got == g["events"], f"golden mismatch for {doc[:60]!r} mask={g['mask']}"
