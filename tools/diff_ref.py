"""Differential parity check: Python kernel vs the REFERENCE compiled
WASM parser (via tools/ref_batch.mjs + node).

Builds the same JSON event shapes the reference JS layer emits
(/root/reference/src/js/saxWasm.ts toJSON at :191,288,359,514) from the
Python kernel's entities and diffs entire event streams, including every
position and byte offset, for a corpus of documents and chunk splits.

Run:  python tools/diff_ref.py [--sweep]
"""

from __future__ import annotations

import base64
import json
import subprocess
import sys

sys.path.insert(0, "/root/repo")

from sax_wasm_spark.kernel.saxkernel import (  # noqa: E402
    Attribute,
    ProcInst,
    SaxParser,
    Tag,
    TextNode,
)

REF_BATCH = "/root/repo/tools/ref_batch.mjs"


def _pos(p):
    return {"line": p[0], "character": p[1]}


def _txt_json(t: TextNode):
    return {
        "start": _pos(t.start),
        "end": _pos(t.end),
        "value": bytes(t.value).decode("utf-8", "replace"),
        "byteOffsets": {"start": t.b0, "end": t.b1},
    }


def _attr_json(a: Attribute):
    return {
        "name": _txt_json(a.name),
        "value": _txt_json(a.value),
        "type": a.attr_type,
        "byteOffsets": {"start": a.b0, "end": a.b1},
    }


def _tag_json(t: Tag):
    return {
        "openStart": _pos(t.open_start),
        "openEnd": _pos(t.open_end),
        "closeStart": _pos(t.close_start),
        "closeEnd": _pos(t.close_end),
        "name": t.name.decode("utf-8", "replace"),
        "attributes": [_attr_json(a) for a in t.attributes],
        "textNodes": [_txt_json(x) for x in t.text_nodes],
        "selfClosing": t.self_closing,
        "byteOffsets": {"start": t.b0, "end": t.b1},
    }


def _pi_json(p: ProcInst):
    # Reference FFI quirk: the JS ProcInst reader decodes byteOffsets from
    # struct offsets 16/24 (saxWasm.ts:276-281), which in the Rust
    # #[repr(C)] layout (tag.rs:164-172) is the *end position* [line,
    # character], not byte_range. We keep the true byte_range in the
    # engine but replicate the JS-observable decode here for parity.
    return {
        "start": _pos(p.start),
        "end": _pos(p.end),
        "target": _txt_json(p.target),
        "content": _txt_json(p.content),
        "byteOffsets": {"start": p.end[0], "end": p.end[1]},
    }


def py_parse(data: bytes, mask: int, split: int = -1):
    out = []

    def handler(code, entity):
        k = type(entity)
        if k is Tag:
            j = _tag_json(entity)
        elif k is TextNode:
            j = _txt_json(entity)
        elif k is Attribute:
            j = _attr_json(entity)
        else:
            j = _pi_json(entity)
        out.append([1 << code, j])

    p = SaxParser(events=mask, handler=handler)
    if split >= 0:
        p.write(data[:split])
        p.write(data[split:])
    else:
        p.write(data)
    p.end()
    return out


def ref_parse_batch(jobs):
    payload = json.dumps(
        [{"d": base64.b64encode(d).decode(), "m": m, "s": s} for d, m, s in jobs]
    )
    r = subprocess.run(
        ["node", REF_BATCH], input=payload.encode(), capture_output=True, check=True
    )
    return json.loads(r.stdout)


DOCS = [
    b'<div class="myDiv">This is my div</div>',
    b"\n        <div x=1\n            y=3>\n        </div>",
    b"<element attribute1=value1 attribute2='value2'></element>",
    b'<body class="" id=myId></body> <component data-id="user_1234"key="23" disabled />',
    b"<element attribute1='value1'a attribute3='value3'></element>",
    b'<body app="buggyAngularApp=19"></body>',
    '<div id="👅"></div>'.encode(),
    '\n<div\n  data-value="👅"\n  class="grapheme cluster">\n</div>'.encode(),
    b'<button disabled class="primary-btn"></button>',
    b'\n<div noValueAttr\n    x="abc">\n</div>',
    b'<?xml version="1.0" encoding="UTF-8"?>\n<plugin\n    version       =   "1.0.0"   >\n</plugin>',
    b"<script type=text/javascript>\n\n</script>",
    b'<div><a href="http://github.com">GitHub</a></orphan></div>',
    b"<div></></div>",
    b'<g><path d="M0,12.5 20,2.5 20,22.5z"/></g>',
    b"\xef\xbb\xbf<div></div>",
    b"this is just plain text <br>",
    b"<div>I like to use <bold>bold text</bold> to emphasize</div>",
    b"<div>\n\n\n</div>",
    "🏴📚📚🏴📚📚🏴📚📚🏴📚📚🏴📚📚".encode(),
    '📚<div href="./123/123">hey there</div>'.encode(),
    b"<!--name='test 3 attr' this is a comment--> <-- name='test 3 attr' this is just text -->",
    b'<!--name="test 3 attr" some comment -- > not an ending-->',
    b'<div><![CDATA[did you know "x < y" is as easy as 123?]]></div>',
    b"<![cdata[lowercase]]> <![cDaTa[mixed]]>",
    b"<div><div><![CDATA[]]></div><div><![CDATA[something]]></div></div>",
    b"<!DOCTYPE html>\n<body>hi</body>",
    b"<!doctype html>\n<!DocType html>",
    b'<!DOCTYPE movie [\n  <!ENTITY COM "Comedy">\n  <!ELEMENT movie (title+,genre,year)>\n]>',
    b'<?xml-stylesheet\n type="text/xsl" href="main.xsl" alternate="no"?>',
    b'<?xml version="1.0" encoding="utf-8"?>',
    b"<?>",
    b"<foo>{bar < baz ? <div></div> : <></>}</foo>",
    b"\n<Component>\n {this.authenticated ? <User props={this.userProps}/> : <SignIn props={this.signInProps}/>}\n</Component>",
    b"<> <div></div> <p></p> </>",
    b"<Component props={() => { return this.props } }></Component>",
    b"<number>1 < 3</number>",
    b"< notatag >text",
    b"<div / junk>x</div>",
    b"<a:b x:y='1'></a:b>",
    b"text &amp; more <b>bold</b>\nline2",
    b"<<--->>",
    b"<!ENTITY standalone 'v'>",
    b"<e a='1' b=2 c d='' e={x}/>",
    b"<p>one</p><p>two</p><p>three</p>",
    b"<html><head><title>T</title></head><body><p>P</p></body></html>",
    # invalid UTF-8 (exercises the FSM's grapheme-chain dirty path)
    b"<div>\xff\xfe broken</div>",
    b'<a b="\xf0\x41">x</a>',
    b"text \x80\x81 more<b>y</b>",
    b"<\xc3(>bad lead</\xc3(>",
    b"<p>\xf0\x9f\x9a</p>",
    b"\xed\xa0\x80<div>surrogate</div>",
]

MASKS = [1023, (1 << 0) | (1 << 8), (1 << 6) | (1 << 8), (1 << 4), (1 << 9), (1 << 1), (1 << 3) | (1 << 2), (1 << 5) | (1 << 7)]


def main():
    sweep = "--sweep" in sys.argv
    jobs = []
    for d in DOCS:
        for m in MASKS:
            jobs.append((d, m, -1))
            if sweep:
                for s in range(1, len(d)):
                    jobs.append((d, m, s))

    print(f"{len(jobs)} jobs ...", flush=True)
    ref = ref_parse_batch(jobs)
    bad = 0
    for (d, m, s), expect in zip(jobs, ref):
        got = py_parse(d, m, s)
        if got != expect:
            bad += 1
            if bad <= 5:
                print(f"MISMATCH doc={d[:60]!r} mask={m} split={s}")
                for i, (g, e) in enumerate(zip(got, expect)):
                    if g != e:
                        print(f"  first diff at event {i}:")
                        print("    ref:", json.dumps(e)[:300])
                        print("    got:", json.dumps(g)[:300])
                        break
                if len(got) != len(expect):
                    print(f"  len ref={len(expect)} got={len(got)}")
    print(f"{'PARITY OK' if bad == 0 else f'{bad} MISMATCHED JOBS'} / {len(jobs)}")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
