"""Differential parity vs the compiled reference WASM (requires node).

Skipped automatically when node or the reference artifacts are absent;
the frozen goldens in test_kernel_goldens.py still pin behavior then.
"""

import os
import shutil
import subprocess
import sys

import pytest

NODE = shutil.which("node")
REF_WASM = "/root/reference/lib/sax-wasm.wasm"

pytestmark = pytest.mark.skipif(
    NODE is None or not os.path.exists(REF_WASM),
    reason="node or reference wasm not available",
)


def test_unsplit_parity():
    r = subprocess.run(
        [sys.executable, "/root/repo/tools/diff_ref.py"],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    assert "PARITY OK" in r.stdout


def test_large_xml_fixture_parity():
    """The reference's own 3 MB benchmark fixture, 64 KB chunks: all
    ~138k events (all ten types) must match the compiled WASM parser
    bit-for-bit, positions and byte offsets included."""
    import json

    sys.path.insert(0, "/root/repo/tools")
    from diff_ref import _attr_json, _pi_json, _tag_json, _txt_json  # noqa: PLC0415
    from sax_wasm_spark.kernel.saxkernel import (  # noqa: PLC0415
        Attribute,
        ProcInst,
        SaxParser,
        Tag,
        TextNode,
    )

    data = open("/root/reference/src/js/__test__/xml.xml", "rb").read()
    script = r"""
import { SAXParser } from '/root/reference/lib/esm/index.js';
import { readFileSync } from 'fs';
const data = readFileSync('/root/reference/src/js/__test__/xml.xml');
const parser = new SAXParser(1023);
const out = [];
parser.eventHandler = (event, detail) => { out.push([event, detail.toJSON ? detail.toJSON() : detail]); };
await parser.prepareWasm(readFileSync('/root/reference/lib/sax-wasm.wasm'));
for (let i = 0; i < data.length; i += 65536) {
  parser.write(new Uint8Array(data.subarray(i, i + 65536)));
}
parser.end();
process.stdout.write(JSON.stringify(out));
"""
    import tempfile

    with tempfile.NamedTemporaryFile("w", suffix=".mjs", delete=False) as f:
        f.write(script)
        path = f.name
    r = subprocess.run([NODE, path], capture_output=True, timeout=300)
    assert r.returncode == 0, r.stderr[-500:]
    ref = json.loads(r.stdout)

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

    p = SaxParser(events=1023, handler=handler)
    for i in range(0, len(data), 65536):
        p.write(data[i : i + 65536])
    p.end()
    assert len(out) == len(ref)
    assert out == ref


def test_randomized_parity():
    """Seeded random composition documents (with random chunk splits)
    against the compiled reference WASM — broader than the fixed corpus."""
    import random

    sys.path.insert(0, "/root/repo/tools")
    from diff_ref import py_parse, ref_parse_batch  # noqa: PLC0415

    rng = random.Random(20260816)
    pieces = [
        "<div>", "</div>", '<p class="x">', "</p>", "plain text ", "a<b ",
        "< notag", "<a href=unq>", "<a href='sq'>", '<a href="dq">', "<br/>",
        "<!-- c -->", "<!--", "-->", "<![CDATA[z]]>", "<![CDATA[", "]]>",
        "<!DOCTYPE html>", '<!ENTITY e "v">', "<?pi data?>", "<?>", "\n",
        "  ", ">", "/", "=", '"', "'", "</orphan>", "<>", "</>", "{", "}",
        "<c a={x{y}z}>", "é", "🚀", "<e a b=1 c=\"2\"d='3' e>", "<е>", "<!",
        "< ", "x=y", "<e/ junk>", "<e\n a=1\n>", '<a b="">', "line\n",
    ]
    jobs = []
    for _ in range(150):
        doc = "".join(rng.choice(pieces) for _ in range(rng.randint(1, 20))).encode()
        m = rng.randrange(1, 1024)
        split = rng.choice([-1, rng.randint(1, max(1, len(doc) - 1))])
        jobs.append((doc, m, split))
    ref = ref_parse_batch(jobs)
    for (d, m, s_), expect in zip(jobs, ref):
        assert py_parse(d, m, s_) == expect, f"doc={d[:60]!r} mask={m} split={s_}"
