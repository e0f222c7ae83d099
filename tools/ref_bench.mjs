// Reference-kernel timing: parse the 3 MB fixture through the compiled
// sax-wasm WASM with a given event mask subscribed, 64 KB chunks — the
// reference's own benchmark methodology (src/js/__test__/benchmark.mjs)
// plus an event subscription so the parse actually produces data.
// Usage: node ref_bench.mjs <mask> <runs> [fixture]
// Prints JSON: {"mask": m, "runs_ms": [...], "events": n}
import { SAXParser } from '/root/reference/lib/esm/index.js';
import { readFileSync } from 'fs';

const mask = parseInt(process.argv[2] ?? '321', 10); // 0x141 default
const runs = parseInt(process.argv[3] ?? '5', 10);
const fixture = process.argv[4] ?? '/root/reference/src/js/__test__/xml.xml';

const xml = new Uint8Array(readFileSync(fixture));
const wasm = readFileSync('/root/reference/lib/sax-wasm.wasm');
const chunkLen = 64 * 1024;

// The handler MATERIALIZES what a data-producing consumer reads
// (text/attr values, tag names): the Reader fields are lazy, so a
// no-op handler would skip the FFI decode entirely and measure the
// emit-nothing configuration the README advertises — not comparable
// to a kernel that returns value-bearing rows (BENCH_BASELINE.md).
let nEvents = 0;
let sink = 0;
const times = [];
for (let r = 0; r < runs; r++) {
  const parser = new SAXParser(mask);
  nEvents = 0;
  // reads = exactly the fields a parse_doc_np row carries: the
  // value/name strings plus the byte offsets (not line/char).
  parser.eventHandler = (event, detail) => {
    nEvents++;
    if (detail.value !== undefined) {
      const v = detail.value;
      sink += typeof v === 'string' ? v.length : v.value.length;
    } else if (detail.name !== undefined) {
      const nm = detail.name;
      sink += typeof nm === 'string' ? nm.length : nm.value.length;
    }
    if (detail.byteOffsets !== undefined) {
      sink += detail.byteOffsets.end - detail.byteOffsets.start;
    }
  };
  await parser.prepareWasm(wasm);
  const t = process.hrtime();
  let offset = 0;
  while (offset < xml.length) {
    parser.write(xml.subarray(offset, chunkLen + offset));
    offset += chunkLen;
  }
  parser.end();
  const [s, n] = process.hrtime(t);
  times.push(s * 1000 + n / 1e6);
}
process.stdout.write(JSON.stringify({ mask, runs_ms: times, events: nEvents, bytes: xml.length }));
