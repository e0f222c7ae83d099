// Differential-test harness: run the REFERENCE sax-wasm parser (compiled
// WASM at /root/reference/lib) over a document read from stdin and dump
// the full event stream as JSON lines. Used only for test-time parity
// validation of the Python kernel; not part of the engine.
//
// usage: node ref_dump.mjs <events_mask> [split_at] < doc
import { SAXParser, SaxEventType } from '/root/reference/lib/esm/index.js';
import { readFileSync } from 'fs';

const mask = parseInt(process.argv[2] ?? '1023', 10);
const splitAt = process.argv[3] !== undefined ? parseInt(process.argv[3], 10) : -1;
const data = readFileSync(0);

const parser = new SAXParser(mask);
const out = [];
parser.eventHandler = (event, detail) => {
  const j = detail.toJSON ? detail.toJSON() : detail;
  out.push([event, j]);
};
await parser.prepareWasm(readFileSync('/root/reference/lib/sax-wasm.wasm'));
if (splitAt >= 0) {
  parser.write(new Uint8Array(data.subarray(0, splitAt)));
  parser.write(new Uint8Array(data.subarray(splitAt)));
} else {
  parser.write(new Uint8Array(data));
}
parser.end();
console.log(JSON.stringify(out));
