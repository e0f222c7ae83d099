// Batch differential-test harness: reads JSON jobs from stdin
//   [{d: <base64 doc>, m: <events mask>, s: <split index or -1>}, ...]
// runs each through the REFERENCE sax-wasm parser (compiled WASM under
// /root/reference/lib) and prints a JSON array of event streams.
// Test-time parity validation only; not part of the engine.
import { SAXParser } from '/root/reference/lib/esm/index.js';
import { readFileSync } from 'fs';

const jobs = JSON.parse(readFileSync(0, 'utf8'));
const wasm = readFileSync('/root/reference/lib/sax-wasm.wasm');

const results = [];
for (const job of jobs) {
  const data = Buffer.from(job.d, 'base64');
  const parser = new SAXParser(job.m);
  const out = [];
  parser.eventHandler = (event, detail) => {
    out.push([event, detail.toJSON ? detail.toJSON() : detail]);
  };
  await parser.prepareWasm(wasm);
  const s = job.s ?? -1;
  if (s >= 0) {
    parser.write(new Uint8Array(data.subarray(0, s)));
    parser.write(new Uint8Array(data.subarray(s)));
  } else {
    parser.write(new Uint8Array(data));
  }
  parser.end();
  results.push(out);
}
process.stdout.write(JSON.stringify(results));
