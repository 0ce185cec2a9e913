/**
 * mic-decoder-parallel.js — worker-pool parallel decoding for PICS/PICA
 * strips and MICR planes (the analog of the reference's
 * web/mic-decoder-parallel.js PICSSABDecoder).
 *
 * Strategy (mirrors the reference's behavior, fresh implementation):
 *   - crossOriginIsolated (COOP/COEP, web/serve.py): decode into one
 *     SharedArrayBuffer, workers write strips in place — zero copies.
 *   - otherwise: workers transfer per-strip buffers back and the main
 *     thread stitches them.
 *
 * Usage:
 *   const pool = new MICParallelDecoder({ workers: 8 });
 *   const { pixels, width, height } = await pool.decodePICS(bytes);
 *   const { rgb, width, height } = await pool.decodeMICR(bytes);
 *   pool.terminate();
 *
 * Requires mic-decoder.js to be loaded (for header parsing on the main
 * thread) and mic-worker.js next to this file.
 */
'use strict';

class MICParallelDecoder {
  constructor(opts) {
    opts = opts || {};
    const n = opts.workers ||
      (typeof navigator !== 'undefined' && navigator.hardwareConcurrency) || 4;
    this.workerUrl = opts.workerUrl || 'mic-worker.js';
    this.workers = [];
    this.pending = new Map();
    this.nextId = 1;
    for (let i = 0; i < n; i++) {
      const w = new Worker(this.workerUrl);
      w.onmessage = (ev) => {
        const { id, ok, pixels, error } = ev.data;
        const p = this.pending.get(id);
        if (!p) return;
        this.pending.delete(id);
        if (ok) p.resolve(pixels); else p.reject(new Error(error));
      };
      this.workers.push(w);
    }
    this.rr = 0;
  }

  _submit(msg, transfer) {
    const id = this.nextId++;
    msg.id = id;
    const w = this.workers[this.rr++ % this.workers.length];
    return new Promise((resolve, reject) => {
      this.pending.set(id, { resolve, reject });
      w.postMessage(msg, transfer || []);
    });
  }

  _sharedOut(len) {
    if (typeof crossOriginIsolated !== 'undefined' && crossOriginIsolated &&
        typeof SharedArrayBuffer !== 'undefined') {
      return new SharedArrayBuffer(len * 2);
    }
    return null;
  }

  /** Parallel PICS decode: one task per strip. */
  async decodePICS(bytes) {
    if (!(bytes instanceof Uint8Array)) bytes = new Uint8Array(bytes);
    const h = MICDecoder.parsePICSHeader(bytes);
    const sab = this._sharedOut(h.width * h.height);
    const jobs = [];
    for (let s = 0; s < h.numStrips; s++) {
      const y0 = s * h.stripHeight;
      const sh = Math.min(h.stripHeight, h.height - y0);
      const e = h.strips[s];
      // Copy the strip blob so it can transfer to the worker.
      const blob = bytes.slice(h.dataOffset + e.offset, h.dataOffset + e.offset + e.length);
      jobs.push(this._submit(
        { task: 'strip', blob: blob.buffer, width: h.width, height: sh,
          kind: 'avg', sab, byteOffset: y0 * h.width * 2 },
        [blob.buffer]));
    }
    const parts = await Promise.all(jobs);
    let pixels;
    if (sab) {
      pixels = new Uint16Array(h.width * h.height);
      pixels.set(new Uint16Array(sab, 0, h.width * h.height));
    } else {
      pixels = new Uint16Array(h.width * h.height);
      for (let s = 0; s < h.numStrips; s++) {
        pixels.set(parts[s], s * h.stripHeight * h.width);
      }
    }
    return { pixels, width: h.width, height: h.height,
             numStrips: h.numStrips, shared: !!sab };
  }

  /** Parallel MICR decode: one task per YCoCg plane, inverse transform
   * on the main thread. */
  async decodeMICR(bytes) {
    if (!(bytes instanceof Uint8Array)) bytes = new Uint8Array(bytes);
    const width = (bytes[4] | (bytes[5] << 8) | (bytes[6] << 16) | (bytes[7] << 24)) >>> 0;
    const height = (bytes[8] | (bytes[9] << 8) | (bytes[10] << 16) | (bytes[11] << 24)) >>> 0;
    const body = bytes.subarray(12);
    const rd = (o) => (body[o] | (body[o + 1] << 8) | (body[o + 2] << 16) | (body[o + 3] << 24)) >>> 0;
    const lens = [rd(0), rd(4), rd(8)];
    const n = width * height;
    let off = 12;
    const jobs = lens.map((len) => {
      const blob = bytes.slice(12 + off, 12 + off + len);
      off += len;
      return this._submit(
        { task: 'plane', blob: blob.buffer, width, height, n }, [blob.buffer]);
    });
    const [y, co, cg] = await Promise.all(jobs);
    return { rgb: MICDecoder.ycocgrInverse(y, co, cg, n), width, height, channels: 3 };
  }

  terminate() {
    for (const w of this.workers) w.terminate();
    this.workers = [];
  }
}

if (typeof module !== 'undefined' && module.exports) {
  module.exports = { MICParallelDecoder };
}
