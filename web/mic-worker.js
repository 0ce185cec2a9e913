/**
 * mic-worker.js — Web Worker / worker_threads body for the parallel
 * decoder (the analog of the reference's web/mic-worker.js).
 *
 * Messages in:
 *   { id, task: 'strip', blob, width, height, kind, sab?, byteOffset? }
 *     Decode one PICS/PICA strip.  With `sab` (SharedArrayBuffer), write
 *     pixels in place at byteOffset; otherwise transfer them back.
 *   { id, task: 'plane', blob, width, height, n, sab?, byteOffset? }
 *     Decode one MICR/RGB plane blob (mode-prefixed).
 * Messages out: { id, ok, pixels? , error? }
 */
'use strict';

if (typeof importScripts === 'function') {
  importScripts('mic-decoder.js'); // browser worker
} else if (typeof require === 'function') {
  // Node worker_threads
  global.MICDecoder = require('./mic-decoder.js');
  const { parentPort } = require('worker_threads');
  parentPort.on('message', (msg) => handle(msg, (r, t) => parentPort.postMessage(r, t)));
}

function handle(msg, post) {
  try {
    let pixels;
    if (msg.task === 'strip') {
      pixels = MICDecoder.decodeFrame(
        new Uint8Array(msg.blob), msg.width, msg.height, msg.kind || 'avg');
    } else if (msg.task === 'plane') {
      pixels = MICDecoder.decodePlane(
        new Uint8Array(msg.blob), msg.width, msg.height, msg.n);
    } else {
      throw new Error('unknown task ' + msg.task);
    }
    if (msg.sab) {
      new Uint16Array(msg.sab, msg.byteOffset, pixels.length).set(pixels);
      post({ id: msg.id, ok: true });
    } else {
      post({ id: msg.id, ok: true, pixels }, [pixels.buffer]);
    }
  } catch (e) {
    post({ id: msg.id, ok: false, error: String(e && e.message || e) });
  }
}

if (typeof importScripts === 'function') {
  self.onmessage = (ev) => handle(ev.data, (r, t) => self.postMessage(r, t));
}
