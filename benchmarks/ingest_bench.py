"""Reference-format ingest benchmark: MIC1/PICS blob → device pixels.

Measures the two halves of the transcode-on-ingest path (tpu/ingest.py):
the one-time ingest cost (native decode + MICW re-encode, MB/s) and the
steady-state device decode of the transcoded batch (GB/s) — the archive
migration / training-data-path shape where each image is ingested once
and decoded many times.

Also measures the round-3 device entropy stage (--tans): the pallas_tans
kernel decoding the reference FF04 streams themselves, batched across
strips — kernel-steady-state symbols/s (outputs stay device-resident;
through this image's tunneled backend any d2h pull is pathologically
slow and would measure the tunnel, not the kernel).

Usage: python benchmarks/ingest_bench.py [--reps N] [--tans]
"""

from __future__ import annotations

import argparse
import json
import math
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def run_tans(reps: int) -> int:
    """Kernel-steady-state throughput of the reference-format device
    decoder (pallas_tans) over the corpus's PICS strips."""
    import jax
    import jax.numpy as jnp

    jax.devices()

    from benchmarks.run_benchmarks import load_corpus
    from mic_tpu.models.single_frame import compress_single_frame_4state
    from mic_tpu.ops.fse import read_ncount
    from mic_tpu.tpu.pallas_tans import (
        build_tans_batch,
        fse_parse_header,
        tans_decode_pallas,
    )

    corpus = load_corpus(False)
    parsed, sym_bytes = [], 0
    strip_h = 64
    for _name, px, w, h, mx in corpus:
        for y0 in range(0, h - strip_h + 1, strip_h):
            sp = px[y0 * w : (y0 + strip_h) * w]
            try:
                blob = compress_single_frame_4state(sp, w, strip_h, mx)
            except Exception:
                continue
            n, count, body = fse_parse_header(blob)
            if n != 4:
                continue
            norm, sl, tl, consumed = read_ncount(body)
            if tl > 13:
                continue
            parsed.append((count, norm, sl, tl, body[consumed:]))
            sym_bytes += count * 2
    staged = build_tans_batch(parsed, 4)
    if staged is None:
        print(json.dumps({"error": "staging failed"}))
        return 1
    ops, steps, tl_max, asweep = staged
    args_d = tuple(jnp.asarray(a) for a in ops)
    kw = dict(steps=steps, n_streams=len(parsed), n_states=4,
              table_log=tl_max, asweep=asweep)
    out = tans_decode_pallas(*args_d, **kw).block_until_ready()
    t0 = time.time()
    for _ in range(reps):
        out = tans_decode_pallas(*args_d, **kw)
    out.block_until_ready()
    dt = (time.time() - t0) / reps
    print(json.dumps({
        "tans_streams": len(parsed),
        "tans_symbol_MBps": round(sym_bytes / dt / 1e6, 1),
        "steps": steps,
    }))
    return 0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--tans", action="store_true")
    args = ap.parse_args()
    if args.tans:
        return run_tans(args.reps)

    from benchmarks.run_benchmarks import load_corpus
    from mic_tpu.models.single_frame import compress_single_frame_4state
    from mic_tpu.parallel.strips import compress_parallel_strips_4state
    from mic_tpu.tpu.ingest import ingest_plan

    corpus = load_corpus(False)
    ref_blobs, dims, names, raw = [], [], [], []
    for name, px, w, h, mx in corpus:
        ref_blobs.append(compress_single_frame_4state(px, w, h, mx))
        dims.append((w, h))
        names.append(name)
        raw.append(px)
        # One PICS container too (self-describing).
        ref_blobs.append(compress_parallel_strips_4state(px, w, h, mx, 4))
        dims.append((w, h))
        names.append(name + "-PICS")
        raw.append(px)

    t0 = time.time()
    plan = ingest_plan(ref_blobs, dims)
    ingest_dt = time.time() - t0
    total = sum(p.nbytes for p in raw)

    # Exactness check on device (tunneled device->host can be very slow;
    # host->device staging of the expected pixels is the cheap direction).
    decoded0 = plan.run()
    for bi, (want, name) in enumerate(zip(raw, names)):
        assert plan.verify_against(decoded0, want, bi), f"ingest mismatch on {name}"

    t0 = time.time()
    for _ in range(args.reps):
        decoded = plan.run()
    for v in decoded.values():
        if v is not None:
            v.block_until_ready()
    dec_dt = (time.time() - t0) / args.reps

    result = {
        "ingest_MBps": round(total / ingest_dt / 1e6, 1),
        "steady_decode_GBps": round(total / dec_dt / 1e9, 3),
        "blobs": len(ref_blobs),
        "pixel_bytes": total,
        "bit_exact": True,
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
