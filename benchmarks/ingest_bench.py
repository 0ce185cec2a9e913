"""Reference-format ingest benchmark: MIC1/PICS blob → device pixels.

Measures the two halves of the transcode-on-ingest path (tpu/ingest.py):
the one-time ingest cost (native decode + MICW re-encode, MB/s) and the
steady-state device decode of the transcoded batch (GB/s) — the archive
migration / training-data-path shape where each image is ingested once
and decoded many times.

Usage: python benchmarks/ingest_bench.py [--reps N]
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


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=10)
    args = ap.parse_args()

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
