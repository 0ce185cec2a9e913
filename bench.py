"""Headline benchmark: corpus-geomean fused device decode throughput.

Decodes the full available reference corpus (10 real medical images,
mixed sizes and statistics) through the MICW v4 device path: per-strip
adaptive streams, the Pallas wide-lane rANS kernels (fused zzd kernel
emits pixels; RLE strips ride the packed kernel + the jitted post
program).  Each image is replicated into a service-sized batch and
measured in sustained steady state (compressed payloads and tables stay
staged, outputs stay device-resident — the shape of a decode service
feeding a TPU pipeline); the headline is the geomean of per-image GB/s,
matching the reference's per-image-geomean methodology
(docs/benchmarks.md).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "GB/s", "vs_baseline": N}
and writes the per-image breakdown to results/bench_detail.json.

Baseline: the reference's headline 7.5 GB/s geomean decompression
(README.md:17, 64-core ARM server) — see BASELINE.md.
"""

from __future__ import annotations

import json
import math
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import numpy as np

BASELINE_GBPS = 7.5
TARGET_BATCH_BYTES = 64 << 20  # replicate each image to ~64 MB of pixels
MAX_REPLICAS = 128
REPS = 20


def _corpus():
    from benchmarks.run_benchmarks import load_corpus

    corpus = load_corpus(False)
    if corpus:
        return corpus
    rng = np.random.default_rng(0)
    img = (rng.standard_normal((512, 512)).cumsum(1).cumsum(0) * 40 + 2000)
    px = np.clip(img, 0, 4095).astype(np.uint16).ravel()
    return [("SYN", px, 512, 512, int(px.max()))]


def main() -> None:
    from mic_tpu.tpu.strips import MicwDecodePlan, micw_compress

    detail = {}
    rates = []
    for name, px, w, h, mx in _corpus():
        print(f"[bench] {name} compiling/checking...", file=sys.stderr, flush=True)
        blob = micw_compress(px, w, h, mx)
        k = max(1, min(MAX_REPLICAS, TARGET_BATCH_BYTES // px.nbytes))
        plan = MicwDecodePlan([blob] * k)
        # Compile + bit-exactness check on one replica.  The check runs
        # ON DEVICE (verify_against): tunneled device->host transfers can
        # be orders of magnitude slower than host->device, and pulling a
        # 64 MB batch through a slow link stalls the whole session.
        decoded = plan.run()
        if not plan.verify_against(decoded, px):
            print(json.dumps({
                "metric": "decode_error", "value": 0, "unit": "GB/s",
                "vs_baseline": 0,
            }))
            return
        # Steady state: device programs only, outputs device-resident.
        t0 = time.time()
        for _ in range(REPS):
            decoded = plan.run()
        for v in decoded.values():
            if v is not None:
                v.block_until_ready()
        dt = (time.time() - t0) / REPS
        gbps = k * px.nbytes / dt / 1e9
        rates.append(gbps)
        print(f"[bench] {name}: {gbps:.2f} GB/s (x{k})", file=sys.stderr, flush=True)
        detail[name] = {
            "GBps": round(gbps, 3),
            "replicas": k,
            "ratio": round(px.nbytes / len(blob), 3),
            "bytes": len(blob),
        }
        # Flush per image: remote compiles can take tens of minutes, and
        # a truncated session should still leave its partial table.
        res_dir = Path(__file__).resolve().parent / "results"
        res_dir.mkdir(exist_ok=True)
        (res_dir / "bench_detail.json").write_text(json.dumps(detail, indent=1))

    geomean = math.exp(sum(map(math.log, rates)) / len(rates))
    print(
        json.dumps(
            {
                "metric": "pallas_device_decode_corpus_geomean",
                "value": round(geomean, 3),
                "unit": "GB/s",
                "vs_baseline": round(geomean / BASELINE_GBPS, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
