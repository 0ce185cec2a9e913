"""Headline benchmark: fused device decode throughput on real TPU.

Measures the flagship path — MICW wide-lane rANS + RLE expand + predictor
inversion, one fused XLA program over a batch of strips — in sustained
steady state (decoded pixels stay device-resident, as they would when
feeding a TPU training/inference pipeline; compressed payloads and tables
are staged once, as a decode service would).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "GB/s", "vs_baseline": N}

Baseline: the reference's headline 7.5 GB/s geomean decompression
(README.md:17, 64-core ARM server) — see BASELINE.md.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import numpy as np

BASELINE_GBPS = 7.5
CT_PATH = "/root/reference/testdata/CT_512_512_image.bin"


def _load_image():
    p = Path(CT_PATH)
    if p.exists():
        px = np.fromfile(p, dtype="<u2")
        return px.reshape(512, 512)
    rng = np.random.default_rng(0)
    img = (rng.standard_normal((512, 512)).cumsum(1).cumsum(0) * 40 + 2000)
    return np.clip(img, 0, 4095).astype(np.uint16)


def main() -> None:
    import jax
    import jax.numpy as jnp

    from mic_tpu.ops.predictors import delta_params
    from mic_tpu.tpu.device_rans import mict_parse
    from mic_tpu.tpu.strips import (
        _decode_strip_batch,
        build_strip_batch,
        micw_compress,
        micw_parse,
    )

    img = _load_image()
    h, w = img.shape
    mx = int(img.max())

    # Batch: BATCH copies of the image, 8 strips each, 1024 lanes — deep
    # enough to amortize per-step scan latency across many vector lanes.
    BATCH = 16
    STRIPS = 1
    LANES = 1024
    blob = micw_compress(img.ravel(), w, h, mx, num_strips=STRIPS, lanes=LANES)
    width, height, n_strips, strip_h, max_value, _pred, _lanes, strips = micw_parse(blob)
    parsed = [mict_parse(b) for b, *_ in strips]
    tls = {p[1] for p in parsed}
    tl = max(tls)
    # Keep only strips at the modal tableLog for a uniform batch (bench
    # geometry only; the production decoder groups by tableLog).
    keep = [i for i, p in enumerate(parsed) if p[1] == tl]
    parsed = [parsed[i] for i in keep]
    strips = [strips[i] for i in keep]
    parsed = parsed * BATCH
    strips = strips * BATCH

    arrays, meta = build_strip_batch(parsed, strips, tl)
    _thr, delim = delta_params(max_value)
    mid = (1 << (int(delim).bit_length() - 1)) - 1
    static = dict(
        table_log=tl,
        n_steps=meta["n_steps"],
        width=width,
        strip_h=strip_h,
        max_runs=meta["max_runs"],
        max_tokens=meta["max_tokens"],
        mid_count=mid,
        delim=delim,
    )
    dev_arrays = tuple(jnp.asarray(a) for a in arrays)

    # Compile + correctness check on the first strip batch.
    out = _decode_strip_batch(*dev_arrays, **static)
    out.block_until_ready()
    got = np.asarray(out[: len(keep)])
    for j, i in enumerate(keep):
        y0 = i * strip_h
        sh = min(strip_h, height - y0)
        if not np.array_equal(got[j][: sh * width], img[y0 : y0 + sh].ravel()):
            print(json.dumps({"metric": "decode_error", "value": 0, "unit": "GB/s", "vs_baseline": 0}))
            return

    # Steady state.
    n_pixel_bytes = arrays[0].shape[0] * strip_h * width * 2
    reps = 30
    t0 = time.time()
    for _ in range(reps):
        out = _decode_strip_batch(*dev_arrays, **static)
    out.block_until_ready()
    dt = (time.time() - t0) / reps

    gbps = n_pixel_bytes / dt / 1e9
    print(
        json.dumps(
            {
                "metric": "fused_device_decode_throughput_CT512_batch",
                "value": round(gbps, 3),
                "unit": "GB/s",
                "vs_baseline": round(gbps / BASELINE_GBPS, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
