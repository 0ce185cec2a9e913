"""Headline benchmark: fused device decode throughput on real TPU.

Measures the flagship path — MICW (zzd predictor) decoded by the Pallas
wide-lane rANS kernel (mic_tpu/tpu/pallas_rans.py) plus the fused XLA
post-stage (unzigzag + row prefix-sum) — in sustained steady state
(decoded pixels stay device-resident, as they would when feeding a TPU
training/inference pipeline; compressed payloads and decode tables are
staged once, as a decode service would).

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

# Images decoded per kernel launch.  128 CT-512 images = 1024 strips of
# 64 rows x 128 lanes; the kernel grids over strip-groups of 32, so VMEM
# stays bounded at any batch size.
BATCH_IMAGES = 128


def _load_image():
    p = Path(CT_PATH)
    if p.exists():
        px = np.fromfile(p, dtype="<u2")
        return px.reshape(512, 512)
    rng = np.random.default_rng(0)
    img = (rng.standard_normal((512, 512)).cumsum(1).cumsum(0) * 40 + 2000)
    return np.clip(img, 0, 4095).astype(np.uint16)


def main() -> None:
    import jax.numpy as jnp

    from mic_tpu.tpu.device_rans import mict_parse
    from mic_tpu.tpu.pallas_rans import build_packed_tables, rans_decode_pallas_zzd
    from mic_tpu.tpu.strips import micw_compress, micw_parse

    img = _load_image()
    h, w = img.shape
    mx = int(img.max())

    # Default MICW geometry: zzd predictor (no RLE, bijective zigzag row
    # deltas), 64-row strips, 128 lanes.
    blob = micw_compress(img.ravel(), w, h, mx)
    width, height, n_strips, strip_h, max_value, _pred, _lanes, strips = micw_parse(blob)
    base_parsed = [mict_parse(b) for b, *_ in strips]
    tl = max(p[1] for p in base_parsed)

    parsed = base_parsed * BATCH_IMAGES
    S = len(parsed)
    init, tpk, alpha, words, mask, shift, counts, steps, asweep = build_packed_tables(parsed, tl)
    ws = np.full((S, 128), width // 128, np.uint32)
    args = tuple(jnp.asarray(a) for a in (init, tpk, alpha, words, mask, shift, ws))

    def decode():
        # Fully-fused kernel: entropy decode + unzigzag + row cumsum in
        # one pallas_call; the output IS the pixel batch.
        pix = rans_decode_pallas_zzd(
            *args, steps=steps, n_strips=S, table_log=tl, asweep=asweep,
        )
        return pix.reshape(S, -1)

    # Compile + bit-exactness check over one full image's strips.
    out = decode()
    out.block_until_ready()
    got = np.asarray(out[:n_strips])
    for i in range(n_strips):
        y0 = i * strip_h
        sh = min(strip_h, height - y0)
        if not np.array_equal(got[i][: sh * width], img[y0 : y0 + sh].ravel()):
            print(json.dumps({"metric": "decode_error", "value": 0, "unit": "GB/s", "vs_baseline": 0}))
            return

    # Steady state.
    n_pixel_bytes = BATCH_IMAGES * img.nbytes
    reps = 30
    t0 = time.time()
    for _ in range(reps):
        out = decode()
    out.block_until_ready()
    dt = (time.time() - t0) / reps

    gbps = n_pixel_bytes / dt / 1e9
    print(
        json.dumps(
            {
                "metric": "pallas_device_decode_throughput_CT512_x128",
                "value": round(gbps, 3),
                "unit": "GB/s",
                "vs_baseline": round(gbps / BASELINE_GBPS, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
