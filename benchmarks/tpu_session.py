"""One-shot TPU measurement session: runs everything that needs the real
chip in a single process (the tunneled TPU serializes clients, so batch
all device measurements into one claim).

Order matters: the headline bench JSON prints first so a truncated
session still yields the metric.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main() -> None:
    # 1. Headline bench (prints the JSON line).
    import bench

    bench.main()
    sys.stdout.flush()

    import jax
    import jax.numpy as jnp

    # 2. MICW device decode exactness on real CT (full container path).
    from mic_tpu.tpu.strips import micw_compress, micw_decompress_device

    px = np.fromfile("/root/reference/testdata/CT_512_512_image.bin", dtype="<u2")
    mx = int(px.max())
    blob = micw_compress(px, 512, 512, mx)
    t0 = time.time()
    out, w, h = micw_decompress_device(blob)
    t1 = time.time()
    print(f"MICW CT device decode exact={np.array_equal(out, px)} "
          f"(first call {t1 - t0:.1f}s, ratio {px.nbytes / len(blob):.3f})")
    sys.stdout.flush()

    # 3. Pallas kernels compiled on the real chip.
    from mic_tpu.tpu.kernels import (
        wavelet_forward_2d_separated_tpu,
        wavelet_inverse_2d_separated_tpu,
        ycocgr_forward_tpu,
        ycocgr_inverse_tpu,
    )

    rng = np.random.default_rng(0)
    img = px.reshape(512, 512).astype(np.int32)
    fwd = wavelet_forward_2d_separated_tpu(jnp.asarray(img), rows=512, cols=512, levels=5)
    back = wavelet_inverse_2d_separated_tpu(fwd, rows=512, cols=512, levels=5)
    print("pallas wavelet 2D roundtrip exact:", bool((np.asarray(back) == img).all()))
    N = 50
    fwd.block_until_ready()
    t0 = time.time()
    for _ in range(N):
        back = wavelet_inverse_2d_separated_tpu(fwd, rows=512, cols=512, levels=5)
    back.block_until_ready()
    wps = px.nbytes * N / (time.time() - t0) / 1e9
    print(f"pallas wavelet inverse (5 levels): {wps:.2f} GB/s")

    r = rng.integers(0, 256, (512, 512)).astype(np.uint16)
    g = rng.integers(0, 256, (512, 512)).astype(np.uint16)
    b = rng.integers(0, 256, (512, 512)).astype(np.uint16)
    y, co, cg = ycocgr_forward_tpu(jnp.asarray(r), jnp.asarray(g), jnp.asarray(b))
    r2, g2, b2 = ycocgr_inverse_tpu(y, co, cg)
    ok = (np.asarray(r2) == r).all() and (np.asarray(g2) == g).all() and (np.asarray(b2) == b).all()
    print("pallas ycocgr roundtrip exact:", bool(ok))
    y.block_until_ready()
    t0 = time.time()
    for _ in range(N):
        y, co, cg = ycocgr_forward_tpu(jnp.asarray(r), jnp.asarray(g), jnp.asarray(b))
    y.block_until_ready()
    print(f"pallas ycocgr forward: {r.nbytes * 3 * N / (time.time() - t0) / 1e9:.2f} GB/s")

    # 4. Entropy-stage-only throughput (the 19 GB/s number, re-verified).
    from mic_tpu.tpu.device_rans import mict_encode
    from mic_tpu.tpu.decode import make_plan, rans_decode_jax
    from mic_tpu.ops.deltarle import zz_delta_rle_compress
    from mic_tpu.ops.rle import rle_to_soa

    rle = zz_delta_rle_compress(px, 512, 512, mx)
    soa, _nr, _ns = rle_to_soa(rle, 1, (1 << (int(mx).bit_length() - 1)) - 1)
    eblob = mict_encode(soa, lanes=1024)
    p = make_plan(eblob)
    args = [jnp.asarray(x) for x in (p.init_states, p.words, p.tab_sym, p.tab_freq, p.tab_bias)]
    kw = dict(table_log=p.table_log, n_steps=p.n_steps, count=p.count)
    out = rans_decode_jax(*args, **kw)
    out.block_until_ready()
    t0 = time.time()
    for _ in range(N):
        out = rans_decode_jax(*args, **kw)
    out.block_until_ready()
    dt = (time.time() - t0) / N
    print(f"entropy stage: {p.count / dt / 1e6:.0f} Msym/s = {p.count * 2 / dt / 1e9:.2f} GB/s")


if __name__ == "__main__":
    main()
