"""Standalone probe: chunked batch-128 MR decode on the real chip, with
unbuffered file logging and periodic stack dumps (the tunnel stalls
silently, so every phase logs before and after)."""

import faulthandler
import sys
import time
from pathlib import Path

LOG = open("/tmp/probe_batch.log", "w", buffering=1)
faulthandler.dump_traceback_later(120, repeat=True, file=LOG)

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import numpy as np


def log(msg):
    LOG.write(f"[{time.strftime('%H:%M:%S')}] {msg}\n")


log("importing jax")
import jax  # noqa: E402

log(f"devices: {jax.devices()}")
from mic_tpu.tpu.strips import MicwDecodePlan, micw_compress  # noqa: E402

px = np.fromfile("/root/reference/testdata/MR_256_256_image.bin", dtype="<u2")
blob = micw_compress(px, 256, 256, int(px.max()))
log("compressed; building plan (staging h2d)")
t0 = time.time()
plan = MicwDecodePlan([blob] * 128)
log(f"plan built {time.time()-t0:.1f}s; launch keys: {list(plan.launches)}")
d = plan.run()
log(f"run dispatched {time.time()-t0:.1f}s; verifying (compiles+executes)")
ok = plan.verify_against(d, px)
log(f"verified={ok} {time.time()-t0:.1f}s; timing steady state")
t0 = time.time()
for _ in range(10):
    d = plan.run()
for v in d.values():
    if v is not None:
        v.block_until_ready()
dt = (time.time() - t0) / 10
log(f"steady: {128 * px.nbytes / dt / 1e9:.2f} GB/s")
log("DONE")
