"""TPU device tier: wide-lane rANS, fused decode pipeline, Pallas kernels,
and mesh-sharded batch decode."""

import os

import jax

# Persistent compilation cache: decode programs are shape-keyed (strip
# geometry, lane count, tableLog); caching across processes turns the
# 30-90s first-compile into a one-time cost per shape family.
_cache_dir = os.environ.get("MIC_TPU_COMPILE_CACHE", os.path.expanduser("~/.cache/mic_tpu_xla"))
try:
    os.makedirs(_cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:  # pragma: no cover - cache is best-effort
    pass
