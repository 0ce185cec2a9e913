"""TPU device tier: wide-lane rANS, fused decode pipeline, Pallas kernels,
and mesh-sharded batch decode."""

import os

import jax

# Persistent compilation cache: OPT-IN via MIC_TPU_COMPILE_CACHE=<dir>.
#
# Round-2 finding (2026-08-17): on the tunneled axon backend, LOADING a
# cached executable hangs forever (the deserialize/load request gets no
# response), while fresh compiles complete in seconds-to-minutes — a
# warm cache turned every session into a silent stall.  The same
# workload with a fresh cache dir ran in 57 s.  So the cache is now
# opt-in; enable it only on backends where executable deserialization
# is known-good (e.g. local CPU test runs).
_cache_dir = os.environ.get("MIC_TPU_COMPILE_CACHE", "")
if _cache_dir:
    try:
        os.makedirs(_cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", _cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass
