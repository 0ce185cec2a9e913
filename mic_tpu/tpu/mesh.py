"""Multi-chip decode: strip/tile batches sharded over a device mesh.

The reference's parallelism axes — PICS strips, MIC3 tiles, MIC2 frames
(parallelstrips.go goroutines, wsicompress.go worker pool, mic_parallel.c
pthreads) — are embarrassingly parallel, so on TPU they become a single
sharded batch axis: shard_map partitions the strip axis across the mesh
and each chip runs the fused decode program on its local strips.  No
collectives are needed for decode; compressed blobs scatter host-side
(the offset tables in the containers are exactly the metadata the
device→host path needs, SURVEY.md §5).

Encode-side sharding works the same way (each chip compresses its
strips); the ragged compressed outputs gather host-side.
"""

from __future__ import annotations

from functools import partial

import jax
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from .strips import decode_strip_batch_impl

__all__ = ["make_strip_mesh", "decode_strips_sharded"]


def make_strip_mesh(devices=None, axis: str = "strips") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.array(devices), (axis,))


def decode_strips_sharded(
    mesh: Mesh,
    init_states,
    words,
    tab_sym,
    tab_freq,
    tab_bias,
    counts,
    n_tokens,
    *,
    table_log: int,
    n_steps: int,
    width: int,
    strip_h: int,
    max_tokens: int,
    mid_count: int,
    delim: int,
):
    """Decode a strip batch with the strip axis sharded over ``mesh``.

    The leading (strip) dimension of every operand must be divisible by
    the mesh size — pad with dummy strips if needed.  Returns
    uint16[S, width*strip_h] with the same sharding.
    """
    axis = mesh.axis_names[0]
    body = partial(
        decode_strip_batch_impl,
        table_log=table_log,
        n_steps=n_steps,
        width=width,
        strip_h=strip_h,
        max_tokens=max_tokens,
        mid_count=mid_count,
        delim=delim,
    )
    spec = P(axis)
    # check_vma=False: the rANS scan carry (word cursor) starts replicated
    # and becomes device-varying; that's intentional — each shard walks its
    # own word stream.
    fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(spec, spec, spec, spec, spec, spec, spec),
        out_specs=spec,
        check_vma=False,
    )
    return jax.jit(fn)(init_states, words, tab_sym, tab_freq, tab_bias, counts, n_tokens)
