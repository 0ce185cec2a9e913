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

__all__ = [
    "make_strip_mesh",
    "decode_strips_sharded",
    "decode_strips_sharded_pallas",
    "decode_rle_sharded",
    "decode_alias_sharded",
    "decode_tans_sharded",
    "encode_strips_sharded",
    "encode_alias_sharded",
]


def make_strip_mesh(devices=None, axis: str = "strips") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.array(devices), (axis,))


def decode_strips_sharded(mesh: Mesh, *arrays, **static):
    """Decode a strip batch with the strip axis sharded over ``mesh``.

    ``arrays`` are the 11 operands of decode_strip_batch_impl (leading
    strip dimension divisible by the mesh size — pad with dummy strips if
    needed); ``static`` are its keyword parameters.  Returns
    uint16[S, width*strip_h] with the same sharding.
    """
    axis = mesh.axis_names[0]
    body = partial(decode_strip_batch_impl, **static)
    spec = P(axis)
    # check_vma=False: the rANS scan carry (word cursor) starts replicated
    # and becomes device-varying; that's intentional — each shard walks its
    # own word stream.
    fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=tuple(spec for _ in arrays),
        out_specs=spec,
        check_vma=False,
    )
    return jax.jit(fn)(*arrays)


def decode_strips_sharded_pallas(mesh: Mesh, init, tpk, alpha, words, mask, shift, ws, **static):
    """Fused Pallas zzd decode with the strip axis sharded over ``mesh``.

    Each chip runs the whole-scan kernel on its local strip shard (strip
    count per shard must divide GROUP-pad cleanly: pad the batch to
    mesh_size * k strips).  No collectives — strips are independent; this
    is the reference's multi-worker parallelism (parallelstrips.go,
    wsicompress.go pools) expressed as sharding.
    """
    from .pallas_rans import rans_decode_pallas_zzd

    axis = mesh.axis_names[0]
    spec = P(axis)

    def body(*arrs):
        return rans_decode_pallas_zzd(*arrs, **static)

    fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=tuple(spec for _ in range(7)),
        out_specs=spec,
        check_vma=False,
    )
    return jax.jit(fn)(init, tpk, alpha, words, mask, shift, ws)


def decode_rle_sharded(mesh: Mesh, *arrays, **static):
    """Fused r-mode decode (rANS + SoA-RLE expand + direct inverse,
    rans_decode_pallas_rle) with the strip axis sharded over ``mesh``.
    ``arrays`` are its 9 operands (init, tpk, alpha, words, mask, shift,
    ws, nrun, nsame); ``static`` its keyword parameters except n_strips,
    derived per shard."""
    from .pallas_rans import rans_decode_pallas_rle

    axis = mesh.axis_names[0]
    spec = P(axis)
    per_shard = arrays[0].shape[0] // mesh.devices.size
    body = partial(rans_decode_pallas_rle,
                   **{**static, "n_strips": per_shard})
    fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=tuple(spec for _ in arrays),
        out_specs=spec,
        check_vma=False,
    )
    return jax.jit(fn)(*arrays)


def decode_alias_sharded(mesh: Mesh, *arrays, **static):
    """Alias-bucket (FF 41) fused decode with the strip axis sharded over
    ``mesh``.  ``arrays`` are the 10 operands of
    rans_decode_pallas_alias (strip count divisible by the mesh size);
    ``static`` its keyword parameters except n_strips, which is derived
    per shard.  The kernel has no tableLog/alphabet statics, so one
    sharded executable serves mixed-table-log archives.
    """
    from .pallas_rans import rans_decode_pallas_alias

    axis = mesh.axis_names[0]
    spec = P(axis)
    per_shard = arrays[0].shape[0] // mesh.devices.size
    body = partial(rans_decode_pallas_alias,
                   **{**static, "n_strips": per_shard})
    fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=tuple(spec for _ in arrays),
        out_specs=spec,
        check_vma=False,
    )
    return jax.jit(fn)(*arrays)


def decode_tans_sharded(mesh: Mesh, init, pos, cnt, tpk, alpha, words, **static):
    """Reference-format tANS decode (pallas_tans) with the STREAM axis
    sharded over ``mesh`` — each chip decodes its shard of the blob batch
    (strips of a PICS archive, frames of a MIC2 file).  Stream count must
    be divisible by the mesh size; pad with duplicate streams otherwise.
    """
    from .pallas_tans import tans_decode_pallas

    axis = mesh.axis_names[0]
    spec = P(axis)
    per_shard = init.shape[0] // mesh.devices.size
    body = partial(
        tans_decode_pallas,
        **{**static, "n_streams": per_shard},
    )
    fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=tuple(spec for _ in range(6)),
        out_specs=spec,
        check_vma=False,
    )
    return jax.jit(fn)(init, pos, cnt, tpk, alpha, words)


def encode_strips_sharded(mesh: Mesh, ranks, te1, te2, count, tls, **static):
    """Device ENCODE (pallas_enc.rans_encode_pallas) with the strip axis
    sharded over ``mesh`` — each chip encodes its local strips; the
    ragged compressed outputs gather host-side from the per-shard word
    planes (the offset table each container writes is exactly the
    metadata this produces).  The mesh size must divide the strip count
    (pad with replica strips otherwise).
    """
    from .pallas_enc import rans_encode_pallas

    axis = mesh.axis_names[0]
    spec = P(axis)
    per_shard = ranks.shape[0] // mesh.devices.size
    body = partial(rans_encode_pallas, **{**static, "n_strips": per_shard})
    fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=tuple(spec for _ in range(5)),
        out_specs=(spec, spec, spec),
        check_vma=False,
    )
    return jax.jit(fn)(ranks, te1, te2, count, tls)


def encode_alias_sharded(mesh: Mesh, ranks, te1, te2, ar1, ar2, count, tls,
                         **static):
    """Alias-layout (FF 41) device ENCODE under shard_map — the 7
    operands of pallas_enc.rans_encode_pallas_alias with the strip axis
    sharded; the mesh size must divide the strip count."""
    from .pallas_enc import rans_encode_pallas_alias

    axis = mesh.axis_names[0]
    spec = P(axis)
    per_shard = ranks.shape[0] // mesh.devices.size
    body = partial(rans_encode_pallas_alias, **{**static, "n_strips": per_shard})
    fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=tuple(spec for _ in range(7)),
        out_specs=(spec, spec, spec),
        check_vma=False,
    )
    return jax.jit(fn)(ranks, te1, te2, ar1, ar2, count, tls)
