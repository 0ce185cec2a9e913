"""Pallas TPU kernels for the elementwise/blocked hot ops.

These are the device kernels for the transform stages — the analog of
the reference's AVX2/NEON kernels (wavelet_simd_amd64.s, asm_arm64.s
YCoCg).  They are written against the Pallas TPU programming model:
VMEM-resident blocks, VPU elementwise math, grid over row blocks.

Kernels here must stay bit-exact with the numpy host ops — enforced by
tests (interpret mode on CPU, compiled on TPU).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

__all__ = [
    "ycocgr_forward_tpu",
    "ycocgr_inverse_tpu",
    "wt53_rows_forward_tpu",
    "wt53_rows_inverse_tpu",
    "wavelet_forward_2d_separated_tpu",
    "wavelet_inverse_2d_separated_tpu",
]

_INTERPRET = None


def _interpret() -> bool:
    """Pallas TPU kernels run compiled on TPU, interpreted elsewhere."""
    global _INTERPRET
    if _INTERPRET is None:
        _INTERPRET = jax.default_backend() not in ("tpu", "axon")
    return _INTERPRET


# ───────────────────────── YCoCg-R ─────────────────────────


def _ycocgr_fwd_kernel(r_ref, g_ref, b_ref, y_ref, co_ref, cg_ref):
    r = r_ref[:].astype(jnp.int32)
    g = g_ref[:].astype(jnp.int32)
    b = b_ref[:].astype(jnp.int32)
    co = r - b
    t = b + (co >> 1)
    cg = g - t
    y = t + (cg >> 1)
    # ZigZag co/cg (int16 range) to unsigned.
    co16 = co.astype(jnp.int16)
    cg16 = cg.astype(jnp.int16)
    y_ref[:] = y.astype(jnp.uint16)
    co_ref[:] = ((co16.astype(jnp.uint16) << 1) ^ (co16 >> 15).astype(jnp.uint16))
    cg_ref[:] = ((cg16.astype(jnp.uint16) << 1) ^ (cg16 >> 15).astype(jnp.uint16))


@partial(jax.jit, static_argnames=())
def ycocgr_forward_tpu(r: jax.Array, g: jax.Array, b: jax.Array):
    """Planar RGB (uint16 planes, 2D [rows, cols]) -> (Y, Co, Cg) planes.

    Device mirror of ops.color.ycocgr_forward (reference ycocgr.go via
    asm_generic.go:25-43), vectorized on the VPU.
    """
    shape = jax.ShapeDtypeStruct(r.shape, jnp.uint16)
    return pl.pallas_call(
        _ycocgr_fwd_kernel,
        out_shape=(shape, shape, shape),
        interpret=_interpret(),
    )(r, g, b)


def _ycocgr_inv_kernel(y_ref, co_ref, cg_ref, r_ref, g_ref, b_ref):
    yv = y_ref[:].astype(jnp.int32)
    co_u = co_ref[:].astype(jnp.uint16)
    cg_u = cg_ref[:].astype(jnp.uint16)
    co = ((co_u >> 1) ^ (-(co_u & 1)).astype(jnp.uint16)).astype(jnp.int16).astype(jnp.int32)
    cg = ((cg_u >> 1) ^ (-(cg_u & 1)).astype(jnp.uint16)).astype(jnp.int16).astype(jnp.int32)
    t = yv - (cg >> 1)
    g = cg + t
    b = t - (co >> 1)
    r = co + b
    r_ref[:] = r.astype(jnp.uint16)
    g_ref[:] = g.astype(jnp.uint16)
    b_ref[:] = b.astype(jnp.uint16)


@partial(jax.jit, static_argnames=())
def ycocgr_inverse_tpu(y: jax.Array, co: jax.Array, cg: jax.Array):
    """(Y, Co, Cg) planes -> planar (R, G, B) uint16 planes."""
    shape = jax.ShapeDtypeStruct(y.shape, jnp.uint16)
    return pl.pallas_call(
        _ycocgr_inv_kernel,
        out_shape=(shape, shape, shape),
        interpret=_interpret(),
    )(y, co, cg)


# ──────────────────── 5/3 lifting, row pass ────────────────────
#
# The horizontal lifting pass over a block of rows: rows are independent,
# so a [block_rows, cols] VMEM tile does predict+update with pure VPU
# slicing — the same blocked shape as the reference's AVX2 column kernels
# (waveletu16.go:314-412), transposed to rows.


def _wt53_fwd_kernel(even_ref, odd_ref, s_ref, d_ref, *, n: int):
    """Lifting on pre-split even/odd halves: pure VPU math with static
    slices only (Mosaic does not lower strided gathers; the interleave
    and de-interleave live outside the kernel where XLA handles them)."""
    even = even_ref[:].astype(jnp.int32)
    odd = odd_ref[:].astype(jnp.int32)
    n_half = n // 2
    if n % 2 == 1:
        right = even[:, 1:]
    else:
        right = jnp.concatenate([even[:, 1:], even[:, -1:]], axis=1)
    d = odd - ((even[:, :n_half] + right) >> 1)
    if n % 2 == 1:
        d_right = jnp.concatenate([d, d[:, -1:]], axis=1)
    else:
        d_right = d
    d_left = jnp.concatenate([d_right[:, :1], d[:, : ((n + 1) // 2) - 1]], axis=1)
    s_ref[:] = even + ((d_left + d_right + 2) >> 2)
    d_ref[:] = d


def _wt53_inv_kernel(s_in_ref, d_in_ref, even_ref, odd_ref, *, n: int):
    s = s_in_ref[:].astype(jnp.int32)
    d = d_in_ref[:].astype(jnp.int32)
    n_half = n // 2
    n_low = (n + 1) // 2
    if n % 2 == 1:
        d_right = jnp.concatenate([d, d[:, -1:]], axis=1)
    else:
        d_right = d
    d_left = jnp.concatenate([d_right[:, :1], d[:, : n_low - 1]], axis=1)
    even = s - ((d_left + d_right + 2) >> 2)
    if n % 2 == 1:
        right = even[:, 1:]
    else:
        right = jnp.concatenate([even[:, 1:], even[:, -1:]], axis=1)
    even_ref[:] = even
    odd_ref[:] = d + ((even[:, :n_half] + right) >> 1)


def _wt53_call(kernel, a: jax.Array, b: jax.Array, n: int, out_cols):
    rows = a.shape[0]
    block = min(rows, 256)
    grid = (rows + block - 1) // block
    shapes = tuple(jax.ShapeDtypeStruct((rows, c), jnp.int32) for c in out_cols)
    return pl.pallas_call(
        partial(kernel, n=n),
        out_shape=shapes,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((block, a.shape[1]), lambda i: (i, 0)),
            pl.BlockSpec((block, b.shape[1]), lambda i: (i, 0)),
        ],
        out_specs=tuple(pl.BlockSpec((block, c), lambda i: (i, 0)) for c in out_cols),
        interpret=_interpret(),
    )(a.astype(jnp.int32), b.astype(jnp.int32))


@jax.jit
def wt53_rows_forward_tpu(x: jax.Array) -> jax.Array:
    """Forward 5/3 lifting along axis 1 (interleaved output), gridded over
    row blocks.  Bit-exact with ops.wavelet.wt53_forward_1d(axis=1)."""
    rows, cols = x.shape
    if cols < 2:
        return x.astype(jnp.int32)
    even, odd = x[:, 0::2], x[:, 1::2]  # strided split outside the kernel
    n_low, n_half = (cols + 1) // 2, cols // 2
    s, d = _wt53_call(_wt53_fwd_kernel, even, odd, cols, (n_low, n_half))
    out = jnp.zeros((rows, cols), jnp.int32)
    out = out.at[:, 0::2].set(s)
    out = out.at[:, 1::2].set(d)
    return out


@jax.jit
def wt53_rows_inverse_tpu(x: jax.Array) -> jax.Array:
    """Inverse of wt53_rows_forward_tpu."""
    rows, cols = x.shape
    if cols < 2:
        return x.astype(jnp.int32)
    s, d = x[:, 0::2], x[:, 1::2]
    n_low, n_half = (cols + 1) // 2, cols // 2
    even, odd = _wt53_call(_wt53_inv_kernel, s, d, cols, (n_low, n_half))
    out = jnp.zeros((rows, cols), jnp.int32)
    out = out.at[:, 0::2].set(even)
    out = out.at[:, 1::2].set(odd)
    return out


# ─────────────── multi-level 2D wavelet on device ───────────────
#
# Column lifting = transpose → row kernel → transpose (XLA transposes are
# fast layout changes on TPU).  Multi-level Mallat recursion has static
# per-level shapes, so the whole inverse compiles to one program.


def _deinterleave_cols(a: jax.Array) -> jax.Array:
    return jnp.concatenate([a[:, 0::2], a[:, 1::2]], axis=1)


def _reinterleave_cols(a: jax.Array) -> jax.Array:
    n = a.shape[1]
    n_low = (n + 1) // 2
    out = jnp.zeros_like(a)
    out = out.at[:, 0::2].set(a[:, :n_low])
    out = out.at[:, 1::2].set(a[:, n_low:])
    return out


def _level_dims(rows: int, cols: int, levels: int):
    dims = []
    r, c = rows, cols
    for _ in range(levels):
        if r < 2 or c < 2:
            break
        dims.append((r, c))
        r, c = (r + 1) // 2, (c + 1) // 2
    return dims


@partial(jax.jit, static_argnames=("rows", "cols", "levels"))
def wavelet_forward_2d_separated_tpu(img: jax.Array, *, rows: int, cols: int, levels: int):
    """Multi-level forward 5/3 into Mallat layout, all levels in one
    program (device mirror of ops.wavelet.wt53_forward_2d_separated)."""
    data = img.astype(jnp.int32).reshape(rows, cols)
    for r, c in _level_dims(rows, cols, levels):
        region = data[:r, :c]
        region = _deinterleave_cols(wt53_rows_forward_tpu(region))
        region = _deinterleave_cols(wt53_rows_forward_tpu(region.T)).T
        data = data.at[:r, :c].set(region)
    return data


@partial(jax.jit, static_argnames=("rows", "cols", "levels"))
def wavelet_inverse_2d_separated_tpu(coeffs: jax.Array, *, rows: int, cols: int, levels: int):
    """Multi-level inverse 5/3 from Mallat layout."""
    data = coeffs.astype(jnp.int32).reshape(rows, cols)
    for r, c in reversed(_level_dims(rows, cols, levels)):
        region = data[:r, :c]
        region = wt53_rows_inverse_tpu(_reinterleave_cols(region.T)).T
        region = wt53_rows_inverse_tpu(_reinterleave_cols(region))
        data = data.at[:r, :c].set(region)
    return data
