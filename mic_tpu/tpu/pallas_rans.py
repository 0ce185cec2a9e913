"""Pallas TPU kernel for the wide-lane rANS decode scan.

The lax.scan implementation (tpu/decode.py) pays per-step kernel-launch
overhead (~tens of µs on the tunneled runtime), which dominates at
260-ish steps.  This kernel runs the *entire* scan inside one
``pallas_call``: states live in vregs, tables and word streams in VMEM,
and the only per-step costs are VPU ops.

Mosaic constraints shape the design (all discovered empirically, v5e):

* hardware gather = ``take_along_axis`` on [rows, 128] with table width
  exactly 128 → the 2^tl-entry decode table is swept in 128-wide tiles
  with a static Python loop (masked select per tile);
* no ``cumsum`` → renorm compaction uses a Hillis–Steele scan built from
  ``pltpu.roll``;
* no ``scatter`` → per-strip word windows are built by concatenating
  per-row dynamic slices.

Geometry: strips ride the sublane axis in groups of 8 (one vreg), each
strip contributing 128 lanes (MICW's default).  The strip-group axis is
the pallas grid, so arbitrarily large batches decode in one launch with
bounded VMEM (Mosaic double-buffers the per-group blocks).
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "rans_decode_pallas",
    "rans_decode_pallas_packed",
    "rans_decode_pallas_zzd",
    "rans_decode_pallas_alias",
    "build_pallas_tables",
    "build_packed_tables",
    "build_alias_bucket_tables",
    "supports_pallas_rans",
]


def supports_pallas_rans() -> bool:
    return jax.default_backend() in ("tpu", "axon")


def _kernel(init_ref, tsym_ref, tfb_ref, words_ref, mask_ref, shift_ref, out_ref, *, steps, n_strips, table_log):
    S = n_strips
    TS = 1 << table_log
    SWEEP = TS // 128
    ri = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
    M = (ri < ci).astype(jnp.bfloat16)

    def step(carry):
        x, cur = carry  # x: [S,128] uint32 states, cur: [S,1] int32 word cursors
        slot = (x & mask_ref[:]).astype(jnp.int32)
        hi = slot >> 7
        lo = slot & 127
        sym = jnp.zeros((S, 128), jnp.uint32)
        fb = jnp.zeros((S, 128), jnp.uint32)
        for h in range(SWEEP):
            m = hi == h
            ts_row = tsym_ref[:, pl.ds(h * 128, 128)]
            tf_row = tfb_ref[:, pl.ds(h * 128, 128)]
            sym = jnp.where(m, jnp.take_along_axis(ts_row, lo, axis=1), sym)
            fb = jnp.where(m, jnp.take_along_axis(tf_row, lo, axis=1), fb)
        f = fb >> 16
        b = fb & jnp.uint32(0xFFFF)
        xn = f * jax.lax.shift_right_logical(x, shift_ref[:]) + b
        need = xn < jnp.uint32(1 << 16)
        nee = need.astype(jnp.int32)  # int32: Mosaic lacks unsigned reductions
        # Exclusive prefix sum along lanes on the MXU: nee @ strict-upper-
        # triangular ones.  Values <= 128 are exact in bfloat16, and one
        # 128x128 matmul beats the 7-round Hillis-Steele roll scan by ~5ms
        # per 128-image batch (measured; the scan was the largest cost).
        kf = jax.lax.dot_general(
            nee.astype(jnp.bfloat16), M, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        k = kf.astype(jnp.int32)
        total = k[:, 127:128] + nee[:, 127:128]
        # Per-strip word windows: Mosaic requires 128-aligned minor-dim
        # loads, so take the two aligned blocks covering [cur, cur+128)
        # (words_ref is [S, W/128, 128]; major-dim indices may be dynamic).
        win0 = jnp.concatenate(
            [words_ref[s, pl.ds(cur[s, 0] >> 7, 1), :] for s in range(S)], axis=0
        )
        win1 = jnp.concatenate(
            [words_ref[s, pl.ds((cur[s, 0] >> 7) + 1, 1), :] for s in range(S)], axis=0
        )
        idx = (cur & 127) + k  # [S,128], in [0, 255]
        idx0 = idx & 127
        wv = jnp.where(
            idx < 128,
            jnp.take_along_axis(win0, idx0, axis=1),
            jnp.take_along_axis(win1, idx0, axis=1),
        )
        xn = jnp.where(need, (xn << jnp.uint32(16)) | wv, xn)
        # No max-guard needed: valid streams keep states >= 2^16; pad
        # lanes/steps may hold garbage but their outputs are discarded
        # (Mosaic cannot legalize unsigned max anyway).
        return (xn, cur + total), sym

    def body(tb, carry):
        # 8 steps per iteration: dynamic stores on the step axis must be
        # 8-aligned (u16 sublane granularity), so buffer a block in vregs.
        syms = []
        for _ in range(8):
            carry, sym = step(carry)
            syms.append(sym.astype(jnp.uint16).reshape(S, 1, 128))
        out_ref[:, pl.ds(tb * 8, 8), :] = jnp.concatenate(syms, axis=1)
        return carry

    jax.lax.fori_loop(0, steps // 8, body, (init_ref[:], jnp.zeros((S, 1), jnp.int32)))


def GROUP() -> int:
    """Strips per grid program (bounds VMEM; swept empirically on v5e:
    32 > 16 > 8).  Interpret mode (no TPU) pays per-padded-strip python
    cost, so the CPU test path uses small groups."""
    return 32 if supports_pallas_rans() else 8


@partial(jax.jit, static_argnames=("steps", "n_strips", "table_log"))
def rans_decode_pallas(init, tsym, tfb, words, mask, shift, *, steps, n_strips, table_log):
    """Decode S strips × 128 lanes of wide-lane rANS in one kernel.

    init: uint32[S,128] initial states.  tsym/tfb: uint32[S, 2^tl] decode
    tables (tfb = freq<<16 | bias), tables of strips with smaller
    tableLogs tiled up to 2^tl.  words: uint32[S, W/128, 128] per-strip
    renorm streams (u16 values), padded by >=256.  mask/shift:
    uint32[S,128] per-strip slot masks (2^tl_s - 1) and shifts (tl_s).
    Returns uint16[S, steps, 128] symbols: reshape(S, -1) gives each
    strip's stream in order with no transpose.
    """
    S = init.shape[0]
    if S % GROUP() != 0:
        # Pad the strip axis with copies of strip 0 so every grid program
        # sees a full group; padded rows decode real (discarded) data, so
        # no out-of-bounds word reads can occur.
        pad = GROUP() - S % GROUP()
        init, tsym, tfb, words, mask, shift = (
            jnp.concatenate([a, jnp.broadcast_to(a[:1], (pad,) + a.shape[1:])])
            for a in (init, tsym, tfb, words, mask, shift)
        )
        full = rans_decode_pallas(
            init, tsym, tfb, words, mask, shift,
            steps=steps, n_strips=S + pad, table_log=table_log,
        )
        return full[:S]
    grid = S // GROUP()
    TS = 1 << table_log
    W = words.shape[1] * words.shape[2]
    return pl.pallas_call(
        partial(_kernel, steps=steps, n_strips=GROUP(), table_log=table_log),
        out_shape=jax.ShapeDtypeStruct((S, steps, 128), jnp.uint16),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((GROUP(), 128), lambda i: (i, 0)),
            pl.BlockSpec((GROUP(), TS), lambda i: (i, 0)),
            pl.BlockSpec((GROUP(), TS), lambda i: (i, 0)),
            pl.BlockSpec((GROUP(), words.shape[1], 128), lambda i: (i, 0, 0)),
            pl.BlockSpec((GROUP(), 128), lambda i: (i, 0)),
            pl.BlockSpec((GROUP(), 128), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((GROUP(), steps, 128), lambda i: (i, 0, 0)),
        interpret=not supports_pallas_rans(),
    )(init, tsym, tfb, words, mask, shift)


def build_pallas_tables(parsed, table_log: int, min_steps: int = 0):
    """Build the kernel's table/state/word arrays from parsed MICT strips
    (mict_parse outputs).  Strips with smaller tableLogs get their tables
    tiled (slot masks stay valid because each strip's states never exceed
    its own 2^tl in the low bits... the tiling makes any higher bits map
    to the same entries).  ``min_steps`` pads the scan length up to a
    caller-chosen bucket (program sharing across chunks/images)."""
    from .device_rans import slot_tables

    S = len(parsed)
    TS = 1 << table_log
    init = np.zeros((S, 128), np.uint32)
    tsym = np.zeros((S, TS), np.uint32)
    tfb = np.zeros((S, TS), np.uint32)
    # Word-stream margin: steps is the max over strips (rounded up to the
    # 8-step store block), so a shorter strip keeps renorming garbage
    # states off the zero padding after its stream ends — reads must stay
    # in bounds for (steps*128 - count) extra lane-steps.
    steps = max(min_steps, max((p[2] + 127) // 128 for p in parsed))
    steps = (steps + 7) // 8 * 8
    margin = max(steps * 128 - p[2] for p in parsed) + 256
    wmax = ((max(len(p[4]) for p in parsed) + margin + 127) // 128) * 128
    words = np.zeros((S, wmax), np.uint32)
    mask = np.zeros((S, 128), np.uint32)
    shift = np.zeros((S, 128), np.uint32)
    counts = []
    for i, p in enumerate(parsed):
        L, tl, count, states, wrds, norm, _sl, alias = p
        if L != 128:
            raise ValueError("pallas rANS kernel requires 128 lanes per strip")
        sym, fs, bs, _, _ = slot_tables(norm, tl, alias)
        reps = TS // (1 << tl)
        tsym[i] = np.tile(sym.astype(np.uint32), reps)
        tfb[i] = np.tile((fs.astype(np.uint32) << 16) | bs.astype(np.uint32), reps)
        init[i] = states
        words[i, : len(wrds)] = wrds
        mask[i, :] = (1 << tl) - 1
        shift[i, :] = tl
        counts.append(count)
    words = words.reshape(S, -1, 128)
    return init, tsym, tfb, words, mask, shift, counts, steps

# ---------------------------------------------------------------------------
# Packed variant: per-SLOT data (bias, rank) packs into one u32 —
# bias<<12 | rank — and the per-SYMBOL data (freq, symbol) rides the
# rank-indexed alphabet table as (freq-1)<<16 | sym.  The per-step sweep
# needs ONE gather per 128-slot tile plus a short alphabet sweep:
# 2^tl/128 + ceil(A/128) gathers/step vs 2 * 2^tl/128 for the two-table
# kernel — the sweep is the kernel's dominant cost (measured 52%).
# Supports tableLog <= 12 (bias needs tl bits) and alphabets <= 4096
# (12-bit rank); round 1 packed freq into the slot word, capping tl at 11
# — splitting per-slot/per-symbol data buys tl=12 (+1.4% corpus ratio)
# with the same gather count at tl<=11.
# ---------------------------------------------------------------------------


def _kernel_packed(init_ref, tpk_ref, alpha_ref, words_ref, mask_ref, shift_ref, out_ref, *, steps, n_strips, table_log, asweep):
    S = n_strips
    SWEEP = (1 << table_log) // 128
    ri = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
    M = (ri < ci).astype(jnp.bfloat16)

    def step(carry):
        x, cur = carry
        slot = (x & mask_ref[:]).astype(jnp.int32)
        hi = slot >> 7
        lo = slot & 127
        pk = jnp.zeros((S, 128), jnp.uint32)
        for h in range(SWEEP):
            m = hi == h
            pk = jnp.where(m, jnp.take_along_axis(tpk_ref[:, pl.ds(h * 128, 128)], lo, axis=1), pk)
        b = pk >> 12
        rank = (pk & jnp.uint32(0xFFF)).astype(jnp.int32)
        av = jnp.zeros((S, 128), jnp.uint32)
        rhi = rank >> 7
        rlo = rank & 127
        for h in range(asweep):
            m = rhi == h
            av = jnp.where(m, jnp.take_along_axis(alpha_ref[:, pl.ds(h * 128, 128)], rlo, axis=1), av)
        f = (av >> 16) + 1
        sym = av & jnp.uint32(0xFFFF)
        xn = f * jax.lax.shift_right_logical(x, shift_ref[:]) + b
        need = xn < jnp.uint32(1 << 16)
        nee = need.astype(jnp.int32)
        # MXU exclusive prefix sum — see _kernel.
        kf = jax.lax.dot_general(
            nee.astype(jnp.bfloat16), M, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        k = kf.astype(jnp.int32)
        total = k[:, 127:128] + nee[:, 127:128]
        win0 = jnp.concatenate(
            [words_ref[s, pl.ds(cur[s, 0] >> 7, 1), :] for s in range(S)], axis=0
        )
        win1 = jnp.concatenate(
            [words_ref[s, pl.ds((cur[s, 0] >> 7) + 1, 1), :] for s in range(S)], axis=0
        )
        idx = (cur & 127) + k
        idx0 = idx & 127
        wv = jnp.where(
            idx < 128,
            jnp.take_along_axis(win0, idx0, axis=1),
            jnp.take_along_axis(win1, idx0, axis=1),
        )
        xn = jnp.where(need, (xn << jnp.uint32(16)) | wv, xn)
        return (xn, cur + total), sym

    def body(tb, carry):
        syms = []
        for _ in range(8):
            carry, sym = step(carry)
            # out dtype follows the ref: uint16 standalone, int32 when the
            # fused r-kernel's syms scratch (Mosaic cannot dynamic-window
            # 16-bit packed-sublane refs — it crashes the compile helper;
            # the i32 scratch keeps phase 2's window gathers legal).
            syms.append(sym.astype(out_ref.dtype).reshape(S, 1, 128))
        out_ref[:, pl.ds(tb * 8, 8), :] = jnp.concatenate(syms, axis=1)
        return carry

    jax.lax.fori_loop(0, steps // 8, body, (init_ref[:], jnp.zeros((S, 1), jnp.int32)))


@partial(jax.jit, static_argnames=("steps", "n_strips", "table_log", "asweep"))
def rans_decode_pallas_packed(init, tpk, alpha, words, mask, shift, *, steps, n_strips, table_log, asweep):
    """Packed-table variant of rans_decode_pallas (tableLog <= 12).

    tpk: uint32[S, 2^tl] per-slot entries bias<<12 | rank.
    alpha: uint32[S, 128*asweep] per-rank entries (freq-1)<<16 | sym.
    Other operands and the output layout match rans_decode_pallas.
    """
    S = init.shape[0]
    if S % GROUP() != 0:
        pad = GROUP() - S % GROUP()
        init, tpk, alpha, words, mask, shift = (
            jnp.concatenate([a, jnp.broadcast_to(a[:1], (pad,) + a.shape[1:])])
            for a in (init, tpk, alpha, words, mask, shift)
        )
        full = rans_decode_pallas_packed(
            init, tpk, alpha, words, mask, shift,
            steps=steps, n_strips=S + pad, table_log=table_log, asweep=asweep,
        )
        return full[:S]
    grid = S // GROUP()
    TS = 1 << table_log
    return pl.pallas_call(
        partial(_kernel_packed, steps=steps, n_strips=GROUP(), table_log=table_log, asweep=asweep),
        out_shape=jax.ShapeDtypeStruct((S, steps, 128), jnp.uint16),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((GROUP(), 128), lambda i: (i, 0)),
            pl.BlockSpec((GROUP(), TS), lambda i: (i, 0)),
            pl.BlockSpec((GROUP(), alpha.shape[1]), lambda i: (i, 0)),
            pl.BlockSpec((GROUP(), words.shape[1], 128), lambda i: (i, 0, 0)),
            pl.BlockSpec((GROUP(), 128), lambda i: (i, 0)),
            pl.BlockSpec((GROUP(), 128), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((GROUP(), steps, 128), lambda i: (i, 0, 0)),
        interpret=not supports_pallas_rans(),
    )(init, tpk, alpha, words, mask, shift)


def build_packed_tables(parsed, table_log: int, min_steps: int = 0):
    """Packed-kernel table build; returns None if any strip's tableLog
    exceeds 12 or alphabet exceeds 4096 symbols (caller falls back to the
    two-table kernel).  Otherwise returns
    (init, tpk, alpha, words, mask, shift, counts, steps, asweep)
    with tpk[slot] = bias<<12 | rank and alpha[rank] = (freq-1)<<16 | sym.
    ``min_steps`` pads the scan length (and the word-stream margins that
    depend on it) up to a caller-chosen bucket size."""
    from .device_rans import slot_tables

    S = len(parsed)
    if table_log > 12:
        return None
    TS = 1 << table_log
    init = np.zeros((S, 128), np.uint32)
    tpk = np.zeros((S, TS), np.uint32)
    steps = max(min_steps, max((p[2] + 127) // 128 for p in parsed))
    steps = (steps + 7) // 8 * 8  # kernel stores 8-step blocks
    # See build_pallas_tables: margin covers garbage-state renorms on the
    # zero padding after a short strip's stream ends.
    margin = max(steps * 128 - p[2] for p in parsed) + 256
    wmax = ((max(len(p[4]) for p in parsed) + margin + 127) // 128) * 128
    words = np.zeros((S, wmax), np.uint32)
    mask = np.zeros((S, 128), np.uint32)
    shift = np.zeros((S, 128), np.uint32)
    counts = []
    alphas = []
    for i, p in enumerate(parsed):
        L, tl, count, states, wrds, norm, _sl, alias = p
        if L != 128:
            raise ValueError("pallas rANS kernel requires 128 lanes per strip")
        norm = np.asarray(norm)
        alpha_syms = np.nonzero(norm)[0].astype(np.uint32)
        if len(alpha_syms) > 4096:
            return None
        sym, fs, bs, _, _ = slot_tables(norm, tl, alias)
        rank = np.searchsorted(alpha_syms, sym).astype(np.uint32)
        packed = (bs.astype(np.uint32) << 12) | rank
        reps = TS // (1 << tl)
        tpk[i] = np.tile(packed, reps)
        init[i] = states
        words[i, : len(wrds)] = wrds
        mask[i, :] = (1 << tl) - 1
        shift[i, :] = tl
        counts.append(count)
        # Per-rank (freq-1)<<16 | sym — freq is per-symbol, so it rides
        # the alphabet table, freeing slot-word bits for tl=12 biases.
        fr = norm[alpha_syms].copy()
        fr[fr < 0] = 1  # low-prob (-1) symbols decode with freq 1
        alphas.append(((fr.astype(np.uint32) - 1) << 16) | alpha_syms)
    asweep = max(1, (max(len(a) for a in alphas) + 127) // 128)
    # Round the alphabet sweep to a power of two: asweep is a static
    # kernel arg, so bucketing it collapses the compiled-program family
    # (chunked launches across different images share executables).
    p2 = 1
    while p2 < asweep:
        p2 *= 2
    asweep = p2
    alpha = np.zeros((S, asweep * 128), np.uint32)
    for i, a in enumerate(alphas):
        alpha[i, : len(a)] = a
    words = words.reshape(S, -1, 128)
    return init, tpk, alpha, words, mask, shift, counts, steps, asweep

# ---------------------------------------------------------------------------
# Fully-fused zzd decode: entropy + unzigzag + row prefix-sum in ONE kernel.
# The zzd predictor's inverse (mod-2^16 row cumsum of unzigzagged deltas)
# runs on the MXU per step: an inclusive 128-lane prefix matmul in f32
# (|delta| <= 32767 so 128-element partial sums <= 2^22 stay exact;
# precision=HIGHEST keeps the operand split exact too) plus an int32
# row-carry threaded through the scan, reset every width/128 steps.
# The kernel therefore emits PIXELS — no separate post program, no HBM
# round-trip for the symbol stream.  Requires width % 128 == 0.
# ---------------------------------------------------------------------------


def _kernel_zzd(init_ref, tpk_ref, alpha_ref, words_ref, mask_ref, shift_ref, ws_ref, out_ref, *, steps, n_strips, table_log, asweep, vdd_ws=0):
    S = n_strips
    SWEEP = (1 << table_log) // 128
    ri = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
    M = (ri < ci).astype(jnp.bfloat16)
    Mi = (ri <= ci).astype(jnp.float32)

    def step(carry, col=0):
        x, cur, rowc, rcnt = carry
        slot = (x & mask_ref[:]).astype(jnp.int32)
        hi = slot >> 7
        lo = slot & 127
        pk = jnp.zeros((S, 128), jnp.uint32)
        for h in range(SWEEP):
            m = hi == h
            pk = jnp.where(m, jnp.take_along_axis(tpk_ref[:, pl.ds(h * 128, 128)], lo, axis=1), pk)
        b = pk >> 12
        rank = (pk & jnp.uint32(0xFFF)).astype(jnp.int32)
        av = jnp.zeros((S, 128), jnp.uint32)
        rhi = rank >> 7
        rlo = rank & 127
        for h in range(asweep):
            m = rhi == h
            av = jnp.where(m, jnp.take_along_axis(alpha_ref[:, pl.ds(h * 128, 128)], rlo, axis=1), av)
        f = (av >> 16) + 1
        sym = av & jnp.uint32(0xFFFF)
        xn = f * jax.lax.shift_right_logical(x, shift_ref[:]) + b
        need = xn < jnp.uint32(1 << 16)
        nee = need.astype(jnp.int32)
        kf = jax.lax.dot_general(
            nee.astype(jnp.bfloat16), M, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        k = kf.astype(jnp.int32)
        total = k[:, 127:128] + nee[:, 127:128]
        # One 2-row slice per strip (vs two 1-row slices): the slice
        # count is per-step serial work the VPU cannot batch.
        win = jnp.concatenate(
            [words_ref[s, pl.ds(cur[s, 0] >> 7, 2), :].reshape(1, 256)
             for s in range(S)], axis=0
        )
        idx = (cur & 127) + k
        idx0 = idx & 127
        wv = jnp.where(
            idx < 128,
            jnp.take_along_axis(win[:, :128], idx0, axis=1),
            jnp.take_along_axis(win[:, 128:], idx0, axis=1),
        )
        xn = jnp.where(need, (xn << jnp.uint32(16)) | wv, xn)
        si = sym.astype(jnp.int32)
        dz = (si >> 1) ^ (-(si & 1))
        if vdd_ws:
            # vdd: pixel = previous row's pixel (same column) + delta.
            # ``rowc`` carries the previous row as vdd_ws stacked
            # 128-lane chunks; the unroll guarantees ``col`` is static
            # (vdd_ws divides the 8-step unroll), so the chunk update is
            # static slicing + concat (Pallas TC has no dynamic_slice) —
            # no matmul at all.
            c0 = col * 128
            pix = (rowc[:, c0 : c0 + 128] + dz) & 0xFFFF
            parts = [p for p in (rowc[:, :c0], pix, rowc[:, c0 + 128 :])
                     if p.shape[1]]
            rowc = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=1)
            return (xn, cur + total, rowc, rcnt), pix.astype(jnp.uint16)
        ps = jax.lax.dot_general(
            dz.astype(jnp.float32), Mi, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        ).astype(jnp.int32)
        # Per-strip row counter: reset the carry at each row start, so one
        # batch can mix strips of different widths (rcnt counts steps into
        # the current row; ws = width/128 per strip).
        rowc = jnp.where(rcnt == 0, jnp.zeros_like(rowc), rowc)
        pix = (rowc + ps) & 0xFFFF
        rowc = pix[:, 127:128]
        rcnt = rcnt + 1
        rcnt = jnp.where(rcnt >= ws_ref[:, :1].astype(jnp.int32), jnp.zeros_like(rcnt), rcnt)
        return (xn, cur + total, rowc, rcnt), pix.astype(jnp.uint16)

    UNROLL = 16 if steps % 16 == 0 else 8

    def body(tb, carry):
        outs = []
        for j in range(UNROLL):
            carry, pix = step(carry, col=(j % vdd_ws) if vdd_ws else 0)
            outs.append(pix.reshape(S, 1, 128))
        out_ref[:, pl.ds(tb * UNROLL, UNROLL), :] = jnp.concatenate(outs, axis=1)
        return carry

    zero = jnp.zeros((S, 1), jnp.int32)
    rowc0 = jnp.zeros((S, vdd_ws * 128 if vdd_ws else 1), jnp.int32)
    jax.lax.fori_loop(0, steps // UNROLL, body, (init_ref[:], zero, rowc0, zero))


@partial(jax.jit, static_argnames=("steps", "n_strips", "table_log", "asweep", "vdd_ws"))
def rans_decode_pallas_zzd(init, tpk, alpha, words, mask, shift, ws, *, steps, n_strips, table_log, asweep, vdd_ws=0):
    """Fused MICW-zzd decode: packed-table rANS + unzigzag + row cumsum.

    Returns uint16[S, steps, 128] PIXELS (row-major per strip).  ws is
    uint32[S,128]: each strip's row width in 128-lane steps (width/128) —
    strips of DIFFERENT widths batch together.  See
    rans_decode_pallas_packed for the other operands.
    """
    S = init.shape[0]
    if S % GROUP() != 0:
        pad = GROUP() - S % GROUP()
        init, tpk, alpha, words, mask, shift, ws = (
            jnp.concatenate([a, jnp.broadcast_to(a[:1], (pad,) + a.shape[1:])])
            for a in (init, tpk, alpha, words, mask, shift, ws)
        )
        full = rans_decode_pallas_zzd(
            init, tpk, alpha, words, mask, shift, ws,
            steps=steps, n_strips=S + pad, table_log=table_log, asweep=asweep,
            vdd_ws=vdd_ws,
        )
        return full[:S]
    grid = S // GROUP()
    TS = 1 << table_log
    return pl.pallas_call(
        partial(
            _kernel_zzd, steps=steps, n_strips=GROUP(), table_log=table_log,
            asweep=asweep, vdd_ws=vdd_ws,
        ),
        out_shape=jax.ShapeDtypeStruct((S, steps, 128), jnp.uint16),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((GROUP(), 128), lambda i: (i, 0)),
            pl.BlockSpec((GROUP(), TS), lambda i: (i, 0)),
            pl.BlockSpec((GROUP(), alpha.shape[1]), lambda i: (i, 0)),
            pl.BlockSpec((GROUP(), words.shape[1], 128), lambda i: (i, 0, 0)),
            pl.BlockSpec((GROUP(), 128), lambda i: (i, 0)),
            pl.BlockSpec((GROUP(), 128), lambda i: (i, 0)),
            pl.BlockSpec((GROUP(), 128), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((GROUP(), steps, 128), lambda i: (i, 0, 0)),
        interpret=not supports_pallas_rans(),
    )(init, tpk, alpha, words, mask, shift, ws)

# ---------------------------------------------------------------------------
# Alias-bucket fused decode: the FF 41 alias-mapped streams
# (device_rans.mict_encode_alias) resolve each slot with THREE gathers
# from 128-wide bucket tables — bucket = slot >> (tl-7) always fits one
# hardware-gather row — instead of the packed kernel's 2^tl/128-round
# sweep + alphabet sweep.  ESC symbols (escape-folded rare values)
# substitute from an uncoded side stream consumed with the same
# MXU-prefix-sum + window machinery as the renorm words.  The kernel has
# NO tableLog/alphabet statics at all, so every alias strip of a
# geometry shares one compiled program.
# ---------------------------------------------------------------------------


def _kernel_alias(init_ref, w0_ref, w1_ref, w2_ref, words_ref, mask_ref,
                  shift_ref, escv_ref, esides_ref, ws_ref, out_ref, *,
                  steps, n_strips, vdd_ws=0, fused=True, esc=True):
    S = n_strips
    ri = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
    M = (ri < ci).astype(jnp.bfloat16)
    Mi = (ri <= ci).astype(jnp.float32)
    # Pad-step escape reads clamp to the side array's tail (valid strips
    # never reach it: their total escapes stay 256+ entries below).
    emax = esides_ref.shape[1] * 128 - 256

    def step(carry, col=0):
        x, cur, ecur, rowc, rcnt = carry
        slot = x & mask_ref[:]
        bucket = jax.lax.shift_right_logical(slot, shift_ref[:] - jnp.uint32(7))
        o = slot & (mask_ref[:] >> jnp.uint32(7))
        bi = bucket.astype(jnp.int32)
        g0 = jnp.take_along_axis(w0_ref[:], bi, axis=1)
        g1 = jnp.take_along_axis(w1_ref[:], bi, axis=1)
        g2 = jnp.take_along_axis(w2_ref[:], bi, axis=1)
        t = g1 >> jnp.uint32(24)
        is_p = o < t
        fm1 = jnp.where(is_p, (g1 >> jnp.uint32(12)), (g2 >> jnp.uint32(12))) & jnp.uint32(0xFFF)
        sb = jnp.where(is_p, g1, g2) & jnp.uint32(0xFFF)
        j = sb + o - jnp.where(is_p, jnp.uint32(0), t)
        sym = jnp.where(is_p, g0 >> jnp.uint32(16), g0 & jnp.uint32(0xFFFF))
        xn = (fm1 + jnp.uint32(1)) * jax.lax.shift_right_logical(x, shift_ref[:]) + j

        # Escape substitution: rank escaping lanes with an MXU exclusive
        # prefix sum, pull their true values from the side-stream window.
        # Compiled out (esc=False) for escape-free groups — the common
        # case for the direct modes, saving one of the two per-step
        # matmuls and the side-window slicing.
        if esc:
            is_esc = sym == escv_ref[:]
            ne = is_esc.astype(jnp.int32)
            ke = jax.lax.dot_general(
                ne.astype(jnp.bfloat16), M, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(jnp.int32)
            etot = ke[:, 127:128] + ne[:, 127:128]
            ecl = jnp.minimum(ecur, emax)
            ewin = jnp.concatenate(
                [esides_ref[s, pl.ds(ecl[s, 0] >> 7, 2), :].reshape(1, 256)
                 for s in range(S)], axis=0
            )
            eidx = (ecl & 127) + ke
            ei0 = eidx & 127
            ev = jnp.where(
                eidx < 128,
                jnp.take_along_axis(ewin[:, :128], ei0, axis=1),
                jnp.take_along_axis(ewin[:, 128:], ei0, axis=1),
            )
            sym = jnp.where(is_esc, ev, sym)
        else:
            etot = jnp.zeros_like(ecur)

        # Renorm (same machinery as _kernel_zzd).
        need = xn < jnp.uint32(1 << 16)
        nee = need.astype(jnp.int32)
        kf = jax.lax.dot_general(
            nee.astype(jnp.bfloat16), M, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        k = kf.astype(jnp.int32)
        total = k[:, 127:128] + nee[:, 127:128]
        win = jnp.concatenate(
            [words_ref[s, pl.ds(cur[s, 0] >> 7, 2), :].reshape(1, 256)
             for s in range(S)], axis=0
        )
        idx = (cur & 127) + k
        idx0 = idx & 127
        wv = jnp.where(
            idx < 128,
            jnp.take_along_axis(win[:, :128], idx0, axis=1),
            jnp.take_along_axis(win[:, 128:], idx0, axis=1),
        )
        xn = jnp.where(need, (xn << jnp.uint32(16)) | wv, xn)

        carry_tail = (cur + total, ecur + etot)
        if not fused:
            return (xn, *carry_tail, rowc, rcnt), sym.astype(out_ref.dtype)
        si = sym.astype(jnp.int32)
        dz = (si >> 1) ^ (-(si & 1))
        if vdd_ws:
            # vdd: previous-row carry (see _kernel_zzd).
            c0 = col * 128
            pix = (rowc[:, c0 : c0 + 128] + dz) & 0xFFFF
            parts = [p for p in (rowc[:, :c0], pix, rowc[:, c0 + 128 :])
                     if p.shape[1]]
            rowc = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=1)
            return (xn, *carry_tail, rowc, rcnt), pix.astype(out_ref.dtype)
        ps = jax.lax.dot_general(
            dz.astype(jnp.float32), Mi, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        ).astype(jnp.int32)
        rowc = jnp.where(rcnt == 0, jnp.zeros_like(rowc), rowc)
        pix = (rowc + ps) & 0xFFFF
        rowc = pix[:, 127:128]
        rcnt = rcnt + 1
        rcnt = jnp.where(rcnt >= ws_ref[:, :1].astype(jnp.int32), jnp.zeros_like(rcnt), rcnt)
        return (xn, *carry_tail, rowc, rcnt), pix.astype(out_ref.dtype)

    UNROLL = 16 if steps % 16 == 0 else 8

    def body(tb, carry):
        outs = []
        for jj in range(UNROLL):
            carry, pix = step(carry, col=(jj % vdd_ws) if vdd_ws else 0)
            outs.append(pix.reshape(S, 1, 128))
        out_ref[:, pl.ds(tb * UNROLL, UNROLL), :] = jnp.concatenate(outs, axis=1)
        return carry

    zero = jnp.zeros((S, 1), jnp.int32)
    rowc0 = jnp.zeros((S, vdd_ws * 128 if vdd_ws else 1), jnp.int32)
    jax.lax.fori_loop(0, steps // UNROLL, body,
                      (init_ref[:], zero, zero, rowc0, zero))


@partial(jax.jit, static_argnames=("steps", "n_strips", "vdd_ws", "fused", "esc"))
def rans_decode_pallas_alias(init, w0, w1, w2, words, mask, shift, escv,
                             esides, ws, *, steps, n_strips, vdd_ws=0,
                             fused=True, esc=True):
    """Fused alias-bucket decode (FF 41 streams): 3-gather slot lookup +
    escape substitution + the zzd/vdd predictor inverse of
    rans_decode_pallas_zzd.  With fused=False returns raw SYMBOLS
    (uint16[S, steps, 128]) for the non-direct post paths.

    w0/w1/w2: uint32[S,128] bucket tables (sym_p<<16|sym_a;
    t<<24|(f_p-1)<<12|sb_p; (f_a-1)<<12|sb_a).  escv: uint32[S,128] ESC
    compare value (0xFFFFFFFF when the strip has no escapes).  esides:
    uint32[S, E/128, 128] side-stream values.  ws: width/128 per strip
    (fused zzd row reset).  No tableLog/alphabet statics — every alias
    strip of a geometry shares one compiled program.
    """
    S = init.shape[0]
    if S % GROUP() != 0:
        pad = GROUP() - S % GROUP()
        init, w0, w1, w2, words, mask, shift, escv, esides, ws = (
            jnp.concatenate([a, jnp.broadcast_to(a[:1], (pad,) + a.shape[1:])])
            for a in (init, w0, w1, w2, words, mask, shift, escv, esides, ws)
        )
        full = rans_decode_pallas_alias(
            init, w0, w1, w2, words, mask, shift, escv, esides, ws,
            steps=steps, n_strips=S + pad, vdd_ws=vdd_ws, fused=fused,
            esc=esc,
        )
        return full[:S]
    grid = S // GROUP()
    return pl.pallas_call(
        partial(_kernel_alias, steps=steps, n_strips=GROUP(), vdd_ws=vdd_ws,
                fused=fused, esc=esc),
        out_shape=jax.ShapeDtypeStruct((S, steps, 128), jnp.uint16),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((GROUP(), 128), lambda i: (i, 0)),
            pl.BlockSpec((GROUP(), 128), lambda i: (i, 0)),
            pl.BlockSpec((GROUP(), 128), lambda i: (i, 0)),
            pl.BlockSpec((GROUP(), 128), lambda i: (i, 0)),
            pl.BlockSpec((GROUP(), words.shape[1], 128), lambda i: (i, 0, 0)),
            pl.BlockSpec((GROUP(), 128), lambda i: (i, 0)),
            pl.BlockSpec((GROUP(), 128), lambda i: (i, 0)),
            pl.BlockSpec((GROUP(), 128), lambda i: (i, 0)),
            pl.BlockSpec((GROUP(), esides.shape[1], 128), lambda i: (i, 0, 0)),
            pl.BlockSpec((GROUP(), 128), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((GROUP(), steps, 128), lambda i: (i, 0, 0)),
        interpret=not supports_pallas_rans(),
    )(init, w0, w1, w2, words, mask, shift, escv, esides, ws)


def build_alias_bucket_tables(parsed, min_steps: int = 0):
    """Bucket-table build for alias-mapped strips (mict_parse outputs
    whose ``alias`` element is a (esc_val, esc_values) tuple).  Returns
    (init, w0, w1, w2, words, mask, shift, escv, esides, counts, steps).
    ``min_steps`` pads the scan length like build_packed_tables."""
    from .device_rans import alias_construct

    S = len(parsed)
    init = np.zeros((S, 128), np.uint32)
    w0 = np.zeros((S, 128), np.uint32)
    w1 = np.zeros((S, 128), np.uint32)
    w2 = np.zeros((S, 128), np.uint32)
    steps = max(min_steps, max((p[2] + 127) // 128 for p in parsed))
    steps = (steps + 7) // 8 * 8
    # Renorm margin: see build_pallas_tables.
    margin = max(steps * 128 - p[2] for p in parsed) + 256
    wmax = ((max(len(p[4]) for p in parsed) + margin + 127) // 128) * 128
    words = np.zeros((S, wmax), np.uint32)
    mask = np.zeros((S, 128), np.uint32)
    shift = np.zeros((S, 128), np.uint32)
    escv = np.full((S, 128), 0xFFFFFFFF, np.uint32)
    # Side-stream margin: pad-step escape reads clamp in-kernel, so the
    # allocation only needs the clamp headroom (384 >= 256 + window).
    emax = ((max(len(p[7][1]) for p in parsed) + 384 + 127) // 128) * 128
    esides = np.zeros((S, emax), np.uint32)
    counts = []
    for i, p in enumerate(parsed):
        L, tl, count, states, wrds, norm, _sl, alias = p
        if L != 128:
            raise ValueError("alias kernel requires 128 lanes per strip")
        if tl > 12:
            # (freq-1)/sbp/sba overflow their 12-bit w1/w2 fields beyond
            # tl=12 — the encoder never emits such streams (hard cap in
            # mict_encode_alias); foreign blobs must take the scan path.
            raise ValueError("alias kernel requires tableLog <= 12")
        if alias is None:
            raise ValueError("build_alias_bucket_tables: standard-magic strip")
        al = alias_construct(norm, tl)
        w0[i] = (al["p"] << 16) | al["a"]
        w1[i] = (al["t"] << 24) | ((al["fp"] - 1) << 12) | al["sbp"]
        w2[i] = ((al["fa"] - 1) << 12) | al["sba"]
        init[i] = states
        words[i, : len(wrds)] = wrds
        mask[i, :] = (1 << tl) - 1
        shift[i, :] = tl
        esc_val, esc_values = alias
        if len(esc_values):
            escv[i, :] = esc_val
            esides[i, : len(esc_values)] = esc_values
        counts.append(count)
    words = words.reshape(S, -1, 128)
    esides = esides.reshape(S, -1, 128)
    return init, w0, w1, w2, words, mask, shift, escv, esides, counts, steps

# ---------------------------------------------------------------------------
# Fused r-mode decode: entropy + SoA-RLE expand + direct-predictor inverse
# in ONE kernel.  The r-modes (zzr/vdr/pdr — RLE'd direct symbols,
# parallelstrips-style SoA layout [counts][same-values][literals]) won
# +5.4% corpus ratio but their XLA expand post program was the round-3
# speed killer (dense form measured 0.03 GB/s; the searchsorted form
# still streams 65K-wide gathers through XLA).  This kernel exploits the
# expansion's MONOTONE-CONSUMPTION structure instead:
#
# * output rows (128 px) consume runs, literal symbols and same-values
#   in stream order, each advancing at most 128 positions per row — so
#   every lookup is a short dynamic VMEM window (the same row-pair
#   slice + take_along_axis trick the entropy loop uses for its renorm
#   word stream), never a wide gather;
# * run assignment per row = count of run-starts <= position over a
#   3-row (384-entry) window — one [128, 384] VPU compare+reduce, no
#   search (the window base advances with a scalar carry);
# * the per-run tables (packed out_start<<1|is_same, and value-or-
#   literal-offset) are built in a prologue from the decoded counts
#   section with MXU prefix-sum matmuls (f32 HIGHEST — exact to 2^24,
#   run lengths sum below 2^18).
#
# The predictor tail (unzigzag + row prefix matmul / vdd row carry) is
# the same machinery as _kernel_zzd, so zzr/vdr/pdr strips emit PIXELS
# (pdr's second, column prefix sum runs outside the kernel like pdd's).
# Reference for the SoA grammar: ops/rle.py soa_encode
# (parallelstrips.go's RLE stream re-laid-out for device decode).
# ---------------------------------------------------------------------------


def RLE_GROUP(steps: int = 0, out_rows: int = 0, maxr: int = 512,
              n_strips: int = 32) -> int:
    """Strips per grid program for the r-mode kernel.  Bigger groups
    fill more VREG sublanes per vector op (hardware sweep on CT1
    auto-r+best: G=8 2.6 GB/s, G=16 4.0, G=32 5.3), so pick the largest
    power of two <= 32 whose scratch (syms [G, steps, 128] i32 + out
    [G, out_rows, 128] u16 + 2 run tables [G, maxr/128, 128] i32) fits a
    ~10 MB VMEM budget.  MIC_RLE_GROUP overrides for sweeps."""
    env = os.environ.get("MIC_RLE_GROUP")
    if env:
        return int(env)
    per_strip = (steps * 128 * 4 + out_rows * 128 * 2
                 + 2 * (maxr // 128) * 128 * 4)
    cap = 1
    while cap < min(n_strips, 32):
        cap *= 2
    g = cap
    while g > 8 and g * per_strip > 10 * 2**20:
        g //= 2
    return min(g, cap)


def _sweep_take(win, idx, chunks: int):
    """Gather win[s, idx[s, j]] where win is [S, chunks*128] and idx in
    [0, chunks*128): masked take_along_axis over 128-wide tiles (the
    hardware-gather granularity)."""
    hi = idx >> 7
    lo = idx & 127
    out = jnp.zeros(idx.shape, win.dtype)
    for h in range(chunks):
        m = hi == h
        out = jnp.where(m, jnp.take_along_axis(win[:, h * 128:(h + 1) * 128], lo, axis=1), out)
    return out


def _expand_rle_phase(syms_ref, st1_ref, st2_ref, nrun_ref, nsame_ref,
                      ws_ref, out_ref, *, steps, out_rows, n_strips,
                      maxr, mid_count, vdd_ws, dense=False):
    """Phases 1.5+2 of the fused r-mode decode (see section comment).

    Reads the decoded SoA symbol stream from ``syms_ref`` ([S, steps,
    128] u16, stream order = step-major), builds per-run tables in the
    ``st1/st2`` scratch, then emits PIXELS row by row into ``out_ref``.
    ``mid_count`` is the format constant (MID_DIRECT for r-modes):
    counts <= mid are same-runs of that length, counts > mid literal
    runs of count - mid symbols.

    ``dense=True`` selects the FLAG_RDENSE fast path: the encoder
    guaranteed same-runs are >= RDENSE_MIN_SAME px (strips.py), so any
    128-px output row spans <= 20 runs and the per-row run search
    shrinks from a [128, 384] window compare to a 32-candidate
    gather+compare ([S, 32, 128] elementwise, ~12x fewer lane-ops).
    A hostile blob that lies about the flag decodes to garbage (clipped
    gathers, static loops) but cannot fault or hang — same integrity
    contract as the rest of the codec (no CRC)."""
    S = n_strips
    R = maxr // 128
    HUGE = jnp.int32(1 << 30)
    ri = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
    Mx = (ri < ci).astype(jnp.float32)  # strict upper: exclusive prefix
    Mi = (ri <= ci).astype(jnp.float32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (S, 128), 1)
    nrun = nrun_ref[:, :1].astype(jnp.int32)
    nsame = nsame_ref[:, :1].astype(jnp.int32)

    def exc(v):
        # Exclusive 128-lane prefix sum on the MXU (exact: row sums of
        # run lengths stay < 2^23).
        return jax.lax.dot_general(
            v.astype(jnp.float32), Mx, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        ).astype(jnp.int32)

    # ---- Phase 1.5: per-run tables from the counts section (the first
    # n_runs symbols).  R rows, statically unrolled (R <= 16).
    len_c = jnp.zeros((S, 1), jnp.int32)
    same_c = jnp.zeros((S, 1), jnp.int32)
    lit_c = jnp.zeros((S, 1), jnp.int32)
    for rr in range(R):
        c32 = syms_ref[:, min(rr, steps - 1), :].astype(jnp.int32)
        ridx = lane + rr * 128
        valid = ridx < nrun
        is_s = valid & (c32 <= mid_count)
        si = is_s.astype(jnp.int32)
        ln = jnp.where(valid, jnp.where(is_s, c32, c32 - mid_count), 0)
        start = len_c + exc(ln)
        rank = same_c + exc(si)
        litl = jnp.where(is_s, jnp.zeros_like(ln), ln)
        lstart = lit_c + exc(litl)
        # Same-run values: syms[nrun + rank] via a 256-entry window at
        # the row's first value index (ranks advance <= 128 per row).
        vbase = nrun + same_c
        wrow = jnp.clip(vbase >> 7, 0, steps - 2)
        win = jnp.concatenate(
            [syms_ref[s, pl.ds(wrow[s, 0], 2), :].reshape(1, 256)
             for s in range(S)], axis=0)
        loc = jnp.clip(nrun + rank - (wrow << 7), 0, 255)
        val = _sweep_take(win, loc, 2).astype(jnp.int32)
        src0 = nrun + nsame + lstart - start
        st1_ref[:, rr, :] = jnp.where(valid, (start << 1) | si, HUGE)
        st2_ref[:, rr, :] = jnp.where(is_s, val, src0)
        len_c = start[:, 127:] + ln[:, 127:]
        same_c = rank[:, 127:] + si[:, 127:]
        lit_c = lstart[:, 127:] + litl[:, 127:]

    # ---- Phase 2: expansion + predictor inverse, one 128-px output row
    # per step.  Carries: rb = run index containing the row start, lc =
    # next literal symbol index, rowc/rcnt = the zzd/vdd row machinery.
    U2 = 8

    def step2(carry, t, col, blk=None):
        rb, lc, rowc, rcnt = carry
        pos = lane + t * 128
        nxt_pos = (t + 1) * 128
        if dense:
            # FLAG_RDENSE fast path: gather the 32 candidate runs at rb
            # from the per-U2-block window (fetched once in body2 — the
            # density bound caps a row at <=20 runs, so 7 rows drift
            # <=140 and the 384-entry block window covers every row's
            # candidates: lo0 <= 127, +140 drift, +31 candidates < 384).
            br3, w1, w2 = blk
            idx = jnp.clip((rb - (br3 << 7)) + lane, 0, 383)
            c1 = _sweep_take(w1, idx, 3)
            c2 = _sweep_take(w2, idx, 3)
            starts_c = (c1 >> 1)[:, :32]  # HUGE entries stay huge
            cnt = jnp.sum(
                (starts_c[:, :, None] <= pos[:, None, :]).astype(jnp.int32),
                axis=1)  # [S, 128], >= 1 (candidate 0 starts <= row base)
            nxt = jnp.sum((starts_c <= nxt_pos).astype(jnp.int32), axis=1,
                          keepdims=True)
            rl = jnp.clip(cnt - 1, 0, 127)
            g1 = jnp.take_along_axis(c1, rl, axis=1)
            g2 = jnp.take_along_axis(c2, rl, axis=1)
            rb = jnp.clip(rb + nxt - 1, 0, maxr - 1)
        else:
            br = jnp.clip(rb >> 7, 0, max(R - 3, 0))  # window base row
            # 3-row windows assemble as a 2-row slice (the pow2 relayout
            # _kernel_zzd proves compiles) + a 1-row slice: the single
            # (3,128)->(1,384) reshape is a non-pow2 sublane->lane relayout
            # and was the one construct unique to this kernel when every
            # r-strip image 500'd Mosaic's remote compile (r5 rbest capture).
            w1 = jnp.concatenate(
                [jnp.concatenate(
                    [st1_ref[s, pl.ds(br[s, 0], 2), :].reshape(1, 256),
                     st1_ref[s, pl.ds(br[s, 0] + 2, 1), :].reshape(1, 128)],
                    axis=1)
                 for s in range(S)], axis=0)
            w2 = jnp.concatenate(
                [jnp.concatenate(
                    [st2_ref[s, pl.ds(br[s, 0], 2), :].reshape(1, 256),
                     st2_ref[s, pl.ds(br[s, 0] + 2, 1), :].reshape(1, 128)],
                    axis=1)
                 for s in range(S)], axis=0)
            # Run assignment: count window starts <= position.  Entries
            # before rb in the window are earlier runs (start <= row base),
            # so the raw in-window count IS the global count offset by
            # br*128; rb never drifts past base+129 per row, well inside
            # the 384-entry window.
            cnts, nxts = [], []
            for s in range(S):
                starts_s = w1[s:s + 1] >> 1  # [1, 384]
                cmp = (starts_s <= pos[s].reshape(128, 1)).astype(jnp.int32)
                cnts.append(jnp.sum(cmp, axis=1).reshape(1, 128))
                nxts.append(jnp.sum((starts_s <= nxt_pos).astype(jnp.int32)).reshape(1, 1))
            cnt = jnp.concatenate(cnts, axis=0)
            nxt = jnp.concatenate(nxts, axis=0)
            rl = jnp.clip(cnt - 1, 0, 383)
            g1 = _sweep_take(w1, rl, 3)
            g2 = _sweep_take(w2, rl, 3)
            rb = jnp.clip(br * 128 + nxt - 1, 0, maxr - 1)
        is_s = (g1 & 1) == 1
        # Literal pull: src advances monotonically by <= 128 per row, so
        # a 256 window at the literal cursor covers the whole row.
        src = g2 + pos
        lrow = jnp.clip(lc >> 7, 0, steps - 2)
        wl = jnp.concatenate(
            [syms_ref[s, pl.ds(lrow[s, 0], 2), :].reshape(1, 256)
             for s in range(S)], axis=0)
        li = jnp.clip(src - (lrow << 7), 0, 255)
        lv = _sweep_take(wl, li, 2).astype(jnp.int32)
        tok = jnp.where(is_s, g2, lv)
        nlit = jnp.sum(1 - is_s.astype(jnp.int32), axis=1).reshape(S, 1)
        lc = jnp.clip(lc + nlit, 0, steps * 128 - 1)
        # Predictor tail (same as _kernel_zzd): unzigzag, then the row
        # prefix matmul (zzr/pdr) or the previous-row carry (vdr).
        dz = (tok >> 1) ^ (-(tok & 1))
        if vdd_ws:
            c0 = col * 128
            pix = (rowc[:, c0:c0 + 128] + dz) & 0xFFFF
            parts = [p for p in (rowc[:, :c0], pix, rowc[:, c0 + 128:])
                     if p.shape[1]]
            rowc = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=1)
            return (rb, lc, rowc, rcnt), pix
        ps = jax.lax.dot_general(
            dz.astype(jnp.float32), Mi, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        ).astype(jnp.int32)
        rowc = jnp.where(rcnt == 0, jnp.zeros_like(rowc), rowc)
        pix = (rowc + ps) & 0xFFFF
        rowc = pix[:, 127:128]
        rcnt = rcnt + 1
        rcnt = jnp.where(rcnt >= ws_ref[:, :1].astype(jnp.int32),
                         jnp.zeros_like(rcnt), rcnt)
        return (rb, lc, rowc, rcnt), pix

    def body2(tb, carry):
        blk = None
        if dense:
            # One 3-row (384-entry) run-table window per U2-block: the
            # block's rows re-gather their 32 candidates from it instead
            # of re-slicing st1/st2 every row (6 dynamic slices per
            # strip-row -> ~0.75).
            rb0 = carry[0]
            br3 = jnp.clip(rb0 >> 7, 0, max(R - 3, 0))
            w1b = jnp.concatenate(
                [jnp.concatenate(
                    [st1_ref[s, pl.ds(br3[s, 0], 2), :].reshape(1, 256),
                     st1_ref[s, pl.ds(br3[s, 0] + 2, 1), :].reshape(1, 128)],
                    axis=1)
                 for s in range(S)], axis=0)
            w2b = jnp.concatenate(
                [jnp.concatenate(
                    [st2_ref[s, pl.ds(br3[s, 0], 2), :].reshape(1, 256),
                     st2_ref[s, pl.ds(br3[s, 0] + 2, 1), :].reshape(1, 128)],
                    axis=1)
                 for s in range(S)], axis=0)
            blk = (br3, w1b, w2b)
        outs = []
        for j in range(U2):
            carry, pix = step2(carry, tb * U2 + j,
                               (j % vdd_ws) if vdd_ws else 0, blk)
            outs.append(pix.astype(jnp.uint16).reshape(S, 1, 128))
        out_ref[:, pl.ds(tb * U2, U2), :] = jnp.concatenate(outs, axis=1)
        return carry

    zero = jnp.zeros((S, 1), jnp.int32)
    rowc0 = jnp.zeros((S, vdd_ws * 128 if vdd_ws else 1), jnp.int32)
    jax.lax.fori_loop(0, out_rows // U2, body2,
                      (zero, nrun + nsame, rowc0, zero))


def _phase1_only(syms_ref, out_ref, *, steps, out_rows, n_strips):
    """Profiling stub (MIC_RLE_PHASE1_ONLY=1): emit the raw decoded syms
    instead of expanding, so the entropy phase's share of the fused
    r-kernel can be timed in isolation.  Output is NOT pixels."""
    k = min(steps, out_rows)
    out_ref[:, :k, :] = syms_ref[:, :k, :].astype(jnp.uint16)
    if out_rows > k:
        out_ref[:, k:, :] = jnp.zeros((n_strips, out_rows - k, 128), jnp.uint16)


def _kernel_rle(init_ref, tpk_ref, alpha_ref, words_ref, mask_ref, shift_ref,
                ws_ref, nrun_ref, nsame_ref, out_ref, syms_ref, st1_ref,
                st2_ref, *, steps, out_rows, n_strips, table_log, asweep,
                maxr, mid_count, vdd_ws, dense=False):
    _kernel_packed(init_ref, tpk_ref, alpha_ref, words_ref, mask_ref,
                   shift_ref, syms_ref, steps=steps, n_strips=n_strips,
                   table_log=table_log, asweep=asweep)
    if os.environ.get("MIC_RLE_PHASE1_ONLY") == "1":
        _phase1_only(syms_ref, out_ref, steps=steps, out_rows=out_rows,
                     n_strips=n_strips)
        return
    _expand_rle_phase(syms_ref, st1_ref, st2_ref, nrun_ref, nsame_ref,
                      ws_ref, out_ref, steps=steps, out_rows=out_rows,
                      n_strips=n_strips, maxr=maxr, mid_count=mid_count,
                      vdd_ws=vdd_ws, dense=dense)


def _kernel_rle_alias(init_ref, w0_ref, w1_ref, w2_ref, words_ref, mask_ref,
                      shift_ref, escv_ref, esides_ref, ws_ref, nrun_ref,
                      nsame_ref, out_ref, syms_ref, st1_ref, st2_ref, *,
                      steps, out_rows, n_strips, maxr, mid_count, esc,
                      vdd_ws, dense=False):
    _kernel_alias(init_ref, w0_ref, w1_ref, w2_ref, words_ref, mask_ref,
                  shift_ref, escv_ref, esides_ref, ws_ref, syms_ref,
                  steps=steps, n_strips=n_strips, vdd_ws=0, fused=False,
                  esc=esc)
    if os.environ.get("MIC_RLE_PHASE1_ONLY") == "1":
        _phase1_only(syms_ref, out_ref, steps=steps, out_rows=out_rows,
                     n_strips=n_strips)
        return
    _expand_rle_phase(syms_ref, st1_ref, st2_ref, nrun_ref, nsame_ref,
                      ws_ref, out_ref, steps=steps, out_rows=out_rows,
                      n_strips=n_strips, maxr=maxr, mid_count=mid_count,
                      vdd_ws=vdd_ws, dense=dense)


def _rle_scratch(G, steps, maxr):
    # syms is int32, NOT uint16: phase 2's dynamic-offset window gathers
    # (run tables, literal pulls) are illegal on 16-bit packed-sublane
    # refs under Mosaic — every r-strip compile 500'd until the scratch
    # went 32-bit (r5 bisect, /tmp/kbisect stages 1 vs 6).
    return [
        pltpu.VMEM((G, steps, 128), jnp.int32),
        pltpu.VMEM((G, maxr // 128, 128), jnp.int32),
        pltpu.VMEM((G, maxr // 128, 128), jnp.int32),
    ]


@partial(jax.jit, static_argnames=("steps", "out_rows", "n_strips",
                                   "table_log", "asweep", "maxr",
                                   "mid_count", "vdd_ws", "dense"))
def rans_decode_pallas_rle(init, tpk, alpha, words, mask, shift, ws, nrun,
                           nsame, *, steps, out_rows, n_strips, table_log,
                           asweep, maxr, mid_count, vdd_ws=0, dense=False):
    """Fused r-mode decode over packed tables (FF 57 streams): rANS +
    SoA-RLE expand + direct-predictor inverse in one kernel.  Returns
    uint16[S, out_rows, 128] PIXELS (pdr callers apply the column
    prefix sum outside, like pdd).  nrun/nsame: int32[S, 128] per-strip
    run/same counts (lane-broadcast).  maxr: run-table capacity
    (multiple of 128, >= 384, >= every strip's n_runs)."""
    assert maxr % 128 == 0 and maxr >= 384
    assert out_rows % 8 == 0 and steps % 8 == 0 and steps >= 2
    assert maxr // 128 <= steps
    S = init.shape[0]
    G = RLE_GROUP(steps, out_rows, maxr, S)
    if S % G != 0:
        pad = G - S % G
        init, tpk, alpha, words, mask, shift, ws, nrun, nsame = (
            jnp.concatenate([a, jnp.broadcast_to(a[:1], (pad,) + a.shape[1:])])
            for a in (init, tpk, alpha, words, mask, shift, ws, nrun, nsame)
        )
        full = rans_decode_pallas_rle(
            init, tpk, alpha, words, mask, shift, ws, nrun, nsame,
            steps=steps, out_rows=out_rows, n_strips=S + pad,
            table_log=table_log, asweep=asweep, maxr=maxr,
            mid_count=mid_count, vdd_ws=vdd_ws, dense=dense,
        )
        return full[:S]
    grid = S // G
    TS = 1 << table_log
    return pl.pallas_call(
        partial(_kernel_rle, steps=steps, out_rows=out_rows, n_strips=G,
                table_log=table_log, asweep=asweep, maxr=maxr,
                mid_count=mid_count, vdd_ws=vdd_ws, dense=dense),
        out_shape=jax.ShapeDtypeStruct((S, out_rows, 128), jnp.uint16),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((G, 128), lambda i: (i, 0)),
            pl.BlockSpec((G, TS), lambda i: (i, 0)),
            pl.BlockSpec((G, alpha.shape[1]), lambda i: (i, 0)),
            pl.BlockSpec((G, words.shape[1], 128), lambda i: (i, 0, 0)),
            pl.BlockSpec((G, 128), lambda i: (i, 0)),
            pl.BlockSpec((G, 128), lambda i: (i, 0)),
            pl.BlockSpec((G, 128), lambda i: (i, 0)),
            pl.BlockSpec((G, 128), lambda i: (i, 0)),
            pl.BlockSpec((G, 128), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((G, out_rows, 128), lambda i: (i, 0, 0)),
        scratch_shapes=_rle_scratch(G, steps, maxr),
        interpret=not supports_pallas_rans(),
    )(init, tpk, alpha, words, mask, shift, ws, nrun, nsame)


@partial(jax.jit, static_argnames=("steps", "out_rows", "n_strips", "maxr",
                                   "mid_count", "esc", "vdd_ws", "dense"))
def rans_decode_pallas_rle_alias(init, w0, w1, w2, words, mask, shift, escv,
                                 esides, ws, nrun, nsame, *, steps, out_rows,
                                 n_strips, maxr, mid_count, esc, vdd_ws=0,
                                 dense=False):
    """Alias-bucket (FF 41) variant of rans_decode_pallas_rle — same
    fused expand + predictor tail behind the 3-gather entropy front end,
    so alias r-mode strips keep the family-collapse property (no
    tableLog/alphabet statics)."""
    assert maxr % 128 == 0 and maxr >= 384
    assert out_rows % 8 == 0 and steps % 8 == 0 and steps >= 2
    assert maxr // 128 <= steps
    S = init.shape[0]
    G = RLE_GROUP(steps, out_rows, maxr, S)
    if S % G != 0:
        pad = G - S % G
        init, w0, w1, w2, words, mask, shift, escv, esides, ws, nrun, nsame = (
            jnp.concatenate([a, jnp.broadcast_to(a[:1], (pad,) + a.shape[1:])])
            for a in (init, w0, w1, w2, words, mask, shift, escv, esides, ws,
                      nrun, nsame)
        )
        full = rans_decode_pallas_rle_alias(
            init, w0, w1, w2, words, mask, shift, escv, esides, ws, nrun,
            nsame, steps=steps, out_rows=out_rows, n_strips=S + pad,
            maxr=maxr, mid_count=mid_count, esc=esc, vdd_ws=vdd_ws,
            dense=dense,
        )
        return full[:S]
    grid = S // G
    return pl.pallas_call(
        partial(_kernel_rle_alias, steps=steps, out_rows=out_rows,
                n_strips=G, maxr=maxr, mid_count=mid_count, esc=esc,
                vdd_ws=vdd_ws, dense=dense),
        out_shape=jax.ShapeDtypeStruct((S, out_rows, 128), jnp.uint16),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((G, 128), lambda i: (i, 0)),
            pl.BlockSpec((G, 128), lambda i: (i, 0)),
            pl.BlockSpec((G, 128), lambda i: (i, 0)),
            pl.BlockSpec((G, 128), lambda i: (i, 0)),
            pl.BlockSpec((G, words.shape[1], 128), lambda i: (i, 0, 0)),
            pl.BlockSpec((G, 128), lambda i: (i, 0)),
            pl.BlockSpec((G, 128), lambda i: (i, 0)),
            pl.BlockSpec((G, 128), lambda i: (i, 0)),
            pl.BlockSpec((G, esides.shape[1], 128), lambda i: (i, 0, 0)),
            pl.BlockSpec((G, 128), lambda i: (i, 0)),
            pl.BlockSpec((G, 128), lambda i: (i, 0)),
            pl.BlockSpec((G, 128), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((G, out_rows, 128), lambda i: (i, 0, 0)),
        scratch_shapes=_rle_scratch(G, steps, maxr),
        interpret=not supports_pallas_rans(),
    )(init, w0, w1, w2, words, mask, shift, escv, esides, ws, nrun, nsame)
