"""Pallas TPU kernel for the reference's bit-granular interleaved tANS.

The byte-compatible MIC entropy formats (1/2/4/8-state FSE, magic FF
02/04/84 — fse2state.go:22, fse4state.go:195, fse8state.go:230) are
reverse-direction bit streams: N interleaved tANS states, each decode
step reading a data-dependent number of bits (state -> dtable[state] ->
state' + getBits(nbBits)).  Round 2 could decode these only on the host
(native C++ tier, ~470 MB/s single-core); this kernel decodes them
bit-exactly ON DEVICE, so an archive of existing .mic blobs serves at
TPU speed without a host-rate transcode pass (VERDICT.md round-2 item
#1/#5).

TPU mapping (the interesting part — a bit cursor is inherently serial):

* **Streams ride the sublane axis** (R streams per block, like strips in
  pallas_rans), each stream's N states in lanes 0..N-1.  Every step
  decodes N symbols per stream = R*N symbols per block-step.
* **One bit cursor per stream.**  Within a step, lane j's read starts at
  ``pos - cumsum(nb)[j]`` — an inclusive lane prefix-sum evaluated as one
  bf16 MXU matmul (exact: sums <= 128*16 < 2^11 < bf16 integer range...
  values <= 8*16 = 128 here).
* **Windowed bit fetch.**  The stream's u32 words stay in VMEM; a
  256-word aligned window (two 128-word blocks) is refreshed once per
  SPR-step output row via per-stream dynamic slices.  SPR*N = 128 always,
  so a row consumes <= 128*tableLog <= 1664 bits = 52 words — the window
  never underruns.  Within a step the two words covering each lane's
  [start, start+nb) bits come from two ``take_along_axis`` gathers.
* **Packed dtable**: slot -> rank<<19 | newStateBase<<5 | nbBits (one
  u32 gather per 128-slot tile; tableLog <= 13 so base fits 14 bits,
  alphabet <= 4096 so rank fits 12); rank -> symbol rides the alphabet
  sweep exactly like pallas_rans' packed kernel.
* **Dense output packing**: each output row packs SPR steps x N lanes
  into 128 lanes via a dynamic lane-roll accumulate, so the symbol
  stream lands in order with zero HBM write amplification.

Throughput ceiling is ~N/128 of the wide-lane rANS kernel (the table
sweep serves 128 lanes of which N are live) — the price of the byte
format's 4-8-way ILP design on a 128-lane machine, and exactly why MICW
exists.  Honest macro-loop measurement (benchmarks/ingest_bench.py
--tans, real v5e): ~58 MB/s over 100 corpus strips — BELOW the native
host tier's ~470 MB/s/core.  This kernel is therefore a capability
(bit-exact device decode of reference blobs with no host in the loop,
e.g. a device-resident serving pipeline), not the fast path; ingest
defaults to the native tier and transcodes to MICW for device-rate
decode.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_rans import supports_pallas_rans

__all__ = [
    "tans_decode_pallas",
    "build_tans_batch",
    "fse_parse_header",
    "fse_decompress_device_batch",
    "TANS_MAX_TABLE_LOG",
    "TANS_MAX_ALPHABET",
]

TANS_MAX_TABLE_LOG = 13  # rank(12) + newStateBase(tl<=13 -> 14) + nb(5) = 31 bits
TANS_MAX_ALPHABET = 4096


def TGROUP() -> int:
    """Streams per grid program (sublane rows).  Interpret mode (CPU
    tests) pays per-row python cost, so keep CPU groups small."""
    return 32 if supports_pallas_rans() else 8


def _kernel_tans(init_ref, pos_ref, cnt_ref, tpk_ref, alpha_ref, words_ref,
                 out_ref, *, steps, n_streams, n_states, table_log, asweep):
    R = n_streams
    N = n_states
    SPR = 128 // N  # steps per output row; SPR*N = 128
    SWEEP = max(1, (1 << table_log) // 128)
    lane = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 1)
    lane_live = lane < N
    ri = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
    Mi = (ri <= ci).astype(jnp.bfloat16)  # inclusive lane prefix

    def refill(pos):
        # 256-word aligned window [b0*128, b0*128+256) covering every bit
        # access of the next SPR steps: accesses span <= 128*tl + 64 bits
        # below pos, <= 54 words, always inside two aligned blocks.
        low = jnp.maximum(pos - 128 * table_log - 64, 0) >> 5  # [R,1]
        b0 = low >> 7
        win0 = jnp.concatenate(
            [words_ref[s, pl.ds(b0[s, 0], 1), :] for s in range(R)], axis=0
        )
        win1 = jnp.concatenate(
            [words_ref[s, pl.ds(b0[s, 0] + 1, 1), :] for s in range(R)], axis=0
        )
        return win0, win1, b0

    def step(carry, t):
        # t: traced step index. Decodes symbol i = t*N + lane of each stream.
        x, pos, win0, win1, b0 = carry
        slot = x.astype(jnp.int32)
        hi = slot >> 7
        lo = slot & 127
        pk = jnp.zeros((R, 128), jnp.uint32)
        if SWEEP == 1:
            pk = jnp.take_along_axis(tpk_ref[:, pl.ds(0, 128)], lo, axis=1)
        else:
            for h in range(SWEEP):
                m = hi == h
                pk = jnp.where(
                    m, jnp.take_along_axis(tpk_ref[:, pl.ds(h * 128, 128)], lo, axis=1), pk
                )
        rank = (pk >> 19).astype(jnp.int32)
        ns = (pk >> 5) & jnp.uint32(0x3FFF)
        nb = (pk & jnp.uint32(0x1F)).astype(jnp.int32)
        av = jnp.zeros((R, 128), jnp.uint32)
        rhi = rank >> 7
        rlo = rank & 127
        for h in range(asweep):
            m = rhi == h
            av = jnp.where(
                m, jnp.take_along_axis(alpha_ref[:, pl.ds(h * 128, 128)], rlo, axis=1), av
            )
        sym = av & jnp.uint32(0xFFFF)

        active = lane_live & ((t * N + lane) < cnt_ref[:].astype(jnp.int32))
        nb = jnp.where(active, nb, 0)
        cum = jax.lax.dot_general(
            nb.astype(jnp.bfloat16), Mi, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(jnp.int32)  # inclusive prefix; values <= 128 exact in bf16
        start = pos - cum  # [R,128] bit position of each lane's read
        w = start >> 5
        off = (start & 31).astype(jnp.uint32)
        rel = jnp.clip(w - (b0 << 7), 0, 254)
        idx = rel & 127
        w0a = jnp.take_along_axis(win0, idx, axis=1)
        w1a = jnp.take_along_axis(win1, idx, axis=1)
        wA = jnp.where(rel < 128, w0a, w1a)
        idxp = (rel + 1) & 127
        w0b = jnp.take_along_axis(win0, idxp, axis=1)
        w1b = jnp.take_along_axis(win1, idxp, axis=1)
        wB = jnp.where(rel + 1 < 128, w0b, w1b)
        # (32 - off) & 31 keeps the shift in range when off == 0; that
        # lane's hi_part is masked off anyway.
        hi_part = jnp.where(
            off == 0, jnp.uint32(0),
            jax.lax.shift_left(wB, (jnp.uint32(32) - off) & jnp.uint32(31)),
        )
        val = (jax.lax.shift_right_logical(wA, off) | hi_part) & (
            (jnp.uint32(1) << nb.astype(jnp.uint32)) - jnp.uint32(1)
        )
        x_new = ns + val
        x = jnp.where(active, x_new, x)
        pos = pos - cum[:, 127:128]
        return (x, pos, win0, win1, b0), jnp.where(active, sym, 0)

    def block(tb, carry):
        rows = []
        for r8 in range(8):
            x, pos, _w0, _w1, _b0 = carry
            win0, win1, b0 = refill(pos)
            base = (tb * 8 + r8) * SPR

            def row_step(t, inner):
                carry_i, acc = inner
                carry_i, sym = step(carry_i, base + t)
                acc = acc | pltpu.roll(sym, t * N, axis=1)
                return carry_i, acc

            (carry), acc = jax.lax.fori_loop(
                0, SPR, row_step,
                ((x, pos, win0, win1, b0), jnp.zeros((R, 128), jnp.uint32)),
            )
            rows.append(acc.astype(jnp.uint16).reshape(R, 1, 128))
        out_ref[:, pl.ds(tb * 8, 8), :] = jnp.concatenate(rows, axis=1)
        return carry

    n_rows = steps // (128 // N)  # padded by the wrapper to a multiple of 8
    init_win = (jnp.zeros((R, 128), jnp.uint32), jnp.zeros((R, 128), jnp.uint32),
                jnp.zeros((R, 1), jnp.int32))
    jax.lax.fori_loop(
        0, n_rows // 8, block,
        (init_ref[:], pos_ref[:].astype(jnp.int32)[:, :1]) + init_win,
    )


@partial(jax.jit, static_argnames=("steps", "n_streams", "n_states", "table_log", "asweep"))
def tans_decode_pallas(init, pos, cnt, tpk, alpha, words, *, steps, n_streams,
                       n_states, table_log, asweep):
    """Decode R interleaved-tANS streams (N states each) in one kernel.

    init: uint32[R,128] initial states in lanes 0..N-1.  pos: int32[R,128]
    bit cursor after the init-state reads (all lanes carry the same
    value).  cnt: uint32[R,128] symbol counts.  tpk: uint32[R, 2^tl]
    packed dtable.  alpha: uint32[R, asweep*128] rank->symbol.  words:
    uint32[R, WB, 128] stream bits as LE words (bit p of the stream is
    bit p&31 of word p>>5), padded by >= 2 blocks.

    Returns uint16[R, steps//(128//N), 128]: each row packs 128//N steps
    x N lanes, so ``out[s].reshape(-1)[:count]`` is stream s's symbol
    stream in order.
    """
    R = init.shape[0]
    G = TGROUP()
    if R % G != 0:
        pad = G - R % G
        init, pos, cnt, tpk, alpha, words = (
            jnp.concatenate([a, jnp.broadcast_to(a[:1], (pad,) + a.shape[1:])])
            for a in (init, pos, cnt, tpk, alpha, words)
        )
        full = tans_decode_pallas(
            init, pos, cnt, tpk, alpha, words, steps=steps, n_streams=R + pad,
            n_states=n_states, table_log=table_log, asweep=asweep,
        )
        return full[:R]
    grid = R // G
    TS = max(128, 1 << table_log)
    n_rows = steps // (128 // n_states)
    return pl.pallas_call(
        partial(_kernel_tans, steps=steps, n_streams=G, n_states=n_states,
                table_log=table_log, asweep=asweep),
        out_shape=jax.ShapeDtypeStruct((R, n_rows, 128), jnp.uint16),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((G, 128), lambda i: (i, 0)),
            pl.BlockSpec((G, 128), lambda i: (i, 0)),
            pl.BlockSpec((G, 128), lambda i: (i, 0)),
            pl.BlockSpec((G, TS), lambda i: (i, 0)),
            pl.BlockSpec((G, alpha.shape[1]), lambda i: (i, 0)),
            pl.BlockSpec((G, words.shape[1], 128), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((G, n_rows, 128), lambda i: (i, 0, 0)),
        interpret=not supports_pallas_rans(),
    )(init, pos, cnt, tpk, alpha, words)


def fse_parse_header(blob: bytes):
    """Split a reference entropy blob into (n_states, count, body bytes,
    coder).  count is None for the 1-state format (implicit termination —
    decoded on the host; the kernel path needs the exact count the N>=2
    formats carry).  coder is 'tans' for FF 02/04/84 and 'rans' for the
    8-state rANS format FF 08 (rans8state.go:14-17) — the decode *step*
    is identical (x' = newState[x] + readBits(nb[x]), ransu16.go:33-39),
    only the table construction differs, so both share the kernel."""
    from ..ops.fse_codec import (
        MAGIC_2STATE,
        MAGIC_4STATE,
        MAGIC_8STATE_FSE,
        MAGIC_8STATE_RANS,
    )

    if len(blob) >= 6:
        for magic, n, coder in (
            (MAGIC_8STATE_FSE, 8, "tans"),
            (MAGIC_8STATE_RANS, 8, "rans"),
            (MAGIC_4STATE, 4, "tans"),
            (MAGIC_2STATE, 2, "tans"),
        ):
            if blob[:2] == magic:
                return n, int.from_bytes(blob[2:6], "little"), blob[6:], coder
    return 1, None, blob, "tans"


def _pack_dtable(norm, symbol_len: int, table_log: int, coder: str = "tans"):
    """Packed dtable + alphabet for the kernel; returns None if the
    stream exceeds the kernel caps (caller falls back to host)."""
    from ..ops.fse import build_dtable

    if table_log > TANS_MAX_TABLE_LOG:
        return None
    if coder == "rans":
        from ..ops.rans import build_rans_dec_table

        new_state, symbol, nb_bits = build_rans_dec_table(norm, symbol_len, table_log)
    else:
        new_state, symbol, nb_bits, _zero_bits = build_dtable(norm, symbol_len, table_log)
    alpha_syms = np.unique(symbol)
    if len(alpha_syms) > TANS_MAX_ALPHABET:
        return None
    rank = np.searchsorted(alpha_syms, symbol).astype(np.uint32)
    if new_state.max() >= (1 << 14) or nb_bits.max() >= 32:
        return None
    packed = (rank << 19) | (new_state.astype(np.uint32) << 5) | nb_bits.astype(np.uint32)
    return packed, alpha_syms.astype(np.uint32)


def build_tans_batch(parsed, n_states: int, min_steps: int = 0, coder: str = "tans"):
    """Stage a batch of same-N ANS streams for the kernel.

    parsed: list of (count, norm, symbol_len, table_log, bits) — the
    output of read_ncount + header split.  ``coder`` selects the decode
    table construction ('tans' = co-prime spread, 'rans' = linear fill);
    the kernel is shared.  Returns (operands, steps, table_log, asweep)
    or None if any stream exceeds the kernel caps.
    """
    from ..ops.bitio import ReverseBitReader

    R = len(parsed)
    tl_max = max(p[3] for p in parsed)
    if tl_max > TANS_MAX_TABLE_LOG:
        return None
    TS = max(128, 1 << tl_max)
    SPR = 128 // n_states
    steps = max(min_steps, max(-(-p[0] // n_states) for p in parsed))
    steps = -(-steps // (8 * SPR)) * (8 * SPR)  # 8 output rows per store

    tpk = np.zeros((R, TS), np.uint32)
    alphas = []
    init = np.zeros((R, 128), np.uint32)
    pos = np.zeros((R, 128), np.int32)
    cnt = np.zeros((R, 128), np.uint32)
    wmax = 0
    words_list = []
    for i, (count, norm, symbol_len, tl, bits) in enumerate(parsed):
        pk = _pack_dtable(norm, symbol_len, tl, coder)
        if pk is None:
            return None
        packed, alpha_syms = pk
        tpk[i, : len(packed)] = packed
        alphas.append(alpha_syms)
        r = ReverseBitReader(bits)
        for j in range(n_states):
            init[i, j] = r.get_bits(tl)
        pos[i, :] = r.pos
        cnt[i, :] = count
        w = np.frombuffer(bits + b"\x00" * ((-len(bits)) % 4), dtype="<u4")
        words_list.append(w)
        wmax = max(wmax, len(w))
    WB = -(-(wmax) // 128) + 2  # +2 pad blocks for the b0+1 slice
    words = np.zeros((R, WB * 128), np.uint32)
    for i, w in enumerate(words_list):
        words[i, : len(w)] = w
    words = words.reshape(R, WB, 128)

    amax = max(len(a) for a in alphas)
    asweep = 1
    while asweep * 128 < amax:
        asweep *= 2
    alpha = np.zeros((R, asweep * 128), np.uint32)
    for i, a in enumerate(alphas):
        alpha[i, : len(a)] = a
    return (init, pos, cnt, tpk, alpha, words), steps, tl_max, asweep


def fse_decompress_device_batch(blobs: list[bytes]):
    """Decode a batch of reference entropy blobs (FF 02/04/84/08) on
    device.

    Streams group by (coder, n_states, tableLog, asweep, steps bucket);
    each group is one kernel launch.  1-state blobs and streams beyond
    the kernel caps fall back to the host decoder.  Returns a list of
    numpy symbol arrays, blob-order — bit-exact vs ops.fse_codec /
    ops.rans.
    """
    from ..ops.fse import read_ncount
    from ..ops.fse_codec import fse_decompress_auto

    results = [None] * len(blobs)
    groups: dict[tuple, list] = {}
    for bi, blob in enumerate(blobs):
        n, count, body, coder = fse_parse_header(blob)
        if n == 1 or count is None:
            results[bi] = fse_decompress_auto(blob)
            continue
        norm, symbol_len, tl, consumed = read_ncount(body)
        entry = (count, norm, symbol_len, tl, body[consumed:])
        if tl > TANS_MAX_TABLE_LOG:
            results[bi] = fse_decompress_auto(blob)
            continue
        b = 8 * (128 // n)
        need = -(-count // n)
        while b < need:
            b *= 2
        groups.setdefault((coder, n, tl, b), []).append((bi, entry))

    for (coder, n, tl, b), items in groups.items():
        staged = build_tans_batch([e for _bi, e in items], n, min_steps=b, coder=coder)
        if staged is None:
            for bi, _e in items:
                results[bi] = fse_decompress_auto(blobs[bi])
            continue
        ops, steps, tl_max, asweep = staged
        out = tans_decode_pallas(
            *(jnp.asarray(a) for a in ops), steps=steps, n_streams=len(items),
            n_states=n, table_log=tl_max, asweep=asweep,
        )
        out = np.asarray(out)
        for j, (bi, (count, *_rest)) in enumerate(items):
            results[bi] = out[j].reshape(-1)[:count].astype(np.uint16)
    return results
