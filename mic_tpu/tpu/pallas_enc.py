"""Pallas TPU kernel for wide-lane rANS ENCODE (device-side compression).

The reference encodes on CPU threads (mic_compress_c.c, parallelstrips.go
workers); here the encode scan itself runs on the TPU: the mirror
recursion of pallas_rans.py's decode kernel, processed in reverse step
order.  Output blobs are BYTE-IDENTICAL to the host encoder
(device_rans.mict_encode), so every decoder tier accepts them.

Design notes (v5e/Mosaic):

* **Division on the VPU**: the encode step needs x//freq and x%freq for
  data-dependent freq.  Freqs are <= 2^12 (MICW caps tableLog at 12), so
  each rank's divisor gets a Hacker's-Delight unsigned magic (M, add, sh)
  computed host-side; the kernel evaluates q = mulhi32(x, M) (four
  16x16 partial products) + the add/shift fixup — branch-free selects.
* **Reverse scan**: states evolve from the LAST symbol backwards.  The
  kernel walks 8-step blocks from the tail (aligned dynamic loads), and
  within a block unrolls sub-steps in reverse.
* **No scatter**: renorm words are emitted DENSE ([S, steps, 128] u16 +
  flag planes); host/XLA compaction (words[flags]) produces the stream.
  Decoder word order is (step asc, lane asc) — exactly the dense
  traversal order, so compaction IS the stream assembly.
* Tables ride per-rank (alphabet <= 4096, asweep tiles): te1 packs
  (freq-1)<<18 | add<<17 | is1<<16 | cum<<4 | shift; te2 is the 32-bit
  magic.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from .pallas_rans import GROUP, supports_pallas_rans

__all__ = ["rans_encode_pallas", "rans_encode_pallas_alias", "build_enc_tables", "magicu"]


def magicu(d: int):
    """Unsigned magic number for division by d (Hacker's Delight 10-9):
    returns (M, add, sh) such that for all x < 2^32:
        t = mulhi32(x, M)
        q = (t >> sh)                     if add == 0
        q = ((t + ((x - t) >> 1)) >> sh)  if add == 1   (sh is post-fixup)
    equals x // d.  d == 1 is the caller's special case.
    """
    assert 2 <= d < 2**31
    p = 31
    nc = (2**32 // d) * d - 1
    while True:
        p += 1
        if 2**p > nc * (d - 1 - (2**p - 1) % d):
            m = (2**p + d - 1 - (2**p - 1) % d) // d
            break
    if m < 2**32:
        return m, 0, p - 32
    # 33-bit magic: keep the low 32 bits, use the add fixup; the shift
    # drops by one because the fixup halves.
    return m - 2**32, 1, p - 32 - 1


def _verify_magic(d, M, add, sh):
    for x in (0, 1, d - 1, d, d + 1, 2 * d - 1, 2**16, 2**31, 2**32 - 1,
              (2**32 // d) * d - 1, (2**32 // d) * d % 2**32):
        x &= 0xFFFFFFFF
        t = (x * M) >> 32
        q = (t >> sh) if add == 0 else ((t + ((x - t) >> 1)) >> sh)
        if q != x // d:
            return False
    return True


_MAGIC_CACHE: dict[int, tuple[int, int, int]] = {}


def _magic(d: int):
    got = _MAGIC_CACHE.get(d)
    if got is None:
        got = magicu(d)
        assert _verify_magic(d, *got), d
        _MAGIC_CACHE[d] = got
    return got


def build_enc_tables(parsed_norms, table_log: int):
    """Per-strip encode tables from (norm, tl, count, rank_stream) specs.

    parsed_norms: list of (freqs_by_rank u32[A], cums_by_rank u32[A]).
    Returns (te1, te2) uint32[S, asweep*128] and asweep.
    te1 = (freq-1)<<18 | add<<17 | is1<<16 | cum<<4 | sh;  te2 = magic M.
    (freq-1 and cum both need 12 bits at tableLog 12.)
    """
    S = len(parsed_norms)
    amax = max(len(f) for f, _c in parsed_norms)
    asweep = max(1, (amax + 127) // 128)
    te1 = np.zeros((S, asweep * 128), np.uint32)
    te2 = np.zeros((S, asweep * 128), np.uint32)
    for i, (freqs, cums) in enumerate(parsed_norms):
        for r, (f, c) in enumerate(zip(freqs.tolist(), cums.tolist())):
            if f <= 0:
                raise ValueError("encode table: zero freq rank")
            if f == 1:
                M, add, sh, is1 = 0, 0, 0, 1
            else:
                M, add, sh = _magic(f)
                is1 = 0
            te1[i, r] = ((f - 1) << 18) | (add << 17) | (is1 << 16) | (c << 4) | sh
            te2[i, r] = M
    return te1, te2, asweep


def _kernel_enc(ranks_ref, te1_ref, te2_ref, *rest, steps, n_strips, asweep,
                alias=False):
    if alias:
        # FF 41: ar1/ar2 are the 256-entry (2x128) run tables mapping the
        # standard slot space to the alias layout — runs sorted by
        # standard start; a branchless binary search resolves the run.
        (ar1_ref, ar2_ref, count_ref, tl_ref,
         out_w_ref, out_f_ref, out_x_ref) = rest
    else:
        count_ref, tl_ref, out_w_ref, out_f_ref, out_x_ref = rest
    S = n_strips

    def _runs_at(idx):
        """Gather ar1/ar2 at per-lane indices idx in [0, 256)."""
        hi = idx >> 7
        lo = idx & 127
        v1 = jnp.zeros((S, 128), jnp.uint32)
        v2 = jnp.zeros((S, 128), jnp.uint32)
        for h in range(2):
            m = hi == h
            v1 = jnp.where(m, jnp.take_along_axis(ar1_ref[:, h, :], lo, axis=1), v1)
            v2 = jnp.where(m, jnp.take_along_axis(ar2_ref[:, h, :], lo, axis=1), v2)
        return v1, v2

    def substep(t, x, rk):
        active = (t * 128 + jax.lax.broadcasted_iota(jnp.int32, (S, 128), 1)) < count_ref[:].astype(jnp.int32)
        rk = rk.astype(jnp.int32)
        e1 = jnp.zeros((S, 128), jnp.uint32)
        e2 = jnp.zeros((S, 128), jnp.uint32)
        rhi = rk >> 7
        rlo = rk & 127
        for h in range(asweep):
            m = rhi == h
            e1 = jnp.where(m, jnp.take_along_axis(te1_ref[:, pl.ds(h * 128, 128)], rlo, axis=1), e1)
            e2 = jnp.where(m, jnp.take_along_axis(te2_ref[:, pl.ds(h * 128, 128)], rlo, axis=1), e2)
        f = (e1 >> 18) + jnp.uint32(1)
        add = (e1 >> 17) & jnp.uint32(1)
        is1 = (e1 >> 16) & jnp.uint32(1)
        c = (e1 >> 4) & jnp.uint32(0xFFF)
        sh = e1 & jnp.uint32(0xF)
        shift_rn = jnp.uint32(32) - tl_ref[:]
        need = (x >= jax.lax.shift_left(f, shift_rn)) & active
        w = jnp.where(need, x & jnp.uint32(0xFFFF), jnp.uint32(0))
        x1 = jnp.where(need, x >> jnp.uint32(16), x)
        # q = x1 // f via magic multiply (mulhi32 from 16-bit partials).
        xl = x1 & jnp.uint32(0xFFFF)
        xh = x1 >> jnp.uint32(16)
        ml = e2 & jnp.uint32(0xFFFF)
        mh = e2 >> jnp.uint32(16)
        lo = xl * ml
        mid1 = xl * mh
        mid2 = xh * ml
        hi = xh * mh
        carry = ((lo >> jnp.uint32(16)) + (mid1 & jnp.uint32(0xFFFF)) + (mid2 & jnp.uint32(0xFFFF))) >> jnp.uint32(16)
        t_hi = hi + (mid1 >> jnp.uint32(16)) + (mid2 >> jnp.uint32(16)) + carry
        q_noadd = jax.lax.shift_right_logical(t_hi, sh)
        q_add = jax.lax.shift_right_logical(t_hi + ((x1 - t_hi) >> jnp.uint32(1)), sh)
        q = jnp.where(add == 1, q_add, q_noadd)
        q = jnp.where(is1 == 1, x1, q)
        rem = x1 - q * f
        if alias:
            # Standard slot -> alias slot via the run table: cnt =
            # #starts <= sIdx (9 branchless binary-search rounds over
            # 256 sorted entries, pad = 0xFFFFFFFF), then
            # alias_slot = base[cnt-1] + (sIdx - start[cnt-1]).
            s_idx = rem + c
            cnt = jnp.zeros((S, 128), jnp.int32)
            step_sz = 256
            while step_sz:
                cand = cnt + step_sz
                v1, _ = _runs_at(jnp.minimum(cand - 1, 255))
                take = (cand <= 256) & (v1 <= s_idx)
                cnt = jnp.where(take, cand, cnt)
                step_sz >>= 1
            r = jnp.maximum(cnt - 1, 0)
            st_v, base_v = _runs_at(r)
            slot = base_v + (s_idx - st_v)
            x2 = jax.lax.shift_left(q, tl_ref[:]) + slot
        else:
            x2 = jax.lax.shift_left(q, tl_ref[:]) + rem + c
        x2 = jnp.where(active, x2, x1)
        return x2, w, need

    def body(i, x):
        tb = steps // 8 - 1 - i  # tail-first block order
        blk = ranks_ref[:, pl.ds(tb * 8, 8), :]
        ws = [None] * 8
        fs = [None] * 8
        for u in range(7, -1, -1):
            rk = blk[:, u, :]
            x, w, need = substep(tb * 8 + u, x, rk)
            ws[u] = w.astype(jnp.uint16).reshape(S, 1, 128)
            fs[u] = need.astype(jnp.uint16).reshape(S, 1, 128)
        out_w_ref[:, pl.ds(tb * 8, 8), :] = jnp.concatenate(ws, axis=1)
        out_f_ref[:, pl.ds(tb * 8, 8), :] = jnp.concatenate(fs, axis=1)
        return x

    x = jax.lax.fori_loop(0, steps // 8, body, jnp.full((S, 128), 1 << 16, jnp.uint32))
    out_x_ref[:, :] = x


@partial(jax.jit, static_argnames=("steps", "n_strips", "asweep"))
def rans_encode_pallas(ranks, te1, te2, count, tls, *, steps, n_strips, asweep):
    """Encode rank streams into wide-lane rANS states + dense word planes.

    ranks: uint16[S, steps, 128] (rank per symbol, garbage on pad lanes).
    te1/te2: uint32[S, asweep*128] encode tables.  count/tls:
    uint32[S, 128] symbol count and tableLog per strip (mixed tableLogs
    batch together — the renorm threshold is a per-lane shift).
    Returns (words u16[S, steps, 128], flags u16[S, steps, 128],
    states u32[S, 128]); stream words = words[flags == 1] in (step asc,
    lane asc) order, final states are the decoder's init states.
    """
    S = ranks.shape[0]
    if S % GROUP() != 0:
        pad = GROUP() - S % GROUP()
        ranks, te1, te2, count, tls = (
            jnp.concatenate([a, jnp.broadcast_to(a[:1], (pad,) + a.shape[1:])])
            for a in (ranks, te1, te2, count, tls)
        )
        w, f, x = rans_encode_pallas(
            ranks, te1, te2, count, tls,
            steps=steps, n_strips=S + pad, asweep=asweep,
        )
        return w[:S], f[:S], x[:S]
    grid = S // GROUP()
    AW = te1.shape[1]
    return pl.pallas_call(
        partial(_kernel_enc, steps=steps, n_strips=GROUP(), asweep=asweep),
        out_shape=(
            jax.ShapeDtypeStruct((S, steps, 128), jnp.uint16),
            jax.ShapeDtypeStruct((S, steps, 128), jnp.uint16),
            jax.ShapeDtypeStruct((S, 128), jnp.uint32),
        ),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((GROUP(), steps, 128), lambda i: (i, 0, 0)),
            pl.BlockSpec((GROUP(), AW), lambda i: (i, 0)),
            pl.BlockSpec((GROUP(), AW), lambda i: (i, 0)),
            pl.BlockSpec((GROUP(), 128), lambda i: (i, 0)),
            pl.BlockSpec((GROUP(), 128), lambda i: (i, 0)),
        ],
        out_specs=(
            pl.BlockSpec((GROUP(), steps, 128), lambda i: (i, 0, 0)),
            pl.BlockSpec((GROUP(), steps, 128), lambda i: (i, 0, 0)),
            pl.BlockSpec((GROUP(), 128), lambda i: (i, 0)),
        ),
        interpret=not supports_pallas_rans(),
    )(ranks, te1, te2, count, tls)


@partial(jax.jit, static_argnames=("steps", "n_strips", "asweep"))
def rans_encode_pallas_alias(ranks, te1, te2, ar1, ar2, count, tls, *,
                             steps, n_strips, asweep):
    """Alias-layout (FF 41) variant of rans_encode_pallas: identical
    state machine, but the written slot is the alias permutation of
    cumul+rem, resolved in-kernel from the 256-entry run tables ar1
    (standard-layout run starts, sorted, pad 0xFFFFFFFF) / ar2 (alias
    slot of each run's start), both uint32[S, 2, 128]."""
    S = ranks.shape[0]
    if S % GROUP() != 0:
        pad = GROUP() - S % GROUP()
        ranks, te1, te2, ar1, ar2, count, tls = (
            jnp.concatenate([a, jnp.broadcast_to(a[:1], (pad,) + a.shape[1:])])
            for a in (ranks, te1, te2, ar1, ar2, count, tls)
        )
        w, f, x = rans_encode_pallas_alias(
            ranks, te1, te2, ar1, ar2, count, tls,
            steps=steps, n_strips=S + pad, asweep=asweep,
        )
        return w[:S], f[:S], x[:S]
    grid = S // GROUP()
    AW = te1.shape[1]
    return pl.pallas_call(
        partial(_kernel_enc, steps=steps, n_strips=GROUP(), asweep=asweep,
                alias=True),
        out_shape=(
            jax.ShapeDtypeStruct((S, steps, 128), jnp.uint16),
            jax.ShapeDtypeStruct((S, steps, 128), jnp.uint16),
            jax.ShapeDtypeStruct((S, 128), jnp.uint32),
        ),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((GROUP(), steps, 128), lambda i: (i, 0, 0)),
            pl.BlockSpec((GROUP(), AW), lambda i: (i, 0)),
            pl.BlockSpec((GROUP(), AW), lambda i: (i, 0)),
            pl.BlockSpec((GROUP(), 2, 128), lambda i: (i, 0, 0)),
            pl.BlockSpec((GROUP(), 2, 128), lambda i: (i, 0, 0)),
            pl.BlockSpec((GROUP(), 128), lambda i: (i, 0)),
            pl.BlockSpec((GROUP(), 128), lambda i: (i, 0)),
        ],
        out_specs=(
            pl.BlockSpec((GROUP(), steps, 128), lambda i: (i, 0, 0)),
            pl.BlockSpec((GROUP(), steps, 128), lambda i: (i, 0, 0)),
            pl.BlockSpec((GROUP(), 128), lambda i: (i, 0)),
        ),
        interpret=not supports_pallas_rans(),
    )(ranks, te1, te2, ar1, ar2, count, tls)


def mict_encode_device_batch(streams, lanes: int = 128, table_log: int | None = None, max_table_log: int = 12, on_error: str = "raise", alias: bool = False, max_bytes: list | None = None):
    """Encode many u16 symbol streams into MICT blobs with the Pallas
    encode kernel (one launch for the whole batch).  Blobs are
    byte-identical to device_rans.mict_encode(stream, lanes=128,
    max_table_log=12) — reference semantics: fseu16.go normalization +
    adaptive tableLog, capped for the packed decode kernel.

    ``alias=True`` writes the FF 41 alias-mapped variant instead
    (byte-identical to mict_encode_alias): host does the escape-fold
    plan + table build; the kernel maps each written slot through the
    256-run alias permutation in-kernel (rans_encode_pallas_alias).

    Returns a list of bytes.  Raises the same sentinel errors as the host
    encoder per stream (caller handles fallback per strip); streams whose
    alphabet exceeds 4096 raise IncompressibleError.  With
    on_error="none", failing streams yield None instead (the kernel runs
    on the encodable subset).  ``max_bytes`` supplies a per-stream byte
    budget (host mict_encode's max_bytes; default = the stream's own raw
    size) — blobs at or over budget fail like any sentinel error.
    """
    import struct

    from ..ops.fse import (
        DEFAULT_TABLE_LOG,
        IncompressibleError,
        UseRLEError,
        histogram,
        optimal_table_log,
    )
    from .device_rans import (
        MICT_ALIAS_MAGIC,
        MICT_MAGIC,
        _alias_apply,
        _norm_and_header,
        alias_encode_plan,
        encode_tables,
    )

    if lanes != 128:
        raise ValueError("device encode requires 128 lanes")
    tl_hint = DEFAULT_TABLE_LOG if table_log is None else table_log

    specs = []
    metas = []
    runs = []  # per-stream (starts, bases) for the alias kernel
    slot_of = []  # output position per encodable stream
    failed = [None] * len(streams)
    for si, symbols in enumerate(streams):
        try:
            symbols = np.asarray(symbols, dtype=np.uint16)
            n = len(symbols)
            if n == 0:
                raise IncompressibleError
            counts, max_count, symbol_len = histogram(symbols)
            if max_count == n:
                raise UseRLEError
            if max_count == 1 or max_count < (n >> 15):
                raise IncompressibleError
            esc_info = None
            if alias:
                # The byte-format-defining setup (fold/retry/clamp/tables)
                # is SHARED with the host encoder — see alias_encode_plan.
                kept_vals, esc_val, tl, header, freq, cumul, al = (
                    alias_encode_plan(counts, symbol_len, n, tl_hint,
                                      max_table_log))
                recoded, esc_values = _alias_apply(symbols, kept_vals, esc_val)
                symbols = recoded.astype(np.uint16)
                esc_info = (esc_val, esc_values)
                run_se = al["enc_runs"]
            else:
                tl = optimal_table_log(tl_hint, n, symbol_len)
                tl = min(tl, max_table_log)
                try:
                    norm, header = _norm_and_header(counts, n, tl, symbol_len)
                    freq, cumul = encode_tables(norm, tl)
                except ValueError as e:
                    raise IncompressibleError(str(e)) from e
                run_se = None
            alphabet = np.nonzero(freq)[0]
            if len(alphabet) > 4096:
                raise IncompressibleError("alphabet too wide for device encode")
        except (IncompressibleError, UseRLEError):
            if on_error == "raise":
                raise
            continue
        lut = np.zeros(65536, np.uint16)
        lut[alphabet] = np.arange(len(alphabet), dtype=np.uint16)
        ranks = lut[symbols]
        specs.append((freq[alphabet].astype(np.uint32), cumul[alphabet].astype(np.uint32)))
        metas.append((n, tl, header, ranks, esc_info))
        runs.append(run_se)
        slot_of.append(si)
    if not specs:
        return failed

    S = len(specs)
    tl_max = max(m[1] for m in metas)
    steps = max(-(-m[0] // 128) for m in metas)
    steps = (steps + 7) // 8 * 8
    te1, te2, asweep = build_enc_tables(specs, tl_max)
    rk = np.zeros((S, steps * 128), np.uint16)
    cnt = np.zeros((S, 128), np.uint32)
    tls = np.zeros((S, 128), np.uint32)
    for i, (n, tl_i, _h, ranks, _e) in enumerate(metas):
        rk[i, :n] = ranks
        cnt[i, :] = n
        tls[i, :] = tl_i

    if alias:
        ar1 = np.full((S, 256), 0xFFFFFFFF, np.uint32)
        ar2 = np.zeros((S, 256), np.uint32)
        for i, rse in enumerate(runs):
            starts, bases = rse
            ar1[i, : len(starts)] = starts
            ar2[i, : len(bases)] = bases
        w, f, x = rans_encode_pallas_alias(
            jnp.asarray(rk.reshape(S, steps, 128)),
            jnp.asarray(te1),
            jnp.asarray(te2),
            jnp.asarray(ar1.reshape(S, 2, 128)),
            jnp.asarray(ar2.reshape(S, 2, 128)),
            jnp.asarray(cnt),
            jnp.asarray(tls),
            steps=steps, n_strips=S, asweep=asweep,
        )
    else:
        w, f, x = rans_encode_pallas(
            jnp.asarray(rk.reshape(S, steps, 128)),
            jnp.asarray(te1),
            jnp.asarray(te2),
            jnp.asarray(cnt),
            jnp.asarray(tls),
            steps=steps, n_strips=S, asweep=asweep,
        )
    w = np.asarray(w).reshape(S, -1)
    f = np.asarray(f).reshape(S, -1)
    x = np.asarray(x)

    blobs = list(failed)
    for i, (n, tl, header, _ranks, esc_info) in enumerate(metas):
        words = w[i][f[i] == 1].astype(np.uint16)
        out = bytearray()
        if alias:
            esc_val, esc_values = esc_info
            out += MICT_ALIAS_MAGIC
            out += struct.pack("<BB", 7, tl)
            out += struct.pack("<II", n, len(words))
            out += struct.pack("<IH", len(esc_values), esc_val)
        else:
            out += MICT_MAGIC
            out += struct.pack("<BB", 7, tl)
            out += struct.pack("<II", n, len(words))
        out += header
        out += x[i].astype("<u4").tobytes()
        out += words.astype("<u2").tobytes()
        if alias:
            out += esc_info[1].astype("<u2").tobytes()
        budget = n * 2
        if max_bytes is not None and max_bytes[slot_of[i]] is not None:
            budget = max_bytes[slot_of[i]]
        if len(out) >= budget:
            if on_error == "raise":
                raise IncompressibleError
            continue
        blobs[slot_of[i]] = bytes(out)
    return blobs


def micw_compress_device(pixels, width: int, height: int, max_value: int,
                         num_strips: int = 0, entropy: str = "standard",
                         predictor: str = "zzd"):
    """MICW compression with the entropy stage on the TPU.

    Byte-identical to strips.micw_compress(pixels, ..., predictor=
    predictor, entropy=entropy) for every predictor/entropy combination
    — see micw_compress_device_many."""
    return micw_compress_device_many(
        [(pixels, width, height, max_value, num_strips)], entropy=entropy,
        predictor=predictor,
    )[0]


def micw_compress_device_many(images, entropy: str = "standard",
                              predictor: str = "zzd"):
    """Device-encode MANY images into MICW containers — the archive-
    migration shape (per-frame launches pay ~75 ms tunnel RPC each; a
    1000-frame study batched here pays one launch per stream family).

    ``images`` is a list of (pixels, width, height, max_value
    [, num_strips]); returns the containers blob-order, each
    byte-identical to strips.micw_compress on that image with the same
    ``predictor``/``entropy`` — including the adaptive trial sets
    ("auto-fast", "auto-r", "auto") and entropy="best".  Identity holds
    because candidate generation and selection are the SAME code
    (strips._strip_candidates / _strip_select); this function merely
    pre-encodes every candidate the selector may ask for, batched into
    at most two Pallas launches (one FF 57, one FF 41) covering all
    strips of all images, with per-stream raw-size budgets
    (reference anchor: the C encoder covers every shipped format,
    mic_compress_c.c:915-955)."""
    if entropy not in ("standard", "alias", "best"):
        raise ValueError(f"micw device encode: unknown entropy {entropy!r}")
    import struct as _struct

    from .strips import (
        ALIAS_TABLE_LOG,
        _PRED_MODE,
        _RLE_DIRECT_PREDS,
        FLAG_ADAPTIVE,
        FLAG_AVG_PREDICTOR,
        FLAG_BANDED,
        FLAG_DIRECT,
        FLAG_RDENSE,
        MAX_TABLE_LOG,
        MICW_BAND_W,
        MICW_MAGIC,
        STRIP_MODE_CONST,
        _rle_mid,
        _strip_candidates,
        _strip_requests,
        _strip_select,
        _trials_for,
        band_split,
    )

    trials = _trials_for(predictor)

    prep = []  # per image: (width, height, max_value, actual, strip_h, entries, band)
    jobs = {False: [], True: []}  # alias? -> [(syms, counts, max_bytes)]
    for spec in images:
        pixels, width, height, max_value = spec[:4]
        num_strips = spec[4] if len(spec) > 4 else 0
        pixels = np.asarray(pixels, dtype=np.uint16)
        if len(pixels) != width * height:
            raise ValueError("micw: pixel count mismatch")
        # Wide images band exactly like the host encoder (FLAG_BANDED) —
        # part of the byte-identity contract and of the shared
        # compiled-program-family property.
        orig_w, orig_h = width, height
        banded = width > MICW_BAND_W and width % MICW_BAND_W == 0
        if banded:
            pixels, width, height = band_split(pixels, width, height)
        if num_strips <= 0:
            # Same default geometry as the host container (128-row
            # strips, scaled by the band count for banded images).
            rows = 128 * (orig_w // width if banded else 1)
            num_strips = max(1, height // rows)
        num_strips = max(1, min(num_strips, height))
        strip_h = (height + num_strips - 1) // num_strips
        actual = (height + strip_h - 1) // strip_h
        mid = _rle_mid(max_value)

        entries = []
        for s in range(actual):
            y0 = s * strip_h
            y1 = min(y0 + strip_h, height)
            sh = y1 - y0
            strip_px = pixels[y0 * width : y1 * width]
            if strip_px[0] == strip_px.max() and strip_px[0] == strip_px.min():
                entries.append(("const", strip_px))
                continue
            candidates = _strip_candidates(strip_px, width, sh, max_value,
                                           mid, trials, entropy)
            slots = {}
            for i, alias in _strip_requests(candidates, len(trials), entropy):
                jobs[alias].append((candidates[i][1], candidates[i][2],
                                    strip_px.nbytes))
                slots[(i, alias)] = len(jobs[alias]) - 1
            entries.append(("enc", strip_px, candidates, slots))
        prep.append((width, height, max_value, actual, strip_h, entries,
                     (orig_w, orig_h) if banded else None))

    # One Pallas launch per stream family for every candidate of every
    # strip of every image.
    results = {
        alias: (mict_encode_device_batch(
            [j[0] for j in batch], on_error="none", alias=alias,
            max_table_log=ALIAS_TABLE_LOG if alias else MAX_TABLE_LOG,
            max_bytes=[j[2] for j in batch],
        ) if batch else [])
        for alias, batch in jobs.items()
    }

    outs = []
    for (width, height, max_value, actual, strip_h, entries, band) in prep:
        blobs = []
        metas = []
        for entry in entries:
            if entry[0] == "const":
                strip_px = entry[1]
                blobs.append(strip_px[:1].astype("<u2").tobytes())
                metas.append((0, 0, 0, 0, STRIP_MODE_CONST))
                continue
            _tag, strip_px, candidates, slots = entry

            def enc(i, alias, _slots=slots):
                # Direct indexing: a (candidate, family) pair the request
                # enumeration missed must KeyError, not silently diverge
                # from the host selection.
                return results[alias][_slots[(i, alias)]]

            blob, meta = _strip_select(candidates, strip_px, len(trials),
                                       entropy, enc)
            blobs.append(blob)
            metas.append(meta)

        out = bytearray()
        out += MICW_MAGIC
        out += _struct.pack("<IIII", width, height, actual, strip_h)
        flags = FLAG_ADAPTIVE | {"avg": FLAG_AVG_PREDICTOR,
                                 "zzd": FLAG_DIRECT}.get(predictor, 0)
        if band is not None:
            flags |= FLAG_BANDED
        r_modes = {_PRED_MODE[pr] for pr in _RLE_DIRECT_PREDS}
        if any(m[4] in r_modes for m in metas):
            flags |= FLAG_RDENSE
        out += _struct.pack("<HBB", max_value, flags, 7)
        if band is not None:
            out += _struct.pack("<II", *band)
        offset = 0
        for blob, (n_soa, n_tok, n_runs, n_same, mode) in zip(blobs, metas):
            out += _struct.pack("<IIIIIII", offset, len(blob), n_soa, n_tok,
                                n_runs, n_same, mode)
            offset += len(blob)
        outs.append(bytes(out) + b"".join(blobs))
    return outs
