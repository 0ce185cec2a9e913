"""MICW — the TPU-native parallel-strip container (v2, SoA-RLE).

The device-format sibling of PICS (parallelstrips.go): images go through
the ZZ (left-neighbour ZigZag) predictor + 16-bit RLE (same grammar as
the host formats) and the **wide-lane rANS** device entropy coder
(mic_tpu.tpu.device_rans) instead of byte-oriented tANS.  A whole batch
of strips/images decodes in ONE jitted device program; the strip axis
shards over a chip mesh with shard_map (mic_tpu.tpu.mesh).

Two TPU-first re-shapings relative to the host formats:

* **Wide-lane rANS** replaces bit-granular tANS (SURVEY.md §7's "wider-N
  stream variants"): 128×K vector lanes instead of 2/4/8 ILP states.
* **Structure-of-arrays RLE**: the RLE stream is stored as
  ``[counts][same-run values][literals]`` instead of interleaved blocks.
  Identical symbol multiset (same entropy cost), but run boundaries fall
  out of cumsums over the counts section — no header discovery, no
  pointer chasing on device.

Container layout::

    "MICW" | width u32 | height u32 | numStrips u32 | stripH u32
    maxValue u16 | flags u8 (bit0: 1 = avg predictor, 0 = zz) | lanes_log2 u8
    per strip: offset u32 | length u32 | nSoa u32 | nTokens u32 | nRuns u32 | nSame u32
    concatenated MICT entropy blobs (one per strip)

Default geometry: one strip per image and 1024 lanes — the lanes carry
the parallelism; strips exist to shard very large images across chips.
"""

from __future__ import annotations

import struct
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.deltarle import delta_rle_compress, zz_delta_rle_compress
from ..ops.fse import IncompressibleError, UseRLEError
from ..ops.predictors import delta_params
from ..ops.rle import rle_to_soa, soa_expand
from .device_rans import device_tables, mict_encode, mict_parse
from .pipeline import (
    avg_delta_inverse_device,
    zzd_inverse_device,
    parse_escaped_device,
    soa_rle_expand_device,
    zz_delta_inverse_device,
)

__all__ = [
    "micw_compress",
    "micw_decompress_device",
    "micw_decompress_host",
    "micw_decode_batch",
    "micw_decompress_device_pallas",
    "micw_decode_many",
    "micw_parse",
    "decode_strip_batch_impl",
    "build_strip_batch",
    "MICW_MAGIC",
]

MICW_MAGIC = b"MICW"
MICW_HEADER = 24
MICW_ENTRY = 28
FLAG_AVG_PREDICTOR = 0x01
FLAG_DIRECT = 0x02  # zz-direct: no RLE, no escapes (mod-2^16 ZigZag diffs)
STRIP_MODE_MICT = 0
STRIP_MODE_RAW = 1  # raw u16 pixels (entropy stage rejected the strip)


def _rle_mid(max_value: int) -> int:
    """MICW's RLE midCount: derived from the escape delimiter like the
    host formats, but floored at 127 — tiny midCounts (maxValue < 255)
    make the RLE state machine degenerate (see developer-guide.md)."""
    _thr, delim = delta_params(max_value)
    delim = max(int(delim), 255)
    return (1 << (delim.bit_length() - 1)) - 1




def _fused_rle(strip_px, width, sh, max_value, predictor, mid):
    """Predictor + RLE with MICW's floored midCount (see _rle_mid)."""
    from ..ops.predictors import predictor_encode, zigzag
    from ..ops.rle import RleEncoder

    thr, delim = delta_params(max_value)
    if predictor == "zz":
        img = np.asarray(strip_px, dtype=np.uint16).reshape(sh, width)
        p = img.astype(np.int64)
        left = np.zeros_like(p)
        left[:, 1:] = p[:, :-1]
        diff = p - left
        escape = np.abs(diff) >= thr
        from ..ops.predictors import _interleave_escapes

        stream = _interleave_escapes(
            zigzag(diff.astype(np.int16)).ravel(), img.ravel(), escape.ravel(), delim
        )
    else:
        stream = predictor_encode(strip_px, width, sh, max_value, "avg")
    rle_max = (mid << 1) | 1  # maxValue whose midCount is exactly `mid`
    enc = RleEncoder(width, sh, rle_max)
    enc.encode(int(max_value))
    for v in stream.tolist():
        enc.encode(v)
    enc.flush()
    return np.array(enc.out, dtype=np.uint16)


def micw_compress(
    pixels,
    width: int,
    height: int,
    max_value: int,
    num_strips: int = 0,
    lanes: int = 128,
    predictor: str = "zzd",
) -> bytes:
    """Compress into MICW.  Encoding is host-side (vectorized numpy).

    Predictors: "zzd" (default) — zz-direct: per-row mod-2^16 ZigZag
    deltas entropy-coded with NO RLE and NO escapes (the mapping is
    bijective, so escapes are unnecessary); measured better ratio than
    the RLE modes on the corpus AND the cheapest possible device
    inversion (unzigzag + row cumsum).  "zz"/"avg" — the escaped
    RLE pipelines shared with the host formats.
    """
    pixels = np.asarray(pixels, dtype=np.uint16)
    if len(pixels) != width * height:
        raise ValueError("micw: pixel count mismatch")
    if num_strips <= 0:
        # Default geometry: ~64-row strips (vreg rows in the Pallas rANS
        # kernel; per-strip arrays stay small for the post stages).
        num_strips = max(1, height // 64)
    num_strips = max(1, min(num_strips, height))
    strip_h = (height + num_strips - 1) // num_strips
    actual = (height + strip_h - 1) // strip_h
    mid = _rle_mid(max_value)

    blobs = []
    metas = []
    for s in range(actual):
        y0 = s * strip_h
        y1 = min(y0 + strip_h, height)
        sh = y1 - y0
        strip_px = pixels[y0 * width : y1 * width]
        if predictor == "zzd":
            img = strip_px.reshape(sh, width).astype(np.int64)
            left = np.zeros_like(img)
            left[:, 1:] = img[:, :-1]
            d16 = (img - left).astype(np.uint16).astype(np.int16)
            syms = (((d16.astype(np.int32) << 1) ^ (d16.astype(np.int32) >> 15)) & 0xFFFF
                    ).astype(np.uint16).ravel()
            n_runs = n_same = 0
            n_tokens = len(syms)
        else:
            rle_stream = _fused_rle(strip_px, width, sh, max_value, predictor, mid)
            syms, n_runs, n_same = rle_to_soa(rle_stream, 1, mid)
            n_tokens = int(
                np.sum(
                    np.where(
                        syms[:n_runs] <= mid,
                        syms[:n_runs].astype(np.int64),
                        syms[:n_runs].astype(np.int64) - mid,
                    )
                )
            )
        try:
            blob = mict_encode(syms, lanes=lanes, max_table_log=11)
            mode = STRIP_MODE_MICT
        except (IncompressibleError, UseRLEError, ValueError):
            # Raw fallback — the MICW analog of the WSI planeRaw path
            # (constant or incompressible strips).
            blob = strip_px.astype("<u2").tobytes()
            mode = STRIP_MODE_RAW
        blobs.append(blob)
        metas.append((len(syms), n_tokens, n_runs, n_same, mode))

    out = bytearray()
    out += MICW_MAGIC
    out += struct.pack("<IIII", width, height, actual, strip_h)
    flags = {"avg": FLAG_AVG_PREDICTOR, "zzd": FLAG_DIRECT}.get(predictor, 0)
    out += struct.pack("<HBB", max_value, flags, int(np.log2(lanes)))
    offset = 0
    for blob, (n_soa, n_tok, n_runs, n_same, mode) in zip(blobs, metas):
        out += struct.pack("<IIIIIII", offset, len(blob), n_soa, n_tok, n_runs, n_same, mode)
        offset += len(blob)
    return bytes(out) + b"".join(blobs)


def micw_parse(blob: bytes):
    if len(blob) < MICW_HEADER or blob[:4] != MICW_MAGIC:
        raise ValueError("micw: invalid magic")
    width, height, num_strips, strip_h = struct.unpack_from("<IIII", blob, 4)
    max_value, flags, lanes_log2 = struct.unpack_from("<HBB", blob, 20)
    hdr = MICW_HEADER
    table = [
        struct.unpack_from("<IIIIIII", blob, hdr + s * MICW_ENTRY) for s in range(num_strips)
    ]
    data0 = hdr + num_strips * MICW_ENTRY
    strips = []
    for off, ln, n_soa, n_tok, n_runs, n_same, mode in table:
        start = data0 + off
        if start + ln > len(blob):
            raise ValueError("micw: strip data out of bounds")
        strips.append((blob[start : start + ln], n_soa, n_tok, n_runs, n_same, mode))
    if flags & FLAG_DIRECT:
        predictor = "zzd"
    elif flags & FLAG_AVG_PREDICTOR:
        predictor = "avg"
    else:
        predictor = "zz"
    return width, height, num_strips, strip_h, max_value, predictor, 1 << lanes_log2, strips


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def decode_strip_batch_impl(
    init_states,  # [S, L] u32
    words,  # [S, W+1] u32
    tab_sym,  # [S, 2^tl] u16
    tab_freq,  # [S, 2^tl] u32
    tab_bias,  # [S, 2^tl] u32
    counts,  # [S] i32  (rANS symbol counts = SoA length per strip)
    n_tokens,  # [S] i32
    n_runs,  # [S] i32
    n_same,  # [S] i32
    *,
    table_log: int,
    n_steps: int,
    width: int,
    strip_h: int,
    max_runs: int,
    max_tokens: int,
    mid_count: int,
    delim: int,
    predictor: str = "zz",
):
    """One fused device program: wide-lane rANS → SoA-RLE expand → escape
    parse → predictor inverse, vmapped over the strip axis.  Unjitted so
    it can be wrapped by jit (single chip) or shard_map (mesh).

    predictor "zz" inverts with log-depth segmented scans (throughput
    path); "avg" uses the anti-diagonal wavefront (reference-default
    predictor parity at higher latency)."""
    L = init_states.shape[1]
    mask = jnp.uint32((1 << table_log) - 1)
    lane = jnp.arange(L, dtype=jnp.uint32)

    def rans_one(init, wrds, ts, tf, tb, count):
        def step(carry, t):
            x, cursor = carry
            active = (t * L + lane) < count
            slot = x & mask
            sym = jnp.take(ts, slot)
            f = jnp.take(tf, slot)
            b = jnp.take(tb, slot)
            x_new = f * (x >> jnp.uint32(table_log)) + b
            need = (x_new < jnp.uint32(1 << 16)) & active
            k = jnp.cumsum(need.astype(jnp.uint32)) - need.astype(jnp.uint32)
            w = jnp.take(wrds, cursor + k, mode="clip")
            x_new = jnp.where(need, (x_new << jnp.uint32(16)) | w, x_new)
            cursor = cursor + jnp.sum(need.astype(jnp.uint32))
            x = jnp.where(active, x_new, x)
            return (x, cursor), sym

        (_, _), syms = jax.lax.scan(
            step, (init, jnp.uint32(0)), jnp.arange(n_steps, dtype=jnp.uint32)
        )
        return syms.reshape(-1)  # [n_steps * L]

    rle_syms = jax.vmap(rans_one)(init_states, words, tab_sym, tab_freq, tab_bias, counts)

    def post_one(soa, n_tok, nr, nsm):
        if predictor == "zzd":
            return zzd_inverse_device(soa, width, strip_h)
        tokens, _nt = soa_rle_expand_device(
            soa.astype(jnp.int32), nr, nsm, jnp.int32(mid_count), max_runs, max_tokens
        )
        # tokens[0] is the fused pipeline's maxValue token; pixels follow.
        vals, is_raw = parse_escaped_device(
            tokens[1:], n_tok - 1, jnp.int32(delim), width * strip_h
        )
        if predictor == "avg":
            return avg_delta_inverse_device(
                vals, is_raw, jnp.int32(delim >> 1), width, strip_h
            )
        return zz_delta_inverse_device(vals, is_raw, jnp.int32(0), width, strip_h)

    pixels = jax.vmap(post_one)(rle_syms, n_tokens, n_runs, n_same)
    return pixels  # [S, width*strip_h] uint16


_decode_strip_batch = partial(jax.jit, static_argnames=(
    "table_log", "n_steps", "width", "strip_h", "max_runs", "max_tokens",
    "mid_count", "delim", "predictor",
))(decode_strip_batch_impl)


def build_strip_batch(parsed, strips, table_log, pad_strips_to: int = 0):
    """Pad a group of same-tableLog parsed MICT strips to common shapes.

    Returns ``(arrays, meta)`` where arrays = (init, words, ts, tf, tb,
    counts, n_tokens, n_runs, n_same) and meta = dict(n_steps, max_runs,
    max_tokens).  ``pad_strips_to`` appends replicas of strip 0 so the
    batch divides a mesh size.
    """
    S = len(parsed)
    L = parsed[0][0]
    counts = np.array([p[2] for p in parsed], dtype=np.int32)
    n_tokens = np.array([m[2] for m in strips], dtype=np.int32)
    n_runs = np.array([m[3] for m in strips], dtype=np.int32)
    n_same = np.array([m[4] for m in strips], dtype=np.int32)
    n_steps = int(max((c + L - 1) // L for c in counts))
    w_max = int(max(len(p[4]) for p in parsed)) + 1
    S_pad = max(S, pad_strips_to)
    ts = np.zeros((S_pad, 1 << table_log), dtype=np.uint16)
    tf = np.ones((S_pad, 1 << table_log), dtype=np.uint32)
    tb = np.zeros((S_pad, 1 << table_log), dtype=np.uint32)
    init = np.zeros((S_pad, L), dtype=np.uint32)
    words = np.zeros((S_pad, w_max), dtype=np.uint32)
    for i, (Lp, tl, count, states, wrds, norm, _sl) in enumerate(parsed):
        sym, fs, bs, _, _ = device_tables(norm, tl)
        ts[i], tf[i], tb[i] = sym, fs, bs
        init[i] = states
        words[i, : len(wrds)] = wrds
    if S_pad > S:
        pad = S_pad - S
        counts = np.concatenate([counts, np.full(pad, counts[0], np.int32)])
        n_tokens = np.concatenate([n_tokens, np.full(pad, n_tokens[0], np.int32)])
        n_runs = np.concatenate([n_runs, np.full(pad, n_runs[0], np.int32)])
        n_same = np.concatenate([n_same, np.full(pad, n_same[0], np.int32)])
        ts[S:] = ts[0]
        tf[S:] = tf[0]
        tb[S:] = tb[0]
        init[S:] = init[0]
        words[S:] = words[0]
    meta = {
        "n_steps": n_steps,
        "max_runs": int(_round_up(int(n_runs.max()) + 1, 128)),
        "max_tokens": int(_round_up(int(n_tokens.max()) + 1, 128)),
    }
    return (init, words, ts, tf, tb, counts, n_tokens, n_runs, n_same), meta


def micw_decompress_device(blob: bytes) -> tuple[np.ndarray, int, int]:
    """Decode a MICW container in one fused device program (strips grouped
    by tableLog).  Returns (pixels, width, height)."""
    width, height, num_strips, strip_h, max_value, predictor, _lanes, strips = micw_parse(blob)
    _thr, delim = delta_params(max_value)
    mid = _rle_mid(max_value)

    out = np.empty(width * height, dtype=np.uint16)
    parsed = {}
    groups: dict[int, list[int]] = {}
    for i, st in enumerate(strips):
        if st[5] == STRIP_MODE_RAW:
            y0 = i * strip_h
            sh = min(strip_h, height - y0)
            out[y0 * width : (y0 + sh) * width] = np.frombuffer(
                st[0], dtype="<u2", count=width * sh
            )
            continue
        p = mict_parse(st[0])
        parsed[i] = p
        groups.setdefault(p[1], []).append(i)
    for g_tl, idxs in groups.items():
        arrays, meta = build_strip_batch(
            [parsed[i] for i in idxs], [strips[i] for i in idxs], g_tl
        )
        sub = _decode_strip_batch(
            *[jnp.asarray(a) for a in arrays],
            table_log=g_tl,
            n_steps=meta["n_steps"],
            width=width,
            strip_h=strip_h,
            max_runs=meta["max_runs"],
            max_tokens=meta["max_tokens"],
            mid_count=mid,
            delim=delim,
            predictor=predictor,
        )
        sub = np.asarray(sub)
        for j, i in enumerate(idxs):
            y0 = i * strip_h
            sh = min(strip_h, height - y0)
            out[y0 * width : (y0 + sh) * width] = sub[j][: sh * width]
    return out, width, height


def micw_decompress_host(blob: bytes) -> tuple[np.ndarray, int, int]:
    """Host (numpy) MICW decoder — cross-checks the device path."""
    from ..ops.predictors import parse_escaped, predictor_decode
    from .device_rans import mict_decode_numpy

    width, height, num_strips, strip_h, max_value, predictor, _lanes, strips = micw_parse(blob)
    _thr, delim = delta_params(max_value)
    mid = _rle_mid(max_value)
    kind = "zz" if predictor == "zz" else "avg"
    out = np.empty(width * height, dtype=np.uint16)
    for i, (b, _n_soa, n_tok, n_runs, n_same, mode) in enumerate(strips):
        y0 = i * strip_h
        sh = min(strip_h, height - y0)
        if mode == STRIP_MODE_RAW:
            out[y0 * width : (y0 + sh) * width] = np.frombuffer(b, dtype="<u2", count=width * sh)
            continue
        if predictor == "zzd":
            syms = mict_decode_numpy(b)[: width * sh].astype(np.uint16)
            u = syms.astype(np.uint32)
            dz = ((u >> 1) ^ (-(u & 1) & 0xFFFFFFFF)).astype(np.uint16).astype(np.int64)
            img = np.cumsum(dz.reshape(sh, width), axis=1) & 0xFFFF
            out[y0 * width : (y0 + sh) * width] = img.astype(np.uint16).ravel()
            continue
        soa = mict_decode_numpy(b)
        tokens = soa_expand(soa, n_runs, n_same, mid)
        if len(tokens) != n_tok:
            raise ValueError("micw: token count mismatch")
        values, is_raw = parse_escaped(tokens[1:], delim, width * sh)
        out[y0 * width : (y0 + sh) * width] = predictor_decode(
            values, is_raw, width, sh, int(tokens[0]), kind
        ).ravel()
    return out, width, height


def micw_decode_batch(blobs: list[bytes]) -> list[np.ndarray]:
    """Decode many MICW containers in as few fused device programs as
    possible — the serving path.  Strips from all images are pooled and
    grouped by (tableLog, width, strip_h); each group runs as one batched
    device call.  Returns the pixel array for each input blob.

    This is the TPU analog of a multi-core decode farm: the batch axis
    does what the reference's goroutine/pthread pools do
    (parallelstrips.go:292-321, mic_parallel.c).
    """
    metas = []
    pool: dict[tuple, list] = {}
    for bi, blob in enumerate(blobs):
        width, height, num_strips, strip_h, max_value, predictor, _lanes, strips = micw_parse(blob)
        mid = _rle_mid(max_value)
        _thr, delim = delta_params(max_value)
        metas.append((width, height, num_strips, strip_h))
        for si, strip in enumerate(strips):
            if strip[5] == STRIP_MODE_RAW:
                pool.setdefault("raw", []).append((bi, si, None, strip))
                continue
            p = mict_parse(strip[0])
            key = (p[1], width, strip_h, mid, delim, predictor)
            pool.setdefault(key, []).append((bi, si, p, strip))

    outs = [np.empty(m[0] * m[1], dtype=np.uint16) for m in metas]
    for key, items in pool.items():
        if key == "raw":
            for bi, si, _p, st in items:
                w, h, _n, sh = metas[bi]
                y0 = si * sh
                rows = min(sh, h - y0)
                outs[bi][y0 * w : (y0 + rows) * w] = np.frombuffer(
                    st[0], dtype="<u2", count=w * rows
                )
            continue
        tl, width, strip_h, mid, delim, predictor = key
        parsed = [it[2] for it in items]
        strips = [it[3] for it in items]
        arrays, meta = build_strip_batch(parsed, strips, tl)
        sub = _decode_strip_batch(
            *[jnp.asarray(a) for a in arrays],
            table_log=tl,
            n_steps=meta["n_steps"],
            width=width,
            strip_h=strip_h,
            max_runs=meta["max_runs"],
            max_tokens=meta["max_tokens"],
            mid_count=mid,
            delim=delim,
            predictor=predictor,
        )
        sub = np.asarray(sub)
        for j, (bi, si, _p, _s) in enumerate(items):
            w, h, _n, sh = metas[bi]
            y0 = si * sh
            rows = min(sh, h - y0)
            outs[bi][y0 * w : (y0 + rows) * w] = sub[j][: rows * w]
    return outs


def micw_decompress_device_pallas(blob: bytes) -> tuple[np.ndarray, int, int]:
    """MICW decode with the Pallas rANS kernel for the entropy stage
    (requires 128 lanes/strip; falls back to the lax.scan path otherwise).
    The post stages (SoA expand, escape parse, predictor inverse) run as
    the jitted XLA program."""
    from .pallas_rans import (
        build_packed_tables,
        build_pallas_tables,
        rans_decode_pallas,
        rans_decode_pallas_packed,
        rans_decode_pallas_zzd,
    )

    width, height, num_strips, strip_h, max_value, predictor, lanes, strips = micw_parse(blob)
    if lanes != 128 or any(st[5] != STRIP_MODE_MICT for st in strips):
        return micw_decompress_device(blob)
    _thr, delim = delta_params(max_value)
    mid = _rle_mid(max_value)
    parsed = [mict_parse(st[0]) for st in strips]
    tl = max(p[1] for p in parsed)
    S = len(parsed)
    packed = build_packed_tables(parsed, tl)
    if packed is not None and predictor == "zzd" and width % 128 == 0:
        # Fully-fused path: the kernel emits pixels directly.
        init, tpk, alpha, words, mask, shift, counts, steps, asweep = packed
        ws = np.full((S, 128), width // 128, np.uint32)
        pix = rans_decode_pallas_zzd(
            *[jnp.asarray(a) for a in (init, tpk, alpha, words, mask, shift, ws)],
            steps=steps, n_strips=S, table_log=tl, asweep=asweep,
        )
        sub = np.asarray(pix).reshape(S, -1)
        out = np.empty(width * height, dtype=np.uint16)
        for i in range(num_strips):
            y0 = i * strip_h
            sh = min(strip_h, height - y0)
            out[y0 * width : (y0 + sh) * width] = sub[i][: sh * width]
        return out, width, height
    if packed is not None:
        init, tpk, alpha, words, mask, shift, counts, steps, asweep = packed
        rle_syms = rans_decode_pallas_packed(
            *[jnp.asarray(a) for a in (init, tpk, alpha, words, mask, shift)],
            steps=steps, n_strips=S, table_log=tl, asweep=asweep,
        )
    else:
        init, tsym, tfb, words, mask, shift, counts, steps = build_pallas_tables(parsed, tl)
        rle_syms = rans_decode_pallas(
            *[jnp.asarray(a) for a in (init, tsym, tfb, words, mask, shift)],
            steps=steps, n_strips=S, table_log=tl,
        )
    rle_flat = rle_syms.reshape(S, -1)  # kernel emits [S, steps, 128]
    n_tokens = np.array([st[2] for st in strips], dtype=np.int32)
    n_runs = np.array([st[3] for st in strips], dtype=np.int32)
    n_same = np.array([st[4] for st in strips], dtype=np.int32)
    max_runs = int(_round_up(int(n_runs.max()) + 1, 128))
    max_tokens = int(_round_up(int(n_tokens.max()) + 1, 128))
    out_dev = _micw_post_batch(
        rle_flat,
        jnp.asarray(n_tokens),
        jnp.asarray(n_runs),
        jnp.asarray(n_same),
        width=width,
        strip_h=strip_h,
        max_runs=max_runs,
        max_tokens=max_tokens,
        mid_count=mid,
        delim=delim,
        predictor=predictor,
    )
    sub = np.asarray(out_dev)
    out = np.empty(width * height, dtype=np.uint16)
    for i in range(num_strips):
        y0 = i * strip_h
        sh = min(strip_h, height - y0)
        out[y0 * width : (y0 + sh) * width] = sub[i][: sh * width]
    return out, width, height


@partial(jax.jit, static_argnames=(
    "width", "strip_h", "max_runs", "max_tokens", "mid_count", "delim", "predictor",
))
def _micw_post_batch(
    rle_syms, n_tokens, n_runs, n_same, *,
    width, strip_h, max_runs, max_tokens, mid_count, delim, predictor="zz",
):
    """Post-entropy stages as one jitted program, vmapped over strips."""
    def post_one(soa, n_tok, nr, nsm):
        if predictor == "zzd":
            return zzd_inverse_device(soa, width, strip_h)
        tokens, _nt = soa_rle_expand_device(
            soa.astype(jnp.int32), nr, nsm, jnp.int32(mid_count), max_runs, max_tokens
        )
        vals, is_raw = parse_escaped_device(
            tokens[1:], n_tok - 1, jnp.int32(delim), width * strip_h
        )
        if predictor == "avg":
            return avg_delta_inverse_device(vals, is_raw, jnp.int32(delim >> 1), width, strip_h)
        return zz_delta_inverse_device(vals, is_raw, jnp.int32(0), width, strip_h)

    return jax.vmap(post_one)(rle_syms, n_tokens, n_runs, n_same)


def micw_decode_many(blobs):
    """Decode MANY MICW images in ONE fused kernel launch (the decode-
    service path: a batch of studies lands, every strip of every image
    rides the same Pallas program; images may have different widths,
    heights and table statistics).

    Eligibility per image: zzd predictor, 128 lanes, width % 128 == 0,
    all strips MICT with tableLog <= 11 and alphabet <= 1024.  Ineligible
    images fall back to micw_decompress_device_pallas individually.
    Returns a list of (pixels, width, height), blob-order.

    The TPU-first answer to the reference's decode-side thread pools
    (parallelstrips.go workers, mic_parallel.c pthreads): the batch axis
    IS the parallelism — no queues, no workers, one launch.
    """
    from .pallas_rans import build_packed_tables, rans_decode_pallas_zzd

    metas = []          # per image: (width, height, num_strips, strip_h, strip_keys)
    buckets = {}        # steps-bucket -> [(key, parsed, width)]
    results = [None] * len(blobs)
    for bi, blob in enumerate(blobs):
        width, height, num_strips, strip_h, _mv, predictor, lanes, strips = micw_parse(blob)
        if (
            predictor != "zzd" or lanes != 128 or width % 128 != 0
            or any(st[5] != STRIP_MODE_MICT for st in strips)
        ):
            metas.append(None)
            continue
        keys = []
        for si, st in enumerate(strips):
            p = mict_parse(st[0])
            # Bucket strips by padded step count (power of two, min 8):
            # strips of similar size share a launch, so small images don't
            # pad to the largest image's scan length and the word-margin
            # zeros stay small.  Few distinct buckets -> few compiles.
            need = max(8, -(-p[2] // 128))
            b = 8
            while b < need:
                b *= 2
            keys.append((b, len(buckets.setdefault(b, []))))
            buckets[b].append((p, width))
        metas.append((width, height, num_strips, strip_h, keys))

    decoded = {}  # bucket -> np.ndarray [n, steps*128]
    for b, entries in buckets.items():
        parsed = [e[0] for e in entries]
        tl = max(p[1] for p in parsed)
        packed = build_packed_tables(parsed, tl, min_steps=b)
        if packed is None:
            decoded[b] = None
            continue
        init, tpk, alpha, words, mask, shift, counts, steps, asweep = packed
        S = len(parsed)
        ws = np.zeros((S, 128), np.uint32)
        for i, (_p, w) in enumerate(entries):
            ws[i, :] = w // 128
        pix = rans_decode_pallas_zzd(
            *[jnp.asarray(a) for a in (init, tpk, alpha, words, mask, shift, ws)],
            steps=steps, n_strips=S, table_log=tl, asweep=asweep,
        )
        decoded[b] = np.asarray(pix).reshape(S, -1)

    for bi, m in enumerate(metas):
        if m is None or any(decoded.get(k[0]) is None for k in m[4]):
            results[bi] = micw_decompress_device_pallas(blobs[bi])
            continue
        width, height, num_strips, strip_h, keys = m
        out = np.empty(width * height, dtype=np.uint16)
        for i, (b, idx) in enumerate(keys):
            y0 = i * strip_h
            sh = min(strip_h, height - y0)
            out[y0 * width : (y0 + sh) * width] = decoded[b][idx][: sh * width]
        results[bi] = (out, width, height)
    return results
