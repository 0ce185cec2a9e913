"""MICW — the TPU-native parallel-strip container (v4, per-strip adaptive).

The device-format sibling of PICS/PICA (parallelstrips.go,
parallelstripsadaptive.go): images go through a per-strip choice of
predictor pipelines and the **wide-lane rANS** device entropy coder
(mic_tpu.tpu.device_rans) instead of byte-oriented tANS.  A whole batch
of strips/images decodes in ONE jitted device program; the strip axis
shards over a chip mesh with shard_map (mic_tpu.tpu.mesh).

TPU-first re-shapings relative to the host formats:

* **Wide-lane rANS** replaces bit-granular tANS (SURVEY.md §7's "wider-N
  stream variants"): 128×K vector lanes instead of 2/4/8 ILP states.
* **Structure-of-arrays RLE**: the RLE stream is stored as
  ``[counts][same-run values][literals]`` instead of interleaved blocks.
  Identical symbol multiset (same entropy cost), but run boundaries fall
  out of cumsums over the counts section — no header discovery, no
  pointer chasing on device.
* **Per-strip adaptive modes** (v4): the encoder tries zz-direct (no
  RLE — cheapest device inverse, fused into the Pallas kernel), zz+RLE
  and avg+RLE per strip and keeps the smallest — PICA's
  try-both-keep-smaller (parallelstripsadaptive.go:90-103) generalized
  to three pipelines.  Flat-background modalities (NM, US) take the RLE
  modes; smooth gradients take zz-direct.

Container layout::

    "MICW" | width u32 | height u32 | numStrips u32 | stripH u32
    maxValue u16 | flags u8 | lanes_log2 u8
    per strip: offset u32 | length u32 | nSoa u32 | nTokens u32 | nRuns u32 | nSame u32 | mode u32
    concatenated MICT entropy blobs (one per strip)

flags: bit0 avg, bit1 zzd (legacy global predictors for mode-0 strips),
bit2 adaptive (v4: strips carry their own mode).  Strip modes: 0 legacy
(global flags), 1 raw u16 pixels, 2 zzd, 3 zz+RLE, 4 avg+RLE.

Default geometry: ~64-row strips × 128 lanes — the lanes carry the
parallelism; strips exist to batch and to shard very large images.
"""

from __future__ import annotations

import os
import struct
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.fse import IncompressibleError, UseRLEError
from ..ops.predictors import delta_params
from ..ops.rle import soa_encode, soa_expand
from .device_rans import ALIAS_MAX_KEPT, mict_encode, mict_parse, slot_tables
from .pipeline import (
    avg_delta_inverse_device,
    pdd_inverse_device,
    vdd_inverse_device,
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
    "micw_band_info",
    "band_split",
    "band_merge",
    "decode_strip_batch_impl",
    "build_strip_batch",
    "strip_predictor",
    "MicwDecodePlan",
    "MICW_MAGIC",
    "MICW_BAND_W",
]

MICW_MAGIC = b"MICW"
MICW_HEADER = 24
MICW_ENTRY = 28
FLAG_AVG_PREDICTOR = 0x01
FLAG_DIRECT = 0x02  # zz-direct: no RLE, no escapes (mod-2^16 ZigZag diffs)
FLAG_ADAPTIVE = 0x04  # v4: per-strip predictor modes (PICA's trick,
#                       reference parallelstripsadaptive.go:90-103)
FLAG_RDENSE = 0x10  # v6: every r-mode strip's run stream is dense —
#                     same-runs >= RDENSE_MIN_SAME px (soa_encode
#                     min_same), so a 128-px output row spans <= 20 runs
#                     and the device expand kernel may use the
#                     32-candidate fast search (pallas_rans dense=True).
RDENSE_MIN_SAME = 16
FLAG_BANDED = 0x08  # v5: wide images split into MICW_BAND_W-wide column
#                     bands stacked vertically (pure pixel permutation);
#                     an 8-byte extension (orig_width u32, orig_height
#                     u32) follows the fixed header.  Keeps every strip's
#                     row width <= 512 so the compiled post-program
#                     family is shared across image widths.
STRIP_MODE_MICT = 0  # legacy: predictor from the global flags
STRIP_MODE_RAW = 1  # raw u16 pixels (entropy stage rejected the strip)
STRIP_MODE_ZZD = 2  # per-strip: zz-direct (no RLE)
STRIP_MODE_ZZ = 3  # per-strip: zz + SoA-RLE + escapes
STRIP_MODE_AVG = 4  # per-strip: avg + SoA-RLE + escapes
STRIP_MODE_CONST = 5  # constant strip: payload is ONE u16 value (the WSI
#                       constant-tile trick, wsiformat.go planeConstant)
STRIP_MODE_VDD = 6  # per-strip: vertical-direct (up-delta, no RLE)
STRIP_MODE_PDD = 7  # per-strip: plane-direct (W+N-NW delta, no RLE;
#                     inverse = two cumsums — the device ratio mode)
STRIP_MODE_ZZR = 8  # per-strip: zz-direct + SoA-RLE (no escapes)
STRIP_MODE_VDR = 9  # per-strip: vertical-direct + SoA-RLE
STRIP_MODE_PDR = 10  # per-strip: plane-direct + SoA-RLE
MAX_TABLE_LOG = 11  # decode-speed sweet spot: the packed kernel's table
# sweep is 2^tl/128 VPU rounds per 128-symbol step, the dominant decode
# cost.  tl<=11 measured +54% decode for -1.8% ratio vs tl<=12 on the
# honest macro-loop harness; tl<=10 LOSES speed (alphabets overflow
# 1024 slots and strips fall to slower paths).  Format still reads
# tl<=12 blobs (the packed-slot layout is bias<<12|rank).
MAX_ALPHABET = 4096  # packed-kernel cap (12-bit rank)
ALIAS_TABLE_LOG = 12  # alias-kernel tl cap: decode cost is tableLog-
# independent (3 bucket gathers/step), so alias blobs take the ratio
# benefit of tl=12 that the packed sweep gives up for speed.
MICW_BAND_W = 512  # column-band width for FLAG_BANDED containers
MID_DIRECT = 16383  # RLE midCount for the r-modes: the direct symbol
#                     alphabet is the full u16 range regardless of bit
#                     depth, so the midpoint is a format constant — which
#                     also makes the post-program family bit-depth-free.

_MODE_PRED = {
    STRIP_MODE_ZZD: "zzd",
    STRIP_MODE_ZZ: "zz",
    STRIP_MODE_AVG: "avg",
    STRIP_MODE_VDD: "vdd",
    STRIP_MODE_PDD: "pdd",
    STRIP_MODE_ZZR: "zzr",
    STRIP_MODE_VDR: "vdr",
    STRIP_MODE_PDR: "pdr",
}
_DIRECT_PREDS = ("zzd", "vdd", "pdd")  # no RLE, no escapes
_RLE_DIRECT_PREDS = ("zzr", "vdr", "pdr")  # SoA-RLE, no escapes
# Direct modes only: the fused/scan decode paths.  The r- (RLE'd
# direct) and escaped modes win ~4% ratio but their RLE-expand post
# program measures ~1000x slower than the fused kernels on the real
# chip (honest macro-loop harness) — they stay in "auto" for
# ratio-first use.
AUTO_FAST_TRIALS = ("zzd", "vdd", "pdd")
_DIRECT_SYMS = {}  # filled after the _*_syms helpers are defined
_PRED_MODE = {v: k for k, v in _MODE_PRED.items()}


def strip_predictor(global_pred: str, mode: int) -> str | None:
    """Effective predictor of one strip (None = raw or constant)."""
    if mode in (STRIP_MODE_RAW, STRIP_MODE_CONST):
        return None
    if mode == STRIP_MODE_MICT:
        return global_pred
    return _MODE_PRED[mode]


def _rle_mid(max_value: int) -> int:
    """MICW's RLE midCount: derived from the escape delimiter like the
    host formats, but floored at 127 — tiny midCounts (maxValue < 255)
    make the RLE state machine degenerate (see developer-guide.md)."""
    _thr, delim = delta_params(max_value)
    delim = max(int(delim), 255)
    return (1 << (delim.bit_length() - 1)) - 1


def _zzd_syms(strip_px: np.ndarray, width: int, sh: int) -> np.ndarray:
    """zz-direct symbols: per-row mod-2^16 ZigZag left-deltas (bijective,
    so no escapes and no RLE are needed)."""
    img = strip_px.reshape(sh, width).astype(np.int64)
    left = np.zeros_like(img)
    left[:, 1:] = img[:, :-1]
    d16 = (img - left).astype(np.uint16).astype(np.int16)
    return (
        ((d16.astype(np.int32) << 1) ^ (d16.astype(np.int32) >> 15)) & 0xFFFF
    ).astype(np.uint16).ravel()


def _vdd_syms(strip_px: np.ndarray, width: int, sh: int) -> np.ndarray:
    """Vertical-direct symbols: per-column mod-2^16 ZigZag up-deltas."""
    img = strip_px.reshape(sh, width).astype(np.int64)
    up = np.zeros_like(img)
    up[1:, :] = img[:-1, :]
    d16 = (img - up).astype(np.uint16).astype(np.int16)
    return (
        ((d16.astype(np.int32) << 1) ^ (d16.astype(np.int32) >> 15)) & 0xFFFF
    ).astype(np.uint16).ravel()


def _pdd_syms(strip_px: np.ndarray, width: int, sh: int) -> np.ndarray:
    """Plane-direct symbols: mod-2^16 ZigZag of the 2D difference
    p - W - N + NW (zero boundary).  The plane predictor W+N-NW is the
    same initial estimate the reference's gradient predictor clamps
    (deltagradcompressu16.go:149-166); kept unclamped here so the
    residual is an exact separable 2D difference, whose inverse is two
    prefix sums — fully parallel on device (pipeline.pdd_inverse_device)."""
    img = strip_px.reshape(sh, width).astype(np.int64)
    w = np.zeros_like(img)
    w[:, 1:] = img[:, :-1]
    n = np.zeros_like(img)
    n[1:, :] = img[:-1, :]
    nw = np.zeros_like(img)
    nw[1:, 1:] = img[:-1, :-1]
    d16 = (img - w - n + nw).astype(np.uint16).astype(np.int16)
    return (
        ((d16.astype(np.int32) << 1) ^ (d16.astype(np.int32) >> 15)) & 0xFFFF
    ).astype(np.uint16).ravel()


_DIRECT_SYMS.update({
    "zzd": _zzd_syms, "vdd": _vdd_syms, "pdd": _pdd_syms,
    "zzr": _zzd_syms, "vdr": _vdd_syms, "pdr": _pdd_syms,
})


def band_split(pixels: np.ndarray, width: int, height: int,
               band_w: int = MICW_BAND_W):
    """Split a wide image into vertically-stacked column bands (the PICS
    strip idea turned 90 degrees, parallelstrips.go:31-39): a (h, B*bw)
    image becomes a (B*h, bw) image, band b occupying rows [b*h, (b+1)*h).
    Pure pixel permutation — every per-strip predictor stays valid, and
    64-row strip boundaries align with band seams whenever h % 64 == 0,
    so the ratio cost is zero there."""
    bands = width // band_w
    img = np.asarray(pixels, dtype=np.uint16).reshape(height, width)
    stacked = img.reshape(height, bands, band_w).transpose(1, 0, 2)
    return np.ascontiguousarray(stacked).reshape(-1), band_w, bands * height


def band_merge(stacked: np.ndarray, band_w: int, orig_w: int, orig_h: int) -> np.ndarray:
    """Inverse of :func:`band_split`."""
    bands = orig_w // band_w
    img = np.asarray(stacked, dtype=np.uint16).reshape(bands, orig_h, band_w)
    return np.ascontiguousarray(img.transpose(1, 0, 2)).reshape(-1)


def _escaped_tokens(strip_px, width, sh, max_value, pred) -> np.ndarray:
    """Escaped residual token stream INCLUDING the leading maxValue word
    (the fused Delta+RLE layout, deltarlecompressu16.go:24-67)."""
    from ..ops.predictors import _interleave_escapes, predictor_encode, zigzag

    thr, delim = delta_params(max_value)
    if pred == "zz":
        img = np.asarray(strip_px, dtype=np.uint16).reshape(sh, width)
        p = img.astype(np.int64)
        left = np.zeros_like(p)
        left[:, 1:] = p[:, :-1]
        diff = p - left
        escape = np.abs(diff) >= thr
        stream = _interleave_escapes(
            zigzag(diff.astype(np.int16)).ravel(), img.ravel(), escape.ravel(), delim
        )
    else:
        stream = predictor_encode(strip_px, width, sh, max_value, "avg")
    return np.concatenate(
        [np.array([max_value], dtype=np.uint16), stream.astype(np.uint16)]
    )


def _encode_candidate(syms: np.ndarray, lanes: int, max_bytes: int | None = None,
                      alias: bool = False, counts: np.ndarray | None = None):
    """mict_encode with the packed-kernel eligibility guard; returns None
    when the strip should fall through to other candidates / raw.
    ``alias=True`` writes the FF 41 alias-mapped variant instead — its
    decode cost is tableLog-independent (3 bucket gathers/step), so it
    affords tl<=12 where the packed sweep is capped at 11.  ``counts``
    reuses the estimator's bincount (one stream scan per candidate)."""
    try:
        return mict_encode(syms, lanes=lanes,
                           max_table_log=ALIAS_TABLE_LOG if alias else MAX_TABLE_LOG,
                           max_bytes=max_bytes, alias=alias, counts=counts)
    except (IncompressibleError, UseRLEError, ValueError):
        return None


def _estimate_bytes(syms: np.ndarray, alias: bool = False,
                    counts: np.ndarray | None = None) -> float:
    """Zeroth-order entropy size estimate for ranking candidates (the
    rANS stream is within ~1% of H0 at these table sizes; the ncount
    header scales with the alphabet).  Returns +inf for packed-kernel-
    ineligible alphabets so they never outrank an eligible candidate.
    For alias streams, alphabets beyond the 255 kept symbols fold into
    ESC + a 2-byte/occurrence side stream (mict_encode_alias), so the
    estimate models the folded distribution instead of going infinite."""
    if counts is None:
        counts = np.bincount(syms)
    nz = counts[counts > 0]
    n = len(syms)
    if alias and len(nz) > ALIAS_MAX_KEPT:
        kept = np.sort(nz)[::-1][:ALIAS_MAX_KEPT].astype(np.int64)
        esc = n - int(kept.sum())
        parts = np.concatenate([kept, [esc]]) if esc else kept
        p = parts / n
        h_bits = float(-(p * np.log2(p)).sum()) * n
        return h_bits / 8 + 1.2 * len(parts) + 2.0 * esc
    if len(nz) > (MAX_ALPHABET if not alias else 65536):
        return float("inf")
    p = nz / n
    h_bits = float(-(p * np.log2(p)).sum()) * n
    return h_bits / 8 + 1.2 * len(nz)  # ~ncount header cost per symbol


def _trials_for(predictor: str) -> list[str]:
    """Trial set for a predictor spec (shared by the host and device
    encoders — see micw_compress for the rationale per set)."""
    if predictor == "auto":
        return ["zzd", "vdd", "pdd", "zzr", "vdr", "pdr", "zz", "avg"]
    if predictor == "auto-r":
        # Direct + RLE'd-direct trial set: the ratio-at-speed candidate
        # (corpus geomean 3.286 with entropy="best" vs 3.117 for
        # auto-fast) — still escape-free and bit-depth-free, but r-mode
        # strips pay the SoA-RLE expand post program on decode.
        return list(_DIRECT_PREDS) + list(_RLE_DIRECT_PREDS)
    if predictor == "auto-fast":
        # Scan-parallel AND program-family-free modes only: avg's decode
        # needs the anti-diagonal wavefront post program (serial in
        # 2*height+width steps) and zz's escape-resolution post is both
        # bit-depth-specific (mid/delim statics) and a multi-minute XLA
        # compile on the service backend — the direct and r- (RLE'd
        # direct) modes invert with prefix scans and share one compiled
        # family across all bit depths.
        return list(AUTO_FAST_TRIALS)
    if predictor in _MODE_PRED.values():
        return [predictor]
    raise ValueError(f"micw: unknown predictor {predictor!r}")


def _strip_candidates(strip_px, width, sh, max_value, mid, trials, entropy):
    """Phase 1 of strip encoding: the ranked candidate streams
    [(est, syms, counts, meta, mode)], sorted by the H0 size estimate.
    Shared by the host encoder (micw_compress) and the device batch
    encoder (pallas_enc.micw_compress_device_many) so candidate
    generation can never drift between the two."""
    candidates = []  # (estimate, syms, counts, meta, mode)
    direct_cache = {}

    def direct_syms(key):
        # NOT dict.setdefault: that evaluates the transform eagerly
        # even on a cache hit, doubling every direct predictor pass
        # in the auto-r/auto trial sets.
        if key not in direct_cache:
            direct_cache[key] = _DIRECT_SYMS[key](strip_px, width, sh)
        return direct_cache[key]

    for pred in trials:
        if pred in _DIRECT_PREDS:
            syms = direct_syms(pred)
            meta = (len(syms), len(syms), 0, 0)
        elif pred in _RLE_DIRECT_PREDS:
            base = direct_syms({"zzr": "zzd", "vdr": "vdd",
                                "pdr": "pdd"}[pred])
            # Dense grammar (FLAG_RDENSE): same-runs >= 16 px.  Slightly
            # BETTER ratio than min-run 3 (short same-runs cost two
            # run-table symbols to save <= 16 literals and widen the
            # count alphabet) and it bounds runs/row for the fast
            # device expand (measured on CT1/MR3/MR4/XA1: geomean
            # 3.896 dense vs 3.862 legacy).
            syms, n_runs, n_same = soa_encode(base, MID_DIRECT,
                                              min_same=RDENSE_MIN_SAME)
            meta = (len(syms), len(base), n_runs, n_same)
        else:
            tokens = _escaped_tokens(strip_px, width, sh, max_value, pred)
            syms, n_runs, n_same = soa_encode(tokens, mid)
            meta = (len(syms), len(tokens), n_runs, n_same)
        # "best" must keep wide-alphabet candidates standard would
        # drop: alias can escape-fold them (the standard encode then
        # simply returns None for those and alias wins the strip).
        cnts = np.bincount(syms)
        est = _estimate_bytes(syms, alias=entropy in ("alias", "best"),
                              counts=cnts)
        if est != float("inf"):  # keep the strip packed-kernel eligible
            candidates.append((est, syms, cnts, meta, _PRED_MODE[pred]))
    # Rank by the H0 estimate and entropy-encode only the top five —
    # the estimate tracks each stream's size to ~1% but is blind to
    # the fixed per-blob overhead (init states + ncount width), so a
    # narrow prune can drop the true winner when short RLE'd streams
    # compete with direct ones.
    candidates.sort(key=lambda c: c[0])
    return candidates


def _strip_requests(candidates, n_trials, entropy):
    """Every (candidate_idx, alias) pair :func:`_strip_select` may ask
    its encoder for — the device batch encoder pre-encodes exactly this
    set, so the selection below sees the same blobs either way."""
    use_alias = entropy == "alias"
    direct_modes = {_PRED_MODE[p] for p in _DIRECT_PREDS}
    reqs = set()
    for i in range(min(5 if n_trials > 1 else 1, len(candidates))):
        reqs.add((i, use_alias))
        if entropy == "best":
            reqs.add((i, True))
    if _r_margin() > 0.0:
        for i, c in enumerate(candidates):
            if c[4] in direct_modes:
                reqs.add((i, use_alias))
                if entropy == "best":
                    reqs.add((i, True))
    return sorted(reqs)


def _strip_select(candidates, strip_px, n_trials, entropy, enc):
    """Phase 2 of strip encoding: pick the winning blob.  ``enc(i,
    alias)`` returns candidate i's encoded bytes or None (sentinel
    failure / over the raw-size budget).  Selection is size-first with
    the "best" dual encode, the MICW_R_MARGIN decode-cost guard and the
    raw fallback (the WSI planeRaw analog)."""
    use_alias = entropy == "alias"
    best = best_direct = None  # (len, blob, meta, mode)
    direct_modes = {_PRED_MODE[p] for p in _DIRECT_PREDS}

    def enc_best(i):
        blob = enc(i, use_alias)
        if entropy == "best":
            blob_a = enc(i, True)
            if blob_a is not None and (blob is None or len(blob_a) < len(blob)):
                blob = blob_a
        return blob

    for i, (_est, _syms, _cnts, meta, mode) in enumerate(
            candidates[: 5 if n_trials > 1 else 1]):
        blob = enc_best(i)
        if blob is None:
            continue
        if best is None or len(blob) < best[0]:
            best = (len(blob), blob, meta, mode)
        if mode in direct_modes and (best_direct is None
                                     or len(blob) < best_direct[0]):
            best_direct = (len(blob), blob, meta, mode)
    # Decode-cost-aware selection (MICW_R_MARGIN, default 0 = pure
    # size): non-direct winners (r-modes / classic RLE) pay the
    # SoA-RLE expand post program on decode, so the capture can
    # demand they be at least margin-fraction smaller than the best
    # direct candidate before taking the slower family.
    margin = _r_margin()
    if (best is not None and best_direct is None and margin > 0.0
            and best[3] not in direct_modes):
        # The top-5 H0 prune (or a failed standard encode) can drop
        # every direct candidate; the margin contract needs a direct
        # comparator, so encode the best-estimated one explicitly.
        for i, (_est, _syms, _cnts, meta, mode) in enumerate(candidates):
            if mode not in direct_modes:
                continue
            blob = enc_best(i)
            if blob is not None:
                best_direct = (len(blob), blob, meta, mode)
                break
    if (best is not None and best_direct is not None
            and best[3] not in direct_modes and margin > 0.0
            and best[0] > (1.0 - margin) * best_direct[0]):
        best = best_direct
    raw = strip_px.astype("<u2").tobytes()
    if best is None or best[0] >= len(raw):
        # Raw fallback — the MICW analog of the WSI planeRaw path
        # (constant or incompressible strips).
        n = len(strip_px)
        return raw, (n, n, 0, 0, STRIP_MODE_RAW)
    return best[1], (*best[2], best[3])


def micw_compress(
    pixels,
    width: int,
    height: int,
    max_value: int,
    num_strips: int = 0,
    lanes: int = 128,
    predictor: str = "auto-fast",
    entropy: str = "standard",
) -> bytes:
    """Compress into MICW.  Encoding is host-side (vectorized numpy; the
    TPU encode path is tpu.pallas_enc.micw_compress_device).

    predictor "auto-fast" (default, v5): per strip, try zzd / vdd /
    pdd / zz+RLE, keep the smallest — all scan-parallel on decode
    (corpus geomean 3.25 vs 3.131 without pdd, 2.966 fixed zzd).
    "auto" adds avg+RLE but its decode needs the anti-diagonal wavefront
    post program, which caps device batch throughput — the ratio format
    for that tradeoff is the byte-compatible host family, not MICW.
    Fixed "zzd"/"vdd"/"pdd"/"zz"/"avg" force one pipeline.

    Images wider than MICW_BAND_W whose width divides into equal bands
    are stored banded (FLAG_BANDED): column bands stacked vertically, so
    every strip row is <= 512 wide and all images share one compiled
    decode-program family.

    entropy "standard" writes FF 57 strips (packed-kernel decode, tl<=11);
    "alias" writes FF 41 alias-mapped strips whose Pallas decode is
    tableLog-independent (3 bucket gathers/step) — it affords tl<=12 and
    collapses the decode-program family across table logs.  "best"
    encodes each winning candidate both ways and keeps the smaller strip
    blob (mixed containers decode in one plan; 2x entropy-encode cost).
    """
    if entropy not in ("standard", "alias", "best"):
        raise ValueError(f"micw: unknown entropy {entropy!r}")
    use_alias = entropy == "alias"
    pixels = np.asarray(pixels, dtype=np.uint16)
    if len(pixels) != width * height:
        raise ValueError("micw: pixel count mismatch")
    orig_w, orig_h = width, height
    banded = width > MICW_BAND_W and width % MICW_BAND_W == 0
    if banded:
        pixels, width, height = band_split(pixels, width, height)
    if num_strips <= 0:
        # Default geometry: ~128-row strips.  Each strip pays a fixed
        # overhead (128 u32 init states + its ncount header, ~0.6-1 KB);
        # 128 rows halves that per pixel vs 64 and measured +2.2% corpus
        # geomean (3.236 -> 3.306) with the same per-symbol decode work.
        # Banded images scale strip height by the band count so strips
        # keep the same pixel count as the unbanded layout.
        rows = 128 * (orig_w // width if banded else 1)
        num_strips = max(1, height // rows)
    num_strips = max(1, min(num_strips, height))
    strip_h = (height + num_strips - 1) // num_strips
    actual = (height + strip_h - 1) // strip_h
    mid = _rle_mid(max_value)
    trials = _trials_for(predictor)

    def encode_strip(s):
        y0 = s * strip_h
        y1 = min(y0 + strip_h, height)
        sh = y1 - y0
        strip_px = pixels[y0 * width : y1 * width]
        if strip_px[0] == strip_px.max() and strip_px[0] == strip_px.min():
            # Constant strip: 2-byte payload (WSI planeConstant trick) —
            # far below any entropy stream's fixed init-state overhead.
            return strip_px[:1].astype("<u2").tobytes(), (0, 0, 0, 0, STRIP_MODE_CONST)
        candidates = _strip_candidates(strip_px, width, sh, max_value, mid,
                                       trials, entropy)

        def enc(i, alias):
            return _encode_candidate(candidates[i][1], lanes,
                                     max_bytes=strip_px.nbytes, alias=alias,
                                     counts=candidates[i][2])

        return _strip_select(candidates, strip_px, len(trials), entropy, enc)

    # Strips encode independently; measured sequential (a thread pool
    # bought nothing here — the GIL serializes the numpy share and only
    # the native lane-encode call releases it, ~45% of strip time).
    results = [encode_strip(s) for s in range(actual)]
    blobs = [r[0] for r in results]
    metas = [r[1] for r in results]

    out = bytearray()
    out += MICW_MAGIC
    out += struct.pack("<IIII", width, height, actual, strip_h)
    flags = FLAG_ADAPTIVE | {"avg": FLAG_AVG_PREDICTOR, "zzd": FLAG_DIRECT}.get(
        predictor, 0
    )
    if banded:
        flags |= FLAG_BANDED
    r_modes = {_PRED_MODE[p] for p in _RLE_DIRECT_PREDS}
    if any(m[4] in r_modes for m in metas):
        flags |= FLAG_RDENSE
    out += struct.pack("<HBB", max_value, flags, int(np.log2(lanes)))
    if banded:
        out += struct.pack("<II", orig_w, orig_h)
    offset = 0
    for blob, (n_soa, n_tok, n_runs, n_same, mode) in zip(blobs, metas):
        out += struct.pack("<IIIIIII", offset, len(blob), n_soa, n_tok, n_runs, n_same, mode)
        offset += len(blob)
    return bytes(out) + b"".join(blobs)


def micw_band_info(blob: bytes):
    """(orig_width, orig_height) of a FLAG_BANDED container, else None.
    Decode pipelines run entirely in the stacked band space (what
    micw_parse reports); only the user-facing decompress functions
    un-band via band_merge."""
    if len(blob) < MICW_HEADER or blob[:4] != MICW_MAGIC:
        raise ValueError("micw: invalid magic")
    flags = blob[22]
    if not flags & FLAG_BANDED:
        return None
    if len(blob) < MICW_HEADER + 8:
        raise ValueError("micw: truncated banded extension")
    return struct.unpack_from("<II", blob, MICW_HEADER)


def _unband(pixels: np.ndarray, width: int, height: int, blob: bytes):
    info = micw_band_info(blob)
    if info is None:
        return pixels, width, height
    ow, oh = info
    return band_merge(pixels, width, ow, oh), ow, oh


def micw_parse(blob: bytes):
    if len(blob) < MICW_HEADER or blob[:4] != MICW_MAGIC:
        raise ValueError("micw: invalid magic")
    width, height, num_strips, strip_h = struct.unpack_from("<IIII", blob, 4)
    max_value, flags, lanes_log2 = struct.unpack_from("<HBB", blob, 20)
    hdr = MICW_HEADER
    if flags & FLAG_BANDED:
        hdr += 8  # orig_width/orig_height extension (see micw_band_info)
    if len(blob) < hdr + num_strips * MICW_ENTRY:
        raise ValueError("micw: truncated strip table")
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


def _stack_dev(arrs, pad_axis=None):
    """Stack per-chunk operand arrays and move them to device, h2d'ing
    each UNIQUE array (by identity) once.  Replicated plans ([blob]*k)
    repeat chunk operands — all-identical when the strips-per-image
    period divides the chunk size (h2d one + device broadcast), a short
    cycle when it doesn't (e.g. MR2: 6 strips/image over 32-entry
    chunks repeats every 3 chunks; the old all-or-nothing check fell
    through to a full 213 MB tunnel h2d — VERDICT r4 #4).  General
    form: one h2d of the unique set + a device-side gather."""
    n = len(arrs)
    uniq, pattern, index = [], [], {}
    for a in arrs:
        k = id(a)
        if k not in index:
            index[k] = len(uniq)
            uniq.append(a)
        pattern.append(index[k])
    if pad_axis is not None:
        m = max(a.shape[pad_axis] for a in uniq)
        out = []
        for a in uniq:
            if a.shape[pad_axis] == m:
                out.append(a)
                continue
            pad = [(0, 0)] * a.ndim
            pad[pad_axis] = (0, m - a.shape[pad_axis])
            out.append(np.pad(a, pad))
        uniq = out
    if len(uniq) == 1 and n > 1:
        base = jnp.asarray(uniq[0])
        return jnp.broadcast_to(base[None], (n,) + base.shape)
    if len(uniq) < n:
        base = jnp.asarray(np.stack(uniq))
        return base[np.asarray(pattern)]
    return jnp.asarray(np.stack(uniq))


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _runs_floor(pred: str, width: int, strip_h: int) -> int:
    """Floor for the r-modes' run-count bucket: px/64, pow2.  Image
    statistics put the natural pow2 bucket within 2x of this for real
    medical strips, so flooring makes every image of a geometry share
    ONE compiled post program (the run operands pad by at most ~2x,
    which is noise next to the token arrays)."""
    if pred not in _RLE_DIRECT_PREDS:
        return 0
    return 128 * _pow2_at_least((width * strip_h) // 8192, 1)


def _post_params(pred: str, mid: int, delim: int) -> tuple[int, int]:
    """(mid_count, delim) as static post-program args: the direct modes
    use neither (zeroed), the r-modes use the format constant MID_DIRECT
    — both collapse the compiled-executable family across bit depths."""
    if pred in _DIRECT_PREDS:
        return 0, 0
    if pred in _RLE_DIRECT_PREDS:
        return MID_DIRECT, 0
    return mid, delim


def _post_one_strip(soa, n_tok, nr, nsm, *, width, strip_h, max_runs,
                    max_tokens, mid_count, delim, predictor):
    """Post-entropy stage of ONE strip (direct inverse / SoA-RLE expand +
    direct inverse / escaped-residual inversion) — the single shared
    implementation behind decode_strip_batch_impl and _micw_post_batch
    (a third hand-synced copy of this dispatch once hid a midCount bug,
    see micw_decode_batch)."""
    if predictor == "zzd":
        return zzd_inverse_device(soa, width, strip_h)
    if predictor == "vdd":
        return vdd_inverse_device(soa, width, strip_h)
    if predictor == "pdd":
        return pdd_inverse_device(soa, width, strip_h)
    if predictor in _RLE_DIRECT_PREDS:
        # SoA-RLE over bijective direct symbols: expand, then the base
        # direct inverse — no escapes, scan-parallel throughout.
        tokens, _nt = soa_rle_expand_device(
            soa.astype(jnp.int32), nr, nsm, jnp.int32(mid_count),
            max_runs, max_tokens,
        )
        need = width * strip_h
        if tokens.shape[0] < need:
            tokens = jnp.pad(tokens, (0, need - tokens.shape[0]))
        if predictor == "zzr":
            return zzd_inverse_device(tokens, width, strip_h)
        if predictor == "vdr":
            return vdd_inverse_device(tokens, width, strip_h)
        return pdd_inverse_device(tokens, width, strip_h)
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
    esc_vals,  # [S] i32  (alias ESC compare value; -1 = standard strip)
    esc_sides,  # [S, E] u16 (alias escape side stream, zero-padded)
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

    def subst_one(syms, ev, side):
        # Alias escape substitution (FF 41 strips): ESC symbols take
        # their true values from the side stream in stream order.
        # ev = -1 for standard strips -> identity (one cumsum + gather,
        # negligible vs the rANS scan).
        m = syms.astype(jnp.int32) == ev
        rank = jnp.cumsum(m.astype(jnp.int32)) - 1
        sv = jnp.take(side, jnp.clip(rank, 0, side.shape[0] - 1), mode="clip")
        return jnp.where(m, sv.astype(syms.dtype), syms)

    rle_syms = jax.vmap(subst_one)(rle_syms, esc_vals, esc_sides)

    post_one = partial(
        _post_one_strip, width=width, strip_h=strip_h, max_runs=max_runs,
        max_tokens=max_tokens, mid_count=mid_count, delim=delim,
        predictor=predictor,
    )
    pixels = jax.vmap(post_one)(rle_syms, n_tokens, n_runs, n_same)
    return pixels  # [S, width*strip_h] uint16


_decode_strip_batch = partial(jax.jit, static_argnames=(
    "table_log", "n_steps", "width", "strip_h", "max_runs", "max_tokens",
    "mid_count", "delim", "predictor",
))(decode_strip_batch_impl)


def build_strip_batch(parsed, strips, table_log, pad_strips_to: int = 0):
    """Pad a group of same-tableLog parsed MICT strips to common shapes.

    Returns ``(arrays, meta)`` where arrays = (init, words, ts, tf, tb,
    counts, n_tokens, n_runs, n_same, esc_vals, esc_sides) and meta =
    dict(n_steps, max_runs, max_tokens).  ``pad_strips_to`` appends
    replicas of strip 0 so the batch divides a mesh size.  Alias (FF 41)
    and standard strips mix freely: esc_vals is -1 for standard strips,
    so the in-program escape substitution is the identity for them.
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
    e_max = max(
        [1] + [len(p[7][1]) for p in parsed if p[7] is not None]
    )
    esc_vals = np.full(S_pad, -1, dtype=np.int32)
    esc_sides = np.zeros((S_pad, e_max), dtype=np.uint16)
    for i, (Lp, tl, count, states, wrds, norm, _sl, alias) in enumerate(parsed):
        sym, fs, bs, _, _ = slot_tables(norm, tl, alias)
        ts[i], tf[i], tb[i] = sym, fs, bs
        init[i] = states
        words[i, : len(wrds)] = wrds
        if alias is not None and len(alias[1]):
            esc_vals[i] = alias[0]
            esc_sides[i, : len(alias[1])] = alias[1]
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
        esc_vals[S:] = esc_vals[0]
        esc_sides[S:] = esc_sides[0]
    meta = {
        "n_steps": n_steps,
        "max_runs": int(_round_up(int(n_runs.max()) + 1, 128)),
        "max_tokens": int(_round_up(int(n_tokens.max()) + 1, 128)),
    }
    return (init, words, ts, tf, tb, counts, n_tokens, n_runs, n_same,
            esc_vals, esc_sides), meta


def micw_decompress_device(blob: bytes) -> tuple[np.ndarray, int, int]:
    """Decode a MICW container in fused device programs, strips grouped by
    (tableLog, predictor mode).  Returns (pixels, width, height)."""
    width, height, num_strips, strip_h, max_value, gpred, _lanes, strips = micw_parse(blob)
    _thr, delim = delta_params(max_value)
    mid = _rle_mid(max_value)

    out = np.empty(width * height, dtype=np.uint16)
    parsed = {}
    groups: dict[tuple, list[int]] = {}
    for i, st in enumerate(strips):
        pred = strip_predictor(gpred, st[5])
        if pred is None:
            y0 = i * strip_h
            sh = min(strip_h, height - y0)
            if st[5] == STRIP_MODE_CONST:
                out[y0 * width : (y0 + sh) * width] = np.frombuffer(st[0], dtype="<u2", count=1)[0]
            else:
                out[y0 * width : (y0 + sh) * width] = np.frombuffer(
                    st[0], dtype="<u2", count=width * sh
                )
            continue
        p = mict_parse(st[0])
        parsed[i] = p
        groups.setdefault((p[1], pred), []).append(i)
    for (g_tl, pred), idxs in groups.items():
        arrays, meta = build_strip_batch(
            [parsed[i] for i in idxs], [strips[i] for i in idxs], g_tl
        )
        p_mid, p_delim = _post_params(pred, mid, delim)
        sub = _decode_strip_batch(
            *[jnp.asarray(a) for a in arrays],
            table_log=g_tl,
            n_steps=meta["n_steps"],
            width=width,
            strip_h=strip_h,
            max_runs=meta["max_runs"],
            max_tokens=meta["max_tokens"],
            mid_count=p_mid,
            delim=p_delim,
            predictor=pred,
        )
        sub = np.asarray(sub)
        for j, i in enumerate(idxs):
            y0 = i * strip_h
            sh = min(strip_h, height - y0)
            out[y0 * width : (y0 + sh) * width] = sub[j][: sh * width]
    return _unband(out, width, height, blob)


def micw_decompress_host(blob: bytes) -> tuple[np.ndarray, int, int]:
    """Host (numpy) MICW decoder — cross-checks the device path."""
    from ..ops.predictors import parse_escaped, predictor_decode
    from .device_rans import mict_decode_numpy

    width, height, num_strips, strip_h, max_value, gpred, _lanes, strips = micw_parse(blob)
    _thr, delim = delta_params(max_value)
    mid = _rle_mid(max_value)
    out = np.empty(width * height, dtype=np.uint16)
    for i, (b, _n_soa, n_tok, n_runs, n_same, mode) in enumerate(strips):
        y0 = i * strip_h
        sh = min(strip_h, height - y0)
        pred = strip_predictor(gpred, mode)
        if pred is None:
            if mode == STRIP_MODE_CONST:
                out[y0 * width : (y0 + sh) * width] = np.frombuffer(b, dtype="<u2", count=1)[0]
            else:
                out[y0 * width : (y0 + sh) * width] = np.frombuffer(b, dtype="<u2", count=width * sh)
            continue
        if pred in _DIRECT_PREDS or pred in _RLE_DIRECT_PREDS:
            if pred in _RLE_DIRECT_PREDS:
                soa = mict_decode_numpy(b)
                syms = soa_expand(soa, n_runs, n_same, MID_DIRECT)
                if len(syms) != n_tok:
                    raise ValueError("micw: r-mode token count mismatch")
                syms = syms[: width * sh]
                pred = {"zzr": "zzd", "vdr": "vdd", "pdr": "pdd"}[pred]
            else:
                syms = mict_decode_numpy(b)[: width * sh].astype(np.uint16)
            u = syms.astype(np.uint32)
            dz = ((u >> 1) ^ (-(u & 1) & 0xFFFFFFFF)).astype(np.uint16).astype(np.int64)
            if pred == "pdd":
                img = np.cumsum(dz.reshape(sh, width), axis=1) & 0xFFFF
                img = np.cumsum(img, axis=0) & 0xFFFF
            else:
                axis = 1 if pred == "zzd" else 0
                img = np.cumsum(dz.reshape(sh, width), axis=axis) & 0xFFFF
            out[y0 * width : (y0 + sh) * width] = img.astype(np.uint16).ravel()
            continue
        soa = mict_decode_numpy(b)
        tokens = soa_expand(soa, n_runs, n_same, mid)
        if len(tokens) != n_tok:
            raise ValueError("micw: token count mismatch")
        values, is_raw = parse_escaped(tokens[1:], delim, width * sh)
        out[y0 * width : (y0 + sh) * width] = predictor_decode(
            values, is_raw, width, sh, int(tokens[0]), "zz" if pred == "zz" else "avg"
        ).ravel()
    return _unband(out, width, height, blob)


def micw_decode_batch(blobs: list[bytes]) -> list[np.ndarray]:
    """Decode many MICW containers in as few fused device programs as
    possible — the serving path.  Strips from all images are pooled and
    grouped by (tableLog, predictor, width, strip_h); each group runs as
    one batched device call.  Returns the pixel array for each input blob.

    This is the TPU analog of a multi-core decode farm: the batch axis
    does what the reference's goroutine/pthread pools do
    (parallelstrips.go:292-321, mic_parallel.c).
    """
    metas = []
    pool: dict[tuple, list] = {}
    for bi, blob in enumerate(blobs):
        width, height, num_strips, strip_h, max_value, gpred, _lanes, strips = micw_parse(blob)
        mid = _rle_mid(max_value)
        _thr, delim = delta_params(max_value)
        metas.append((width, height, num_strips, strip_h))
        for si, strip in enumerate(strips):
            pred = strip_predictor(gpred, strip[5])
            if pred is None:
                pool.setdefault("raw", []).append((bi, si, None, strip))
                continue
            p = mict_parse(strip[0])
            # _post_params here (not raw mid/delim): the r-modes expand
            # with the format constant MID_DIRECT, and the zeroed direct
            # params also collapse the executable family across depths.
            key = (p[1], width, strip_h, *_post_params(pred, mid, delim), pred)
            pool.setdefault(key, []).append((bi, si, p, strip))

    outs = [np.empty(m[0] * m[1], dtype=np.uint16) for m in metas]
    for key, items in pool.items():
        if key == "raw":
            for bi, si, _p, st in items:
                w, h, _n, sh = metas[bi]
                y0 = si * sh
                rows = min(sh, h - y0)
                if st[5] == STRIP_MODE_CONST:
                    outs[bi][y0 * w : (y0 + rows) * w] = np.frombuffer(
                        st[0], dtype="<u2", count=1
                    )[0]
                else:
                    outs[bi][y0 * w : (y0 + rows) * w] = np.frombuffer(
                        st[0], dtype="<u2", count=w * rows
                    )
            continue
        tl, width, strip_h, mid, delim, pred = key
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
            predictor=pred,
        )
        sub = np.asarray(sub)
        for j, (bi, si, _p, _s) in enumerate(items):
            w, h, _n, sh = metas[bi]
            y0 = si * sh
            rows = min(sh, h - y0)
            outs[bi][y0 * w : (y0 + rows) * w] = sub[j][: rows * w]
    return [_unband(o, m[0], m[1], b)[0] for o, m, b in zip(outs, metas, blobs)]


# Strips per device launch.  Two jobs: (a) bound compile cost — the
# XLA post program's compile time grows super-linearly with the batch
# dimension (S=4 compiles in ~1 min on the tunneled service, S=512
# never returns), and (b) make launch shapes image-count-independent so
# chunks of DIFFERENT batches/images share one compiled executable.
_CHUNK_S = 32


def _pow2_at_least(x: int, lo: int = 1) -> int:
    b = lo
    while b < x:
        b *= 2
    return b


@partial(jax.jit, static_argnames=("steps", "chunk_s", "tl", "asweep", "pdd_geom", "vdd_ws"))
def _stacked_zzd_fused(ops, *, steps, chunk_s, tl, asweep, pdd_geom=None, vdd_ws=0):
    """lax.map of the fused zzd kernel over stacked chunks — module-level
    jit so the executable is shared across plans/batches/images.

    pdd_geom=(width, strip_h) turns this into the pdd decode: the fused
    kernel's row cumsum is pdd's first prefix sum; the second (column)
    cumsum runs here per chunk, inside the same program."""
    from .pallas_rans import rans_decode_pallas_zzd

    def body(o):
        pix = rans_decode_pallas_zzd(
            *o, steps=steps, n_strips=chunk_s, table_log=tl, asweep=asweep,
            vdd_ws=vdd_ws,
        )
        out = pix.reshape(chunk_s, -1)
        if pdd_geom is not None:
            w, sh = pdd_geom
            need = w * sh
            if out.shape[1] < need:
                out = jnp.pad(out, ((0, 0), (0, need - out.shape[1])))
            img = jnp.cumsum(
                out[:, :need].astype(jnp.int32).reshape(chunk_s, sh, w), axis=1
            )
            out = (img & 0xFFFF).astype(jnp.uint16).reshape(chunk_s, -1)
        return out

    return jax.lax.map(body, ops)


def _r_margin() -> float:
    """MICW_R_MARGIN: minimum fractional size win a non-direct (RLE'd)
    strip candidate must show over the best direct candidate before the
    selector takes the slower-decoding family (0 = pure size, the
    default; the ratio-at-speed capture sweeps this)."""
    try:
        return float(os.environ.get("MICW_R_MARGIN", "0"))
    except ValueError:
        return 0.0


def _rle_dense_on() -> bool:
    """Kill switch for the FLAG_RDENSE fast expand (MIC_RLE_DENSE=0
    forces the legacy 384-window search even on dense blobs — the
    hardware A/B axis for the 32-candidate search)."""
    return os.environ.get("MIC_RLE_DENSE", "1") != "0"


def _rle_fused_on() -> bool:
    """Kill switch for the fused r-mode kernel (MIC_RLE_FUSED=0 restores
    the packed-kernel + XLA expand post path — the hardware A/B axis)."""
    return os.environ.get("MIC_RLE_FUSED", "1") != "0"


@partial(jax.jit, static_argnames=("steps", "out_rows", "chunk_s", "tl",
                                   "asweep", "maxr", "pdd_geom", "vdd_ws",
                                   "dense"))
def _stacked_rle_fused(ops, *, steps, out_rows, chunk_s, tl, asweep, maxr,
                       pdd_geom=None, vdd_ws=0, dense=False):
    """lax.map of the fused r-mode kernel (rANS + SoA-RLE expand +
    direct inverse in one Pallas program) over stacked chunks.  pdr's
    second (column) prefix sum runs here per chunk, like pdd's in
    _stacked_zzd_fused."""
    from .pallas_rans import rans_decode_pallas_rle

    def body(o):
        pix = rans_decode_pallas_rle(
            *o, steps=steps, out_rows=out_rows, n_strips=chunk_s,
            table_log=tl, asweep=asweep, maxr=maxr, mid_count=MID_DIRECT,
            vdd_ws=vdd_ws, dense=dense,
        )
        out = pix.reshape(chunk_s, -1)
        if pdd_geom is not None:
            w, sh = pdd_geom
            need = w * sh
            if out.shape[1] < need:
                out = jnp.pad(out, ((0, 0), (0, need - out.shape[1])))
            img = jnp.cumsum(
                out[:, :need].astype(jnp.int32).reshape(chunk_s, sh, w), axis=1
            )
            out = (img & 0xFFFF).astype(jnp.uint16).reshape(chunk_s, -1)
        return out

    return jax.lax.map(body, ops)


@partial(jax.jit, static_argnames=("steps", "out_rows", "chunk_s", "maxr",
                                   "esc", "pdd_geom", "vdd_ws", "dense"))
def _stacked_rle_alias_fused(ops, *, steps, out_rows, chunk_s, maxr, esc,
                             pdd_geom=None, vdd_ws=0, dense=False):
    """Alias (FF 41) variant of _stacked_rle_fused."""
    from .pallas_rans import rans_decode_pallas_rle_alias

    def body(o):
        pix = rans_decode_pallas_rle_alias(
            *o, steps=steps, out_rows=out_rows, n_strips=chunk_s,
            maxr=maxr, mid_count=MID_DIRECT, esc=esc, vdd_ws=vdd_ws,
            dense=dense,
        )
        out = pix.reshape(chunk_s, -1)
        if pdd_geom is not None:
            w, sh = pdd_geom
            need = w * sh
            if out.shape[1] < need:
                out = jnp.pad(out, ((0, 0), (0, need - out.shape[1])))
            img = jnp.cumsum(
                out[:, :need].astype(jnp.int32).reshape(chunk_s, sh, w), axis=1
            )
            out = (img & 0xFFFF).astype(jnp.uint16).reshape(chunk_s, -1)
        return out

    return jax.lax.map(body, ops)


@partial(jax.jit, static_argnames=(
    "steps", "chunk_s", "tl", "asweep", "use_packed", "width", "strip_h",
    "max_runs", "max_tokens", "mid", "delim", "pred", "pad_to",
))
def _stacked_post_run(ops, n_tokens, n_runs, n_same, *, steps, chunk_s, tl,
                      asweep, use_packed, width, strip_h, max_runs,
                      max_tokens, mid, delim, pred, pad_to):
    """lax.map of (entropy kernel + post program) over stacked chunks."""
    from .pallas_rans import rans_decode_pallas, rans_decode_pallas_packed

    def body(o):
        args, nt, nr, nsm = o[:6], o[6], o[7], o[8]
        if use_packed:
            ent = rans_decode_pallas_packed(
                *args, steps=steps, n_strips=chunk_s, table_log=tl, asweep=asweep,
            )
        else:
            ent = rans_decode_pallas(
                *args, steps=steps, n_strips=chunk_s, table_log=tl,
            )
        ent = ent.reshape(chunk_s, -1)
        if pad_to and ent.shape[1] < pad_to:
            ent = jnp.pad(ent, ((0, 0), (0, pad_to - ent.shape[1])))
        return _micw_post_batch(
            ent, nt, nr, nsm, width=width, strip_h=strip_h,
            max_runs=max_runs, max_tokens=max_tokens,
            mid_count=mid, delim=delim, predictor=pred,
        )

    return jax.lax.map(body, ops + (n_tokens, n_runs, n_same))


@partial(jax.jit, static_argnames=("steps", "chunk_s", "pdd_geom", "vdd_ws", "esc"))
def _stacked_alias_fused(ops, *, steps, chunk_s, pdd_geom=None, vdd_ws=0,
                         esc=True):
    """lax.map of the alias-bucket fused kernel over stacked chunks.  No
    tableLog/alphabet statics — ONE executable serves every alias group
    of a geometry regardless of per-strip table logs.  esc=False compiles
    the escape machinery out for escape-free groups (one of the two
    per-step matmuls)."""
    from .pallas_rans import rans_decode_pallas_alias

    def body(o):
        pix = rans_decode_pallas_alias(
            *o, steps=steps, n_strips=chunk_s, vdd_ws=vdd_ws, fused=True,
            esc=esc,
        )
        out = pix.reshape(chunk_s, -1)
        if pdd_geom is not None:
            w, sh = pdd_geom
            need = w * sh
            if out.shape[1] < need:
                out = jnp.pad(out, ((0, 0), (0, need - out.shape[1])))
            img = jnp.cumsum(
                out[:, :need].astype(jnp.int32).reshape(chunk_s, sh, w), axis=1
            )
            out = (img & 0xFFFF).astype(jnp.uint16).reshape(chunk_s, -1)
        return out

    return jax.lax.map(body, ops)


@partial(jax.jit, static_argnames=(
    "steps", "chunk_s", "width", "strip_h", "max_runs", "max_tokens",
    "mid", "delim", "pred", "pad_to", "esc",
))
def _stacked_alias_post_run(ops, n_tokens, n_runs, n_same, *, steps, chunk_s,
                            width, strip_h, max_runs, max_tokens, mid, delim,
                            pred, pad_to, esc=True):
    """lax.map of (alias entropy kernel + post program) over stacked
    chunks — the alias analog of _stacked_post_run."""
    from .pallas_rans import rans_decode_pallas_alias

    def body(o):
        args, nt, nr, nsm = o[:10], o[10], o[11], o[12]
        ent = rans_decode_pallas_alias(
            *args, steps=steps, n_strips=chunk_s, fused=False, esc=esc,
        )
        ent = ent.reshape(chunk_s, -1)
        if pad_to and ent.shape[1] < pad_to:
            ent = jnp.pad(ent, ((0, 0), (0, pad_to - ent.shape[1])))
        return _micw_post_batch(
            ent, nt, nr, nsm, width=width, strip_h=strip_h,
            max_runs=max_runs, max_tokens=max_tokens,
            mid_count=mid, delim=delim, predictor=pred,
        )

    return jax.lax.map(body, ops + (n_tokens, n_runs, n_same))


def _alias_chunks(entries, min_steps: int = 0):
    """Chunk a list of alias-strip entries and build stacked kernel
    operands.  ``entries`` is a list of (parsed, width) pairs; returns
    (ops10, steps, n_chunks, pad_to) where ops10 is the 10-tuple of
    stacked jnp operands of rans_decode_pallas_alias (incl. the ws
    operand built from each entry's width)."""
    from .pallas_rans import build_alias_bucket_tables

    S_real = len(entries)
    steps_g = max(min_steps, _pow2_at_least(
        max((e[0][2] + 127) // 128 for e in entries), 8))
    pad_to = _CHUNK_S if S_real > _CHUNK_S else _pow2_at_least(S_real, 1)
    chunk_idx = []
    for c0 in range(0, S_real, _CHUNK_S):
        ix = list(range(c0, min(c0 + _CHUNK_S, S_real)))
        while len(ix) < pad_to:
            ix.append(ix[0])
        chunk_idx.append(ix)
    n_chunks = _pow2_at_least(len(chunk_idx), 1)
    while len(chunk_idx) < n_chunks:
        chunk_idx.append(chunk_idx[0])
    chunks = [[entries[i] for i in ix] for ix in chunk_idx]
    built = []
    memo: dict[tuple, object] = {}
    for ch in chunks:
        ck = tuple(id(e[0]) for e in ch)  # replica chunks repeat
        b = memo.get(ck)
        if b is None:
            b = build_alias_bucket_tables([e[0] for e in ch], min_steps=steps_g)
            memo[ck] = b
        built.append(b)
    steps = max(b[10] for b in built)

    def stack(idx, pad_axis=None):
        return _stack_dev([b[idx] for b in built], pad_axis=pad_axis)

    ws = np.zeros((n_chunks, pad_to, 128), np.uint32)
    for ci, ch in enumerate(chunks):
        for i, (_p, w) in enumerate(ch):
            ws[ci, i, :] = w // 128
    ops = (stack(0), stack(1), stack(2), stack(3), stack(4, pad_axis=1),
           stack(5), stack(6), stack(7), stack(8, pad_axis=1),
           jnp.asarray(ws))
    esc_any = any(e[0][7] is not None and len(e[0][7][1]) for e in entries)
    return ops, steps, n_chunks, pad_to, chunk_idx, esc_any


def _stage_alias_fused_bucket(entries, *, geom=None, vws=0, min_steps: int = 0):
    """Stage a fused (direct-predictor) alias bucket: chunked stacked
    operands + ONE jitted lax.map program.  ``entries`` = list of
    (parsed, width); widths may mix for the zzd mode (ws operand).
    Returns a closure with ``.ops`` returning uint16[S_real, steps*128]
    (or the pdd-cumsum'd pixels when ``geom`` is set)."""
    S_real = len(entries)
    ops, steps, n_chunks, pad_to, _ci, esc_any = _alias_chunks(
        entries, min_steps=min_steps)

    def run(ops_all=None):
        out = _stacked_alias_fused(
            ops_all if ops_all is not None else ops,
            steps=steps, chunk_s=pad_to, pdd_geom=geom, vdd_ws=vws,
            esc=esc_any,
        )
        return out.reshape(out.shape[0] * pad_to, -1)[:S_real]

    run.ops = ops
    return run


def _stage_alias_post_group(parsed, strips, pred, width, strip_h, mid, delim,
                            min_steps: int = 0, min_runs: int = 0,
                            min_tokens: int = 0, dense: bool = False):
    """Stage an alias group whose decode needs the post program (r-modes,
    escaped zz/avg): alias entropy kernel (fused=False) + post, chunked.
    Returns a closure with ``.ops``."""
    S_real = len(parsed)
    entries = [(p, width) for p in parsed]
    if pred in _RLE_DIRECT_PREDS and _rle_fused_on():
        runs_gf = max(min_runs, _runs_floor(pred, width, strip_h),
                      128 * _pow2_at_least((max(st[3] for st in strips) + 128) // 128))
        tokens_gf = max(min_tokens, 128 * _pow2_at_least(
            (max(st[2] for st in strips) + 128) // 128))
        min_steps = max(min_steps, max(runs_gf, 512) // 128)
    ops, steps, n_chunks, pad_to, chunk_idx, esc_any = _alias_chunks(
        entries, min_steps=min_steps)
    out_rows_f = 0
    if pred in _RLE_DIRECT_PREDS and _rle_fused_on():
        out_rows_f = max(min_tokens // 128, _pow2_at_least(
            -(-max(st[2] for st in strips) // 128), 8))
    maxr_af = (max(runs_gf, 512)
               if pred in _RLE_DIRECT_PREDS and _rle_fused_on() else 0)
    if pred in _RLE_DIRECT_PREDS and _rle_fused_on() and width % 128 == 0 \
            and out_rows_f % 8 == 0 \
            and maxr_af // 128 <= steps \
            and (pred != "vdr" or (width // 128) in (1, 2, 4, 8)):
        def meta_rep(j):
            return jnp.asarray(np.stack([
                np.repeat(np.array([[strips[i][j]] for i in ix], np.int32),
                          128, axis=1)
                for ix in chunk_idx]))

        nrun_r, nsame_r = meta_rep(3), meta_rep(4)
        geom = (width, strip_h) if pred == "pdr" else None
        vws = width // 128 if pred == "vdr" else 0
        out_rows = out_rows_f
        ops_r = ops + (nrun_r, nsame_r)

        def run_alias_rle(ops_all=None):
            o = ops_all if ops_all is not None else ops_r
            out = _stacked_rle_alias_fused(
                o, steps=steps, out_rows=out_rows, chunk_s=pad_to,
                maxr=maxr_af, esc=esc_any, pdd_geom=geom, vdd_ws=vws,
                dense=dense,
            )
            out = out.reshape(out.shape[0] * pad_to, -1)[:S_real]
            if out.shape[1] < strip_h * width:
                out = jnp.pad(out, ((0, 0), (0, strip_h * width - out.shape[1])))
            return out[:, : strip_h * width]

        run_alias_rle.ops = ops_r
        return run_alias_rle
    if pred in _DIRECT_PREDS:
        post_kw = dict(max_runs=128, max_tokens=128, pad_to=strip_h * width)
        zeros = np.zeros((n_chunks, pad_to), np.int32)
        nt_np = nr_np = nsm_np = zeros
    else:
        runs_g = max(min_runs, _runs_floor(pred, width, strip_h),
                     128 * _pow2_at_least((max(st[3] for st in strips) + 128) // 128))
        tokens_g = max(min_tokens, 128 * _pow2_at_least(
            (max(st[2] for st in strips) + 128) // 128))
        post_kw = dict(max_runs=runs_g, max_tokens=tokens_g, pad_to=0)

        def meta_arr(j):
            return np.array(
                [[strips[i][j] for i in ix] for ix in chunk_idx], np.int32)

        nt_np, nr_np, nsm_np = meta_arr(2), meta_arr(3), meta_arr(4)
    nt, nr, nsm = (jnp.asarray(a) for a in (nt_np, nr_np, nsm_np))
    mid_s, delim_s = _post_params(pred, mid, delim)

    def run(ops_all=None):
        o, t, r, sm = ops_all if ops_all is not None else (ops, nt, nr, nsm)
        out = _stacked_alias_post_run(
            o, t, r, sm, steps=steps, chunk_s=pad_to, width=width,
            strip_h=strip_h, mid=mid_s, delim=delim_s, pred=pred,
            esc=esc_any, **post_kw,
        )
        return out.reshape(out.shape[0] * pad_to, -1)[:S_real]

    run.ops = (ops, nt, nr, nsm)
    return run


def _stage_mict_group_stacked(parsed, strips, pred, width, strip_h, mid, delim,
                              min_steps: int = 0, min_runs: int = 0,
                              min_tokens: int = 0, dense: bool = False):
    """Large-group staging: strips split into _CHUNK_S-strip chunks whose
    operands STACK along a leading chunk axis; one jitted program
    lax.map's the single-chunk body over them.

    This resolves the compile-cost/launch-latency tension on tunneled
    backends: the compiled body is single-chunk-sized (S in the batch
    dimension makes the post program's XLA compile super-linear — S=512
    never returned from the remote service while S=32 compiles in ~1
    min), yet each run is ONE device program (per-launch RPC latency
    through the tunnel was ~75 ms, so 16 chunk launches ran at 0.01
    GB/s dispatched individually).  The chunk count pads to a power of
    two with replica chunks, so the program family stays tiny and is
    shared across batches and images of the same geometry."""
    from .pallas_rans import (
        build_packed_tables,
        build_pallas_tables,
        rans_decode_pallas,
        rans_decode_pallas_packed,
        rans_decode_pallas_zzd,
    )

    S_real = len(parsed)
    # Pallas table-sweep kernels need 2^tl >= 128; build_packed_tables
    # tiles smaller per-strip tables up to the group tableLog, so the
    # floor is free (tl=6 strips DO occur on tiny near-constant strips).
    tl = max(max(p[1] for p in parsed), 7)
    steps_g = max(min_steps,
                  _pow2_at_least(max((p[2] + 127) // 128 for p in parsed), 8))
    runs_g = max(min_runs, _runs_floor(pred, width, strip_h),
                 128 * _pow2_at_least((max(st[3] for st in strips) + 128) // 128))
    tokens_g = max(min_tokens, 128 * _pow2_at_least(
        (max(st[2] for st in strips) + 128) // 128))
    if pred in _RLE_DIRECT_PREDS and _rle_fused_on():
        # The fused r-kernel's run tables live in the first maxr symbol
        # rows of its syms scratch — the scan bucket must cover them.
        steps_g = max(steps_g, max(runs_g, 512) // 128)

    # Build per-chunk operand arrays (numpy), padding chunk count to a
    # power of two with replicas of chunk 0.
    chunks = []
    for c0 in range(0, S_real, _CHUNK_S):
        pc = list(parsed[c0 : c0 + _CHUNK_S])
        sc = list(strips[c0 : c0 + _CHUNK_S])
        while len(pc) < _CHUNK_S:
            pc.append(pc[0])
            sc.append(sc[0])
        chunks.append((pc, sc))
    n_chunks = _pow2_at_least(len(chunks), 1)
    while len(chunks) < n_chunks:
        chunks.append(chunks[0])

    use_packed = True
    built = []
    build_memo: dict[tuple, object] = {}
    for pc, _sc in chunks:
        ck = tuple(id(p) for p in pc)  # replica chunks repeat
        pk = build_memo.get(ck)
        if pk is None:
            pk = build_packed_tables(pc, tl, min_steps=steps_g)
            build_memo[ck] = pk
        if pk is None:
            use_packed = False
            break
        built.append(pk)
    if not use_packed:
        build_memo.clear()
        built = []
        for pc, _sc in chunks:
            ck = tuple(id(p) for p in pc)
            pk = build_memo.get(ck)
            if pk is None:
                pk = build_pallas_tables(pc, tl, min_steps=steps_g)
                build_memo[ck] = pk
            built.append(pk)

    def _stack(idx, pad_axis=None):
        return _stack_dev([b[idx] for b in built], pad_axis=pad_axis)

    steps = max(b[7] for b in built)
    if use_packed:
        # (init, tpk, alpha, words, mask, shift, counts, steps, asweep)
        asweep = max(b[8] for b in built)
        ops = (_stack(0), _stack(1), _stack(2, pad_axis=1), _stack(3, pad_axis=1),
               _stack(4), _stack(5))
    else:
        # (init, tsym, tfb, words, mask, shift, counts, steps)
        asweep = 0
        ops = (_stack(0), _stack(1), _stack(2), _stack(3, pad_axis=1),
               _stack(4), _stack(5))

    fused_vdd = pred == "vdd" and width % 128 == 0 and (width // 128) in (1, 2, 4, 8)
    if (pred in ("zzd", "pdd") or fused_vdd) and width % 128 == 0 and use_packed:
        ws = jnp.asarray(np.full((n_chunks, _CHUNK_S, 128), width // 128, np.uint32))
        geom = (width, strip_h) if pred == "pdd" else None
        vws = width // 128 if fused_vdd else 0

        def run_fused(ops_all=None):
            o = ops_all if ops_all is not None else ops + (ws,)
            out = _stacked_zzd_fused(
                o, steps=steps, chunk_s=_CHUNK_S, tl=tl, asweep=asweep,
                pdd_geom=geom, vdd_ws=vws,
            )
            return out.reshape(n_chunks * _CHUNK_S, -1)[:S_real, : strip_h * width]

        run_fused.ops = ops + (ws,)
        return run_fused

    fused_vdr = pred == "vdr" and (width // 128) in (1, 2, 4, 8)
    # Tight output bucket: the fused kernel's phase 2 walks out_rows
    # rows, so the +128-margin tokens_g bucket (a post-path artifact)
    # would double the expand work right after a pow2 boundary.
    out_rows = max(min_tokens // 128, _pow2_at_least(
        -(-max(st[2] for st in strips) // 128), 8))
    maxr_f = max(runs_g, 512)  # >= 3 window rows (the kernel's 384 floor)
    if (pred in ("zzr", "pdr") or fused_vdr) and width % 128 == 0 \
            and use_packed and _rle_fused_on() and out_rows % 8 == 0 \
            and maxr_f // 128 <= steps:
        ws = jnp.asarray(np.full((n_chunks, _CHUNK_S, 128), width // 128, np.uint32))
        nrun_np = np.stack([
            np.repeat(np.array([[st[3]] for st in sc], np.int32), 128, axis=1)
            for _pc, sc in chunks])
        nsame_np = np.stack([
            np.repeat(np.array([[st[4]] for st in sc], np.int32), 128, axis=1)
            for _pc, sc in chunks])
        geom = (width, strip_h) if pred == "pdr" else None
        vws = width // 128 if fused_vdr else 0
        ops_r = ops + (ws, jnp.asarray(nrun_np), jnp.asarray(nsame_np))

        def run_rle_fused(ops_all=None):
            o = ops_all if ops_all is not None else ops_r
            out = _stacked_rle_fused(
                o, steps=steps, out_rows=out_rows, chunk_s=_CHUNK_S, tl=tl,
                asweep=asweep, maxr=maxr_f, pdd_geom=geom, vdd_ws=vws,
                dense=dense,
            )
            out = out.reshape(n_chunks * _CHUNK_S, -1)[:S_real]
            if out.shape[1] < strip_h * width:
                out = jnp.pad(out, ((0, 0), (0, strip_h * width - out.shape[1])))
            return out[:, : strip_h * width]

        run_rle_fused.ops = ops_r
        return run_rle_fused

    if pred in _DIRECT_PREDS:
        zeros = jnp.zeros((n_chunks, _CHUNK_S), jnp.int32)
        post_kw = dict(max_runs=128, max_tokens=128, pad_to=strip_h * width)
        nt = nr = nsm = zeros
    else:
        post_kw = dict(max_runs=runs_g, max_tokens=tokens_g, pad_to=0)
        nt = jnp.asarray(np.stack(
            [np.array([st[2] for st in sc], dtype=np.int32) for _pc, sc in chunks]))
        nr = jnp.asarray(np.stack(
            [np.array([st[3] for st in sc], dtype=np.int32) for _pc, sc in chunks]))
        nsm = jnp.asarray(np.stack(
            [np.array([st[4] for st in sc], dtype=np.int32) for _pc, sc in chunks]))
    mid_s, delim_s = _post_params(pred, mid, delim)

    def run_post(ops_all=None):
        o, t, r, sm = ops_all if ops_all is not None else (ops, nt, nr, nsm)
        out = _stacked_post_run(
            o, t, r, sm, steps=steps, chunk_s=_CHUNK_S, tl=tl,
            asweep=asweep, use_packed=use_packed, width=width,
            strip_h=strip_h, mid=mid_s, delim=delim_s, pred=pred, **post_kw,
        )
        return out.reshape(n_chunks * _CHUNK_S, -1)[:S_real]

    run_post.ops = (ops, nt, nr, nsm)
    return run_post


def _stage_mict_group(parsed, strips, pred, width, strip_h, mid, delim,
                      min_steps: int = 0, min_runs: int = 0,
                      min_tokens: int = 0, dense: bool = False):
    """Stage one homogeneous group of MICT strips for device decode,
    choosing the fastest eligible path: fully-fused zzd kernel → packed
    kernel + post program → two-table kernel + post program.  Returns a
    closure that runs only the device programs and yields
    uint16[S, strip_h*width] (padded rows included).

    Groups larger than ``_CHUNK_S`` strips split into fixed-size chunks
    sharing ONE compiled program (group-uniform steps/runs/tokens
    buckets, chunk padded with replicas of its first strip)."""
    from .pallas_rans import (
        build_packed_tables,
        build_pallas_tables,
        rans_decode_pallas,
        rans_decode_pallas_packed,
        rans_decode_pallas_zzd,
    )

    if parsed and parsed[0][7] is not None:
        # Alias-mapped (FF 41) group — the kernel has no tableLog or
        # alphabet statics, so one executable serves the whole family.
        if any(p[7] is None for p in parsed):
            raise ValueError("alias group mixed with standard strips")
        fused_vdd = (pred == "vdd" and width % 128 == 0
                     and (width // 128) in (1, 2, 4, 8))
        if (pred in ("zzd", "pdd") or fused_vdd) and width % 128 == 0:
            geom = (width, strip_h) if pred == "pdd" else None
            vws = width // 128 if fused_vdd else 0
            inner = _stage_alias_fused_bucket(
                [(p, width) for p in parsed], geom=geom, vws=vws,
                min_steps=min_steps,
            )

            def run_alias(ops_all=None):
                return inner(ops_all)[:, : strip_h * width]

            run_alias.ops = inner.ops
            return run_alias
        return _stage_alias_post_group(
            parsed, strips, pred, width, strip_h, mid, delim,
            min_steps=min_steps, min_runs=min_runs, min_tokens=min_tokens,
            dense=dense,
        )

    S_real = len(parsed)
    if S_real > _CHUNK_S:
        return _stage_mict_group_stacked(
            parsed, strips, pred, width, strip_h, mid, delim,
            min_steps=min_steps, min_runs=min_runs, min_tokens=min_tokens,
            dense=dense,
        )

    S = S_real
    tl = max(max(p[1] for p in parsed), 7)  # sweep floor, see stacked path
    # Pow2 steps bucket: steps is a static kernel arg, so bucketing keeps
    # the compiled-program family small across groups/images.
    min_steps = max(min_steps,
                    _pow2_at_least(max((p[2] + 127) // 128 for p in parsed), 8))
    runs_g1 = tokens_g1 = 0
    if pred in _RLE_DIRECT_PREDS:
        runs_g1 = max(min_runs, _runs_floor(pred, width, strip_h),
                      128 * _pow2_at_least((max(st[3] for st in strips) + 128) // 128))
        tokens_g1 = max(min_tokens, 128 * _pow2_at_least(
            (max(st[2] for st in strips) + 128) // 128))
        if _rle_fused_on():
            min_steps = max(min_steps, max(runs_g1, 512) // 128)
    packed = build_packed_tables(parsed, tl, min_steps=min_steps)
    maxr1 = max(runs_g1, 512)
    if packed is not None and pred in _RLE_DIRECT_PREDS and width % 128 == 0 \
            and _rle_fused_on() \
            and (pred != "vdr" or (width // 128) in (1, 2, 4, 8)):
        init, tpk, alpha, words, mask, shift, counts, steps, asweep = packed
        out_rows1 = max(min_tokens // 128, _pow2_at_least(
            -(-max(st[2] for st in strips) // 128), 8))
        if maxr1 // 128 <= steps and out_rows1 % 8 == 0:
            ws = np.full((S, 128), width // 128, np.uint32)
            nrun = np.repeat(np.array([[st[3]] for st in strips], np.int32), 128, axis=1)
            nsame = np.repeat(np.array([[st[4]] for st in strips], np.int32), 128, axis=1)
            args = tuple(jnp.asarray(a) for a in
                         (init, tpk, alpha, words, mask, shift, ws, nrun, nsame))
            geom = (width, strip_h) if pred == "pdr" else None
            vws = width // 128 if pred == "vdr" else 0
            out_rows = out_rows1
            ops_r1 = tuple(a[None] for a in args)

            def run_rle_fused(ops_all=None):
                o = ops_all if ops_all is not None else ops_r1
                out = _stacked_rle_fused(
                    o, steps=steps,
                    out_rows=out_rows, chunk_s=S, tl=tl, asweep=asweep,
                    maxr=maxr1, pdd_geom=geom, vdd_ws=vws, dense=dense,
                )
                out = out.reshape(S, -1)
                if out.shape[1] < strip_h * width:
                    out = jnp.pad(out, ((0, 0), (0, strip_h * width - out.shape[1])))
                return out[:, : strip_h * width]

            run_rle_fused.ops = ops_r1
            return run_rle_fused
    if packed is not None and pred in ("zzd", "pdd") and width % 128 == 0:
        init, tpk, alpha, words, mask, shift, counts, steps, asweep = packed
        ws = np.full((S, 128), width // 128, np.uint32)
        args = tuple(jnp.asarray(a) for a in (init, tpk, alpha, words, mask, shift, ws))
        geom = (width, strip_h) if pred == "pdd" else None
        ops_f1 = tuple(a[None] for a in args)

        def run_fused(ops_all=None):
            # Single-chunk lax.map body: same executable as the stacked
            # path for this (chunk size, steps, tl, asweep, geom) key.
            o = ops_all if ops_all is not None else ops_f1
            out = _stacked_zzd_fused(
                o, steps=steps, chunk_s=S, tl=tl,
                asweep=asweep, pdd_geom=geom,
            )
            return out.reshape(S, -1)[:, : strip_h * width]

        run_fused.ops = ops_f1
        return run_fused
    if packed is not None:
        init, tpk, alpha, words, mask, shift, counts, steps, asweep = packed
        args = tuple(jnp.asarray(a) for a in (init, tpk, alpha, words, mask, shift))

        def entropy(o=None):
            return rans_decode_pallas_packed(
                *(o if o is not None else args),
                steps=steps, n_strips=S, table_log=tl, asweep=asweep,
            )
    else:
        init, tsym, tfb, words, mask, shift, counts, steps = build_pallas_tables(
            parsed, tl, min_steps=min_steps)
        args = tuple(jnp.asarray(a) for a in (init, tsym, tfb, words, mask, shift))

        def entropy(o=None):
            return rans_decode_pallas(
                *(o if o is not None else args),
                steps=steps, n_strips=S, table_log=tl,
            )

    if pred in _DIRECT_PREDS:
        pad_to = strip_h * width

        def run_zzd_post(ops_all=None):
            rle_flat = entropy(ops_all).reshape(S, -1)
            if rle_flat.shape[1] < pad_to:
                # A group of only short (last) strips can decode fewer
                # than strip_h*width symbols; the zzd inverse slices that.
                rle_flat = jnp.pad(rle_flat, ((0, 0), (0, pad_to - rle_flat.shape[1])))
            return _micw_post_batch(
                rle_flat,
                jnp.zeros(S, jnp.int32), jnp.zeros(S, jnp.int32), jnp.zeros(S, jnp.int32),
                width=width, strip_h=strip_h, max_runs=128, max_tokens=128,
                mid_count=0, delim=0, predictor=pred,
            )

        run_zzd_post.ops = args
        return run_zzd_post
    n_tokens = jnp.asarray(np.array([st[2] for st in strips], dtype=np.int32))
    n_runs_np = np.array([st[3] for st in strips], dtype=np.int32)
    n_same = jnp.asarray(np.array([st[4] for st in strips], dtype=np.int32))
    n_runs = jnp.asarray(n_runs_np)
    # Pow2 buckets (x128): max_runs/max_tokens are static post-program
    # args — bucketing collapses the executable family across groups.
    max_runs = max(min_runs, _runs_floor(pred, width, strip_h),
                   128 * _pow2_at_least((int(n_runs_np.max()) + 128) // 128))
    max_tokens = max(min_tokens, 128 * _pow2_at_least(
        (int(np.array([st[2] for st in strips]).max()) + 128) // 128))

    p_mid, p_delim = _post_params(pred, mid, delim)

    def run_rle_post(ops_all=None):
        if ops_all is None:
            o, t, r, sm = args, n_tokens, n_runs, n_same
        else:
            o, t, r, sm = ops_all
        return _micw_post_batch(
            entropy(o).reshape(S, -1),
            t, r, sm,
            width=width, strip_h=strip_h,
            max_runs=max_runs, max_tokens=max_tokens,
            mid_count=p_mid, delim=p_delim, predictor=pred,
        )

    run_rle_post.ops = (args, n_tokens, n_runs, n_same)
    return run_rle_post


def _decode_mict_group(parsed, strips, pred, width, strip_h, mid, delim,
                       as_numpy=True, dense=False):
    out = _stage_mict_group(parsed, strips, pred, width, strip_h, mid, delim,
                            dense=dense)()
    return np.asarray(out) if as_numpy else out


def micw_decompress_device_pallas(blob: bytes) -> tuple[np.ndarray, int, int]:
    """MICW decode with the Pallas rANS kernels for the entropy stage
    (requires 128 lanes/strip; falls back to the lax.scan path otherwise).
    Strips are grouped by predictor mode; zzd groups ride the fully-fused
    kernel, RLE groups ride the packed kernel + the jitted post program."""
    width, height, num_strips, strip_h, max_value, gpred, lanes, strips = micw_parse(blob)
    if lanes != 128:
        return micw_decompress_device(blob)
    _thr, delim = delta_params(max_value)
    mid = _rle_mid(max_value)
    out = np.empty(width * height, dtype=np.uint16)
    groups: dict[tuple, list[int]] = {}
    parsed = {}
    for i, st in enumerate(strips):
        pred = strip_predictor(gpred, st[5])
        if pred is None:
            y0 = i * strip_h
            sh = min(strip_h, height - y0)
            if st[5] == STRIP_MODE_CONST:
                out[y0 * width : (y0 + sh) * width] = np.frombuffer(st[0], dtype="<u2", count=1)[0]
            else:
                out[y0 * width : (y0 + sh) * width] = np.frombuffer(
                    st[0], dtype="<u2", count=width * sh
                )
            continue
        parsed[i] = mict_parse(st[0])
        if parsed[i][7] is not None and parsed[i][1] > 12:
            # Foreign tl>12 alias blob: no Pallas path (12-bit bucket
            # fields) — the XLA scan tier decodes it.
            return micw_decompress_device(blob)
        groups.setdefault((pred, parsed[i][7] is not None), []).append(i)
    dense = _rle_dense_on() and bool(blob[22] & FLAG_RDENSE)
    for (pred, _is_alias), idxs in groups.items():
        sub = _decode_mict_group(
            [parsed[i] for i in idxs], [strips[i] for i in idxs],
            pred, width, strip_h, mid, delim, dense=dense,
        )
        for j, i in enumerate(idxs):
            y0 = i * strip_h
            sh = min(strip_h, height - y0)
            out[y0 * width : (y0 + sh) * width] = sub[j][: sh * width]
    return _unband(out, width, height, blob)


@partial(jax.jit, static_argnames=(
    "width", "strip_h", "max_runs", "max_tokens", "mid_count", "delim", "predictor",
))
def _micw_post_batch(
    rle_syms, n_tokens, n_runs, n_same, *,
    width, strip_h, max_runs, max_tokens, mid_count, delim, predictor="zz",
):
    """Post-entropy stages as one jitted program, vmapped over strips."""
    post_one = partial(
        _post_one_strip, width=width, strip_h=strip_h, max_runs=max_runs,
        max_tokens=max_tokens, mid_count=mid_count, delim=delim,
        predictor=predictor,
    )
    return jax.vmap(post_one)(rle_syms, n_tokens, n_runs, n_same)


@partial(jax.jit, static_argnames=("cols",))
def _bucket_mismatches(dev, exp, *, cols):
    """Count of mismatching symbols between a bucket's decode output
    (padded columns sliced off) and the expected array."""
    return jnp.sum((dev[:, :cols] != exp).astype(jnp.int32))


@partial(jax.jit, static_argnames=("cols",))
def _bucket_mismatches_masked(dev, exp, valid, *, cols):
    """Same, but each row compares only its first ``valid[row]`` symbols
    (short last strips)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (dev.shape[0], cols), 1)
    m = lane < valid
    return jnp.sum(((dev[:, :cols] != exp) & m).astype(jnp.int32))


class MicwDecodePlan:
    """A staged decode of a fixed batch of MICW blobs.

    Host-side work (parsing, table building, padding, jit closure setup)
    runs once at stage time; :meth:`run` executes only the device
    programs and returns device-resident outputs — the serving/benchmark
    steady state where compressed payloads stay pinned while pixels feed
    a downstream device pipeline.  :meth:`assemble` copies a run's
    outputs back to per-image host arrays.
    """

    def __init__(self, blobs):
        from .pallas_rans import build_packed_tables

        self.blobs = blobs
        n = len(blobs)
        self.metas = [None] * n  # (width, height, num_strips, strip_h)
        self.keys_per_blob = [None] * n
        self.fallback = set()
        self.raw_strips = []
        zzd_buckets: dict[int, list] = {}
        rle_groups: dict[tuple, list] = {}
        # Replicated batches (service warm pools, the bench) pass the
        # SAME blob object many times: memoize container/strip parses by
        # object identity so staging cost is per-distinct-blob, not
        # per-replica (stage time for a x256 plan drops ~50x).
        parse_memo: dict[int, tuple] = {}
        mict_memo: dict[int, tuple] = {}
        for bi, blob in enumerate(blobs):
            parsed_c = parse_memo.get(id(blob))
            if parsed_c is None:
                parsed_c = micw_parse(blob)
                parse_memo[id(blob)] = parsed_c
            width, height, num_strips, strip_h, mv, gpred, lanes, strips = parsed_c
            dense = _rle_dense_on() and bool(blob[22] & FLAG_RDENSE)
            self.metas[bi] = (width, height, num_strips, strip_h)
            mid = _rle_mid(mv)
            _thr, delim = delta_params(mv)
            if lanes != 128:
                self.fallback.add(bi)
                continue
            keys = []
            for si, st in enumerate(strips):
                pred = strip_predictor(gpred, st[5])
                if pred is None:
                    self.raw_strips.append(st)
                    keys.append(("raw", len(self.raw_strips) - 1))
                    continue
                p = mict_memo.get(id(st[0]))
                if p is None:
                    p = mict_parse(st[0])
                    mict_memo[id(st[0])] = p
                is_alias = p[7] is not None
                if is_alias and p[1] > 12:
                    # Foreign tl>12 alias strip: no Pallas path — whole
                    # blob falls back (scan tier via the fallback route).
                    self.fallback.add(bi)
                    keys = None
                    break
                fused_vdd = (pred == "vdd" and width % 128 == 0
                             and (width // 128) in (1, 2, 4, 8))
                if (pred in ("zzd", "pdd") or fused_vdd) and width % 128 == 0:
                    # Bucket by padded step count (power of two, min 8):
                    # strips of similar size share a launch, so small
                    # images don't pad to the largest image's scan length.
                    # pdd buckets also key on geometry (its column cumsum
                    # needs a static width); zzd mixes widths via the ws
                    # operand.  Alias (FF 41) strips bucket separately
                    # ("a" prefix) — their kernel has no tableLog static,
                    # so alias buckets mix table logs freely.
                    need = max(8, -(-p[2] // 128))
                    b = 8
                    while b < need:
                        b *= 2
                    a = "a" if is_alias else ""
                    if pred == "pdd":
                        bk = (a + "pdd", b, width, strip_h)
                    elif pred == "vdd":
                        bk = (a + "vdd", b, width)
                    else:
                        bk = (a + "zzd", b)
                    keys.append((bk, len(zzd_buckets.setdefault(bk, []))))
                    zzd_buckets[bk].append((p, width))
                else:
                    # mid/delim as they reach the post program: zeroed
                    # for direct modes, format-constant for r-modes —
                    # program keys collapse across maxValues.  The
                    # container's FLAG_RDENSE joins the key: dense blobs
                    # ride the 32-candidate expand, legacy blobs the
                    # 384-window one (mixed batches stay correct).
                    gk = (pred, width, strip_h,
                          *_post_params(pred, mid, delim), is_alias, dense)
                    keys.append((("rle", gk), len(rle_groups.setdefault(gk, []))))
                    rle_groups[gk].append((p, st))
            self.keys_per_blob[bi] = keys

        # Stage device operands per bucket, chunked to _CHUNK_S strips
        # with ONE jitted lax.map program per bucket: the compiled body
        # is single-chunk-sized (bounded compile cost on the remote
        # service) and each run is one launch (per-launch tunnel RPC
        # latency would otherwise dominate).  Program keys collapse to
        # (chunk size, #chunks pow2, steps bucket, tl, asweep).
        self.launches = {}  # key -> closure returning device array [S, cols]
        for bk, entries in zzd_buckets.items():
            b = bk[1]
            if bk[0].startswith("a"):
                geom = (bk[2], bk[3]) if bk[0] == "apdd" else None
                vws = bk[2] // 128 if bk[0] == "avdd" else 0
                self.launches[bk] = _stage_alias_fused_bucket(
                    entries, geom=geom, vws=vws, min_steps=b)
                continue
            geom = (bk[2], bk[3]) if bk[0] == "pdd" else None
            vws = bk[2] // 128 if bk[0] == "vdd" else 0
            parsed_all = [e[0] for e in entries]
            tl = max(max(p[1] for p in parsed_all), 7)  # sweep floor
            S_real = len(entries)
            # Small single-chunk buckets pad only to the next power of 2
            # (keeps tiny/interpret-mode decodes cheap); multi-chunk
            # buckets pad every chunk to the full _CHUNK_S.
            pad_to = _CHUNK_S if S_real > _CHUNK_S else _pow2_at_least(S_real, 1)
            chunks = []
            for c0 in range(0, S_real, _CHUNK_S):
                ch = list(entries[c0 : c0 + _CHUNK_S])
                while len(ch) < pad_to:
                    ch.append(ch[0])
                chunks.append(ch)
            n_chunks = _pow2_at_least(len(chunks), 1)
            while len(chunks) < n_chunks:
                chunks.append(chunks[0])
            built = []
            failed = False
            build_memo: dict[tuple, object] = {}
            for ch in chunks:
                ck = tuple(id(e[0]) for e in ch)  # replica chunks repeat
                packed = build_memo.get(ck)
                if packed is None:
                    packed = build_packed_tables([e[0] for e in ch], tl, min_steps=b)
                    build_memo[ck] = packed
                if packed is None:
                    failed = True
                    break
                built.append(packed)
            if failed:
                self.launches[bk] = None
                continue
            steps = max(bk[7] for bk in built)
            asweep = max(bk[8] for bk in built)

            def stack(idx, pad_axis=None, _built=built):
                return _stack_dev([bk[idx] for bk in _built], pad_axis=pad_axis)

            ws = np.zeros((n_chunks, pad_to, 128), np.uint32)
            for ci, ch in enumerate(chunks):
                for i, (_p, w) in enumerate(ch):
                    ws[ci, i, :] = w // 128
            ops = (stack(0), stack(1), stack(2, pad_axis=1), stack(3, pad_axis=1),
                   stack(4), stack(5), jnp.asarray(ws))

            def make_run(ops_full, steps, pad_to, tl, asweep, S_real, geom, vws):
                def run(ops_all=None):
                    return MicwDecodePlan._run_zzd_stacked(
                        ops_all if ops_all is not None else ops_full,
                        steps, pad_to, tl, asweep, S_real, geom, vws,
                    )
                run.ops = ops_full
                return run

            self.launches[bk] = make_run(ops, steps, pad_to, tl, asweep, S_real,
                                         geom, vws)
        for gk, entries in rle_groups.items():
            pred, width, strip_h, mid, delim, _is_alias, g_dense = gk
            parsed = [e[0] for e in entries]
            strips_g = [e[1] for e in entries]
            self.launches[("rle", gk)] = _stage_mict_group(
                parsed, strips_g, pred, width, strip_h, mid, delim,
                dense=g_dense,
            )

    @staticmethod
    def _run_zzd_stacked(ops, steps, chunk_s, tl, asweep, s_real, geom=None,
                         vdd_ws=0):
        out = _stacked_zzd_fused(
            ops, steps=steps, chunk_s=chunk_s, tl=tl, asweep=asweep,
            pdd_geom=geom, vdd_ws=vdd_ws,
        )
        return out.reshape(out.shape[0] * chunk_s, -1)[:s_real]

    def run(self):
        """Execute all device programs; returns {bucket_key: device array}."""
        return {k: (fn() if fn is not None else None) for k, fn in self.launches.items()}

    def _assemble_expected(self, expected_per_blob, dead=frozenset()):
        """Host half of batch verification: per-bucket expected-segment
        maps.  Returns (host_ok, exp_buckets, fallback_blob_indices):
        raw/const strips verify host-side here (host_ok False on any
        mismatch); blobs whose buckets are dead (or that staged via the
        fallback path) come back in the third element for the caller to
        handle.  zzd buckets mix geometries (width rides the ws
        operand), so segments pad to the bucket max with per-row valid
        lengths at compare time."""
        exp_buckets: dict = {}
        fb = []
        for bi in range(len(self.blobs)):
            expected = np.asarray(expected_per_blob[bi], dtype=np.uint16)
            keys = self.keys_per_blob[bi]
            if bi in self.fallback or keys is None or any(
                k != "raw" and k in dead for k, _ in keys
            ):
                fb.append(bi)
                continue
            info = micw_band_info(self.blobs[bi])
            if info is not None:
                expected, _bw, _sh = band_split(expected, info[0], info[1])
            width, height, _ns, strip_h = self.metas[bi]
            for i, (k, idx) in enumerate(keys):
                y0 = i * strip_h
                sh = min(strip_h, height - y0)
                seg = expected[y0 * width : (y0 + sh) * width]
                if k == "raw":
                    st = self.raw_strips[idx]
                    if st[5] == STRIP_MODE_CONST:
                        if not (seg == np.frombuffer(st[0], dtype="<u2", count=1)[0]).all():
                            return False, None, []
                    elif not np.array_equal(
                        seg, np.frombuffer(st[0], dtype="<u2", count=width * sh)
                    ):
                        return False, None, []
                    continue
                exp_buckets.setdefault(k, {})[idx] = seg
        return True, exp_buckets, fb

    def verify_batch_device(self, decoded, expected_per_blob, trace=None):
        """Device-side half of :meth:`verify_batch`: returns (host_ok,
        device_total) where ``host_ok`` covers raw/const strips and
        fallback blobs (verified host-side immediately) and
        ``device_total`` is a device scalar mismatch count (or None when
        every strip verified host-side).  Callers batching verification
        across many plans sum the device totals and pay ONE scalar d2h —
        on tunneled backends a single 4-byte pull can cost minutes, so
        the pull count, not the compare work, is the budget.

        Each bucket's [S, cols] output array compares against a
        host-assembled expected array of the SAME shape (mismatch-count
        reduce), so the compare programs share the decode buckets' shape
        family and compile once per geometry.  Verifies all replicas,
        not just blob 0.
        """
        import jax

        host_ok, exp_buckets, fb = self._assemble_expected(
            expected_per_blob,
            dead={k for k, v in decoded.items() if v is None},
        )
        if not host_ok:
            return False, None
        for bi in fb:
            if not self.verify_against(
                decoded, np.asarray(expected_per_blob[bi], dtype=np.uint16), bi
            ):
                return False, None
        # Three strictly ordered phases for the tunneled backend: stage
        # every expected array h2d while the client is still clean (the
        # first d2h drops it into a degraded sync mode), then dispatch
        # every compare, then pull ONE combined scalar.
        trace = trace or (lambda _tag: None)
        staged = []
        for k, segs in exp_buckets.items():
            cols = max(len(s) for s in segs.values())
            dev = decoded[k]
            # Rows can exceed the segment count when a FALLBACK blob's
            # strips share this bucket (its segments verify via the
            # fallback path above, leaving index holes here) — compare
            # those rows with valid=0 instead of failing the batch.
            S = dev.shape[0]
            if S < len(segs) or max(segs) >= S or dev.shape[1] < cols:
                return False, None
            exp = np.zeros((S, cols), np.uint16)
            valid = np.zeros((S, 1), np.int32)
            for i, s in segs.items():
                exp[i, : len(s)] = s
                valid[i, 0] = len(s)
            trace(f"host_assemble[{S}x{cols}]")
            exp_d = jax.device_put(exp)
            valid_d = None if (valid == cols).all() else jax.device_put(valid)
            exp_d.block_until_ready()
            trace(f"h2d[{S}x{cols}]")
            staged.append((dev, exp_d, valid_d, cols))
        misms = []
        for dev, exp_d, valid_d, cols in staged:
            if valid_d is None:
                misms.append(_bucket_mismatches(dev, exp_d, cols=cols))
            else:
                misms.append(_bucket_mismatches_masked(dev, exp_d, valid_d, cols=cols))
        if not misms:
            return True, None
        total = misms[0]
        for m in misms[1:]:
            total = total + m
        total.block_until_ready()
        trace("compare_dispatch")
        return True, total

    def verify_batch(self, decoded, expected_per_blob, trace=None) -> bool:
        """Bit-exactness of EVERY blob: device compares + one scalar
        pull.  See :meth:`verify_batch_device` for the batching form."""
        trace = trace or (lambda _tag: None)
        host_ok, total = self.verify_batch_device(
            decoded, expected_per_blob, trace=trace
        )
        if not host_ok:
            return False
        if total is None:
            return True
        ok = int(total) == 0
        trace("scalar_pull")
        return ok

    def verify_against(self, decoded, expected, bi: int = 0) -> bool:
        """Bit-exactness check of blob ``bi`` WITHOUT pulling pixels to
        the host: the expected pixels are staged host->device (the cheap
        direction over tunneled links) and compared on device; only a
        boolean scalar crosses back.  Raw/constant strips compare
        host-side (bytes are already on the host)."""
        import jax

        keys = self.keys_per_blob[bi]
        expected = np.asarray(expected, dtype=np.uint16)
        if bi in self.fallback or keys is None or any(
            k != "raw" and decoded.get(k) is None for k, _ in keys
        ):
            out, _w, _h = micw_decompress_device_pallas(self.blobs[bi])
            return bool(np.array_equal(out, expected))
        info = micw_band_info(self.blobs[bi])
        if info is not None:
            # Strips live in the stacked band space; permute the expected
            # pixels to match before the per-strip compare.
            expected, _bw, _sh = band_split(expected, info[0], info[1])
        width, height, _num_strips, strip_h = self.metas[bi]
        dev_parts = []
        exp_parts = []
        for i, (k, idx) in enumerate(keys):
            y0 = i * strip_h
            sh = min(strip_h, height - y0)
            seg = expected[y0 * width : (y0 + sh) * width]
            if k == "raw":
                st = self.raw_strips[idx]
                if st[5] == STRIP_MODE_CONST:
                    val = np.frombuffer(st[0], dtype="<u2", count=1)[0]
                    if not (seg == val).all():
                        return False
                elif not np.array_equal(
                    seg, np.frombuffer(st[0], dtype="<u2", count=width * sh)
                ):
                    return False
            else:
                dev_parts.append(decoded[k][idx][: sh * width])
                exp_parts.append(seg)
        if not dev_parts:
            return True
        dev = jnp.concatenate(dev_parts)
        exp_dev = jax.device_put(np.concatenate(exp_parts))
        return bool(jnp.array_equal(dev, exp_dev))

    def make_timed_runner(self, expected_per_blob):
        """Build ONE jitted program that decodes the whole plan ``n``
        times (while_loop, operands threaded through an
        optimization_barrier so iterations cannot be hoisted or CSE'd)
        and verifies iteration 0's outputs in-program.

        Motivation (tunnel forensics, round 3): on the tunneled backend
        ``block_until_ready`` acknowledges ENQUEUE, not execution — an
        async launch loop times dispatch rate (one encode loop read 2.7
        TB/s), and the only true sync is a data pull, whose first use
        costs minutes.  The honest steady-state measure is therefore:
        one launch whose EXECUTION is n kernel iterations, followed by a
        tiny scalar pull.  Returns ``runner(n) -> (mismatches, probe)``
        device scalars (pull both; ``probe`` is the anti-DCE carry), or
        None when any blob staged via the fallback path.
        """
        import jax

        host_ok, exp_buckets, fb = self._assemble_expected(
            expected_per_blob,
            dead={k for k, v in self.launches.items() if v is None},
        )
        if not host_ok or fb:
            return None
        items = []
        for k, fn in self.launches.items():
            if not hasattr(fn, "ops") or k not in exp_buckets:
                return None
            items.append((k, fn))
        ops_tree = [fn.ops for _k, fn in items]
        # Replica batches ([blob]*k with [px]*k expected) produce
        # bucket rows that repeat with period S/k — h2d ONE period and
        # tile on device (the expected arrays dominated replicated-plan
        # staging: 128 x 2 MB per banded image through the tunnel).
        k_rep = 1
        if (len(self.blobs) > 1
                and all(b is self.blobs[0] for b in self.blobs[1:])
                and all(e is expected_per_blob[0]
                        for e in expected_per_blob[1:])):
            k_rep = len(self.blobs)
        exps = []
        for k, _fn in items:
            segs = exp_buckets[k]
            S = len(segs)
            cols = max(len(seg) for seg in segs.values())
            p_rows = S // k_rep if (k_rep > 1 and S % k_rep == 0) else S
            exp = np.zeros((p_rows, cols), np.uint16)
            valid = np.zeros((p_rows, 1), np.int32)
            for i in range(p_rows):
                seg = segs[i]
                exp[i, : len(seg)] = seg
                valid[i, 0] = len(seg)
            if p_rows != S:
                reps = S // p_rows
                exps.append((jnp.tile(jnp.asarray(exp), (reps, 1)),
                             jnp.tile(jnp.asarray(valid), (reps, 1))))
            else:
                exps.append((jnp.asarray(exp), jnp.asarray(valid)))
        cols_list = [int(e[0].shape[1]) for e in exps]
        fns = [fn for _k, fn in items]

        @jax.jit
        def run_n(n, ops_tree, exps):
            def cond(c):
                return c[0] < n

            def body(c):
                i, mism, probe = c
                ops_b, exps_b, probe_b = jax.lax.optimization_barrier(
                    (ops_tree, exps, probe)
                )
                outs = [fn(o) for fn, o in zip(fns, ops_b)]
                p = probe_b
                for out in outs:
                    p = p + out[0, :8].astype(jnp.uint32).sum()

                def compare():
                    m = jnp.int32(0)
                    for out, (exp, valid), cols in zip(outs, exps_b, cols_list):
                        lane = jax.lax.broadcasted_iota(
                            jnp.int32, (exp.shape[0], cols), 1
                        )
                        m = m + jnp.sum(
                            ((out[:, :cols] != exp) & (lane < valid)).astype(jnp.int32)
                        )
                    return m

                m = jax.lax.cond(i == 0, compare, lambda: jnp.int32(0))
                return (i + 1, mism + m, p)

            _i, mism, probe = jax.lax.while_loop(
                cond, body, (jnp.int32(0), jnp.int32(0), jnp.uint32(0))
            )
            return mism, probe

        def runner(n):
            return run_n(jnp.int32(n), ops_tree, exps)

        return runner

    def assemble(self, decoded):
        """Copy one run's outputs to host pixel arrays, blob order."""
        host = {k: (np.asarray(v) if v is not None else None) for k, v in decoded.items()}
        results = [None] * len(self.blobs)
        for bi, keys in enumerate(self.keys_per_blob):
            if bi in self.fallback or keys is None or any(
                k != "raw" and host.get(k) is None for k, _ in keys
            ):
                results[bi] = micw_decompress_device_pallas(self.blobs[bi])
                continue
            width, height, num_strips, strip_h = self.metas[bi]
            out = np.empty(width * height, dtype=np.uint16)
            for i, (k, idx) in enumerate(keys):
                y0 = i * strip_h
                sh = min(strip_h, height - y0)
                if k == "raw":
                    st = self.raw_strips[idx]
                    if st[5] == STRIP_MODE_CONST:
                        out[y0 * width : (y0 + sh) * width] = np.frombuffer(
                            st[0], dtype="<u2", count=1
                        )[0]
                    else:
                        out[y0 * width : (y0 + sh) * width] = np.frombuffer(
                            st[0], dtype="<u2", count=width * sh
                        )
                else:
                    out[y0 * width : (y0 + sh) * width] = host[k][idx][: sh * width]
            results[bi] = _unband(out, width, height, self.blobs[bi])
        return results


def micw_decode_many(blobs):
    """Decode MANY MICW images in as few kernel launches as possible (the
    decode-service path: a batch of studies lands; strips of every image
    are pooled across the batch, zzd strips ride the fully-fused Pallas
    kernel in steps-bucketed launches, RLE strips ride the packed kernel
    + one post program per (predictor, geometry) group, raw strips copy).
    Images may have different widths, heights and table statistics.
    Returns a list of (pixels, width, height), blob-order.

    The TPU-first answer to the reference's decode-side thread pools
    (parallelstrips.go workers, mic_parallel.c pthreads): the batch axis
    IS the parallelism — no queues, no workers, one launch per bucket.
    Repeated decodes of a pinned batch can stage once via
    :class:`MicwDecodePlan`.
    """
    plan = MicwDecodePlan(blobs)
    return plan.assemble(plan.run())
