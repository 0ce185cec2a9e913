"""Fused device decode pipeline: wide-rANS → RLE expand → predictor inverse.

This is the TPU-native restructuring of the reference's decode stack: the
reference's C decoder already discovered the right shape — two-pass
"entropy decode, then SIMD RLE-expand, then delta-inverse"
(mic_decompress_c.c:562-800); here every pass is a data-parallel device
program with static shapes:

* **RLE expansion**: the device format stores RLE as structure-of-arrays
  ([counts][same-values][literals]), so run boundaries are cumsums over
  the counts section and every output slot finds its run with a
  searchsorted (log-depth gathers — TPU scatters serialize, gathers
  vectorize).  For the *host* interleaved format there is also a
  list-ranking parser (pointer doubling over the speculative next-header
  map) — correct everywhere but scatter-bound on TPU.
* **Escape parsing** uses the run-parity property (see
  ops/predictors.parse_escaped) — masks, cumsums, and searchsorted only.
* **Predictor inversion** for the device format's ZZ (left-neighbour)
  predictor is a *segmented prefix sum* — log-depth, fully parallel.
  (This is why the device format defaults to the ZZ predictor: the
  reference's avg(left,top) chain is inherently serial; its ablation
  table prices left-only at ~2% ratio vs avg — the right trade for a
  vector machine.)

All functions take/return padded, shape-static arrays so a whole batch of
strips decodes in one jitted program, and the strip axis shards over a
device mesh with shard_map.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "rle_expand_device",
    "soa_rle_expand_device",
    "parse_escaped_device",
    "zz_delta_inverse_device",
    "avg_delta_inverse_device",
    "zzd_inverse_device",
    "vdd_inverse_device",
    "pdd_inverse_device",
]


def _ceil_log2(n: int) -> int:
    return max(1, int(np.ceil(np.log2(max(n, 2)))))


@partial(jax.jit, static_argnames=("max_out",))
def rle_expand_device(stream: jax.Array, n_stream: jax.Array, mid_count: jax.Array, max_out: int):
    """Expand one RLE stream (without its leading maxValue word) on device.

    stream: int32[m_pad] RLE words starting at the first block header.
    n_stream: actual word count.  mid_count: RLE midCount for this stream.
    Returns (tokens int32[max_out], n_tokens int32).

    Stage 1 — header discovery by pointer doubling over the speculative
    next-header map nxt[p] = p+2 (same-run) or p+1+(count-mid) (literal).
    Stage 2 — output-position scatter + cumsum to label runs, then one
    gather per output slot.
    """
    m_pad = stream.shape[0]
    pos = jnp.arange(m_pad, dtype=jnp.int32)
    is_same = stream <= mid_count
    nxt = jnp.where(is_same, pos + 2, pos + 1 + (stream - mid_count))
    nxt = jnp.minimum(nxt, m_pad)  # clamp; slot m_pad-? use a sink at end
    nxt = jnp.where(pos >= n_stream, m_pad - 1, nxt)  # past-end: self-sink
    nxt = jnp.minimum(nxt, m_pad - 1)

    header = jnp.zeros(m_pad, dtype=jnp.int32).at[0].set(1)
    g = nxt
    for _ in range(_ceil_log2(m_pad)):
        header = header.at[g].max(header)
        g = g[g]
    header = header.astype(bool) & (pos < n_stream)

    # Per-header run length in the output domain.
    length = jnp.where(is_same, stream, stream - mid_count)
    length = jnp.where(header, length, 0).astype(jnp.int32)
    out_start = jnp.cumsum(length) - length  # exclusive cumsum
    n_tokens = jnp.sum(length)

    # Label output slots with their run id.
    run_id_marks = jnp.zeros(max_out + 1, dtype=jnp.int32)
    hdr_idx = jnp.where(header, out_start, max_out)  # park non-headers
    run_id_marks = run_id_marks.at[hdr_idx].add(1)
    run_id = jnp.cumsum(run_id_marks[:max_out]) - 1  # inclusive - 1

    # Compact per-run info (header positions in stream order = run order).
    hdr_rank = jnp.cumsum(header.astype(jnp.int32)) - 1
    n_runs_max = m_pad  # upper bound
    run_hdr_pos = jnp.zeros(n_runs_max, dtype=jnp.int32)
    run_hdr_pos = run_hdr_pos.at[jnp.where(header, hdr_rank, n_runs_max - 1)].max(pos)
    run_is_same = is_same[run_hdr_pos]
    run_value = stream[jnp.minimum(run_hdr_pos + 1, m_pad - 1)]
    run_out_start = out_start[run_hdr_pos]

    out_idx = jnp.arange(max_out, dtype=jnp.int32)
    rid = jnp.clip(run_id, 0, n_runs_max - 1)
    same_v = run_value[rid]
    lit_pos = run_hdr_pos[rid] + 1 + (out_idx - run_out_start[rid])
    lit_v = stream[jnp.clip(lit_pos, 0, m_pad - 1)]
    tokens = jnp.where(run_is_same[rid], same_v, lit_v)
    tokens = jnp.where(out_idx < n_tokens, tokens, 0)
    return tokens.astype(jnp.int32), n_tokens.astype(jnp.int32)


@partial(jax.jit, static_argnames=("max_runs", "max_out"))
def soa_rle_expand_device(
    syms: jax.Array,  # [m] int32 — decoded symbol stream in SoA order
    n_runs: jax.Array,  # scalar i32
    n_same: jax.Array,  # scalar i32
    mid_count: jax.Array,  # scalar i32
    max_runs: int,
    max_out: int,
):
    """Expand structure-of-arrays RLE: ``syms`` is laid out as
    [counts (n_runs)] [same-run values (n_same)] [literals ...].

    The MICW v2 device format stores RLE this way precisely so the parse
    needs no pointer chasing: run boundaries come straight from cumsums
    over the counts section (contrast rle_expand_device, which must
    *discover* headers in the interleaved host format by list ranking).
    """
    m = syms.shape[0]
    r_idx = jnp.arange(max_runs, dtype=jnp.int32)
    valid_run = r_idx < n_runs
    counts = jnp.where(valid_run, syms[jnp.minimum(r_idx, m - 1)], 0)
    is_same = valid_run & (counts <= mid_count)
    lengths = jnp.where(valid_run, jnp.where(is_same, counts, counts - mid_count), 0)
    out_start = jnp.cumsum(lengths) - lengths
    n_tokens = jnp.sum(lengths)

    same_rank = jnp.cumsum(is_same.astype(jnp.int32)) - is_same.astype(jnp.int32)
    lit_len = jnp.where(is_same, 0, lengths)
    lit_start = jnp.cumsum(lit_len) - lit_len

    value_of_run = syms[jnp.minimum(n_runs + same_rank, m - 1)]
    lit_base = n_runs + n_same

    # Label output slots with their run id.  out_start is nondecreasing
    # and valid runs are a prefix (every valid run has length >= 1 in
    # well-formed streams), so run_id[i] = searchsorted(starts, i,
    # right) - 1: log2(max_runs) vectorized binary-search rounds over
    # the output axis.  The previous dense compare-and-reduce
    # formulation streamed max_out x max_runs compares through the VPU
    # (~270M per strip at the r-mode buckets) and measured 0.03 GB/s on
    # the honest macro-loop harness; this form is O(max_out log
    # max_runs).  (A scatter+cumsum form serialized under the
    # vmap-in-lax.map composition — still avoid scatters here.)
    starts_sorted = jnp.where(valid_run, out_start, jnp.int32(2**30))
    out_idx = jnp.arange(max_out, dtype=jnp.int32)
    # Branchless binary search, UNROLLED in python (log2(max_runs)
    # rounds of gather+compare): jnp.searchsorted's lax.scan lowering
    # hangs under the vmap-in-lax.map-in-while_loop composition the
    # batched decoder runs in.
    cnt = jnp.zeros((max_out,), jnp.int32)  # count of starts <= i
    step = 1 << (max_runs - 1).bit_length()
    while step:
        cand = cnt + step
        v = starts_sorted[jnp.minimum(cand - 1, max_runs - 1)]
        take = (cand <= max_runs) & (v <= out_idx)
        cnt = jnp.where(take, cand, cnt)
        step >>= 1
    run_id = cnt - 1
    rid = jnp.clip(run_id, 0, max_runs - 1)
    out_idx = jnp.arange(max_out, dtype=jnp.int32)
    lit_pos = lit_base + lit_start[rid] + (out_idx - out_start[rid])
    lit_v = syms[jnp.clip(lit_pos, 0, m - 1)]
    tokens = jnp.where(is_same[rid], value_of_run[rid], lit_v)
    tokens = jnp.where(out_idx < n_tokens, tokens, 0)
    return tokens.astype(jnp.int32), n_tokens.astype(jnp.int32)


@partial(jax.jit, static_argnames=("n_pixels",))
def parse_escaped_device(tokens: jax.Array, n_tokens: jax.Array, delim: jax.Array, n_pixels: int):
    """Per-pixel (value, is_raw) from an escaped token stream on device.

    Uses the run-parity property: every maximal run of consecutive delim
    tokens starts at a token boundary, so escape markers are the even
    offsets within each run.
    """
    m = tokens.shape[0]
    pos = jnp.arange(m, dtype=jnp.int32)
    valid = pos < n_tokens
    is_delim = (tokens == delim) & valid

    run_start = is_delim & jnp.concatenate([jnp.array([True]), ~is_delim[:-1]])
    # position of current run start (running max over run_start positions)
    start_pos = jax.lax.associative_scan(jnp.maximum, jnp.where(run_start, pos, -1))
    offset_in_run = pos - start_pos
    escape_marker = is_delim & (offset_in_run % 2 == 0)
    consumed_as_raw = jnp.concatenate([jnp.array([False]), escape_marker[:-1]])
    token_start = ~consumed_as_raw & valid

    # Compact token-start positions to the first n_pixels tokens.
    # Sort-based stream compaction: token starts keep their rank as the
    # sort key, junk sinks past the end (TPU sorts are fast and fully
    # parallel; the previous scatter-max serialized under the batched
    # decoder's vmap-in-lax.map composition).
    t_rank = jnp.cumsum(token_start.astype(jnp.int32)) - 1
    keys = jnp.where(token_start, t_rank, m + n_pixels)
    _sorted_keys, sorted_pos = jax.lax.sort((keys, pos), num_keys=1)
    if m >= n_pixels:
        tok_pos = sorted_pos[:n_pixels]
    else:
        tok_pos = jnp.pad(sorted_pos, (0, n_pixels - m))

    is_raw = escape_marker[tok_pos]
    vals = jnp.where(is_raw, tokens[jnp.minimum(tok_pos + 1, m - 1)], tokens[tok_pos])
    return vals.astype(jnp.int32), is_raw


@partial(jax.jit, static_argnames=("width", "height"))
def zz_delta_inverse_device(
    values: jax.Array, is_raw: jax.Array, delta_threshold: jax.Array, width: int, height: int
):
    """Invert the ZZ (left-neighbour, ZigZag) predictor: per-row segmented
    prefix sum with resets at escapes — log-depth, rows in parallel.

    out[y][0] = v (raw) or unzig(v);  out[y][x] = out[y][x-1] + unzig(v),
    resetting to the raw value at escapes (deltazigzagcompressu16.go:75-106
    semantics, evaluated in parallel).
    """
    del delta_threshold  # zz residuals are ZigZag-coded, no threshold offset
    v = values.reshape(height, width)
    raw = is_raw.reshape(height, width)
    u = v.astype(jnp.uint32)
    dz = ((u >> 1) ^ (-(u & 1))).astype(jnp.int32)  # unzigzag
    add = jnp.where(raw, 0, dz)
    base = jnp.where(raw, v, 0)

    xs = jnp.arange(width, dtype=jnp.int32)
    reset = raw | (xs[None, :] == 0)
    # Segment id per row = cumsum of resets; segment base = value at reset.
    prefix = jnp.cumsum(add, axis=1)
    reset_pos = jax.lax.associative_scan(
        jnp.maximum, jnp.where(reset, xs[None, :], -1), axis=1
    )
    # base value at the segment's reset position, and prefix there.
    rp = jnp.clip(reset_pos, 0, width - 1)
    base_at = jnp.take_along_axis(base, rp, axis=1)
    prefix_at = jnp.take_along_axis(prefix, rp, axis=1)
    out = base_at + prefix - prefix_at
    # The x==0 "reset" (when not raw) starts the chain at unzig(v[0]) =
    # add[0], but prefix - prefix_at cancels add at the reset position —
    # add it back for rows whose segment base is the non-raw x==0.
    out = out + jnp.where((reset_pos == 0) & ~raw[:, :1], add[:, :1], 0)
    return (out & 0xFFFF).astype(jnp.uint16).reshape(-1)


@partial(jax.jit, static_argnames=("width", "height"))
def avg_delta_inverse_device(
    values: jax.Array, is_raw: jax.Array, thr: jax.Array, width: int, height: int
):
    """Invert the avg(left, top) predictor on device via anti-diagonal
    wavefronts k = 2*i + j (both neighbour positions lie on strictly
    earlier wavefronts — see ops/predictors.predictor_decode).

    The grid is stored SKEWED — B[i, 2i+j] = A[i, j] — so each of the
    2(h-1)+w wavefront steps updates ONE column of B from the two
    previous columns: O(h) work per step, O(n + (2h+w)·h) total, versus
    the masked full-grid formulation's O(n·(2h+w)).  On a 64×512 strip
    that is ~500× less work, which brings the reference's default
    predictor (deltacompressu16.go:54-120) into the servable range on
    device; the scan-parallel modes remain the throughput path.
    """
    v = values.reshape(height, width).astype(jnp.int32)
    raw = is_raw.reshape(height, width)
    diff = v - thr
    K = 2 * (height - 1) + width

    # Skew: S[i, k] = A[i, k - 2i] (garbage outside the valid window —
    # masked off in the loop).
    i_col = jnp.arange(height, dtype=jnp.int32)[:, None]
    k_row = jnp.arange(K, dtype=jnp.int32)[None, :]
    j_idx = jnp.clip(k_row - 2 * i_col, 0, width - 1)
    sk_v = jnp.take_along_axis(v, j_idx, axis=1)
    sk_raw = jnp.take_along_axis(raw, j_idx, axis=1)
    sk_diff = jnp.take_along_axis(diff, j_idx, axis=1)
    i_vec = jnp.arange(height, dtype=jnp.int32)

    def body(k, B):
        left = jax.lax.dynamic_slice(B, (0, jnp.maximum(k - 1, 0)), (height, 1))[:, 0]
        topc = jax.lax.dynamic_slice(B, (0, jnp.maximum(k - 2, 0)), (height, 1))[:, 0]
        top = jnp.concatenate([jnp.zeros((1,), jnp.int32), topc[:-1]])  # B[i-1, k-2]
        j = k - 2 * i_vec
        valid = (j >= 0) & (j < width)
        pred = jnp.where(
            i_vec == 0,
            jnp.where(j == 0, 0, left),
            jnp.where(j == 0, top, (left + top) >> 1),
        )
        dcol = jax.lax.dynamic_slice(sk_diff, (0, k), (height, 1))[:, 0]
        vcol = jax.lax.dynamic_slice(sk_v, (0, k), (height, 1))[:, 0]
        rcol = jax.lax.dynamic_slice(sk_raw, (0, k), (height, 1))[:, 0]
        out = jnp.where(rcol, vcol, (pred + dcol) & 0xFFFF)
        newcol = jnp.where(valid, out, 0)
        return jax.lax.dynamic_update_slice(B, newcol[:, None], (0, k))

    B = jax.lax.fori_loop(0, K, body, jnp.zeros((height, K), jnp.int32))
    out = jnp.take_along_axis(B, 2 * i_col + jnp.arange(width, dtype=jnp.int32)[None, :], axis=1)
    return out.astype(jnp.uint16).reshape(-1)


@partial(jax.jit, static_argnames=("width", "height"))
def zzd_inverse_device(syms: jax.Array, width: int, height: int):
    """Invert the zz-direct predictor: unzigzag then per-row prefix sum
    modulo 2^16.  No escapes exist (the mod-2^16 mapping is bijective),
    so this is the cheapest possible inversion — one cumsum."""
    v = syms[: width * height].astype(jnp.uint32)
    dz = ((v >> 1) ^ (-(v & 1))).astype(jnp.int32)
    img = jnp.cumsum(dz.reshape(height, width), axis=1)
    return (img & 0xFFFF).astype(jnp.uint16).reshape(-1)


@partial(jax.jit, static_argnames=("width", "height"))
def pdd_inverse_device(syms: jax.Array, width: int, height: int):
    """Invert the plane-direct predictor (residual = p - W - N + NW mod
    2^16, ZigZag-coded): unzigzag, then row cumsum, then column cumsum —
    the 2D difference's inverse is a separable double prefix sum, so the
    decode is exactly two log-depth scans (both axes fully parallel).

    This is the ratio mode of the device format: the plane predictor
    (JPEG predictor 4 / CALIC's initial estimate — the reference's
    gradient predictor starts from the same W+N-NW term,
    deltagradcompressu16.go:149-166) tracks avg(left,top) closely on
    smooth modalities while keeping a scan-only inverse."""
    v = syms[: width * height].astype(jnp.uint32)
    dz = ((v >> 1) ^ (-(v & 1))).astype(jnp.int32)
    img = jnp.cumsum(dz.reshape(height, width), axis=1)
    img = jnp.cumsum(img & 0xFFFF, axis=0)
    return (img & 0xFFFF).astype(jnp.uint16).reshape(-1)


@partial(jax.jit, static_argnames=("width", "height"))
def vdd_inverse_device(syms: jax.Array, width: int, height: int):
    """Invert the vertical-direct predictor: unzigzag then per-COLUMN
    prefix sum modulo 2^16 — columns are the parallel axis, so this is
    as cheap as the zzd inverse.  (vdd wins on modalities with vertical
    structure, e.g. CT2/MR2 in the corpus.)"""
    v = syms[: width * height].astype(jnp.uint32)
    dz = ((v >> 1) ^ (-(v & 1))).astype(jnp.int32)
    img = jnp.cumsum(dz.reshape(height, width), axis=0)
    return (img & 0xFFFF).astype(jnp.uint16).reshape(-1)
