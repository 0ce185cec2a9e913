"""Wide-lane interleaved rANS — the TPU device entropy coder.

This is the TPU-native generalization of the reference's multi-state ANS:
where the reference interleaves 2/4/8 tANS states to fill a CPU's
out-of-order pipelines (fse2state.go … fse8state.go, rans8state.go), the
device coder interleaves **L = 128·K lanes** so every VPU lane carries an
independent rANS chain.  Three TPU-first choices:

* **Word-granular renormalization** (classic ryg-style rANS): states are
  u32 in [2^16, 2^32); each decode step consumes 0 or 1 whole u16 word —
  no per-lane bit buffers, so the hot loop is pure u32 vector arithmetic
  (mul/shift/add/select) plus one small table gather.

* **Decoder-order word interleaving**: the encoder walks symbols
  backwards and emits renorm words so that the forward-reading decoder
  finds, at every step, the words for exactly the lanes that renorm, in
  lane order.  The decoder keeps ONE dense cursor; per-step distribution
  is an exclusive prefix-sum over the renorm mask (a log-depth VPU scan)
  plus a contiguous-window gather.

* **Shared header machinery**: symbol statistics ride the same
  normalized-count header as the host FSE formats (write_count /
  read_ncount), so tableLog adaptation and ratio behaviour carry over.

Stream layout (new format, magic 0xFF 0x57 'W'):

    FF 57 | log2_lanes u8 | table_log u8 | count u32 | n_words u32
    normalized-count header (write_count)
    initial states: L x u32 LE  (the decoder's per-lane starting states)
    renorm words:  n_words x u16 LE  (decoder order)

Symbol i belongs to lane ``i % L`` at step ``i // L``; a final partial
step covers ``count % L`` lanes.  Every lane's state must return to
exactly RANS_L (2^16) after the last symbol — a free integrity check the
byte-oriented reference formats don't have.
"""

from __future__ import annotations

import struct

import numpy as np

from ..ops.fse import (
    DEFAULT_TABLE_LOG,
    IncompressibleError,
    UseRLEError,
    histogram,
    normalize_count,
    optimal_table_log,
    read_ncount,
    write_count,
)

__all__ = [
    "MICT_MAGIC",
    "RANS_L",
    "mict_encode",
    "mict_decode_numpy",
    "mict_parse",
    "device_tables",
]

MICT_MAGIC = b"\xffW"
RANS_L = 1 << 16  # state lower bound / renorm threshold


def _freqs_from_norm(norm: np.ndarray) -> np.ndarray:
    """Device frequencies: low-probability (-1) symbols get freq 1; plain
    symbol-order cumulation (the device format's own convention)."""
    return np.where(norm == -1, 1, np.maximum(norm, 0)).astype(np.int64)


def device_tables(norm: np.ndarray, table_log: int):
    """Build the slot-indexed decode table and symbol-indexed encode table.

    Decode step (per lane):  slot = x & mask
        x' = freq[slot] * (x >> tl) + bias[slot]       (bias = slot-local)
        if x' < 2^16:  x' = (x' << 16) | next_word

    Returns (sym[2^tl] u16, freq_slot[2^tl] u32, bias_slot[2^tl] u32,
             freq_sym, cumul_sym).
    """
    freqs = _freqs_from_norm(norm)
    table_size = 1 << table_log
    if int(freqs.sum()) != table_size:
        raise ValueError("device_tables: freqs do not sum to table size")
    cumul = np.concatenate(([0], np.cumsum(freqs)))[:-1]
    present = np.nonzero(freqs)[0]
    sym = np.repeat(present, freqs[present]).astype(np.uint16)
    slot = np.arange(table_size, dtype=np.int64)
    freq_slot = freqs[sym].astype(np.uint32)
    # bias = slot - cumul[sym]  ∈ [0, freq)
    bias_slot = (slot - cumul[sym]).astype(np.uint32)
    return sym, freq_slot, bias_slot, freqs, cumul


def mict_encode(
    symbols,
    lanes: int = 512,
    table_log: int = DEFAULT_TABLE_LOG,
    max_table_log: int | None = None,
    max_bytes: int | None = None,
) -> bytes:
    """Encode a u16 symbol stream into the MICT wide-lane rANS format.

    Fully vectorized across lanes (numpy): the per-step work is u64
    arithmetic on L-vectors; total host work is O(n) with n/L vector steps.
    """
    symbols = np.asarray(symbols, dtype=np.uint16)
    n = len(symbols)
    if n == 0:
        raise IncompressibleError
    counts, max_count, symbol_len = histogram(symbols)
    if max_count == n:
        raise UseRLEError
    if max_count == 1 or max_count < (n >> 15):
        raise IncompressibleError
    tl = optimal_table_log(table_log, n, symbol_len)
    if max_table_log is not None and tl > max_table_log:
        # Hard cap (the adaptive rule bumps tl up by symbol density): the
        # packed Pallas decode kernel needs tl <= 12 so the per-slot
        # (bias, rank) entry fits one u32 gather.  tl=13 measured ~0 gain
        # on the corpus (see results/).
        tl = max_table_log
    norm = normalize_count(counts, n, tl, symbol_len)
    try:
        _sym, _fs, _bs, freq, cumul = device_tables(norm, tl)
    except ValueError as e:
        # Alphabet too wide for the clamped tableLog (tiny inputs) — the
        # same inputs the host FSE formats reject with an error.
        raise IncompressibleError(str(e)) from e
    header = write_count(norm, symbol_len, tl)
    freq_of = freq
    cumul_of = cumul

    L = int(lanes)
    n_steps = (n + L - 1) // L
    states = np.full(L, RANS_L, dtype=np.uint64)
    # Renorm bound: emit while x >= freq << (32 - tl)  (single-word renorm).
    shift = 32 - tl

    step_words: list[np.ndarray] = []
    lane_idx = np.arange(L)

    sym_i64 = symbols.astype(np.int64)
    for t in range(n_steps - 1, -1, -1):
        base = t * L
        cnt = min(L, n - base)
        s = sym_i64[base : base + cnt]
        if cnt < L:
            active = lane_idx < cnt
            s_full = np.zeros(L, dtype=np.int64)
            s_full[:cnt] = s
        else:
            active = None
            s_full = s
        f = freq_of[s_full].astype(np.uint64)
        c = cumul_of[s_full].astype(np.uint64)
        if active is not None:
            f = np.where(active, f, np.uint64(1))  # avoid div-by-zero on pad lanes
        x = states
        x_max = f << np.uint64(shift)
        need = x >= x_max
        if active is not None:
            need &= active
        if need.any():
            # Words for renorming lanes, lane-ascending.  Steps are emitted
            # in reverse (t descending) and the block list reversed at the
            # end, yielding (step asc, lane asc) = decoder order.
            step_words.append((x[need] & np.uint64(0xFFFF)).astype(np.uint16))
            x = np.where(need, x >> np.uint64(16), x)
        x_new = ((x // f) << np.uint64(tl)) + (x % f) + c
        if active is not None:
            x_new = np.where(active, x_new, x)
        states = x_new

    words = (
        np.concatenate(step_words[::-1]) if step_words else np.zeros(0, dtype=np.uint16)
    )

    out = bytearray()
    out += MICT_MAGIC
    out += struct.pack("<BB", int(np.log2(L)), tl)
    out += struct.pack("<II", n, len(words))
    out += header
    out += states.astype("<u4").tobytes()
    out += words.astype("<u2").tobytes()
    # Reject when the blob exceeds the caller's byte budget (default:
    # the stream's own raw size; MICW's r-modes pass the STRIP's raw
    # size instead — their SoA stream is already much shorter than the
    # pixel count, so a locally "incompressible" blob can still beat
    # raw pixels by a wide margin).
    if len(out) >= (n * 2 if max_bytes is None else max_bytes):
        raise IncompressibleError
    return bytes(out)


def mict_parse(blob: bytes):
    """Parse a MICT blob.  Returns
    (lanes, table_log, count, init_states u32[L], words u16[W], norm, symbol_len)."""
    if len(blob) < 12 or blob[:2] != MICT_MAGIC:
        raise ValueError("MICT: missing magic bytes")
    log2_lanes, tl_hdr = struct.unpack_from("<BB", blob, 2)
    count, n_words = struct.unpack_from("<II", blob, 4)
    L = 1 << log2_lanes
    body = blob[12:]
    # Native header reader when built (~1ms/strip in pure Python — it
    # dominated batch-decode latency); falls back to ops.fse.read_ncount.
    from ..native import read_ncount_native

    nat = read_ncount_native(body)
    if nat is not None:
        norm, symbol_len, table_log, consumed = nat
    else:
        norm, symbol_len, table_log, consumed = read_ncount(body)
    if table_log != tl_hdr:
        raise ValueError("MICT: header tableLog mismatch")
    pos = 12 + consumed
    states = np.frombuffer(blob, dtype="<u4", count=L, offset=pos).copy()
    pos += 4 * L
    words = np.frombuffer(blob, dtype="<u2", count=n_words, offset=pos).copy()
    return L, table_log, count, states, words, norm, symbol_len


def mict_decode_numpy(blob: bytes) -> np.ndarray:
    """Host (numpy) reference decoder — bit-exact mirror of the device
    decoder in mic_tpu.tpu.decode; used for cross-tier equality tests."""
    L, tl, count, states, words, norm, _symbol_len = mict_parse(blob)
    sym, freq_slot, bias_slot, _, _ = device_tables(norm, tl)
    mask = (1 << tl) - 1

    n_steps = (count + L - 1) // L
    x = states.astype(np.uint64)
    cursor = 0
    out = np.empty(n_steps * L, dtype=np.uint16)
    lane_idx = np.arange(L)
    words_u64 = words.astype(np.uint64)
    for t in range(n_steps):
        base = t * L
        active = lane_idx < (count - base)
        slot = (x & mask).astype(np.int64)
        out[base : base + L] = sym[slot]
        f = freq_slot[slot].astype(np.uint64)
        b = bias_slot[slot].astype(np.uint64)
        x_new = f * (x >> np.uint64(tl)) + b
        need = (x_new < RANS_L) & active
        k = np.cumsum(need) - need  # exclusive prefix sum
        idx = cursor + k
        w = words_u64[np.minimum(idx, len(words_u64) - 1)] if len(words_u64) else np.zeros(L, np.uint64)
        x_new = np.where(need, (x_new << np.uint64(16)) | w, x_new)
        cursor += int(need.sum())
        x = np.where(active, x_new, x)
    if not np.all(x == RANS_L):
        raise ValueError("MICT: final state mismatch (corrupt stream)")
    if cursor != len(words):
        raise ValueError("MICT: word count mismatch (corrupt stream)")
    return out[:count]
