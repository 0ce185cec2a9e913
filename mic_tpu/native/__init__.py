"""ctypes bindings for the native host tier (libmicfse.so).

The native tier mirrors the reference's C pipeline role
(ojph/mic_compress_c.c / mic_decompress_c.c via CGO): the fastest
single-host encode/decode path for the byte-oriented stream formats.
Falls back silently to the numpy tier when the library isn't built
(`make -C mic_tpu/native`).
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

__all__ = [
    "available",
    "compress_frame_native",
    "decompress_frame_native",
    "entropy_compress_native",
    "entropy_decompress_native",
    "decompress_strips_native",
    "read_ncount_native",
    "PRED_AVG",
    "PRED_GRAD",
    "PRED_MED",
    "PRED_ZZ",
]

PRED_AVG, PRED_GRAD, PRED_MED, PRED_ZZ = 0, 1, 2, 3

_LIB = None


def _load():
    global _LIB
    if _LIB is not None:
        return _LIB
    path = os.path.join(os.path.dirname(__file__), "libmicfse.so")
    if not os.path.exists(path):
        _LIB = False
        return False
    lib = ctypes.CDLL(path)
    lib.mic_decompress_frame.restype = ctypes.c_int
    lib.mic_decompress_frame.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_void_p,
    ]
    lib.mic_compress_frame.restype = ctypes.c_size_t
    lib.mic_compress_frame.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_uint16,
        ctypes.c_int, ctypes.c_int, ctypes.c_void_p, ctypes.c_size_t,
    ]
    lib.mic_entropy_compress.restype = ctypes.c_size_t
    lib.mic_entropy_compress.argtypes = [
        ctypes.c_void_p, ctypes.c_size_t, ctypes.c_int, ctypes.c_void_p, ctypes.c_size_t,
    ]
    lib.mic_entropy_decompress.restype = ctypes.c_size_t
    lib.mic_entropy_decompress.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t, ctypes.c_void_p, ctypes.c_size_t,
    ]
    # Optional symbols (absent if an older build of the library is already
    # mapped into this process — dlopen caches by path).
    try:
        lib.mic_read_ncount.restype = ctypes.c_size_t
        lib.mic_read_ncount.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t, ctypes.c_void_p, ctypes.c_size_t,
            ctypes.c_void_p,
        ]
    except AttributeError:
        pass
    try:
        lib.mic_decompress_strips.restype = ctypes.c_int
        lib.mic_decompress_strips.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t, ctypes.c_int, ctypes.c_void_p,
            ctypes.c_int,
        ]
    except AttributeError:
        pass
    _LIB = lib
    return lib


def available() -> bool:
    return bool(_load())


def decompress_frame_native(blob: bytes, width: int, height: int, kind: int = PRED_AVG) -> np.ndarray:
    lib = _load()
    if not lib:
        raise RuntimeError("libmicfse.so not built (make -C mic_tpu/native)")
    out = np.empty(width * height, dtype=np.uint16)
    rc = lib.mic_decompress_frame(
        blob, len(blob), width, height, kind, out.ctypes.data_as(ctypes.c_void_p)
    )
    if rc != 0:
        raise ValueError(f"native decode failed (code {rc})")
    return out


def compress_frame_native(
    pixels: np.ndarray, width: int, height: int, max_value: int,
    kind: int = PRED_AVG, n_states: int = 2,
) -> bytes:
    lib = _load()
    if not lib:
        raise RuntimeError("libmicfse.so not built (make -C mic_tpu/native)")
    px = np.ascontiguousarray(pixels, dtype=np.uint16)
    cap = px.nbytes * 2 + 4096
    out = (ctypes.c_uint8 * cap)()
    n = lib.mic_compress_frame(
        px.ctypes.data_as(ctypes.c_void_p), width, height, max_value, kind,
        n_states, out, cap,
    )
    if n == 0:
        raise ValueError("native compress failed (incompressible or error)")
    return bytes(bytearray(out)[:n])


def entropy_compress_native(symbols: np.ndarray, n_states: int = 4) -> bytes:
    lib = _load()
    if not lib:
        raise RuntimeError("libmicfse.so not built")
    s = np.ascontiguousarray(symbols, dtype=np.uint16)
    cap = s.nbytes * 2 + 4096
    out = (ctypes.c_uint8 * cap)()
    n = lib.mic_entropy_compress(s.ctypes.data_as(ctypes.c_void_p), len(s), n_states, out, cap)
    if n == 0:
        raise ValueError("native entropy compress failed")
    return bytes(bytearray(out)[:n])


def entropy_decompress_native(blob: bytes, max_symbols: int) -> np.ndarray:
    lib = _load()
    if not lib:
        raise RuntimeError("libmicfse.so not built")
    out = np.empty(max_symbols, dtype=np.uint16)
    n = lib.mic_entropy_decompress(blob, len(blob), out.ctypes.data_as(ctypes.c_void_p), max_symbols)
    if n == 0:
        raise ValueError("native entropy decompress failed")
    return out[:n]


def read_ncount_native(data: bytes):
    """Native normalized-count header reader (reference fseu16.go
    readNCount semantics; ~1000x the pure-Python nibble loop).  Returns
    (norm int32[symbol_len], symbol_len, table_log, consumed) or None if
    the native library is unavailable or the header is invalid."""
    lib = _load()
    if not lib or not hasattr(lib, "mic_read_ncount"):
        return None
    out = np.zeros(65536, dtype=np.int32)
    meta = np.zeros(2, dtype=np.int32)
    n = lib.mic_read_ncount(
        bytes(data), len(data), out.ctypes.data, 65536, meta.ctypes.data
    )
    if n == 0:
        return None
    sl, tl = int(meta[0]), int(meta[1])
    return out[:sl].copy(), sl, tl, int(n)


def decompress_strips_native(blob: bytes, kind: int = PRED_AVG, n_threads: int = 0):
    """Threaded PICS decode (reference mic_parallel.c analog).  Returns
    (pixels, width, height)."""
    import struct

    lib = _load()
    if not lib or not hasattr(lib, "mic_decompress_strips"):
        raise RuntimeError("libmicfse.so lacks mic_decompress_strips (rebuild)")
    if len(blob) < 20 or blob[:4] != b"PICS":
        raise ValueError("not a PICS container")
    width, height = struct.unpack_from("<II", blob, 4)
    out = np.empty(width * height, dtype=np.uint16)
    rc = lib.mic_decompress_strips(blob, len(blob), kind, out.ctypes.data, n_threads)
    if rc != 0:
        raise ValueError(f"native strips decode failed (code {rc})")
    return out, width, height
