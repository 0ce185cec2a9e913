"""Compiled-kernel correctness gate (run on real TPU, < 60 s).

The interpret-mode suite can drift from what Mosaic actually compiles;
this gate runs every Pallas kernel COMPILED on tiny shapes and asserts
bit-exactness against the numpy tier.  Invoke from a TPU session:

    MIC_TPU_TEST_TPU=1 python -m pytest tests -m device_compiled -q

(benchmarks/tpu_session.py runs it as its first step).
"""

import numpy as np
import pytest

import jax

pytestmark = [
    pytest.mark.device_compiled,
    pytest.mark.skipif(
        jax.default_backend() not in ("tpu", "axon"),
        reason="needs a real TPU (MIC_TPU_TEST_TPU=1)",
    ),
]


def _tiny_image(rng, h=16, w=128, scale=11, base=700, clip=4095):
    img = (rng.standard_normal((h, w)).cumsum(axis=1) * scale + base).astype(np.int32)
    return img.clip(0, clip).astype(np.uint16)


def test_fused_zzd_kernel_compiled(rng):
    from mic_tpu.tpu.strips import micw_compress, micw_decompress_device_pallas

    img = _tiny_image(rng)
    px = img.ravel()
    blob = micw_compress(px, 128, 16, int(px.max()), num_strips=2, predictor="zzd")
    out, w, h = micw_decompress_device_pallas(blob)
    assert np.array_equal(out, px)


def test_packed_kernel_rle_modes_compiled(rng):
    from mic_tpu.tpu.strips import micw_compress, micw_decompress_device_pallas

    img = _tiny_image(rng, h=32)
    img[16:] = np.where(img[16:] > 800, img[16:], 0)  # runs -> RLE modes
    px = img.ravel()
    for pred in ("zz", "avg", "vdd"):
        blob = micw_compress(px, 128, 32, int(px.max()), num_strips=2, predictor=pred)
        out, _, _ = micw_decompress_device_pallas(blob)
        assert np.array_equal(out, px), pred


def test_fused_rle_kernel_compiled(rng):
    """The fused r-mode kernel (rans_decode_pallas_rle[_alias]) Mosaic-
    compiled at tiny shapes — the r5 rbest capture 500'd on every image
    containing an r-strip (results/watch/run_100150/bench_rbest.log),
    a gap this gate previously left uncovered."""
    from mic_tpu.tpu.strips import micw_compress, micw_decompress_device_pallas

    img = _tiny_image(rng, h=32)
    img[16:] = np.where(img[16:] > 800, img[16:], 0)  # runs -> RLE wins
    px = img.ravel()
    for pred in ("zzr", "vdr", "pdr"):
        for ent in ("standard", "alias"):
            blob = micw_compress(px, 128, 32, int(px.max()), num_strips=2,
                                 predictor=pred, entropy=ent)
            out, _, _ = micw_decompress_device_pallas(blob)
            assert np.array_equal(out, px), (pred, ent)


def test_auto_mixed_modes_compiled(rng):
    from mic_tpu.tpu.strips import micw_compress, micw_decode_many

    img = _tiny_image(rng, h=48)
    img[32:] = 777  # constant strip
    px = img.ravel()
    blob = micw_compress(px, 128, 48, int(px.max()), num_strips=3)
    res = micw_decode_many([blob, blob])
    for out, w, h in res:
        assert np.array_equal(out, px)


def test_encode_kernel_compiled(rng):
    from mic_tpu.tpu.device_rans import mict_encode
    from mic_tpu.tpu.pallas_enc import mict_encode_device_batch

    img = _tiny_image(rng)
    d = img.astype(np.int64)
    left = np.zeros_like(d)
    left[:, 1:] = d[:, :-1]
    syms = (((d - left).astype(np.uint16).astype(np.int16).astype(np.int32) << 1)
            ^ ((d - left).astype(np.uint16).astype(np.int16).astype(np.int32) >> 15)
            & 0xFFFF).astype(np.uint16).ravel()
    host = mict_encode(syms, lanes=128, max_table_log=12)
    dev = mict_encode_device_batch([syms])[0]
    assert host == dev


def test_alias_kernel_compiled(rng):
    """FF 41 alias containers through the plan paths, Mosaic-compiled:
    fused direct modes and the alias post path, plus the escape-folded
    case (spiky content -> alphabet > 255 kept)."""
    from mic_tpu.tpu.strips import micw_compress, micw_decompress_device_pallas

    img = _tiny_image(rng, h=32)
    px = img.ravel()
    for pred in ("auto-fast", "zzr"):
        blob = micw_compress(px, 128, 32, int(px.max()), num_strips=2,
                             predictor=pred, entropy="alias")
        out, _, _ = micw_decompress_device_pallas(blob)
        assert np.array_equal(out, px), pred
    spiky = img.astype(np.int32)
    m = rng.random(img.shape) < 0.05
    spiky = np.where(m, rng.integers(0, 4095, img.shape), spiky).astype(np.uint16)
    px2 = spiky.ravel()
    blob = micw_compress(px2, 128, 32, int(px2.max()), num_strips=2,
                         predictor="zzd", entropy="alias")
    out, _, _ = micw_decompress_device_pallas(blob)
    assert np.array_equal(out, px2)


def test_alias_encode_kernel_compiled(rng):
    """Device alias ENCODE (rans_encode_pallas_alias), Mosaic-compiled:
    blobs must be byte-identical to the host alias encoder."""
    from mic_tpu.tpu.device_rans import mict_encode_alias
    from mic_tpu.tpu.pallas_enc import mict_encode_device_batch

    streams = []
    for n, alpha in [(4096, 60), (6000, 300)]:
        streams.append(
            np.minimum(rng.geometric(2.0 / alpha, n), alpha).astype(np.uint16))
    host = [mict_encode_alias(s, table_log=12) for s in streams]
    dev = mict_encode_device_batch(streams, alias=True)
    for hb, db in zip(host, dev):
        assert hb == db


def test_two_table_kernel_compiled():
    """tl=13 strip (packed-ineligible: the packed kernel caps at tl=12)
    through the two-table kernel, compiled.

    tl=13 needs >=2^15 source symbols (optimalTableLog's maxBitsSrc cap,
    fsecompressu16.go:480-518) and a dense >512-wide alphabet to trigger
    the density bump — hence the 64Ki sample size."""
    import jax.numpy as jnp

    from mic_tpu.tpu.device_rans import mict_decode_numpy, mict_encode, mict_parse
    from mic_tpu.tpu.pallas_rans import build_pallas_tables, build_packed_tables, rans_decode_pallas

    lrng = np.random.default_rng(20240814)
    syms = (lrng.standard_normal(65536) * 600 + 2000).clip(0, 4095).astype(np.uint16)
    blob = mict_encode(syms, lanes=128)
    p = mict_parse(blob)
    assert p[1] == 13 and build_packed_tables([p], p[1]) is None
    init, tsym, tfb, words, mask, shift, counts, steps = build_pallas_tables([p], p[1])
    out = rans_decode_pallas(
        *[jnp.asarray(a) for a in (init, tsym, tfb, words, mask, shift)],
        steps=steps, n_strips=1, table_log=p[1],
    )
    got = np.asarray(out).reshape(-1)[: p[2]]
    assert np.array_equal(got, mict_decode_numpy(blob))
