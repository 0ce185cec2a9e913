"""End-to-end device decode of reference containers (MIC1 / PICS).

Pins tpu.ref_decode against the host tier: same blobs, bit-exact
pixels, across predictor pipelines, state counts, and strip layouts.
"""

import numpy as np
import pytest

from mic_tpu.models.single_frame import (
    compress_single_frame,
    compress_single_frame_4state,
    compress_single_frame_8state,
    compress_single_frame_grad,
    decompress_single_frame,
)
from mic_tpu.parallel.strips import (
    compress_parallel_strips_4state,
    compress_parallel_strips_8state,
    decompress_parallel_strips,
)
from mic_tpu.tpu.ref_decode import (
    decompress_frames_device,
    decompress_pics_device,
    decompress_pics_device_many,
)


@pytest.fixture
def rng():
    return np.random.default_rng(77)


def _image(rng, h, w, scale=5):
    img = (rng.standard_normal((h, w)).cumsum(0).cumsum(1) * scale).astype(np.int64)
    return (img - img.min()).clip(0, 60000).astype(np.uint16).ravel()


@pytest.mark.parametrize(
    "comp",
    [compress_single_frame, compress_single_frame_4state, compress_single_frame_8state],
)
def test_frame_device_matches_host(comp, rng):
    px = _image(rng, 64, 96)
    blob = comp(px, 96, 64, int(px.max()))
    (out,) = decompress_frames_device([blob], [(96, 64)])
    assert np.array_equal(out, decompress_single_frame(blob, 96, 64))
    assert np.array_equal(out, px)


def test_frame_grad_pipeline(rng):
    px = _image(rng, 48, 64)
    blob = compress_single_frame_grad(px, 64, 48, int(px.max()))
    (out,) = decompress_frames_device([blob], [(64, 48)], kind="grad")
    assert np.array_equal(out, px)


def test_frame_batch_mixed_sizes(rng):
    frames = [(_image(rng, h, w), w, h) for h, w in ((32, 64), (64, 64), (96, 128))]
    blobs = [compress_single_frame_4state(p, w, h, int(p.max())) for p, w, h in frames]
    outs = decompress_frames_device(blobs, [(w, h) for _p, w, h in frames])
    for out, (p, _w, _h) in zip(outs, frames):
        assert np.array_equal(out, p)


@pytest.mark.parametrize("comp", [compress_parallel_strips_4state, compress_parallel_strips_8state])
def test_pics_device_matches_host(comp, rng):
    px = _image(rng, 128, 96)
    blob = comp(px, 96, 128, int(px.max()), num_strips=4)
    out, w, h = decompress_pics_device(blob)
    host, hw, hh = decompress_parallel_strips(blob)
    assert (w, h) == (hw, hh) == (96, 128)
    assert np.array_equal(out, host)
    assert np.array_equal(out, px)


def test_pics_many_one_flat_batch(rng):
    imgs = [_image(rng, 64, 64), _image(rng, 96, 64), _image(rng, 64, 128)]
    geo = [(64, 64), (64, 96), (128, 64)]
    blobs = [
        compress_parallel_strips_4state(p, w, h, int(p.max()), num_strips=3)
        for p, (w, h) in zip(imgs, geo)
    ]
    results = decompress_pics_device_many(blobs)
    for (out, w, h), p, (gw, gh) in zip(results, imgs, geo):
        assert (w, h) == (gw, gh)
        assert np.array_equal(out, p)


def test_unsupported_kind_raises(rng):
    px = _image(rng, 32, 32)
    blob = compress_single_frame(px, 32, 32, int(px.max()))
    with pytest.raises(ValueError):
        decompress_frames_device([blob], [(32, 32)], kind="nope")
