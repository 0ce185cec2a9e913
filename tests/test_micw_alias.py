"""MICW containers with alias-mapped (FF 41) entropy strips.

``micw_compress(..., entropy="alias")`` writes strips whose Pallas
decode is tableLog-independent; every decode tier must agree bit-exactly
with the pixels: host numpy, Pallas plan paths (micw_decode_many /
micw_decompress_device_pallas), and the XLA scan paths
(micw_decompress_device / micw_decode_batch) whose in-program escape
substitution this file exercises."""

import numpy as np
import pytest

pytest.importorskip("jax")

from mic_tpu.tpu.device_rans import mict_parse  # noqa: E402
from mic_tpu.tpu.strips import (  # noqa: E402
    micw_compress,
    micw_decode_batch,
    micw_decode_many,
    micw_decompress_device,
    micw_decompress_device_pallas,
    micw_decompress_host,
    micw_parse,
    strip_predictor,
)


def _smooth(rng, h, w, scale=11, base=700):
    img = (rng.standard_normal((h, w)).cumsum(axis=1) * scale + base)
    return img.clip(0, 4095).astype(np.uint16)


def _spiky(rng, h, w):
    """Wide-alphabet content: smooth base + salt spikes so the zz-delta
    alphabet exceeds the 255 kept symbols and escape folding triggers."""
    img = _smooth(rng, h, w).astype(np.int32)
    mask = rng.random((h, w)) < 0.03
    img = np.where(mask, rng.integers(0, 4095, (h, w)), img)
    return img.astype(np.uint16)


@pytest.mark.parametrize("pred", ["auto-fast", "zzd", "vdd", "pdd", "zzr", "auto"])
def test_alias_container_all_tiers(rng, pred):
    h, w = 48, 256
    px = _smooth(rng, h, w).ravel()
    blob = micw_compress(px, w, h, int(px.max()), num_strips=3,
                         predictor=pred, entropy="alias")
    parsed = [mict_parse(st[0]) for st in micw_parse(blob)[7]
              if strip_predictor(micw_parse(blob)[5], st[5]) is not None]
    assert all(p[7] is not None for p in parsed), "strips must be FF 41"
    for fn in (micw_decompress_host, micw_decompress_device_pallas,
               micw_decompress_device):
        out, ww, hh = fn(blob)
        assert (ww, hh) == (w, h)
        assert np.array_equal(out, px), fn.__name__
    assert np.array_equal(micw_decode_batch([blob])[0], px)


def test_alias_escape_folding_roundtrip(rng):
    """Spiky content: the zz-delta alphabet exceeds 255 -> escape-folded
    strips; every tier must substitute ESC values correctly."""
    h, w = 32, 256
    px = _spiky(rng, h, w).ravel()
    blob = micw_compress(px, w, h, int(px.max()), num_strips=2,
                         predictor="zzd", entropy="alias")
    n_esc = sum(len(p[7][1]) for p in
                (mict_parse(st[0]) for st in micw_parse(blob)[7])
                if p[7] is not None)
    assert n_esc > 0, "test content failed to trigger escape folding"
    for fn in (micw_decompress_host, micw_decompress_device_pallas,
               micw_decompress_device):
        out, _, _ = fn(blob)
        assert np.array_equal(out, px), fn.__name__


def test_alias_fused_vdd_pdd_with_escapes(rng):
    """Escape substitution inside the FUSED kernel paths (vdd prev-row
    carry and pdd row-scan + outer cumsum), not just raw/zzd — spiky
    vertical/plane-gradient content forces escape-folded avdd/apdd
    strips."""
    h, w = 32, 256
    base = (np.arange(h)[:, None] * 37
            + (rng.standard_normal((h, w)).cumsum(1) * 3).astype(np.int64)
            + 500)
    m = rng.random((h, w)) < 0.02
    img = np.where(m, rng.integers(0, 4095, (h, w)), base)
    px = np.clip(img, 0, 4095).astype(np.uint16).ravel()
    for pred in ("vdd", "pdd"):
        blob = micw_compress(px, w, h, int(px.max()), num_strips=2,
                             predictor=pred, entropy="alias")
        parsed = micw_parse(blob)
        ent = [mict_parse(st[0]) for st in parsed[7]
               if strip_predictor(parsed[5], st[5]) is not None]
        assert ent, f"{pred}: every strip fell to raw"
        n_esc = sum(len(p[7][1]) for p in ent if p[7] is not None)
        assert n_esc > 0, f"{pred}: no escapes triggered"
        out, _, _ = micw_decompress_device_pallas(blob)
        assert np.array_equal(out, px), pred


def test_mixed_standard_alias_plan(rng):
    """One MicwDecodePlan over standard and alias blobs: buckets must not
    mix entropy families, outputs must all be exact."""
    h, w = 48, 256
    px = _smooth(rng, h, w).ravel()
    mx = int(px.max())
    b_std = micw_compress(px, w, h, mx, num_strips=3)
    b_al = micw_compress(px, w, h, mx, num_strips=3, entropy="alias")
    for out, ww, hh in micw_decode_many([b_std, b_al, b_al, b_std]):
        assert (ww, hh) == (w, h)
        assert np.array_equal(out, px)


def test_best_entropy_mixed_container(rng):
    """entropy="best" keeps the smaller of FF 57/FF 41 per strip; the
    container must be <= both pure modes and decode exactly everywhere."""
    h, w = 64, 256
    px = _spiky(rng, h, w).ravel()
    mx = int(px.max())
    b_std = micw_compress(px, w, h, mx, num_strips=2)
    b_al = micw_compress(px, w, h, mx, num_strips=2, entropy="alias")
    b_best = micw_compress(px, w, h, mx, num_strips=2, entropy="best")
    assert len(b_best) <= min(len(b_std), len(b_al)) + 8
    for fn in (micw_decompress_host, micw_decompress_device_pallas):
        out, _, _ = fn(b_best)
        assert np.array_equal(out, px), fn.__name__


def test_best_keeps_wide_alphabet_alias_candidates(rng):
    """Regression: wide-alphabet strips (> MAX_ALPHABET distinct deltas)
    are alias-encodable via escape folding; "best" must not drop them to
    raw just because the standard estimate is infeasible."""
    h, w = 128, 256
    img = np.full((h, w), 800, np.int32)
    m = rng.random((h, w)) < 0.15
    img = np.where(m, rng.integers(0, 40000, (h, w)), img).astype(np.uint16)
    px = img.ravel()
    b_al = micw_compress(px, w, h, int(px.max()), entropy="alias")
    b_best = micw_compress(px, w, h, int(px.max()), entropy="best")
    assert len(b_best) <= len(b_al) + 8
    out, _, _ = micw_decompress_host(b_best)
    assert np.array_equal(out, px)


def test_alias_encoder_caps_table_log_at_12():
    """Regression: optimal_table_log's density rule may bump past the
    request; the alias encoder must hard-cap at 12 (the Pallas bucket
    tables pack 12-bit freq/slot-base fields)."""
    from mic_tpu.tpu.device_rans import mict_encode_alias, mict_parse
    from mic_tpu.tpu.pallas_rans import build_alias_bucket_tables

    lrng = np.random.default_rng(7)
    d = (lrng.standard_normal(131072) * 600 + 2000).clip(0, 4095).astype(np.uint16)
    p = mict_parse(mict_encode_alias(d, table_log=11))
    assert p[1] <= 12
    build_alias_bucket_tables([p])  # must not raise
    # Defensive check: a hand-rolled tl>12 parse is rejected, not
    # silently mispacked.
    import pytest as _pytest

    bogus = (128, 13, p[2], p[3], p[4], p[5], p[6], p[7])
    with _pytest.raises(ValueError, match="tableLog"):
        build_alias_bucket_tables([bogus])


def test_alias_timed_runner(rng):
    """The honest-bench harness (MicwDecodePlan.make_timed_runner) must
    stage alias and best containers without falling back, and the
    in-program verification must pass — the official A/B rides this."""
    from mic_tpu.tpu.strips import MicwDecodePlan

    h, w = 32, 256
    px = _smooth(rng, h, w).ravel()
    for entropy in ("alias", "best"):
        blob = micw_compress(px, w, h, int(px.max()), num_strips=2,
                             entropy=entropy)
        plan = MicwDecodePlan([blob, blob])
        runner = plan.make_timed_runner([px, px])
        assert runner is not None, entropy
        m, _p = runner(2)
        assert int(m) == 0, entropy


def test_alias_ratio_within_one_pct(rng):
    """FF 41's alias layout preserves the normalized frequencies; with
    tl=12 vs the packed cap 11, the alias blob lands within ~1% of the
    standard blob (measured corpus cost: -0.68%)."""
    h, w = 128, 256
    px = _smooth(rng, h, w).ravel()
    mx = int(px.max())
    b_std = micw_compress(px, w, h, mx, num_strips=2)
    b_al = micw_compress(px, w, h, mx, num_strips=2, entropy="alias")
    assert len(b_al) < len(b_std) * 1.02


def test_replicated_plan_chunk_cycle_dedup(rng):
    """Replicated plans whose strips-per-image period does NOT divide
    the chunk size produce chunk operands that repeat in a short cycle
    rather than all-identically (MR2: 6 strips/image over 32-entry
    chunks -> period-3 cycle).  _stack_dev must dedup that cycle (one
    h2d of the unique set + device gather) AND stay bit-exact: this
    pins the decode through a replicated plan at such a geometry."""
    from mic_tpu.tpu.strips import MicwDecodePlan

    h, w = 18, 256  # 3 strips/image at num_strips=3
    px = _smooth(rng, h, w).ravel()
    blob = micw_compress(px, w, h, int(px.max()), num_strips=3,
                         entropy="alias")
    k = 22  # 3*22=66 entries over 32-entry chunks: period-3 key cycle
    plan = MicwDecodePlan([blob] * k)
    runner = plan.make_timed_runner([px] * k)
    assert runner is not None
    m, _p = runner(2)
    assert int(m) == 0
    outs = micw_decode_many([blob] * k)
    for o in outs:
        assert np.array_equal(np.asarray(o[0]).ravel(), px)
