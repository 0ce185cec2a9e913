"""Wedge-proofing contracts for the official bench capture (bench.py).

Round-3 postmortem: a fully-wedged tunnel produced BENCH_r03 =
``decode_error, value 0`` AND clobbered the committed 10/10
real-hardware ``results/bench_detail.json`` with ``{}``.  These tests
pin the two fixes (VERDICT r3 next-round #1):

* ``merge_detail`` never returns an overwrite when nothing was measured
  live, and merges partial captures over the prior record.
* ``final_row`` degrades to a flagged stale geomean (never zero) on a
  full wedge, and blends prior rows in for a partial capture so the
  headline always covers the full corpus.
"""

import math
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench


def _row(gbps, verified=True):
    return {"GBps": gbps, "verified": verified, "iters": 10, "replicas": 2}


PRIOR = {
    "CT": _row(13.0),
    "MR": _row(11.0),
    "_encode": {"encode_GBps": 15.9},
    "_meta": {"captured_at": "2026-08-17T00:00:00Z", "entropy": "standard"},
}


def test_merge_refuses_empty_overwrite():
    assert bench.merge_detail(PRIOR, {}, entropy="standard") is None
    # error-only rows (no GBps) also must not trigger a write
    assert bench.merge_detail(PRIOR, {"CT": {"error": "wedged"}},
                              entropy="standard") is None


def test_merge_overlays_partial_capture():
    merged = bench.merge_detail(PRIOR, {"CT": _row(14.0)}, entropy="alias")
    assert merged is not None
    assert merged["CT"]["GBps"] == 14.0          # live row wins
    assert merged["MR"]["GBps"] == 11.0          # prior row preserved
    assert merged["_encode"]["encode_GBps"] == 15.9
    assert merged["_meta"]["entropy"] == "alias"
    assert merged["_meta"]["captured_at"] != PRIOR["_meta"]["captured_at"]


def test_final_row_all_live():
    detail = {"CT": _row(12.0), "MR": _row(12.0)}
    row = bench.final_row(detail, PRIOR, ["CT", "MR"])
    assert row["metric"] == "pallas_device_decode_corpus_geomean"
    assert row["value"] == 12.0
    assert row["live_n"] == 2 and "stale" not in row


def test_final_row_full_wedge_degrades_to_stale():
    row = bench.final_row({}, PRIOR, ["CT", "MR"])
    assert row["value"] > 0
    assert row["stale"] is True
    assert row["live_n"] == 0 and row["stale_n"] == 2
    assert row["captured_at"] == "2026-08-17T00:00:00Z"
    expect = math.exp((math.log(13.0) + math.log(11.0)) / 2)
    assert abs(row["value"] - expect) < 1e-3


def test_final_row_partial_blends_full_corpus():
    detail = {"CT": _row(14.0)}
    row = bench.final_row(detail, PRIOR, ["CT", "MR"])
    assert row["live_n"] == 1 and row["stale_n"] == 1
    assert row["stale"] is True
    expect = math.exp((math.log(14.0) + math.log(11.0)) / 2)
    assert abs(row["value"] - expect) < 1e-3


def test_final_row_unverified_rows_excluded():
    detail = {"CT": _row(99.0, verified=False)}
    row = bench.final_row(detail, PRIOR, ["CT", "MR"])
    # unverified live row falls back to prior CT
    assert row["live_n"] == 0 and row["stale_n"] == 2
    assert row["value"] < 14


def test_final_row_nothing_anywhere_is_error():
    row = bench.final_row({}, {}, ["CT"])
    assert row["metric"] == "decode_error" and row["value"] == 0


def test_small_group_plans_are_macro_timable():
    """Every staging tier must support the honest macro-loop runner —
    including single-group (< chunk-size) r-mode and classic-RLE
    containers, which bench children hit at low replica caps (round-4
    fix: the single-group closures lacked the ``.ops`` contract, so
    ratio-first families fell to ``fallback-staged``)."""
    import numpy as np

    from mic_tpu.tpu.strips import MicwDecodePlan, micw_compress

    r = np.random.default_rng(5)
    yy, xx = np.mgrid[0:128, 0:128]
    px = ((np.sin(xx / 7.0) * 300 + yy * 5 + 900)
          + r.integers(-3, 4, (128, 128))).clip(0, 4095).astype(np.uint16).ravel()
    for pred, ent in (("auto-r", "best"), ("zzr", "standard"),
                      ("avg", "standard"), ("zzd", "standard")):
        blob = micw_compress(px, 128, 128, int(px.max()),
                             predictor=pred, entropy=ent)
        plan = MicwDecodePlan([blob, blob])
        runner = plan.make_timed_runner([px, px])
        assert runner is not None, (pred, ent)
        mism, _probe = runner(1)
        assert int(mism) == 0, (pred, ent)


def test_r_margin_selector(monkeypatch):
    """MICW_R_MARGIN makes the auto-r selector decode-cost-aware: an
    impossible margin collapses the container to the direct family
    (byte-identical to auto-fast); margin 0 keeps pure-size selection;
    either container round-trips."""
    import numpy as np

    from mic_tpu.tpu.strips import micw_compress, micw_decompress_host

    r = np.random.default_rng(9)
    base = np.repeat(r.integers(0, 600, 2048), 8)[: 128 * 96]
    px = base.astype(np.uint16)  # runs -> r-modes win at margin 0

    monkeypatch.delenv("MICW_R_MARGIN", raising=False)
    b0 = micw_compress(px, 128, 96, int(px.max()),
                       predictor="auto-r", entropy="standard")
    monkeypatch.setenv("MICW_R_MARGIN", "1.0")
    b1 = micw_compress(px, 128, 96, int(px.max()),
                       predictor="auto-r", entropy="standard")
    bf = micw_compress(px, 128, 96, int(px.max()),
                       predictor="auto-fast", entropy="standard")
    assert b1 == bf
    assert len(b0) <= len(b1)
    for blob in (b0, b1):
        out, w, h = micw_decompress_host(blob)
        assert np.array_equal(np.asarray(out).ravel(), px)


def test_merge_meta_entropy_from_rows():
    """ADVICE r4: a mixed capture (alias rows + standard rescue rows)
    must label _meta.entropy 'mixed', not the last attempt's env."""
    live = {"CT": {**_row(14.0), "entropy": "alias"},
            "MR": {**_row(12.0), "entropy": "standard"}}
    merged = bench.merge_detail(PRIOR, live, entropy="standard")
    assert merged["_meta"]["entropy"] == "mixed"
    live_one = {"CT": {**_row(14.0), "entropy": "alias"}}
    assert bench.merge_detail(PRIOR, live_one,
                              entropy="standard")["_meta"]["entropy"] == "alias"


def test_rgb_row_measures_on_cpu(monkeypatch, capsys):
    """The RGB bench row (VERDICT r4 #6) through the full plan + macro
    runner on a tiny synthetic RGB image (CPU interpret kernels)."""
    import json

    import numpy as np

    rng = np.random.default_rng(3)
    base = (rng.standard_normal((32, 128, 1)).cumsum(0) * 5 + 120)
    rgb = np.clip(base + rng.integers(0, 3, (32, 128, 3)), 0, 255).astype(np.uint8)
    monkeypatch.setattr(bench, "TARGET_STRIPS", 2)
    monkeypatch.setattr(bench, "MAX_ITERS", 2)
    monkeypatch.setattr(bench, "TARGET_T", 0.01)
    bench._measure_one_rgb("RGBX", ("RGBX", rgb, 128, 32), lambda tag: None)
    rows = [json.loads(line) for line in capsys.readouterr().out.splitlines()
            if line.startswith("{")]
    row = next(r for r in rows if r.get("name") == "RGBX")
    assert row["kind"] == "rgb"
    assert row["verified"] is True
    assert row["GBps"] > 0
    assert row["ratio"] > 1.0
