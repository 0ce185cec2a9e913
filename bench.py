"""Headline benchmark: corpus-geomean fused device decode throughput.

Decodes the full reference corpus (10 real medical images) through the
MICW v5 device path: per-strip adaptive direct/RLE'd-direct streams, the
Pallas wide-lane rANS kernels (fused zzd/pdd kernels emit pixels; r/zz
strips ride the packed kernel + the jitted post program).  Each image is
replicated to a fixed 1024-strip batch (64-256 MB) and measured in
sustained steady state; the headline is the geomean of per-image GB/s,
matching the reference's per-image-geomean methodology
(docs/benchmarks.md).  Baseline: the reference's 7.5 GB/s geomean
decompression (README.md:17, 64-core ARM server) — see BASELINE.md.

Measurement design (round-3 tunnel forensics — ROUND3_NOTES.md):

* ``block_until_ready`` on this tunneled backend acknowledges ENQUEUE,
  not execution (8x more in-program compute left its latency unchanged),
  so async launch loops time dispatch rate — one naive encode loop read
  2.7 TB/s.  The ONLY true sync is a data pull.  Therefore every timed
  quantity here is a **macro-loop**: one launch whose execution is n
  kernel iterations inside a jitted while_loop (operands threaded
  through optimization_barrier so iterations cannot be hoisted), closed
  by a scalar pull.  GB/s = n*batch / (t(n) - t(0)).
* The FIRST device->host pull in a process costs 1-5 minutes (a
  handshake tax; later pulls are ~40 ms).  One subprocess measures the
  whole corpus and pays the tax once, right after claiming.
* Verification is IN the timed program: iteration 0 compares every
  strip of every replica against the expected pixels on device
  (MicwDecodePlan.make_timed_runner); a nonzero mismatch count marks
  the image unverified and drops it from the headline.
* Tunnel claims wedge sporadically (a process killed mid-claim can
  poison the next claim), so the child announces {"claimed": true}
  after a trivial first op and the parent kills + retries on watchdog
  timeout.
* The device-ENCODE metric (pallas_enc, byte-identical blobs) runs in
  the same process with the same macro-loop design.

Prints the encode metric line, then ONE final JSON line:
  {"metric": ..., "value": N, "unit": "GB/s", "vs_baseline": N, ...}
and writes the per-image breakdown to results/bench_detail.json.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import subprocess
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent
sys.path.insert(0, str(ROOT))

import numpy as np

BASELINE_GBPS = 7.5
ENC_BASELINE_GBPS = 2.1  # reference PICS-8 parallel encode (README.md:392-447)
MAX_REPLICAS = int(os.environ.get("MIC_BENCH_MAX_REPLICAS", 512))
TARGET_STRIPS = int(os.environ.get("MIC_BENCH_TARGET_STRIPS", 1024))
TARGET_T = float(os.environ.get("MIC_BENCH_TARGET_T", "3.0"))
MAX_ITERS = int(os.environ.get("MIC_BENCH_MAX_ITERS", "600"))
BUDGET_S = float(os.environ.get("MIC_BENCH_BUDGET_S", "1200"))
CLAIM_TIMEOUT_S = float(os.environ.get("MIC_BENCH_CLAIM_TIMEOUT_S", "150"))
CLAIM_RETRIES = int(os.environ.get("MIC_BENCH_CLAIM_RETRIES", "2"))

# Family-warming order: the first image of each program family pays the
# XLA compiles; the tunnel service caches executables, so later
# same-family images reuse them.
ORDER = ["CT", "CT1", "CT2", "MR1", "MR3", "MR4", "MR2", "XA1", "MR", "NM1"]
# RGB corpus (VERDICT r4 #6): US1/VL1-3/VL6 through MWR3 — each plane is
# a MICW blob riding the same fused kernels; the YCoCg-R inverse is a
# host pass outside the timed program, so the row counts only the RGB
# payload bytes (w*h*3) of the strips the program actually decodes —
# conservative: the kernels decode 2 u16 plane bytes per RGB byte.
RGB_ORDER = ["US1", "VL1", "VL2", "VL3", "VL6"]


def _corpus():
    from benchmarks.run_benchmarks import load_corpus

    corpus = load_corpus(False)
    if corpus:
        return corpus
    rng = np.random.default_rng(0)
    img = (rng.standard_normal((512, 512)).cumsum(1).cumsum(0) * 40 + 2000)
    px = np.clip(img, 0, 4095).astype(np.uint16).ravel()
    return [("SYN", px, 512, 512, int(px.max()))]


def _rgb_corpus():
    try:
        from benchmarks.run_benchmarks import load_rgb_corpus

        return load_rgb_corpus()
    except Exception:
        return []


def run_all(names: list[str]) -> None:
    """Measure + verify every named image, then the encode metric, in ONE
    subprocess (see module docstring for why).  Prints one JSON row per
    image plus an encode row."""
    import jax

    # Harness-test escape hatch: MIC_BENCH_PLATFORM=cpu runs the whole
    # parent/child/watchdog pipeline without the TPU (interpret-mode
    # kernels; pair with tiny caps + MIC_BENCH_ONLY).
    plat = os.environ.get("MIC_BENCH_PLATFORM")
    if plat:
        jax.config.update("jax_platforms", plat)
    import jax.numpy as jnp

    jax.devices()
    jnp.zeros((8, 128), jnp.uint32).block_until_ready()
    print(json.dumps({"claimed": True}), flush=True)

    t_last = time.time()

    def phase(tag):
        nonlocal t_last
        now = time.time()
        print(json.dumps({"phase": tag, "s": round(now - t_last, 1)}), flush=True)
        t_last = now

    # Pay the first-pull handshake tax before anything is timed.
    _ = int(np.asarray(jnp.zeros((), jnp.uint32)))
    phase("d2h_tax")

    from mic_tpu.tpu.strips import MicwDecodePlan, micw_compress, micw_parse

    corpus = {c[0]: c for c in _corpus()}
    rgb = {c[0]: c for c in _rgb_corpus()}
    for name in names:
        if name in corpus:
            meas, entry = _measure_one, corpus[name]
        elif name in rgb:
            meas, entry = _measure_one_rgb, rgb[name]
        else:
            print(json.dumps({"name": name, "error": "not in corpus"}), flush=True)
            continue
        try:
            meas(name, entry, phase)
        except Exception as e:  # report and keep going (XLA OOM etc.)
            print(json.dumps({"name": name, "error": f"{type(e).__name__}: {e}"[:300]}),
                  flush=True)
        import gc

        gc.collect()
        # Dead runners' traced closures can poison jax's lowering cache
        # (KeyError in _lower_jaxpr_to_fun_cached when a later image's
        # macro program lowers); drop the caches between images — the
        # service's executable cache keeps recompiles cheap.
        jax.clear_caches()
        phase(f"{name}:cleanup")

    if os.environ.get("MIC_BENCH_SKIP_ENCODE") != "1":
        _encode_metric(phase)


def _measure_one(name, entry, phase) -> None:
    import jax.numpy as jnp  # noqa: F401  (device initialized by caller)

    from mic_tpu.tpu.strips import MicwDecodePlan, micw_compress, micw_parse

    _n, px, w, h, mx = entry
    # MIC_BENCH_ENTROPY=alias measures the FF 41 alias-bucket kernel
    # (tableLog-independent decode) instead of the packed-sweep kernel.
    # "auto" is a PARENT-level policy (resolved by the probe); a child
    # invoked directly with it measures the standard family.
    ent = os.environ.get("MIC_BENCH_ENTROPY", "standard")
    # MIC_BENCH_PREDICTOR widens the trial set ("auto-r" adds the RLE'd
    # direct modes: +5% corpus ratio, decode pays the SoA-RLE expand
    # post — the ratio-at-speed A/B axis).
    pred = os.environ.get("MIC_BENCH_PREDICTOR", "auto-fast")
    blob = micw_compress(px, w, h, mx, predictor=pred,
                         entropy="standard" if ent == "auto" else ent)
    bw, bh, n_strips, strip_h, _mv, _gp, _lanes, strips = micw_parse(blob)
    # Honest byte accounting: raw/constant strips are materialized
    # host-side at stage time — the timed macro program never touches
    # them — so they must not count toward its throughput (NM1 has one
    # constant strip, 12.5% of its pixels).
    from mic_tpu.tpu.strips import STRIP_MODE_CONST, STRIP_MODE_RAW

    timed_px = sum(
        min(strip_h, bh - i * strip_h) * bw
        for i, st in enumerate(strips)
        if st[5] not in (STRIP_MODE_RAW, STRIP_MODE_CONST)
    )
    timed_bytes = timed_px * 2
    k = max(1, min(MAX_REPLICAS, TARGET_STRIPS // max(1, n_strips)))
    t0 = time.time()
    plan = MicwDecodePlan([blob] * k)
    runner = plan.make_timed_runner([px] * k)
    stage_dt = time.time() - t0
    phase(f"{name}:stage")
    if runner is None:
        print(json.dumps({"name": name, "error": "fallback-staged"}), flush=True)
        return

    def timed(n):
        t = time.time()
        m, p = runner(n)
        m = int(m)
        int(p)
        return time.time() - t, m

    t_compile, _ = timed(0)  # compiles the macro program
    phase(f"{name}:compile")
    t_o, _ = timed(0)  # launch + pull overhead, no iterations
    t_c, m_c = timed(4)  # calibration (includes the compare iter)
    per = max((t_c - t_o) / 4, 1e-5)
    n = int(min(MAX_ITERS, max(8, TARGET_T / per)))
    t_n, m_n = timed(n)
    phase(f"{name}:measure(n={n})")
    dt = max((t_n - t_o) / n, 1e-7)
    verified = (m_c == 0 and m_n == 0)
    print(json.dumps({
        "name": name,
        "GBps": round(k * timed_bytes / dt / 1e9, 3),
        "cold_GBps": round(k * timed_bytes / (stage_dt + per) / 1e9, 3),
        "iters": n,
        "replicas": k,
        # Cold-path forensics (VERDICT r3 #7): stage_s = host staging
        # (parse + tables + operand h2d), compile_s = first-launch cost
        # (XLA compile for a fresh program family; ~launch overhead for
        # a warm family — the "10th image of a family" number).
        "stage_s": round(stage_dt, 3),
        "compile_s": round(t_compile, 3),
        "ratio": round(px.nbytes / len(blob), 3),
        "bytes": len(blob),
        "verified": verified,
        "entropy": ent,
        "pred": pred,
        **({"r_margin": os.environ["MICW_R_MARGIN"]}
           if os.environ.get("MICW_R_MARGIN") else {}),
    }), flush=True)


def _timed_macro(runner, phase, name):
    """The honest macro-loop timing skeleton shared by the grey and RGB
    rows: compile, overhead, calibration, then n in-program iterations.
    Returns (dt_per_iter, n, verified, stage-excluded per-iter calib,
    t_compile)."""
    def timed(n):
        t = time.time()
        m, p = runner(n)
        m = int(m)
        int(p)
        return time.time() - t, m

    t_compile, _ = timed(0)  # compiles the macro program
    phase(f"{name}:compile")
    t_o, _ = timed(0)  # launch + pull overhead, no iterations
    t_c, m_c = timed(4)  # calibration (includes the compare iter)
    per = max((t_c - t_o) / 4, 1e-5)
    n = int(min(MAX_ITERS, max(8, TARGET_T / per)))
    t_n, m_n = timed(n)
    phase(f"{name}:measure(n={n})")
    dt = max((t_n - t_o) / n, 1e-7)
    verified = (m_c == 0 and m_n == 0)
    return dt, n, verified, per, t_compile


def _measure_one_rgb(name, entry, phase) -> None:
    """One RGB corpus row (VERDICT r4 #6): MWR3 = three MICW plane blobs
    decoded through the same fused-kernel plan machinery; the YCoCg-R
    inverse is a vectorized host pass OUTSIDE the timed program, so the
    row conservatively counts only the RGB payload bytes (w*h*3) of the
    strips the program decodes — the kernels actually decode 2 u16 plane
    bytes per RGB byte.  Ratio is the true container ratio
    (rgb_bytes / MWR3 bytes, comparable to README.md:205-216)."""
    import jax.numpy as jnp  # noqa: F401  (device initialized by caller)

    from mic_tpu.ops.color import ycocgr_forward
    from mic_tpu.tpu.rgb_device import _parse as mwr3_parse
    from mic_tpu.tpu.rgb_device import micwr_compress
    from mic_tpu.tpu.strips import (
        STRIP_MODE_CONST,
        STRIP_MODE_RAW,
        MicwDecodePlan,
        micw_parse,
    )

    _n, rgb, w, h = entry
    ent = os.environ.get("MIC_BENCH_ENTROPY", "standard")
    pred = os.environ.get("MIC_BENCH_PREDICTOR", "auto-fast")
    # 64-row plane strips (the greyscale corpus geometry): the default
    # ~128-row strips put 160+ rows in each VL plane strip, and strip
    # height is the serial sweep length on device (~0.5% ratio for ~2x
    # throughput at these sizes).
    blob = micwr_compress(rgb, w, h, num_strips=-(-h // 64), predictor=pred,
                          entropy="standard" if ent == "auto" else ent)
    _w, _h, planes = mwr3_parse(blob)
    from mic_tpu.tpu.rgb_device import _pad_plane

    plane_exp = [_pad_plane(np.asarray(pl, np.uint16), w, h)[0]
                 for pl in ycocgr_forward(rgb, w, h)]
    total_strips = 0
    timed_plane_px = 0
    total_plane_px = 0
    for pb in planes:
        bw, bh, ns, sh, _mv, _gp, _lanes, strips = micw_parse(pb)
        total_strips += ns
        total_plane_px += bw * bh
        timed_plane_px += sum(
            min(sh, bh - i * sh) * bw
            for i, st in enumerate(strips)
            if st[5] not in (STRIP_MODE_RAW, STRIP_MODE_CONST)
        )
    rgb_bytes = int(np.asarray(rgb).nbytes)
    timed_bytes = rgb_bytes * timed_plane_px / float(total_plane_px)
    k = max(1, min(MAX_REPLICAS, TARGET_STRIPS // max(1, total_strips)))
    t0 = time.time()
    plan = MicwDecodePlan(list(planes) * k)
    runner = plan.make_timed_runner(plane_exp * k)
    stage_dt = time.time() - t0
    phase(f"{name}:stage")
    if runner is None:
        print(json.dumps({"name": name, "error": "fallback-staged"}), flush=True)
        return
    dt, n, verified, per, t_compile = _timed_macro(runner, phase, name)
    print(json.dumps({
        "name": name,
        "GBps": round(k * timed_bytes / dt / 1e9, 3),
        "cold_GBps": round(k * timed_bytes / (stage_dt + per) / 1e9, 3),
        "iters": n,
        "replicas": k,
        "stage_s": round(stage_dt, 3),
        "compile_s": round(t_compile, 3),
        "ratio": round(rgb_bytes / len(blob), 3),
        "bytes": len(blob),
        "verified": verified,
        "entropy": ent,
        "pred": pred,
        "kind": "rgb",
        **({"r_margin": os.environ["MICW_R_MARGIN"]}
           if os.environ.get("MICW_R_MARGIN") else {}),
    }), flush=True)


def _encode_metric(phase) -> None:
    """Device-ENCODE macro-loop metric: the Pallas rANS encode kernel
    over a replicated CT strip batch.  Blobs are byte-identical to the
    host encoder (pinned by the pallas_enc tier-equality tests in tests/test_tpu_tier.py);
    this times the kernel in the same barrier-threaded while_loop form
    as decode."""
    import jax
    import jax.numpy as jnp

    from mic_tpu.ops.fse import histogram, normalize_count, optimal_table_log
    from mic_tpu.tpu.device_rans import device_tables
    from mic_tpu.tpu.pallas_enc import build_enc_tables, rans_encode_pallas
    from mic_tpu.tpu.strips import _zzd_syms

    corpus = {c[0]: c for c in _corpus()}
    if "CT" not in corpus:
        print(json.dumps({"error": "no corpus"}), flush=True)
        return
    _n, px, w, h, mx = corpus["CT"]
    k = max(1, min(128, (64 << 20) // px.nbytes))
    strip_h = 64
    n_strips = h // strip_h
    specs, metas = [], []
    for s in range(n_strips):
        sp = px[s * strip_h * w:(s + 1) * strip_h * w]
        syms = _zzd_syms(sp, w, strip_h)
        counts, _mc, sl = histogram(syms)
        tl = min(optimal_table_log(11, len(syms), sl), 12)
        norm = normalize_count(counts, len(syms), tl, sl)
        _sym, _fs, _bs, freq, cumul = device_tables(norm, tl)
        alpha = np.nonzero(freq)[0]
        lut = np.zeros(65536, np.uint16)
        lut[alpha] = np.arange(len(alpha), dtype=np.uint16)
        specs.append((freq[alpha].astype(np.uint32), cumul[alpha].astype(np.uint32)))
        metas.append((len(syms), tl, lut[syms]))
    S = n_strips * k
    steps = max(-(-m[0] // 128) for m in metas)
    steps = (steps + 7) // 8 * 8
    te1_1, te2_1, asweep = build_enc_tables(specs, 12)
    rk = np.zeros((n_strips, steps * 128), np.uint16)
    cnt = np.zeros((n_strips, 128), np.uint32)
    tls = np.zeros((n_strips, 128), np.uint32)
    for i, (n, tl_i, ranks) in enumerate(metas):
        rk[i, :n] = ranks
        cnt[i, :] = n
        tls[i, :] = tl_i
    rep = lambda a: np.repeat(a[None], k, 0).reshape((S,) + a.shape[1:])
    args = (jnp.asarray(rep(rk).reshape(S, steps, 128)), jnp.asarray(rep(te1_1)),
            jnp.asarray(rep(te2_1)), jnp.asarray(rep(cnt)), jnp.asarray(rep(tls)))

    @jax.jit
    def enc_n(n, args):
        def cond(c):
            return c[0] < n

        def body(c):
            i, probe = c
            a_b, p_b = jax.lax.optimization_barrier((args, probe))
            out = rans_encode_pallas(*a_b, steps=steps, n_strips=S, asweep=asweep)
            p = p_b
            for o in out:
                p = p + o.reshape(-1)[:8].astype(jnp.uint32).sum()
            return (i + 1, p)

        _i, probe = jax.lax.while_loop(cond, body, (jnp.int32(0), jnp.uint32(0)))
        return probe

    def timed(n):
        t = time.time()
        int(np.asarray(enc_n(jnp.int32(n), args)))
        return time.time() - t

    timed(0)  # compile
    phase("encode:compile")
    t_o = timed(0)
    t_c = timed(4)
    per = max((t_c - t_o) / 4, 1e-5)
    n = int(min(MAX_ITERS, max(8, TARGET_T / per)))
    t_n = timed(n)
    phase(f"encode:measure(n={n})")
    dt = max((t_n - t_o) / n, 1e-7)
    print(json.dumps({
        "encode_GBps": round(k * px.nbytes / dt / 1e9, 3),
        "iters": n,
        "replicas": k,
    }), flush=True)


def _run_sub_once(argv: list[str], timeout: float, env: dict | None = None):
    """Run one bench subprocess with a tunnel-claim watchdog.  Returns
    (status, json_lines); status "wedged" means the claim line never
    appeared and the caller should retry."""
    import selectors

    def _die_with_parent():
        # If the parent is SIGKILLed (driver timeout), the child must
        # not survive as an orphan holding the device — an orphan
        # contending with the next bench run slowed it ~100x once.
        try:
            import ctypes

            ctypes.CDLL("libc.so.6").prctl(1, 9)  # PR_SET_PDEATHSIG, SIGKILL
        except Exception:
            pass

    proc = subprocess.Popen(
        [sys.executable, str(ROOT / "bench.py"), *argv],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
        preexec_fn=_die_with_parent, env=env,
    )
    sel = selectors.DefaultSelector()
    sel.register(proc.stdout, selectors.EVENT_READ)
    out, claimed = [], False
    deadline_claim = time.time() + CLAIM_TIMEOUT_S
    deadline_all = time.time() + timeout
    status = "ok"
    try:
        while True:
            now = time.time()
            if not claimed and now > deadline_claim:
                status = "wedged"
                break
            if now > deadline_all:
                status = "timeout"
                break
            if not sel.select(timeout=1.0):
                if proc.poll() is not None:
                    break
                continue
            chunk = proc.stdout.readline()
            if chunk == "":
                break  # EOF: child exited
            line = chunk.strip()
            if not line:
                continue
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                continue
            if rec.get("claimed"):
                claimed = True
            elif "phase" in rec:
                print(f"[bench]   {rec['phase']}: {rec['s']}s",
                      file=sys.stderr, flush=True)
            else:
                out.append(rec)
                if "name" in rec and "GBps" in rec:
                    print(f"[bench] {rec['name']}: {rec['GBps']} GB/s "
                          f"(x{rec['replicas']}, n={rec.get('iters')}, "
                          f"verified={rec.get('verified')})",
                          file=sys.stderr, flush=True)
                elif "error" in rec:
                    # Surface child error rows in the driver-visible log:
                    # a silently-skipped image reads as a hang otherwise.
                    print(f"[bench] {rec.get('name', '?')}: ERROR "
                          f"{rec['error']}", file=sys.stderr, flush=True)
    finally:
        sel.close()
        if proc.poll() is None:
            proc.kill()
        try:
            proc.wait(timeout=30)
        except subprocess.TimeoutExpired:
            pass
    return status, out


def probe_alias() -> None:
    """Child probe: compile + execute + verify the alias (FF 41) decode
    programs on tiny shapes.  The parent uses the outcome to pick the
    corpus entropy when MIC_BENCH_ENTROPY=auto — the alias kernel is
    expected faster (no 2^tl/128 table sweep) but must prove it
    compiles and verifies on THIS backend before the capture bets on it.
    """
    import jax

    plat = os.environ.get("MIC_BENCH_PLATFORM")
    if plat:
        jax.config.update("jax_platforms", plat)
    import jax.numpy as jnp

    jax.devices()
    jnp.zeros((8, 128), jnp.uint32).block_until_ready()
    print(json.dumps({"claimed": True}), flush=True)

    from mic_tpu.tpu.strips import MicwDecodePlan, micw_compress

    rng = np.random.default_rng(0)
    # Three bands engineering coverage of the fused alias variants the
    # corpus uses (azzd / avdd / apdd), plus salt spikes in one band so
    # BOTH the escape-free and escaped kernel variants compile.
    h, w = 258, 256
    img = np.empty((h, w))
    img[:86] = rng.standard_normal((86, w)).cumsum(axis=1) * 11 + 700
    img[86:172] = rng.standard_normal((86, w)).cumsum(axis=0) * 11 + 700
    img[172:] = (rng.standard_normal((86, w)).cumsum(0).cumsum(1) * 2 + 700)
    spike = rng.random((86, w)) < 0.02
    img[:86] = np.where(spike, rng.integers(0, 4095, (86, w)), img[:86])
    px = np.clip(img, 0, 4095).astype(np.uint16).ravel()
    blob = micw_compress(px, w, h, int(px.max()), num_strips=3,
                         entropy="alias")
    plan = MicwDecodePlan([blob] * 2)
    runner = plan.make_timed_runner([px] * 2)
    ok = False
    if runner is not None:
        m, p = runner(1)
        ok = int(m) == 0 and int(p) >= 0
    print(json.dumps({"probe_alias": True, "ok": bool(ok)}), flush=True)


def main() -> None:
    t_start = time.time()
    remaining = lambda: BUDGET_S - (time.time() - t_start)
    res_dir = ROOT / "results"
    res_dir.mkdir(exist_ok=True)
    corpus_names = [c[0] for c in _corpus()]
    rgb_names = [c[0] for c in _rgb_corpus()]
    names = [n for n in ORDER if n in corpus_names] + [
        n for n in corpus_names if n not in ORDER
    ] + [n for n in RGB_ORDER if n in rgb_names]
    only = os.environ.get("MIC_BENCH_ONLY")
    if only:
        names = [n for n in names if n in only.split(",")]
    total_n = len(names)

    # Last-good capture (merge target + stale-fallback source).  A wedged
    # tunnel must degrade to a clearly-flagged stale number, never to a
    # zero, and must never clobber a committed real-hardware record.
    detail_name = ("bench_detail_cpu.json"
                   if os.environ.get("MIC_BENCH_PLATFORM")
                   else "bench_detail.json")
    detail_path = res_dir / detail_name
    prior = {}
    try:
        loaded = json.loads(detail_path.read_text())
        if isinstance(loaded, dict):
            prior = loaded
    except (OSError, json.JSONDecodeError):
        pass

    detail = {}  # rows measured live THIS run
    encode_gbps = None
    attempt = 0
    pending = list(names)
    # Default family: alias (FF 41).  Decided by the round-4 full-corpus
    # hardware A/B — alias won on all 10 images (geomean 15.533 GB/s vs
    # 11.106 standard, ratio 3.069 vs 3.090, floor 12.2 vs 8.8 GB/s) —
    # so the capture bets on it directly instead of paying the probe's
    # claim + first-pull + compile tax (the probe's 420s cap was the
    # reason two self-deciding captures fell back to standard).  The
    # attempt-2 retry below still rescues any wedge with the standard
    # family, so a bad alias day degrades, never zeroes.
    entropy = os.environ.get("MIC_BENCH_ENTROPY", "alias")
    if entropy == "auto":
        # Probe the alias kernel on tiny shapes first: compiled + run +
        # verified -> the corpus rides the faster tableLog-independent
        # family; any failure or hang -> the measured-stable standard
        # path.  The probe is cheap (tiny programs) but pays its own
        # claim + first-pull tax, so it gets a hard cap.
        cap = min(420.0, max(120.0, remaining() / 3))
        print(f"[bench] probing alias kernel ({int(cap)}s cap)...",
              file=sys.stderr, flush=True)
        status, rows = _run_sub_once(["--probe-alias"], timeout=cap)
        ok = status == "ok" and any(
            r.get("probe_alias") and r.get("ok") for r in rows)
        entropy = "alias" if ok else "standard"
        print(f"[bench] probe {status} -> corpus entropy {entropy!r}",
              file=sys.stderr, flush=True)
    while pending and attempt <= CLAIM_RETRIES and remaining() > 120:
        attempt += 1
        use = entropy
        if entropy != "standard" and attempt > 1:
            # A non-standard stream family (alias/best) that hung or
            # crashed the first attempt must not burn the whole capture:
            # retries fall back to the measured-stable standard path.
            print("[bench] retrying with standard entropy (first attempt "
                  f"used {entropy!r})", file=sys.stderr, flush=True)
            use = "standard"
        env = {**os.environ, "MIC_BENCH_ENTROPY": use}
        if attempt > 1:
            # The widened trial set (auto-r) rides the same fallback: a
            # crash/hang on attempt 1 must not burn the whole capture.
            env.pop("MIC_BENCH_PREDICTOR", None)
        print(f"[bench] run-all {pending} (attempt {attempt}, "
              f"{int(remaining())}s left)...", file=sys.stderr, flush=True)
        # A non-standard first attempt gets at most 2/3 of the budget so
        # a hang still leaves the standard fallback room to complete
        # (unfinished images mix into the geomean per image either way).
        cap = remaining() - 30
        if entropy != "standard" and attempt == 1:
            cap = cap * 2 / 3
        status, rows = _run_sub_once(["--all", ",".join(pending)],
                                     timeout=max(120.0, cap), env=env)
        for r in rows:
            if "encode_GBps" in r:
                encode_gbps = r["encode_GBps"]
                detail["_encode"] = r
            elif "name" in r:
                if "error" in r and "GBps" in detail.get(r["name"], {}):
                    # A named error row emitted after a successful row for
                    # the same image must not clobber the measurement (and
                    # push the image back into pending).
                    continue
                detail[r["name"]] = {kk: r[kk] for kk in r if kk != "name"}
        # Only a MEASURED image is done — error rows stay pending so a
        # later attempt (possibly with the standard-entropy fallback)
        # can rescue them; CLAIM_RETRIES bounds persistent failures.
        pending = [n for n in pending
                   if "GBps" not in detail.get(n, {})]
        merged = merge_detail(prior, detail, entropy=use)
        if merged is not None:
            detail_path.write_text(json.dumps(merged, indent=1))
        if status == "ok" and not pending:
            break
        print(f"[bench] child {status}; {len(pending)} images pending",
              file=sys.stderr, flush=True)

    if encode_gbps is None and isinstance(prior.get("_encode"), dict):
        # Stale encode fallback: report the last real-hardware encode
        # capture, flagged, instead of dropping the metric.
        enc_prior = prior["_encode"].get("encode_GBps")
        if enc_prior:
            print(json.dumps({
                "metric": "pallas_device_encode",
                "value": enc_prior,
                "unit": "GB/s",
                "vs_baseline": round(enc_prior / ENC_BASELINE_GBPS, 3),
                "stale": True,
            }))
    elif encode_gbps is not None:
        print(json.dumps({
            "metric": "pallas_device_encode",
            "value": encode_gbps,
            "unit": "GB/s",
            "vs_baseline": round(encode_gbps / ENC_BASELINE_GBPS, 3),
        }))

    ing_path = res_dir / "ingest_bench.json"
    try:
        ing = json.loads(ing_path.read_text())
        if ing.get("ingest_MBps"):
            # Echo the committed archive-ingest number in the BENCH tail
            # (reference bar: PICS-C decode 3.7 GB/s on 16 cores,
            # README.md:323 — the CPU pipeline an ingest path fights).
            print(json.dumps({
                "metric": "archive_ingest",
                "value": ing["ingest_MBps"],
                "unit": "MB/s",
                "vs_baseline": round(ing["ingest_MBps"] / 3700.0, 3),
                **{k: ing[k] for k in (
                    "ref_decode_MBps", "micw_encode_MBps",
                    "steady_decode_GBps", "bit_exact", "captured_at")
                   if k in ing},
            }))
    except (OSError, json.JSONDecodeError):
        pass

    print(json.dumps(final_row(detail, prior, names)))


def merge_detail(prior: dict, detail: dict, entropy: str) -> dict | None:
    """Merge this run's live rows over the last-good capture.

    Returns the merged record to persist, or ``None`` when nothing was
    measured live — a failed or partial capture must never overwrite a
    committed real-hardware record with an empty/thinner one (round-3
    postmortem: a fully-wedged run replaced 10 verified images with {}).
    """
    live_rows = {k: v for k, v in detail.items()
                 if isinstance(v, dict) and ("GBps" in v or "encode_GBps" in v)}
    if not live_rows:
        return None
    merged = dict(prior)
    merged.update(live_rows)
    # _meta.entropy comes from the rows themselves: a mixed capture
    # (attempt-1 family rows + attempt-2 standard rescue rows) is
    # labeled 'mixed', not whatever the LAST attempt happened to use.
    ents = {v.get("entropy") for v in live_rows.values()
            if isinstance(v, dict) and v.get("entropy")}
    merged["_meta"] = {
        "captured_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "entropy": ents.pop() if len(ents) == 1 else ("mixed" if ents else entropy),
        "pred": os.environ.get("MIC_BENCH_PREDICTOR", "auto-fast"),
    }
    return merged


def final_row(detail: dict, prior: dict, names: list[str]) -> dict:
    """Build the final headline JSON row from live rows (``detail``) and
    the last-good capture (``prior``).

    Policy (VERDICT r3 weak #2): every corpus image contributes its live
    verified rate when one was measured this run; images the tunnel
    wedged on fall back to the prior committed real-hardware rate,
    explicitly counted in ``stale_n``.  A fully-wedged run thus degrades
    to a flagged stale geomean — never to a zero — and a partial run
    still reports a full-corpus geomean instead of a thin noisy one.
    """

    def _ok(d):
        return isinstance(d, dict) and d.get("verified") and "GBps" in d

    rates, ratios, live_n, stale_n = [], [], 0, 0
    for n in names:
        if _ok(detail.get(n)):
            src, live_n = detail[n], live_n + 1
        elif _ok(prior.get(n)):
            src, stale_n = prior[n], stale_n + 1
        else:
            continue
        rates.append(src["GBps"])
        if src.get("ratio"):
            ratios.append(src["ratio"])
    if not rates:
        return {"metric": "decode_error", "value": 0, "unit": "GB/s",
                "vs_baseline": 0, "measured_n": 0, "verified_n": 0}
    geomean = math.exp(sum(map(math.log, rates)) / len(rates))
    row = {
        "metric": "pallas_device_decode_corpus_geomean",
        "value": round(geomean, 3),
        "unit": "GB/s",
        "vs_baseline": round(geomean / BASELINE_GBPS, 3),
        "measured_n": len(rates),
        "verified_n": len(rates),
        "live_n": live_n,
        "total_n": len(names),
    }
    if ratios:
        # Ratio-at-speed, side by side (VERDICT r3 #3): the compression
        # ratio of the very streams whose decode rate is the headline.
        row["ratio_geomean"] = round(
            math.exp(sum(map(math.log, ratios)) / len(ratios)), 3)
    if stale_n:
        row["stale"] = True
        row["stale_n"] = stale_n
        meta = prior.get("_meta") or {}
        row["captured_at"] = meta.get("captured_at", "r3-committed")
    return row


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--all", default="")
    ap.add_argument("--probe-alias", action="store_true")
    ap.add_argument("--reps", type=int, default=0)  # back-compat, unused
    args = ap.parse_args()
    if args.probe_alias:
        probe_alias()
    elif args.all:
        run_all(args.all.split(","))
    else:
        main()
