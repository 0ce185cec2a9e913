"""Headline benchmark: corpus-geomean fused device decode throughput.

Decodes the full available reference corpus (10 real medical images,
mixed sizes and statistics) through the MICW v5 device path: per-strip
adaptive streams (zzd/vdd/pdd/zz modes), the Pallas wide-lane rANS
kernels (fused zzd kernel emits pixels; pdd adds a column cumsum in the
same program; RLE strips ride the packed kernel + the jitted post
program).  Each image is replicated into a service-sized batch and
measured in sustained steady state (compressed payloads and tables stay
staged, outputs stay device-resident — the shape of a decode service
feeding a TPU pipeline); the headline is the geomean of per-image GB/s,
matching the reference's per-image-geomean methodology
(docs/benchmarks.md).

Round-3 restructuring (VERDICT.md tasks 1/2/6):

* One image per subprocess, in family-warming order: the first image of
  each program family pays the XLA compiles, and the tunnel's service
  caches executables ACROSS clients, so later same-family images claim
  and run in seconds.  Wide images (MR2/XA1, 1024 px) are stored BANDED
  (512-wide column bands, strips.band_split), which dissolves the
  1024-wide program family whose ~13-minute compiles starved the
  round-2 capture.
* Tunnel-claim watchdog: backend claims wedge sporadically (a process
  killed mid-claim can poison the next claim), so each child announces
  {"claimed": true} after a trivial first op and the parent kills +
  retries children whose claim doesn't land within CLAIM_TIMEOUT_S.
  Within a child, all device->host verification happens AFTER timing
  (one d2h drops the client into a ~300x slower sync-per-dispatch
  mode).
* A global wall-clock budget (MIC_BENCH_BUDGET_S, default 1200 s) bounds
  the whole run; when it expires the final JSON line is emitted with
  whatever was measured plus a "measured_n" field — the driver always
  sees a parseable result.
* Small images replicate up to 512x so every batch reaches the 64 MB
  target that amortizes dispatch (MR at 128 replicas was launch-bound).

Prints a device-ENCODE metric line, then ONE final JSON line:
  {"metric": ..., "value": N, "unit": "GB/s", "vs_baseline": N, ...}
and writes the per-image breakdown to results/bench_detail.json.

Baseline: the reference's headline 7.5 GB/s geomean decompression
(README.md:17, 64-core ARM server) — see BASELINE.md.
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
TARGET_BATCH_BYTES = int(os.environ.get("MIC_BENCH_BATCH_BYTES", 64 << 20))
MAX_REPLICAS = int(os.environ.get("MIC_BENCH_MAX_REPLICAS", 512))
TARGET_STRIPS = int(os.environ.get("MIC_BENCH_TARGET_STRIPS", 1024))
REPS = int(os.environ.get("MIC_BENCH_REPS", 20))
BUDGET_S = float(os.environ.get("MIC_BENCH_BUDGET_S", "1200"))
VERIFY_RESERVE_S = float(os.environ.get("MIC_BENCH_VERIFY_RESERVE_S", "420"))

# Measurement groups: one subprocess each, images ordered so the group's
# first image warms the compiled-program family for the rest.  Grouped by
# post-banding strip width (512-wide first: most of the corpus).
GROUPS = [
    ["CT", "CT1", "CT2"],        # 512-wide, 16-bit family
    ["MR1", "MR3", "MR4"],       # 512-wide, 11-12-bit family
    ["MR2", "XA1"],              # 1024 px -> banded to 512-wide strips
    ["MR", "NM1"],               # 256-wide family
]


def _corpus():
    from benchmarks.run_benchmarks import load_corpus

    corpus = load_corpus(False)
    if corpus:
        return corpus
    rng = np.random.default_rng(0)
    img = (rng.standard_normal((512, 512)).cumsum(1).cumsum(0) * 40 + 2000)
    px = np.clip(img, 0, 4095).astype(np.uint16).ravel()
    return [("SYN", px, 512, 512, int(px.max()))]


def run_group(names: list[str], reps: int) -> None:
    """Measure a group of corpus images (subprocess entry).  Prints one
    JSON line per image.

    Order matters on the tunneled backend: ALL images are staged and
    timed first (device-resident steady state, block_until_ready
    pipelined), then every image is verified (device-side compare; one
    boolean crosses back per image).  Any device->host pull drops this
    tunnel's client into a sync-per-dispatch mode ~300x slower for the
    rest of its life, so verification runs strictly after the last
    timing loop.

    Plausibility note: per-rep times here are dispatch-pipeline bound
    (~0.4-2 ms) and sit ABOVE the kernels' compute time (the fused-zzd
    batch is ~68 GFLOP per 64 MB at 8-bit-lane MXU rates, ~0.34 ms), so
    sustained numbers well past round 1's 13.4 GB/s are physically
    consistent — round 1's plan dispatched many launches per rep and
    was launch-latency bound; the chunked lax.map plan dispatches a
    handful.
    """
    import jax
    import jax.numpy as jnp

    jax.devices()
    # Trivial first op, then tell the parent the tunnel claim succeeded:
    # claims wedge sporadically (a process killed mid-claim can poison
    # the next claim), so the parent watchdogs this line and retries the
    # subprocess instead of burning the whole group timeout on a wedge.
    jnp.zeros((8, 128), jnp.uint32).block_until_ready()
    print(json.dumps({"claimed": True}), flush=True)

    from mic_tpu.tpu.strips import MicwDecodePlan, micw_compress

    corpus = {c[0]: c for c in _corpus()}
    t_last = time.time()

    def phase(tag):
        nonlocal t_last
        now = time.time()
        print(json.dumps({"phase": tag, "s": round(now - t_last, 1)}), flush=True)
        t_last = now

    staged = []  # (name, plan, decoded, dt, cold_dt, k, px, blob_len)
    for name in names:
        if name not in corpus:
            print(json.dumps({"name": name, "error": "not in corpus"}), flush=True)
            continue
        _n, px, w, h, mx = corpus[name]
        blob = micw_compress(px, w, h, mx)
        phase(f"{name}:compress")
        # Replicate to a fixed TOTAL strip count (default 1024 = 32
        # lax.map chunks): every corpus image then runs the SAME chunked
        # program shapes (n_chunks is part of the executable), so one
        # image's compile warms the whole corpus.  Batches land at
        # 64-256 MB — at or above the dispatch-amortizing target.
        from mic_tpu.tpu.strips import micw_parse

        n_strips = micw_parse(blob)[2]
        k = max(1, min(MAX_REPLICAS, TARGET_STRIPS // max(1, n_strips)))
        plan = MicwDecodePlan([blob] * k)
        phase(f"{name}:stage")
        decoded = plan.run()
        for v in decoded.values():
            if v is not None:
                v.block_until_ready()
        phase(f"{name}:first_run")
        t0 = time.time()
        for _ in range(reps):
            decoded = plan.run()
        for v in decoded.values():
            if v is not None:
                v.block_until_ready()
        dt = (time.time() - t0) / reps
        # Cold path (VERDICT weak #2): header parse + table build + pad +
        # h2d + one decode, with warm executables (compile amortized away,
        # as in a serving process) — the stage+run number the reference's
        # full-path MB/s corresponds to.
        t0 = time.time()
        plan_c = MicwDecodePlan([blob] * k)
        decoded_c = plan_c.run()
        for v in decoded_c.values():
            if v is not None:
                v.block_until_ready()
        cold_dt = time.time() - t0
        phase(f"{name}:cold")
        staged.append((name, plan, decoded, dt, cold_dt, k, px, len(blob)))

    # No verification here: a single scalar d2h costs 20-300 s on the
    # tunneled backend (measured; the compare itself is <1 s), so the
    # parent runs ONE --verify-all subprocess for the whole corpus after
    # timing — same plans, same compiled programs, one scalar pull total.
    for name, plan, decoded, dt, cold_dt, k, px, blen in staged:
        print(json.dumps({
            "name": name,
            "GBps": round(k * px.nbytes / dt / 1e9, 3),
            "cold_GBps": round(k * px.nbytes / cold_dt / 1e9, 3),
            "replicas": k,
            "ratio": round(px.nbytes / blen, 3),
            "bytes": blen,
        }), flush=True)


def run_verify_all(names: list[str]) -> None:
    """Verify every named image's full replicated batch with ONE scalar
    d2h for the whole corpus (subprocess entry).  Re-stages the same
    plans the timing children ran (identical programs and inputs —
    deterministic), runs each once, accumulates the per-bucket mismatch
    counts on device, and pulls a single combined total."""
    import jax
    import jax.numpy as jnp

    jax.devices()
    jnp.zeros((8, 128), jnp.uint32).block_until_ready()
    print(json.dumps({"claimed": True}), flush=True)

    from mic_tpu.tpu.strips import MicwDecodePlan, micw_compress, micw_parse

    corpus = {c[0]: c for c in _corpus()}
    totals = []
    host_ok = True
    done = []
    for name in names:
        if name not in corpus:
            continue
        _n, px, w, h, mx = corpus[name]
        blob = micw_compress(px, w, h, mx)
        n_strips = micw_parse(blob)[2]
        k = max(1, min(MAX_REPLICAS, TARGET_STRIPS // max(1, n_strips)))
        plan = MicwDecodePlan([blob] * k)
        decoded = plan.run()
        ok, total = plan.verify_batch_device(decoded, [px] * k)
        if not ok:
            host_ok = False
            print(json.dumps({"verify_host_fail": name}), flush=True)
            continue
        if total is not None:
            totals.append((name, total))
        done.append(name)
        print(json.dumps({"verify_staged": name}), flush=True)
    mism = 0
    if totals:
        t = totals[0][1]
        for _n, x in totals[1:]:
            t = t + x
        mism = int(t)  # the one scalar pull
    if host_ok and mism == 0:
        good = done
    else:
        # Failure path only: pay per-image pulls to attribute the
        # mismatch, so the parent can still report the clean images.
        bad = {n for n, x in totals if int(x) != 0}
        good = [n for n in done if n not in bad]
    print(json.dumps({
        "verified_all": bool(host_ok and mism == 0),
        "verified_names": good,
        "mismatches": mism,
    }), flush=True)


def run_encode(reps: int) -> None:
    """Device-ENCODE metric (subprocess entry): the Pallas rANS encode
    kernel (pallas_enc) over a service-sized batch of CT strips.
    Steady state mirrors the decode bench: the symbol/rank staging stays
    pinned, the timed loop is the encode kernel launch; blobs are
    byte-identical to the host encoder (verified after timing).
    Reference encode baseline: PICS-8 1.2-2.1 GB/s (README.md:392-447).
    """
    import jax
    import jax.numpy as jnp

    jax.devices()
    jnp.zeros((8, 128), jnp.uint32).block_until_ready()
    print(json.dumps({"claimed": True}), flush=True)

    from mic_tpu.ops.fse import histogram, normalize_count, optimal_table_log
    from mic_tpu.tpu.device_rans import device_tables
    from mic_tpu.tpu.pallas_enc import build_enc_tables, rans_encode_pallas
    from mic_tpu.tpu.strips import _zzd_syms

    corpus = {c[0]: c for c in _corpus()}
    if "CT" not in corpus:
        print(json.dumps({"error": "no corpus"}), flush=True)
        return
    _n, px, w, h, mx = corpus["CT"]
    k = max(1, min(MAX_REPLICAS, TARGET_BATCH_BYTES // px.nbytes))
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
    out = rans_encode_pallas(*args, steps=steps, n_strips=S, asweep=asweep)
    for o in out:
        o.block_until_ready()
    # Each rep gets a DISTINCT pre-staged rank operand (one symbol of
    # strip 0 toggled between equal-rank values is not guaranteed safe,
    # so vary the replica order instead): identical async launches were
    # elided by the backend (a 20-rep loop of the same args measured
    # "2682 GB/s" = dispatch enqueue), while chaining rep N's input on
    # rep N-1's output serializes on ~75 ms tunnel RPCs (1.1 GB/s).
    # Distinct inputs keep the pipeline async AND force real encodes.
    n_var = min(4, reps)
    rk_reps = []
    for i in range(n_var):
        rolled = np.roll(rep(rk).reshape(S, steps, 128), i * n_strips, axis=0)
        rk_reps.append(jnp.asarray(rolled))
    for a in rk_reps:
        a.block_until_ready()
    t0 = time.time()
    outs = [
        rans_encode_pallas(rk_reps[i % n_var], *args[1:], steps=steps,
                           n_strips=S, asweep=asweep)
        for i in range(reps)
    ]
    for out in outs:
        for o in out:
            o.block_until_ready()
    dt = (time.time() - t0) / reps
    out = outs[0]
    print(json.dumps({
        "encode_GBps": round(k * px.nbytes / dt / 1e9, 3),
        "replicas": k,
    }), flush=True)


CLAIM_TIMEOUT_S = float(os.environ.get("MIC_BENCH_CLAIM_TIMEOUT_S", "150"))
CLAIM_RETRIES = int(os.environ.get("MIC_BENCH_CLAIM_RETRIES", "2"))


def _run_sub_once(argv: list[str], timeout: float):
    """Run one bench subprocess with a tunnel-claim watchdog.

    The child prints {"claimed": true} right after its first trivial
    device op.  Claims wedge sporadically on the tunneled backend (a
    process killed mid-claim can poison the next claim), so if that
    line doesn't appear within CLAIM_TIMEOUT_S the child is killed and
    ("wedged", []) is returned — the caller retries instead of burning
    the whole timeout.  Returns (status, json_lines).
    """
    import selectors

    proc = subprocess.Popen(
        [sys.executable, str(ROOT / "bench.py"), *argv],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
    )
    sel = selectors.DefaultSelector()
    sel.register(proc.stdout, selectors.EVENT_READ)
    out, claimed = [], False
    deadline_claim = time.time() + CLAIM_TIMEOUT_S
    deadline_all = time.time() + timeout
    status = "ok"
    try:
        buf = ""
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
            buf = chunk.strip()
            if not buf:
                continue
            try:
                rec = json.loads(buf)
            except json.JSONDecodeError:
                continue
            if rec.get("claimed"):
                claimed = True
            elif "phase" in rec:
                print(f"[bench]   {rec['phase']}: {rec['s']}s",
                      file=sys.stderr, flush=True)
            else:
                out.append(rec)
    finally:
        sel.close()
        if proc.poll() is None:
            proc.kill()
        try:
            proc.wait(timeout=30)
        except subprocess.TimeoutExpired:
            pass
    return status, out


def _run_sub(argv: list[str], timeout: float, remaining=None):
    """Claim-watchdogged subprocess with wedge retries."""
    for attempt in range(CLAIM_RETRIES + 1):
        if remaining is not None and remaining() < 60:
            return [{"error": "budget"}]
        t = timeout if remaining is None else max(60.0, min(timeout, remaining()))
        status, out = _run_sub_once(argv, t)
        if status == "ok":
            return out
        print(f"[bench] subprocess {argv} {status} (attempt {attempt + 1})",
              file=sys.stderr, flush=True)
        if status == "timeout":
            return out + [{"error": "TimeoutExpired"}]
        time.sleep(5)  # wedged: brief pause, then retry the claim
    return [{"error": "claim wedged"}]


def main() -> None:
    t_start = time.time()
    remaining = lambda: BUDGET_S - (time.time() - t_start)
    detail = {}
    rates = []
    res_dir = ROOT / "results"
    res_dir.mkdir(exist_ok=True)
    corpus_names = [c[0] for c in _corpus()]
    total_n = len(corpus_names)
    encode_gbps = None

    # One image per subprocess, in family-warming order (the first image
    # of each group compiles its program family; the tunnel's service
    # caches executables across clients, so the rest claim + run in
    # seconds).  Per-image isolation keeps one wedged claim or one slow
    # verify from starving the rest of the corpus.
    for group in GROUPS:
        group = [n for n in group if n in corpus_names]
        for name in group:
            if remaining() < VERIFY_RESERVE_S + 60:
                print(f"[bench] budget exhausted before {name} "
                      f"(reserving {int(VERIFY_RESERVE_S)}s for verify-all)",
                      file=sys.stderr, flush=True)
                break
            print(f"[bench] {name} (subprocess, {int(remaining())}s left)...",
                  file=sys.stderr, flush=True)
            results = _run_sub(["--group", name, "--reps", str(REPS)],
                               timeout=600.0, remaining=remaining)
            got = {r.get("name"): r for r in results if "name" in r}
            res = got.get(name, {"name": name,
                                 "error": results[-1].get("error", "missing")
                                 if results else "missing"})
            if "GBps" in res:
                detail[name] = {kk: res[kk] for kk in
                                ("GBps", "cold_GBps", "replicas", "ratio", "bytes")
                                if kk in res}
                print(f"[bench] {name}: {res['GBps']} GB/s (x{res['replicas']})",
                      file=sys.stderr, flush=True)
            else:
                detail[name] = res
                print(f"[bench] {name}: FAILED {res.get('error')}",
                      file=sys.stderr, flush=True)
            (res_dir / "bench_detail.json").write_text(json.dumps(detail, indent=1))

    # One verification subprocess for everything measured: a single
    # scalar d2h costs 20-300 s on the tunneled backend, so the corpus
    # shares one pull.  Only images it confirms enter the headline.
    measured = [n for n, d in detail.items() if "GBps" in d]
    verified = []
    responded = False
    attempt = 0
    while measured and not responded and attempt < 2 and remaining() > 180:
        attempt += 1
        print(f"[bench] verify-all {measured} (attempt {attempt}, "
              f"{int(remaining())}s left)...", file=sys.stderr, flush=True)
        vres = _run_sub(["--verify-all", ",".join(measured)],
                        timeout=max(180.0, remaining() - 30),
                        remaining=None)
        for r in vres:
            if "verified_names" in r:
                responded = True
                verified = r["verified_names"]
                print(f"[bench] verified: {len(verified)}/{len(measured)} "
                      f"(mismatches={r.get('mismatches')})",
                      file=sys.stderr, flush=True)
    for name in measured:
        detail[name]["verified"] = name in verified
        if name in verified:
            rates.append(detail[name]["GBps"])
        else:
            print(f"[bench] {name}: measured but NOT verified — excluded",
                  file=sys.stderr, flush=True)
    (res_dir / "bench_detail.json").write_text(json.dumps(detail, indent=1))

    if remaining() > 90:
        print(f"[bench] encode (subprocess)...", file=sys.stderr, flush=True)
        enc = _run_sub(["--encode", "--reps", str(REPS)],
                       timeout=max(60.0, min(300.0, remaining())),
                       remaining=remaining)
        for r in enc:
            if "encode_GBps" in r:
                encode_gbps = r["encode_GBps"]
                detail["_encode"] = r
                (res_dir / "bench_detail.json").write_text(json.dumps(detail, indent=1))
                print(f"[bench] encode: {encode_gbps} GB/s", file=sys.stderr, flush=True)

    if encode_gbps is not None:
        # Reference encode baseline: PICS-8 parallel encode tops out at
        # ~2.1 GB/s (README.md:392-447).
        print(json.dumps({
            "metric": "pallas_device_encode",
            "value": encode_gbps,
            "unit": "GB/s",
            "vs_baseline": round(encode_gbps / 2.1, 3),
        }))

    if not rates:
        print(json.dumps({
            "metric": "decode_error", "value": 0, "unit": "GB/s",
            "vs_baseline": 0, "measured_n": 0,
        }))
        return
    geomean = math.exp(sum(map(math.log, rates)) / len(rates))
    (res_dir / "bench_detail.json").write_text(json.dumps(detail, indent=1))
    print(
        json.dumps(
            {
                "metric": "pallas_device_decode_corpus_geomean",
                "value": round(geomean, 3),
                "unit": "GB/s",
                "vs_baseline": round(geomean / BASELINE_GBPS, 3),
                "measured_n": len(rates),
                "verified_n": len(verified),
                "total_n": total_n,
            }
        )
    )


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--group", default="")
    ap.add_argument("--one", default="")  # back-compat: single image
    ap.add_argument("--encode", action="store_true")
    ap.add_argument("--verify-all", default="")
    ap.add_argument("--reps", type=int, default=REPS)
    args = ap.parse_args()
    if args.encode:
        run_encode(args.reps)
    elif args.verify_all:
        run_verify_all(args.verify_all.split(","))
    elif args.group:
        run_group(args.group.split(","), args.reps)
    elif args.one:
        run_group([args.one], args.reps)
    else:
        main()
