"""Benchmark: detect+describe+match frames/sec/chip on real hardware.

Measures the full serving pipeline at the reference C++ app's operating
point — fixed 480x640 input (`/root/reference/cpp/src/superpoint.cc:20-26`),
`conf_thresh=0.015, nms_dist=4, cell=8, border=4` — as ONE jitted program:
model forward + softmax/depth-to-space decode + NMS + top-K + bilinear
descriptor sampling + mutual-nearest-neighbor matching against a keyframe.

Timing methodology (round-2 correction): on this environment's relayed TPU,
`jax.block_until_ready` returns on dispatch ACK, NOT device completion —
timings built on it measure the relay's dispatch rate (measured: a 50-frame
scan "finishing" faster than one frame).  Every number below therefore
forces completion by FETCHING a scalar derived from the full pipeline
output.  A synchronous execute+fetch of even a trivial program costs ~33 ms
through the relay, so the benchmark reports:

* ``value``          — batched (b64) frames/s/chip THROUGHPUT: the better
                       of a synchronous execute+fetch loop (``sync_b64_fps``)
                       and a depth-8 software pipeline (``pipelined_b64_fps``,
                       dispatches overlapped, fetches deferred — the same
                       pipeline the native serve binary runs), which stops
                       charging the relay's fixed RTT to every batch;
* ``b1_latency_ms``  — single-frame synchronous latency (relay-dominated
                       here; on a locally attached chip subtract
                       ``relay_execute_ms``);
* ``device_ms_per_frame`` — chip-side per-frame time measured by repeating
                       the pipeline R times INSIDE one jitted program
                       (`lax.scan`, perturbed input) and taking the median
                       of back-to-back (R_hi - R_lo) differences: device
                       time scales with R, the relay round trip does not,
                       and pairing the two runs cancels the relay's
                       minute-scale drift (round-3 correction: the earlier
                       (b64-b8)/56 slope mixed in that drift);
* ``relay_execute_ms`` — the environment's fixed execute+fetch round trip,
                       measured on a one-FLOP program.

Round-5 hardening (the round-4 driver run timed out at rc=124 and published
NOTHING): the headline b64 number is now measured FIRST and its JSON line
printed IMMEDIATELY, then the remaining stages (b1/b8, relay RTT, scan-based
device timing) enrich the record and the full line is re-printed.  Every
enrichment stage is gated on a wall-clock budget (env ``BENCH_BUDGET_S``,
default 1200 s measured from process start); when the budget is exhausted
the remaining stages are skipped (fields stay null) rather than the whole
record being lost.  A consumer should take the LAST JSON line; a truncated
run still leaves the first.  This mirrors the reference's always-on FPS
readout (`/root/reference/python/src/inference.py:107-110`) — a number
every run, no exceptions.

The reference publishes no numbers (BASELINE.md); `vs_baseline` is reported
against the 30 FPS real-time webcam rate its live demos target
(`inference.py:107-110`, `main.cc:104-111`).
"""

import functools
import json
import os
import sys
import time

import numpy as np

_T0 = time.perf_counter()
_BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "1200"))


def _remaining() -> float:
    return _BUDGET_S - (time.perf_counter() - _T0)


def _log(msg: str) -> None:
    print(f"[bench +{time.perf_counter() - _T0:6.1f}s] {msg}", file=sys.stderr)


def _median_fetch_seconds(fn, n, *args) -> float:
    """Median wall time of ``float(fn(*args))`` — the fetch forces device
    completion (block_until_ready does not, through the relay).

    Host→device transfers are DISALLOWED inside the timed region: BENCH_r03's
    headline was 3× under-reported because host-resident weight arrays were
    silently re-uploaded (~8.7 MB through a ~12 MB/s relay) on every timed
    call.  The guard turns that bug class into a hard error.  The scalar
    fetch itself is device→host and stays allowed.
    """
    import jax

    ts = []
    with jax.transfer_guard_host_to_device("disallow"):
        for _ in range(n):
            t0 = time.perf_counter()
            float(fn(*args))
            ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main() -> None:
    from feature_point_cnn_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from feature_point_cnn_tpu.config import SuperPointConfig
    from feature_point_cnn_tpu.inference.wrapper import extract_fn
    from feature_point_cnn_tpu.models.superpoint import init_superpoint
    from feature_point_cnn_tpu.ops.matching import mnn_match

    h, w = 480, 640
    cfg = SuperPointConfig(max_keypoints=1024)
    model, variables = init_superpoint(jax.random.PRNGKey(0), cfg, (h, w))

    # bench the RELEASED trained weights when present: NMS's while_loop
    # trip count is data-dependent, so a trained score map is the honest
    # input distribution (random init fires near-uniformly).  Selection is
    # pinned by weights/RELEASED so bench/eval/serve all measure the SAME
    # artifact; override with `python bench.py --weights X.npz`.  Loaded
    # variables are committed to the device ONCE — feeding host numpy into
    # the timed loop was the round-3 8.7 MB-per-call relay-upload artifact.
    weights_used = "random_init"
    from feature_point_cnn_tpu.utils.weights import (
        load_variables,
        released_path,
    )

    if "--weights" in sys.argv:
        # an EXPLICITLY pinned artifact must exist — a typo'd path
        # silently benchmarking random init would publish fake numbers
        idx = sys.argv.index("--weights") + 1
        if idx >= len(sys.argv):
            raise SystemExit("--weights requires a path argument")
        snap = sys.argv[idx]
        variables = load_variables(snap, device=True)
        weights_used = snap
    else:
        try:
            snap = released_path()
            variables = load_variables(snap, device=True)
            weights_used = snap
        except FileNotFoundError:
            # no snapshot in the checkout at all: random init, and say so
            variables = jax.device_put(variables)

    extract = functools.partial(extract_fn, model=model, config=cfg)
    rng = np.random.default_rng(0)

    _log("compiling keyframe extract (b1)")
    kp0, desc0 = jax.jit(extract)(
        variables, jnp.asarray(rng.random((1, h, w, 3)), jnp.float32)
    )
    key_desc, key_valid = desc0[0], kp0.valid[0]

    def frame_scalar(variables, images, key_desc, key_valid):
        kp, desc = extract(variables, images)
        m = jax.vmap(mnn_match, in_axes=(0, 0, None, None))(
            desc, kp.valid, key_desc, key_valid
        )
        return jnp.sum(m.num) + jnp.sum(kp.score) + jnp.sum(desc[..., 0])

    frame_jit = jax.jit(frame_scalar)
    device = jax.devices()[0]

    record = {
        "metric": f"detect_describe_match_fps_{h}x{w}_b64_{device.platform}",
        "value": None,
        "unit": "frames/s/chip",
        "vs_baseline": None,
        "b1_latency_ms": None,
        "b1_fps": None,
        "b8_fps": None,
        "device_ms_per_frame": None,
        "device_fps_est": None,
        "relay_execute_ms": None,
        "gflops_per_frame": None,
        "mfu_vs_bf16_peak": None,
        "weights": weights_used,
    }

    # ---- Stage 1 (ALWAYS): the headline b64 number, printed immediately --
    _log("compiling b64 pipeline")
    img64 = jax.device_put(jnp.asarray(rng.random((64, h, w, 3)), jnp.float32))
    compiled64 = frame_jit.lower(variables, img64, key_desc, key_valid).compile()
    flops_per_frame = None
    try:
        ca = compiled64.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        flops_per_frame = float(ca["flops"]) / 64.0
    except Exception:
        pass
    float(frame_jit(variables, img64, key_desc, key_valid))  # warm
    t64 = _median_fetch_seconds(frame_jit, 10, variables, img64, key_desc, key_valid)
    sync_b64 = 64.0 / t64

    # Pipelined throughput (round-5): dispatch P executes back-to-back and
    # fetch afterwards, so the relay round trip overlaps device work across
    # calls — the same software pipeline the native serve binary runs
    # (csrc/superpoint_serve.cc --pipeline).  "frames/s/chip" is a
    # THROUGHPUT metric; the synchronous number (kept as sync_b64_fps)
    # charges the environment's fixed ~26 ms execute+fetch RTT to every
    # batch and measures the relay as much as the chip.
    P = 8
    pipe_ts = []
    with jax.transfer_guard_host_to_device("disallow"):
        for _ in range(5):
            t0 = time.perf_counter()
            outs = [
                frame_jit(variables, img64, key_desc, key_valid)
                for _ in range(P)
            ]
            for o in outs:
                float(o)
            pipe_ts.append(time.perf_counter() - t0)
    pipe_b64 = 64.0 * P / float(np.median(pipe_ts))

    throughput_b64 = max(sync_b64, pipe_b64)
    record["value"] = round(throughput_b64, 2)
    record["vs_baseline"] = round(throughput_b64 / 30.0, 2)
    record["sync_b64_fps"] = round(sync_b64, 2)
    record["pipelined_b64_fps"] = round(pipe_b64, 2)
    if flops_per_frame:
        record["gflops_per_frame"] = round(flops_per_frame / 1e9, 2)
    print(json.dumps(record), flush=True)
    _log(
        f"headline printed: {record['value']} fps b64 "
        f"(sync {record['sync_b64_fps']}, pipelined {record['pipelined_b64_fps']})"
    )

    # ---- Enrichment stages, each gated on the wall-clock budget ----------
    if _remaining() > 60:
        _log("stage: relay RTT")
        tiny = jax.jit(lambda v: v * 2.0)
        x = jax.device_put(jnp.float32(1.5))
        float(tiny(x))
        record["relay_execute_ms"] = round(
            _median_fetch_seconds(tiny, 30, x) * 1e3, 3
        )
    else:
        _log("budget exhausted: skipping relay RTT")

    for bsz in (1, 8):
        if _remaining() < 120:
            _log(f"budget exhausted: skipping b{bsz}")
            continue
        _log(f"stage: b{bsz}")
        img = jax.device_put(
            jnp.asarray(rng.random((bsz, h, w, 3)), jnp.float32)
        )
        float(frame_jit(variables, img, key_desc, key_valid))  # compile+warm
        t = _median_fetch_seconds(
            frame_jit, 10, variables, img, key_desc, key_valid
        )
        if bsz == 1:
            record["b1_latency_ms"] = round(t * 1e3, 3)
            record["b1_fps"] = round(1.0 / t, 2)
        else:
            record["b8_fps"] = round(bsz / t, 2)

    # chip-side per-frame time: R-fold on-device repeat, paired-difference
    # timing (drift-robust; see module docstring).  Two extra compiles —
    # the most expensive enrichment, so it runs last and needs the most
    # remaining budget.
    if _remaining() > 240:
        _log("stage: scan-based device timing (2 compiles)")

        def scanned(r, b):
            im = jax.device_put(
                jnp.asarray(rng.random((b, h, w, 3)), jnp.float32)
            )

            def fn_impl(v):
                def step(carry, i):
                    s = frame_scalar(
                        v, im + (1e-7 * i).astype(im.dtype), key_desc, key_valid
                    )
                    return carry + s, ()

                return jax.lax.scan(
                    step, jnp.zeros((), jnp.float32), jnp.arange(r)
                )[0]

            fn = jax.jit(fn_impl)
            float(fn(variables))  # compile + warm
            return fn

        r_lo, r_hi, b_scan = 2, 10, 32
        fn_lo, fn_hi = scanned(r_lo, b_scan), scanned(r_hi, b_scan)
        diffs = []
        with jax.transfer_guard_host_to_device("disallow"):
            for _ in range(7):
                t0 = time.perf_counter()
                float(fn_lo(variables))
                t1 = time.perf_counter()
                float(fn_hi(variables))
                t2 = time.perf_counter()
                diffs.append((t2 - t1) - (t1 - t0))
        device_s_per_frame = float(np.median(diffs)) / ((r_hi - r_lo) * b_scan)
        record["device_ms_per_frame"] = round(device_s_per_frame * 1e3, 4)
        record["device_fps_est"] = round(1.0 / device_s_per_frame, 2)
        # model FLOP utilization against chip peak (bf16).  The TPU here is
        # a v5-lite-class chip: ~197 TFLOP/s bf16 (published v5e spec);
        # XLA's cost analysis counts each MAC as 2 flops on the f32 graph.
        peak = 197e12 if device.platform in ("tpu", "axon") else None
        if flops_per_frame and peak:
            record["mfu_vs_bf16_peak"] = round(
                flops_per_frame / device_s_per_frame / peak, 4
            )
    else:
        _log("budget exhausted: skipping scan-based device timing")

    print(json.dumps(record), flush=True)
    _log("full record printed")


if __name__ == "__main__":
    main()
