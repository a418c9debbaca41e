"""On-chip A/B of the space-to-depth stem reparametrization (models/blocks.py
::S2DStemConv) vs the plain 7x7/2 stem.

Measures, with the v3 scan-repeat paired-difference methodology (see
tools/profile_serving.py): the isolated stem conv, the full model forward,
and the full serving extract, each with ``stem_s2d`` off vs on.  The two
forms compute the identical function from identical params
(tests/test_model.py::test_s2d_stem_exact), so any delta is pure schedule.

Usage:  python tools/ab_stem.py [--weights weights/X.npz] [--H 480] [--W 640]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from feature_point_cnn_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--weights", default="weights/superpoint_joint_r3.npz")
    ap.add_argument("--H", type=int, default=480)
    ap.add_argument("--W", type=int, default=640)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--rlo", type=int, default=2)
    ap.add_argument("--rhi", type=int, default=10)
    ap.add_argument("--reps", type=int, default=5)
    opt = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from feature_point_cnn_tpu.config import SuperPointConfig
    from feature_point_cnn_tpu.inference.wrapper import extract_fn
    from feature_point_cnn_tpu.models.blocks import S2DStemConv, torch_conv
    from feature_point_cnn_tpu.models.superpoint import init_superpoint

    h, w, b = opt.H, opt.W, opt.batch

    def scanned(body, r):
        def run(v, im):
            def step(carry, i):
                s = body(v, im + (1e-7 * i).astype(im.dtype))
                return carry + s, ()

            out, _ = jax.lax.scan(
                step, jnp.zeros((), jnp.float32), jnp.arange(r)
            )
            return out

        return jax.jit(run)

    def paired_diff_seconds(fn_lo, fn_hi, *args):
        diffs = []
        for _ in range(opt.reps):
            t0 = time.perf_counter()
            float(fn_lo(*args))
            t1 = time.perf_counter()
            float(fn_hi(*args))
            t2 = time.perf_counter()
            diffs.append((t2 - t1) - (t1 - t0))
        return float(np.median(diffs))

    rng = np.random.default_rng(0)
    im = jax.device_put(jnp.asarray(rng.random((b, h, w, 3)), jnp.float32))
    denom = (opt.rhi - opt.rlo) * b

    # --- isolated stem (bf16 compute, like the model) ---
    stem_plain = torch_conv(64, 7, 2, 3, dtype=jnp.bfloat16, name="conv1")
    stem_s2d = S2DStemConv(64, dtype=jnp.bfloat16, name="conv1")
    sv = stem_plain.init(jax.random.PRNGKey(0), im[:1])
    for name, mod in (("stem_7x7", stem_plain), ("stem_s2d", stem_s2d)):
        body = lambda v, x, _m=mod: jnp.sum(_m.apply(v, x).astype(jnp.float32))
        lo, hi = scanned(body, opt.rlo), scanned(body, opt.rhi)
        float(lo(sv, im)), float(hi(sv, im))  # compile+warm
        dt = paired_diff_seconds(lo, hi, sv, im) / denom
        print(f"{name:>12}: {dt * 1e3:.4f} ms/frame", flush=True)

    # --- full forward + full extract, stem off vs on.  The chip drifts on
    # the MINUTE scale (observed: the same "off" forward measured 0.23 and
    # 0.44 ms in two runs minutes apart), so compile everything first and
    # INTERLEAVE the off/on measurements within each rep — the off-vs-on
    # comparison is then paired against the same drift state.
    timed = {}
    for stem in ("off", "on"):
        cfg = SuperPointConfig(max_keypoints=1024, stem_s2d=stem)
        model, variables = init_superpoint(jax.random.PRNGKey(0), cfg, (h, w))
        if os.path.exists(opt.weights):
            # device-resident: host numpy re-uploads per call (BENCH_r03 bug)
            from feature_point_cnn_tpu.utils.weights import load_variables

            variables = load_variables(opt.weights, device=True)

        def forward_only(v, x, _model=model):
            _, desc, logits = _model.apply(v, x, train=False)
            return jnp.sum(logits) + jnp.sum(desc)

        def full_extract(v, x, _model=model, _cfg=cfg):
            kp, desc = extract_fn(v, x, model=_model, config=_cfg)
            return jnp.sum(kp.score) + jnp.sum(desc[..., 0])

        for name, body in (("forward", forward_only), ("extract", full_extract)):
            lo, hi = scanned(body, opt.rlo), scanned(body, opt.rhi)
            float(lo(variables, im)), float(hi(variables, im))  # compile+warm
            timed[(stem, name)] = (lo, hi, variables)

    for name in ("forward", "extract"):
        per_stem = {s: [] for s in ("off", "on")}
        for _ in range(opt.reps):
            for stem in ("off", "on"):
                lo, hi, v = timed[(stem, name)]
                t0 = time.perf_counter()
                float(lo(v, im))
                t1 = time.perf_counter()
                float(hi(v, im))
                t2 = time.perf_counter()
                per_stem[stem].append((t2 - t1) - (t1 - t0))
        for stem in ("off", "on"):
            dt = float(np.median(per_stem[stem])) / denom
            print(f"stem_s2d={stem:>3} {name:>8}: {dt * 1e3:.4f} ms/frame",
                  flush=True)
        deltas = [b - a for a, b in zip(per_stem["off"], per_stem["on"])]
        print(f"   paired on-off {name}: {np.median(deltas) / denom * 1e3:+.4f}"
              f" ms/frame (negative = s2d wins)", flush=True)


if __name__ == "__main__":
    main()
