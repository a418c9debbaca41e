"""Stage-wise serving profile on real hardware (fetch-forced timing).

Decomposes the serving pipeline into cumulative stages and reports each
stage's MARGINAL device time per frame from a (b_hi - b_lo) slope, so the
relay's fixed dispatch+fetch cost cancels (bench.py methodology).  Run with
the committed trained weights when available — NMS's while_loop trip count
is data-dependent, so score-map statistics change the result.

Usage:  python tools/profile_serving.py [--weights weights/X.npz]
            [--H 480] [--W 640] [--lo 8] [--hi 64]
"""

from __future__ import annotations

import argparse
import functools
import json
import time

import numpy as np


def fetch_seconds(fn, n, *args):
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--weights", default="weights/magicpoint_synth_r3.npz")
    ap.add_argument("--H", type=int, default=480)
    ap.add_argument("--W", type=int, default=640)
    ap.add_argument("--lo", type=int, default=8)
    ap.add_argument("--hi", type=int, default=64)
    ap.add_argument("--reps", type=int, default=7)
    opt = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from feature_point_cnn_tpu.config import SuperPointConfig
    from feature_point_cnn_tpu.inference.wrapper import extract_fn
    from feature_point_cnn_tpu.models.superpoint import init_superpoint
    from feature_point_cnn_tpu.ops.detection import (
        extract_keypoints_from_scores,
        grid_nms,
    )
    from feature_point_cnn_tpu.ops.matching import mnn_match

    h, w = opt.H, opt.W
    cfg = SuperPointConfig(max_keypoints=1024)
    model, variables = init_superpoint(jax.random.PRNGKey(0), cfg, (h, w))
    import os

    if os.path.exists(opt.weights):
        from feature_point_cnn_tpu.utils.weights import load_weights

        raw = load_weights(opt.weights)
        variables = {
            "params": raw["params"], "batch_stats": raw["batch_stats"]
        }
        print(f"# weights: {opt.weights}")
    else:
        print("# weights: random init")

    from feature_point_cnn_tpu.ops.pallas.decode import decode_threshold_pallas

    def forward_only(v, im):
        _, desc, logits = model.apply(v, im, train=False)
        return jnp.sum(logits) + jnp.sum(desc)

    def fwd_decode_pallas(v, im):
        _, desc, logits = model.apply(v, im, train=False)
        s = decode_threshold_pallas(logits, cfg.cell, cfg.confidence_thresh)
        return jnp.sum(s) + jnp.sum(desc)

    def fwd_decode_xla(v, im):
        prob, desc, _ = model.apply(v, im, train=False)
        s = jnp.where(prob >= cfg.confidence_thresh, prob, 0.0)
        return jnp.sum(s) + jnp.sum(desc)

    def fwd_decode_nms_xla(v, im):
        _, desc, logits = model.apply(v, im, train=False)
        s = decode_threshold_pallas(logits, cfg.cell, cfg.confidence_thresh)
        s = grid_nms(s, cfg.nms_dist, cfg.nms_iters)
        return jnp.sum(s) + jnp.sum(desc)

    def fwd_decode_nms_pallas(v, im):
        from feature_point_cnn_tpu.ops.pallas.nms import grid_nms_pallas

        _, desc, logits = model.apply(v, im, train=False)
        s = decode_threshold_pallas(logits, cfg.cell, cfg.confidence_thresh)
        s = grid_nms_pallas(s, cfg.nms_dist)
        return jnp.sum(s) + jnp.sum(desc)

    def fwd_decode_nms_topk(v, im):
        _, desc, logits = model.apply(v, im, train=False)
        s = decode_threshold_pallas(logits, cfg.cell, cfg.confidence_thresh)
        kp = extract_keypoints_from_scores(s, cfg)
        return jnp.sum(kp.score) + jnp.sum(desc)

    def full_extract(v, im):
        kp, desc = extract_fn(v, im, model=model, config=cfg)
        return jnp.sum(kp.score) + jnp.sum(desc[..., 0])

    def full_pipeline(v, im, kd, kv):
        kp, desc = extract_fn(v, im, model=model, config=cfg)
        m = jax.vmap(mnn_match, in_axes=(0, 0, None, None))(
            desc, kp.valid, kd, kv
        )
        return jnp.sum(m.num) + jnp.sum(kp.score) + jnp.sum(desc[..., 0])

    rng = np.random.default_rng(0)
    kp0, desc0 = jax.jit(
        functools.partial(extract_fn, model=model, config=cfg)
    )(variables, jnp.asarray(rng.random((1, h, w, 3)), jnp.float32))
    kd, kv = desc0[0], kp0.valid[0]

    stages = [
        ("forward", forward_only, ()),
        ("fwd+decode_pallas", fwd_decode_pallas, ()),
        ("fwd+decode_xla", fwd_decode_xla, ()),
        ("fwd+dec+nms_xla", fwd_decode_nms_xla, ()),
        ("fwd+dec+nms_pallas", fwd_decode_nms_pallas, ()),
        ("fwd+dec+nms+topk", fwd_decode_nms_topk, ()),
        ("full_extract", full_extract, ()),
        ("full+match", full_pipeline, (kd, kv)),
    ]

    out = {}
    for name, fn, extra in stages:
        jfn = jax.jit(fn)
        times = {}
        flops = None
        for bsz in (opt.lo, opt.hi):
            im = jax.device_put(
                jnp.asarray(rng.random((bsz, h, w, 3)), jnp.float32)
            )
            args = (variables, im) + extra
            if bsz == opt.hi:
                try:
                    ca = jfn.lower(*args).compile().cost_analysis()
                    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
                    flops = float(ca["flops"]) / bsz
                except Exception:
                    pass
            float(jfn(*args))  # compile + warm
            times[bsz] = fetch_seconds(jfn, opt.reps, *args)
        marginal_ms = (times[opt.hi] - times[opt.lo]) / (opt.hi - opt.lo) * 1e3
        row = {
            "marginal_ms_per_frame": round(marginal_ms, 4),
            "gflops_per_frame": round(flops / 1e9, 2) if flops else None,
            "tflops_eff": (
                round(flops / (marginal_ms * 1e-3) / 1e12, 1)
                if flops and marginal_ms > 0
                else None
            ),
        }
        out[name] = row
        print(f"{name:22s} {json.dumps(row)}", flush=True)


if __name__ == "__main__":
    main()
