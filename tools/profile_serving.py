"""Stage-wise serving profile on real hardware (fetch-forced timing).

Methodology (v2): batch-slope marginals drown in the relay's 33-61 ms RTT
variance, so each stage is instead repeated R times INSIDE one jitted
program (`lax.scan`, input perturbed per iteration so nothing hoists) and
timed at two repeat counts: device time scales with R while the relay
round trip stays constant, so

    per_frame = (t(R_hi) - t(R_lo)) / ((R_hi - R_lo) * batch)

With batch 32 and R_hi-R_lo = 8, a 1 ms/frame stage separates by ~256 ms —
an order of magnitude above the RTT noise.  Run with the committed trained
weights: NMS's while_loop trip count is data-dependent.

Usage:  python tools/profile_serving.py [--weights weights/X.npz]
            [--H 480] [--W 640] [--batch 32] [--rlo 2] [--rhi 10]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from feature_point_cnn_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--weights", default=None, help="default: weights/RELEASED")
    ap.add_argument("--H", type=int, default=480)
    ap.add_argument("--W", type=int, default=640)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--rlo", type=int, default=2)
    ap.add_argument("--rhi", type=int, default=10)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--fold-bn", action="store_true",
                    help="fold BatchNorms into conv kernel+bias at load "
                         "(models/fold.py) — the inference-export topology")
    opt = ap.parse_args()

    import functools

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
    from feature_point_cnn_tpu.ops.pallas.decode import decode_threshold_pallas

    h, w, b = opt.H, opt.W, opt.batch
    cfg = SuperPointConfig(max_keypoints=1024, fold_bn=opt.fold_bn)
    init_cfg = cfg.replace(fold_bn=False)  # checkpoints are live-BN topology
    _, variables = init_superpoint(jax.random.PRNGKey(0), init_cfg, (h, w))
    # device_put ONCE — host numpy variables would re-upload ~8.7 MB per
    # timed call through the relay (the BENCH_r03 artifact)
    from feature_point_cnn_tpu.utils.weights import (
        load_variables,
        released_path,
    )

    if opt.weights:
        # an explicitly pinned artifact must exist — don't silently
        # profile random init off a typo'd path
        variables = load_variables(opt.weights, device=True)
        print(f"# weights: {opt.weights}", flush=True)
    else:
        try:
            snap = released_path()
            variables = load_variables(snap, device=True)
            print(f"# weights: {snap}", flush=True)
        except FileNotFoundError:
            variables = jax.device_put(variables)
            print("# weights: random init", flush=True)
    if opt.fold_bn:
        from feature_point_cnn_tpu.models.fold import fold_batchnorm

        variables = jax.device_put(fold_batchnorm(variables))
        print("# fold_bn: on", flush=True)
    from feature_point_cnn_tpu.models.superpoint import SuperPoint

    model = SuperPoint(config=cfg)

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

    def fwd_dec_nms_xla(v, im):
        _, desc, logits = model.apply(v, im, train=False)
        s = decode_threshold_pallas(logits, cfg.cell, cfg.confidence_thresh)
        s = grid_nms(s, cfg.nms_dist, cfg.nms_iters)
        return jnp.sum(s) + jnp.sum(desc)

    def fwd_dec_nms_pallas(v, im):
        from feature_point_cnn_tpu.ops.pallas.nms import grid_nms_pallas

        _, desc, logits = model.apply(v, im, train=False)
        s = decode_threshold_pallas(logits, cfg.cell, cfg.confidence_thresh)
        s = grid_nms_pallas(s, cfg.nms_dist)
        return jnp.sum(s) + jnp.sum(desc)

    def fwd_decxla_nms_pallas(v, im):
        # the cross pairing: XLA decode (fuses into the conv epilogue, near
        # free) + Pallas NMS (a custom call — XLA CANNOT fuse the decode
        # into its suppression loop and recompute it per round, which is
        # what makes decode_xla + nms_xla slow)
        from feature_point_cnn_tpu.ops.pallas.nms import grid_nms_pallas

        prob, desc, _ = model.apply(v, im, train=False)
        s = jnp.where(prob >= cfg.confidence_thresh, prob, 0.0)
        s = grid_nms_pallas(s, cfg.nms_dist)
        return jnp.sum(s) + jnp.sum(desc)

    def fwd_decxla_nms_xla(v, im):
        prob, desc, _ = model.apply(v, im, train=False)
        s = jnp.where(prob >= cfg.confidence_thresh, prob, 0.0)
        s = grid_nms(s, cfg.nms_dist, cfg.nms_iters)
        return jnp.sum(s) + jnp.sum(desc)

    def fwd_dec_nms_topk(v, im):
        _, desc, logits = model.apply(v, im, train=False)
        s = decode_threshold_pallas(logits, cfg.cell, cfg.confidence_thresh)
        kp = extract_keypoints_from_scores(s, cfg)
        return jnp.sum(kp.score) + jnp.sum(desc)

    def fwd_best_topk(v, im):
        # the SERVED decode/NMS pairing (config defaults) through top-K,
        # without descriptor sampling: full_extract minus this row isolates
        # the sampling stage
        from feature_point_cnn_tpu.ops.detection import extract_keypoints

        prob, desc, _ = model.apply(v, im, train=False)
        kp = extract_keypoints(prob, cfg)
        return jnp.sum(kp.score) + jnp.sum(kp.y) + jnp.sum(desc)

    def full_extract(v, im):
        kp, desc = extract_fn(v, im, model=model, config=cfg)
        return jnp.sum(kp.score) + jnp.sum(desc[..., 0])

    rng = np.random.default_rng(0)
    kp0, desc0 = jax.jit(
        functools.partial(extract_fn, model=model, config=cfg)
    )(variables, jnp.asarray(rng.random((1, h, w, 3)), jnp.float32))
    kd = jax.device_get(desc0[0])
    kv = jax.device_get(kp0.valid[0])

    def full_pipeline(v, im):
        kp, desc = extract_fn(v, im, model=model, config=cfg)
        m = jax.vmap(mnn_match, in_axes=(0, 0, None, None))(
            desc, kp.valid, jnp.asarray(kd), jnp.asarray(kv)
        )
        return jnp.sum(m.num) + jnp.sum(kp.score) + jnp.sum(desc[..., 0])

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
        """Median of BACK-TO-BACK (hi - lo) time differences: the relay RTT
        drifts over minutes, so each difference is taken within one moment
        rather than between two separately-medianed runs."""
        diffs = []
        with jax.transfer_guard_host_to_device("disallow"):
            for _ in range(opt.reps):
                t0 = time.perf_counter()
                float(fn_lo(*args))
                t1 = time.perf_counter()
                float(fn_hi(*args))
                t2 = time.perf_counter()
                diffs.append((t2 - t1) - (t1 - t0))
        return float(np.median(diffs))

    im = jax.device_put(jnp.asarray(rng.random((b, h, w, 3)), jnp.float32))

    stages = [
        ("forward", forward_only),
        ("fwd+decode_pallas", fwd_decode_pallas),
        ("fwd+decode_xla", fwd_decode_xla),
        ("fwd+dec+nms_xla", fwd_dec_nms_xla),
        ("fwd+dec+nms_pallas", fwd_dec_nms_pallas),
        ("fwd+decxla+nms_pallas", fwd_decxla_nms_pallas),
        ("fwd+decxla+nms_xla", fwd_decxla_nms_xla),
        ("fwd+dec+nms+topk", fwd_dec_nms_topk),
        ("fwd+best+topk", fwd_best_topk),
        ("full_extract", full_extract),
        ("full+match", full_pipeline),
    ]

    for name, body in stages:
        flops = None
        try:
            ca = jax.jit(body).lower(variables, im).compile().cost_analysis()
            ca = ca[0] if isinstance(ca, (list, tuple)) else ca
            flops = float(ca["flops"]) / b
        except Exception:
            pass
        fn_lo = scanned(body, opt.rlo)
        fn_hi = scanned(body, opt.rhi)
        float(fn_lo(variables, im))  # compile + warm
        float(fn_hi(variables, im))
        diff = paired_diff_seconds(fn_lo, fn_hi, variables, im)
        per_frame_ms = diff / ((opt.rhi - opt.rlo) * b) * 1e3
        row = {
            "ms_per_frame": round(per_frame_ms, 4),
            "gflops_per_frame": round(flops / 1e9, 2) if flops else None,
            "tflops_eff": (
                round(flops / (per_frame_ms * 1e-3) / 1e12, 1)
                if flops and per_frame_ms > 0
                else None
            ),
        }
        print(f"{name:22s} {json.dumps(row)}", flush=True)


if __name__ == "__main__":
    main()
