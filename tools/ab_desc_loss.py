"""On-chip A/B of the Pallas blockwise descriptor-loss kernel vs the XLA
GEMM formulation (VERDICT r2 item 6): times the FULL joint train step
(forward + backward + update) under both `use_pallas_desc_loss` settings,
fetch-forced, reporting the (b_hi - b_lo) marginal so the relay's fixed
cost cancels.

Usage:  python tools/ab_desc_loss.py [--H 240] [--W 320] [--lo 8] [--hi 32]
"""

from __future__ import annotations

import argparse
import functools
import json
import time

import numpy as np


def main() -> None:
    from feature_point_cnn_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--H", type=int, default=240)
    ap.add_argument("--W", type=int, default=320)
    ap.add_argument("--lo", type=int, default=8)
    ap.add_argument("--hi", type=int, default=32)
    ap.add_argument("--reps", type=int, default=7)
    opt = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from feature_point_cnn_tpu.config import HomographyConfig, SuperPointConfig
    from feature_point_cnn_tpu.models.superpoint import init_superpoint
    from feature_point_cnn_tpu.train import steps as S
    from feature_point_cnn_tpu.train.optimizer import make_optimizer

    h, w = opt.H, opt.W
    homo = HomographyConfig()
    rng = np.random.default_rng(0)
    out = {}

    for mode in ("off", "on"):
        cfg = SuperPointConfig(
            train_image_size=(h, w), use_pallas_desc_loss=mode
        )
        model, variables = init_superpoint(jax.random.PRNGKey(0), cfg, (h, w))
        tx = make_optimizer(cfg, variables["params"])

        step = jax.jit(
            functools.partial(
                S.superpoint_train_step,
                model=model, tx=tx, config=cfg, homo_config=homo,
            ),
        )

        times = {}
        for bsz in (opt.lo, opt.hi):
            state = S.create_train_state(variables, tx)
            batch = {
                "image": jnp.asarray(
                    rng.random((bsz, h, w, 3)), jnp.float32
                ),
                "points": jnp.asarray(
                    rng.random((bsz, 64, 2)) * [h - 1, w - 1], jnp.float32
                ),
                "points_valid": jnp.ones((bsz, 64), bool),
            }
            key = jax.random.PRNGKey(1)
            state, m = step(state, batch, key)
            float(m["loss"])  # compile + warm
            ts = []
            for _ in range(opt.reps):
                t0 = time.perf_counter()
                state, m = step(state, batch, key)
                float(m["loss"])  # fetch forces completion
                ts.append(time.perf_counter() - t0)
            times[bsz] = float(np.median(ts))
        marg = (times[opt.hi] - times[opt.lo]) / (opt.hi - opt.lo) * 1e3
        row = {
            f"b{opt.lo}_ms": round(times[opt.lo] * 1e3, 2),
            f"b{opt.hi}_ms": round(times[opt.hi] * 1e3, 2),
            "marginal_ms_per_img": round(marg, 4),
        }
        out[f"pallas_{mode}"] = row
        print(f"desc_loss pallas={mode}: {json.dumps(row)}", flush=True)

    off = out["pallas_off"]["marginal_ms_per_img"]
    on = out["pallas_on"]["marginal_ms_per_img"]
    print(
        json.dumps(
            {"speedup_pallas_vs_xla": round(off / on, 3) if on > 0 else None}
        )
    )


if __name__ == "__main__":
    main()
