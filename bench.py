"""Benchmark: detect+describe+match frames/sec/chip on real hardware.

Measures the full serving pipeline at the reference C++ app's operating
point — fixed 480x640 input (`/root/reference/cpp/src/superpoint.cc:20-26`),
`conf_thresh=0.015, nms_dist=4, cell=8, border=4` — as ONE jitted program:
model forward + softmax/depth-to-space decode + NMS + top-K + bilinear
descriptor sampling + mutual-nearest-neighbor matching against a keyframe.

The reference publishes no numbers (BASELINE.md); `vs_baseline` is reported
against the 30 FPS real-time webcam rate its live demos target
(`inference.py:107-110`, `main.cc:104-111`).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "frames/s/chip", "vs_baseline": N}
"""

import functools
import json
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from feature_point_cnn_tpu.config import SuperPointConfig
    from feature_point_cnn_tpu.inference.wrapper import extract_fn
    from feature_point_cnn_tpu.models.superpoint import init_superpoint
    from feature_point_cnn_tpu.ops.matching import mnn_match

    h, w = 480, 640
    cfg = SuperPointConfig(max_keypoints=1024)
    model, variables = init_superpoint(jax.random.PRNGKey(0), cfg, (h, w))

    extract = functools.partial(extract_fn, model=model, config=cfg)

    def frame_fn(variables, image, key_desc, key_valid):
        kp, desc = extract(variables, image)
        m = mnn_match(desc[0], kp.valid[0], key_desc, key_valid)
        return kp, desc, m

    frame_jit = jax.jit(frame_fn)

    rng = np.random.default_rng(0)
    image = jnp.asarray(rng.random((1, h, w, 3)), jnp.float32)
    kp0, desc0 = jax.jit(extract)(variables, image)
    key_desc, key_valid = desc0[0], kp0.valid[0]

    # warmup / compile
    out = frame_jit(variables, image, key_desc, key_valid)
    jax.block_until_ready(out)

    import os

    iters = int(os.environ.get("FPC_BENCH_ITERS", "100"))
    t0 = time.perf_counter()
    for i in range(iters):
        out = frame_jit(variables, image, key_desc, key_valid)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    fps = iters / dt

    # Device-time FPS: chain CHAIN frames inside ONE jitted program via
    # lax.scan, so the host<->device round trip (which dominates b1 dispatch
    # latency through the axon relay — it varies >3x run-to-run) is amortized
    # to noise and the number reflects what the chip itself sustains.  The
    # scalar carry feeds the next frame's input so XLA cannot hoist the
    # loop-invariant body out of the scan.
    chain = int(os.environ.get("FPC_BENCH_CHAIN", "50"))

    def chained_fn(variables, image, key_desc, key_valid):
        def body(carry, _):
            kp, desc, m = frame_fn(
                variables, image + carry, key_desc, key_valid
            )
            nxt = (m.num.astype(jnp.float32) % 2.0) * 1e-12
            return nxt, ()

        carry, _ = jax.lax.scan(
            body, jnp.float32(0.0), None, length=chain
        )
        return carry

    chained_jit = jax.jit(chained_fn)
    jax.block_until_ready(chained_jit(variables, image, key_desc, key_valid))
    reps = int(os.environ.get("FPC_BENCH_REPS", "5"))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = chained_jit(variables, image, key_desc, key_valid)
    jax.block_until_ready(out)
    device_fps = reps * chain / (time.perf_counter() - t0)

    # batched throughput: same chained program at batch 8 — the number that
    # matters when serving many streams (or self-labeling) rather than one
    # latency-bound camera
    bsz = int(os.environ.get("FPC_BENCH_BATCH", "8"))
    image_b = jnp.asarray(rng.random((bsz, h, w, 3)), jnp.float32)
    kp0b, desc0b = jax.jit(extract)(variables, image_b)

    def frame_fn_b(variables, images, key_desc, key_valid):
        kp, desc = extract(variables, images)
        m = jax.vmap(mnn_match, in_axes=(0, 0, None, None))(
            desc, kp.valid, key_desc, key_valid
        )
        return kp, desc, m

    def chained_b(variables, images, key_desc, key_valid):
        def body(carry, _):
            kp, desc, m = frame_fn_b(
                variables, images + carry, key_desc, key_valid
            )
            nxt = (jnp.sum(m.num).astype(jnp.float32) % 2.0) * 1e-12
            return nxt, ()

        carry, _ = jax.lax.scan(
            body, jnp.float32(0.0), None, length=chain
        )
        return carry

    chained_b_jit = jax.jit(chained_b)
    jax.block_until_ready(
        chained_b_jit(variables, image_b, key_desc, key_valid)
    )
    t0 = time.perf_counter()
    for _ in range(reps):
        out = chained_b_jit(variables, image_b, key_desc, key_valid)
    jax.block_until_ready(out)
    batched_fps = reps * chain * bsz / (time.perf_counter() - t0)

    device = jax.devices()[0]
    print(
        json.dumps(
            {
                "metric": f"detect_describe_match_fps_{h}x{w}_b1_{device.platform}",
                "value": round(fps, 2),
                "unit": "frames/s/chip",
                "vs_baseline": round(fps / 30.0, 2),
                "device_fps": round(device_fps, 2),
                f"batched_b{bsz}_fps": round(batched_fps, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
