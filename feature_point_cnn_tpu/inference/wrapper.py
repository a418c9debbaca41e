"""Serving front-end: one jitted program from image to keypoints+descriptors.

Equivalent of `/root/reference/python/src/inferencewrapper.py`, with the
whole decode fused: forward -> softmax/depth-to-space -> NMS -> top-K ->
bilinear descriptor sampling is a single XLA executable (the reference hops
device->host between each stage, `inferencewrapper.py:29-46`).  Model export
("trace", `inferencewrapper.py:83-91`) becomes StableHLO serialization via
`jax.export` — the TPU-native analog of TorchScript.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from feature_point_cnn_tpu.config import HomographyConfig, SuperPointConfig
from feature_point_cnn_tpu.models.superpoint import SuperPoint, init_superpoint
from feature_point_cnn_tpu.ops.descriptors import sample_descriptors
from feature_point_cnn_tpu.ops.detection import (
    Keypoints,
    extract_keypoints,
    extract_keypoints_from_scores,
    keypoints_to_numpy,
)
from feature_point_cnn_tpu.selflabel.adaptation import homography_adaptation
from feature_point_cnn_tpu.utils import checkpoint as ckpt


def extract_fn(
    variables: dict, images: jnp.ndarray, *, model: SuperPoint,
    config: SuperPointConfig,
) -> Tuple[Keypoints, jnp.ndarray]:
    """The fused serving program (pure; jit at the call site).

    Kernel selection follows the config gates (round-4 measured defaults:
    XLA decode — it fuses into the conv epilogue for ~0.009 ms/frame — plus
    the whole-map-in-VMEM Pallas NMS; see config.py for the on-chip A/B
    numbers).  When the Pallas decode is enabled instead, the model's own
    prob-map branch is dead code and XLA eliminates it.
    """
    h, w = images.shape[1:3]
    prob, desc_map, logits = model.apply(variables, images, train=False)
    use_pallas = config.use_pallas_decode == "on" or (
        config.use_pallas_decode == "auto" and jax.default_backend() == "tpu"
    )
    if use_pallas:
        from feature_point_cnn_tpu.ops.pallas.decode import decode_threshold_pallas

        scores = decode_threshold_pallas(
            logits, config.cell, config.confidence_thresh
        )
        kp = extract_keypoints_from_scores(scores, config)
    else:
        kp = extract_keypoints(prob, config)
    if config.subpixel_refine:
        from feature_point_cnn_tpu.ops.detection import refine_keypoints

        # refine on the RAW prob map (the thresholded score map zeroes
        # sub-threshold neighbors and would bias the center of mass)
        kp = refine_keypoints(prob, kp)
    desc = sample_descriptors(desc_map, kp, h, w)
    return kp, desc


def adaptation_fn(
    variables: dict, images: jnp.ndarray, key: jax.Array, *,
    model: SuperPoint, homo_config: HomographyConfig,
) -> jnp.ndarray:
    prob_fn = lambda x: model.apply(variables, x, train=False)[0]
    return homography_adaptation(key, images, prob_fn, homo_config)


def load_variables(
    config: SuperPointConfig, checkpoint_dir: str
) -> Tuple[int, dict]:
    """Latest trainer checkpoint -> inference variables
    (`saveutils.py:6-18` equivalent).  Accepts either an orbax checkpoint
    directory or a portable single-file ``.npz`` snapshot
    (`utils/weights.py`).  Variables are committed to the device here —
    host numpy weights fed into a jitted extract re-upload every parameter
    on every call (the round-3 benchmark artifact)."""
    if str(checkpoint_dir).endswith(".npz"):
        from feature_point_cnn_tpu.utils import weights as wsnap

        return 0, wsnap.load_variables(checkpoint_dir, device=True)
    step, raw = ckpt.restore_latest_raw(ckpt.checkpoint_manager(checkpoint_dir))
    if step is None:
        raise FileNotFoundError(f"no checkpoint under {checkpoint_dir}")
    return step, jax.device_put(
        {"params": raw["params"], "batch_stats": raw["batch_stats"]}
    )


class SuperPointFrontend:
    """Loads weights once; jitted programs cache per input shape."""

    def __init__(
        self,
        config: SuperPointConfig = SuperPointConfig(),
        checkpoint_dir: Optional[str] = None,
        variables: Optional[dict] = None,
        seed: int = 0,
    ):
        self.config = config
        self.model = SuperPoint(config=config)
        if variables is None:
            _, variables = init_superpoint(jax.random.PRNGKey(seed), config)
            if checkpoint_dir is not None:
                step, variables = load_variables(config, checkpoint_dir)
                print(
                    f"[frontend] loaded checkpoint step {step} from {checkpoint_dir}"
                )
        if config.fold_bn and "batch_stats" in variables:
            # checkpoints are always the live-BN topology; fold at load
            from feature_point_cnn_tpu.models.fold import fold_batchnorm

            variables = jax.device_put(fold_batchnorm(variables))
        self.variables = variables
        self._sharded_cache: dict = {}
        self._extract = jax.jit(
            functools.partial(extract_fn, model=self.model, config=config)
        )
        self._adapt = jax.jit(
            functools.partial(adaptation_fn, model=self.model),
            static_argnames=("homo_config",),
        )

    # ------------------------------------------------------------------

    def extract(self, images) -> Tuple[Keypoints, jnp.ndarray]:
        """Batched fixed-K extraction: ``(B, H, W, 3) -> (Keypoints, desc
        (B, K, D))`` — all on device."""
        return self._extract(self.variables, jnp.asarray(images, jnp.float32))

    def extract_sharded(self, images, mesh) -> Tuple[Keypoints, jnp.ndarray]:
        """Multi-chip batched extraction: the batch is sharded over ``mesh``
        and every device runs the FULL fused program (Pallas kernels
        included) on its local shard under ``shard_map`` — extraction is
        embarrassingly parallel, so throughput scales linearly over ICI with
        zero collectives.  This is the pod-scale serving path the reference's
        single-GPU app has no analog of (`cpp/src/main.cc`)."""
        axis = mesh.axis_names[0]
        key = (id(mesh), images.shape[1:3])
        fn = self._sharded_cache.get(key)
        if fn is None:
            from jax.sharding import PartitionSpec as P

            body = functools.partial(
                extract_fn, model=self.model, config=self.config
            )
            fn = jax.jit(
                jax.shard_map(
                    body,
                    mesh=mesh,
                    in_specs=(P(), P(axis)),
                    out_specs=(
                        Keypoints(P(axis), P(axis), P(axis), P(axis)),
                        P(axis),
                    ),
                    check_vma=False,
                )
            )
            self._sharded_cache[key] = fn
        images = jnp.asarray(images, jnp.float32)
        sharded = jax.device_put(
            images, jax.NamedSharding(mesh, jax.P(axis))
        )
        variables = jax.device_put(
            self.variables, jax.NamedSharding(mesh, jax.P())
        )
        return fn(variables, sharded)

    def run(self, img: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """Single-image convenience in the reference's layout
        (`inferencewrapper.py:29-46`): ``img (H, W, 3) float32 [0,1]`` ->
        ``(points (3, N) [x, y, conf], desc (D, N))``."""
        kp, desc = self.extract(np.asarray(img)[None])
        pts = keypoints_to_numpy(kp, 0)
        v = np.asarray(kp.valid[0])
        return pts, np.asarray(desc[0])[v].T

    def run_with_homography_adaptation(
        self,
        images: np.ndarray,
        homo_config: HomographyConfig,
        key: jax.Array,
    ):
        """Self-labeling pass (`inferencewrapper.py:48-68`): aggregated
        probabilities -> per-image ragged ``(3, N)`` point arrays."""
        prob = self._adapt(
            self.variables, jnp.asarray(images, jnp.float32), key,
            homo_config=homo_config,
        )
        kp = extract_keypoints(prob, self.config)
        return [keypoints_to_numpy(kp, i) for i in range(images.shape[0])]

    # ------------------------------------------------------------------

    def export_stablehlo(self, path: str, image_size: Tuple[int, int]) -> None:
        """Serialize the fused extract program as portable StableHLO bytes —
        the TPU-native analog of the TorchScript trace consumed by the C++
        app (`inferencewrapper.py:83-91`, `cpp/src/superpoint.cc:11-26`)."""
        from jax import export as jax_export

        h, w = image_size
        spec = jax.ShapeDtypeStruct(
            (1, h, w, self.config.image_channels), jnp.float32
        )
        fn = functools.partial(extract_fn, model=self.model, config=self.config)

        def flat_fn(im):
            # flat-tuple ABI (y, x, score, valid, desc): serializable and
            # directly consumable by a native (C/C++) runtime
            kp, desc = fn(self.variables, im)
            return kp.y, kp.x, kp.score, kp.valid, desc

        exported = jax_export.export(jax.jit(flat_fn))(spec)
        with open(path, "wb") as f:
            f.write(exported.serialize())
        print(f"[frontend] exported StableHLO ({h}x{w}) to {path}")

    def export_pjrt(
        self,
        out_dir: str,
        image_size: Tuple[int, int],
        abi: str = "packed",
        top_n: Optional[int] = None,
        batch: int = 1,
        input_dtype: str = "f32",
        input_channels: Optional[int] = None,
    ) -> None:
        """Export the full frame program (detect + describe + MATCH against a
        fed-back keyframe — matching stays an on-chip GEMM) for the native
        C++ PJRT runtime (`csrc/`):

          <out_dir>/module.mlir         StableHLO bytecode (PJRT "mlir" format)
          <out_dir>/compile_options.pb  serialized xla CompileOptionsProto
          <out_dir>/meta.json           input/output specs (+"abi")

        Two ABIs:

        * ``abi="full"`` — per frame the device returns full fixed-K f32
          arrays (y/x/score/valid + matches + (K, D) f32 descriptors,
          ~537 KB at K=1024/D=128).
        * ``abi="packed"`` (default) — the top ``top_n`` score-sorted rows
          only (`lax.top_k` output is descending, so slicing is exact), as
          ``num_valid`` (s32) + one ``(N, 3) f32`` [y, x, score] array
          (f32, not f16: half spacing is 0.5 px beyond x=512, which would
          destroy subpixel refinement) + ``(N,) s32`` match indices
          (-1 = no match) + ``(N, D) f16`` descriptors: ~71 KB at N=256 —
          an ~8x D2H cut.  The keyframe
          feeds back as (desc_f16, num_valid) device buffers, so the host
          never touches descriptor bytes.  This is the TPU-native analog
          of the reference's pinned-buffer readback optimization
          (`/root/reference/cpp/src/superpoint.cc:98-152`).

        ``batch > 1`` (packed only) processes B frames per execute — the
        native analog of the Python bench's batching: the relay/PCIe round
        trip amortizes over B frames instead of paying per frame.  The
        keyframe feedback then comes from two extra outputs
        (``key_desc_out`` = frame 0's descriptors, ``key_num_out``) so the
        feedback buffers keep the unbatched key-input shapes.

        ``input_dtype="u8"`` takes raw ``uint8`` pixels and normalizes
        (``/255``) ON DEVICE — a 4x host->device cut on the image upload,
        which dominates batched serving on a bandwidth-bound link (camera
        frames originate as uint8, so this is exact for real sources; the
        reference normalizes on host, `cpp/src/camera.cc:4-23`).
        ``input_channels=1`` takes grayscale and broadcasts to the model's
        3 channels on device (the loaders repeat gray exactly the same way,
        `python/src/dataset_utils.py:12-32`) — another 3x upload cut.

        This replaces the TorchScript-trace + TRTorch-compile path consumed
        by the reference C++ app (`cpp/src/superpoint.cc:11-26`).
        """
        import json
        from pathlib import Path

        from jax import export as jax_export
        from jax._src.lib import xla_client

        from feature_point_cnn_tpu.ops.matching import mnn_match

        h, w = image_size
        cfg = self.config
        k, d = cfg.max_keypoints, cfg.descriptor_dim
        assert abi in ("full", "packed"), abi
        assert batch == 1 or abi == "packed", "batched export is packed-only"
        assert input_dtype in ("f32", "u8"), input_dtype
        cin = input_channels or cfg.image_channels
        assert cin in (1, cfg.image_channels), input_channels
        n = min(top_n or 256, k)

        def prep_image(image):
            """ABI image -> model input: u8 -> f32/255 and gray -> repeated
            channels, both ON DEVICE (upload stays small)."""
            if input_dtype == "u8":
                image = image.astype(jnp.float32) * (1.0 / 255.0)
            if cin == 1 and cfg.image_channels != 1:
                image = jnp.broadcast_to(
                    image, image.shape[:-1] + (cfg.image_channels,)
                )
            return image

        if abi == "full":

            def frame_fn(image, key_desc, key_valid):
                image = prep_image(image)
                kp, desc = extract_fn(
                    self.variables, image, model=self.model, config=cfg
                )
                m = mnn_match(
                    desc[0], kp.valid[0], key_desc, key_valid,
                    max_l2_dist=cfg.nn_thresh,
                )
                return (
                    kp.y[0], kp.x[0], kp.score[0], kp.valid[0],
                    m.index, m.valid, desc[0],
                )

            specs = (
                jax.ShapeDtypeStruct(
                    (1, h, w, cin),
                    jnp.uint8 if input_dtype == "u8" else jnp.float32,
                ),
                jax.ShapeDtypeStruct((k, d), jnp.float32),
                jax.ShapeDtypeStruct((k,), jnp.bool_),
            )
            inputs = [
                {"name": "image", "shape": [1, h, w, cin],
                 "dtype": input_dtype},
                {"name": "key_desc", "shape": [k, d], "dtype": "f32"},
                {"name": "key_valid", "shape": [k], "dtype": "pred"},
            ]
            outputs = [
                {"name": "y", "shape": [k], "dtype": "f32"},
                {"name": "x", "shape": [k], "dtype": "f32"},
                {"name": "score", "shape": [k], "dtype": "f32"},
                {"name": "valid", "shape": [k], "dtype": "pred"},
                {"name": "match_index", "shape": [k], "dtype": "s32"},
                {"name": "match_valid", "shape": [k], "dtype": "pred"},
                {"name": "desc", "shape": [k, d], "dtype": "f32"},
            ]
        else:
            B = batch

            def frame_fn(image, key_desc, key_num):
                image = prep_image(image)
                kp, desc = extract_fn(
                    self.variables, image, model=self.model, config=cfg
                )
                # keypoints are score-sorted (lax.top_k), so the first N
                # rows ARE the top N; invalid slots sit at the tail
                y, x = kp.y[:, :n], kp.x[:, :n]
                score, valid = kp.score[:, :n], kp.valid[:, :n]
                desc_n = jnp.where(valid[..., None], desc[:, :n], 0.0)
                key_valid = jnp.arange(n) < key_num
                m = jax.vmap(
                    lambda dn, v: mnn_match(
                        dn, v, key_desc.astype(jnp.float32), key_valid,
                        max_l2_dist=cfg.nn_thresh,
                    )
                )(desc_n, valid)
                num_valid = valid.sum(-1, dtype=jnp.int32)       # (B,)
                # coordinates stay f32: f16 spacing is 0.5 px for x >= 512
                # (right fifth of a 640-wide frame), which would destroy
                # subpixel_refine output; the extra readback is ~1.5 KB at
                # N=256.  Descriptors are unit-norm, f16-safe.
                packed = jnp.stack([y, x, score], axis=-1)       # (B, N, 3)
                match_index = jnp.where(m.valid, m.index, -1).astype(
                    jnp.int32
                )
                desc16 = desc_n.astype(jnp.float16)
                if B == 1:
                    # unbatched ABI: scalar count, (N, ...) arrays; the
                    # desc/num outputs double as the keyframe feedback
                    return num_valid[0], packed[0], match_index[0], desc16[0]
                # batched: feedback shapes differ from the per-frame outputs,
                # so frame 0's key state is exported explicitly
                return (
                    num_valid, packed, match_index, desc16,
                    desc16[0], num_valid[0],
                )

            specs = (
                jax.ShapeDtypeStruct(
                    (B, h, w, cin),
                    jnp.uint8 if input_dtype == "u8" else jnp.float32,
                ),
                jax.ShapeDtypeStruct((n, d), jnp.float16),
                jax.ShapeDtypeStruct((), jnp.int32),
            )
            inputs = [
                {"name": "image", "shape": [B, h, w, cin],
                 "dtype": input_dtype},
                {"name": "key_desc", "shape": [n, d], "dtype": "f16"},
                {"name": "key_num", "shape": [], "dtype": "s32"},
            ]
            lead = [] if B == 1 else [B]
            outputs = [
                {"name": "num_valid", "shape": lead, "dtype": "s32"},
                {"name": "kp_packed", "shape": lead + [n, 3], "dtype": "f32"},
                {"name": "match_index", "shape": lead + [n], "dtype": "s32"},
                {"name": "desc", "shape": lead + [n, d], "dtype": "f16"},
            ]
            if B > 1:
                outputs += [
                    {"name": "key_desc_out", "shape": [n, d], "dtype": "f16"},
                    {"name": "key_num_out", "shape": [], "dtype": "s32"},
                ]

        exported = jax_export.export(jax.jit(frame_fn))(*specs)

        out = Path(out_dir)
        out.mkdir(parents=True, exist_ok=True)
        (out / "module.mlir").write_bytes(exported.mlir_module_serialized)
        (out / "compile_options.pb").write_bytes(
            xla_client.CompileOptions().SerializeAsString()
        )
        meta = {
            "abi": abi,
            "batch": batch,
            "image_size": [h, w],
            "channels": cin,
            "input_dtype": input_dtype,
            "max_keypoints": k,
            "top_n": n,
            "descriptor_dim": d,
            "inputs": inputs,
            "outputs": outputs,
        }
        (out / "meta.json").write_text(json.dumps(meta, indent=1))
        print(
            f"[frontend] exported PJRT program ({h}x{w}, abi={abi}) "
            f"to {out_dir}"
        )
