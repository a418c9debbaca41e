"""Unified, typed configuration shared by train and serve.

The reference splits configuration between a mutable Python object
(`/root/reference/python/src/settings.py:1-41`), hard-coded homography dicts
(`homographies.py:33-61`), and a compile-time C++ struct
(`cpp/src/settings.h:8-32`) that must agree on `cell`, `confidence_thresh`,
and `nms_dist` by convention.  Here there is exactly one frozen (hashable)
dataclass, so a config can be a static argument to a jitted function and
train/serve cannot drift apart.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Tuple


@dataclasses.dataclass(frozen=True)
class SuperPointConfig:
    """Operating point + model + training hyperparameters.

    Defaults replicate the reference operating point
    (`/root/reference/python/src/settings.py:4-31`).
    """

    # --- keypoint decode operating point (settings.py:4-8) ---
    cell: int = 8                     # output cell size; total encoder stride
    nms_dist: int = 4                 # NMS suppression radius (inf-norm)
    confidence_thresh: float = 0.015  # detector confidence threshold
    nn_thresh: float = 0.7            # descriptor L2 distance for a good match
    border_remove: int = 4            # strip detections this close to border

    # --- fixed-shape keypoint representation (TPU-native; replaces the
    # reference's ragged numpy arrays, netutils.py:78-100) ---
    max_keypoints: int = 1024         # K: keypoints padded/truncated to this
    subpixel_refine: bool = False     # center-of-mass subpixel keypoint
                                      # refinement over the 3x3 prob
                                      # neighborhood (ops/detection.py::
                                      # refine_keypoints) — beyond-reference
                                      # (it emits integer pixels); off by
                                      # default for exact reference parity
    nms_iters: int = 0                # 0 = iterate suppression rounds to
                                      # convergence (EXACT greedy NMS at any
                                      # chain depth, lax.while_loop); >0 =
                                      # that many fixed unrolled rounds
                                      # (exact only up to that chain depth)
    use_pallas_decode: str = "off"    # fused Pallas decode kernel in serving:
                                      # "auto" (on TPU), "on", "off".  Off
                                      # since round 4: measured on-chip at
                                      # 480x640 b32 (trained weights), XLA
                                      # decode adds 0.009 ms/frame vs the
                                      # kernel's 0.102 (the kernel's (b,Hc)
                                      # grid pays ~2k grid-step overheads);
                                      # round 2's opposite finding predates
                                      # the NMS priority-key packing, whose
                                      # bitcasts now stop XLA from re-fusing
                                      # the decode into the NMS loop
    use_pallas_nms: str = "auto"      # whole-map-in-VMEM exact-greedy NMS
                                      # kernel (ops/pallas/nms.py): "auto"
                                      # (on TPU), "on", "off".  On since
                                      # round 4 (tie-exact via the shared
                                      # priority key): XLA-decode + Pallas-
                                      # NMS measures 0.339 ms/frame vs 0.513
                                      # for the round-3 default pairing
                                      # (fwd+dec+nms, same protocol)
    use_pallas_desc_loss: str = "auto"  # blockwise Pallas hinge descriptor
                                      # loss (custom VJP, no (B,N,N) in HBM;
                                      # ops/pallas/descriptor_loss.py):
                                      # "auto" (on TPU), "on", "off"
    fold_bn: bool = False             # inference-export topology: BatchNorms
                                      # folded into conv kernel+bias
                                      # (models/fold.py::fold_batchnorm).
                                      # Serving/export only — training always
                                      # uses live BN

    stem_s2d: str = "off"             # compute the 7x7/2 stem conv as an
                                      # EXACT space-to-depth 4x4/1 conv on a
                                      # 12-channel input (same params, same
                                      # output): "auto" (on TPU), "on",
                                      # "off".  The 3-channel 7x7 stem is
                                      # MXU-hostile (contraction K=147 with
                                      # a 3-lane input); the s2d form
                                      # contracts K=192 over aligned lanes

    # --- model topology (superpoint.py:12-61) ---
    image_channels: int = 3
    descriptor_dim: int = 128
    grid_channels: int = 65           # 64 cell positions + dustbin

    # --- loss (settings.py:11-14, losses.py) ---
    lambda_d: float = 250.0
    positive_margin: float = 1.0
    negative_margin: float = 0.2
    detector_loss: str = "ce"         # "ce" (vanilla SuperPoint CE) | "distance"
                                      # CAUTION on "distance" (the reference's
                                      # deviation, losses.py:40-63): it trains
                                      # the soft-argmax POSITION but never
                                      # concentrates probability mass, so cell
                                      # confidences collapse below the 0.015
                                      # operating threshold (measured:
                                      # repeatability ~0 after convergence).
                                      # The reference escapes this only via its
                                      # zero-gradient hard-argmax bug, which
                                      # leaves corner cells at their (near-
                                      # uniform, above-threshold) init.
    descriptor_loss: str = "hinge"    # "hinge" (losses.py:194-276) | "mse"
                                      # (the reference's dead alternative,
                                      # losses.py:137-192) | "hinge_hn"
                                      # (hard-negative-mined hinge on plain
                                      # cosine similarity — round-4 quality
                                      # push, train/loss.py)
    desc_hn_topk: int = 8             # hinge_hn: hardest negatives mined per
                                      # cell (each direction)
    lambda_hn: float = 1.0            # hinge_hn: descriptor-vs-detector
                                      # weight (pos/neg terms are mean-
                                      # balanced, so no 250x rebalance)

    # --- training (settings.py:17-30) ---
    train_image_size: Tuple[int, int] = (240, 320)
    batch_size: int = 32
    grad_accum_steps: int = 1         # optax.MultiSteps accumulation across
                                      # k FULL-size batches (k x effective
                                      # batch); differs from the reference's
                                      # batch_size_divider, which SPLITS one
                                      # batch into micro-batches (same
                                      # effective batch, less memory)
    train_steps_per_call: int = 1     # device-resident data only: chain k
                                      # optimizer steps inside ONE jitted
                                      # program (lax.scan over per-step
                                      # batch-index arrays), amortizing the
                                      # per-dispatch host/relay overhead
                                      # across k steps.  1 = one dispatch
                                      # per step (reference-like loop)
    learning_rate: float = 1.0e-3
    lr_schedule: str = "warmup_cosine"  # "constant" | "warmup_cosine".  The
                                      # reference ships a dead scheduler
                                      # (`basetrainer.py:217-220`, commented
                                      # out) and trains at constant 1e-3; a
                                      # transient F1 collapse was observed at
                                      # constant LR (RESULTS.md round 1), so
                                      # warmup+cosine is the default here.
    warmup_steps: int = 200           # linear warmup from 0
    lr_final_ratio: float = 0.05      # cosine floor as a fraction of peak
    adam_beta1: float = 0.9
    adam_beta2: float = 0.999
    adam_eps: float = 1.0e-8
    weight_decay: float = 0.01
    grad_clip_norm: float = 5.0       # global-norm clip; 0 disables.  With
                                      # skip-nonfinite steps this replaces the
                                      # reference's GradScaler safety net
    epochs: int = 100
    microbatch_steps: int = 1         # lax.scan microbatching INSIDE the
                                      # jitted step: each batch splits into k
                                      # sequential microbatches (grads
                                      # averaged, BN stats threaded), cutting
                                      # activation memory ~k-fold — the true
                                      # equivalent of the reference's
                                      # batch_size_divider (settings.py:19,
                                      # basetrainer.py:133-166).  Contrast
                                      # grad_accum_steps (optax.MultiSteps),
                                      # which accumulates across FULL batches
                                      # and saves no memory.
    eval_max_items: int = 1000        # cap on per-epoch eval items, matching
                                      # the reference's SuperPoint test-split
                                      # cap (`superpointtrainer.py:11`);
                                      # 0 = evaluate the full test split

    # --- numerics: bf16 compute replaces AMP + GradScaler
    # (basetrainer.py:48,105-119); no loss scaling needed on TPU ---
    compute_dtype: str = "bfloat16"

    # --- data pipeline ---
    max_points: int = 512             # fixed-size padded ground-truth point sets
    shuffle_seed: int = 0
    prefetch_batches: int = 2
    photometric_augment: bool = False # on-device photometric aug (the
                                      # reference defines but disables its
                                      # albumentations pipeline,
                                      # magicpointtrainer.py:10-11)

    # --- parallelism (new first-class layer; the reference has none,
    # SURVEY.md §2.3) ---
    data_axis: str = "data"

    @property
    def compute_jnp_dtype(self):
        import jax.numpy as jnp

        return {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[self.compute_dtype]

    def grid_size(self, img_h: int, img_w: int) -> Tuple[int, int]:
        assert img_h % self.cell == 0 and img_w % self.cell == 0, (
            f"image size ({img_h},{img_w}) must be divisible by cell={self.cell}"
        )
        return img_h // self.cell, img_w // self.cell

    def replace(self, **kw) -> "SuperPointConfig":
        return dataclasses.replace(self, **kw)


@dataclasses.dataclass(frozen=True)
class HomographyConfig:
    """Random homography family for augmentation / adaptation.

    Defaults replicate `/root/reference/python/src/homographies.py:33-50`;
    `for_preprocess()` replicates the looser self-labeling variant
    (`homographies.py:52-61`).
    """

    num: int = 15                     # warps per image in adaptation
    perspective: bool = True
    scaling: bool = True
    rotation: bool = True
    translation: bool = True
    n_scales: int = 5
    n_angles: int = 25
    scaling_amplitude: float = 0.1
    perspective_amplitude_x: float = 0.1
    perspective_amplitude_y: float = 0.1
    patch_ratio: float = 0.5
    max_angle: float = math.pi / 2
    allow_artifacts: bool = False
    translation_overflow: float = 0.0
    valid_border_margin: int = 8
    aggregation: str = "sum"          # "sum" (mean) | "max"

    @classmethod
    def for_preprocess(cls) -> "HomographyConfig":
        return cls(
            scaling_amplitude=0.2,
            perspective_amplitude_x=0.2,
            perspective_amplitude_y=0.2,
            allow_artifacts=True,
            patch_ratio=0.85,
        )

    def replace(self, **kw) -> "HomographyConfig":
        return dataclasses.replace(self, **kw)
