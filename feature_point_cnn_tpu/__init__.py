"""feature_point_cnn_tpu — a TPU-native feature-point detection/description
framework (JAX/XLA/Pallas), built from scratch with the capabilities of the
reference `Kolkir/feature-point-cnn` SuperPoint pipeline.

Layer map (bottom-up, mirroring SURVEY.md §1 but re-designed TPU-first):

* ``ops``       — label codec, keypoint decode/NMS, descriptor sampling,
                  GEMM matching (+ Pallas kernels under ``ops.pallas``)
* ``geometry``  — homography sampling/algebra, on-device warping, erosion
* ``models``    — Flax modules (ResNet SuperPoint; VGG variant for parity)
* ``data``      — synthetic-shape generation, npz datasets, host loaders
* ``train``     — losses, optimizer, jitted train steps, checkpointing
* ``selflabel`` — batched homography adaptation, COCO self-labeling
* ``parallel``  — device mesh + sharding layer (new; reference has none)
* ``inference`` — jitted serving front-end, matching demo
* ``utils``     — metrics, summaries, checkpoint helpers
"""

from feature_point_cnn_tpu.config import HomographyConfig, SuperPointConfig

__version__ = "0.1.0"

__all__ = ["SuperPointConfig", "HomographyConfig", "__version__"]
