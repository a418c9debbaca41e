"""Worker process for the multi-host self-labeling test
(tests/test_distributed.py::test_two_process_selflabel).

Runs as one of N processes of a CPU `jax.distributed` job: after the
coordinator rendezvous, each process labels ITS shard of a shared image
folder (`preprocess_folder` shard_index/num_shards — the CLI's
--shard-index/--num-shards path, `/root/reference/python/src/preprocess_coco.py:41-74`
sharding analog) into a shared output directory, then prints a JSON line
with the item names it wrote.

Usage: python selflabel_worker.py <port> <num_procs> <pid> <src_dir> <out_dir>
"""

import json
import os
import sys

port, nproc, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
src_dir, out_dir = sys.argv[4], sys.argv[5]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ.pop("JAX_PLATFORMS", None)

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from feature_point_cnn_tpu.parallel import distributed

distributed.initialize(f"localhost:{port}", nproc, pid)
assert jax.process_count() == nproc

from feature_point_cnn_tpu.config import HomographyConfig, SuperPointConfig
from feature_point_cnn_tpu.inference.wrapper import SuperPointFrontend
from feature_point_cnn_tpu.selflabel.coco import preprocess_folder

cfg = SuperPointConfig(
    train_image_size=(48, 64), max_keypoints=64, compute_dtype="float32"
)
# identical deterministic init on every process (same seed)
frontend = SuperPointFrontend(config=cfg, seed=0)
homo = HomographyConfig(num=3, valid_border_margin=4)

n = preprocess_folder(
    frontend,
    src_dir,
    out_dir,
    homo,
    batch_size=2,
    seed=0,
    shard_index=jax.process_index(),
    num_shards=jax.process_count(),
    use_mesh=False,  # labeling is per-process; the mesh axis is the shard
)
print(json.dumps({"pid": pid, "written": n}))
jax.distributed.shutdown()
