"""Worker process for tests/test_distributed.py.

Runs as one of N processes of a CPU `jax.distributed` job (gloo
collectives), executes ONE data-parallel MagicPoint train step on the
global mesh with process-local data, and prints a JSON line with the
post-step parameter checksum — which must be identical across processes.

Usage: python distributed_worker.py <coordinator_port> <num_procs> <pid>
"""

import json
import os
import sys

port, nproc, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ.pop("JAX_PLATFORMS", None)

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from feature_point_cnn_tpu.parallel import distributed

distributed.initialize(f"localhost:{port}", nproc, pid)
assert jax.process_count() == nproc, jax.process_count()
assert jax.device_count() == 2 * nproc, jax.device_count()
assert len(jax.local_devices()) == 2

import numpy as np
import jax.numpy as jnp

from feature_point_cnn_tpu.config import SuperPointConfig
from feature_point_cnn_tpu.models.superpoint import init_superpoint
from feature_point_cnn_tpu.train import steps as S
from feature_point_cnn_tpu.train.optimizer import make_optimizer

cfg = SuperPointConfig(
    train_image_size=(48, 64), batch_size=4, max_points=8,
    compute_dtype="float32",
)
mesh = distributed.global_mesh()
assert mesh.devices.size == 2 * nproc

# identical init on every process (same seed), then replicate globally
model, variables = init_superpoint(jax.random.PRNGKey(0), cfg)
tx = make_optimizer(cfg, variables["params"])
state = S.create_train_state(variables, tx)
state = distributed.replicate_global(jax.device_get(state), mesh)

# per-process DIFFERENT local data: 2 items each -> global batch of 2*nproc
rng = np.random.default_rng(100 + pid)
local = {
    "image": rng.random((2, 48, 64, 3)).astype(np.float32),
    "points": (rng.random((2, 8, 2)) * [47, 63]).astype(np.float32),
    "points_valid": np.ones((2, 8), bool),
}
batch = distributed.make_global_batch(local, mesh)
assert batch["image"].shape == (2 * nproc, 48, 64, 3)

step = jax.jit(
    lambda s, b, k: S.magicpoint_train_step(
        s, b, k, model=model, tx=tx, config=cfg
    )
)
state, metrics = step(state, batch, jax.random.PRNGKey(1))

# params are replicated -> every process can read its addressable shard;
# bit-identical across processes proves the gradient psum was coherent
leaves = jax.tree_util.tree_leaves(state.params)
checksum = float(
    sum(abs(np.asarray(l.addressable_data(0))).sum() for l in leaves)
)
shard = distributed.process_shard(10)
print(json.dumps({
    "pid": pid,
    "loss": float(metrics["loss"]),
    "checksum": checksum,
    "shard": [shard.start, shard.stop],
}))
jax.distributed.shutdown()
