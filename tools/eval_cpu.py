"""CPU-pinned wrapper around tools/eval_per_source.py.

The held-out quality eval is platform-insensitive (the released-weights
CPU rerun agreed with the round-4 chip numbers to eval noise: match
precision 0.4601 vs 0.460, repeatability 0.776 vs 0.760 —
``logs/eval_r5_released_cpu_harsh.log``), so running it on host CPU
frees the exclusive chip claim for perf work.  ``python -m
feature_point_cnn_tpu.main`` style entry points grab the axon TPU by
default; jax must be pinned to CPU BEFORE anything imports it, which an
environment variable alone does not do on this machine — hence this
wrapper instead of ``JAX_PLATFORMS=cpu python tools/eval_per_source.py``.

Usage: python tools/eval_cpu.py [eval_per_source args...]
"""

import os
import runpy
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

_here = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_here))
sys.argv = ["eval_per_source.py"] + sys.argv[1:]
runpy.run_path(os.path.join(_here, "eval_per_source.py"), run_name="__main__")
