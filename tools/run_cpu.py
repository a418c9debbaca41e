"""Run any module of this package pinned to host CPU.

Same rationale as tools/eval_cpu.py: quality evals (held-out pairs,
tracking ATE) are platform-insensitive, and moving them to host CPU
frees the exclusive TPU claim for perf work.  jax must be configured
for CPU before anything imports it; an env var alone is not honored on
this machine.

Usage: python tools/run_cpu.py <module> [args...]
   e.g. python tools/run_cpu.py feature_point_cnn_tpu.eval.tracking \
            --weights-path weights/X.npz --posegraph
"""

import os
import runpy
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
module = sys.argv[1]
sys.argv = [module] + sys.argv[2:]
runpy.run_module(module, run_name="__main__", alter_sys=True)
