"""Persistent XLA compilation cache for every CLI/tool entry point.

Through this environment's network relay a cold compile of the serving or
training program costs tens of seconds to tens of MINUTES of wall clock
(the per-source eval's first extract program measured ~25 min); the
compiled executable is deterministic in the HLO, so caching it on local
disk makes every subsequent process start at full speed.  JAX's persistent
cache handles keying (HLO fingerprint + compile flags + runtime version);
this helper just turns it on with sane defaults.

The reference has no analog (TorchScript/TRTorch re-compile per process,
`/root/reference/cpp/src/superpoint.cc:20-26`); the native serving path
gets the same effect explicitly via exported PJRT bundles
(`csrc/pjrt_runtime.cc`).
"""

from __future__ import annotations

import os


def enable_compilation_cache(cache_dir: str | None = None) -> str:
    """Idempotently enable the persistent compilation cache.

    Honors an existing ``JAX_COMPILATION_CACHE_DIR``; defaults to
    ``<repo>/_data/jax_cache`` (gitignored, survives within one
    environment).  Safe on backends that cannot serialize executables —
    JAX falls back to compiling and logs once.
    """
    import jax

    path = (
        cache_dir
        or os.environ.get("JAX_COMPILATION_CACHE_DIR")
        or os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(__file__))),
            "_data",
            "jax_cache",
        )
    )
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # cache everything that took real compile time; tiny programs stay
    # uncached to bound directory growth
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return path
