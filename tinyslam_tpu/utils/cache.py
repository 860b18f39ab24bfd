"""Persistent XLA compilation cache.

On this TPU relay a cold compile of the full tracked step costs minutes of
wall clock (the SVD-free rewrite cut most of it, but the scan-of-cond
tracker is still a large HLO).  The persistent cache makes every process
after the first start in seconds.  Called by the CLI entry points
(run.py, bench.py, tools/eval_ate.py); library users opt in explicitly.
"""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> str:
    """Point JAX's persistent compilation cache at ``path`` (default:
    ~/.cache/tinyslam_tpu_xla).  Idempotent; returns the cache dir."""
    import jax

    cache_dir = path or os.path.join(
        os.path.expanduser("~"), ".cache", "tinyslam_tpu_xla")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    return cache_dir
