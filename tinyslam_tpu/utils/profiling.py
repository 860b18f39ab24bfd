"""Profiling helpers (SURVEY §5): jax.profiler traces viewable in
Perfetto/TensorBoard; pipeline stages are annotated with jax.named_scope
(see frontend.orb) so kernels group by stage in the trace."""

from __future__ import annotations

from contextlib import contextmanager

import jax


@contextmanager
def trace(log_dir: str = "/tmp/tinyslam_trace"):
    """Capture a device trace of the enclosed block:

        with profiling.trace("/tmp/trace"):
            feats = frontend.extract(frame)
            jax.block_until_ready(feats)
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


named_scope = jax.named_scope
