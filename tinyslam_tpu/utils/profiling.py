"""Profiling helpers (SURVEY §5).

Two layers:

- ``trace`` / ``named_scope`` — jax.profiler device traces viewable in
  Perfetto/TensorBoard; pipeline stages are annotated with jax.named_scope
  (see frontend.orb) so kernels group by stage in the trace.

- ``dispatch_slope`` / ``readback_sync`` — honest wall-clock measurement on
  remote-dispatch runtimes.  Two measured facts about the axon TPU relay
  shape every number in PROFILE_r03.json / tools/profile_roofline.py:
    1. a synchronized call costs a ~25 ms round trip regardless of device
       work, so single-call timings measure the network, not the kernel;
    2. ``jax.block_until_ready`` returns before remote execution completes,
       so timings synchronized with it can be off by orders of magnitude.
  ``dispatch_slope`` measures the SLOPE of K back-to-back dispatches ended
  by one host readback (the only reliable barrier): the round trip cancels
  and the per-call device time remains.
"""

from __future__ import annotations

import time
from contextlib import contextmanager

import numpy as np

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


def readback_sync(out) -> None:
    """Block until `out` is really computed, by reading one element back.
    (See module docstring: block_until_ready is not a reliable barrier
    through remote-dispatch relays.)"""
    np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]


def dispatch_slope(fn, inputs, reps: int = 9, attempts: int = 3) -> float:
    """Per-call seconds of `fn` over distinct `inputs`, relay-robust.

    Times 1 call and `reps` back-to-back calls (each sequence ended by one
    readback) and returns the slope — fixed per-synchronization costs
    cancel.  `inputs` must be a list of argument TUPLES with DISTINCT,
    device-resident contents (identical executions can be memoized by the
    relay).  The min over `attempts` rejects scheduler noise.
    """
    inputs = [x if isinstance(x, tuple) else (x,) for x in inputs]
    r = fn(*inputs[0])
    readback_sync(r)

    def run_k(k: int) -> float:
        t0 = time.perf_counter()
        for i in range(k):
            r = fn(*inputs[i % len(inputs)])
        readback_sync(r)
        return time.perf_counter() - t0

    d1 = min(run_k(1) for _ in range(attempts))
    dr = min(run_k(reps) for _ in range(attempts))
    return max((dr - d1) / (reps - 1), 1e-9)
