"""dispatch_slope / readback_sync sanity on CPU."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from tinyslam_tpu.utils.profiling import dispatch_slope, readback_sync


def test_dispatch_slope_measures_work():
    f = jax.jit(lambda x: jnp.sum(x @ x))
    xs = [jnp.asarray(np.random.default_rng(i).random((256, 256), np.float32))
          for i in range(4)]
    t = dispatch_slope(f, xs, reps=5, attempts=2)
    assert 0.0 < t < 1.0  # positive, sub-second


def test_readback_sync_accepts_pytrees():
    readback_sync({"a": jnp.ones((3,)), "b": (jnp.zeros((2, 2)),)})
