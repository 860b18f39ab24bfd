"""Test harness: force CPU with a virtual 8-device mesh.

The standard JAX trick (SURVEY §4.5): sharding / shard_map / psum logic is
exercised on one machine with `--xla_force_host_platform_device_count=8`;
the same test bodies run unchanged on real TPU pod slices.

Note: this environment's sitecustomize registers an `axon` TPU plugin at
interpreter start and forces jax_platforms="axon,cpu" via jax.config —
plain env vars are overridden, so we must re-override through jax.config
here (before any backend is initialized).  Opt out with
TINYSLAM_TEST_TPU=1 to run the same suite on the real chip.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

if os.environ.get("TINYSLAM_TEST_TPU", "0") != "1":
    import jax

    jax.config.update("jax_platforms", "cpu")
