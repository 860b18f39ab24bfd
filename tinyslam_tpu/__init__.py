"""tinyslam_tpu — a TPU-native visual SLAM framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
``ccaven/tinyslam`` reference (reference: /root/reference, Rust + WGSL,
wgpu/Vulkan).  The reference implements an ORB feature-extraction front-end
(reference src/orb.rs:1-589 and src/shaders/*.wgsl); its README roadmap
(reference README.md:53-57) plus the driver's BASELINE.json define the full
intended pipeline, which this framework implements completely:

- ``ops``       — device kernels: grayscale, image pyramid, separable Gaussian
                  blur, FAST-16 corner scoring (bitwise streak trick), top-k
                  compaction/NMS, steered BRIEF, MXU Hamming matching.
- ``frontend``  — the ORB front-end pipeline (jitted end-to-end).
- ``geometry``  — SE3/SO3, pinhole cameras, essential-matrix estimation,
                  RANSAC, triangulation, PnP.
- ``backend``   — Schur-complement Levenberg–Marquardt bundle adjustment and
                  pose-graph optimization.
- ``parallel``  — device-mesh sharding: frame data parallelism, landmark-block
                  sharding for distributed BA (psum over ICI), multi-host
                  helpers.
- ``models``    — assembled systems: OrbFrontend, VisualOdometry, Slam.
- ``data``      — TUM RGB-D / EuRoC loaders (native C++ PNG decode),
                  synthetic scene generators.
- ``utils``     — ATE/RPE evaluation, metrics registry, profiling,
                  checkpointing.

Design stance (see SURVEY.md §7): pure functions over fixed-shape pytrees,
jitted end-to-end; dynamic feature counts are fixed-capacity arrays + valid
masks; compaction by deterministic top-k instead of device atomics; matching
and BA shaped for the MXU.
"""

__version__ = "0.1.0"

from tinyslam_tpu.config import (  # noqa: F401
    FrontendConfig,
    MatcherConfig,
    RansacConfig,
    BAConfig,
    VOConfig,
    SlamConfig,
)
from tinyslam_tpu.types import Features  # noqa: F401
