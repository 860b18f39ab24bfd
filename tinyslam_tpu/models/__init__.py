"""Assembled systems: the user-facing model zoo.

- OrbFrontend (re-export)  — feature extraction only (BASELINE config 1).
- TwoViewEstimator         — matching + relative pose (config 2).
- VisualOdometry           — tracking + keyframes + local BA (configs 3-4).
- Slam                     — VO + pose-graph loop closure (config 5).
"""

from tinyslam_tpu.frontend.orb import OrbFrontend  # noqa: F401
from tinyslam_tpu.models.two_view import TwoViewEstimator  # noqa: F401
from tinyslam_tpu.models.vo import VisualOdometry, MapState  # noqa: F401
from tinyslam_tpu.models.slam import Slam  # noqa: F401
