"""End-to-end visual odometry on a synthetic rendered sequence
(BASELINE config 3 analog — SURVEY §4.4 integration-test prescription)."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from tinyslam_tpu.config import (
    BAConfig,
    FrontendConfig,
    SlamConfig,
    VOConfig,
)
from tinyslam_tpu.data.synthetic import vo_sequence
from tinyslam_tpu.models.vo import VisualOdometry
from tinyslam_tpu.utils.evaluation import ate_rmse


def _small_cfg():
    return SlamConfig(
        frontend=FrontendConfig(
            height=240, width=320, num_levels=2, features_per_level=256,
            threshold=0.08,
        ),
        vo=VOConfig(max_map_points=2048, keyframe_min_inliers=50,
                    keyframe_max_interval=8),
        ba=BAConfig(max_keyframes=6, max_iters=6),
    )


@pytest.fixture(scope="module")
def sequence():
    rng = np.random.default_rng(7)
    return vo_sequence(rng, num_frames=40, num_points=400)


def test_vo_tracks_and_builds_map(sequence):
    cam, images, gt_poses, X = sequence
    vo = VisualOdometry(_small_cfg(), cam)
    stats = vo.run(images)

    assert vo.initialized, "bootstrap failed"
    tracked = [s for s in stats if s.tracking]
    assert len(tracked) > 0.75 * len(images), f"tracked {len(tracked)}"
    assert vo.num_keyframes >= 3
    assert stats[-1].num_landmarks > 100

    gt_pos = np.stack([-(R.T @ t) for R, t in gt_poses])
    est_pos = vo.positions
    # Skip pre-bootstrap frames (identity poses).
    first = next(i for i, s in enumerate(stats) if s.tracking)
    ate = ate_rmse(est_pos[first:], gt_pos[first:], with_scale=True)
    # Trajectory arc ~3.5 m; mono VO without loop closure drifts.  This
    # bound tracks current quality — ratchet it down as accuracy improves.
    assert ate < 0.5, f"ATE {ate:.4f} m"


def test_vo_deterministic(sequence):
    cam, images, _, _ = sequence
    vo1 = VisualOdometry(_small_cfg(), cam)
    vo1.run(images[:12])
    vo2 = VisualOdometry(_small_cfg(), cam)
    vo2.run(images[:12])
    np.testing.assert_array_equal(vo1.positions, vo2.positions)
