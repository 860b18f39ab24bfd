"""Checkpoint/resume: save a mid-sequence VO state, restore into a fresh
instance, continue tracking identically (SURVEY §5 failure-recovery
primitive; the fault-injection test kills the first instance outright)."""

import numpy as np
import pytest

from tinyslam_tpu.config import BAConfig, FrontendConfig, SlamConfig, VOConfig
from tinyslam_tpu.data.synthetic import vo_sequence
from tinyslam_tpu.models.vo import VisualOdometry
from tinyslam_tpu.utils.checkpoint import restore_vo, save_vo


def _cfg():
    return SlamConfig(
        frontend=FrontendConfig(height=240, width=320, num_levels=2,
                                features_per_level=256, threshold=0.08,
                                interpolate_descriptors=True),
        vo=VOConfig(max_map_points=2048, keyframe_min_inliers=80,
                    keyframe_max_interval=5),
        ba=BAConfig(max_keyframes=8, max_iters=6),
    )


@pytest.fixture(scope="module")
def sequence():
    rng = np.random.default_rng(7)
    return vo_sequence(rng, num_frames=24)


@pytest.mark.slow
def test_checkpoint_resume_continues_identically(tmp_path, sequence):
    cam, images, gt_poses, _ = sequence
    vo = VisualOdometry(_cfg(), cam)
    for im in images[:14]:
        vo.process(im)
    assert vo.initialized

    save_vo(vo, tmp_path / "ckpt")

    # Simulate a crash: fresh process state, restore, continue.
    vo2 = VisualOdometry(_cfg(), cam)
    restore_vo(vo2, tmp_path / "ckpt")
    assert vo2.initialized
    assert int(np.sum(np.asarray(vo2.map.valid))) == int(
        np.sum(np.asarray(vo.map.valid))
    )

    for im in images[14:]:
        a = vo.process(im)
        b = vo2.process(im)
        assert a.tracking == b.tracking
    np.testing.assert_allclose(vo.positions, vo2.positions, atol=1e-5)
