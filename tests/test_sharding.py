"""Multi-device tests on the virtual 8-device CPU mesh (SURVEY §4.5) —
the same bodies run unchanged on real pod slices."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tinyslam_tpu.backend.ba import bundle_adjust
from tinyslam_tpu.config import FrontendConfig, MeshConfig
from tinyslam_tpu.parallel import (
    bundle_adjust_sharded,
    extract_features_batch,
    make_mesh,
)
from tests.test_ba import _perturb, _window_problem


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    return make_mesh(MeshConfig(frame_axis=2, landmark_axis=4))


def test_mesh_shape(mesh):
    assert mesh.shape == {"frame": 2, "landmark": 4}


def test_dist_ba_matches_single_device(mesh):
    rng = np.random.default_rng(0)
    cam, X, R_gt, t_gt, z, mask = _window_problem(rng, K=6, L=256)
    R0, t0, X0 = _perturb(rng, R_gt, t_gt, X)
    pose_free = np.r_[[False, False], np.ones(4, bool)]

    args = (cam, jnp.asarray(R0), jnp.asarray(t0), jnp.asarray(X0),
            jnp.asarray(z), jnp.asarray(mask), jnp.asarray(pose_free))
    single = bundle_adjust(*args, max_iters=8)
    dist = bundle_adjust_sharded(mesh, *args, max_iters=8)

    # Same optimization up to float reduction order.
    np.testing.assert_allclose(
        np.asarray(dist["R"]), np.asarray(single["R"]), atol=5e-4
    )
    np.testing.assert_allclose(
        np.asarray(dist["t"]), np.asarray(single["t"]), atol=5e-3
    )
    np.testing.assert_allclose(
        np.asarray(dist["X"]), np.asarray(single["X"]), atol=5e-3
    )
    assert float(dist["cost"]) < 0.1 * float(dist["initial_cost"])


def test_dist_ba_reduces_cost_with_landmark_sharding(mesh):
    rng = np.random.default_rng(1)
    cam, X, R_gt, t_gt, z, mask = _window_problem(rng, K=5, L=512)
    R0, t0, X0 = _perturb(rng, R_gt, t_gt, X)
    pose_free = np.r_[[False, False], np.ones(3, bool)]
    point_valid = rng.random(512) > 0.2
    out = bundle_adjust_sharded(
        mesh, cam, jnp.asarray(R0), jnp.asarray(t0), jnp.asarray(X0),
        jnp.asarray(z), jnp.asarray(mask), jnp.asarray(pose_free),
        point_valid=jnp.asarray(point_valid), max_iters=8,
    )
    assert float(out["cost"]) < 0.2 * float(out["initial_cost"])
    # Output X is resharded over the mesh but numerically complete.
    assert np.isfinite(np.asarray(out["X"])).all()


def test_frontend_dp_matches_per_frame(mesh):
    from tests.golden import dot_grid
    from tinyslam_tpu.frontend import OrbFrontend

    cfg = FrontendConfig(height=96, width=128, num_levels=2,
                         features_per_level=64, threshold=0.1,
                         adaptive_threshold=False)
    rng = np.random.default_rng(2)
    images = np.stack([
        dot_grid(96, 128, spacing=12 + i, offset=24) for i in range(4)
    ]).astype(np.float32)

    batch = extract_features_batch(jnp.asarray(images), cfg.threshold, cfg,
                                   mesh=mesh)
    fe = OrbFrontend(cfg)
    for i in range(4):
        single = fe.extract(jnp.asarray(images[i]))
        np.testing.assert_allclose(
            np.asarray(batch.xy[i]), np.asarray(single.xy), atol=1e-5
        )
        np.testing.assert_array_equal(
            np.asarray(batch.desc[i]), np.asarray(single.desc)
        )
        np.testing.assert_array_equal(
            np.asarray(batch.valid[i]), np.asarray(single.valid)
        )
