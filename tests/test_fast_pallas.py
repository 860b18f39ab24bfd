"""Pallas fused FAST kernel vs the pure-XLA reference path, in interpret
mode on CPU (the real-TPU path compiles the same kernel)."""

import numpy as np
import jax.numpy as jnp
import pytest

from tinyslam_tpu.ops.fast import fast_score_map, nms3x3
from tinyslam_tpu.ops.fast_pallas import _HALO, _TILE, fast_score_map_fused


@pytest.mark.parametrize("shape", [(480, 640), (96, 128), (120, 160)])
def test_fused_matches_xla(shape):
    h, w = shape
    rng = np.random.default_rng(3)
    img = jnp.asarray(rng.random((h, w), np.float32))
    t = 0.08
    border = 20
    raw_ref, m10_ref, m01_ref = fast_score_map(img, t, border, 9)
    nms_ref = nms3x3(raw_ref)
    raw, nms, m10, m01 = fast_score_map_fused(img, t, border, 9,
                                              interpret=True)
    np.testing.assert_allclose(np.asarray(raw), np.asarray(raw_ref),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(nms), np.asarray(nms_ref),
                               atol=1e-5)
    # Moments are only consumed at selected features: compare inside the
    # border (the XLA path zero-pads, the Pallas path wraps outside it).
    b = border
    np.testing.assert_allclose(np.asarray(m10)[b:-b, b:-b],
                               np.asarray(m10_ref)[b:-b, b:-b], atol=1e-3)
    np.testing.assert_allclose(np.asarray(m01)[b:-b, b:-b],
                               np.asarray(m01_ref)[b:-b, b:-b], atol=1e-3)


def test_tiling_covers_band_boundaries():
    """Scores at band boundaries must be identical to the single-program
    path (halo correctness)."""
    h, w = _TILE * 3, 256
    rng = np.random.default_rng(5)
    img = jnp.asarray(rng.random((h, w), np.float32))
    raw_t, nms_t, m10_t, m01_t = fast_score_map_fused(img, 0.06, 20, 9,
                                                      interpret=True)
    # Compare against the XLA reference near every band boundary row.
    raw_ref, m10_ref, m01_ref = fast_score_map(img, 0.06, 20, 9)
    for row in (_TILE - 1, _TILE, _TILE + 1, 2 * _TILE - 1, 2 * _TILE):
        np.testing.assert_allclose(np.asarray(raw_t)[row],
                                   np.asarray(raw_ref)[row], atol=1e-5)
        np.testing.assert_allclose(np.asarray(m10_t)[row, 20:-20],
                                   np.asarray(m10_ref)[row, 20:-20],
                                   atol=1e-3)


def test_fused_blur_matches_xla_away_from_edges():
    from tinyslam_tpu.ops.image import gaussian_blur, gaussian_kernel

    rng = np.random.default_rng(7)
    img = jnp.asarray(rng.random((480, 640), np.float32))
    taps = tuple(float(v) for v in gaussian_kernel(2.0))
    outs = fast_score_map_fused(img, 0.08, 20, 9, interpret=True,
                                blur_taps=taps)
    assert len(outs) == 5
    blur_ref = gaussian_blur(img, 2.0)
    # Wrap-vs-clamp addressing differs only within 3 px of the border.
    np.testing.assert_allclose(np.asarray(outs[4])[4:-4, 4:-4],
                               np.asarray(blur_ref)[4:-4, 4:-4], atol=1e-5)
