"""Fused Pallas TPU kernel for the FAST stage of the front-end.

ONE pass over VMEM-resident row bands computes, per pixel: the FAST-16
bitmask ring test with the rotate-AND streak detector (reference
src/shaders/fast.wgsl:51-60, vectorized on int32 lanes), the margin corner
score, fused 3x3 non-max suppression, AND the separable 15x15
intensity-centroid moments (orientation).

Kernel economics (round-4 rework; the r3 version ran two band passes and
measured ~1% of the memory roofline):

- The expensive data movement on TPU is the LANE-axis (x) shift; sublane
  (y) shifts are several times cheaper.  All x-shifts of the source band
  are HOISTED into 15 shifted planes SX[dx], dx in -7..7, computed once;
  every consumer then only sublane-rolls:
    * ring point (dx, dy)    = subroll(SX[dx], dy)       (|dx| <= 3)
    * box_x                  = sum_dx SX[dx]
    * ramp_x                 = sum_dx dx * SX[dx]
    * m10 = sum_dy subroll(ramp_x, dy),  m01 = sum_dy dy * subroll(box_x, dy)
  Lane rolls drop from ~66 (both passes, every stencil tap) to 17
  (15 hoisted + 2 for NMS); the band is DMA'd from HBM once, not twice.
- Mosaic's scoped-VMEM allocator accounts every live band-sized value;
  with the 15 hoisted planes live throughout, the band is kept small
  (_TILE = 48 rows + 2*_HALO halo) so the working set stays ~5 MB.

Large levels are tiled into row bands with an 8-row halo (ring 3 + NMS 1;
moments 7): the band plus halo is DMA'd from HBM into VMEM scratch,
computed, and the interior rows written out.  Small levels run as a single
whole-image program.  Rolls wrap at the image edges; all wrapped pixels lie
inside the >= 20 px border that the score map masks (same argument as the
reference's border guard, fast.wgsl:74-77); moments are only read at
selected features, which lie inside that border.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tinyslam_tpu.ops.fast import RING16
from tinyslam_tpu.ops.image import gaussian_kernel

_MOMENT_RADIUS = 7
_HALO = 8          # max stencil reach (multiple of 8 for sublane alignment)
_TILE = 48         # rows per band (multiple of 8; 480 = 10 * 48)
_SMALL_PIXELS = 30_000  # below this, single whole-image program


def _subroll(x, dy):
    """x[y+dy, :] via a circular sublane roll."""
    if dy:
        return pltpu.roll(x, -dy % x.shape[0], axis=0)
    return x


def _laneroll(x, dx):
    """x[:, x+dx] via a circular lane roll."""
    if dx:
        return pltpu.roll(x, -dx % x.shape[1], axis=1)
    return x


def _rot16(x, c):
    return ((x >> c) | (x << (16 - c))) & jnp.int32(0xFFFF)


def _runs(x, n):
    """Bit i set iff bits i..i+n-1 (mod 16) set — binary rotate-AND chain."""
    pow_runs = {1: x}
    k = 1
    while k * 2 <= n:
        pow_runs[k * 2] = pow_runs[k] & _rot16(pow_runs[k], k)
        k *= 2
    run = None
    length = 0
    for p2 in sorted(pow_runs, reverse=True):
        if length + p2 <= n:
            run = pow_runs[p2] if run is None else run & _rot16(pow_runs[p2], length)
            length += p2
    return run


def _all_maps(img, t, streak, border, y0, img_h, img_w=None,
              blur_taps=None):
    """(raw_score, nms_score, m10, m01[, blurred]) for one band; y0 = the
    global row of band row 0.  With `blur_taps` (static tuple of 7 Gaussian
    taps) the separable blur that BRIEF samples rides the SAME hoisted
    planes — the XLA pyramid blur was the single largest extract component
    (~2.3 ms measured; single-channel spatial convs lower poorly on TPU)."""
    h, w = img.shape
    if img_w is None:
        img_w = w
    r = _MOMENT_RADIUS

    # ---- hoisted lane shifts: SX[dx] = img[:, x+dx] ----
    SX = {0: img}
    for dx in range(1, r + 1):
        SX[dx] = _laneroll(img, dx)
        SX[-dx] = _laneroll(img, -dx)

    # ---- FAST ring: bitmasks + margins (sublane rolls of SX planes) ----
    bits_over = jnp.zeros(img.shape, jnp.int32)
    bits_under = jnp.zeros(img.shape, jnp.int32)
    margin_over = jnp.zeros(img.shape, jnp.float32)
    margin_under = jnp.zeros(img.shape, jnp.float32)
    for i, (dx, dy) in enumerate(RING16):
        p = _subroll(SX[dx], dy)
        d = p - img
        bits_over = bits_over | jnp.where(d > t, jnp.int32(1 << i), 0)
        bits_under = bits_under | jnp.where(d < -t, jnp.int32(1 << i), 0)
        margin_over = margin_over + jnp.maximum(d - t, 0.0)
        margin_under = margin_under + jnp.maximum(-d - t, 0.0)

    is_corner = (_runs(bits_over, streak) | _runs(bits_under, streak)) > 0
    score = jnp.where(is_corner, jnp.maximum(margin_over, margin_under), 0.0)

    ys = jax.lax.broadcasted_iota(jnp.int32, img.shape, 0) + y0
    xs = jax.lax.broadcasted_iota(jnp.int32, img.shape, 1)
    inside = (
        (ys >= border) & (ys < img_h - border)
        & (xs >= border) & (xs < img_w - border)
    )
    score = jnp.where(inside, score, 0.0)

    # ---- 3x3 NMS: strict > vs raster-earlier neighbours, >= vs later ----
    SS = {0: score, 1: _laneroll(score, 1), -1: _laneroll(score, -1)}
    keep = score > 0.0
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            nb = _subroll(SS[dx], dy)
            keep = keep & ((score > nb) if (dy, dx) < (0, 0) else (score >= nb))
    nms = jnp.where(keep, score, 0.0)

    # ---- 15x15 separable moments from the SAME hoisted planes ----
    # m10 = sum_dx dx * box_y(x+dx) = sum_dy subroll(ramp_x, dy)
    # m01 = sum_dy dy * box_x(y+dy)
    ramp_x = jnp.zeros(img.shape, jnp.float32)
    box_x = img
    for dx in range(1, r + 1):
        ramp_x = ramp_x + float(dx) * (SX[dx] - SX[-dx])
        box_x = box_x + SX[dx] + SX[-dx]
    m10 = ramp_x
    m01 = jnp.zeros(img.shape, jnp.float32)
    for dy in range(1, r + 1):
        m10 = m10 + _subroll(ramp_x, dy) + _subroll(ramp_x, -dy)
        m01 = m01 + float(dy) * (_subroll(box_x, dy) - _subroll(box_x, -dy))
    if blur_taps is None:
        return score, nms, m10, m01

    # ---- separable 7-tap Gaussian from the same hoisted planes ----
    # (wraps at image edges instead of the XLA path's clamp-to-edge; the
    # difference is confined to blurred pixels < 3 px from the edge.
    # BRIEF's rotated reach from a feature is up to PATCH_REACH = 19 px,
    # so a feature at the default 20 px border can sample blurred pixels
    # 1 px from the edge where the two backends disagree — descriptors of
    # border features may differ between the Pallas and XLA paths by a few
    # bits (ADVICE r4).  Matching is ratio/distance-gated, so bit-level
    # backend divergence is within the matcher's tolerance; bit-exact
    # cross-backend parity requires border >= PATCH_REACH + 3 = 22.)
    bt = [float(v) for v in blur_taps]
    blur_x = bt[3] * img
    for k in range(1, 4):
        blur_x = blur_x + bt[3 + k] * SX[k] + bt[3 - k] * SX[-k]
    blurred = bt[3] * blur_x
    for k in range(1, 4):
        blurred = (blurred + bt[3 + k] * _subroll(blur_x, k)
                   + bt[3 - k] * _subroll(blur_x, -k))
    return score, nms, m10, m01, blurred


def _make_small_kernel(body, streak, border, true_w):
    def kernel(img_ref, t_ref, *out_refs):
        outs = body(img_ref[:], t_ref[0], streak, border, 0, img_ref.shape[0],
                    true_w)
        for ref, val in zip(out_refs, outs):
            ref[:] = val
    return kernel


def _make_tiled_kernel(body, streak, border, padded_h, true_h, true_w):
    def kernel(img_hbm, t_ref, *rest):
        n_out = len(rest) - 2
        out_refs, buf, sem = rest[:n_out], rest[-2], rest[-1]
        i = pl.program_id(0)
        band = _TILE + 2 * _HALO
        start = pl.multiple_of(
            jnp.clip(i * _TILE - _HALO, 0, padded_h - band), 8
        )
        dma = pltpu.make_async_copy(img_hbm.at[pl.ds(start, band), :], buf, sem)
        dma.start()
        dma.wait()
        outs = body(buf[:], t_ref[0], streak, border, start, true_h, true_w)

        # Band offset is 0 (top tile), _HALO (interior) or 2*_HALO (bottom)
        # — static slices under predication (dynamic value slices don't
        # lower on TPU Pallas).
        def emit(off):
            def _():
                for ref, val in zip(out_refs, outs):
                    ref[:] = val[off : off + _TILE]
            return _

        n = pl.num_programs(0)
        pl.when(i == 0)(emit(0))
        pl.when((i > 0) & (i < n - 1))(emit(_HALO))
        pl.when((i == n - 1) & (n > 1))(emit(2 * _HALO))
    return kernel


def _stencil_call(body, n_out, img, t, streak, border, interpret=False):
    h, w = img.shape
    band = _TILE + 2 * _HALO
    n_tiles = -(-h // _TILE)
    if h * w <= _SMALL_PIXELS or h % 8 != 0 or n_tiles < 2 or n_tiles * _TILE < band:
        return pl.pallas_call(
            _make_small_kernel(body, streak, border, w),
            out_shape=[jax.ShapeDtypeStruct((h, w), jnp.float32)] * n_out,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * n_out,
            interpret=interpret,
        )(img, t)

    # Pad rows to a band multiple and columns to the 128-lane tile (HBM
    # slices must be lane-tile aligned); true h/w bound the border mask.
    hp = n_tiles * _TILE
    wp = -(-w // 128) * 128
    img_p = jnp.pad(img, ((0, hp - h), (0, wp - w))) if (hp, wp) != (h, w) else img
    out_spec = pl.BlockSpec((_TILE, wp), lambda i: (i, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _make_tiled_kernel(body, streak, border, hp, h, w),
        grid=(n_tiles,),
        out_shape=[jax.ShapeDtypeStruct((hp, wp), jnp.float32)] * n_out,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[out_spec] * n_out,
        scratch_shapes=[
            pltpu.VMEM((band, wp), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(img_p, t)
    return [o[:h, :w] for o in out]


@functools.partial(jax.jit, static_argnames=(
    "border", "streak", "interpret", "blur_taps"))
def fast_score_map_fused(
    img: jax.Array,
    threshold: jax.Array | float,
    border: int = 20,
    streak: int = 9,
    interpret: bool = False,
    blur_taps: tuple | None = None,
):
    """Fused FAST stage: returns (score_raw, score_nms, m10, m01) — plus
    the 7-tap-blurred image when `blur_taps` is given (static tuple; use
    ``tuple(gaussian_kernel(sigma).tolist())``).

    Semantics match ops.fast.fast_score_map + nms3x3 + patch_moments (and
    ops.image.gaussian_blur away from the 3 px edge) away from the border.
    `interpret=True` runs the kernel in Pallas interpret mode (CPU
    correctness tests).
    """
    img = img.astype(jnp.float32)
    t = jnp.asarray(threshold, jnp.float32).reshape(1)
    n_out = 4 if blur_taps is None else 5
    body = functools.partial(_all_maps, blur_taps=blur_taps)
    return tuple(_stencil_call(
        body, n_out, img, t, streak, border, interpret=interpret))
