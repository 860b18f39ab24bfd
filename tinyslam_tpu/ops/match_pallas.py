"""Streaming Hamming matcher — the full match, one Pallas kernel.

The XLA matcher (ops/hamming.py) materializes the (N, M) distance matrix in
HBM and then runs ~6 full passes over it (mask, argmin, second-best mask,
min, cross-check argmin): at N=2048 features x M=8192 map points that is
~64 MB x 6 of HBM traffic per call, ~1.5 ms measured on chip — and the
matcher is called up to 7x per tracked/keyframe step.

This kernel streams (NB, MB) distance blocks through VMEM flash-attention
style: each block is produced by one MXU ``dot_general`` (the sign trick of
ops/hamming.py — dot(a,b) = 256 - 2*hamming; signs cast to bf16 in-kernel,
which is exact for +-1 values with f32 accumulation) and immediately
reduced into running per-row (best, second, argmin) and per-column
(best-argmin) accumulators.  The distance matrix never exists in HBM; total
HBM traffic is the descriptors themselves (~2.5 MB).  Guided-matching
gating (reprojection radius, models/vo.py:_match_to_map) folds in as an
additive penalty computed in-kernel from the feature / projected-landmark
coordinates, so no (N, M) pair mask is materialized either.

Kernel economics (why it is shaped this way):
  - min+argmin in ONE cross-lane reduction: pack ``code = dist << SHIFT |
    index`` (dist <= 856 incl. penalties, so the code fits int32 exactly);
    the min of codes is the min distance with ties broken toward the
    LOWEST index — the same tie-break as jnp.argmin in the XLA path.
  - second-best costs one more masked min (excluding exactly the single
    argmin element, matching the XLA path's ``d.at[argmin].set(BIG)``).
  - the per-column running argmin accumulates in a (1, M) VMEM scratch
    (scratch persists across the whole grid; output blocks only persist
    across CONSECUTIVE visits, and the j-th column block is revisited
    non-consecutively across the outer i axis).
  - invalid rows/cols and gate failures add integer penalties (> 256)
    instead of masks, so validity costs zero extra passes.

Semantics match the XLA path on every valid row — including tie-breaking
and the ratio test's second-best (asserted by tests/test_match_pallas.py).

The reference has no matcher at all (matching is unchecked roadmap,
reference README.md:53-57); this is the BASELINE "kernels at
speed-of-light" requirement applied to the matching stage.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Additive integer penalty for an invalid slot or a failed gate: anything
# > 256 (the max true Hamming distance) keeps the row un-matchable by the
# max_distance test while keeping packed codes small.
PEN = 300
_MAXD = 256 + 2 * PEN + 1     # distances are < this after penalties


def _shift_for(n: int) -> int:
    s = 1
    while (1 << s) < n:
        s += 1
    return s


def _kernel(a_ref, bT_ref, arow_ref, bcol_ref,
            code_ref, second_ref, colcode_ref,
            rcode, rsec, cacc, *, radius2, guided, mb, mshift, nshift):
    i = pl.program_id(0)
    j = pl.program_id(1)
    ni = pl.num_programs(0)
    nj = pl.num_programs(1)
    nb = a_ref.shape[0]

    dot = jax.lax.dot_general(
        a_ref[:].astype(jnp.bfloat16), bT_ref[:].astype(jnp.bfloat16),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        # Explicit: the framework-wide float32 matmul precision default
        # (tinyslam_tpu/__init__.py) is invalid for bf16 operands in Mosaic.
        precision=jax.lax.Precision.DEFAULT,
    )                                                   # (nb, mb) f32, exact
    d = ((256.0 - dot) * 0.5).astype(jnp.int32)
    # Penalties: invalid rows / cols (and the guided gate below) push the
    # distance beyond any max_distance instead of masking.
    d = d + arow_ref[:, 0:1].astype(jnp.int32) + bcol_ref[0:1, :].astype(jnp.int32)
    if guided:
        du = arow_ref[:, 1:2] - bcol_ref[1:2, :]
        dv = arow_ref[:, 2:3] - bcol_ref[2:3, :]
        d = d + jnp.where(du * du + dv * dv < radius2, 0, PEN)

    colg = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1) + j * mb
    rowg = jax.lax.broadcasted_iota(jnp.int32, d.shape, 0) + i * nb

    # ---- row side: (best, argmin) in one packed reduction + second ----
    code = (d << mshift) | colg
    cmin = jnp.min(code, axis=1, keepdims=True)         # (nb, 1)
    jmin = cmin & ((1 << mshift) - 1)
    m1 = cmin >> mshift
    m2 = jnp.min(jnp.where(colg == jmin, _MAXD, d), axis=1, keepdims=True)

    @pl.when(j == 0)
    def _():
        rcode[:] = jnp.full_like(rcode, _MAXD << mshift)
        rsec[:] = jnp.full_like(rsec, _MAXD)

    b1 = rcode[:] >> mshift
    rsec[:] = jnp.minimum(jnp.minimum(rsec[:], m2), jnp.maximum(b1, m1))
    rcode[:] = jnp.minimum(rcode[:], cmin)

    @pl.when(j == nj - 1)
    def _():
        code_ref[:] = rcode[:]
        second_ref[:] = rsec[:]

    # ---- column side: packed argmin over rows.  The j-th output block is
    # revisited across the OUTER grid axis i (non-consecutively when nj > 1),
    # and Pallas TPU only guarantees output-block persistence across
    # CONSECUTIVE visits — so the running min lives in a full-width (1, M)
    # VMEM scratch (scratch persists across the whole grid) and the j-slice
    # is copied into the output block on the last i visit.
    ccode = jnp.min((d << nshift) | rowg, axis=0, keepdims=True)  # (1, mb)
    sl = pl.ds(j * mb, mb)

    @pl.when(i == 0)
    def _():
        cacc[0:1, sl] = ccode

    @pl.when(i > 0)
    def _():
        cacc[0:1, sl] = jnp.minimum(cacc[0:1, sl], ccode)

    @pl.when(i == ni - 1)
    def _():
        colcode_ref[:] = cacc[0:1, sl]


@functools.partial(
    jax.jit,
    static_argnames=("radius_px", "guided", "nb", "mb", "interpret"))
def match_reduce_streaming(
    sa: jax.Array,        # (N, 256) int8 sign descriptors
    sbT: jax.Array,       # (256, M) int8
    arow: jax.Array,      # (N, 4) f32: [penalty, u, v, 0]
    bcol: jax.Array,      # (4, M) f32: [penalty, u, v, 0]
    radius_px: float = 0.0,
    guided: bool = False,
    nb: int = 256,
    mb: int = 8192,
    interpret: bool = False,
):
    """Streamed all-pairs Hamming reduction.

    Returns (best, second, idx_b, col_idx) as f32/f32/int32/int32: per-row
    best/second distances (with penalties folded in) and argmin, plus the
    per-column argmin for the cross-check.  N, M must be multiples of
    (nb, mb) — pad with penalty=PEN rows/cols.
    """
    N = sa.shape[0]
    M = sbT.shape[1]
    nb = min(nb, N)
    mb = min(mb, M)
    assert N % nb == 0 and M % mb == 0, (N, M, nb, mb)
    grid = (N // nb, M // mb)
    mshift = _shift_for(M)
    nshift = _shift_for(N)

    kern = functools.partial(
        _kernel, radius2=float(radius_px) ** 2, guided=guided,
        mb=mb, mshift=mshift, nshift=nshift)
    code, second, colcode = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((nb, 256), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((256, mb), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, 4), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, mb), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((nb, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mb), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N, 1), jnp.int32),
            jax.ShapeDtypeStruct((N, 1), jnp.int32),
            jax.ShapeDtypeStruct((1, M), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((nb, 1), jnp.int32),
            pltpu.VMEM((nb, 1), jnp.int32),
            pltpu.VMEM((1, M), jnp.int32),
        ],
        interpret=interpret,
    )(sa, sbT, arow, bcol)
    best = (code[:, 0] >> mshift).astype(jnp.float32)
    idx_b = code[:, 0] & ((1 << mshift) - 1)
    col_idx = colcode[0] & ((1 << nshift) - 1)
    return best, second[:, 0].astype(jnp.float32), idx_b, col_idx
