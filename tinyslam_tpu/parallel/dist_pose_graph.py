"""Distributed pose-graph optimization: edges sharded over the mesh.

The trajectory-growth analog of sequence parallelism (SURVEY §5
"long-context"): as the pose graph grows, edge count E (odometry + loop
closures) dominates the per-iteration Jacobian/assembly work, while the
node state (N poses) stays comparatively small.  So we shard the EDGE set
over a mesh axis and keep the node state replicated:

- each device evaluates residuals + Jacobians for its E/D edge shard and
  scatter-adds its local (6N x 6N) normal-equation block;
- one ``lax.psum`` over the axis yields the global H, g on every device;
- the Cholesky solve and the node update run replicated (deterministic, so
  no broadcast needed).

Per-GN-iteration communication is a single (6N)^2 + 6N allreduce over ICI,
independent of E — the same O(state), not O(data), comms shape as the
landmark-sharded BA (parallel/dist_ba.py).

The reference has no distributed layer of any kind (SURVEY §2d: absence
verified over the whole repo); this component exists to satisfy the
BASELINE multi-host SLAM config.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from tinyslam_tpu.backend.pose_graph import _pose_graph_core


def optimize_pose_graph_sharded(
    mesh: Mesh,
    R: jax.Array,          # (N, 3, 3) replicated
    t: jax.Array,          # (N, 3)
    edge_i: jax.Array,     # (E,) int32 — E must divide by the axis size
    edge_j: jax.Array,     # (E,)
    edge_R: jax.Array,     # (E, 3, 3)
    edge_t: jax.Array,     # (E, 3)
    edge_valid: jax.Array, # (E,) bool
    edge_weight: jax.Array | None = None,
    node_valid: jax.Array | None = None,
    iters: int = 20,
    damping: float = 1e-6,
    axis: str = "landmark",
) -> dict:
    """Same contract and (up to reduction order) result as
    backend.pose_graph.optimize_pose_graph, with edges sharded over mesh
    axis ``axis``.  Pad the edge set (edge_valid=False) to a multiple of
    the axis size — invalid edges contribute zero."""
    if edge_weight is None:
        edge_weight = jnp.ones(edge_i.shape, jnp.float32)
    if node_valid is None:
        node_valid = jnp.ones((R.shape[0],), bool)

    repl = P()
    shard_E = P(axis)

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(repl, repl, shard_E, shard_E, shard_E, shard_E, shard_E,
                  shard_E, repl),
        out_specs={"R": repl, "t": repl, "costs": repl},
        check_vma=False,
    )
    def run(R_, t_, ei_, ej_, eR_, et_, ev_, ew_, nv_):
        return _pose_graph_core(
            R_, t_, ei_, ej_, eR_, et_, ev_, ew_, nv_,
            iters=iters, damping=damping,
            preduce=lambda x: jax.lax.psum(x, axis),
        )

    with mesh:
        return run(R, t, edge_i, edge_j, edge_R, edge_t, edge_valid,
                   edge_weight, node_valid)
