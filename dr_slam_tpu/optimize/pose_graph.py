"""Pose-graph optimization (essential graph) -- matrix-free Gauss-Newton.

Capability of Optimizer::OptimizeEssentialGraph (src/Optimizer.cc:2894):
after a loop closure, relax all keyframe poses against relative SE3
constraints (spanning tree + covisibility + loop edges; fixed scale for
RGB-D). g2o builds a sparse block system; the TPU formulation is matrix-free
LM-PCG: residuals are se3_log of pose-cycle errors over a fixed-capacity
edge table, Hessian-vector products come from jvp/vjp of the residual
function, and conjugate gradients runs as a lax.scan -- everything batches
over edges on the VPU with no sparse bookkeeping."""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from dr_slam_tpu.geometry import se3


class PoseGraph(NamedTuple):
    poses: jnp.ndarray      # (NK, 4, 4) initial T_cw
    pose_valid: jnp.ndarray  # (NK,)
    edge_i: jnp.ndarray     # (E,) int32
    edge_j: jnp.ndarray     # (E,) int32
    edge_T_ij: jnp.ndarray  # (E, 4, 4) measured T_i @ inv(T_j)
    edge_valid: jnp.ndarray  # (E,)
    edge_weight: jnp.ndarray  # (E,)
    fixed: jnp.ndarray      # (NK,) bool -- poses to keep (first KF / loop KF)


def _cg(hvp, b, n_iters: int, damping: float):
    """Conjugate gradients on (H + damping I) x = b; x0 = 0."""
    def mv(v):
        return hvp(v) + damping * v

    x0 = jnp.zeros_like(b)
    r0 = b
    p0 = r0
    rs0 = jnp.vdot(r0, r0)

    def body(carry, _):
        x, r, p, rs = carry
        Ap = mv(p)
        alpha = rs / jnp.maximum(jnp.vdot(p, Ap), 1e-12)
        x = x + alpha * p
        r = r - alpha * Ap
        rs_new = jnp.vdot(r, r)
        beta = rs_new / jnp.maximum(rs, 1e-12)
        p = r + beta * p
        return (x, r, p, rs_new), None

    (x, _, _, _), _ = jax.lax.scan(body, (x0, r0, p0, rs0), None,
                                   length=n_iters)
    return x


@functools.partial(jax.jit, static_argnames=("n_gn_iters", "n_cg_iters"))
def optimize_pose_graph(g: PoseGraph, n_gn_iters: int = 10,
                        n_cg_iters: int = 60, damping: float = 1e-4
                        ) -> jnp.ndarray:
    """-> optimized (NK, 4, 4) poses."""
    NK = g.poses.shape[0]
    w = (g.edge_valid.astype(jnp.float32) * g.edge_weight)
    free = (g.pose_valid & ~g.fixed).astype(jnp.float32)[:, None]

    T_cur = g.poses

    def gn_step(T_cur, _):
        def res_at(xi):
            Tl = se3.se3_exp(xi * free) @ T_cur
            Ti = Tl[g.edge_i]
            Tj = Tl[g.edge_j]
            E = g.edge_T_ij @ Tj @ se3.inv_T(Ti)
            return (se3.se3_log(E) * jnp.sqrt(w)[:, None]).reshape(-1)

        xi0 = jnp.zeros((NK, 6))
        r0, jvp_lin = jax.linearize(res_at, xi0)
        _, vjp = jax.vjp(res_at, xi0)

        def hvp(v):
            return vjp(jvp_lin(v.reshape(NK, 6)))[0].reshape(-1)

        b = -vjp(r0)[0].reshape(-1)
        dx = _cg(hvp, b, n_cg_iters, damping)
        dx = jnp.where(jnp.all(jnp.isfinite(dx)), dx, 0.0)
        T_new = se3.se3_exp(dx.reshape(NK, 6) * free) @ T_cur
        return T_new, None

    T_out, _ = jax.lax.scan(gn_step, T_cur, None, length=n_gn_iters)
    return T_out
