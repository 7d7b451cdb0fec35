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
    # robust (Huber/IRLS) eligibility per edge. Odometry/covisibility
    # measurements can be POISONED: a keyframe inserted while the tracker
    # is jumping between two map gauges (e.g. at a loop seam, where old-
    # and new-gauge structure are both in view) records a relative motion
    # that contains the gauge jump, not camera motion -- measured 0.3-0.6 m
    # error on seam keyframes vs <0.04 m everywhere else. IRLS downweights
    # those outlier edges so they cannot drag the whole chain. Loop edges
    # are EXEMPT (robust=False): they are RANSAC-verified by independent
    # geometric consensus, and their initially-huge residual (they carry
    # the entire accumulated drift, which is exactly what the solve is
    # meant to remove) would otherwise be self-downweighted to nothing.
    edge_robust: jnp.ndarray | None = None  # (E,) bool; None = all robust


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
                        n_cg_iters: int = 60, damping: float = 1e-4,
                        huber_delta: float = 0.08) -> jnp.ndarray:
    """-> optimized (NK, 4, 4) poses.

    huber_delta: IRLS width on the se3_log edge residual norm
    (robust-eligible edges only, see PoseGraph.edge_robust); ~2x the
    worst healthy odometry-edge error, well under a gauge jump. The
    kernel is REDESCENDING (Tukey biweight, cutoff 3*delta): a Huber
    weight keeps w*r ~ delta for arbitrarily-large outliers, so a 0.5 m
    gauge-jump edge pulls as hard as a healthy edge's full residual --
    measured on the loop-seam scenario it dragged the mid-chain 0.2 m
    AWAY from the odometry-consistent solution. Tukey zeroes it (a 0.01
    floor keeps a node with only poisoned edges weakly tied instead of
    singular -- damping alone would freeze it at its drifted initial)."""
    NK = g.poses.shape[0]
    w = (g.edge_valid.astype(jnp.float32) * g.edge_weight)
    robust = (jnp.ones_like(w, dtype=bool) if g.edge_robust is None
              else g.edge_robust)
    free = (g.pose_valid & ~g.fixed).astype(jnp.float32)[:, None]

    T_cur = g.poses

    def edge_res(Tl):
        Ti = Tl[g.edge_i]
        Tj = Tl[g.edge_j]
        return se3.se3_log(g.edge_T_ij @ Tj @ se3.inv_T(Ti))  # (E, 6)

    def gn_step(T_cur, _):
        # IRLS: re-weight from the residuals at the CURRENT iterate, so a
        # poisoned edge loses influence as the healthy chain tightens
        rn = jnp.linalg.norm(edge_res(T_cur), axis=-1)
        c = 3.0 * huber_delta
        tukey = jnp.where(rn < c, (1.0 - (rn / c) ** 2) ** 2, 0.0)
        w_irls = jnp.where(robust, jnp.maximum(tukey, 0.01), 1.0)
        w_eff = w * w_irls

        def res_at(xi):
            Tl = se3.se3_exp(xi * free) @ T_cur
            return (edge_res(Tl) * jnp.sqrt(w_eff)[:, None]).reshape(-1)

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
