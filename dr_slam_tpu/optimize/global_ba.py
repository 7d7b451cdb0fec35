"""Bundle adjustment -- matrix-free LM-PCG over poses and landmarks.

Capability of Optimizer::GlobalBundleAdjustemnt / BundleAdjustment
(src/Optimizer.cc:36-600; 20 iterations at loop closure, LoopClosing.cc:691)
and LocalBundleAdjustment (:2067, disabled in the reference's active path,
LocalMapping.cc:67-69 -- here it exists and is gated by config).

g2o assembles a sparse Schur system on the CPU. The TPU formulation never
materializes the Hessian: the reprojection residual over the FULL
observation table (every (keyframe, feature) -> map-point entry, i.e. the
kf_mp table from slam/state.py) is one vmapped function; Gauss-Newton steps
solve the normal equations with conjugate gradients whose Hessian-vector
products are a jvp/vjp pair through that function. Every CG iteration is
two passes over the observation axis -- embarrassingly data-parallel, which
is exactly what parallel/sharded_ba.py shards over a device mesh for maps
that outgrow one chip (SURVEY.md section 2.8's honest scaling axis)."""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from dr_slam_tpu.geometry import se3
from dr_slam_tpu.optimize.pose_graph import _cg


class BAProblem(NamedTuple):
    kf_pose: jnp.ndarray    # (NK, 4, 4) initial T_cw
    pt_pos: jnp.ndarray     # (NP, 3) initial world points
    obs_kf: jnp.ndarray     # (M,) int32 keyframe index per observation
    obs_pt: jnp.ndarray     # (M,) int32 map-point index
    obs_uv: jnp.ndarray     # (M, 2) pixel observation
    obs_z: jnp.ndarray      # (M,) observed metric depth (<=0: none)
    obs_inv_sigma2: jnp.ndarray  # (M,)
    obs_valid: jnp.ndarray  # (M,) bool
    kf_free: jnp.ndarray    # (NK,) bool -- optimize this pose
    pt_free: jnp.ndarray    # (NP,) bool


def problem_from_state(state, max_obs: int | None = None) -> BAProblem:
    """Flatten the kf_mp observation table into a BAProblem."""
    NK, K = state.kf_mp.shape
    obs_kf = jnp.repeat(jnp.arange(NK, dtype=jnp.int32), K)
    obs_pt = state.kf_mp.reshape(-1)
    obs_uv = state.kf_uv.reshape(-1, 2)
    obs_z = state.kf_xyz[..., 2].reshape(-1)
    inv_s2 = 1.0 / jnp.maximum(state.kf_sigma2.reshape(-1), 1e-6)
    valid = (obs_pt >= 0) & state.kf_valid[obs_kf] & state.kf_kp_valid.reshape(-1)
    obs_pt = jnp.clip(obs_pt, 0)
    valid &= state.pt_valid[obs_pt]
    fixed_first = jnp.arange(NK) != 0  # gauge: first keyframe fixed
    return BAProblem(
        kf_pose=state.kf_pose, pt_pos=state.pt_pos,
        obs_kf=obs_kf, obs_pt=obs_pt, obs_uv=obs_uv, obs_z=obs_z,
        obs_inv_sigma2=inv_s2, obs_valid=valid,
        kf_free=state.kf_valid & fixed_first,
        pt_free=state.pt_valid)


@functools.partial(jax.jit, static_argnames=("window",))
def local_problem_from_state(state, center_kf, window: int = 8) -> BAProblem:
    """Local-window BA problem (the reference's LocalBundleAdjustment,
    Optimizer.cc:2067, gated off in its active path, LocalMapping.cc:67-69):
    the `window` keyframes most covisible with `center_kf` are free (oldest
    anchors the gauge), only THEIR observation rows enter the problem, and
    only points they observe are free. Fixed shapes: (window, K)
    observations regardless of map size, so per-keyframe refinement cost
    stays O(window), not O(map)."""
    NK, K = state.kf_mp.shape
    NP = state.pt_pos.shape[0]
    # covisibility with the center keyframe (shared-point counts)
    row = state.kf_mp[center_kf]
    ind = jnp.zeros(NP + 1, jnp.int32).at[
        jnp.where(row >= 0, row, NP)].set(1)
    cnt = jnp.sum(ind[jnp.clip(state.kf_mp, 0)] * (state.kf_mp >= 0), -1)
    cnt = cnt * state.kf_valid
    cnt = cnt.at[center_kf].set(jnp.int32(10 ** 6))   # center always in
    _, win = jax.lax.top_k(cnt, window)               # (W,) slot ids
    win_ok = cnt[win] > 0
    # gauge: fix the OLDEST window member (smallest seq)
    seq = jnp.where(win_ok, state.kf_seq[win], jnp.int32(2 ** 30))
    anchor = jnp.argmin(seq)
    kf_free = win_ok & (jnp.arange(window) != anchor)

    obs_kf = jnp.repeat(jnp.arange(window, dtype=jnp.int32), K)
    obs_pt = state.kf_mp[win].reshape(-1)
    valid = ((obs_pt >= 0) & state.kf_kp_valid[win].reshape(-1)
             & jnp.repeat(win_ok, K))
    obs_pt = jnp.clip(obs_pt, 0)
    valid &= state.pt_valid[obs_pt]
    pt_free = (jnp.zeros(NP, bool).at[jnp.where(valid, obs_pt, 0)].max(valid)
               & state.pt_valid)
    return BAProblem(
        kf_pose=state.kf_pose[win], pt_pos=state.pt_pos,
        obs_kf=obs_kf, obs_pt=obs_pt,
        obs_uv=state.kf_uv[win].reshape(-1, 2),
        obs_z=state.kf_xyz[win][..., 2].reshape(-1),
        obs_inv_sigma2=1.0 / jnp.maximum(state.kf_sigma2[win].reshape(-1),
                                         1e-6),
        obs_valid=valid, kf_free=kf_free, pt_free=pt_free), win


@functools.partial(
    jax.jit, static_argnames=("n_gn_iters", "n_cg_iters", "huber"))
def bundle_adjust(p: BAProblem, K4, n_gn_iters: int = 8, n_cg_iters: int = 40,
                  damping: float = 1e-3, huber: bool = True,
                  chi2_mono: float = 5.991):
    """-> (kf_pose (NK,4,4), pt_pos (NP,3)) optimized."""
    NK = p.kf_pose.shape[0]
    NP = p.pt_pos.shape[0]
    K4 = jnp.asarray(K4, dtype=jnp.float32)
    kf_freef = p.kf_free.astype(jnp.float32)[:, None]
    pt_freef = p.pt_free.astype(jnp.float32)[:, None]

    has_z = p.obs_z > 1e-3
    sigma_z = 0.0025 * p.obs_z * p.obs_z + 0.002
    info_z = jnp.where(has_z, 1.0 / (sigma_z * sigma_z), 0.0)

    def reproj(T_all, X_all):
        """(M, 3) residual: (du, dv, dz) -- reprojection + metric depth.
        The depth channel conditions the low-parallax RGB-D geometry (see
        optimize/residuals.point_residuals)."""
        T = T_all[p.obs_kf]                    # (M, 4, 4)
        X = X_all[p.obs_pt]                    # (M, 3)
        Xc = jnp.einsum("mij,mj->mi", T[:, :3, :3], X) + T[:, :3, 3]
        uv = se3.project(K4, Xc)
        dz = jnp.where(has_z, p.obs_z - Xc[:, 2], 0.0)
        r = jnp.concatenate([p.obs_uv - uv, dz[:, None]], -1)   # (M, 3)
        ok = p.obs_valid & (Xc[:, 2] > 0.05)
        return r, ok

    def obs_info(ok):
        return jnp.stack([p.obs_inv_sigma2 * ok, p.obs_inv_sigma2 * ok,
                          info_z * ok], -1)

    def weights(T_all, X_all):
        r, ok = reproj(T_all, X_all)
        info = obs_info(ok)
        chi2 = jnp.sum(r * r * info, -1)
        w = info
        if huber:
            hw = jnp.where(chi2 <= chi2_mono, 1.0,
                           jnp.sqrt(chi2_mono / jnp.maximum(chi2, 1e-9)))
            w = w * hw[:, None]
        return w

    def gn_step(carry, _):
        T_cur, X_cur = carry
        w = weights(T_cur, X_cur)             # frozen IRLS weights (M, 3)
        sw = jnp.sqrt(w)

        def res_at(params):
            xi, dX = params
            T = se3.se3_exp(xi * kf_freef) @ T_cur
            X = X_cur + dX * pt_freef
            r, _ = reproj(T, X)
            return (r * sw).reshape(-1)

        zero = (jnp.zeros((NK, 6)), jnp.zeros((NP, 3)))
        r0, jvp_lin = jax.linearize(res_at, zero)
        _, vjp = jax.vjp(res_at, zero)

        nk6 = NK * 6

        def unflat(v):
            return (v[:nk6].reshape(NK, 6), v[nk6:].reshape(NP, 3))

        def flat(t):
            return jnp.concatenate([t[0].reshape(-1), t[1].reshape(-1)])

        def hvp(v):
            return flat(vjp(jvp_lin(unflat(v)))[0])

        b = -flat(vjp(r0)[0])
        dx = _cg(hvp, b, n_cg_iters, damping)
        dx = jnp.where(jnp.all(jnp.isfinite(dx)), dx, 0.0)
        dxi, dX = unflat(dx)
        T_new = se3.se3_exp(dxi * kf_freef) @ T_cur
        X_new = X_cur + dX * pt_freef
        return (T_new, X_new), None

    (T_out, X_out), _ = jax.lax.scan(gn_step, (p.kf_pose, p.pt_pos), None,
                                     length=n_gn_iters)
    return T_out, X_out
