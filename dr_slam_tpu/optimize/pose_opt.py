"""Per-frame pose optimization: batched Gauss-Newton/LM with IRLS rounds.

Capability of Optimizer::PoseOptimization (src/Optimizer.cc:601-1338) and
Optimizer::TranslationOptimization (:3211-3980): one SE3 (or translation-only)
vertex, unary edges for points (mono chi2 5.991 / stereo 7.815), lines, planes
and optional parallel/vertical structural edges, optimized as 4 rounds x 10
iterations with between-round inlier reclassification and the robust kernel
dropped after round 2 (Optimizer.cc:1044-1330).

TPU design: all residuals are fixed-capacity masked arrays; each iteration
linearizes with jax.jacfwd (6 JVP passes), reduces H = J^T W J (6x6) and
b = J^T W r with one einsum over every edge, and solves a damped 6x6 system.
The discrete setLevel outlier moves of g2o become weight masks (IRLS), so the
whole 4-round schedule compiles to one fused device program with zero host
round-trips. Translation-only mode restricts the tangent update to the
translation block, reproducing EdgeSE3ProjectXYZOnlyTranslation semantics
(Thirdparty/g2o types_six_dof_expmap.h additions) for Manhattan-fixed
rotation tracking."""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from dr_slam_tpu.geometry import se3
from dr_slam_tpu.optimize import residuals as res

CHI2_MONO = 5.991
CHI2_STEREO = 9.488  # 4 components: (du, dv, duR, dz) -- chi2_0.05 with 4 dof
CHI2_LINE = 3.84


class PoseObservations(NamedTuple):
    """Fixed-capacity observation set for one frame's pose solve."""
    pt_world: jnp.ndarray     # (NP, 3)
    pt_obs: jnp.ndarray       # (NP, 3) (u, v, uR); uR<0 = mono
    pt_inv_sigma2: jnp.ndarray  # (NP,)
    pt_valid: jnp.ndarray     # (NP,) bool
    ln_world: jnp.ndarray     # (NL, 6) 3D endpoints
    ln_obs: jnp.ndarray       # (NL, 3) normalized 2D line equation
    ln_inv_sigma2: jnp.ndarray
    ln_valid: jnp.ndarray
    pl_world: jnp.ndarray     # (NF, 4)
    pl_obs: jnp.ndarray       # (NF, 4) camera-frame observation
    pl_valid: jnp.ndarray
    par_world: jnp.ndarray    # (NS, 4) parallel-relation planes
    par_obs: jnp.ndarray
    par_valid: jnp.ndarray
    ver_world: jnp.ndarray    # (NS, 4) vertical-relation planes
    ver_obs: jnp.ndarray
    ver_valid: jnp.ndarray

    @staticmethod
    def empty(n_pt: int, n_ln: int, n_pl: int, n_st: int) -> "PoseObservations":
        z = jnp.zeros
        return PoseObservations(
            pt_world=z((n_pt, 3)), pt_obs=z((n_pt, 3)),
            pt_inv_sigma2=jnp.ones(n_pt), pt_valid=z(n_pt, bool),
            ln_world=z((n_ln, 6)), ln_obs=z((n_ln, 3)),
            ln_inv_sigma2=jnp.ones(n_ln), ln_valid=z(n_ln, bool),
            pl_world=z((n_pl, 4)).at[:, 2].set(1.0),
            pl_obs=z((n_pl, 4)).at[:, 2].set(1.0), pl_valid=z(n_pl, bool),
            par_world=z((n_st, 4)).at[:, 2].set(1.0),
            par_obs=z((n_st, 4)).at[:, 2].set(1.0), par_valid=z(n_st, bool),
            ver_world=z((n_st, 4)).at[:, 2].set(1.0),
            ver_obs=z((n_st, 4)).at[:, 2].set(1.0), ver_valid=z(n_st, bool),
        )


class PoseOptResult(NamedTuple):
    T_cw: jnp.ndarray
    pt_inlier: jnp.ndarray    # (NP,) bool
    ln_inlier: jnp.ndarray
    pl_inlier: jnp.ndarray
    n_inliers: jnp.ndarray    # () int32 point inliers (reference return value)
    chi2: jnp.ndarray         # () total weighted chi2


def _all_residuals(T, obs: PoseObservations, K4, bf, masks, huber_on,
                   angle_info, dist_info, plane_chi2, vp_chi2, struct_on,
                   prior_T=None, prior_w=None):
    """Flat weighted residual vector + weight vector + per-edge chi2s."""
    pt_m, ln_m, pl_m = masks
    r_pt, i_pt, c_pt, is_st = res.point_residuals(
        T, obs.pt_world, obs.pt_obs, obs.pt_inv_sigma2,
        obs.pt_valid & pt_m, K4, bf)
    r_ln, i_ln, c_ln = res.line_residuals(
        T, obs.ln_world, obs.ln_obs, obs.ln_inv_sigma2,
        obs.ln_valid & ln_m, K4)
    r_pl, i_pl, c_pl = res.plane_residuals(
        T, obs.pl_world, obs.pl_obs, obs.pl_valid & pl_m,
        angle_info, dist_info)
    r_par, i_par, c_par = res.parallel_residuals(
        T, obs.par_world, obs.par_obs, obs.par_valid & struct_on, angle_info)
    r_ver, i_ver, c_ver = res.vertical_residuals(
        T, obs.ver_world, obs.ver_obs, obs.ver_valid & struct_on, angle_info)

    def huber_w(chi2, delta2):
        c = jnp.sqrt(jnp.maximum(chi2, 1e-12))
        d = jnp.sqrt(delta2)
        w = jnp.where(chi2 <= delta2, 1.0, d / c)
        # huber_on is traced (0.0/1.0) so one compiled body serves all rounds
        return jnp.where(huber_on > 0.5, w, jnp.ones_like(w))

    th_pt = jnp.where(is_st, CHI2_STEREO, CHI2_MONO)
    w_pt = i_pt * huber_w(c_pt, th_pt)[..., None]
    w_ln = i_ln * huber_w(c_ln, CHI2_LINE)[..., None]
    w_pl = i_pl * huber_w(c_pl, plane_chi2)[..., None]
    w_par = i_par * huber_w(c_par, vp_chi2)[..., None]
    w_ver = i_ver * huber_w(c_ver, vp_chi2)[..., None]

    parts_r = [r_pt, r_ln, r_pl, r_par, r_ver]
    parts_w = [w_pt, w_ln, w_pl, w_par, w_ver]
    if prior_T is not None:
        # weak motion prior: log(T T_prior^-1), damps escapes into rotated
        # pseudo-minima when scene observability is marginal
        r_prior = se3.se3_log(T @ se3.inv_T(prior_T))
        parts_r.append(r_prior)
        parts_w.append(prior_w)
    r = jnp.concatenate([x.reshape(-1) for x in parts_r])
    w = jnp.concatenate([x.reshape(-1) for x in parts_w])
    return r, w, (c_pt, c_ln, c_pl, is_st)


@functools.partial(
    jax.jit,
    static_argnames=("translation_only", "n_rounds", "n_iters", "struct_on",
                     "prior_sigma_t", "prior_sigma_r"))
def pose_optimize(T_init: jnp.ndarray, obs: PoseObservations, K4, bf: float,
                  translation_only: bool = False, struct_on: bool = False,
                  n_rounds: int = 4, n_iters: int = 10,
                  angle_info: float = 0.5, dist_info: float = 50.0,
                  plane_chi2: float = 100.0, vp_chi2: float = 50.0,
                  damping: float = 1e-5,
                  prior_sigma_t: float = 0.0,
                  prior_sigma_r: float = 0.0) -> PoseOptResult:
    """Optimize T_cw against the observation set. See module docstring.

    prior_sigma_t/_r > 0 adds a weak SE3 prior around T_init with the given
    translation (m) / rotation (rad) standard deviations."""
    K4 = jnp.asarray(K4, dtype=jnp.float32)
    dim = 3 if translation_only else 6
    use_prior = prior_sigma_t > 0 and prior_sigma_r > 0
    prior_T = T_init if use_prior else None
    prior_w = (jnp.asarray([1.0 / prior_sigma_t ** 2] * 3
                           + [1.0 / prior_sigma_r ** 2] * 3)
               if use_prior else None)

    def lift(xi):
        if translation_only:
            xi = jnp.concatenate([xi, jnp.zeros(3, dtype=xi.dtype)])
        return se3.se3_exp(xi)

    def gn_iter(T, masks, huber_on):
        def f(xi):
            r, w, _ = _all_residuals(lift(xi) @ T, obs, K4, bf, masks,
                                     huber_on, angle_info, dist_info,
                                     plane_chi2, vp_chi2, struct_on,
                                     prior_T, prior_w)
            return r, w

        (r0, w0), = [f(jnp.zeros(dim))]
        J = jax.jacfwd(lambda xi: f(xi)[0])(jnp.zeros(dim))  # (M, dim)
        Jw = J * w0[:, None]
        H = J.T @ Jw
        b = Jw.T @ r0
        H = H + damping * jnp.eye(dim, dtype=H.dtype) \
            + 1e-8 * jnp.trace(H) * jnp.eye(dim, dtype=H.dtype)
        delta = jnp.linalg.solve(H, -b)
        # reject non-finite updates (empty problems)
        delta = jnp.where(jnp.all(jnp.isfinite(delta)), delta, 0.0)
        return lift(delta) @ T

    def round_masks(T):
        _, _, (c_pt, c_ln, c_pl, is_st) = _all_residuals(
            T, obs, K4, bf,
            (jnp.ones_like(obs.pt_valid), jnp.ones_like(obs.ln_valid),
             jnp.ones_like(obs.pl_valid)),
            jnp.asarray(0.0), angle_info, dist_info, plane_chi2, vp_chi2,
            struct_on, prior_T, prior_w)
        th_pt = jnp.where(is_st, CHI2_STEREO, CHI2_MONO)
        pt_m = c_pt < th_pt
        ln_m = c_ln < CHI2_LINE * 2.0
        pl_m = c_pl < plane_chi2
        return pt_m, ln_m, pl_m

    masks0 = (jnp.ones_like(obs.pt_valid), jnp.ones_like(obs.ln_valid),
              jnp.ones_like(obs.pl_valid))
    # g2o drops the robust kernel at round 3 (Optimizer.cc:1044-1330)
    huber_sched = jnp.asarray([1.0 if r < 2 else 0.0 for r in range(n_rounds)])

    def round_body(carry, huber_on):
        T, masks = carry
        T = jax.lax.fori_loop(
            0, n_iters, lambda _, t: gn_iter(t, masks, huber_on), T)
        return (T, round_masks(T)), None

    (T, masks), _ = jax.lax.scan(round_body, (T_init, masks0), huber_sched)

    r, w, (c_pt, c_ln, c_pl, is_st) = _all_residuals(
        T, obs, K4, bf, masks, jnp.asarray(0.0), angle_info, dist_info,
        plane_chi2, vp_chi2, struct_on, prior_T, prior_w)
    pt_in = masks[0] & obs.pt_valid
    ln_in = masks[1] & obs.ln_valid
    pl_in = masks[2] & obs.pl_valid
    return PoseOptResult(
        T_cw=T, pt_inlier=pt_in, ln_inlier=ln_in, pl_inlier=pl_in,
        n_inliers=jnp.sum(pt_in), chi2=jnp.sum(r * r * w))
