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
import numpy as np

from dr_slam_tpu.geometry import se3
from dr_slam_tpu.optimize.pose_graph import _cg
from dr_slam_tpu.optimize.residuals import _tangent_basis


class StructBlocks(NamedTuple):
    """Plane + line parameter blocks and their observation tables -- the BA
    equivalents of the reference's VertexPlane + EdgePlane/EdgeParallelPlane/
    EdgeVerticalPlane and the 2-endpoint line vertices + EdgeLineProjectXYZ
    (Optimizer.cc:2441-2562 local, :100-460 global)."""
    pl_coef: jnp.ndarray     # (NF, 4) initial world planes (n, d)
    pl_free: jnp.ndarray     # (NF,) bool
    pobs_kf: jnp.ndarray     # (Mp,) int32 problem-keyframe index
    pobs_pl: jnp.ndarray     # (Mp,) int32 plane index
    pobs_coef: jnp.ndarray   # (Mp, 4) observed camera-frame plane
    pobs_kind: jnp.ndarray   # (Mp,) int32: 0 direct, 1 parallel, 2 vertical
    pobs_valid: jnp.ndarray  # (Mp,) bool
    ln_ep: jnp.ndarray       # (NL, 6) initial world line endpoints
    ln_free: jnp.ndarray     # (NL,) bool
    lobs_kf: jnp.ndarray     # (Ml,) int32
    lobs_ln: jnp.ndarray     # (Ml,) int32
    lobs_line: jnp.ndarray   # (Ml, 3) observed 2D line equation (a,b,c)
    lobs_ep3: jnp.ndarray    # (Ml, 6) measured camera-frame endpoints
                             #   (0 where depth was unavailable) -- the RGB-D
                             #   anchor that kills the 2D edge's null space
                             #   (along-ray + along-line endpoint wander)
    lobs_valid: jnp.ndarray  # (Ml,) bool


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
    struct: StructBlocks | None = None   # plane/line blocks (optional)


def plane_retract(pl: jnp.ndarray, d: jnp.ndarray) -> jnp.ndarray:
    """3-DoF plane update: normal moves in its tangent plane, distance adds
    (the pole-free chart of residuals.plane_residuals; the reference's
    VertexPlane oplus on azimuth/elevation/d, g2oAddition/VertexPlane.h)."""
    n = pl[..., :3]
    t1, t2 = _tangent_basis(n)
    n_new = n + d[..., 0:1] * t1 + d[..., 1:2] * t2
    n_new = n_new / jnp.maximum(
        jnp.linalg.norm(n_new, axis=-1, keepdims=True), 1e-9)
    return jnp.concatenate([n_new, pl[..., 3:4] + d[..., 2:3]], -1)


_SAFE_PLANE4 = (0.0, 0.0, 1.0, 1.0)
_SAFE_LINE6 = (0.0, 0.0, 2.0, 0.5, 0.0, 2.0)


def _struct_from_tables(state, kf_ids, kf_alive) -> StructBlocks:
    """Flatten the per-keyframe structural observation tables into
    StructBlocks. kf_ids: (W,) map-state keyframe slots forming the problem's
    keyframe axis; kf_alive: (W,) bool."""
    W = kf_ids.shape[0]
    Fp = state.kf_pl.shape[1]
    Fl = state.kf_ln.shape[1]
    NF = state.pl_coef.shape[0]
    NL = state.ln_ep.shape[0]
    prob_kf = jnp.repeat(jnp.arange(W, dtype=jnp.int32), Fp)
    alive_p = jnp.repeat(kf_alive, Fp)

    def flat_pobs(tab, kind):
        ids = tab[kf_ids].reshape(-1)
        ok = (ids >= 0) & alive_p
        ids = jnp.clip(ids, 0)
        ok &= state.pl_valid[ids]
        return ids, ok, jnp.full_like(ids, kind)

    d_ids, d_ok, d_k = flat_pobs(state.kf_pl, 0)
    p_ids, p_ok, p_k = flat_pobs(state.kf_pl_par, 1)
    v_ids, v_ok, v_k = flat_pobs(state.kf_pl_ver, 2)
    coef = state.kf_pl_obs[kf_ids].reshape(-1, 4)
    pobs_kf = jnp.concatenate([prob_kf] * 3)
    pobs_pl = jnp.concatenate([d_ids, p_ids, v_ids])
    pobs_coef = jnp.concatenate([coef] * 3)
    pobs_kind = jnp.concatenate([d_k, p_k, v_k])
    pobs_valid = jnp.concatenate([d_ok, p_ok, v_ok])

    lids = state.kf_ln[kf_ids].reshape(-1)
    lok = (lids >= 0) & jnp.repeat(kf_alive, Fl)
    lids = jnp.clip(lids, 0)
    lok &= state.ln_valid[lids]
    # free exactly the landmarks observed by this problem's keyframes
    pl_free = (jnp.zeros(NF, bool)
               .at[jnp.where(d_ok, d_ids, 0)].max(d_ok) & state.pl_valid)
    ln_free = (jnp.zeros(NL, bool)
               .at[jnp.where(lok, lids, 0)].max(lok) & state.ln_valid)
    return StructBlocks(
        pl_coef=state.pl_coef, pl_free=pl_free,
        pobs_kf=pobs_kf, pobs_pl=pobs_pl, pobs_coef=pobs_coef,
        pobs_kind=pobs_kind, pobs_valid=pobs_valid,
        ln_ep=state.ln_ep, ln_free=ln_free,
        lobs_kf=jnp.repeat(jnp.arange(W, dtype=jnp.int32), Fl),
        lobs_ln=lids, lobs_line=state.kf_ln_obs[kf_ids].reshape(-1, 3),
        lobs_ep3=state.kf_ln_xyz[kf_ids].reshape(-1, 6),
        lobs_valid=lok)


def problem_from_state(state, max_obs: int | None = None,
                       with_struct: bool = True) -> BAProblem:
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
    struct = (_struct_from_tables(state, jnp.arange(NK, dtype=jnp.int32),
                                  state.kf_valid) if with_struct else None)
    return BAProblem(
        kf_pose=state.kf_pose, pt_pos=state.pt_pos,
        obs_kf=obs_kf, obs_pt=obs_pt, obs_uv=obs_uv, obs_z=obs_z,
        obs_inv_sigma2=inv_s2, obs_valid=valid,
        kf_free=state.kf_valid & fixed_first,
        pt_free=state.pt_valid, struct=struct)


@functools.partial(jax.jit, static_argnames=("window", "with_struct"))
def local_problem_from_state(state, center_kf, window: int = 8,
                             with_struct: bool = True) -> BAProblem:
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
    struct = (_struct_from_tables(state, win, win_ok) if with_struct
              else None)
    return BAProblem(
        kf_pose=state.kf_pose[win], pt_pos=state.pt_pos,
        obs_kf=obs_kf, obs_pt=obs_pt,
        obs_uv=state.kf_uv[win].reshape(-1, 2),
        obs_z=state.kf_xyz[win][..., 2].reshape(-1),
        obs_inv_sigma2=1.0 / jnp.maximum(state.kf_sigma2[win].reshape(-1),
                                         1e-6),
        obs_valid=valid, kf_free=kf_free, pt_free=pt_free,
        struct=struct), win


@functools.partial(
    jax.jit, static_argnames=("n_gn_iters", "n_cg_iters", "huber"))
def bundle_adjust(p: BAProblem, K4, n_gn_iters: int = 8, n_cg_iters: int = 40,
                  damping: float = 1e-3, huber: bool = True,
                  chi2_mono: float = 5.991, chi2_plane: float = 100.0,
                  chi2_vp: float = 50.0, chi2_line: float = 9.0,
                  angle_info: float = 0.5, dist_info: float = 50.0,
                  line_info: float = 0.25, line3d_info: float = 25.0):
    """-> (kf_pose, pt_pos) -- or (kf_pose, pt_pos, pl_coef, ln_ep) when the
    problem carries StructBlocks (planes/lines as first-class BA parameters,
    matching the reference's full edge set, Optimizer.cc:100-460)."""
    NK = p.kf_pose.shape[0]
    NP = p.pt_pos.shape[0]
    K4 = jnp.asarray(K4, dtype=jnp.float32)
    kf_freef = p.kf_free.astype(jnp.float32)[:, None]
    pt_freef = p.pt_free.astype(jnp.float32)[:, None]
    s = p.struct
    has_struct = s is not None

    has_z = p.obs_z > 1e-3
    sigma_z = 0.0025 * p.obs_z * p.obs_z + 0.002
    info_z = jnp.where(has_z, 1.0 / (sigma_z * sigma_z), 0.0)

    if has_struct:
        NF = s.pl_coef.shape[0]
        NL = s.ln_ep.shape[0]
        pl_freef = s.pl_free.astype(jnp.float32)[:, None]
        ln_freef = s.ln_free.astype(jnp.float32)[:, None]
        # sanitize DEGENERATE rows (empty slots: zero normal / coincident
        # endpoints): autodiff through normalization of a zero vector is
        # NaN, and NaN * 0-weight still poisons J^T W J. Keyed on row
        # content, NOT freeness -- fixed-but-observed landmarks must keep
        # their real values in the residuals.
        safe_pl = jnp.asarray(_SAFE_PLANE4, jnp.float32)
        safe_ln = jnp.asarray(_SAFE_LINE6, jnp.float32)
        pl_live = jnp.linalg.norm(s.pl_coef[:, :3], axis=-1) > 0.5
        ln_live = jnp.linalg.norm(s.ln_ep[:, 3:] - s.ln_ep[:, :3],
                                  axis=-1) > 1e-4
        pl0 = jnp.where(pl_live[:, None], s.pl_coef, safe_pl)
        ln0 = jnp.where(ln_live[:, None], s.ln_ep, safe_ln)
        pobs_coef = jnp.where(s.pobs_valid[:, None], s.pobs_coef, safe_pl)
        is_direct = (s.pobs_kind == 0)[:, None]
        is_par = (s.pobs_kind == 1)[:, None]
        is_ver = (s.pobs_kind == 2)[:, None]

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

    def plane_res(T_all, P_all):
        """(Mp, 3) residual per plane observation, all three edge kinds:
        direct = tangent components + distance (EdgePlane), parallel =
        tangent components only (EdgeParallelPlane), vertical = normal dot
        (EdgeVerticalPlane)."""
        T = T_all[s.pobs_kf]
        P = P_all[s.pobs_pl]                   # (Mp, 4) world
        T_wc = jax.vmap(se3.inv_T)(T)
        pred = jnp.einsum("mi,mij->mj", P, T_wc)      # camera-frame plane
        pred = pred / jnp.maximum(
            jnp.linalg.norm(pred[:, :3], axis=-1, keepdims=True), 1e-9)
        pred = pred * jnp.where(pred[:, 3:4] < 0, -1.0, 1.0)
        n_pred = pred[:, :3]
        n_obs = pobs_coef[:, :3]
        # undirected normal agreement: flip the observation to the
        # hemisphere of the prediction (par relations are orientation-free)
        flip = jnp.where(jnp.sum(n_obs * n_pred, -1, keepdims=True) < 0,
                         -1.0, 1.0)
        n_obs_d = n_obs * jnp.where(is_direct, 1.0, flip)
        t1, t2 = _tangent_basis(n_pred)
        r_t1 = jnp.sum(n_obs_d * t1, -1)
        r_t2 = jnp.sum(n_obs_d * t2, -1)
        r_d = pobs_coef[:, 3] - pred[:, 3]
        r_dot = jnp.sum(n_obs * n_pred, -1)
        r = jnp.stack([
            jnp.where(is_ver[:, 0], r_dot, r_t1),
            jnp.where(is_ver[:, 0], 0.0, r_t2),
            jnp.where(is_direct[:, 0], r_d, 0.0)], -1)
        return r

    def line_res(T_all, L_all):
        """(Ml, 8) line residual: point-to-2D-line of both projected
        endpoints (EdgeLineProjectXYZ, include/EdgeLine.h:53) PLUS the
        perpendicular 3D distance of each predicted endpoint to the
        MEASURED depth-backed 3D line. The pure 2D edge leaves each
        endpoint a 2D null space (along the viewing ray and along the
        line); unanchored endpoints wander there under CG damping and then
        poison the per-frame pose optimizer that shares them (round-3
        regression: LOST cascades with lines in local BA). Metric depth is
        the same cure as the point edges' dz channel."""
        T = T_all[s.lobs_kf]
        L = L_all[s.lobs_ln]                   # (Ml, 6)
        Xs = jnp.einsum("mij,mj->mi", T[:, :3, :3], L[:, :3]) + T[:, :3, 3]
        Xe = jnp.einsum("mij,mj->mi", T[:, :3, :3], L[:, 3:]) + T[:, :3, 3]
        uvs = se3.project(K4, Xs)
        uve = se3.project(K4, Xe)
        eq = s.lobs_line
        rs = eq[:, 0] * uvs[:, 0] + eq[:, 1] * uvs[:, 1] + eq[:, 2]
        re = eq[:, 0] * uve[:, 0] + eq[:, 1] * uve[:, 1] + eq[:, 2]
        ok = s.lobs_valid & (Xs[:, 2] > 0.05) & (Xe[:, 2] > 0.05)
        # measured 3D line in this keyframe's camera frame
        m1 = s.lobs_ep3[:, :3]
        m2 = s.lobs_ep3[:, 3:]
        has3 = ok & (m1[:, 2] > 0.05) & (m2[:, 2] > 0.05)
        d = m2 - m1
        d = d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-6)

        def perp(p):
            v = p - m1
            return v - jnp.sum(v * d, -1, keepdims=True) * d

        w3 = has3[:, None].astype(jnp.float32)
        return jnp.concatenate(
            [jnp.stack([rs, re], -1), perp(Xs) * w3, perp(Xe) * w3], -1), ok, has3

    def obs_info(ok):
        return jnp.stack([p.obs_inv_sigma2 * ok, p.obs_inv_sigma2 * ok,
                          info_z * ok], -1)

    def _huberize(info, r, chi2_th):
        chi2 = jnp.sum(r * r * info, -1)
        if not huber:
            return info
        hw = jnp.where(chi2 <= chi2_th, 1.0,
                       jnp.sqrt(chi2_th / jnp.maximum(chi2, 1e-9)))
        # redescending cut: the reference's two-round BA HARD-DROPS edges
        # whose chi2 exceeds the threshold between rounds (Optimizer.cc
        # outlier flagging); soft Huber alone lets gross outliers -- e.g.
        # cross-seam observations after a large loop correction -- keep a
        # sqrt-scaled pull on every pose they touch. Weights are recomputed
        # every GN iteration, so an edge recovers if its residual shrinks.
        hw = jnp.where(chi2 > 16.0 * chi2_th, 0.0, hw)
        return info * hw[:, None]

    def weights(T_all, X_all, P_all, L_all):
        r, ok = reproj(T_all, X_all)
        w = _huberize(obs_info(ok), r, chi2_mono)
        if not has_struct:
            return w, None, None
        rp = plane_res(T_all, P_all)
        pinfo = jnp.where(is_direct,
                          jnp.asarray([angle_info, angle_info, dist_info]),
                          jnp.asarray([angle_info, angle_info, 0.0]))
        pinfo = pinfo * s.pobs_valid[:, None]
        wp = _huberize(pinfo, rp, jnp.where(is_direct[:, 0],
                                            chi2_plane, chi2_vp))
        rl, lok, lhas3 = line_res(T_all, L_all)
        linfo = jnp.concatenate(
            [line_info * lok[:, None] * jnp.ones((rl.shape[0], 2)),
             line3d_info * lhas3[:, None] * jnp.ones((rl.shape[0], 6))], -1)
        wl = _huberize(linfo, rl, chi2_line)
        return w, wp, wl

    def gn_step(carry, _):
        T_cur, X_cur, P_cur, L_cur = carry
        w, wp, wl = weights(T_cur, X_cur, P_cur, L_cur)
        sw = jnp.sqrt(w)
        swp = None if wp is None else jnp.sqrt(wp)
        swl = None if wl is None else jnp.sqrt(wl)

        def res_at(params):
            xi, dX, dP, dL = params
            T = se3.se3_exp(xi * kf_freef) @ T_cur
            X = X_cur + dX * pt_freef
            r, _ = reproj(T, X)
            parts = [(r * sw).reshape(-1)]
            if has_struct:
                Pn = plane_retract(P_cur, dP * pl_freef)
                Ln = L_cur + dL * ln_freef
                parts.append((plane_res(T, Pn) * swp).reshape(-1))
                rl, _, _ = line_res(T, Ln)
                parts.append((rl * swl).reshape(-1))
            return jnp.concatenate(parts)

        zero = (jnp.zeros((NK, 6)), jnp.zeros((NP, 3)),
                jnp.zeros((NF, 3)) if has_struct else jnp.zeros((0, 3)),
                jnp.zeros((NL, 6)) if has_struct else jnp.zeros((0, 6)))
        sizes = [int(np.prod(z.shape)) for z in zero]
        splits = list(np.cumsum(sizes)[:-1])
        r0, jvp_lin = jax.linearize(res_at, zero)
        _, vjp = jax.vjp(res_at, zero)

        def unflat(v):
            vs = jnp.split(v, splits)
            return tuple(x.reshape(z.shape) for x, z in zip(vs, zero))

        def flat(t):
            return jnp.concatenate([x.reshape(-1) for x in t])

        def hvp(v):
            return flat(vjp(jvp_lin(unflat(v)))[0])

        b = -flat(vjp(r0)[0])
        dx = _cg(hvp, b, n_cg_iters, damping)
        dx = jnp.where(jnp.all(jnp.isfinite(dx)), dx, 0.0)
        dxi, dX, dP, dL = unflat(dx)
        T_new = se3.se3_exp(dxi * kf_freef) @ T_cur
        X_new = X_cur + dX * pt_freef
        if has_struct:
            P_new = plane_retract(P_cur, dP * pl_freef)
            L_new = L_cur + dL * ln_freef
        else:
            P_new, L_new = P_cur, L_cur
        return (T_new, X_new, P_new, L_new), None

    P_init = pl0 if has_struct else jnp.zeros((0, 4))
    L_init = ln0 if has_struct else jnp.zeros((0, 6))
    (T_out, X_out, P_out, L_out), _ = jax.lax.scan(
        gn_step, (p.kf_pose, p.pt_pos, P_init, L_init), None,
        length=n_gn_iters)
    if has_struct:
        # restore non-free and degenerate rows (sanitized above)
        keep = s.pl_free & pl_live
        P_out = jnp.where(keep[:, None], P_out, s.pl_coef)
        keepl = s.ln_free & ln_live
        L_out = jnp.where(keepl[:, None], L_out, s.ln_ep)
        return T_out, X_out, P_out, L_out
    return T_out, X_out
