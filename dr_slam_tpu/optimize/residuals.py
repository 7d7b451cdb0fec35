"""Residual library for point / line / plane / structural factors.

Re-derivation of the reference's g2o edge types as pure jnp functions of the
camera pose (Jacobians come from jax.jacfwd, replacing both g2o's analytic
Jacobians in include/EdgeLine.h:71-114 and the numeric ones of
g2oAddition/EdgePlane.h):

- point_residuals:   EdgeSE3ProjectXYZOnlyPose (mono, 2-DoF) and
                     EdgeStereoSE3ProjectXYZOnlyPose (u,v,uR 3-DoF)
                     (src/Optimizer.cc:644-720)
- line_residuals:    EdgeLineProjectXYZOnlyPose -- signed distance of each
                     projected 3D endpoint to the observed 2D line equation
                     (include/EdgeLine.h:155, two unary edges per line)
- plane_residuals:   EdgePlaneOnlyPose -- 3-DoF Plane3D::ominus
                     (azimuth/elevation/distance, g2oAddition/Plane3D.h)
- parallel_residuals: EdgeParallelPlaneOnlyPose -- 2-DoF tangent components
                     of n_obs x n_pred (zero iff parallel, undirected)
- vertical_residuals: EdgeVerticalPlaneOnlyPose -- n_obs . n_pred (zero iff
                     perpendicular; the reference rotates the normal 90 deg
                     and reuses the 2-DoF angular error, Plane3D.h:139-148 --
                     same objective, different parameterization)

All functions take the full observation capacity with validity masks and
return (residual_block, per_edge_chi2) with infinite-chi2 masked out."""

from __future__ import annotations

import jax.numpy as jnp

from dr_slam_tpu.geometry import se3


def point_residuals(T_cw, pt_world, pt_obs, inv_sigma2, valid, K4, bf):
    """-> (r (N,4), info (N,4), chi2 (N,), is_stereo (N,)).

    pt_obs = (u, v, uR); uR < 0 marks a monocular observation.

    Components: (du, dv, duR, dz). The first three are the reference's
    EdgeStereoSE3ProjectXYZOnlyPose (Optimizer.cc:644-720). The fourth is a
    DIRECT metric-depth residual: the reference encodes RGB-D depth only as
    virtual disparity uR = u - bf/z, whose z-sensitivity is bf/z^2 (~2 px/m
    at 4 m) -- almost blind along the optical axis, which lets forward drift
    run away in corridor scenes. The sensor's real depth precision is
    centimeter-level, so we add dz with a Kinect-style quadratic noise model
    sigma_z = 0.0025 z^2 + 2 mm. z_obs is recovered from (u, uR):
    z = bf / (u - uR)."""
    Xc = se3.transform_points(T_cw, pt_world)
    z = Xc[..., 2]
    uv = se3.project(jnp.asarray(K4), Xc)
    u_r = uv[..., 0] - bf / jnp.maximum(z, 1e-6)
    is_stereo = pt_obs[..., 2] > 0
    disparity = jnp.maximum(pt_obs[..., 0] - pt_obs[..., 2], 1e-3)
    z_obs = jnp.where(is_stereo, bf / disparity, 1.0)
    r = jnp.stack([
        pt_obs[..., 0] - uv[..., 0],
        pt_obs[..., 1] - uv[..., 1],
        jnp.where(is_stereo, pt_obs[..., 2] - u_r, 0.0),
        jnp.where(is_stereo, z_obs - z, 0.0),
    ], -1)
    in_front = z > 0.05
    ok = valid & in_front
    sigma_z = 0.0025 * z_obs * z_obs + 0.002
    info_z = jnp.where(is_stereo, 1.0 / (sigma_z * sigma_z), 0.0)
    info = jnp.stack(
        [inv_sigma2, inv_sigma2, inv_sigma2 * is_stereo, info_z], -1)
    info = jnp.where(ok[..., None], info, 0.0)
    chi2 = jnp.sum(r * r * info, -1)
    return r, info, chi2, is_stereo


def line_residuals(T_cw, ln_world, ln_obs, inv_sigma2, valid, K4):
    """ln_world (N, 6) endpoints; ln_obs (N, 3) 2D line (a,b,c), a^2+b^2=1.

    -> (r (N,2), info (N,2), chi2 (N,))."""
    Xs = se3.transform_points(T_cw, ln_world[..., :3])
    Xe = se3.transform_points(T_cw, ln_world[..., 3:])
    K4 = jnp.asarray(K4)
    uvs = se3.project(K4, Xs)
    uve = se3.project(K4, Xe)
    rs = (ln_obs[..., 0] * uvs[..., 0] + ln_obs[..., 1] * uvs[..., 1]
          + ln_obs[..., 2])
    re = (ln_obs[..., 0] * uve[..., 0] + ln_obs[..., 1] * uve[..., 1]
          + ln_obs[..., 2])
    ok = valid & (Xs[..., 2] > 0.05) & (Xe[..., 2] > 0.05)
    r = jnp.stack([rs, re], -1)
    info = jnp.where(ok[..., None], inv_sigma2[..., None], 0.0) * jnp.ones_like(r)
    chi2 = jnp.sum(r * r * info, -1)
    return r, info, chi2



_SAFE_PLANE = (0.0, 0.0, 1.0, 1.0)


def _sanitize_planes(pl_world, pl_obs, valid):
    """Replace masked rows with a well-conditioned plane so autodiff through
    normalization/tangent-basis code never sees zero vectors (their gradient
    is NaN, and NaN * 0-weight still poisons J^T W J)."""
    safe = jnp.asarray(_SAFE_PLANE, dtype=pl_world.dtype)
    w = valid[..., None]
    return jnp.where(w, pl_world, safe), jnp.where(w, pl_obs, safe)


def plane_residuals(T_cw, pl_world, pl_obs, valid, angle_info, dist_info):
    """pl_world (N,4) world planes, pl_obs (N,4) observed camera-frame planes.

    -> (r (N,3), info (N,3), chi2 (N,)).

    NOTE: the reference's Plane3D::ominus uses (azimuth, elevation, d); that
    chart is singular at the pole (normal = +/-z), which is exactly the
    fronto-parallel-plane case, and autodiff there yields NaN. We use the
    equivalent pole-free 3-DoF error (tangent-basis components of the
    observed normal + distance difference): same zero set, same magnitude to
    first order (components ~ angle), smooth everywhere."""
    pl_world, pl_obs = _sanitize_planes(pl_world, pl_obs, valid)
    pred = se3.plane_to_camera(T_cw, pl_world)
    n_pred = pred[..., :3]
    t1, t2 = _tangent_basis(n_pred)
    n_obs = pl_obs[..., :3]
    r = jnp.stack([jnp.sum(n_obs * t1, -1),
                   jnp.sum(n_obs * t2, -1),
                   pl_obs[..., 3] - pred[..., 3]], -1)
    info = jnp.where(valid[..., None],
                     jnp.asarray([angle_info, angle_info, dist_info],
                                 dtype=r.dtype), 0.0)
    chi2 = jnp.sum(r * r * info, -1)
    return r, info, chi2


def _tangent_basis(n):
    """Two unit vectors orthogonal to n (..., 3) -- branchless."""
    # pick the world axis least aligned with n
    a = jnp.where(jnp.abs(n[..., 0:1]) < 0.9,
                  jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0], n.dtype), n.shape),
                  jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0], n.dtype), n.shape))
    t1 = jnp.cross(n, a)
    t1 = t1 / jnp.maximum(jnp.linalg.norm(t1, axis=-1, keepdims=True), 1e-9)
    t2 = jnp.cross(n, t1)
    return t1, t2


def parallel_residuals(T_cw, pl_world, pl_obs, valid, angle_info):
    """2-DoF parallel-plane penalty: components of n_obs along the tangent
    basis of the predicted normal (zero iff normals parallel/antiparallel)."""
    pl_world, pl_obs = _sanitize_planes(pl_world, pl_obs, valid)
    pred = se3.plane_to_camera(T_cw, pl_world)
    n_pred = pred[..., :3]
    n_obs = pl_obs[..., :3]
    t1, t2 = _tangent_basis(n_pred)
    r = jnp.stack([jnp.sum(n_obs * t1, -1), jnp.sum(n_obs * t2, -1)], -1)
    info = jnp.where(valid[..., None], angle_info, 0.0) * jnp.ones_like(r)
    chi2 = jnp.sum(r * r * info, -1)
    return r, info, chi2


def vertical_residuals(T_cw, pl_world, pl_obs, valid, angle_info):
    """1-DoF perpendicular-plane penalty: n_obs . n_pred."""
    pl_world, pl_obs = _sanitize_planes(pl_world, pl_obs, valid)
    pred = se3.plane_to_camera(T_cw, pl_world)
    r = jnp.sum(pl_obs[..., :3] * pred[..., :3], -1, keepdims=True)
    info = jnp.where(valid[..., None], angle_info, 0.0) * jnp.ones_like(r)
    chi2 = jnp.sum(r * r * info, -1)
    return r, info, chi2
