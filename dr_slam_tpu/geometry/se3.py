"""SE(3) / SO(3) / quaternion / plane utilities (jnp, fully batchable).

Equivalent role to the reference's src/Converter.cc (cv::Mat <-> Eigen/g2o
conversions, Converter.cc:37,168,182) plus the Lie-group machinery that g2o's
SE3Quat provides (Thirdparty/g2o types). Everything here is pure jnp so it
vmaps/jits and differentiates; poses are 4x4 row-major float matrices
T_cw = [R|t; 0 1] mapping world -> camera, matching the reference convention
(src/Tracking.cc Tcw).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-9


def hat(w):
    """so(3) hat operator: (...,3) -> (...,3,3)."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([z, -wz, wy], -1),
            jnp.stack([wz, z, -wx], -1),
            jnp.stack([-wy, wx, z], -1),
        ],
        -2,
    )


def vee(W):
    """Inverse of hat: (...,3,3) -> (...,3)."""
    return jnp.stack([W[..., 2, 1], W[..., 0, 2], W[..., 1, 0]], -1)


def so3_exp(w):
    """Rodrigues: (...,3) -> (...,3,3). Numerically safe at theta=0, with
    safe denominators in the untaken where-branches (autodiff evaluates
    both; 0/0 there poisons vjp with NaN)."""
    theta2 = jnp.sum(w * w, -1, keepdims=True)[..., None]
    small = theta2 < 1e-8
    theta2_safe = jnp.where(small, 1.0, theta2)
    theta = jnp.sqrt(theta2_safe)
    W = hat(w)
    I = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0,
                  (1.0 - jnp.cos(theta)) / theta2_safe)
    return I + a * W + b * (W @ W)


def so3_log(R):
    """(...,3,3) -> (...,3). atan2 form: smooth gradients near identity
    (the arccos form's derivative blows up as cos -> 1, which poisons
    autodiff Jacobians of pose-graph residuals at small errors)."""
    w = vee(R - jnp.swapaxes(R, -1, -2)) * 0.5   # axis * sin(theta)
    # norm with a floor: d|w|/dw at w=0 is NaN otherwise (poisons vjp)
    s = jnp.sqrt(jnp.sum(w * w, -1) + 1e-20)     # sin(theta), >= 1e-10
    c = (jnp.trace(R, axis1=-2, axis2=-1) - 1.0) / 2.0
    theta = jnp.arctan2(s, c)
    small = s < 1e-5
    safe_s = jnp.where(small, 1.0, s)
    scale = jnp.where(small, 1.0 + (1.0 - c) / 3.0, theta / safe_s)
    return w * scale[..., None]


def se3_exp(xi):
    """se(3) exp. xi = (...,6) as [rho(3), phi(3)] (translation, rotation).

    Returns (...,4,4). Same ordering as g2o SE3Quat::exp (upsilon, omega)."""
    rho, phi = xi[..., :3], xi[..., 3:]
    theta2 = jnp.sum(phi * phi, -1, keepdims=True)[..., None]
    small = theta2 < 1e-8
    theta2_safe = jnp.where(small, 1.0, theta2)
    theta = jnp.sqrt(theta2_safe)
    W = hat(phi)
    I = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), W.shape)
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0,
                  (1.0 - jnp.cos(theta)) / theta2_safe)
    c = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0, (1.0 - a) / theta2_safe)
    R = I + a * W + b * (W @ W)
    V = I + b * W + c * (W @ W)
    t = (V @ rho[..., None])[..., 0]
    return make_T(R, t)


def se3_log(T):
    """(...,4,4) -> (...,6) as [rho, phi].

    The small-angle branch feeds SAFE values into the untaken branch of each
    where (1/theta^2 at theta=0 is inf and poisons autodiff through where)."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    phi = so3_log(R)
    theta2 = jnp.sum(phi * phi, -1, keepdims=True)[..., None]
    small = theta2 < 1e-8
    theta2_safe = jnp.where(small, 1.0, theta2)
    theta = jnp.sqrt(theta2_safe)
    W = hat(phi)
    I = jnp.broadcast_to(jnp.eye(3, dtype=T.dtype), W.shape)
    half = theta / 2.0
    cot_big = (1.0 - half * jnp.cos(half)
               / jnp.maximum(jnp.sin(half), _EPS)) / theta2_safe
    cot = jnp.where(small, 1.0 / 12.0 + theta2 / 720.0, cot_big)
    Vinv = I - 0.5 * W + cot * (W @ W)
    rho = (Vinv @ t[..., None])[..., 0]
    return jnp.concatenate([rho, phi], -1)


def make_T(R, t):
    """(...,3,3),(...,3) -> (...,4,4)."""
    batch = jnp.broadcast_shapes(R.shape[:-2], t.shape[:-1])
    R = jnp.broadcast_to(R, batch + (3, 3))
    t = jnp.broadcast_to(t, batch + (3,))
    top = jnp.concatenate([R, t[..., None]], -1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=R.dtype), batch + (4,)
    )[..., None, :]
    return jnp.concatenate([top, bottom], -2)


def inv_T(T):
    """Fast SE(3) inverse."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    return make_T(Rt, -(Rt @ t[..., None])[..., 0])


def transform_points(T, pts):
    """Apply (...,4,4) to (...,N,3) -> (...,N,3)."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    return pts @ jnp.swapaxes(R, -1, -2) + t[..., None, :]


def quat_to_rot(q):
    """Quaternion (...,4) as (x,y,z,w) [TUM trajectory order] -> (...,3,3)."""
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)], -1),
            jnp.stack([2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)], -1),
            jnp.stack([2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)], -1),
        ],
        -2,
    )


def rot_to_quat(R):
    """(...,3,3) -> (...,4) as (x,y,z,w). Branchless Shepperd variant."""
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22
    # Four candidate constructions; pick the numerically best by largest pivot.
    qw0 = jnp.sqrt(jnp.maximum(1.0 + tr, _EPS)) / 2.0
    c0 = jnp.stack([(m21 - m12) / (4 * qw0), (m02 - m20) / (4 * qw0), (m10 - m01) / (4 * qw0), qw0], -1)
    qx1 = jnp.sqrt(jnp.maximum(1.0 + m00 - m11 - m22, _EPS)) / 2.0
    c1 = jnp.stack([qx1, (m01 + m10) / (4 * qx1), (m02 + m20) / (4 * qx1), (m21 - m12) / (4 * qx1)], -1)
    qy2 = jnp.sqrt(jnp.maximum(1.0 - m00 + m11 - m22, _EPS)) / 2.0
    c2 = jnp.stack([(m01 + m10) / (4 * qy2), qy2, (m12 + m21) / (4 * qy2), (m02 - m20) / (4 * qy2)], -1)
    qz3 = jnp.sqrt(jnp.maximum(1.0 - m00 - m11 + m22, _EPS)) / 2.0
    c3 = jnp.stack([(m02 + m20) / (4 * qz3), (m12 + m21) / (4 * qz3), qz3, (m10 - m01) / (4 * qz3)], -1)
    pivots = jnp.stack([tr, m00 - m11 - m22, m11 - m00 - m22, m22 - m00 - m11], -1)
    idx = jnp.argmax(pivots, -1)
    cands = jnp.stack([c0, c1, c2, c3], -2)
    q = jnp.take_along_axis(cands, idx[..., None, None].repeat(4, -1), -2)[..., 0, :]
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def orthonormalize_rotation(M, n_iters: int = 6):
    """Project a near-rotation onto SO(3) (reference: Map.cc:393-399,
    Tracking.cc:1513-1518 use cv::SVD for this). Here: Newton iteration for
    the polar decomposition, X <- (X + X^-T)/2, which converges quadratically
    to the same orthogonal factor and compiles to a handful of 3x3 ops
    (jnp.linalg.svd on tiny matrices compiles very slowly on TPU/CPU)."""
    det = jnp.linalg.det(M)
    # guard improper/degenerate input: flip the last column if det < 0
    M = M.at[..., :, 2].multiply(jnp.where(det < 0, -1.0, 1.0)[..., None])

    def body(_, X):
        return 0.5 * (X + _inv33_T(X))

    return jax.lax.fori_loop(0, n_iters, body, M)


def _inv33_T(A):
    """Transpose-inverse of (..., 3, 3) in closed form (adjugate)."""
    a = A[..., 0, :]
    b = A[..., 1, :]
    c = A[..., 2, :]
    r0 = jnp.cross(b, c)
    r1 = jnp.cross(c, a)
    r2 = jnp.cross(a, b)
    det = jnp.sum(a * r0, -1, keepdims=True)[..., None]
    adjT = jnp.stack([r0, r1, r2], -2)  # rows of inv^T
    return adjT / jnp.where(jnp.abs(det) < _EPS, _EPS, det)


def project(K, pts_c):
    """Pinhole projection. K=(3,3) or (fx,fy,cx,cy) 4-vec; pts_c (...,3) -> (...,2)."""
    if K.shape[-1] == 4:
        fx, fy, cx, cy = K[..., 0], K[..., 1], K[..., 2], K[..., 3]
    else:
        fx, fy, cx, cy = K[..., 0, 0], K[..., 1, 1], K[..., 0, 2], K[..., 1, 2]
    z = pts_c[..., 2]
    zs = jnp.where(jnp.abs(z) < _EPS, _EPS, z)
    u = fx * pts_c[..., 0] / zs + cx
    v = fy * pts_c[..., 1] / zs + cy
    return jnp.stack([u, v], -1)


def backproject(K4, uv, depth):
    """Inverse projection (reference: Frame::UnprojectStereo, Frame.cc:913).

    K4 = (fx,fy,cx,cy); uv (...,2); depth (...) -> (...,3) camera-frame."""
    fx, fy, cx, cy = K4[0], K4[1], K4[2], K4[3]
    x = (uv[..., 0] - cx) / fx * depth
    y = (uv[..., 1] - cy) / fy * depth
    return jnp.stack([x, y, depth], -1)


# ---------------------------------------------------------------------------
# Planes. A plane is a 4-vector (nx, ny, nz, d) with n unit and n.p + d = 0.
# ---------------------------------------------------------------------------


def normalize_plane(p):
    """Scale so the normal is unit and flip so d is... keep d sign; the
    reference normalizes so that plane(3) = d with unit normal
    (g2oAddition/Plane3D.h:16-60 normalizes and keeps d as distance)."""
    n = jnp.linalg.norm(p[..., :3], axis=-1, keepdims=True)
    p = p / jnp.maximum(n, _EPS)
    # Canonical orientation: d >= 0 (Plane3D normalizes sign so that the
    # distance entry is positive; matching it keeps ominus well-behaved).
    sign = jnp.where(p[..., 3:4] < 0, -1.0, 1.0)
    return p * sign


def plane_to_camera(T_cw, plane_w):
    """World plane -> camera frame. Reference Frame.cc:1311 uses
    coef_w = Tcw^T . coef_c, hence coef_c = Twc^T . coef_w."""
    T_wc = inv_T(T_cw)
    return normalize_plane(plane_w @ T_wc)  # (p^T T_wc)^T = T_wc^T p


def plane_to_world(T_cw, plane_c):
    """Camera plane -> world frame: coef_w = Tcw^T coef_c (Frame.cc:1311)."""
    return normalize_plane(plane_c @ T_cw)


def plane_azel(p):
    """Minimal (azimuth, elevation) parameterization of the unit normal
    (reference: g2oAddition/Plane3D.h azimuth/elevation)."""
    az = jnp.arctan2(p[..., 1], p[..., 0])
    el = jnp.arctan2(p[..., 2], jnp.linalg.norm(p[..., :2], axis=-1))
    return az, el


def plane_ominus(p_obs, p_pred):
    """3-DoF plane error (d_azimuth, d_elevation, d_distance), the reference's
    Plane3D::ominus (g2oAddition/Plane3D.h). Both inputs normalized 4-vecs."""
    az_o, el_o = plane_azel(p_obs)
    az_p, el_p = plane_azel(p_pred)
    daz = jnp.arctan2(jnp.sin(az_o - az_p), jnp.cos(az_o - az_p))
    return jnp.stack([daz, el_o - el_p, p_obs[..., 3] - p_pred[..., 3]], -1)
