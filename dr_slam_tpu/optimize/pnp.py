"""Vectorized PnP RANSAC for relocalization.

Capability of the reference PnPsolver (include/PnPsolver.h, src/PnPsolver.cc:
EPnP with 4 control points inside a sequential RANSAC `iterate` loop, used by
Tracking::Relocalization with (0.99, 10, 300, 4, 0.5, 5.991),
Tracking.cc:3580). TPU-native shape: ALL hypotheses at once --

- H deterministic 6-point minimal(ish) samples drawn by per-hypothesis
  top-k over seeded random keys (masked by validity),
- batched DLT: the 2n x 12 system's normal matrix is 12x12 symmetric; its
  smallest eigenvector (batched eigh) gives the projection matrix,
- calibration split: M = K^-1 P, scale from det, rotation by polar
  projection (geometry/se3.orthonormalize_rotation),
- all hypotheses scored against all points with one einsum; argmax wins.

Refinement is left to pose_optimize (as the reference refines with
PoseOptimization after PnP, Tracking.cc:3600+)."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from dr_slam_tpu.geometry import se3


@functools.lru_cache(maxsize=4)
def _sample_keys(n_hyp: int, n_pts: int, seed: int = 5) -> np.ndarray:
    return np.random.RandomState(seed).rand(n_hyp, n_pts).astype(np.float32)


@functools.partial(jax.jit, static_argnames=("n_hyp", "px_threshold"))
def pnp_ransac(pts_w: jnp.ndarray, uv: jnp.ndarray, valid: jnp.ndarray,
               K4, n_hyp: int = 64, px_threshold: float = 4.0):
    """-> (T_cw (4,4), n_inliers ()). pts_w (N,3), uv (N,2), valid (N,)."""
    N = pts_w.shape[0]
    fx, fy, cx, cy = K4
    # normalized image coordinates
    xn = (uv[:, 0] - cx) / fx
    yn = (uv[:, 1] - cy) / fy

    keys = jnp.asarray(_sample_keys(n_hyp, N)) + jnp.where(valid, 0.0, -10.0)
    _, picks = jax.lax.top_k(keys, 6)                    # (H, 6)
    hyp_ok = jnp.all(valid[picks], -1)

    X = pts_w[picks]                                     # (H, 6, 3)
    x = xn[picks]
    y = yn[picks]
    ones = jnp.ones_like(x)
    zeros = jnp.zeros_like(x)
    Xh = jnp.concatenate([X, ones[..., None]], -1)       # (H, 6, 4)
    # rows: [X 0 -x*X ; 0 X -y*X] for P = [p1; p2; p3]
    row1 = jnp.concatenate([Xh, jnp.zeros_like(Xh), -x[..., None] * Xh], -1)
    row2 = jnp.concatenate([jnp.zeros_like(Xh), Xh, -y[..., None] * Xh], -1)
    A = jnp.concatenate([row1, row2], 1)                 # (H, 12, 12)
    AtA = jnp.einsum("hni,hnj->hij", A, A)
    evals, evecs = jnp.linalg.eigh(AtA)
    p = evecs[..., 0]                                    # smallest eigvec (H,12)
    P = p.reshape(-1, 3, 4)
    M3 = P[:, :, :3]
    det = jnp.linalg.det(M3)
    P = P * jnp.where(det < 0, -1.0, 1.0)[:, None, None]
    det = jnp.abs(det)
    s = jnp.cbrt(jnp.maximum(det, 1e-12))
    Mn = P / s[:, None, None]
    R = se3.orthonormalize_rotation(Mn[:, :, :3])
    t = Mn[:, :, 3]

    # ---- planar branch: homography decomposition per hypothesis ----------
    # The 3D DLT above is rank-deficient when the sampled points are
    # coplanar (a single wall -- exactly where mono relocalization is often
    # needed); a plane-to-image homography is well-posed there. Both pose
    # families are scored and the vote picks (the reference's EPnP handles
    # the planar case with a reduced control-point basis).
    c_h = jnp.mean(X, 1)                                  # (H, 3)
    d_h = X - c_h[:, None]
    cov_h = jnp.einsum("hni,hnj->hij", d_h, d_h)
    _, vec_h = jnp.linalg.eigh(cov_h)
    n_h = vec_h[..., 0]                                   # plane normal
    ref = jnp.where(jnp.abs(n_h[:, :1]) < 0.9,
                    jnp.asarray([1.0, 0.0, 0.0])[None],
                    jnp.asarray([0.0, 1.0, 0.0])[None])
    e1 = jnp.cross(n_h, ref)
    e1 = e1 / jnp.maximum(jnp.linalg.norm(e1, axis=-1, keepdims=True), 1e-9)
    e2 = jnp.cross(n_h, e1)
    px_ = jnp.einsum("hnc,hc->hn", d_h, e1)               # plane coords
    py_ = jnp.einsum("hnc,hc->hn", d_h, e2)
    on1 = jnp.ones_like(px_)
    ph = jnp.stack([px_, py_, on1], -1)                   # (H, 6, 3)
    r1h = jnp.concatenate([ph, jnp.zeros_like(ph), -x[..., None] * ph], -1)
    r2h = jnp.concatenate([jnp.zeros_like(ph), ph, -y[..., None] * ph], -1)
    Ah = jnp.concatenate([r1h, r2h], 1)                   # (H, 12, 9)
    AtAh = jnp.einsum("hni,hnj->hij", Ah, Ah)
    _, evh = jnp.linalg.eigh(AtAh)
    h = evh[..., 0].reshape(-1, 3, 3)                     # H maps plane->norm img
    # cheirality: sample points must land in front (H is up to sign)
    zs = jnp.einsum("hc,hnc->hn", h[:, 2], ph)
    h = h * jnp.where(jnp.mean(zs, -1) < 0, -1.0, 1.0)[:, None, None]
    lam = 2.0 / jnp.maximum(jnp.linalg.norm(h[:, :, 0], axis=-1)
                            + jnp.linalg.norm(h[:, :, 1], axis=-1), 1e-9)
    r1c = h[:, :, 0] * lam[:, None]
    r2c = h[:, :, 1] * lam[:, None]
    r3c = jnp.cross(r1c, r2c)
    R_cp = se3.orthonormalize_rotation(jnp.stack([r1c, r2c, r3c], -1))
    t_cp = h[:, :, 2] * lam[:, None]
    # plane frame -> world: X_w = c + e1*px + e2*py  =>  B = [e1 e2 n]
    B = jnp.stack([e1, e2, n_h], -1)                      # (H, 3, 3)
    R_p = jnp.einsum("hij,hkj->hik", R_cp, B)             # R_cp @ B^T
    t_p = t_cp - jnp.einsum("hij,hj->hi", R_p, c_h)

    R = jnp.concatenate([R, R_p], 0)
    t = jnp.concatenate([t, t_p], 0)
    hyp_ok2 = jnp.concatenate([hyp_ok, hyp_ok], 0)

    # score all hypotheses x all points
    Xc = jnp.einsum("hij,nj->hni", R, pts_w) + t[:, None, :]
    z = Xc[..., 2]
    u_pred = fx * Xc[..., 0] / jnp.where(jnp.abs(z) < 1e-6, 1e-6, z) + cx
    v_pred = fy * Xc[..., 1] / jnp.where(jnp.abs(z) < 1e-6, 1e-6, z) + cy
    err2 = (u_pred - uv[None, :, 0]) ** 2 + (v_pred - uv[None, :, 1]) ** 2
    inl = (err2 < px_threshold ** 2) & (z > 0.05) & valid[None, :]
    votes = jnp.sum(inl, -1) * hyp_ok2
    best = jnp.argmax(votes)
    T = se3.make_T(R[best], t[best])
    T = jnp.where(jnp.all(jnp.isfinite(T)), T, jnp.eye(4))
    return T, votes[best]
