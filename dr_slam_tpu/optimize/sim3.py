"""Batched Horn alignment + RANSAC (Sim3/SE3 solver).

Capability of the reference Sim3Solver (include/Sim3Solver.h,
src/Sim3Solver.cc): closed-form Horn similarity from 3-point samples inside
RANSAC, fixed scale for RGB-D (LoopClosing::ComputeSim3). TPU shape: all
H hypotheses solved and scored at once; Horn's rotation comes from the polar
factor of the 3x3 correlation (equivalent optimum, no quaternion
eigenproblem needed)."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from dr_slam_tpu.geometry import se3


def _rotation_from_correlation(S: jnp.ndarray) -> jnp.ndarray:
    """Horn's quaternion method: S = sum_n w_n a0[n] b0[n]^T (...,3,3) ->
    rotation maximizing sum w b0^T R a0. Robust to rank-deficient S (the
    minimal 3-point case gives rank 2, where polar Newton iteration blows
    up); the 4x4 symmetric eigenproblem is always well-posed."""
    Sxx, Sxy, Sxz = S[..., 0, 0], S[..., 0, 1], S[..., 0, 2]
    Syx, Syy, Syz = S[..., 1, 0], S[..., 1, 1], S[..., 1, 2]
    Szx, Szy, Szz = S[..., 2, 0], S[..., 2, 1], S[..., 2, 2]
    N = jnp.stack([
        jnp.stack([Sxx + Syy + Szz, Syz - Szy, Szx - Sxz, Sxy - Syx], -1),
        jnp.stack([Syz - Szy, Sxx - Syy - Szz, Sxy + Syx, Szx + Sxz], -1),
        jnp.stack([Szx - Sxz, Sxy + Syx, -Sxx + Syy - Szz, Syz + Szy], -1),
        jnp.stack([Sxy - Syx, Szx + Sxz, Syz + Szy, -Sxx - Syy + Szz], -1),
    ], -2)
    _, vecs = jnp.linalg.eigh(N)
    q_wxyz = vecs[..., -1]                      # largest eigenvalue
    q_xyzw = jnp.concatenate([q_wxyz[..., 1:], q_wxyz[..., :1]], -1)
    return se3.quat_to_rot(q_xyzw)


def horn_align(a: jnp.ndarray, b: jnp.ndarray, w: jnp.ndarray,
               with_scale: bool = False):
    """Weighted closed-form alignment b ~ s R a + t.

    a, b (..., N, 3); w (..., N) weights. Returns (R (...,3,3), t (...,3),
    s (...))."""
    wn = w / jnp.maximum(jnp.sum(w, -1, keepdims=True), 1e-9)
    ca = jnp.sum(a * wn[..., None], -2)
    cb = jnp.sum(b * wn[..., None], -2)
    a0 = a - ca[..., None, :]
    b0 = b - cb[..., None, :]
    S = jnp.einsum("...ni,...nj,...n->...ij", a0, b0, wn)  # sum a0 b0^T
    R = _rotation_from_correlation(S)
    if with_scale:
        num = jnp.einsum("...ni,...ij,...nj,...n->...", b0, R, a0, wn)
        den = jnp.sum(jnp.sum(a0 * a0, -1) * wn, -1)
        s = num / jnp.maximum(den, 1e-12)
    else:
        s = jnp.ones(R.shape[:-2], dtype=R.dtype)
    t = cb - s[..., None] * jnp.einsum("...ij,...j->...i", R, ca)
    return R, t, s


@functools.lru_cache(maxsize=4)
def _keys(n_hyp: int, n_pts: int, seed: int = 11) -> np.ndarray:
    return np.random.RandomState(seed).rand(n_hyp, n_pts).astype(np.float32)


@functools.partial(jax.jit, static_argnames=("n_hyp", "with_scale"))
def sim3_ransac(pts_a: jnp.ndarray, pts_b: jnp.ndarray, valid: jnp.ndarray,
                inlier_dist: float = 0.10, n_hyp: int = 64,
                with_scale: bool = False):
    """3D-3D RANSAC alignment: b ~ s R a + t over matched point pairs.

    -> (T (4,4) with sR in the rotation block, s (), n_inliers ())."""
    N = pts_a.shape[0]
    keys = jnp.asarray(_keys(n_hyp, N)) + jnp.where(valid, 0.0, -10.0)
    _, picks = jax.lax.top_k(keys, 3)
    hyp_ok = jnp.all(valid[picks], -1)

    A = pts_a[picks]
    B = pts_b[picks]
    w3 = jnp.ones(picks.shape, dtype=pts_a.dtype)
    R, t, s = horn_align(A, B, w3, with_scale)

    pred = s[:, None, None] * jnp.einsum("hij,nj->hni", R, pts_a) + t[:, None]
    err = jnp.linalg.norm(pred - pts_b[None], axis=-1)
    inl = (err < inlier_dist) & valid[None]
    votes = jnp.sum(inl, -1) * hyp_ok
    best = jnp.argmax(votes)

    # refine on the best hypothesis' inliers
    w = inl[best].astype(pts_a.dtype)
    Rb, tb, sb = horn_align(pts_a, pts_b, w, with_scale)
    pred = sb * (pts_a @ Rb.T) + tb
    inl2 = (jnp.linalg.norm(pred - pts_b, axis=-1) < inlier_dist) & valid
    T = se3.make_T(Rb * sb, tb)
    T = jnp.where(jnp.all(jnp.isfinite(T)), T, jnp.eye(4))
    return T, sb, jnp.sum(inl2)
