"""Closed-form eigendecomposition of symmetric 3x3 matrices (batched).

Role of the reference's peac/eig33sym.hpp (used per-block by the AHC plane
fitter): smallest eigenvalue + eigenvector of thousands of tiny covariance
matrices. Trigonometric (Cardano) eigenvalues + cross-product eigenvectors --
no iteration, fully vectorized, differentiable almost everywhere."""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-12


def eigvals_sym3(A: jnp.ndarray) -> jnp.ndarray:
    """Eigenvalues of symmetric (..., 3, 3), ascending (..., 3)."""
    q = jnp.trace(A, axis1=-2, axis2=-1) / 3.0
    B = A - q[..., None, None] * jnp.eye(3, dtype=A.dtype)
    p2 = jnp.sum(B * B, axis=(-2, -1)) / 6.0
    p = jnp.sqrt(jnp.maximum(p2, _EPS))
    detB = jnp.linalg.det(B)
    r = detB / jnp.maximum(2.0 * p ** 3, _EPS)
    r = jnp.clip(r, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    e1 = q + 2.0 * p * jnp.cos(phi)                       # largest
    e3 = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)  # smallest
    e2 = 3.0 * q - e1 - e3
    return jnp.stack([e3, e2, e1], -1)


def smallest_eigvec_sym3(A: jnp.ndarray, eigval: jnp.ndarray) -> jnp.ndarray:
    """Unit eigenvector for the given (smallest) eigenvalue of (..., 3, 3).

    Rows of (A - lambda I) span the orthogonal complement; the eigenvector is
    the cross product of the two most independent rows."""
    M = A - eigval[..., None, None] * jnp.eye(3, dtype=A.dtype)
    r0, r1, r2 = M[..., 0, :], M[..., 1, :], M[..., 2, :]
    c01 = jnp.cross(r0, r1)
    c02 = jnp.cross(r0, r2)
    c12 = jnp.cross(r1, r2)
    n01 = jnp.sum(c01 * c01, -1)
    n02 = jnp.sum(c02 * c02, -1)
    n12 = jnp.sum(c12 * c12, -1)
    best = jnp.argmax(jnp.stack([n01, n02, n12], -1), -1)
    cands = jnp.stack([c01, c02, c12], -2)
    v = jnp.take_along_axis(cands, best[..., None, None].repeat(3, -1), -2)[..., 0, :]
    norm = jnp.linalg.norm(v, axis=-1, keepdims=True)
    # Degenerate (isotropic) case: fall back to +z.
    fallback = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0], dtype=A.dtype), v.shape)
    return jnp.where(norm > 1e-10, v / jnp.maximum(norm, _EPS), fallback)


def plane_from_cov(mean: jnp.ndarray, cov: jnp.ndarray):
    """(mean (...,3), cov (...,3,3)) -> (normal (...,3), d (...), mse (...)).

    Normal oriented toward the camera (n . mean < 0, flips otherwise), d such
    that n.p + d = 0 for points p on the plane; mse = smallest eigenvalue."""
    evals = eigvals_sym3(cov)
    lam0 = evals[..., 0]
    n = smallest_eigvec_sym3(cov, lam0)
    flip = jnp.where(jnp.sum(n * mean, -1) > 0, -1.0, 1.0)
    n = n * flip[..., None]
    d = -jnp.sum(n * mean, -1)
    return n, d, jnp.maximum(lam0, 0.0)
