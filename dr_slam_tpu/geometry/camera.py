"""Camera distortion model: Brown-Conrady (k1, k2, p1, p2, k3).

Capability of Frame::UndistortKeyPoints (reference src/Frame.cc:835, which
calls cv::undistortPoints with P = K): map pixel coordinates measured on the
distorted image to the ideal pinhole image, so projection/backprojection and
the pose solve see geometrically-correct observations. TUM fr1/fr2-style
cameras carry non-trivial distortion (Examples/RGB-D/TUM1.yaml Camera.k*).

The inverse of the distortion polynomial has no closed form; like OpenCV we
iterate the fixed point  x_u <- (x_d - tangential(x_u)) / radial(x_u)  from
x_u = x_d.  Ten iterations reach < 1e-3 px for typical coefficient ranges.
Everything is branch-free and batched: one (N, 2) -> (N, 2) device op."""

from __future__ import annotations

import jax.numpy as jnp


def distort_points(uv: jnp.ndarray, K4, dist) -> jnp.ndarray:
    """Forward model: ideal pinhole pixels -> distorted pixels.

    uv (..., 2); K4 = (fx, fy, cx, cy); dist = (k1, k2, p1, p2, k3)."""
    fx, fy, cx, cy = K4
    k1, k2, p1, p2, k3 = dist
    x = (uv[..., 0] - cx) / fx
    y = (uv[..., 1] - cy) / fy
    r2 = x * x + y * y
    radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
    xd = x * radial + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
    yd = y * radial + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
    return jnp.stack([xd * fx + cx, yd * fy + cy], -1)


def undistort_points(uv: jnp.ndarray, K4, dist,
                     n_iters: int = 10) -> jnp.ndarray:
    """Inverse model: distorted pixels -> ideal pinhole pixels (iterative).

    Matches cv::undistortPoints(K, dist, P=K) semantics used by the
    reference (Frame.cc:835-860)."""
    fx, fy, cx, cy = K4
    k1, k2, p1, p2, k3 = dist
    xd = (uv[..., 0] - cx) / fx
    yd = (uv[..., 1] - cy) / fy
    x, y = xd, yd
    for _ in range(n_iters):
        r2 = x * x + y * y
        radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
        dx = 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
        dy = p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
        inv = 1.0 / jnp.maximum(radial, 1e-6)
        x = (xd - dx) * inv
        y = (yd - dy) * inv
    return jnp.stack([x * fx + cx, y * fy + cy], -1)
