"""Depth-map surface-normal estimation (stencil ops, VPU-friendly).

Capability of the reference's PCL IntegralImageNormalEstimation with
AVERAGE_3D_GRADIENT + smoothing 10 on a /3-subsampled cloud, then /2
decimation (src/Frame.cc:1027-1090): normals = normalize(cross(smoothed
d(cloud)/dx, smoothed d(cloud)/dy)), oriented toward the camera. Here the
smoothing is a separable box filter and everything stays dense."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from dr_slam_tpu.ops import image as image_ops


def depth_to_cloud(depth: jnp.ndarray, K4) -> jnp.ndarray:
    """(H, W) depth -> (H, W, 3) camera-frame point cloud."""
    h, w = depth.shape
    fx, fy, cx, cy = K4
    xx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    yy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    x = (xx - cx) / fx * depth
    y = (yy - cy) / fy * depth
    return jnp.stack([x, y, depth], -1)


@functools.partial(jax.jit, static_argnames=("smooth_radius", "step"))
def surface_normals(depth: jnp.ndarray, K4, smooth_radius: int = 4,
                    step: int = 6):
    """-> (normals (H//step, W//step, 3), valid (H//step, W//step)).

    Average-3D-gradient normals on the full-res cloud, decimated by `step`
    (the reference's /3 then /2 = /6 net decimation, Frame.cc:1080-1090)."""
    valid = depth > 1e-3
    d = jnp.where(valid, depth, 0.0)
    cloud = depth_to_cloud(d, K4)

    # Smooth each channel; normalize by smoothed validity to ignore holes.
    vf = valid.astype(jnp.float32)
    wsum = image_ops.box_filter(vf, smooth_radius)
    sm = jnp.stack(
        [image_ops.box_filter(cloud[..., c] * vf, smooth_radius) for c in range(3)],
        -1) / jnp.maximum(wsum[..., None], 1e-6)

    ddx = 0.5 * (jnp.roll(sm, -1, axis=1) - jnp.roll(sm, 1, axis=1))
    ddy = 0.5 * (jnp.roll(sm, -1, axis=0) - jnp.roll(sm, 1, axis=0))
    n = jnp.cross(ddx, ddy)
    norm = jnp.linalg.norm(n, axis=-1, keepdims=True)
    n = n / jnp.maximum(norm, 1e-12)
    # orient toward camera: n . p < 0
    flip = jnp.where(jnp.sum(n * cloud, -1) > 0, -1.0, 1.0)
    n = n * flip[..., None]

    # wsum is the *fraction* of valid pixels in the box (normalized kernel)
    ok = valid & (norm[..., 0] > 1e-9) & (wsum > 0.5)
    # border + decimation
    n = n[step // 2::step, step // 2::step]
    ok = ok[step // 2::step, step // 2::step]
    return n, ok
