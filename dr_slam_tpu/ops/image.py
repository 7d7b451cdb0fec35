"""Core image ops: separable convolution, Gaussian blur, bilinear resize,
image pyramid, gradients.

Equivalent role to the OpenCV calls in the reference front-end
(GaussianBlur + resize in src/ORBextractor.cc ComputePyramid/computeDescriptors)
but expressed as XLA convolutions so they fuse and run on the VPU/MXU."""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


def _gaussian_kernel1d(sigma: float, radius: int) -> np.ndarray:
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


def sep_conv2d(img: jnp.ndarray, kx: jnp.ndarray, ky: jnp.ndarray) -> jnp.ndarray:
    """Separable 2D convolution with replicate padding. img (H, W) float32."""
    rx = len(kx) // 2
    ry = len(ky) // 2
    x = jnp.pad(img, ((ry, ry), (rx, rx)), mode="edge")
    x = x[None, None]  # NCHW
    kxa = jnp.asarray(kx, dtype=img.dtype).reshape(1, 1, 1, -1)
    kya = jnp.asarray(ky, dtype=img.dtype).reshape(1, 1, -1, 1)
    x = jax.lax.conv_general_dilated(x, kxa, (1, 1), "VALID")
    x = jax.lax.conv_general_dilated(x, kya, (1, 1), "VALID")
    return x[0, 0]


def gaussian_blur(img: jnp.ndarray, sigma: float = 2.0, radius: int = 3) -> jnp.ndarray:
    """7x7 sigma-2 Gaussian, as applied before descriptor sampling in the
    reference (ORBextractor.cc computeDescriptors uses GaussianBlur(7,7,2,2))."""
    k = jnp.asarray(_gaussian_kernel1d(sigma, radius))
    return sep_conv2d(img, k, k)


def box_filter(img: jnp.ndarray, radius: int) -> jnp.ndarray:
    k = jnp.full((2 * radius + 1,), 1.0 / (2 * radius + 1), dtype=img.dtype)
    return sep_conv2d(img, k, k)


def bilinear_resize(img: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Bilinear resize of a (H, W) image (used for pyramid levels).

    jax.image.resize antialiases on downscale (triangle filter widened by
    the scale factor) -- a plain bilinear gather aliases the fine texture
    and measurably degrades coarse-level FAST corner stability."""
    return jax.image.resize(img, (out_h, out_w), method="bilinear")


def sobel_gradients(img: jnp.ndarray):
    """(gx, gy) via Sobel; replicate edges."""
    smooth = jnp.asarray([1.0, 2.0, 1.0]) / 4.0
    diff = jnp.asarray([-1.0, 0.0, 1.0]) / 2.0
    gx = sep_conv2d(img, diff, smooth)
    gy = sep_conv2d(img, smooth, diff)
    return gx, gy


def pyramid_shapes(h: int, w: int, n_levels: int, scale: float):
    """Static per-level (h, w) list."""
    shapes = []
    for l in range(n_levels):
        s = scale ** l
        shapes.append((max(int(round(h / s)), 16), max(int(round(w / s)), 16)))
    return shapes


@functools.partial(jax.jit, static_argnames=("n_levels", "scale"))
def build_pyramid(img: jnp.ndarray, n_levels: int = 8, scale: float = 1.2):
    """ORB image pyramid (reference ORBextractor::ComputePyramid semantics:
    8 levels, factor 1.2, each level resized from the previous).

    Returns a tuple of (h_l, w_l) arrays (static shapes per level)."""
    h, w = img.shape
    shapes = pyramid_shapes(h, w, n_levels, scale)
    levels = [img]
    for l in range(1, n_levels):
        levels.append(bilinear_resize(levels[-1], *shapes[l]))
    return tuple(levels)


def bilinear_sample(img: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """Sample (H, W) image at continuous uv=(x, y) positions (..., 2)."""
    h, w = img.shape
    x = jnp.clip(uv[..., 0], 0.0, w - 1.001)
    y = jnp.clip(uv[..., 1], 0.0, h - 1.001)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = x - x0
    fy = y - y0
    v00 = img[y0, x0]
    v01 = img[y0, x0 + 1]
    v10 = img[y0 + 1, x0]
    v11 = img[y0 + 1, x0 + 1]
    return ((1 - fy) * ((1 - fx) * v00 + fx * v01)
            + fy * ((1 - fx) * v10 + fx * v11))


def nearest_sample(img: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    h, w = img.shape
    x = jnp.clip(jnp.round(uv[..., 0]).astype(jnp.int32), 0, w - 1)
    y = jnp.clip(jnp.round(uv[..., 1]).astype(jnp.int32), 0, h - 1)
    return img[y, x]
