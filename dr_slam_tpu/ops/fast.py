"""FAST-9/16 corner detection as dense vectorized tensor ops.

Reference behavior: src/ORBextractor.cc runs OpenCV FAST per 30px cell with
threshold fallback 20->7. Here the whole level is scored at once on the VPU:

- For every pixel, the 16 Bresenham-circle neighbors (radius 3) are gathered
  with jnp.roll (no data-dependent indexing).
- The *corner score* is computed in closed form: the max over the 16 circular
  arcs of 9 contiguous pixels of the min signed difference. A pixel is a
  FAST-9 corner at threshold t iff score > t, so one score map serves every
  threshold (the reference's 20 -> 7 fallback becomes a mask comparison).
- 3x3 non-max suppression via reduce_window.

This replaces the sequential OpenCV FAST + per-cell retry loop
(ORBextractor.cc ComputeKeyPointsOctTree) with two dense passes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# Bresenham circle of radius 3, 16 points in circular order, as (dy, dx).
CIRCLE_OFFSETS = np.array([
    (-3, 0), (-3, 1), (-2, 2), (-1, 3), (0, 3), (1, 3), (2, 2), (3, 1),
    (3, 0), (3, -1), (2, -2), (1, -3), (0, -3), (-1, -3), (-2, -2), (-3, -1),
], dtype=np.int32)


def _circle_stack(img: jnp.ndarray) -> jnp.ndarray:
    """(16, H, W) of the circle neighbors for every pixel (wrap at borders;
    borders are masked out by the caller)."""
    shifted = [jnp.roll(img, (-dy, -dx), axis=(0, 1)) for dy, dx in CIRCLE_OFFSETS]
    return jnp.stack(shifted, 0)


def _arc_min9(d: jnp.ndarray) -> jnp.ndarray:
    """min over each window of 9 circularly-consecutive entries along axis 0
    (length 16). Log-doubling: 4 elementwise mins instead of 16x9."""
    m2 = jnp.minimum(d, jnp.roll(d, -1, axis=0))          # windows of 2
    m4 = jnp.minimum(m2, jnp.roll(m2, -2, axis=0))        # 4
    m8 = jnp.minimum(m4, jnp.roll(m4, -4, axis=0))        # 8
    return jnp.minimum(m8, jnp.roll(d, -8, axis=0))       # 9


def fast_score(img: jnp.ndarray, border: int = 3) -> jnp.ndarray:
    """Per-pixel FAST-9 corner score (H, W) float32.

    score(p) = max(max_arc min(I_circle - I_p), max_arc min(I_p - I_circle));
    p is a FAST-9 corner at threshold t iff score(p) > t."""
    img = img.astype(jnp.float32)
    circle = _circle_stack(img)
    d = circle - img[None]
    bright = jnp.max(_arc_min9(d), axis=0)
    dark = jnp.max(_arc_min9(-d), axis=0)
    score = jnp.maximum(bright, dark)
    h, w = img.shape
    yy = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    valid = ((yy >= border) & (yy < h - border) & (xx >= border) & (xx < w - border))
    return jnp.where(valid, score, -jnp.inf)


def nms3x3(score: jnp.ndarray) -> jnp.ndarray:
    """Keep only local 3x3 maxima; others set to -inf."""
    pooled = jax.lax.reduce_window(
        score, -jnp.inf, jax.lax.max, (3, 3), (1, 1), "SAME")
    return jnp.where(score >= pooled, score, -jnp.inf)
