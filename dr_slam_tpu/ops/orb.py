"""Oriented-FAST + rotated-BRIEF keypoints, TPU-style.

Rebuilds the capability of the reference ORBextractor (src/ORBextractor.cc:
8-level pyramid, FAST in 30px cells with 20->7 fallback, quad-tree
distribution, intensity-centroid orientation, 256-bit rBRIEF) as dense
fixed-shape tensor programs:

- FAST scoring: ops/fast.py (one dense score map per level).
- Spatial uniformity: per-cell argmax over a static grid replaces the
  recursive DistributeOctTree (ORBextractor.cc:539) -- same intent (at most
  one strong corner per image region), but a fixed-shape reduction.
- Orientation: intensity centroid within the radius-15 disc
  (IC_Angle, ORBextractor.cc:77) computed for ALL pixels at once as two
  31x31 convolutions (x- and y-moment kernels) -- MXU-friendly.
- Descriptors: our own deterministic 256-pair BRIEF pattern (seeded Gaussian,
  NOT the OpenCV learned table) steered by the keypoint angle quantized to
  2*pi/30 steps, sampled from the sigma-2-blurred level image.

Outputs are fixed-capacity: exactly `max_keypoints` slots with a validity
mask, so downstream matching/optimization jits once.
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from dr_slam_tpu.ops import fast as fast_ops
from dr_slam_tpu.ops import image as image_ops

HALF_PATCH = 15
PATCH = 31
ANGLE_BINS = 30  # ORB quantizes steering angle to 2*pi/30


class Keypoints(NamedTuple):
    """Fixed-capacity keypoint set (level-0 pixel coordinates)."""
    uv: jnp.ndarray        # (K, 2) float32, level-0 coords
    response: jnp.ndarray  # (K,) float32
    angle: jnp.ndarray     # (K,) float32 radians
    octave: jnp.ndarray    # (K,) int32
    valid: jnp.ndarray     # (K,) bool
    desc: jnp.ndarray      # (K, 8) uint32 packed 256-bit
    sigma2: jnp.ndarray    # (K,) float32 scale^2*octave (for chi2 weighting)


def brief_pattern(seed: int = 42, n: int = 256, sigma_frac: float = 5.0
                  ) -> np.ndarray:
    """Deterministic 256-pair BRIEF sampling pattern, (n, 4) = (x1,y1,x2,y2).

    Gaussian BRIEF-II (pairs ~ N(0, (S/5)^2)), clipped to the radius-13 disc
    so every steered sample stays inside the 31x31 patch. This is our own
    pattern -- descriptors are self-consistent within this framework (we do
    not need bit-parity with OpenCV's learned table)."""
    rng = np.random.RandomState(seed)
    sigma = PATCH / sigma_frac
    pts = rng.randn(n, 4) * sigma
    # clip into disc of radius 13
    for pair in (slice(0, 2), slice(2, 4)):
        p = pts[:, pair]
        r = np.linalg.norm(p, axis=1, keepdims=True)
        scale = np.minimum(1.0, 13.0 / np.maximum(r, 1e-6))
        pts[:, pair] = p * scale
    return np.round(pts).astype(np.float32)


_PATTERN = brief_pattern()


def _moment_kernels() -> tuple[np.ndarray, np.ndarray]:
    """31x31 x-moment and y-moment kernels over the radius-15 disc."""
    ys, xs = np.mgrid[-HALF_PATCH:HALF_PATCH + 1, -HALF_PATCH:HALF_PATCH + 1]
    disc = (xs ** 2 + ys ** 2 <= HALF_PATCH ** 2).astype(np.float32)
    return (xs * disc).astype(np.float32), (ys * disc).astype(np.float32)


_KX_MOMENT, _KY_MOMENT = _moment_kernels()


def orientation_maps(img: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Dense (m10, m01) intensity-moment maps via two 31x31 convs.

    IC_Angle (ORBextractor.cc:77) evaluated at every pixel on the MXU.
    NOTE: kept for tests/reference, but the extractor now evaluates moments
    only at the selected keypoints (orientation_at_points) -- the 31x31
    dense convs made the front-end executable so heavy that RE-ACTIVATING
    it after any other program cost ~3 s on the tunneled TPU runtime."""
    x = img[None, None].astype(jnp.float32)
    kx = jnp.asarray(_KX_MOMENT)[None, None]
    ky = jnp.asarray(_KY_MOMENT)[None, None]
    m10 = jax.lax.conv_general_dilated(x, kx, (1, 1), "SAME")[0, 0]
    m01 = jax.lax.conv_general_dilated(x, ky, (1, 1), "SAME")[0, 0]
    return m10, m01


def orientation_at_points(img: jnp.ndarray, vi: jnp.ndarray, ui: jnp.ndarray
                          ) -> jnp.ndarray:
    """IC_Angle at integer keypoint locations only: gather the 31x31 patch
    per keypoint and dot with the moment kernels -- identical math to the
    dense conv at those pixels, ~1000x less work and a small executable."""
    h, w = img.shape
    offs = jnp.arange(-HALF_PATCH, HALF_PATCH + 1)
    ys = jnp.clip(vi[:, None, None] + offs[None, :, None], 0, h - 1)
    xs = jnp.clip(ui[:, None, None] + offs[None, None, :], 0, w - 1)
    patch = img[ys, xs]                                   # (k, 31, 31)
    m10 = jnp.einsum("kij,ij->k", patch, jnp.asarray(_KX_MOMENT))
    m01 = jnp.einsum("kij,ij->k", patch, jnp.asarray(_KY_MOMENT))
    return jnp.arctan2(m01, m10)


def level_feature_counts(n_features: int, n_levels: int, scale: float
                         ) -> list[int]:
    """Per-level budgets, geometric in 1/scale like the reference
    (ORBextractor ctor distributes nfeatures by factor 1/scaleFactor)."""
    inv = 1.0 / scale
    raw = [inv ** l for l in range(n_levels)]
    s = sum(raw)
    counts = [int(round(n_features * r / s)) for r in raw]
    # fix rounding drift
    counts[0] += n_features - sum(counts)
    return counts


def _cell_winners(score: jnp.ndarray, cell: int):
    """Per-cell argmax. Returns (scores (C,), flat_idx (C,)) over padded grid."""
    h, w = score.shape
    gh = -(-h // cell)
    gw = -(-w // cell)
    pad_h, pad_w = gh * cell - h, gw * cell - w
    s = jnp.pad(score, ((0, pad_h), (0, pad_w)), constant_values=-jnp.inf)
    s4 = s.reshape(gh, cell, gw, cell).transpose(0, 2, 1, 3).reshape(gh, gw, cell * cell)
    best = jnp.argmax(s4, axis=-1)
    best_score = jnp.max(s4, axis=-1)
    cy = best // cell
    cx = best % cell
    yy = jax.lax.broadcasted_iota(jnp.int32, (gh, gw), 0) * cell + cy
    xx = jax.lax.broadcasted_iota(jnp.int32, (gh, gw), 1) * cell + cx
    flat = yy * (w + pad_w) + xx  # index into padded image -- convert via w
    return best_score.reshape(-1), yy.reshape(-1), xx.reshape(-1)


def _extract_level(img_l: jnp.ndarray, blur_l: jnp.ndarray, n_take: int,
                   min_th: float, cell: int, border: int):
    """One pyramid level -> (uv (n,2), score (n,), angle (n,), valid (n,),
    desc_bits (n,256) bool) in level coordinates."""
    h, w = img_l.shape
    score = fast_ops.fast_score(img_l)
    # mask the descriptor border
    yy = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    inb = ((yy >= border) & (yy < h - border) & (xx >= border) & (xx < w - border))
    score0 = jnp.where(inb, score, -jnp.inf)   # pre-NMS (for subpixel fit)
    score = fast_ops.nms3x3(score0)

    cs, cy, cx = _cell_winners(score, cell)
    k = min(n_take, cs.shape[0])
    top_s, top_i = jax.lax.top_k(cs, k)
    ui0 = cx[top_i]
    vi0 = cy[top_i]
    valid = top_s > min_th

    # subpixel refinement: 1D quadratic fit on the raw score map around the
    # integer winner (the reference keeps integer FAST corners; the residual
    # half-pixel quantization is a viewpoint-dependent bias that accumulates
    # in closed-loop tracking -- docs/ROUND1_NOTES.md)
    s_c = score0[vi0, ui0]
    s_l = score0[vi0, ui0 - 1]
    s_r = score0[vi0, ui0 + 1]
    s_u = score0[vi0 - 1, ui0]
    s_d = score0[vi0 + 1, ui0]
    denx = s_l - 2.0 * s_c + s_r
    deny = s_u - 2.0 * s_c + s_d
    offx = jnp.where(jnp.isfinite(denx) & (jnp.abs(denx) > 1e-6),
                     0.5 * (s_l - s_r) / jnp.where(jnp.abs(denx) > 1e-6,
                                                   denx, 1.0), 0.0)
    offy = jnp.where(jnp.isfinite(deny) & (jnp.abs(deny) > 1e-6),
                     0.5 * (s_u - s_d) / jnp.where(jnp.abs(deny) > 1e-6,
                                                   deny, 1.0), 0.0)
    u = ui0.astype(jnp.float32) + jnp.clip(offx, -0.5, 0.5)
    v = vi0.astype(jnp.float32) + jnp.clip(offy, -0.5, 0.5)

    # orientation at winners (integer location; moments vary smoothly)
    angle = orientation_at_points(img_l, vi0, ui0)

    # steered BRIEF from the blurred level image
    a_bin = jnp.round(angle / (2 * jnp.pi / ANGLE_BINS))
    a_q = a_bin * (2 * jnp.pi / ANGLE_BINS)
    ca, sa = jnp.cos(a_q), jnp.sin(a_q)
    pat = jnp.asarray(_PATTERN)  # (256, 4)
    # rotate both endpoints: (K, 256)
    x1 = pat[None, :, 0] * ca[:, None] - pat[None, :, 1] * sa[:, None]
    y1 = pat[None, :, 0] * sa[:, None] + pat[None, :, 1] * ca[:, None]
    x2 = pat[None, :, 2] * ca[:, None] - pat[None, :, 3] * sa[:, None]
    y2 = pat[None, :, 2] * sa[:, None] + pat[None, :, 3] * ca[:, None]
    uv1 = jnp.stack([u[:, None] + x1, v[:, None] + y1], -1)
    uv2 = jnp.stack([u[:, None] + x2, v[:, None] + y2], -1)
    s1 = image_ops.nearest_sample(blur_l, uv1)
    s2 = image_ops.nearest_sample(blur_l, uv2)
    bits = s1 < s2  # (K, 256) bool
    return jnp.stack([u, v], -1), top_s, angle, valid, bits


def pack_bits(bits: jnp.ndarray) -> jnp.ndarray:
    """(..., 256) bool -> (..., 8) uint32."""
    b = bits.reshape(bits.shape[:-1] + (8, 32)).astype(jnp.uint32)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    return jnp.sum(b << shifts, axis=-1, dtype=jnp.uint32)


def unpack_bits(packed: jnp.ndarray) -> jnp.ndarray:
    """(..., 8) uint32 -> (..., 256) bool."""
    shifts = jnp.arange(32, dtype=jnp.uint32)
    b = (packed[..., None] >> shifts) & jnp.uint32(1)
    return b.reshape(packed.shape[:-1] + (256,)).astype(jnp.bool_)


def bits_to_signs(bits: jnp.ndarray, dtype=jnp.bfloat16) -> jnp.ndarray:
    """bool bits -> +/-1 representation for Hamming-as-matmul."""
    return (bits.astype(jnp.float32) * 2.0 - 1.0).astype(dtype)


@functools.partial(
    jax.jit,
    static_argnames=("n_features", "n_levels", "scale", "max_keypoints",
                     "cell", "ini_th", "min_th"))
def extract_orb(img: jnp.ndarray, n_features: int = 1000, n_levels: int = 8,
                scale: float = 1.2, max_keypoints: int = 1024,
                cell: int = 16, ini_th: float = 20.0, min_th: float = 7.0
                ) -> Keypoints:
    """Full ORB extraction on one gray image (H, W) float32 [0, 255].

    Functional equivalent of ORBextractor::operator() (ORBextractor.h:59):
    returns a fixed-capacity Keypoints with level-0 coordinates, responses,
    angles, octaves, validity and packed 256-bit descriptors."""
    del ini_th  # the score map subsumes the two-threshold scheme; min_th gates
    pyr = image_ops.build_pyramid(img, n_levels, scale)
    counts = level_feature_counts(n_features, n_levels, scale)
    border = HALF_PATCH + 1

    all_uv, all_s, all_a, all_v, all_b, all_o, all_sig = [], [], [], [], [], [], []
    for l in range(n_levels):
        img_l = pyr[l]
        blur_l = image_ops.gaussian_blur(img_l)
        # request extra candidates; global top-k trims to capacity
        uv, s, a, v, bits = _extract_level(
            img_l, blur_l, counts[l] + counts[l] // 2 + 8, min_th, cell, border)
        lvl_scale = scale ** l
        all_uv.append(uv * lvl_scale)
        all_s.append(jnp.where(v, s, -jnp.inf))
        all_a.append(a)
        all_v.append(v)
        all_b.append(bits)
        all_o.append(jnp.full(s.shape, l, dtype=jnp.int32))
        all_sig.append(jnp.full(s.shape, lvl_scale * lvl_scale, dtype=jnp.float32))

    uv = jnp.concatenate(all_uv)
    s = jnp.concatenate(all_s)
    a = jnp.concatenate(all_a)
    v = jnp.concatenate(all_v)
    bits = jnp.concatenate(all_b)
    o = jnp.concatenate(all_o)
    sig = jnp.concatenate(all_sig)

    k = min(max_keypoints, s.shape[0])
    top_s, idx = jax.lax.top_k(s, k)
    pad = max_keypoints - k
    take = lambda arr: jnp.pad(arr[idx], [(0, pad)] + [(0, 0)] * (arr.ndim - 1))
    kp = Keypoints(
        uv=take(uv),
        response=jnp.pad(jnp.where(jnp.isfinite(top_s), top_s, 0.0), (0, pad)),
        angle=take(a),
        octave=take(o),
        valid=jnp.pad(v[idx] & jnp.isfinite(top_s), (0, pad)),
        desc=pack_bits(take(bits)),
        sigma2=take(sig),
    )
    return kp
