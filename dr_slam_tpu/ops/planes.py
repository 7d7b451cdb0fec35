"""Organized-point-cloud plane segmentation: tile-PCA + label propagation.

TPU-native equivalent of the reference's two native detectors -- PEAC/AHC
agglomerative clustering (include/peac/AHCPlaneFitter.hpp:211-326, the default
via Frame::ComputePlanes, src/Frame.cc:937) and CAPE cell region-growing
(src/CAPE/CAPE.cpp:47-459). Both share the shape: fit tiny planes to image
blocks, grow/merge compatible neighbors, refine per-segment params. Here:

1. Block moments: the depth image is tiled into BxB blocks; per-block
   centroid/covariance accumulate as dense reshape+reductions.
2. Block planes: closed-form 3x3 eigendecomposition (ops/eig33.py, the role
   of peac/eig33sym.hpp) gives normal/offset/MSE per block; planarity gate is
   depth-adaptive like PEAC's sigma(z) (AHCParamSet).
3. Segmentation: iterated min-label propagation over the block graph -- each
   round every planar block adopts the smallest label among compatible
   4-neighbors (normal angle + point-to-plane distance tests, the AHC merge
   predicate). A fixed iteration count replaces the sequential
   min-heap ahCluster loop; labels converge to per-segment minima.
4. Refinement: top-K segments by membership aggregate their block moments
   with one (K, nblocks) x (nblocks, 13) matmul (MXU) and re-fit.

Fixed capacities: at most `max_planes` planes, each with a bounded sample
cloud (the role of the reference's voxel-downsampled per-plane clouds,
src/Frame.cc:981-993)."""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from dr_slam_tpu.ops import eig33
from dr_slam_tpu.ops.normals import depth_to_cloud


class PlaneSegmentation(NamedTuple):
    coeffs: jnp.ndarray        # (P, 4) normalized (n, d), camera frame
    valid: jnp.ndarray         # (P,) bool
    n_blocks: jnp.ndarray      # (P,) int32 member-block counts
    cloud: jnp.ndarray         # (P, Q, 3) sample points (block centroids)
    cloud_valid: jnp.ndarray   # (P, Q) bool
    mse: jnp.ndarray           # (P,) refit mean-square point-plane distance
    block_label: jnp.ndarray   # (gh, gw) int32 segment id in [0, P) or -1


def _block_moments(cloud, valid, block):
    """(H,W,3),(H,W) -> per-block (count, mean, cov) with shapes
    (gh,gw),(gh,gw,3),(gh,gw,3,3).

    Covariance is accumulated around the block mean (two-pass): raw
    E[pp^T] - mu mu^T in f32 cancels catastrophically (coords ~ meters,
    planar residuals ~ 1e-4 m) and biases plane fits by centimeters."""
    h, w, _ = cloud.shape
    gh, gw = h // block, w // block
    c = cloud[:gh * block, :gw * block].reshape(gh, block, gw, block, 3)
    v = valid[:gh * block, :gw * block].reshape(gh, block, gw, block)
    c = c.transpose(0, 2, 1, 3, 4).reshape(gh, gw, block * block, 3)
    v = v.transpose(0, 2, 1, 3).reshape(gh, gw, block * block).astype(jnp.float32)
    cnt = jnp.sum(v, -1)
    safe = jnp.maximum(cnt, 1.0)
    mean = jnp.sum(c * v[..., None], -2) / safe[..., None]
    diff = (c - mean[..., None, :]) * v[..., None]
    cov = jnp.einsum("...ni,...nj->...ij", diff, diff) / safe[..., None, None]
    return cnt, mean, cov


def _compat(n, d, mean, ok, shift, angle_cos, dist_th):
    """Compatibility of each block with its neighbor at `shift` (dy, dx)."""
    roll = lambda x: jnp.roll(x, shift, axis=(0, 1))
    n2, d2, m2, ok2 = roll(n), roll(d), roll(mean), roll(ok)
    ang = jnp.sum(n * n2, -1) > angle_cos
    dist = jnp.abs(jnp.sum(n * m2, -1) + d) < dist_th
    # border wrap guard
    gh, gw = ok.shape
    yy = jax.lax.broadcasted_iota(jnp.int32, (gh, gw), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (gh, gw), 1)
    # neighbor source index is (y - dy, x - dx); reject wrap-around
    inb = ((yy - shift[0] >= 0) & (yy - shift[0] < gh)
           & (xx - shift[1] >= 0) & (xx - shift[1] < gw))
    return ang & dist & ok & ok2 & inb, roll


@functools.partial(
    jax.jit,
    static_argnames=("block", "max_planes", "cloud_points", "n_prop_iters"))
def segment_planes(depth: jnp.ndarray, K4, block: int = 8, max_planes: int = 8,
                   min_blocks: int = 10, merge_angle_cos: float = 0.985,
                   merge_dist: float = 0.05, mse_factor: float = 2.5e-3,
                   max_depth: float = 5.0, cloud_points: int = 256,
                   n_prop_iters: int = 96) -> PlaneSegmentation:
    """Segment up to `max_planes` planes from an organized depth map."""
    valid = (depth > 1e-3) & (depth < max_depth)
    cloud = depth_to_cloud(jnp.where(valid, depth, 0.0), K4)
    cnt, mean, cov = _block_moments(cloud, valid, block)
    gh, gw = cnt.shape
    nb = gh * gw

    n, d, mse = eig33.plane_from_cov(mean, cov)
    z = jnp.maximum(mean[..., 2], 0.3)
    sigma = mse_factor * z * z          # depth-adaptive noise model (PEAC-like)
    # Degeneracy gate: the normal is well-defined only when the block's
    # points genuinely spread in 2D (mid eigenvalue clearly positive).
    # Gating on |n_z| instead would kill legitimate edge-on planes (corridor
    # walls viewed along the wall have n_z ~ 0 up to rounding).
    lam1 = eig33.eigvals_sym3(cov)[..., 1]
    planar = ((cnt > 0.75 * block * block)
              & (mse < jnp.maximum(sigma * sigma, 1e-8))
              & (lam1 > 1e-7))

    # --- iterated min-label propagation (the ahCluster merge loop) ---------
    flat_idx = jnp.arange(nb, dtype=jnp.int32).reshape(gh, gw)
    init = jnp.where(planar, flat_idx, nb)  # nb = invalid sentinel

    shifts = ((1, 0), (-1, 0), (0, 1), (0, -1))
    compat_masks = []
    for s in shifts:
        m, roll = _compat(n, d, mean, planar, s, merge_angle_cos, merge_dist)
        compat_masks.append(m)

    def body(_, labels):
        out = labels
        for s, m in zip(shifts, compat_masks):
            nl = jnp.roll(labels, s, axis=(0, 1))
            out = jnp.where(m, jnp.minimum(out, nl), out)
        return out

    labels = jax.lax.fori_loop(0, n_prop_iters, body, init)

    # --- pick top-K segments by pixel support ------------------------------
    flat_labels = labels.reshape(-1)
    seg_px = jnp.zeros(nb + 1, dtype=jnp.float32).at[flat_labels].add(cnt.reshape(-1))
    seg_blocks = jnp.zeros(nb + 1, dtype=jnp.int32).at[flat_labels].add(
        planar.reshape(-1).astype(jnp.int32))
    seg_px = seg_px.at[nb].set(0.0)
    top_px, top_lab = jax.lax.top_k(seg_px, max_planes)
    member = (flat_labels[None, :] == top_lab[:, None]) & planar.reshape(-1)[None, :]
    memberf = member.astype(jnp.float32)  # (P, nb)

    # --- aggregate moments per segment (parallel-axis form) ----------------
    # cov_seg = [sum_b n_b cov_b + sum_b n_b (mu_b - mu_seg)(mu_b - mu_seg)^T]/N
    # NOT E[pp^T] - mu mu^T: raw second moments reach ~1e6 while the planar
    # covariance signal is ~1e-4, so the subtraction cancels catastrophically
    # in f32 and biases plane d by centimeters.
    cnt_f = cnt.reshape(-1)
    sum_p = (mean * cnt[..., None]).reshape(nb, 3)
    sum_cov = (cov * cnt[..., None, None]).reshape(nb, 9)
    feats = jnp.concatenate([cnt_f[:, None], sum_p, sum_cov], -1)
    agg = memberf @ feats  # (P, 13)
    a_cnt = jnp.maximum(agg[:, 0], 1.0)
    a_mean = agg[:, 1:4] / a_cnt[:, None]
    mu_b = mean.reshape(nb, 3)
    d_b = mu_b[None, :, :] - a_mean[:, None, :]               # (P, nb, 3)
    w_b = memberf * cnt_f[None, :]                            # (P, nb)
    spread = jnp.einsum("pn,pni,pnj->pij", w_b, d_b, d_b)
    a_cov = (agg[:, 4:13].reshape(-1, 3, 3) + spread) / a_cnt[:, None, None]
    pn, pd, pmse = eig33.plane_from_cov(a_mean, a_cov)
    coeffs = jnp.concatenate([pn, pd[:, None]], -1)

    nblocks = jnp.sum(member, -1).astype(jnp.int32)
    plane_valid = (nblocks >= min_blocks) & (top_px > 0)

    # --- per-plane sample cloud: up to Q member-block centroids ------------
    order_score = jnp.where(member, -jnp.arange(nb, dtype=jnp.float32)[None, :],
                            -jnp.inf)
    q = min(cloud_points, nb)
    top_scores, blk_idx = jax.lax.top_k(order_score, q)  # (P, Q)
    centroids = mean.reshape(nb, 3)
    pc = centroids[blk_idx]  # (P, Q, 3)
    pc_valid = jnp.isfinite(top_scores)
    if q < cloud_points:
        pad = cloud_points - q
        pc = jnp.pad(pc, ((0, 0), (0, pad), (0, 0)))
        pc_valid = jnp.pad(pc_valid, ((0, 0), (0, pad)))

    # --- compact block label map in [0, P) ---------------------------------
    seg_of_block = jnp.argmax(member, 0).astype(jnp.int32)
    has = jnp.any(member, 0)
    block_label = jnp.where(has, seg_of_block, -1).reshape(gh, gw)

    del seg_blocks
    return PlaneSegmentation(
        coeffs=coeffs, valid=plane_valid, n_blocks=nblocks,
        cloud=pc, cloud_valid=pc_valid & plane_valid[:, None],
        mse=pmse, block_label=block_label)


def max_point_distance_from_plane(coeffs: jnp.ndarray, cloud: jnp.ndarray,
                                  cloud_valid: jnp.ndarray) -> jnp.ndarray:
    """Largest |n.p + d| over a plane's sample cloud -- the sanity gate the
    reference applies before accepting a detected plane
    (Frame::MaxPointDistanceFromPlane, src/Frame.cc:1222)."""
    dist = jnp.abs(jnp.einsum("...qi,...i->...q", cloud, coeffs[..., :3])
                   + coeffs[..., 3:4])
    return jnp.max(jnp.where(cloud_valid, dist, 0.0), -1)
