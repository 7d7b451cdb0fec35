"""CAPE cylinder extraction, TPU-native.

Capability of the reference's CAPE CylinderSeg (src/CAPE/CylinderSeg.cpp:
6-246; gated by `cylinder_detection`, and NOTE: the reference's SLAM pipeline
ships with the CAPE call sites commented out, src/Frame.cc:129-132 -- this is
the same optional capability, off by default in config). Algorithm, re-derived
for fixed-shape batched tensors instead of the reference's sequential
Eigen/STL loops:

1. Candidate cells: grid blocks whose LOCAL plane fit is good (tile PCA) but
   that were NOT claimed by any accepted plane segment -- curved surfaces
   shatter into many small mutually-incompatible planar cells.
2. Cylinder axis: normals of a cylinder's surface are orthogonal to its axis,
   so the axis is the smallest-eigenvalue direction of the (sign-symmetric)
   normal scatter E[n n^T]; the eigenvalue ratio lam_max/lam_min >= 100 is
   the reference's `cylinder_score_min` gate.
3. Everything is projected to the plane orthogonal to the axis, where the
   cylinder is a CIRCLE: P'_i ~ c + r N'_i. For any cell subset the LLS
   solution is closed-form (CylinderSeg.cpp:118-126):
       r = (mean<N',P'> - <e1,e2>/M^2) / (1 - |e1|^2/M^2),
       c = (e2 - r e1)/M,   e1 = sum N'_i, e2 = sum P'_i.
4. Sequential multi-cylinder RANSAC: `max_cylinders` rounds of H batched
   triplet hypotheses, MSAC-truncated scoring (CylinderSeg.cpp:138-150),
   inlier re-fit, consume inliers, repeat. Rounds/hypotheses are fixed
   counts (lax.scan-friendly); failed rounds yield valid=False slots.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from dr_slam_tpu.ops import eig33

CYL_SCORE_MIN = 100.0          # Params.h:8
CYL_SQR_MAX_DIST = 0.0225      # Params.h:9 (15% of radius, squared)


class CylinderSegmentation(NamedTuple):
    axis: jnp.ndarray       # (C, 3) unit axis
    center: jnp.ndarray     # (C, 3) point on axis (in the projection plane)
    radius: jnp.ndarray     # (C,)
    mse: jnp.ndarray        # (C,) mean squared point-to-surface distance
    n_cells: jnp.ndarray    # (C,) int32 member cells
    valid: jnp.ndarray      # (C,) bool
    cell_mask: jnp.ndarray  # (C, NB) member cells over the flattened grid


@functools.partial(jax.jit, static_argnames=("max_cylinders", "n_hyp"))
def extract_cylinders(mean, normal, active, max_cylinders: int = 3,
                      n_hyp: int = 48, min_cells: int = 6,
                      key=None) -> CylinderSegmentation:
    """mean/normal (NB, 3) cell centroids + unit normals (camera frame),
    active (NB,) candidate mask. Returns up to max_cylinders cylinders."""
    if key is None:
        key = jax.random.PRNGKey(7)
    NB = mean.shape[0]
    af = active.astype(jnp.float32)
    m_act = jnp.maximum(jnp.sum(af), 1.0)

    # --- axis from sign-symmetric normal scatter ([N, -N] is mean-free, so
    # the scatter IS the second moment; CylinderSeg.cpp:35-58)
    scatter = jnp.einsum("n,ni,nj->ij", af, normal, normal) / m_act
    evals = eig33.eigvals_sym3(scatter[None])[0]          # ascending
    score = evals[2] / jnp.maximum(evals[0], 1e-9)
    axis = eig33.smallest_eigvec_sym3(scatter[None],
                                      evals[None, 0])[0]
    axis_ok = (score >= CYL_SCORE_MIN) & (jnp.sum(af) >= min_cells)

    # --- project to the plane orthogonal to the axis
    P = mean - jnp.einsum("ni,i->n", mean, axis)[:, None] * axis
    N = normal - jnp.einsum("ni,i->n", normal, axis)[:, None] * axis
    N = N / jnp.maximum(jnp.linalg.norm(N, axis=-1, keepdims=True), 1e-9)

    def lls(w):
        """Closed-form circle fit over weighted cells; w (..., NB)."""
        M = jnp.maximum(jnp.sum(w, -1), 1e-9)
        e1 = jnp.einsum("...n,ni->...i", w, N)
        e2 = jnp.einsum("...n,ni->...i", w, P)
        ndp = jnp.einsum("ni,ni->n", N, P)
        a = 1.0 - jnp.sum(e1 * e1, -1) / (M * M)
        b = (jnp.einsum("...n,n->...", w, ndp) / M
             - jnp.sum(e1 * e2, -1) / (M * M))
        r = b / jnp.where(jnp.abs(a) < 1e-9, 1e-9, a)
        c = (e2 - r[..., None] * e1) / M[..., None]
        return r, c

    def sqdist(r, c):
        """Normalized squared consensus distance (CylinderSeg.cpp:131).
        r (H,), c (H, 3) -> (H, NB)."""
        d = P[None] - r[:, None, None] * N[None] - c[:, None, :]
        return jnp.sum(d * d, -1) / jnp.maximum(r * r, 1e-9)[:, None]

    def round_body(carry, k):
        remaining = carry
        rf = remaining.astype(jnp.float32)
        m_left = jnp.sum(rf)
        # H triplets sampled from the remaining cells (Gumbel top-k trick:
        # per-hypothesis random keys, masked, 3 largest = uniform w/o repl.)
        g = jax.random.gumbel(jax.random.fold_in(key, k), (n_hyp, NB))
        g = jnp.where(remaining[None, :], g, -jnp.inf)
        _, tri = jax.lax.top_k(g, 3)                       # (H, 3)
        w_tri = jnp.zeros((n_hyp, NB)).at[
            jnp.arange(n_hyp)[:, None], tri].set(1.0)
        r_h, c_h = lls(w_tri)                              # (H,), (H, 3)
        D = sqdist(r_h, c_h)                               # (H, NB)
        inl = (D < CYL_SQR_MAX_DIST) & remaining[None, :]
        # MSAC truncated cost over remaining cells (CylinderSeg.cpp:140-150)
        cost = jnp.sum(jnp.where(inl, D,
                                 jnp.where(remaining[None, :],
                                           CYL_SQR_MAX_DIST, 0.0)), -1)
        best = jnp.argmin(cost)
        binl = inl[best]
        n_in = jnp.sum(binl)
        # refit on all inliers (CylinderSeg.cpp:186-206)
        r, c = lls(binl.astype(jnp.float32)[None])
        Df = sqdist(r, c)[0]
        r, c = r[0], c[0]
        finl = (Df < CYL_SQR_MAX_DIST) & remaining
        n_fin = jnp.sum(finl)
        r = jnp.abs(r)
        ok = (n_fin >= min_cells) & (m_left >= min_cells) & axis_ok \
            & (r > 0.02) & (r < 2.0)
        # MSE of radial point-to-surface distance (CylinderSeg.cpp:221-237)
        radial = jnp.linalg.norm(P - c[None], axis=-1) - r
        mse = jnp.sum(jnp.where(finl, radial * radial, 0.0)) \
            / jnp.maximum(n_fin, 1)
        out = (axis, c, r, mse, n_fin.astype(jnp.int32), ok,
               finl & ok)
        remaining = remaining & ~(finl & ok)
        return remaining, out

    _, outs = jax.lax.scan(round_body, active,
                           jnp.arange(max_cylinders))
    ax, c, r, mse, n_cells, ok, masks = outs
    return CylinderSegmentation(axis=ax, center=c, radius=r, mse=mse,
                                n_cells=n_cells, valid=ok, cell_mask=masks)


@functools.partial(jax.jit, static_argnames=("block", "max_cylinders"))
def segment_cylinders(depth, K4, block_label, block: int = 8,
                      max_cylinders: int = 3,
                      mse_factor: float = 2.5e-3,
                      max_depth: float = 5.0) -> CylinderSegmentation:
    """Full CAPE cylinder pass from an organized depth map: recompute tile
    moments (cheap reductions), activate locally-planar cells NOT claimed by
    any accepted plane (block_label < 0 from ops/planes.segment_planes), and
    run the batched sequential RANSAC above."""
    from dr_slam_tpu.ops.normals import depth_to_cloud
    from dr_slam_tpu.ops.planes import _block_moments

    valid = (depth > 1e-3) & (depth < max_depth)
    cloud = depth_to_cloud(jnp.where(valid, depth, 0.0), K4)
    cnt, mean, cov = _block_moments(cloud, valid, block)
    gh, gw = cnt.shape
    n, d, mse = eig33.plane_from_cov(mean, cov)
    z = jnp.maximum(mean[..., 2], 0.3)
    sigma = mse_factor * z * z
    lam1 = eig33.eigvals_sym3(cov)[..., 1]
    locally_planar = ((cnt > 0.75 * block * block)
                      & (mse < jnp.maximum(sigma * sigma, 1e-8))
                      & (lam1 > 1e-7))
    active = locally_planar & (block_label < 0)
    return extract_cylinders(mean.reshape(-1, 3), n.reshape(-1, 3),
                             active.reshape(-1),
                             max_cylinders=max_cylinders)
