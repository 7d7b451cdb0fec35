"""Manhattan-frame bootstrap from frame planes (+ optional line directions).

Capability of Map::FindManhattan (src/Map.cc:178-404): pick the dominant pair
of mutually perpendicular structures (plane-plane preferred, plane-line as
fallback), build the third axis from the cross product, orthonormalize with
SVD. Here: all pairs are scored at once with masked outer products --
branchless, fixed shape."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from dr_slam_tpu.geometry import se3


@jax.jit
def find_manhattan(plane_normals: jnp.ndarray, plane_valid: jnp.ndarray,
                   plane_weight: jnp.ndarray,
                   line_dirs: jnp.ndarray | None = None,
                   line_valid: jnp.ndarray | None = None,
                   vertical_cos: float = 0.0871):
    """-> (R_cm (3,3), success ()). plane_normals (P,3) in camera frame,
    plane_weight = support size (e.g. member block counts)."""
    n = plane_normals / jnp.maximum(
        jnp.linalg.norm(plane_normals, axis=-1, keepdims=True), 1e-9)
    P = n.shape[0]
    w = plane_weight * plane_valid

    # --- plane-plane pairs ---------------------------------------------------
    dots = jnp.abs(n @ n.T)                               # (P, P)
    perp = dots < vertical_cos                            # ~90 deg apart
    pair_w = w[:, None] + w[None, :]
    iu = jnp.triu_indices(P, k=1)
    score = jnp.where(perp & (w[:, None] > 0) & (w[None, :] > 0), pair_w, -1.0)
    score_flat = score[iu]
    best = jnp.argmax(score_flat)
    best_score = score_flat[best]
    i_idx = iu[0][best]
    j_idx = iu[1][best]
    a1_pp = n[i_idx]
    a2_pp = n[j_idx]
    ok_pp = best_score > 0

    # --- plane-line fallback (Map.cc:237-296) --------------------------------
    if line_dirs is None:
        line_dirs = jnp.zeros((1, 3))
        line_valid = jnp.zeros((1,), dtype=bool)
    ld = line_dirs / jnp.maximum(
        jnp.linalg.norm(line_dirs, axis=-1, keepdims=True), 1e-9)
    pl = jnp.abs(n @ ld.T)                                # (P, L)
    perp_pl = (pl < vertical_cos) & (w[:, None] > 0) & line_valid[None, :]
    score_pl = jnp.where(perp_pl, w[:, None], -1.0)
    best_pl = jnp.argmax(score_pl)
    pi = best_pl // ld.shape[0]
    li = best_pl % ld.shape[0]
    ok_pl = score_pl.reshape(-1)[best_pl] > 0
    a1_fb = n[pi]
    a2_fb = ld[li]

    a1 = jnp.where(ok_pp, a1_pp, a1_fb)
    a2 = jnp.where(ok_pp, a2_pp, a2_fb)
    success = ok_pp | ok_pl

    # Gram-Schmidt + cross for the third axis, then SVD (Map.cc:393-399).
    a2 = a2 - jnp.dot(a1, a2) * a1
    a2 = a2 / jnp.maximum(jnp.linalg.norm(a2), 1e-9)
    a3 = jnp.cross(a1, a2)
    R = se3.orthonormalize_rotation(jnp.stack([a1, a2, a3], axis=1))
    R = jnp.where(success, R, jnp.eye(3, dtype=R.dtype))
    return R, success
