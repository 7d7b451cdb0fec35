"""Manhattan-frame rotation tracking on the Gaussian sphere -- pure tensor ops.

Capability of the reference's Tracking::TrackManhattanFrame
(src/Tracking.cc:1336-1527) with ProjectSN2Conic (:1198), ProjectSN2MF
(:1055) and MeanShift (:1529): every frame, refine the Manhattan->camera
rotation R_cm by, for each of the 3 axes,

1. rotating all surface normals (+ line directions) into the axis frame,
2. keeping those inside a small cone around the axis
   (sin 0.2018 for normals, sin 0.1018 for line directions -- the
   reference's two cone constants, Tracking.cc:1234,1260),
3. mapping cone members to the tangent plane (m = alpha/tan(alpha) * n/nz),
4. one Gaussian-kernel mean-shift step (kernel exp(-20 |m|^2)),
5. mapping the shifted mode back to the sphere -> refined axis.

The reference iterates this whole routine 3x per frame for a fixed point
(Tracking.cc:328-332); `track_manhattan_frame` does the same with a
lax.fori_loop. Axis recovery rules match: >= max(ratio * N, 1) members per
axis, < 2 axes found -> keep previous rotation, exactly 2 -> third axis from
the cross product with handedness fixed, then SVD re-orthonormalization
(Tracking.cc:1462-1518). Everything is fixed-shape and branchless, so the
whole tracker is one fused XLA program over the (N, 3) direction field."""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from dr_slam_tpu.geometry import se3


class ManhattanResult(NamedTuple):
    R_cm: jnp.ndarray        # (3, 3) refined Manhattan->camera rotation
    success: jnp.ndarray     # () bool: >= 2 axes recovered
    n_members: jnp.ndarray   # (3,) int32 cone membership per axis


def _axis_update(R_cm, dirs, weights, valid, axis, cone_sin, kernel, min_members):
    """One mean-shift update of axis `axis` (static int). Returns
    (new_axis_dir (3,), ok (), count ())."""
    a = R_cm[:, axis]                          # current axis in camera frame
    # Build a frame with this axis as z: columns (b1, b2, a).
    other1 = R_cm[:, (axis + 1) % 3]
    other2 = R_cm[:, (axis + 2) % 3]
    Rp = jnp.stack([other1, other2, a], axis=1)  # (3,3), det +1 or -1 (ok)

    d = dirs @ Rp                               # (N, 3) in axis frame
    # Accept both hemispheres: Manhattan axes are undirected.
    d = d * jnp.where(d[:, 2:3] < 0, -1.0, 1.0)
    nz = jnp.maximum(d[:, 2], 1e-6)
    lam = jnp.sqrt(d[:, 0] ** 2 + d[:, 1] ** 2)
    # unit dirs: inside cone iff sqrt(nx^2+ny^2) < sin(theta), per-dir theta
    in_cone = valid & (lam < cone_sin)

    alpha = jnp.arcsin(jnp.clip(lam, 0.0, 0.999))
    # alpha/tan(alpha) -> 1 at 0
    scale = jnp.where(alpha > 1e-5, alpha / jnp.tan(alpha + 1e-12), 1.0)
    m = scale[:, None] * d[:, :2] / nz[:, None]  # (N, 2) tangent coords

    w = jnp.exp(-kernel * jnp.sum(m * m, -1)) * weights * in_cone
    wsum = jnp.sum(w)
    s = jnp.sum(m * w[:, None], 0) / jnp.maximum(wsum, 1e-9)

    new_local = jnp.concatenate([s, jnp.ones(1, dtype=s.dtype)])
    new_local = new_local / jnp.linalg.norm(new_local)
    new_axis = Rp @ new_local

    count = jnp.sum(in_cone & (weights > 0))
    ok = count >= min_members
    return jnp.where(ok, new_axis, a), ok, count


@functools.partial(jax.jit, static_argnames=("n_iterations",))
def track_manhattan_frame(R_cm_prev: jnp.ndarray,
                          normals: jnp.ndarray, normals_valid: jnp.ndarray,
                          line_dirs: jnp.ndarray | None = None,
                          line_valid: jnp.ndarray | None = None,
                          cone_normals: float = 0.2018,
                          cone_lines: float = 0.1018,
                          kernel: float = 20.0,
                          min_ratio: float = 0.05,
                          n_iterations: int = 3,
                          tol: float = 1e-3) -> ManhattanResult:
    """Refine R_cm from a surface-normal field (+ optional line directions)."""
    normals = normals.reshape(-1, 3)
    normals_valid = normals_valid.reshape(-1)
    if line_dirs is None:
        line_dirs = jnp.zeros((1, 3), dtype=normals.dtype)
        line_valid = jnp.zeros((1,), dtype=bool)
    line_dirs = line_dirs.reshape(-1, 3)
    line_valid = line_valid.reshape(-1)

    dirs = jnp.concatenate([normals, line_dirs], 0)
    nrm = jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    dirs = dirs / jnp.maximum(nrm, 1e-9)
    valid = jnp.concatenate([normals_valid, line_valid], 0) & (nrm[:, 0] > 1e-6)
    weights = jnp.ones(dirs.shape[0], dtype=dirs.dtype)

    n_valid_normals = jnp.sum(normals_valid)
    min_members = jnp.maximum((min_ratio * n_valid_normals).astype(jnp.int32), 1)

    # Per-direction cone width: normals get the wide cone, lines the narrow
    # one (the reference's two sin thresholds, Tracking.cc:1234,1260).
    sin_cone = jnp.concatenate([
        jnp.full((normals.shape[0],), jnp.sin(cone_normals), dtype=dirs.dtype),
        jnp.full((line_dirs.shape[0],), jnp.sin(cone_lines), dtype=dirs.dtype)])

    def one_pass(R):
        axes, oks, counts = [], [], []
        for axis in range(3):
            na, ok, cnt = _axis_update(
                R, dirs, weights, valid, axis, sin_cone, kernel, min_members)
            axes.append(na)
            oks.append(ok)
            counts.append(cnt)
        ax = jnp.stack(axes, 1)         # columns
        ok3 = jnp.stack(oks)
        n_ok = jnp.sum(ok3)

        # exactly-2 recovery: rebuild the failed axis from the cross product
        # of the other two, preserving handedness (Tracking.cc:1471-1510).
        for axis in range(3):
            other1 = ax[:, (axis + 1) % 3]
            other2 = ax[:, (axis + 2) % 3]
            rebuilt = jnp.cross(other1, other2)
            rebuilt = rebuilt / jnp.maximum(jnp.linalg.norm(rebuilt), 1e-9)
            use = (~ok3[axis]) & ok3[(axis + 1) % 3] & ok3[(axis + 2) % 3]
            ax = ax.at[:, axis].set(jnp.where(use, rebuilt, ax[:, axis]))

        R_new = se3.orthonormalize_rotation(ax)
        success = n_ok >= 2
        R_new = jnp.where(success, R_new, R)
        return R_new, success, jnp.stack(counts)

    def body(_, carry):
        R, _, _ = carry
        return one_pass(R)

    init = (R_cm_prev, jnp.asarray(False), jnp.zeros(3, dtype=jnp.int32))
    R, s, c = jax.lax.fori_loop(0, n_iterations, body, init)
    return ManhattanResult(R_cm=R, success=s, n_members=c)
