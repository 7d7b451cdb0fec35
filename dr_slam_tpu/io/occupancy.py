"""Occupancy-grid export.

Capability of the reference's octomap path (System::Save_OccupancyMap,
src/System.cc:574-615 publishes keyframe clouds to an octomap_server;
launch/load_octomap.launch): project the map into a 2D/3D occupancy grid.
Here the grid is built on-device with one scatter-add over all map points
(+ plane sample clouds), then saved as .npz / PGM (ROS map_server format)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def occupancy_grid_2d(points: jnp.ndarray, valid: jnp.ndarray,
                      resolution: float = 0.05, size: int = 256,
                      origin=None, height_band=(-2.0, 2.0)):
    """Top-down (x, z) occupancy counts. points (N, 3) world, y = vertical.

    -> (grid (size, size) int32 counts, origin (2,))."""
    pts = np.asarray(points)
    ok = np.asarray(valid)
    ok = ok & (pts[:, 1] > height_band[0]) & (pts[:, 1] < height_band[1])
    if origin is None:
        sel = pts[ok] if ok.any() else np.zeros((1, 3))
        origin = sel[:, [0, 2]].min(0) - 2 * resolution
    origin = jnp.asarray(origin, dtype=jnp.float32)

    @jax.jit
    def build(p, okm):
        ij = ((p[:, [0, 2]] - origin) / resolution).astype(jnp.int32)
        inb = okm & jnp.all((ij >= 0) & (ij < size), axis=1)
        ij = jnp.where(inb[:, None], ij, size)  # dropped
        grid = jnp.zeros((size + 1, size + 1), jnp.int32)
        grid = grid.at[ij[:, 1], ij[:, 0]].add(1, mode="drop")
        return grid[:size, :size]

    return build(jnp.asarray(pts, jnp.float32), jnp.asarray(ok)), np.asarray(origin)


def occupancy_grid_3d(points: jnp.ndarray, valid: jnp.ndarray,
                      resolution: float = 0.10, size=(64, 32, 64),
                      origin=None):
    """Voxel occupancy counts (octomap capability, scatter-add on device)."""
    pts = np.asarray(points)
    ok = np.asarray(valid)
    if origin is None:
        sel = pts[ok] if ok.any() else np.zeros((1, 3))
        origin = sel.min(0) - 2 * resolution
    origin = jnp.asarray(origin, dtype=jnp.float32)
    sx, sy, sz = size

    @jax.jit
    def build(p, okm):
        ijk = ((p - origin) / resolution).astype(jnp.int32)
        inb = okm & jnp.all((ijk >= 0) & (ijk < jnp.asarray(size)), axis=1)
        ijk = jnp.where(inb[:, None], ijk, jnp.asarray(size))
        grid = jnp.zeros((sx + 1, sy + 1, sz + 1), jnp.int32)
        grid = grid.at[ijk[:, 0], ijk[:, 1], ijk[:, 2]].add(1, mode="drop")
        return grid[:sx, :sy, :sz]

    return build(jnp.asarray(pts, jnp.float32), jnp.asarray(ok)), np.asarray(origin)


def save_occupancy_map(path: str, state, resolution: float = 0.05,
                       size: int = 256, min_hits: int = 1) -> None:
    """Save 2D occupancy from the full map (points + plane clouds):
    .npz with grid/origin/resolution + .pgm (ROS map_server grayscale)."""
    pts = np.concatenate([
        np.asarray(state.pt_pos),
        np.asarray(state.pl_cloud).reshape(-1, 3),
    ])
    ok = np.concatenate([
        np.asarray(state.pt_valid),
        np.asarray(state.pl_cloud_valid).reshape(-1),
    ])
    grid, origin = occupancy_grid_2d(jnp.asarray(pts), jnp.asarray(ok),
                                     resolution, size)
    grid = np.asarray(grid)
    np.savez(path + ".npz", grid=grid, origin=origin, resolution=resolution)
    occ = np.where(grid >= min_hits, 0, 254).astype(np.uint8)  # 0 = occupied
    with open(path + ".pgm", "wb") as f:
        f.write(f"P5\n{size} {size}\n255\n".encode())
        f.write(occ[::-1].tobytes())
