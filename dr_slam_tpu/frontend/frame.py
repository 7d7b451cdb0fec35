"""Per-frame front-end: one fused device program.

The reference Frame constructor (src/Frame.cc:74-216) spawns 4 CPU threads --
ExtractORB / ExtractLSD / ComputePlanes / ExtractObject -- then undistorts,
computes the depth->disparity stereo proxy (ComputeStereoFromRGBD,
Frame.cc:893) and bins features into a 64x48 grid. Here the whole front-end
is ONE jitted function over the frame tensors: XLA schedules the ORB pyramid,
normal field and plane segmentation together (the TPU-native version of the
4-thread fan-out, SURVEY.md section 2.8), and fixed-capacity outputs keep every
downstream consumer shape-stable.

Depth sampling at keypoints mirrors ComputeStereoFromRGBD: uR = u - bf/z for
pixels with valid depth, uR = -1 otherwise."""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from dr_slam_tpu.config import SlamConfig
from dr_slam_tpu.ops import lines as line_ops
from dr_slam_tpu.ops import normals as normal_ops
from dr_slam_tpu.ops import orb as orb_ops
from dr_slam_tpu.ops import planes as plane_ops


class FrameFeatures(NamedTuple):
    kp: orb_ops.Keypoints          # fixed-capacity ORB keypoints
    kp_depth: jnp.ndarray          # (K,) depth in meters (0 = invalid)
    kp_ur: jnp.ndarray             # (K,) stereo right coord (-1 = mono)
    kp_xyz: jnp.ndarray            # (K, 3) camera-frame backprojection
    normals: jnp.ndarray           # (Nn, 3) surface-normal field
    normals_valid: jnp.ndarray     # (Nn,)
    planes: plane_ops.PlaneSegmentation
    lines: "line_ops.LineFeatures"
    cylinders: object = None       # CylinderSegmentation when
                                   # cfg.plane.detect_cylinders (CAPE parity;
                                   # off by default like the reference)


def _sample_depth(depth: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """Depth at keypoints; nearest pixel, with a 3x3 min-positive fallback
    so keypoints on depth edges still get a value."""
    h, w = depth.shape
    x = jnp.clip(jnp.round(uv[:, 0]).astype(jnp.int32), 1, w - 2)
    y = jnp.clip(jnp.round(uv[:, 1]).astype(jnp.int32), 1, h - 2)
    center = depth[y, x]
    best = jnp.full_like(center, jnp.inf)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            v = depth[y + dy, x + dx]
            best = jnp.where((v > 1e-3) & (v < best), v, best)
    d = jnp.where(center > 1e-3, center, jnp.where(jnp.isfinite(best), best, 0.0))
    return d


def ingest(gray, depth, cam):
    """Camera-native frame ingestion, ON DEVICE (trace-time dtype dispatch).

    Accepts gray as uint8 (sensor-native, 4x less H2D than f32 over the
    tunneled TPU link) or float32 [0,255], and depth as uint16 sensor units
    (TUM 16-bit PNG, DepthMapFactor scaling -- the reference converts on the
    CPU, src/Tracking.cc:223 imDepth.convertTo; here the cast+scale runs on
    the TPU so the host touches no pixels) or float32 meters. Returns
    (gray f32, depth f32 meters)."""
    if gray.dtype != jnp.float32:
        gray = gray.astype(jnp.float32)
    if jnp.issubdtype(depth.dtype, jnp.integer):
        # ANY integer depth is sensor units (TUM 16-bit PNG semantics,
        # whatever width the loader delivered) -- never meters
        depth = depth.astype(jnp.float32) * (1.0 / cam.depth_factor)
    elif depth.dtype != jnp.float32:
        depth = depth.astype(jnp.float32)
    return gray, depth


def extract_frame(gray: jnp.ndarray, depth: jnp.ndarray,
                  cfg: SlamConfig) -> FrameFeatures:
    """gray (H, W) uint8 or [0,255] float32, depth (H, W) uint16 sensor
    units or float32 meters -> FrameFeatures."""
    return _extract_frame(gray, depth, cfg.camera, cfg.orb, cfg.plane,
                          cfg.line)


@functools.partial(jax.jit, static_argnames=("cam", "orb", "plane", "line"))
def _extract_frame(gray, depth, cam, orb, plane, line) -> FrameFeatures:
    gray, depth = ingest(gray, depth, cam)
    K4 = cam.K4
    kp = orb_ops.extract_orb(
        gray, n_features=orb.n_features, n_levels=orb.n_levels,
        scale=orb.scale_factor, max_keypoints=orb.max_keypoints,
        cell=orb.cell_size, ini_th=float(orb.ini_th_fast),
        min_th=float(orb.min_th_fast))
    # depth is sampled at the RAW pixel location (the depth image lives in
    # distorted pixel space), the geometry at the UNDISTORTED one
    d = _sample_depth(depth, kp.uv)
    dist = (cam.k1, cam.k2, cam.p1, cam.p2, cam.k3)
    if any(c != 0.0 for c in dist):
        # UndistortKeyPoints (reference src/Frame.cc:835): all projective
        # geometry downstream assumes an ideal pinhole camera
        from dr_slam_tpu.geometry.camera import undistort_points
        kp = kp._replace(uv=undistort_points(kp.uv, K4, dist))
    ur = jnp.where(d > 1e-3, kp.uv[:, 0] - cam.bf / jnp.maximum(d, 1e-6), -1.0)
    fx, fy, cx, cy = K4
    xyz = jnp.stack([(kp.uv[:, 0] - cx) / fx * d,
                     (kp.uv[:, 1] - cy) / fy * d,
                     d], -1)

    nrm, nrm_ok = normal_ops.surface_normals(depth, K4)
    seg = plane_ops.segment_planes(
        depth, K4, block=plane.block, max_planes=plane.max_planes,
        min_blocks=plane.min_blocks,
        merge_angle_cos=plane.merge_angle_cos,
        merge_dist=plane.merge_dist, mse_factor=plane.mse_factor,
        max_depth=plane.max_depth, cloud_points=plane.cloud_points)
    # sanity gate: reject planes whose refit cloud strays too far
    maxd = plane_ops.max_point_distance_from_plane(seg.coeffs, seg.cloud,
                                                   seg.cloud_valid)
    seg = seg._replace(valid=seg.valid & (maxd < plane.max_point_dist))

    lf = line_ops.extract_lines(
        gray, depth, K4, max_lines=line.max_lines,
        grad_threshold=line.grad_threshold,
        min_length=line.min_length, n_samples=line.n_samples)

    cyl = None
    if plane.detect_cylinders:
        from dr_slam_tpu.ops.cylinders import segment_cylinders
        cyl = segment_cylinders(depth, K4, seg.block_label,
                                block=plane.block,
                                max_cylinders=plane.max_cylinders,
                                mse_factor=plane.mse_factor,
                                max_depth=plane.max_depth)

    return FrameFeatures(kp=kp, kp_depth=d, kp_ur=ur, kp_xyz=xyz,
                         normals=nrm.reshape(-1, 3),
                         normals_valid=nrm_ok.reshape(-1),
                         planes=seg, lines=lf, cylinders=cyl)
