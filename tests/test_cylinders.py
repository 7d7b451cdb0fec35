"""CAPE cylinder extraction (reference src/CAPE/CylinderSeg.cpp; optional
capability, call sites shipped commented-out in the reference Frame.cc:129).

Golden tests on analytic cylinders: the closed-form LLS + sequential RANSAC
must recover axis, radius, and center from (a) synthetic cell moments and
(b) a ray-cast depth image of a cylinder in front of a wall."""

import numpy as np
import pytest

import jax.numpy as jnp

from dr_slam_tpu.ops.cylinders import extract_cylinders, segment_cylinders


def _cylinder_cells(axis, center, radius, n_cells=60, seed=0, noise=0.0005):
    """Cell centroids + outward normals sampled on a cylinder surface."""
    rng = np.random.RandomState(seed)
    axis = np.asarray(axis, np.float64)
    axis /= np.linalg.norm(axis)
    # orthonormal frame around the axis
    tmp = np.array([1.0, 0, 0]) if abs(axis[0]) < 0.9 else np.array([0, 1.0, 0])
    e1 = np.cross(axis, tmp); e1 /= np.linalg.norm(e1)
    e2 = np.cross(axis, e1)
    th = rng.uniform(-1.2, 1.2, n_cells)          # visible arc
    h = rng.uniform(-0.5, 0.5, n_cells)
    nrm = (np.cos(th)[:, None] * e1 + np.sin(th)[:, None] * e2)
    pts = (np.asarray(center) + radius * nrm + h[:, None] * axis
           + rng.randn(n_cells, 3) * noise)
    return (jnp.asarray(pts, jnp.float32), jnp.asarray(nrm, jnp.float32))


def test_extract_cylinder_golden():
    axis_true = np.array([0.1, 0.97, 0.05]); axis_true /= np.linalg.norm(axis_true)
    center_true = np.array([0.4, 0.1, 2.0])
    r_true = 0.25
    pts, nrm = _cylinder_cells(axis_true, center_true, r_true)
    active = jnp.ones(pts.shape[0], bool)
    seg = extract_cylinders(pts, nrm, active)
    ok = np.asarray(seg.valid)
    assert ok[0], (np.asarray(seg.n_cells), np.asarray(seg.radius))
    assert abs(float(seg.radius[0]) - r_true) < 0.02, float(seg.radius[0])
    a = np.asarray(seg.axis[0])
    assert abs(abs(a @ axis_true) - 1.0) < 5e-3, a
    # center is reported in the axis-orthogonal projection plane
    c_proj = center_true - (center_true @ axis_true) * axis_true
    assert np.linalg.norm(np.asarray(seg.center[0]) - c_proj) < 0.03
    assert float(seg.mse[0]) < 1e-4


def test_extract_two_cylinders_sequential():
    """Sequential RANSAC separates two cylinders with different radii."""
    p1, n1 = _cylinder_cells([0, 1, 0], [0.0, 0.0, 1.5], 0.20, seed=1)
    p2, n2 = _cylinder_cells([0, 1, 0], [1.5, 0.0, 3.0], 0.45, seed=2)
    pts = jnp.concatenate([p1, p2])
    nrm = jnp.concatenate([n1, n2])
    seg = extract_cylinders(pts, nrm, jnp.ones(pts.shape[0], bool))
    ok = np.asarray(seg.valid)
    assert ok.sum() >= 2, (ok, np.asarray(seg.n_cells))
    radii = sorted(float(r) for r, v in zip(seg.radius, ok) if v)[:2]
    assert abs(radii[0] - 0.20) < 0.04 and abs(radii[1] - 0.45) < 0.06, radii


def test_flat_cells_yield_no_cylinder():
    """A plane's cells (all normals parallel) fail the axis-scatter gate."""
    rng = np.random.RandomState(0)
    pts = jnp.asarray(rng.uniform(-1, 1, (40, 3)), jnp.float32)
    nrm = jnp.asarray(np.tile([0, 0, 1.0], (40, 1))
                      + rng.randn(40, 3) * 0.002, jnp.float32)
    nrm = nrm / jnp.linalg.norm(nrm, axis=-1, keepdims=True)
    seg = extract_cylinders(pts, nrm, jnp.ones(40, bool))
    assert not np.asarray(seg.valid).any()


def _render_cylinder_depth(K4, h, w, X0=0.2, Z0=2.2, R=0.30, zwall=4.0):
    """Analytic depth: vertical cylinder (axis +y) in front of a wall."""
    fx, fy, cx, cy = K4
    u, v = np.meshgrid(np.arange(w), np.arange(h))
    dx = (u - cx) / fx
    A = dx * dx + 1.0
    B = -2.0 * (dx * X0 + Z0)
    C = X0 * X0 + Z0 * Z0 - R * R
    disc = B * B - 4 * A * C
    t = (-B - np.sqrt(np.maximum(disc, 0.0))) / (2 * A)
    hit = (disc > 0) & (t > 0.1)
    return np.where(hit, t, zwall).astype(np.float32)


def test_segment_cylinders_from_depth():
    """Full pass: plane segmentation claims the wall; the unclaimed
    locally-planar cells on the cylinder body yield the right radius."""
    from dr_slam_tpu.ops.planes import segment_planes

    K4 = (250.0, 250.0, 160.0, 120.0)
    depth = jnp.asarray(_render_cylinder_depth(K4, 240, 320, R=0.30))
    planes = segment_planes(depth, K4)
    seg = segment_cylinders(depth, K4, planes.block_label)
    ok = np.asarray(seg.valid)
    assert ok.any(), (np.asarray(seg.n_cells), np.asarray(seg.radius))
    i = int(np.argmax(ok))
    assert abs(float(seg.radius[i]) - 0.30) < 0.05, float(seg.radius[i])
    a = np.abs(np.asarray(seg.axis[i]))
    assert a[1] > 0.99, a  # vertical axis


def test_frame_pipeline_cylinder_flag():
    """detect_cylinders=True threads CylinderSegmentation through
    extract_frame (Frame::ExtractCylinder role); default config leaves
    cylinders None and the fused program unchanged."""
    import dataclasses
    from dr_slam_tpu.frontend.frame import extract_frame
    from tests.test_tracking_e2e import small_cfg

    cfg0 = small_cfg()
    K4 = cfg0.camera.K4
    depth = jnp.asarray(_render_cylinder_depth(K4, 240, 320, R=0.30))
    gray = jnp.asarray(
        np.tile(np.linspace(0, 255, 320, dtype=np.float32), (240, 1)))
    feats0 = extract_frame(gray, depth, cfg0)
    assert feats0.cylinders is None
    cfg = cfg0.replace(plane=dataclasses.replace(
        cfg0.plane, detect_cylinders=True))
    feats = extract_frame(gray, depth, cfg)
    assert feats.cylinders is not None
    assert np.asarray(feats.cylinders.valid).any()
