"""Keypoint undistortion (Frame::UndistortKeyPoints capability)."""

import dataclasses

import numpy as np

from dr_slam_tpu.geometry.camera import distort_points, undistort_points

# TUM freiburg1 coefficients (Examples/RGB-D/TUM1.yaml Camera.k1..k3):
# strong barrel + tangential distortion.
K4 = (517.306408, 516.469215, 318.643040, 255.313989)
DIST = (0.262383, -0.953104, -0.005358, 0.002628, 1.163314)


def _grid(n=25, margin=40.0, w=640.0, h=480.0):
    u = np.linspace(margin, w - margin, n)
    v = np.linspace(margin, h - margin, n)
    uu, vv = np.meshgrid(u, v)
    return np.stack([uu.ravel(), vv.ravel()], -1).astype(np.float32)


def test_undistort_inverts_distort():
    """Golden synthetic-field test: forward-distort ideal pixels, undistort,
    recover the original within a milli-pixel-ish tolerance."""
    ideal = _grid()
    distorted = np.asarray(distort_points(ideal, K4, DIST))
    # the distortion is non-trivial (tens of pixels at the border)
    assert np.abs(distorted - ideal).max() > 5.0
    recovered = np.asarray(undistort_points(distorted, K4, DIST))
    err = np.linalg.norm(recovered - ideal, axis=-1)
    assert err.max() < 2e-2, err.max()


def test_undistort_identity_when_zero():
    ideal = _grid(n=8)
    out = np.asarray(undistort_points(ideal, K4, (0.0, 0.0, 0.0, 0.0, 0.0)))
    np.testing.assert_allclose(out, ideal, atol=1e-4)


def test_frontend_applies_undistortion():
    """extract_frame with nonzero distortion returns undistorted keypoint uv:
    identical image => keypoints at undistort(raw uv)."""
    from dr_slam_tpu.frontend.frame import extract_frame
    from tests.test_tracking_e2e import small_cfg

    from dr_slam_tpu.io import synthetic

    cfg0 = small_cfg()
    seq = synthetic.SyntheticSequence(
        synthetic.corridor_trajectory(1), K4=cfg0.camera.K4,
        height=240, width=320)
    gray, depth = seq.render(0)

    f0 = extract_frame(gray, depth, cfg0)
    cam_d = dataclasses.replace(cfg0.camera, k1=0.05, k2=-0.02)
    cfg_d = cfg0.replace(camera=cam_d)
    f1 = extract_frame(gray, depth, cfg_d)

    valid = np.asarray(f0.kp.valid)
    uv0 = np.asarray(f0.kp.uv)[valid]
    uv1 = np.asarray(f1.kp.uv)[valid]
    expect = np.asarray(undistort_points(
        uv0, cfg0.camera.K4, (0.05, -0.02, 0.0, 0.0, 0.0)))
    np.testing.assert_allclose(uv1, expect, atol=1e-3)
    # and the backprojection uses the undistorted ray
    d = np.asarray(f0.kp_depth)[valid]
    fx, fy, cx, cy = cfg0.camera.K4
    xyz1 = np.asarray(f1.kp_xyz)[valid]
    np.testing.assert_allclose(xyz1[:, 0], (uv1[:, 0] - cx) / fx * d, atol=1e-4)
