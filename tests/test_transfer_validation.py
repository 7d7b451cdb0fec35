"""Acceptance-constant transfer validation on a NON-training world.

VERDICT r2 weak 6: every reloc/loop acceptance constant was tuned on the bare
320x240 corridor. These tests run the same untouched constants in a cluttered
'office' room (wall-seated AABB furniture -> occlusions, depth steps, planar
patches at many depths), a different camera intrinsics set, and a Kinect-like
quadratic depth-noise model (sigma ~ 0.0012 z^2) -- if the constants only
worked on the training world, tracking/reloc fail here."""

import dataclasses

import numpy as np
import pytest

from dr_slam_tpu.io import synthetic
from dr_slam_tpu.io.metrics import ate_rmse
from tests.test_tracking_e2e import small_cfg


def office_cfg():
    """Different intrinsics from the corridor tests' (fx 260 vs 250 etc.)."""
    cfg0 = small_cfg()
    return cfg0.replace(
        camera=dataclasses.replace(cfg0.camera, fx=262.0, fy=258.0,
                                   cx=157.0, cy=118.0))


@pytest.fixture(scope="module")
def office_run():
    from dr_slam_tpu.slam.system import System

    cfg = office_cfg()
    n = 40
    room = synthetic.BoxRoom()
    seq = synthetic.SyntheticSequence(
        synthetic.corridor_trajectory(n, room=room, step=0.015),
        K4=cfg.camera.K4, height=240, width=320, room=room,
        boxes=synthetic.office_clutter(room), depth_noise=True,
        quadratic_noise=True)
    sysm = System(cfg, enable_loop_closing=False)
    states = []
    for i in range(n):
        gray, depth = seq.render(i)
        states.append(sysm.track_rgbd(gray, depth, i / 30.0).state.name)
    sysm.tracker.flush()
    return cfg, seq, sysm, states


def test_office_renders_clutter(office_run):
    """Sanity: the clutter actually occludes (depth discontinuities exist
    where the bare room is smooth)."""
    _, seq, _, _ = office_run
    _, depth = seq.render(10)
    d = np.asarray(depth)
    bare = synthetic.SyntheticSequence(
        seq.poses_cw, K4=seq.K4, height=240, width=320, room=seq.room)
    _, depth0 = bare.render(10)
    jumps = np.abs(np.diff(d, axis=1)).max()
    jumps0 = np.abs(np.diff(np.asarray(depth0), axis=1)).max()
    assert jumps > jumps0 + 0.2, (jumps, jumps0)


def test_office_tracking_holds(office_run):
    cfg, seq, sysm, states = office_run
    assert states.count("LOST") == 0, states
    est = np.asarray([np.linalg.inv(T)[:3, 3]
                      for _, T in sysm.tracker.trajectory])
    gt = np.asarray([np.linalg.inv(p)[:3, 3] for p in seq.poses_cw])
    ate = ate_rmse(est, gt)
    assert ate < 0.08, ate


def test_office_relocalization(office_run):
    """The untouched reloc acceptance ladder (opt>=30, verify>=60 at
    tracking.py) must accept the true pose in the cluttered world: blackout
    -> LOST -> relocalize within a few good frames, landing near GT."""
    cfg, seq, sysm, _ = office_run
    import copy

    n0 = len(seq.poses_cw)
    black_g = np.zeros((240, 320), np.float32)
    black_d = np.zeros((240, 320), np.float32)
    for j in range(3):
        res = sysm.track_rgbd(black_g, black_d, (n0 + j) / 30.0)
    sysm.tracker.flush()
    assert sysm.tracker.state.name == "LOST"
    # revisit an already-mapped view (frame 20)
    ok_frame = 20
    gray, depth = seq.render(ok_frame)
    recovered = None
    for j in range(3):
        res = sysm.track_rgbd(gray, depth, (n0 + 4 + j) / 30.0)
        sysm.tracker.flush()
        if sysm.tracker.state.name == "OK":
            recovered = res
            break
    assert recovered is not None, "relocalization never accepted"
    T_est = np.asarray(recovered.T_cw)
    # map world frame = camera-0 frame (StereoInitialization seats KF0 at
    # the origin), so the GT pose in map coordinates is T_i @ inv(T_0)
    T_gt = np.asarray(seq.poses_cw[ok_frame]) @ np.linalg.inv(
        np.asarray(seq.poses_cw[0]))
    err = np.linalg.norm(np.linalg.inv(T_est)[:3, 3]
                         - np.linalg.inv(T_gt)[:3, 3])
    assert err < 0.10, err
