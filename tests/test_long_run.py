"""Long-run behavior: bounded keyframe count under culling, zero-LOST
corridor tracking, and triangulated landmarks in depth-hole regions.

Acceptance criteria from the reference capabilities: KeyFrameCulling keeps
long runs from hitting the keyframe capacity wall (LocalMapping.cc:1226);
CreateNewMapPoints creates landmarks where per-frame depth cannot
(LocalMapping.cc:309); Tracking holds OK on a low-parallax corridor
(Tracking.cc:242-724)."""

import dataclasses

import numpy as np
import pytest

from dr_slam_tpu.io import synthetic
from dr_slam_tpu.io.metrics import ate_rmse
from tests.test_tracking_e2e import small_cfg


@pytest.fixture(scope="module")
def corridor_run():
    from dr_slam_tpu.slam.system import System

    cfg0 = small_cfg()
    # kf_ref_ratio near 1: insert on the slightest overlap decay, plus a
    # tiny max_frames so c1a FORCES a keyframe every 4 frames. The
    # reference-faithful defaults correctly insert only a handful of
    # keyframes on this slow corridor (round 4's scale-aware matching made
    # the ratio gate even quieter); this test is about CULLING under
    # pressure, so the policy is deliberately made trigger-happy enough to
    # overflow the 12-slot capacity no matter how clean tracking is.
    cfg = cfg0.replace(
        map=dataclasses.replace(cfg0.map, max_keyframes=12),
        tracking=dataclasses.replace(cfg0.tracking, min_frames=3,
                                     max_frames=4, kf_ref_ratio=0.995))
    n = 70
    seq = synthetic.SyntheticSequence(
        synthetic.corridor_trajectory(n, step=0.02), K4=cfg.camera.K4,
        height=240, width=320)
    sysm = System(cfg, enable_loop_closing=False)
    states = []
    for i in range(n):
        gray, depth = seq.render(i)
        states.append(sysm.track_rgbd(gray, depth, i / 30.0).state.name)
    return cfg, seq, sysm, states


def test_zero_lost_corridor(corridor_run):
    """Round-1 regression: the corridor produced periodic LOST/reloc cycles;
    it must now track clean (VERDICT round-1, item 2)."""
    _, _, _, states = corridor_run
    assert states.count("LOST") == 0, states


def test_corridor_ate_tight(corridor_run):
    _, seq, sysm, _ = corridor_run
    est = np.asarray([np.linalg.inv(T)[:3, 3]
                      for _, T in sysm.tracker.trajectory])
    gt = np.asarray([np.linalg.inv(p)[:3, 3] for p in seq.poses_cw])
    ate = ate_rmse(est, gt)
    assert ate < 0.05, ate


def test_keyframes_bounded_by_culling(corridor_run):
    """More keyframes inserted than capacity, alive count stays under it:
    KeyFrameCulling recycles slots instead of hitting the capacity wall."""
    cfg, _, sysm, _ = corridor_run
    st = sysm.tracker.map_state
    assert int(st.n_kfs) < cfg.map.max_keyframes
    assert int(st.kf_next_seq) > int(st.n_kfs)  # culling actually freed slots
    # alive keyframes' observations stay consistent
    kf_mp = np.asarray(st.kf_mp)
    valid = np.asarray(st.kf_valid)
    assert (kf_mp[~valid] == -1).all()


def test_depth_hole_triangulation():
    """World-anchored depth hole on the far wall + lateral motion: landmarks
    must appear inside the hole (only epipolar triangulation can put them
    there -- depth never existed)."""
    from dr_slam_tpu.slam.system import System

    cfg0 = small_cfg()
    cfg = cfg0.replace(
        tracking=dataclasses.replace(cfg0.tracking, min_frames=4))
    fx, fy, cx, cy = cfg.camera.K4
    poses = []
    for i in range(30):
        T_wc = np.eye(4)
        T_wc[:3, 3] = [1.0 + 0.05 * i, 1.5, 1.0]   # strafe along +x
        poses.append(np.linalg.inv(T_wc))
    poses = np.asarray(poses, np.float32)
    seq = synthetic.SyntheticSequence(poses, K4=cfg.camera.K4,
                                      height=240, width=320)
    HOLE = dict(x0=1.4, x1=2.6, y0=1.0, y1=2.0)

    def mask_depth(depth, T_cw):
        d = np.asarray(depth)
        h, w = d.shape
        uu, vv = np.meshgrid(np.arange(w), np.arange(h))
        T_wc = np.linalg.inv(np.asarray(T_cw))
        pc = np.stack([(uu - cx) / fx * d, (vv - cy) / fy * d, d], -1)
        pw = pc @ T_wc[:3, :3].T + T_wc[:3, 3]
        hole = ((pw[..., 2] > 5.9) & (pw[..., 0] > HOLE["x0"])
                & (pw[..., 0] < HOLE["x1"]) & (pw[..., 1] > HOLE["y0"])
                & (pw[..., 1] < HOLE["y1"]))
        return np.where(hole, 0.0, d).astype(np.float32)

    sysm = System(cfg, enable_loop_closing=False)
    states = []
    for i in range(len(poses)):
        gray, depth = seq.render(i)
        r = sysm.track_rgbd(gray, mask_depth(depth, poses[i]), i / 30.0)
        states.append(r.state.name)
    assert states.count("LOST") == 0, states

    st = sysm.tracker.map_state
    pos = np.asarray(st.pt_pos)[np.asarray(st.pt_valid)]
    Ti = np.linalg.inv(poses[0])   # SLAM world = camera-0 frame -> room
    pos_room = pos @ Ti[:3, :3].T + Ti[:3, 3]
    inhole = ((pos_room[:, 2] > 5.8)
              & (pos_room[:, 0] > HOLE["x0"] + 0.1)
              & (pos_room[:, 0] < HOLE["x1"] - 0.1)
              & (pos_room[:, 1] > HOLE["y0"] + 0.1)
              & (pos_room[:, 1] < HOLE["y1"] - 0.1))
    assert inhole.sum() >= 5, inhole.sum()
