"""End-to-end tracking on a small synthetic sequence (CPU-friendly sizes)."""

import dataclasses

import numpy as np
import pytest

from dr_slam_tpu.config import (CameraConfig, LineConfig, MapConfig, ORBConfig,
                                SlamConfig)
from dr_slam_tpu.io import synthetic
from dr_slam_tpu.io.metrics import ate_rmse


def small_cfg() -> SlamConfig:
    return SlamConfig(
        camera=CameraConfig(fx=267.7, fy=269.6, cx=160.0, cy=120.0,
                            width=320, height=240, bf=20.0),
        orb=ORBConfig(n_features=400, n_levels=4, max_keypoints=512),
        line=LineConfig(max_lines=32),
        map=MapConfig(max_points=4096, max_lines=512, max_planes=32,
                      max_keyframes=32, vocab_words=512),
    )


@pytest.fixture(scope="module")
def tracked():
    from dr_slam_tpu.slam.system import System

    cfg = small_cfg()
    n = 25
    seq = synthetic.SyntheticSequence(
        synthetic.corridor_trajectory(n, step=0.03), K4=cfg.camera.K4,
        height=240, width=320)
    sysm = System(cfg, enable_loop_closing=False)
    results = []
    for i in range(n):
        gray, depth = seq.render(i)
        results.append(sysm.track_rgbd(gray, depth, i / 30.0))
    return cfg, seq, sysm, results


def test_initialization(tracked):
    _, _, sysm, results = tracked
    assert results[0].is_keyframe
    assert results[0].state.name == "OK"


def test_tracking_mostly_ok(tracked):
    """Transient LOST -> relocalization cycles are acceptable (failure
    detection + recovery is a feature); sustained loss is not."""
    _, _, _, results = tracked
    states = [r.state.name for r in results]
    assert states.count("LOST") <= len(states) // 4, states
    assert states[-1] == "OK" or states[-2] == "OK", states[-5:]


def test_ate_small(tracked):
    _, seq, sysm, results = tracked
    est = np.asarray([np.linalg.inv(T)[:3, 3] for _, T in sysm.tracker.trajectory])
    gt = np.asarray([np.linalg.inv(p)[:3, 3] for p in seq.poses_cw])
    ate = ate_rmse(est, gt)
    # 25 frames, 75 cm total motion; measured ~0.008 m with scale-aware
    # matching (round 4) -- the bound carries a 2.5x margin
    assert ate < 0.02, ate


def test_map_contents(tracked):
    _, _, sysm, _ = tracked
    s = sysm.map_summary()
    assert s["n_keyframes"] >= 1
    assert s["n_points"] > 200
    assert s["n_planes"] >= 3
    assert s["manhattan"]


def test_manhattan_rotation_drift_free(tracked):
    """Rotation error at the last frame stays tiny (the DR in DR-SLAM)."""
    _, seq, sysm, results = tracked
    T_est = np.asarray(sysm.tracker.trajectory[-1][1])
    T_gt = seq.poses_cw[len(results) - 1]
    E = T_est[:3, :3] @ np.linalg.inv(T_gt[:3, :3])
    ang = np.arccos(np.clip((np.trace(E) - 1) / 2, -1, 1))
    assert ang < 0.05, ang  # < ~3 degrees


def test_trajectory_save_and_relocalization(tracked, tmp_path):
    cfg, seq, sysm, _ = tracked
    p = str(tmp_path / "traj.txt")
    sysm.save_trajectory_tum(p)
    assert len(open(p).readlines()) == len(sysm.tracker.trajectory)

    # map save/load roundtrip
    mp = str(tmp_path / "map.npz")
    sysm.save_map(mp)
    from dr_slam_tpu.io.map_io import load_map
    st2 = load_map(mp, cfg)
    assert int(st2.n_kfs) == int(sysm.tracker.map_state.n_kfs)


def test_translation_only_mode_tracks():
    """TranslationWithMotionModel capability (Tracking.cc:2544 /
    Optimizer::TranslationOptimization): stage-1 translation-only solve with
    the Manhattan-predicted rotation, config-gated, must track a short
    corridor segment."""
    import dataclasses

    from dr_slam_tpu.slam.system import System

    cfg0 = small_cfg()
    cfg = cfg0.replace(tracking=dataclasses.replace(
        cfg0.tracking, translation_only_with_manhattan=True))
    seq = synthetic.SyntheticSequence(
        synthetic.corridor_trajectory(12, step=0.03), K4=cfg.camera.K4,
        height=240, width=320)
    sysm = System(cfg, enable_loop_closing=False)
    states = []
    for i in range(12):
        gray, depth = seq.render(i)
        states.append(sysm.track_rgbd(gray, depth, i / 30.0).state.name)
    assert states.count("LOST") == 0, states
    est = np.asarray([np.linalg.inv(np.asarray(T))[:3, 3]
                      for _, T in sysm.tracker.trajectory])
    gt = np.asarray([np.linalg.inv(p)[:3, 3] for p in seq.poses_cw])
    assert ate_rmse(est, gt) < 0.05


def test_ref_kf_rescue_on_motion_model_collapse():
    """TrackReferenceKeyFrame fallback (Tracking.cc:370-375): when the
    velocity model mispredicts wildly, the BoW-word-bucketed reference-KF
    match must recover the frame instead of going LOST."""
    import jax.numpy as jnp

    from dr_slam_tpu.slam.system import System

    cfg = small_cfg()
    assert cfg.tracking.use_ref_kf_anchor  # the fallback under test is live
    n = 14
    seq = synthetic.SyntheticSequence(
        synthetic.corridor_trajectory(n, step=0.03), K4=cfg.camera.K4,
        height=240, width=320)
    sysm = System(cfg, enable_loop_closing=False)
    for i in range(n - 1):
        gray, depth = seq.render(i)
        r = sysm.track_rgbd(gray, depth, i / 30.0)
    # inject a motion-model collapse: a huge bogus velocity makes the
    # constant-velocity prediction project the map far outside the image
    bad = np.eye(4)
    bad[:3, 3] = (5.0, 5.0, 5.0)
    sysm.tracker.velocity = jnp.asarray(bad)
    gray, depth = seq.render(n - 1)
    r = sysm.track_rgbd(gray, depth, (n - 1) / 30.0)
    assert r.state.name == "OK", r
    # and the recovered pose is right: ground truth expressed in the
    # tracker's world frame (= camera frame of the first frame)
    T_gt = seq.poses_cw[n - 1] @ np.linalg.inv(seq.poses_cw[0])
    err = np.linalg.norm(np.asarray(r.T_cw)[:3, 3] - T_gt[:3, 3])
    assert err < 0.05, err
