import os

import jax.numpy as jnp
import numpy as np

from dr_slam_tpu.config import load_config, tum_freiburg3
from dr_slam_tpu.geometry import se3
from dr_slam_tpu.io import metrics, synthetic, trajectory


def test_config_defaults_and_yaml(tmp_path):
    cfg = tum_freiburg3()
    assert cfg.camera.fx == 535.4
    assert cfg.orb.n_features == 1000
    yaml_text = "%YAML:1.0\nCamera.fx: 500.0\nORBextractor.nLevels: 4\nPlane.AngleInfo: 1.0\n"
    p = tmp_path / "cfg.yaml"
    p.write_text(yaml_text)
    cfg2 = load_config(str(p))
    assert cfg2.camera.fx == 500.0
    assert cfg2.orb.n_levels == 4
    assert cfg2.plane.angle_info == 1.0
    # untouched fields keep defaults
    assert cfg2.camera.fy == 539.2


def test_dataset_presets_cover_reference_yamls():
    """One preset per reference Examples/RGB-D/*.yaml camera model."""
    from dr_slam_tpu import config as C

    presets = {
        "TUM1": C.tum_freiburg1(), "TUM2": C.tum_freiburg2(),
        "TUM3": C.tum_freiburg3(), "ICL": C.icl_nuim(),
        "TAMU": C.tamu(), "Realsense": C.realsense(),
        "TartanAir": C.tartanair(),
    }
    for name, cfg in presets.items():
        assert cfg.camera.width == 640 and cfg.camera.height == 480, name
        assert cfg.camera.fps == 30.0, name
        assert cfg.camera.depth_factor > 0, name
    # spot values against the reference YAMLs
    assert presets["TUM1"].camera.k1 == 0.262383         # TUM1.yaml
    assert presets["TUM2"].camera.depth_factor == 5208.0  # TUM2.yaml
    assert presets["Realsense"].camera.depth_factor == 1000.0
    assert presets["TartanAir"].camera.fx == 320.0


def test_synthetic_render_depth_consistency():
    seq = synthetic.SyntheticSequence(synthetic.corridor_trajectory(3))
    gray, depth = seq.render(0)
    gray, depth = np.asarray(gray), np.asarray(depth)
    assert gray.shape == (480, 640) and depth.shape == (480, 640)
    assert (depth > 0).mean() > 0.99          # camera inside a closed room
    assert depth.max() < 10.0
    assert gray.std() > 20.0                   # textured
    # Center pixel backprojects onto the far wall (z = zmax plane).
    T_cw = jnp.asarray(seq.poses_cw[0])
    K4 = jnp.asarray(seq.K4)
    uv = jnp.array([320.0, 240.0])
    pc = se3.backproject(K4, uv, jnp.asarray(depth[240, 320]))
    pw = se3.transform_points(se3.inv_T(T_cw), pc[None])[0]
    room = seq.room
    tol = 2e-2
    on_wall = (
        abs(float(pw[0])) < tol or abs(float(pw[0]) - room.xmax) < tol
        or abs(float(pw[1])) < tol or abs(float(pw[1]) - room.ymax) < tol
        or abs(float(pw[2])) < tol or abs(float(pw[2]) - room.zmax) < tol
    )
    assert on_wall, np.asarray(pw)


def test_synthetic_reprojection_across_frames():
    """Backproject from frame 0, reproject into frame 5: depth there agrees."""
    seq = synthetic.SyntheticSequence(synthetic.corridor_trajectory(6))
    g0, d0 = seq.render(0)
    g5, d5 = seq.render(5)
    K4 = jnp.asarray(seq.K4)
    T0 = jnp.asarray(seq.poses_cw[0])
    T5 = jnp.asarray(seq.poses_cw[5])
    vs, us = np.mgrid[100:400:50, 100:600:50]
    uv = jnp.asarray(np.stack([us.ravel(), vs.ravel()], -1), dtype=jnp.float32)
    z = jnp.asarray(np.asarray(d0)[vs.ravel(), us.ravel()])
    pc0 = se3.backproject(K4, uv, z)
    pw = se3.transform_points(se3.inv_T(T0), pc0)
    pc5 = se3.transform_points(T5, pw)
    uv5 = se3.project(K4, pc5)
    uv5n = np.asarray(uv5)
    z5 = np.asarray(pc5[:, 2])
    ok = 0
    total = 0
    d5n = np.asarray(d5)
    for (u, v), zz in zip(uv5n, z5):
        if 0 <= int(v) < 480 and 0 <= int(u) < 640 and zz > 0.1:
            total += 1
            if abs(d5n[int(round(v)), int(round(u))] - zz) < 0.05:
                ok += 1
    assert total > 20
    assert ok / total > 0.9   # some occlusion boundary mismatch allowed


def test_trajectory_roundtrip(tmp_path):
    poses = synthetic.corridor_trajectory(10)
    ts = np.arange(10) / 30.0
    path = str(tmp_path / "traj.txt")
    trajectory.save_trajectory_tum(path, ts, poses)
    ts2, Twc = trajectory.load_trajectory_tum(path)
    np.testing.assert_allclose(ts2, ts, atol=1e-5)
    for i in range(10):
        T_wc_true = np.linalg.inv(poses[i])
        np.testing.assert_allclose(Twc[i], T_wc_true, atol=1e-4)


def test_ate_rmse_zero_and_offset():
    gt = np.random.RandomState(0).randn(50, 3)
    assert metrics.ate_rmse(gt, gt) < 1e-9
    # Rigidly transformed trajectory aligns to ~0 error.
    R = np.asarray(se3.so3_exp(jnp.array([0.1, 0.2, 0.3])))
    est = gt @ R.T + np.array([1.0, -2.0, 0.5])
    assert metrics.ate_rmse(est, gt) < 1e-6
    # Noise shows up.
    est2 = gt + 0.1 * np.random.RandomState(1).randn(50, 3)
    assert 0.05 < metrics.ate_rmse(est2, gt) < 0.2


def test_rpe():
    poses = synthetic.corridor_trajectory(20)
    Twc = np.asarray([np.linalg.inv(p) for p in poses])
    t_err, r_err = metrics.rpe(Twc, Twc)
    assert t_err < 1e-9 and r_err < 1e-6


def test_metrics_logger(tmp_path):
    p = str(tmp_path / "m.jsonl")
    log = metrics.MetricsLogger(p)
    log.log("frame", idx=3, inliers=120, state="OK")
    log.close()
    import json
    rec = json.loads(open(p).read().strip())
    assert rec["event"] == "frame" and rec["inliers"] == 120
