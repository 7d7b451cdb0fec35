"""Hermetic TUM-format end-to-end test: the reference's primary artifact is
its dataset runner (Examples/RGB-D/main.cc:59-109 reads an associate.txt of
PNG pairs, tracks every frame, saves a TUM trajectory scored by evo_ape,
run.sh:2-3). Here a synthetic sequence is EXPORTED to that exact on-disk
format (8-bit gray PNGs + 16-bit depth PNGs in DepthMapFactor units), then
scripts/run_tum.py drives TUMDataset -> System over it and the saved
CameraTrajectory.txt is scored against the written groundtruth.txt -- so the
full PNG -> uint16 -> 1/DepthMapFactor ingestion path (src/Tracking.cc:223)
is exercised with zero external data."""

import importlib.util
import json
import os
import sys

import numpy as np
import pytest

from dr_slam_tpu.io import synthetic
from dr_slam_tpu.io.metrics import ate_rmse
from dr_slam_tpu.io.tum import TUMDataset, export_tum_sequence, load_groundtruth

N_FRAMES = 20
DEPTH_FACTOR = 5000.0


@pytest.fixture(scope="module")
def tum_dir(tmp_path_factory):
    from tests.test_tracking_e2e import small_cfg
    cfg = small_cfg()
    poses = synthetic.corridor_trajectory(N_FRAMES)
    seq = synthetic.SyntheticSequence(poses, K4=cfg.camera.K4,
                                      height=240, width=320)
    out = str(tmp_path_factory.mktemp("tum_seq"))
    export_tum_sequence(out, poses, lambda i: seq.render(i),
                        depth_factor=DEPTH_FACTOR)
    return out, cfg, poses, seq


@pytest.fixture(scope="module")
def small_yaml(tum_dir, tmp_path_factory):
    _, cfg, _, _ = tum_dir
    cam = cfg.camera
    path = str(tmp_path_factory.mktemp("cfg") / "small.yaml")
    with open(path, "w") as f:
        f.write("%YAML:1.0\n")
        for k, v in {
                "Camera.fx": cam.fx, "Camera.fy": cam.fy,
                "Camera.cx": cam.cx, "Camera.cy": cam.cy,
                "Camera.width": cam.width, "Camera.height": cam.height,
                "Camera.bf": cam.bf, "DepthMapFactor": DEPTH_FACTOR,
                "ORBextractor.nFeatures": cfg.orb.n_features,
                "ORBextractor.nLevels": cfg.orb.n_levels,
                "ORBextractor.maxKeypoints": cfg.orb.max_keypoints,
                "Line.MaxLines": cfg.line.max_lines,
                "Map.MaxPoints": cfg.map.max_points,
                "Map.MaxLines": cfg.map.max_lines,
                "Map.MaxPlanes": cfg.map.max_planes,
                "Map.MaxKeyFrames": cfg.map.max_keyframes,
                "Map.VocabWords": cfg.map.vocab_words,
        }.items():
            f.write(f"{k}: {v}\n")
    return path


def _run_tum_main(argv):
    spec = importlib.util.spec_from_file_location(
        "run_tum", os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "scripts", "run_tum.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    old = sys.argv
    sys.argv = ["run_tum.py"] + argv
    try:
        mod.main()
    finally:
        sys.argv = old


def test_dataset_roundtrip(tum_dir):
    """PNG pairs decode back to the rendered frames: gray within quantization
    noise, depth within half a sensor unit of the true meters."""
    out, cfg, poses, seq = tum_dir
    ds = TUMDataset(out, depth_factor=DEPTH_FACTOR)
    assert len(ds) == N_FRAMES
    fr = ds[3]
    g, d = seq.render(3)
    assert fr.gray.dtype == np.float32 and fr.gray.shape == (240, 320)
    assert np.max(np.abs(fr.gray - np.clip(np.asarray(g), 0, 255))) <= 1.0
    mask = np.asarray(d) * DEPTH_FACTOR < 65534
    err = np.abs(fr.depth - np.asarray(d))[mask]
    assert err.max() <= 0.5 / DEPTH_FACTOR + 1e-6
    # groundtruth parses and matches the synthetic camera centers
    ts_gt, poses_gt = load_groundtruth(os.path.join(out, "groundtruth.txt"))
    assert len(ts_gt) == N_FRAMES
    cw = np.linalg.inv(poses[3])[:3, 3]
    assert np.allclose(poses_gt[3, :3], cw, atol=1e-4)


def test_run_tum_end_to_end(tum_dir, small_yaml, tmp_path, capsys):
    """The dataset runner over the fixture: tracks, saves TUM trajectories,
    and reports an ATE against groundtruth within the tracked-test bound."""
    out_dir = str(tmp_path / "out")
    run_dir, cfg, poses, _ = tum_dir
    _run_tum_main([run_dir, "--config", small_yaml, "--out", out_dir])
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["frames"] == N_FRAMES
    assert "ate_rmse_m" in summary, summary
    assert summary["ate_rmse_m"] < 0.05, summary
    # the saved trajectory is evo-consumable TUM format and scores the same
    from dr_slam_tpu.io.trajectory import load_trajectory_tum
    traj_path = os.path.join(out_dir, "CameraTrajectory.txt")
    assert os.path.exists(traj_path)
    ts, T_wc = load_trajectory_tum(traj_path)
    assert len(ts) == N_FRAMES
    ts_gt, poses_gt = load_groundtruth(os.path.join(run_dir,
                                                    "groundtruth.txt"))
    gt = np.asarray([poses_gt[int(np.argmin(np.abs(ts_gt - t))), :3]
                     for t in ts])
    est = np.asarray([T[:3, 3] for T in T_wc])
    assert ate_rmse(est, gt) < 0.05
    assert os.path.exists(os.path.join(out_dir, "KeyFrameTrajectory.txt"))


def test_run_tum_native_loader(tum_dir, small_yaml, tmp_path, capsys):
    """Same run through the C++ prefetching PNG decoder
    (native/frame_loader.cpp via ctypes); skips if the toolchain can't
    build the shared library."""
    from dr_slam_tpu.io.native_loader import build_native
    if not build_native():
        pytest.skip("native loader not buildable in this environment")
    out_dir = str(tmp_path / "out_native")
    run_dir = tum_dir[0]
    _run_tum_main([run_dir, "--config", small_yaml, "--out", out_dir,
                   "--native-loader"])
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["frames"] == N_FRAMES
    assert summary["ate_rmse_m"] < 0.05, summary
