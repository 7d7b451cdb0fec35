"""Pure-localization mode: track against a frozen map without mutating it.

Capability of the reference's ActivateLocalizationMode (System.cc:338) +
mbOnlyTracking branch (Tracking.cc:378-457): build map -> save -> load ->
localize a held-out tail of the sequence with a bounded error, while the
map stays bit-identical."""

import numpy as np
import pytest

from dr_slam_tpu.io import synthetic
from tests.test_tracking_e2e import small_cfg


@pytest.fixture(scope="module")
def built_map(tmp_path_factory):
    from dr_slam_tpu.slam.system import System

    cfg = small_cfg()
    n_map = 18
    seq = synthetic.SyntheticSequence(
        synthetic.corridor_trajectory(30, step=0.03), K4=cfg.camera.K4,
        height=240, width=320)
    sysm = System(cfg, enable_loop_closing=False)
    for i in range(n_map):
        gray, depth = seq.render(i)
        sysm.track_rgbd(gray, depth, i / 30.0)
    path = str(tmp_path_factory.mktemp("locmap") / "map.npz")
    sysm.save_map(path)
    return cfg, seq, path, n_map


def _state_fingerprint(st):
    return {
        "n_kfs": int(st.n_kfs),
        "pt_valid": np.asarray(st.pt_valid).sum(),
        "pt_pos": np.asarray(st.pt_pos).sum(),
        "pt_found": np.asarray(st.pt_found).sum(),
        "kf_pose": np.asarray(st.kf_pose).sum(),
        "pl_valid": np.asarray(st.pl_valid).sum(),
    }


def test_localization_only_frozen_map(built_map):
    from dr_slam_tpu.slam.system import System
    from dr_slam_tpu.slam.tracking import TrackState

    cfg, seq, path, n_map = built_map
    sysm = System(cfg, enable_loop_closing=False)
    sysm.load_map(path)
    sysm.activate_localization_mode()
    assert sysm.tracker.state == TrackState.LOST  # must relocalize first

    fp0 = _state_fingerprint(sysm.tracker.map_state)

    # feed frames the map has seen (reloc anchor) then held-out tail.
    # SLAM world = first camera's frame, so the GT pose in SLAM world is
    # T_cw_gt[i] @ inv(T_cw_gt[0]).
    T0_inv = np.linalg.inv(seq.poses_cw[0])
    errs, states = [], []
    for i in range(n_map - 4, min(len(seq), n_map + 8)):
        gray, depth = seq.render(i)
        res = sysm.track_rgbd(gray, depth, i / 30.0)
        states.append(res.state.name)
        if res.state == TrackState.OK:
            T_gt = seq.poses_cw[i] @ T0_inv
            errs.append(np.linalg.norm(
                np.linalg.inv(res.T_cw)[:3, 3] - np.linalg.inv(T_gt)[:3, 3]))

    assert "OK" in states, states                    # relocalized into the map
    assert states[-1] == "OK" or states[-2] == "OK", states
    assert np.median(errs) < 0.10, (np.median(errs), states)

    # the map is bit-identical: no keyframes, points, stats or poses moved
    fp1 = _state_fingerprint(sysm.tracker.map_state)
    assert fp0 == fp1, (fp0, fp1)
    assert not any(r for r in states if r == "NOT_INITIALIZED")


def test_localization_only_requires_map():
    from dr_slam_tpu.slam.system import System

    cfg = small_cfg()
    sysm = System(cfg, enable_loop_closing=False)
    sysm.activate_localization_mode()
    seq = synthetic.SyntheticSequence(
        synthetic.corridor_trajectory(1), K4=cfg.camera.K4,
        height=240, width=320)
    gray, depth = seq.render(0)
    with pytest.raises(RuntimeError):
        sysm.track_rgbd(gray, depth, 0.0)
