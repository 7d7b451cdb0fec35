"""Device-resident loop (slam/device_loop.py): the zero-readback tracking
step must initialize, track, insert keyframes and stay near the host
pipeline's accuracy -- all without the host state machine.

The loop exists because one host readback permanently degrades the tunneled
TPU runtime (round-3 finding); these tests validate SEMANTICS on CPU, where
readbacks are harmless -- the perf claim is bench.py's job."""

import numpy as np
import jax.numpy as jnp
import pytest

from dr_slam_tpu.io import synthetic
from dr_slam_tpu.io.metrics import ate_rmse
from dr_slam_tpu.slam.device_loop import DeviceLoopTracker, REC_SIZE
from tests.test_tracking_e2e import small_cfg


@pytest.fixture(scope="module")
def corridor_run():
    cfg = small_cfg()
    n = 40
    poses = synthetic.corridor_trajectory(n)
    seq = synthetic.SyntheticSequence(poses, K4=cfg.camera.K4,
                                      height=240, width=320)
    tr = DeviceLoopTracker(cfg)
    for i in range(n):
        g, d = seq.render(i)
        tr.track(g, np.asarray(d), i / 30.0)
    return cfg, poses, tr


def test_device_loop_tracks(corridor_run):
    _, poses, tr = corridor_run
    f = tr.flush()
    assert f["states"][0] == "OK"                 # device-side init fired
    assert f["states"].count("LOST") == 0, f["states"]
    assert f["n_keyframes"] >= 3                  # device-side KF insertion
    gt = np.asarray([np.linalg.inv(p)[:3, 3] for p in poses])
    est = np.asarray([np.linalg.inv(T)[:3, 3] for _, T in f["trajectory"]])
    assert ate_rmse(est, gt) < 0.05


def test_device_loop_records_wellformed(corridor_run):
    _, _, tr = corridor_run
    recs = tr.flush()["records"]
    assert recs.shape[1] == REC_SIZE
    assert np.all(np.isfinite(recs))
    # keyframe flags: at least init + periodic insertions
    assert recs[:, 19].sum() >= 3
    # ref keyframe slots are valid rows of the map
    kf_valid = np.asarray(tr.map_state.kf_valid)
    refs = recs[:, 20].astype(int)
    assert np.all(kf_valid[refs])


def test_device_loop_corrected_trajectory(corridor_run):
    """corrected_trajectory recomposes frames from their ref keyframe's
    CURRENT pose; with no post-run correction it must match the raw
    trajectory's accuracy, and a synthetic keyframe shift must propagate."""
    _, poses, tr = corridor_run
    gt = np.asarray([np.linalg.inv(p)[:3, 3] for p in poses])
    corr = tr.corrected_trajectory()
    est = np.asarray([np.linalg.inv(T)[:3, 3] for _, T in corr])
    assert ate_rmse(est, gt) < 0.05
    # shift every keyframe by +1 m in x: every recomposed frame follows
    st = tr.carry.map_state
    S = np.eye(4, dtype=np.float32)
    S[0, 3] = 1.0
    shifted = np.asarray(st.kf_pose) @ np.linalg.inv(S)[None]
    tr.carry = tr.carry._replace(
        map_state=st._replace(kf_pose=jnp.asarray(shifted)))
    corr2 = tr.corrected_trajectory()
    d = np.asarray([np.linalg.inv(T2)[:3, 3] - np.linalg.inv(T1)[:3, 3]
                    for (_, T1), (_, T2) in zip(corr, corr2)])
    assert np.allclose(np.linalg.norm(d, axis=1), 1.0, atol=1e-3)
    # restore for other tests (module fixture)
    tr.carry = tr.carry._replace(map_state=st)


def test_device_loop_localization_only():
    """Frozen-map mode: the map state is bit-identical before and after."""
    cfg = small_cfg()
    n = 16
    poses = synthetic.corridor_trajectory(n)
    seq = synthetic.SyntheticSequence(poses, K4=cfg.camera.K4,
                                      height=240, width=320)
    build = DeviceLoopTracker(cfg)
    for i in range(n):
        g, d = seq.render(i)
        build.track(g, np.asarray(d), i / 30.0)
    st0 = build.map_state
    # snapshot BEFORE tracking: device_track_step donates the carry, so
    # st0's device buffers are consumed by the first loc.track call
    import jax
    st0_np = [np.asarray(x) for x in jax.tree_util.tree_leaves(st0)]
    loc = DeviceLoopTracker(cfg, map_state=st0, localization_only=True)
    for i in range(4, 12):
        g, d = seq.render(i)
        loc.track(g, np.asarray(d), i / 30.0)
    f = loc.flush()
    assert f["states"].count("LOST") == 0, f["states"]
    for a, b in zip(st0_np, jax.tree_util.tree_leaves(loc.map_state)):
        np.testing.assert_array_equal(a, np.asarray(b))
    gt = np.asarray([np.linalg.inv(p)[:3, 3] for p in poses[4:12]])
    est = np.asarray([np.linalg.inv(T)[:3, 3] for _, T in f["trajectory"]])
    assert ate_rmse(est, gt) < 0.05
