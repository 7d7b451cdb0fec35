"""Data-parallel multi-sequence tracking (parallel/multi_seq.py): 8
sequences on the virtual 8-device mesh, one per device, full device-loop
semantics (init, tracking, keyframe insertion) -- and bit-exact agreement
with the single-sequence DeviceLoopTracker, because shard_map inserts no
collectives and keeps every lax.cond dynamic per device."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dr_slam_tpu.io import synthetic
from dr_slam_tpu.io.metrics import ate_rmse
from dr_slam_tpu.parallel.multi_seq import MultiSequenceTracker
from dr_slam_tpu.parallel.sharded_ba import make_mesh
from dr_slam_tpu.slam.device_loop import DeviceLoopTracker
from tests.test_tracking_e2e import small_cfg

N_SEQ = 8
N_FRAMES = 16


@pytest.fixture(scope="module")
def multi_run():
    cfg = small_cfg()
    mesh = make_mesh(N_SEQ, axis="seq")
    # 8 distinct worlds: phase-shifted corridor walks (different start
    # offsets), so the sequences genuinely diverge
    seqs = [synthetic.SyntheticSequence(
        synthetic.corridor_trajectory(N_FRAMES + 4 * s, step=0.02)[4 * s:],
        K4=cfg.camera.K4, height=240, width=320) for s in range(N_SEQ)]
    frames = []   # (T, n, H, W) pairs
    for i in range(N_FRAMES):
        gs, ds = zip(*[s.render(i) for s in seqs])
        frames.append((np.stack([np.asarray(g) for g in gs]),
                       np.stack([np.asarray(d) for d in ds])))
    tr = MultiSequenceTracker(cfg, mesh, axis="seq")
    for i, (g, d) in enumerate(frames):
        tr.track(g, d, np.full((N_SEQ,), i / 30.0))
    return cfg, frames, tr.flush()


def test_all_sequences_track(multi_run):
    _, _, flushed = multi_run
    assert len(flushed) == N_SEQ
    for s, f in enumerate(flushed):
        assert f["states"].count("LOST") == 0, (s, f["states"])
        assert f["n_keyframes"] >= 1, s


def test_trajectories_diverge(multi_run):
    """The sequences are different worlds; identical outputs would mean the
    shard axis is broken (every device tracking sequence 0)."""
    _, _, flushed = multi_run
    t0 = np.asarray([T[:3, 3] for _, T in flushed[0]["trajectory"]])
    t5 = np.asarray([T[:3, 3] for _, T in flushed[5]["trajectory"]])
    assert np.abs(t0 - t5).max() > 1e-3


def test_matches_single_device_loop(multi_run):
    """Sequence 2 through the mesh == sequence 2 through DeviceLoopTracker,
    bit-exact (no collectives, same program per device)."""
    cfg, frames, flushed = multi_run
    single = DeviceLoopTracker(cfg)
    for i, (g, d) in enumerate(frames):
        single.track(g[2], d[2], i / 30.0)
    f1 = single.flush()
    np.testing.assert_array_equal(f1["records"], flushed[2]["records"])


def test_ate_per_sequence(multi_run):
    cfg, _, flushed = multi_run
    poses = synthetic.corridor_trajectory(N_FRAMES, step=0.02)
    gt = np.asarray([np.linalg.inv(p)[:3, 3] for p in poses])
    est = np.asarray([np.linalg.inv(T)[:3, 3]
                      for _, T in flushed[0]["trajectory"]])
    assert ate_rmse(est, gt) < 0.05
