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


def test_device_loop_relocalizes_after_teleport():
    """VERDICT r3 missing #2: a long occlusion / teleport used to strand the
    device loop permanently (it only re-tracked from the last good pose).
    The device-side _reloc_attempt (BoW + Horn + pose opt under lax.cond)
    must recover it: map a corridor, blind the camera for a few frames,
    resume at a pose far from where tracking stopped -- tracking must
    return to OK with the pose re-anchored to the map."""
    cfg = small_cfg()
    n = 36
    poses = synthetic.corridor_trajectory(n)
    seq = synthetic.SyntheticSequence(poses, K4=cfg.camera.K4,
                                      height=240, width=320)
    tr = DeviceLoopTracker(cfg)
    t = 0.0
    for i in range(n):
        g, d = seq.render(i)
        tr.track(g, np.asarray(d), t)
        t += 1 / 30.0
    # occlusion: blank frames (no depth, no texture) -> LOST
    blank = np.zeros((240, 320), np.float32)
    for _ in range(4):
        tr.track(blank, blank, t)
        t += 1 / 30.0
    # teleport: resume viewing a mapped region far (> 0.5 m) from the last
    # good pose -- rung-1 re-tracking cannot bridge this; reloc must
    back = 6
    for i in range(back, back + 6):
        g, d = seq.render(i)
        tr.track(g, np.asarray(d), t)
        t += 1 / 30.0
    f = tr.flush()
    states = f["states"]
    assert "LOST" in states[n:n + 4 + 1], states[n:]   # occlusion detected
    assert states[-1] == "OK", states[n:]              # ...and recovered
    # the recovered pose must be anchored to the MAP, not to the
    # pre-occlusion pose: the final frame re-observes the same physical
    # pose as mapping-phase frame back+5, so its estimate must land on the
    # mapping-phase estimate of that frame (same map, same gauge) rather
    # than ~0.5 m away where tracking was lost
    est_map = np.linalg.inv(f["trajectory"][back + 5][1])[:3, 3]
    est_last = np.linalg.inv(f["trajectory"][-1][1])[:3, 3]
    assert np.linalg.norm(est_last - est_map) < 0.10, (est_last, est_map)


def test_device_loop_online_loop_closing():
    """VERDICT r3 weak #7: the device loop used to defer loop closing
    entirely to flush(). loop_closing_epoch() must detect + correct an
    injected drift ONLINE (between segments, before any flush)."""
    import dataclasses
    import jax

    from dr_slam_tpu.io.drift import drift_T as _drift_T

    cfg0 = small_cfg()
    cfg = cfg0.replace(tracking=dataclasses.replace(
        cfg0.tracking, run_kf_culling=False, motion_search_radius=15.0,
        local_search_radius=6.0, loop_consistency=1))
    poses = synthetic.loop_trajectory(120)
    poses = np.concatenate([poses, poses[:40]], 0)
    seq = synthetic.SyntheticSequence(poses, K4=cfg.camera.K4,
                                      height=240, width=320)
    # discriminative codebook, as the host loop test does
    from dr_slam_tpu.associate import vocabulary as voc
    from dr_slam_tpu.frontend.frame import extract_frame
    descs = []
    for i in range(0, 120, 11):
        g_, d_ = seq.render(i)
        f_ = extract_frame(jnp.asarray(g_, jnp.float32),
                           jnp.asarray(d_, jnp.float32), cfg)
        descs.append(np.asarray(f_.kp.desc)[np.asarray(f_.kp.valid)])
    voc.set_vocabulary(voc.train_vocabulary(
        np.concatenate(descs, 0), n_words=cfg.map.vocab_words, n_iters=6))
    try:
        tr = DeviceLoopTracker(cfg)
        fired_at = None
        for i in range(len(poses)):
            g, d = seq.render(i)
            tr.track(g, np.asarray(d), i / 30.0)
            if i == 70:
                _inject_device_drift(tr)
            # the bounded host-assist epoch, every 12 frames once revisiting
            if i > 120 and i % 12 == 0 and fired_at is None:
                if tr.loop_closing_epoch():
                    fired_at = i
        assert fired_at is not None, \
            "online loop_closing_epoch never fired before flush"
        # the correction must have been applied to the live carry: the
        # post-loop trajectory tail re-anchors near ground truth
        f = tr.flush()
        gt_tail = np.asarray([np.linalg.inv(p)[:3, 3] for p in poses[-10:]])
        est_tail = np.asarray([np.linalg.inv(T)[:3, 3]
                               for _, T in f["trajectory"][-10:]])
        assert ate_rmse(est_tail, gt_tail) < 0.15
    finally:
        voc._trained_signs.clear()


def _inject_device_drift(tr):
    """Progressive gauge drift for the DEVICE loop (same construction as
    dr_slam_tpu.io.drift.inject_progressive_drift, applied to the
    device carry): keyframes twist with insertion seq, points/planes/lines
    move with their newest observer, the live pose rides the full twist."""
    from dr_slam_tpu.io.drift import drift_T as _drift_T

    st = tr.carry.map_state
    kf_valid = np.asarray(st.kf_valid)
    seqs = np.asarray(st.kf_seq)
    max_seq = max(int(seqs[kf_valid].max()), 1)
    kf_pose = np.asarray(st.kf_pose).copy()
    pt = np.asarray(st.pt_pos).copy()
    pt_valid = np.asarray(st.pt_valid)
    kf_mp = np.asarray(st.kf_mp)
    NPts = pt.shape[0]
    pt_newest = np.full(NPts, -1, np.int64)
    pt_newest_seq = np.full(NPts, -1, np.int64)
    for k in np.where(kf_valid)[0]:
        r_ = kf_mp[k][kf_mp[k] >= 0]
        upd = seqs[k] > pt_newest_seq[r_]
        pt_newest[r_[upd]] = k
        pt_newest_seq[r_[upd]] = seqs[k]
    shifts = {}
    for k in np.where(kf_valid)[0]:
        S = _drift_T(seqs[k] / max_seq)
        shifts[int(k)] = S
        kf_pose[k] = kf_pose[k] @ np.linalg.inv(S)
    for p in np.where(pt_valid)[0]:
        S = shifts.get(int(pt_newest[p]))
        if S is not None:
            pt[p] = S[:3, :3] @ pt[p] + S[:3, 3]
    T_drift = np.asarray(tr.carry.T_cw) @ np.linalg.inv(_drift_T(1.0))
    tr.carry = tr.carry._replace(
        map_state=st._replace(kf_pose=jnp.asarray(kf_pose),
                              pt_pos=jnp.asarray(pt)),
        T_cw=jnp.asarray(T_drift))


def test_device_loop_chunked_equivalent(corridor_run):
    """track_chunk (lax.scan of the full state machine, one dispatch per N
    frames) must match per-frame track() semantically: scan is sequential so
    every lax.cond branch (init / keyframe / LOST) stays dynamic per frame.
    NOT bit-exact -- the scan body and the standalone step are different
    compiled programs, so f32 rounding differs (measured: poses agree to
    ~1e-3, inlier counts within ~15) -- so assert trajectory/state
    agreement, not raw-record equality."""
    cfg, poses, tr_ref = corridor_run
    n = len(poses)
    seq = synthetic.SyntheticSequence(poses, K4=cfg.camera.K4,
                                      height=240, width=320)
    gs, ds = [], []
    for i in range(n):
        g, d = seq.render(i)
        gs.append(np.asarray(g))
        ds.append(np.asarray(d))
    gray = np.stack(gs)
    depth = np.stack(ds)
    ts = [i / 30.0 for i in range(n)]

    tr = DeviceLoopTracker(cfg)
    # mixed chunk sizes + a per-frame call, crossing the init and keyframe
    # boundaries at different offsets than any single chunk size would
    tr.track_chunk(gray[:7], depth[:7], ts[:7])
    tr.track(gray[7], depth[7], ts[7])
    tr.track_chunk(gray[8:25], depth[8:25], ts[8:25])
    tr.track_chunk(gray[25:], depth[25:], ts[25:])

    ref = tr_ref.flush()
    got = tr.flush()
    assert got["records"].shape == ref["records"].shape
    assert got["states"] == ref["states"]            # same state machine path
    assert abs(got["n_keyframes"] - ref["n_keyframes"]) <= 1
    # per-frame camera centers agree to millimeters
    c_ref = np.asarray([np.linalg.inv(T)[:3, 3] for _, T in ref["trajectory"]])
    c_got = np.asarray([np.linalg.inv(T)[:3, 3] for _, T in got["trajectory"]])
    assert np.max(np.linalg.norm(c_got - c_ref, axis=1)) < 5e-3
