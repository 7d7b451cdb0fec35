"""Unit tests for map bookkeeping: culling must erase observations
(MapPoint::SetBadFlag semantics, reference src/MapPoint.cc) so slot
recycling cannot re-attach old keyframe rows to unrelated new landmarks."""

import jax.numpy as jnp
import numpy as np

from dr_slam_tpu.config import (CameraConfig, MapConfig, ORBConfig,
                                SlamConfig)
from dr_slam_tpu.slam import map_ops
from dr_slam_tpu.slam.state import make_empty_state


def tiny_cfg() -> SlamConfig:
    return SlamConfig(
        camera=CameraConfig(fx=100.0, fy=100.0, cx=32.0, cy=24.0,
                            width=64, height=48, bf=10.0),
        orb=ORBConfig(max_keypoints=16),
        map=MapConfig(max_points=32, max_lines=8, max_planes=4,
                      max_keyframes=4, vocab_words=32),
    )


def state_with_observed_point(cfg):
    """One live point in slot 3, observed by keyframe 0 feature 5."""
    st = make_empty_state(cfg)
    st = st._replace(
        pt_valid=st.pt_valid.at[3].set(True),
        pt_pos=st.pt_pos.at[3].set(jnp.asarray([0.1, 0.2, 2.0])),
        pt_obs_count=st.pt_obs_count.at[3].set(1),
        kf_valid=st.kf_valid.at[0].set(True),
        kf_kp_valid=st.kf_kp_valid.at[0, 5].set(True),
        kf_mp=st.kf_mp.at[0, 5].set(3),
        n_kfs=jnp.asarray(1, jnp.int32),
        n_pts=jnp.asarray(1, jnp.int32),
    )
    return st


def test_cull_erases_keyframe_observations():
    cfg = tiny_cfg()
    st = state_with_observed_point(cfg)
    # make the point culling-eligible: seen a lot, never matched
    st = st._replace(pt_visible=st.pt_visible.at[3].set(20),
                     pt_found=st.pt_found.at[3].set(1))
    out = map_ops.cull_map(st)
    assert not bool(out.pt_valid[3])
    # the observation row must be erased, not left dangling at slot 3
    assert int(out.kf_mp[0, 5]) == -1
    # a recycled slot must start with zero observations
    assert int(out.pt_obs_count[3]) == 0


def test_cull_keeps_live_observations():
    cfg = tiny_cfg()
    st = state_with_observed_point(cfg)
    st = st._replace(pt_visible=st.pt_visible.at[3].set(20),
                     pt_found=st.pt_found.at[3].set(18))  # good ratio
    out = map_ops.cull_map(st)
    assert bool(out.pt_valid[3])
    assert int(out.kf_mp[0, 5]) == 3


def test_match_reference_kf_ignores_culled_points():
    cfg = tiny_cfg()
    st = state_with_observed_point(cfg)
    # give feature 5 a distinctive descriptor and kill the point WITHOUT
    # erasing the observation row (simulates death between cull passes)
    desc = jnp.asarray(np.arange(8), dtype=jnp.uint32)
    st = st._replace(kf_desc=st.kf_desc.at[0, 5].set(desc),
                     pt_valid=st.pt_valid.at[3].set(False))
    kp_desc = jnp.tile(desc[None], (cfg.orb.max_keypoints, 1))
    kp_valid = jnp.ones(cfg.orb.max_keypoints, bool)
    res = map_ops.match_reference_kf(st, jnp.asarray(0), kp_desc, kp_valid)
    assert int(res.n_matches) == 0
    assert int(jnp.max(res.mp_idx)) == -1


def _feats_for_kf(cfg, kp_desc0, kp_valid0=True, line=None):
    """Minimal FrameFeatures: one keypoint (desc kp_desc0, valid depth) and
    optionally one observed line (ep3d camera-frame, 6)."""
    from dr_slam_tpu.frontend.frame import FrameFeatures
    from dr_slam_tpu.ops.lines import LineFeatures
    from dr_slam_tpu.ops.orb import Keypoints
    from dr_slam_tpu.ops.planes import PlaneSegmentation

    K = cfg.orb.max_keypoints
    L = cfg.line.max_lines
    P = cfg.plane.max_planes
    Q = cfg.plane.cloud_points
    z = jnp.zeros
    kp = Keypoints(
        uv=z((K, 2)).at[0].set(jnp.asarray([32.0, 24.0])),
        response=z(K), angle=z(K), octave=z(K, jnp.int32),
        valid=z(K, bool).at[0].set(kp_valid0),
        desc=z((K, 8), jnp.uint32).at[0].set(kp_desc0),
        sigma2=jnp.ones(K))
    lf = LineFeatures(
        seg2d=z((L, 4)), lineq=z((L, 3)).at[:, 2].set(1.0),
        desc=z((L, 8), jnp.uint32),
        dir3d=z((L, 3)).at[:, 0].set(1.0), ep3d=z((L, 6)),
        has3d=z(L, bool), valid=z(L, bool), response=z(L),
        man_dir=z((L, 3)).at[:, 0].set(1.0), man_ok=z(L, bool))
    if line is not None:
        ep3d, dir3d = line
        lf = lf._replace(ep3d=lf.ep3d.at[0].set(jnp.asarray(ep3d)),
                         dir3d=lf.dir3d.at[0].set(jnp.asarray(dir3d)),
                         has3d=lf.has3d.at[0].set(True),
                         valid=lf.valid.at[0].set(True))
    seg = PlaneSegmentation(
        coeffs=z((P, 4)).at[:, 2].set(1.0), valid=z(P, bool),
        n_blocks=z(P, jnp.int32), cloud=z((P, Q, 3)),
        cloud_valid=z((P, Q), bool), mse=z(P),
        block_label=jnp.full((6, 8), -1, jnp.int32))
    return FrameFeatures(
        kp=kp, kp_depth=z(K).at[0].set(2.0),
        kp_ur=jnp.full((K,), -1.0), kp_xyz=z((K, 3)).at[0, 2].set(2.0),
        normals=z((12, 3)), normals_valid=z(12, bool),
        planes=seg, lines=lf)


def _insert_kf(st, cfg, feats, mp_idx0=-1, lm_idx0=-1):
    K = cfg.orb.max_keypoints
    L = cfg.line.max_lines
    P = cfg.plane.max_planes
    mp_idx = jnp.full((K,), -1, jnp.int32).at[0].set(mp_idx0)
    lm_idx = jnp.full((L,), -1, jnp.int32).at[0].set(lm_idx0)
    pm = map_ops.PlaneMatches(
        match_idx=jnp.full((P,), -1, jnp.int32),
        par_idx=jnp.full((P,), -1, jnp.int32),
        ver_idx=jnp.full((P,), -1, jnp.int32),
        obs_world=jnp.zeros((P, 4)).at[:, 2].set(1.0))
    bow = jnp.zeros(cfg.map.vocab_words)
    return map_ops.add_keyframe(st, feats, jnp.eye(4), 0.0, mp_idx, pm,
                                lm_idx, bow, cfg)


def test_distinctive_descriptor_resists_outlier_view():
    """MapPoint::ComputeDistinctiveDescriptors: after several consistent
    observations, ONE outlier view must not hijack the representative
    descriptor (the old behavior overwrote with the latest view)."""
    cfg = tiny_cfg()
    desc_a = jnp.full((8,), 0x0F0F0F0F, jnp.uint32)       # majority
    desc_b = jnp.full((8,), 0xF0F0F0F0, jnp.uint32)       # outlier (128 bits)
    st = make_empty_state(cfg)
    st, _ = _insert_kf(st, cfg, _feats_for_kf(cfg, desc_a))   # creates point
    pt = int(jnp.argmax(st.pt_valid))
    st, _ = _insert_kf(st, cfg, _feats_for_kf(cfg, desc_a), mp_idx0=pt)
    st, _ = _insert_kf(st, cfg, _feats_for_kf(cfg, desc_b), mp_idx0=pt)
    assert np.array_equal(np.asarray(st.pt_desc[pt]), np.asarray(desc_a))


def test_line_refresh_extends_and_averages():
    """MapLine::UpdateAverageDir: a re-observed line's endpoints extend to
    the union extent along the averaged direction."""
    cfg = tiny_cfg()
    st = make_empty_state(cfg)
    d = jnp.zeros((8,), jnp.uint32)
    # create a line along +x from (0,0,2) to (1,0,2)
    st, _ = _insert_kf(st, cfg, _feats_for_kf(
        cfg, d, line=([0, 0, 2, 1, 0, 2], [1, 0, 0])))
    ln = int(jnp.argmax(st.ln_valid))
    # re-observe extended segment (0.5..2.0), flipped direction
    st, _ = _insert_kf(st, cfg, _feats_for_kf(
        cfg, d, line=([2.0, 0, 2, 0.5, 0, 2], [-1, 0, 0])), lm_idx0=ln)
    ep = np.asarray(st.ln_ep[ln])
    xs = sorted([ep[0], ep[3]])
    assert abs(xs[0] - 0.0) < 1e-5 and abs(xs[1] - 2.0) < 1e-5, ep
    # direction stayed sign-consistent with the original
    assert float(st.ln_dir[ln, 0]) > 0.99, np.asarray(st.ln_dir[ln])
    assert int(st.ln_obs_count[ln]) == 2


def test_scale_aware_projection_gates():
    """Scale-invariance band, viewing cone, and predicted-octave gates of
    SearchByProjection (reference ORBmatcher.cc:46 + MapPoint::PredictScale,
    Frame::isInFrustum): a landmark seen from 3x its creation distance,
    from >60 deg off its mean viewing direction, or through a keypoint on a
    far-off pyramid level must not match; a pre-scale-aware landmark
    (dist_max == 0) is exempt from all three."""
    cfg = tiny_cfg()
    st = make_empty_state(cfg)
    st = st._replace(
        pt_pos=st.pt_pos.at[0].set(jnp.asarray([0.0, 0.0, 2.0])),
        pt_normal=st.pt_normal.at[0].set(jnp.asarray([0.0, 0.0, 1.0])),
        pt_desc=st.pt_desc.at[0].set(jnp.arange(8, dtype=jnp.uint32)),
        pt_valid=st.pt_valid.at[0].set(True),
        pt_dist_min=st.pt_dist_min.at[0].set(2.0 / 1.2 ** 7),
        pt_dist_max=st.pt_dist_max.at[0].set(2.0))
    K = cfg.orb.max_keypoints
    kp_uv = jnp.zeros((K, 2)).at[0].set(
        jnp.asarray([cfg.camera.cx, cfg.camera.cy]))
    kp_desc = jnp.zeros((K, 8), jnp.uint32).at[0].set(
        jnp.arange(8, dtype=jnp.uint32))
    kp_valid = jnp.zeros(K, bool).at[0].set(True)
    oct0 = jnp.zeros(K, jnp.int32)

    def match(st_, T, octv):
        m = map_ops.match_points_projection(
            st_, kp_uv, kp_desc, kp_valid, T, cfg.camera.K4, radius=8.0,
            width=cfg.camera.width, height=cfg.camera.height,
            kp_octave=octv, pt_scale=1.2, n_levels=8)
        return int(m.mp_idx[0])

    eye = jnp.eye(4)
    assert match(st, eye, oct0) == 0                       # nominal view
    T_far = jnp.eye(4).at[2, 3].set(4.0)                   # point at 6 m
    assert match(st, T_far, oct0) == -1                    # out of band
    assert match(st, eye, jnp.full(K, 7, jnp.int32)) == -1  # wrong level
    # in-band distance but looking at the point's back side (viewcos = -1):
    # camera at z=4 turned around (R flips y and z)
    Rz = jnp.diag(jnp.asarray([1.0, -1.0, -1.0]))
    T_back = (jnp.eye(4).at[:3, :3].set(Rz)
              .at[:3, 3].set(-Rz @ jnp.asarray([0.0, 0.0, 4.0])))
    assert match(st, T_back, oct0) == -1
    # legacy landmark (no stored band): only frustum gates apply
    legacy = st._replace(pt_dist_max=st.pt_dist_max.at[0].set(0.0))
    assert match(legacy, T_far, oct0) == 0


def test_add_keyframe_sets_invariance_band():
    """Creation writes dist bounds from depth + octave
    (MapPoint::UpdateNormalAndDepth): an octave-0 keypoint at 2 m yields a
    far bound at the creation distance and a near bound a full pyramid span
    below it."""
    cfg = tiny_cfg()
    st = make_empty_state(cfg)
    desc = jnp.arange(8, dtype=jnp.uint32)
    feats = _feats_for_kf(cfg, desc)
    st2, _ = _insert_kf(st, cfg, feats)
    created = np.asarray(st2.pt_valid)
    assert created.any()
    dmax = np.asarray(st2.pt_dist_max)[created]
    dmin = np.asarray(st2.pt_dist_min)[created]
    assert (dmax > 0).all()
    assert np.allclose(dmin, dmax / cfg.orb.scale_factor ** 7, rtol=1e-5)
    # octave-0 feature at depth 2.0 through the principal point: creation
    # distance is exactly 2.0
    assert abs(dmax[0] - 2.0) < 1e-5


def test_match_projection_candidate_compaction_equivalent():
    """The candidate-compaction fast path (gather in-frustum rows before the
    descriptor matmul) must produce EXACTLY the matches of the full-table
    path whenever the visible set fits in max_candidates."""
    from dr_slam_tpu.config import LineConfig
    from dr_slam_tpu.io.synthetic import synthetic_map_state

    cfg = SlamConfig(
        camera=CameraConfig(fx=267.7, fy=269.6, cx=160.0, cy=120.0,
                            width=320, height=240, bf=20.0),
        orb=ORBConfig(n_features=400, n_levels=4, max_keypoints=256),
        line=LineConfig(max_lines=8),
        map=MapConfig(max_points=8192, max_lines=16, max_planes=8,
                      max_keyframes=64, vocab_words=64))
    st, poses = synthetic_map_state(cfg, n_kfs=48, seed=7)
    # give the points real descriptors + creation state so every gate is
    # live. Scale-invariance bounds are keyed to the distance from KF0 (as
    # at creation): the predicted octave for a KF0-posed query is then ~0,
    # consistent with the octave-0 keypoints below -- exactly how creation
    # wires them in add_keyframe.
    rng = np.random.RandomState(0)
    NP = cfg.map.max_points
    d0 = jnp.linalg.norm(
        st.pt_pos @ jnp.asarray(poses[0][:3, :3]).T
        + jnp.asarray(poses[0][:3, 3]), axis=1)
    st = st._replace(
        pt_desc=jnp.asarray(
            rng.randint(0, 2 ** 32, (NP, 8), dtype=np.uint32)),
        pt_angle=jnp.asarray(rng.uniform(0, 2 * np.pi, NP), jnp.float32),
        pt_dist_min=(d0 / 1.2 ** 3).astype(jnp.float32),
        pt_dist_max=d0.astype(jnp.float32),
        pt_normal=st.pt_pos / jnp.maximum(
            jnp.linalg.norm(st.pt_pos, axis=1, keepdims=True), 1e-6))
    # frame keypoints: slot-0 keyframe's stored observations plus noise
    K = cfg.orb.max_keypoints
    kp_uv = st.kf_uv[0] + 0.5
    kp_valid = st.kf_kp_valid[0]
    ids = jnp.clip(st.kf_mp[0], 0)
    kp_desc = st.pt_desc[ids]
    kp_angle = st.pt_angle[ids]
    kp_oct = jnp.zeros((K,), jnp.int32)
    kw = dict(radius=12.0, width=320, height=240, kp_angle=kp_angle,
              kp_octave=kp_oct, pt_scale=1.2, n_levels=4)
    full = map_ops.match_points_projection(
        st, kp_uv, kp_desc, kp_valid, poses[0], cfg.camera.K4,
        max_candidates=NP, **kw)
    compact = map_ops.match_points_projection(
        st, kp_uv, kp_desc, kp_valid, poses[0], cfg.camera.K4,
        max_candidates=2048, **kw)
    n_vis = int(jnp.sum(full.visible))
    assert 0 < n_vis <= 2048, n_vis
    assert int(full.n_matches) > 50
    np.testing.assert_array_equal(np.asarray(full.mp_idx),
                                  np.asarray(compact.mp_idx))
    np.testing.assert_array_equal(np.asarray(full.visible),
                                  np.asarray(compact.visible))
    # the Pallas streaming kernel (ops/match_pallas.py, interpreted on CPU)
    # must be BIT-exact vs the scan path: +/-1 dots are exact integers in
    # f32, gates/merges are the same ops, argmin tie-breaking matches
    pallas = map_ops.match_points_projection(
        st, kp_uv, kp_desc, kp_valid, poses[0], cfg.camera.K4,
        max_candidates=NP, use_pallas=True, **kw)
    np.testing.assert_array_equal(np.asarray(full.mp_idx),
                                  np.asarray(pallas.mp_idx))
    assert int(pallas.n_matches) == int(full.n_matches)
    # and through the compaction path too
    pallas_c = map_ops.match_points_projection(
        st, kp_uv, kp_desc, kp_valid, poses[0], cfg.camera.K4,
        max_candidates=2048, use_pallas=True, **kw)
    np.testing.assert_array_equal(np.asarray(compact.mp_idx),
                                  np.asarray(pallas_c.mp_idx))
