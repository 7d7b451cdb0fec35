"""LocalMapping completion: landmark fuse, keyframe culling, triangulation.

Reference capabilities: SearchInNeighbors/ORBmatcher::Fuse
(LocalMapping.cc:1039, ORBmatcher.cc:829), KeyFrameCulling
(LocalMapping.cc:1226, >=90% redundancy), CreateNewMapPoints epipolar
triangulation (LocalMapping.cc:309)."""

import jax.numpy as jnp
import numpy as np

from dr_slam_tpu.slam import map_ops
from dr_slam_tpu.slam.state import make_empty_state
from tests.test_map_ops import tiny_cfg


def _desc(seed: int):
    return jnp.asarray(np.random.RandomState(seed).randint(
        0, 2 ** 32, size=8, dtype=np.uint64).astype(np.uint32))


def _add_kf(st, slot, seq):
    return st._replace(
        kf_valid=st.kf_valid.at[slot].set(True),
        kf_seq=st.kf_seq.at[slot].set(seq),
        kf_next_seq=jnp.maximum(st.kf_next_seq, seq + 1),
        n_kfs=jnp.asarray(int(st.n_kfs) + 1, jnp.int32))


# --------------------------------------------------------------------------
# fuse
# --------------------------------------------------------------------------

def test_fuse_merges_duplicate_new_point():
    cfg = tiny_cfg()
    st = make_empty_state(cfg)
    d = _desc(0)
    st = _add_kf(st, 0, 0)
    st = _add_kf(st, 1, 1)
    # old point 2 (created by KF0, observed by its feature 4) and a new
    # duplicate point 7 created by KF1 (2 cm away, same descriptor)
    st = st._replace(
        pt_valid=st.pt_valid.at[2].set(True).at[7].set(True),
        pt_pos=st.pt_pos.at[2].set(jnp.asarray([1.0, 0.0, 3.0]))
                        .at[7].set(jnp.asarray([1.02, 0.0, 3.0])),
        pt_desc=st.pt_desc.at[2].set(d).at[7].set(d),
        pt_first_kf=st.pt_first_kf.at[2].set(0).at[7].set(1),
        pt_visible=st.pt_visible.at[2].set(5).at[7].set(1),
        pt_found=st.pt_found.at[2].set(4).at[7].set(1),
        kf_kp_valid=st.kf_kp_valid.at[0, 4].set(True).at[1, 9].set(True),
        kf_mp=st.kf_mp.at[0, 4].set(2).at[1, 9].set(7),
    )
    out = map_ops.fuse_new_points(st, jnp.asarray(1))
    assert not bool(out.pt_valid[7])          # duplicate died
    assert bool(out.pt_valid[2])              # winner lives
    assert int(out.kf_mp[1, 9]) == 2          # observation rewritten
    assert int(out.pt_obs_count[2]) == 2      # now observed by both KFs
    assert int(out.pt_visible[2]) == 6        # stats inherited (5 + 1)
    assert int(out.pt_found[2]) == 5


def test_fuse_keeps_distinct_points():
    cfg = tiny_cfg()
    st = make_empty_state(cfg)
    st = _add_kf(st, 0, 0)
    st = _add_kf(st, 1, 1)
    st = st._replace(
        pt_valid=st.pt_valid.at[2].set(True).at[7].set(True),
        pt_pos=st.pt_pos.at[2].set(jnp.asarray([1.0, 0.0, 3.0]))
                        .at[7].set(jnp.asarray([1.5, 0.0, 3.0])),  # 0.5 m away
        pt_desc=st.pt_desc.at[2].set(_desc(0)).at[7].set(_desc(0)),
        pt_first_kf=st.pt_first_kf.at[2].set(0).at[7].set(1),
        kf_kp_valid=st.kf_kp_valid.at[0, 4].set(True).at[1, 9].set(True),
        kf_mp=st.kf_mp.at[0, 4].set(2).at[1, 9].set(7),
    )
    out = map_ops.fuse_new_points(st, jnp.asarray(1))
    assert bool(out.pt_valid[7]) and bool(out.pt_valid[2])
    assert int(out.kf_mp[1, 9]) == 7


def test_dedup_kf_rows():
    row = jnp.asarray([[3, -1, 3, 5, 5, 3, -1, 2]], jnp.int32)
    out = map_ops._dedup_kf_rows(row)
    assert out.tolist() == [[3, -1, -1, 5, -1, -1, -1, 2]]


# --------------------------------------------------------------------------
# keyframe culling
# --------------------------------------------------------------------------

def _redundant_state(cfg, n_kf=4, n_pts_shared=12):
    """All keyframes observe the same n_pts_shared points -> every
    middle keyframe is fully redundant."""
    st = make_empty_state(cfg)
    for k in range(n_kf):
        st = _add_kf(st, k, k)
    ids = jnp.arange(n_pts_shared, dtype=jnp.int32)
    st = st._replace(
        pt_valid=st.pt_valid.at[ids].set(True),
        pt_obs_count=st.pt_obs_count.at[ids].set(n_kf),
        pt_first_kf=st.pt_first_kf.at[ids].set(0))
    for k in range(n_kf):
        st = st._replace(
            kf_kp_valid=st.kf_kp_valid.at[k, :n_pts_shared].set(True),
            kf_mp=st.kf_mp.at[k, :n_pts_shared].set(ids))
    return st


def test_kf_culling_removes_redundant():
    cfg = tiny_cfg()
    st = _redundant_state(cfg, n_kf=4, n_pts_shared=12)
    out = map_ops.cull_one_keyframe(st, min_obs=10, keep_recent=2)
    assert int(out.n_kfs) == 3
    # the culled one is neither the first (seq 0) nor one of the 2 newest
    valid = np.asarray(out.kf_valid)
    assert valid[0] and valid[2] and valid[3] and not valid[1]
    # its observations were erased; shared points survive via the others
    assert int(jnp.max(out.kf_mp[1])) == -1
    assert int(out.pt_obs_count[0]) == 3
    assert bool(out.pt_valid[0])
    # one cull per call: a second call must not cascade below the protected set
    out2 = map_ops.cull_one_keyframe(out, min_obs=10, keep_recent=2)
    assert int(out2.n_kfs) == 3


def test_kf_culling_protects_first_and_recent():
    cfg = tiny_cfg()
    st = _redundant_state(cfg, n_kf=3, n_pts_shared=12)  # 0 + 2 recent
    out = map_ops.cull_one_keyframe(st, min_obs=10, keep_recent=2)
    assert int(out.n_kfs) == 3  # nothing cullable


def test_kf_culling_keeps_unique_observers():
    cfg = tiny_cfg()
    st = _redundant_state(cfg, n_kf=4, n_pts_shared=12)
    # give KF1 four unique points (25% of its obs) -> below the 90% threshold
    uniq = jnp.arange(12, 16, dtype=jnp.int32)
    st = st._replace(
        pt_valid=st.pt_valid.at[uniq].set(True),
        pt_obs_count=st.pt_obs_count.at[uniq].set(1),
        kf_kp_valid=st.kf_kp_valid.at[1, 12:16].set(True),
        kf_mp=st.kf_mp.at[1, 12:16].set(uniq))
    out = map_ops.cull_one_keyframe(st, min_obs=10, keep_recent=2)
    assert bool(out.kf_valid[1])
    assert int(out.n_kfs) == 4


# --------------------------------------------------------------------------
# triangulation
# --------------------------------------------------------------------------

def test_triangulate_depthless_features():
    cfg = tiny_cfg()
    K4 = cfg.camera.K4
    fx, fy, cx, cy = K4
    st = make_empty_state(cfg)
    st = _add_kf(st, 0, 0)
    st = _add_kf(st, 1, 1)
    # two cameras 0.4 m apart, both looking at +z
    T0 = jnp.eye(4)
    T1 = jnp.eye(4).at[0, 3].set(-0.4)   # camera 1 at x=+0.4 in world
    rng = np.random.RandomState(3)
    X = rng.uniform([-0.5, -0.4, 2.0], [0.5, 0.4, 4.0], (6, 3)).astype(
        np.float32)

    def proj(T, X):
        Xc = (np.asarray(T[:3, :3]) @ X.T).T + np.asarray(T[:3, 3])
        return np.stack([fx * Xc[:, 0] / Xc[:, 2] + cx,
                         fy * Xc[:, 1] / Xc[:, 2] + cy], -1)

    uv0 = proj(T0, X)
    uv1 = proj(T1, X)
    descs = jnp.stack([_desc(i) for i in range(6)])
    st = st._replace(
        kf_pose=st.kf_pose.at[0].set(T0).at[1].set(T1),
        kf_uv=st.kf_uv.at[0, :6].set(uv0).at[1, :6].set(uv1),
        kf_desc=st.kf_desc.at[0, :6].set(descs).at[1, :6].set(descs),
        kf_kp_valid=st.kf_kp_valid.at[0, :6].set(True).at[1, :6].set(True),
        kf_ur=jnp.full_like(st.kf_ur, -1.0),   # NO depth anywhere
    )
    out = map_ops.triangulate_with_kf(st, jnp.asarray(1), jnp.asarray(0),
                                      K4)
    created = np.asarray(out.pt_valid).sum()
    assert created == 6, created
    pos = np.asarray(out.pt_pos[np.asarray(out.pt_valid)])
    # each created point matches one ground-truth point
    d = np.linalg.norm(pos[:, None] - X[None], axis=-1).min(1)
    assert d.max() < 1e-2, d
    # observations registered in both keyframes
    assert (np.asarray(out.kf_mp[0, :6]) >= 0).all()
    assert (np.asarray(out.kf_mp[1, :6]) >= 0).all()
    assert int(out.pt_obs_count[np.asarray(out.kf_mp[0, 0])]) == 2


def test_triangulate_rejects_low_parallax():
    cfg = tiny_cfg()
    K4 = cfg.camera.K4
    st = make_empty_state(cfg)
    st = _add_kf(st, 0, 0)
    st = _add_kf(st, 1, 1)
    # identical poses: zero baseline -> parallax gate must reject everything
    uv = jnp.asarray([[32.0, 24.0]] * 4)
    descs = jnp.stack([_desc(i) for i in range(4)])
    st = st._replace(
        kf_uv=st.kf_uv.at[0, :4].set(uv).at[1, :4].set(uv),
        kf_desc=st.kf_desc.at[0, :4].set(descs).at[1, :4].set(descs),
        kf_kp_valid=st.kf_kp_valid.at[0, :4].set(True).at[1, :4].set(True),
        kf_ur=jnp.full_like(st.kf_ur, -1.0),
    )
    out = map_ops.triangulate_with_kf(st, jnp.asarray(1), jnp.asarray(0), K4)
    assert int(np.asarray(out.pt_valid).sum()) == 0


# --------------------------------------------------------------------------
# map-line fusion (LSDmatcher::Fuse role inside the culling pass)
# --------------------------------------------------------------------------

def test_cull_fuses_duplicate_lines():
    cfg = tiny_cfg()
    st = make_empty_state(cfg)
    d = _desc(2)
    ep = jnp.asarray([0.0, 0.0, 2.0, 1.0, 0.0, 2.0])
    ep_dup = ep + 0.03          # 3 cm off, same direction
    ep_far = jnp.asarray([0.0, 1.0, 2.0, 1.0, 1.0, 2.0])  # parallel, 1 m away
    dirv = jnp.asarray([1.0, 0.0, 0.0])
    st = st._replace(
        ln_valid=st.ln_valid.at[0].set(True).at[1].set(True).at[2].set(True),
        ln_ep=st.ln_ep.at[0].set(ep).at[1].set(ep_dup).at[2].set(ep_far),
        ln_dir=st.ln_dir.at[0].set(dirv).at[1].set(dirv).at[2].set(dirv),
        ln_desc=st.ln_desc.at[0].set(d).at[1].set(d).at[2].set(d),
        ln_obs_count=st.ln_obs_count.at[0].set(5).at[1].set(2).at[2].set(3),
        ln_found=st.ln_found.at[0].set(5).at[1].set(2).at[2].set(3),
        ln_visible=st.ln_visible.at[jnp.asarray([0, 1, 2])].set(3),
    )
    out = map_ops.cull_map(st)
    assert bool(out.ln_valid[0])            # better-observed winner lives
    assert not bool(out.ln_valid[1])        # duplicate fused away
    assert bool(out.ln_valid[2])            # distinct parallel line lives
    assert int(out.ln_obs_count[0]) == 7    # inherited the loser's count
    assert int(out.n_lns) == 2
