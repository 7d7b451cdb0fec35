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
