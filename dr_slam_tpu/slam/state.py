"""Functional map state: fixed-capacity arrays + validity masks.

The reference map is a pointer graph guarded by mutexes (src/Map.cc,
include/Map.h:125-131: sets of KeyFrame*/MapPoint*/MapLine*/MapPlane* with
per-object observation maps, plus the global mMutexMapUpdate held across the
whole Track(), src/Tracking.cc:255). The TPU-native design is an immutable
pytree of capacity-bounded device arrays advanced by jitted steps from a
single-writer host orchestrator -- no locks, no pointers:

- map points    : SoA arrays, slot-indexed; `pt_valid` is the liveness mask
- keyframes     : per-KF feature tables; `kf_mp[k, j]` = map-point id seen by
                  feature j of keyframe k (-1 if none) -- this table IS the
                  observation graph (covisibility is one gather+reduce away)
- planes        : world coefficients + bounded sample clouds (the role of the
                  reference's voxel-downsampled per-plane clouds,
                  MapPlane::UpdateCoefficientsAndPoints)
- lines         : world endpoint pairs + LBD-style descriptors
- Manhattan     : R_wm, the Manhattan axes in world coordinates
                  (Map::SetRmc equivalent, src/Map.cc:124-146)

Counters (n_pts, n_kfs, ...) are device scalars so allocation happens inside
jit; the host reads them back only for control-flow decisions."""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from dr_slam_tpu.config import SlamConfig


class MapState(NamedTuple):
    # --- map points (MapPoint equivalent, include/MapPoint.h) --------------
    pt_pos: jnp.ndarray        # (NP, 3) world
    pt_normal: jnp.ndarray     # (NP, 3) mean viewing direction
    pt_desc: jnp.ndarray       # (NP, 8) uint32 distinctive descriptor
    pt_desc_ring: jnp.ndarray  # (NP, R, 8) uint32 recent observation ring;
                               #   pt_desc = ring entry with least median
                               #   Hamming distance to the others
                               #   (MapPoint::ComputeDistinctiveDescriptors)
    pt_valid: jnp.ndarray      # (NP,) bool
    pt_visible: jnp.ndarray    # (NP,) int32 -- times predicted visible
    pt_found: jnp.ndarray      # (NP,) int32 -- times actually matched
    pt_obs_count: jnp.ndarray  # (NP,) int32 -- # keyframes observing
    pt_first_kf: jnp.ndarray   # (NP,) int32
    pt_angle: jnp.ndarray      # (NP,) keypoint orientation at creation (rad)
    pt_dist_min: jnp.ndarray   # (NP,) scale-invariance near bound (m) --
                               #   MapPoint::GetMinDistanceInvariance
    pt_dist_max: jnp.ndarray   # (NP,) scale-invariance far bound (m);
                               #   0 = unset (pre-scale-aware map) -> no gate
    # --- keyframes (KeyFrame equivalent, include/KeyFrame.h) ---------------
    kf_pose: jnp.ndarray       # (NK, 4, 4) T_cw
    kf_valid: jnp.ndarray      # (NK,) bool
    kf_seq: jnp.ndarray        # (NK,) int32 insertion sequence number (-1 dead)
                               #   rows are SLOTS (reused after KeyFrameCulling)
                               #   so temporal order lives here, not in the index
    kf_ts: jnp.ndarray         # (NK,) float64-ish timestamp (f32 ok for tests)
    kf_uv: jnp.ndarray         # (NK, K, 2)
    kf_ur: jnp.ndarray         # (NK, K) stereo right coord (-1 mono)
    kf_xyz: jnp.ndarray        # (NK, K, 3) camera-frame backprojections
    kf_desc: jnp.ndarray       # (NK, K, 8) uint32
    kf_sigma2: jnp.ndarray     # (NK, K) scale^2
    kf_angle: jnp.ndarray      # (NK, K) keypoint orientation (rad)
    kf_kp_valid: jnp.ndarray   # (NK, K) bool
    kf_mp: jnp.ndarray         # (NK, K) int32 map-point id or -1
    kf_bow: jnp.ndarray        # (NK, W) float32 tf-idf BoW vector
    kf_word: jnp.ndarray       # (NK, K) int32 per-feature vocabulary word id
                               #   (DBoW2 FeatureVector equivalent) -- cached
                               #   at insertion so SearchByBoW-style matching
                               #   never recomputes the (K,256)x(256,W)
                               #   assignment matmul per frame
    # structural observation tables (per keyframe): the reference's
    # KeyFrame::AddMapPlane / AddMapLine observation maps (KeyFrame.h), the
    # inputs to LocalBA/GBA plane+line edges (Optimizer.cc:2441-2562)
    kf_pl: jnp.ndarray         # (NK, Fp) int32 direct map-plane id or -1
    kf_pl_par: jnp.ndarray     # (NK, Fp) int32 parallel-relation id or -1
    kf_pl_ver: jnp.ndarray     # (NK, Fp) int32 vertical-relation id or -1
    kf_pl_obs: jnp.ndarray     # (NK, Fp, 4) observed camera-frame coeffs
    kf_ln: jnp.ndarray         # (NK, Fl) int32 map-line id or -1
    kf_ln_obs: jnp.ndarray     # (NK, Fl, 3) observed 2D line equation
    kf_ln_xyz: jnp.ndarray     # (NK, Fl, 6) measured camera-frame endpoints
    # --- map planes (MapPlane equivalent, include/MapPlane.h) --------------
    pl_coef: jnp.ndarray       # (NF, 4) world (n, d) normalized
    pl_valid: jnp.ndarray      # (NF,) bool
    pl_cloud: jnp.ndarray      # (NF, Q, 3) world sample cloud
    pl_cloud_valid: jnp.ndarray  # (NF, Q)
    pl_obs_count: jnp.ndarray  # (NF,) int32
    pl_first_kf: jnp.ndarray   # (NF,) int32 creating keyframe (re-anchoring)
    # --- map lines (MapLine equivalent, include/MapLine.h) -----------------
    ln_ep: jnp.ndarray         # (NL, 6) world endpoints
    ln_dir: jnp.ndarray        # (NL, 3) world direction
    ln_desc: jnp.ndarray       # (NL, 8) uint32
    ln_valid: jnp.ndarray      # (NL,) bool
    ln_obs_count: jnp.ndarray  # (NL,) int32
    ln_visible: jnp.ndarray    # (NL,) int32
    ln_found: jnp.ndarray      # (NL,) int32
    ln_first_kf: jnp.ndarray   # (NL,) int32 creating keyframe (re-anchoring)
    # --- Manhattan frame ----------------------------------------------------
    R_wm: jnp.ndarray          # (3, 3) Manhattan axes in world coordinates
    manhattan_ok: jnp.ndarray  # () bool
    # --- counters ------------------------------------------------------------
    n_pts: jnp.ndarray         # () int32
    n_kfs: jnp.ndarray         # () int32 -- ALIVE keyframes (sum of kf_valid)
    n_lns: jnp.ndarray         # () int32
    kf_next_seq: jnp.ndarray   # () int32 -- total keyframes ever inserted


def make_empty_state(cfg: SlamConfig) -> MapState:
    m = cfg.map
    K = cfg.orb.max_keypoints
    NP, NK, NF, NL, Q, W = (m.max_points, m.max_keyframes, m.max_planes,
                            m.max_lines, cfg.plane.cloud_points, m.vocab_words)
    Fp = cfg.plane.max_planes      # frame-plane observation slots per KF
    Fl = cfg.line.max_lines        # frame-line observation slots per KF
    z = jnp.zeros
    return MapState(
        pt_pos=z((NP, 3)), pt_normal=z((NP, 3)),
        pt_desc=z((NP, 8), jnp.uint32),
        pt_desc_ring=z((NP, m.desc_ring, 8), jnp.uint32),
        pt_valid=z(NP, bool),
        pt_visible=z(NP, jnp.int32), pt_found=z(NP, jnp.int32),
        pt_obs_count=z(NP, jnp.int32), pt_first_kf=z(NP, jnp.int32),
        pt_angle=z(NP), pt_dist_min=z(NP), pt_dist_max=z(NP),
        kf_pose=jnp.tile(jnp.eye(4)[None], (NK, 1, 1)), kf_valid=z(NK, bool),
        kf_seq=jnp.full((NK,), -1, jnp.int32),
        kf_ts=z(NK), kf_uv=z((NK, K, 2)), kf_ur=z((NK, K)),
        kf_xyz=z((NK, K, 3)), kf_desc=z((NK, K, 8), jnp.uint32),
        kf_sigma2=jnp.ones((NK, K)), kf_angle=z((NK, K)),
        kf_kp_valid=z((NK, K), bool),
        kf_mp=jnp.full((NK, K), -1, jnp.int32), kf_bow=z((NK, W)),
        kf_word=z((NK, K), jnp.int32),
        kf_pl=jnp.full((NK, Fp), -1, jnp.int32),
        kf_pl_par=jnp.full((NK, Fp), -1, jnp.int32),
        kf_pl_ver=jnp.full((NK, Fp), -1, jnp.int32),
        kf_pl_obs=z((NK, Fp, 4)).at[:, :, 2].set(1.0),
        kf_ln=jnp.full((NK, Fl), -1, jnp.int32),
        kf_ln_obs=z((NK, Fl, 3)),
        kf_ln_xyz=z((NK, Fl, 6)),
        pl_coef=z((NF, 4)).at[:, 2].set(1.0), pl_valid=z(NF, bool),
        pl_cloud=z((NF, Q, 3)), pl_cloud_valid=z((NF, Q), bool),
        pl_obs_count=z(NF, jnp.int32),
        pl_first_kf=jnp.full((NF,), -1, jnp.int32),
        ln_ep=z((NL, 6)), ln_dir=z((NL, 3)), ln_desc=z((NL, 8), jnp.uint32),
        ln_valid=z(NL, bool), ln_obs_count=z(NL, jnp.int32),
        ln_visible=z(NL, jnp.int32), ln_found=z(NL, jnp.int32),
        ln_first_kf=jnp.full((NL,), -1, jnp.int32),
        R_wm=jnp.eye(3), manhattan_ok=jnp.asarray(False),
        n_pts=jnp.asarray(0, jnp.int32), n_kfs=jnp.asarray(0, jnp.int32),
        n_lns=jnp.asarray(0, jnp.int32),
        kf_next_seq=jnp.asarray(0, jnp.int32),
    )
