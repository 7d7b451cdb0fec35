"""Jitted map operations: matching, observation assembly, keyframe insertion,
plane/line bookkeeping, culling.

These replace the reference's pointer-chasing associators and map mutation
methods with fixed-shape device programs:

- match_points_projection : ORBmatcher::SearchByProjection (ORBmatcher.cc:46,
  1396) -- instead of per-feature grid walks, ALL map points are projected
  and scored against ALL frame keypoints with one Hamming matmul + window
  gate. 1024 x 32768 x 256 bits is ~1.7 GMAC on the MXU: cheaper than the
  pointer walk is on a CPU.
- match_reference_kf      : ORBmatcher::SearchByBoW (ORBmatcher.cc:160) --
  the BoW bucketing exists to prune CPU work; on the MXU the full K x K
  Hamming matrix is faster, so the vocabulary stays only where it is
  semantically needed (loop detection / relocalization candidates).
- match_planes            : PlaneMatcher::SearchMapByCoefficients
  (PlaneMatcher.cpp:11-94) -- normal-angle + min point-to-plane distance
  against every map plane at once; records parallel/vertical relations.
- match_lines             : LSDmatcher (LSDmatcher.cpp) -- Hamming matmul
  over LBD-style binary descriptors with a projected-endpoint gate.
- add_keyframe            : Tracking::CreateNewKeyFrame (Tracking.cc:3040) +
  the RGB-D new-point creation from depth; slot allocation is an argsort
  over the free mask (no host allocator).
- cull_map                : LocalMapping::MapPointCulling / MapPlaneCulling
  (LocalMapping.cc:175,233) as mask updates; plane merge by normal angle +
  distance (LocalMapping.cc:239-276).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from dr_slam_tpu.config import SlamConfig
from dr_slam_tpu.frontend.frame import FrameFeatures
from dr_slam_tpu.geometry import se3
from dr_slam_tpu.ops import orb as orb_ops
from dr_slam_tpu.associate.vocabulary import word_ids as _vocab_word_ids
from dr_slam_tpu.ops.hamming import hamming_matrix
from dr_slam_tpu.optimize.pose_opt import PoseObservations
from dr_slam_tpu.slam.state import MapState

TH_HIGH = 100.0   # ORBmatcher.h TH_HIGH
TH_LOW = 50.0     # ORBmatcher.h TH_LOW


def _free_slots(valid: jnp.ndarray) -> jnp.ndarray:
    """(N,) bool -> (N,) int32: index of the r-th free slot at position r
    (free slots in ascending index order; tail filled with used slots)."""
    n = valid.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    keys = jnp.where(valid, idx + n, idx)  # free first, ascending
    return jnp.argsort(keys).astype(jnp.int32)


class PointMatches(NamedTuple):
    mp_idx: jnp.ndarray      # (K,) int32 matched map-point id or -1
    n_matches: jnp.ndarray   # () int32
    visible: jnp.ndarray     # (NP,) bool -- predicted-visible mask


def rotation_consistency(ok, dangle, n_bins: int = 30, keep_bins: int = 3):
    """ORBmatcher's orientation-histogram check (ORBmatcher.cc:38-40,1666):
    bin the keypoint-vs-landmark angle differences into 30 bins and keep only
    matches in the `keep_bins` most populated bins. Kills aliased matches
    onto differently-oriented corners of similar texture."""
    two_pi = 2.0 * jnp.pi
    a = jnp.mod(dangle, two_pi)
    bins = jnp.clip((a / two_pi * n_bins).astype(jnp.int32), 0, n_bins - 1)
    hist = jnp.zeros(n_bins, jnp.int32).at[bins].add(ok.astype(jnp.int32))
    top_counts, top_bins = jax.lax.top_k(hist, keep_bins)
    in_top = jnp.any(bins[:, None] == top_bins[None, :], axis=1)
    return ok & in_top


_MATCH_CHUNK = 4096  # map points per scan step: bounds temporaries to
                     # (K, 4096) tiles (a full (1024, 32768) distance matrix
                     # is ~134 MB x several buffers and fragments HBM)


def _resolve_pallas(flag) -> bool:
    """'auto' -> the Mosaic kernel on the native TPU backend, the XLA scan
    path elsewhere (CPU has only the slow Pallas interpreter; the axon
    tunnel's remote-compile service has repeatedly wedged under Mosaic
    kernels in this environment, so it must opt in via use_pallas=True)."""
    if flag == "auto" or flag is None:
        return jax.default_backend() == "tpu"
    return bool(flag)


@functools.partial(jax.jit,
                   static_argnames=("width", "height", "pt_scale",
                                    "n_levels", "max_candidates",
                                    "use_pallas"))
def match_points_projection(state: MapState, kp_uv, kp_desc, kp_valid,
                            T_pred, K4, radius: float,
                            max_hamming: float = TH_HIGH,
                            width: int = 640, height: int = 480,
                            kp_angle=None, kp_octave=None,
                            pt_scale: float = 1.2,
                            n_levels: int = 8,
                            max_candidates: int = 0,
                            use_pallas="auto") -> PointMatches:
    from dr_slam_tpu.ops.orb import bits_to_signs, unpack_bits

    NP = state.pt_pos.shape[0]
    K = kp_uv.shape[0]
    pos_c = se3.transform_points(T_pred, state.pt_pos)
    z = pos_c[:, 2]
    uv = se3.project(jnp.asarray(K4), pos_c)
    in_img = ((uv[:, 0] >= 0) & (uv[:, 0] < width)
              & (uv[:, 1] >= 0) & (uv[:, 1] < height))
    vis = state.pt_valid & (z > 0.1) & in_img

    # --- scale/view-cone frustum gates (Frame::isInFrustum,
    # src/Frame.cc + MapPoint distance invariance, ORBmatcher.cc:46) -------
    # Points whose camera distance falls outside the pyramid's scale
    # invariance band, or seen from >60 deg off their mean viewing
    # direction, cannot produce a valid descriptor match -- gating them
    # kills aliased matches on repetitive texture. Points from maps saved
    # before the bounds existed (pt_dist_max == 0) skip the gate.
    dist = jnp.linalg.norm(pos_c, axis=-1)
    has_si = state.pt_dist_max > 0.0
    in_band = ((dist >= 0.8 * state.pt_dist_min)
               & (dist <= 1.2 * state.pt_dist_max))
    # viewing direction in world: R_wc @ (pos_c/dist) == (pos_c/dist) @ R_cw
    vdir_w = (pos_c / jnp.maximum(dist, 1e-9)[:, None]) @ T_pred[:3, :3]
    viewcos = jnp.sum(vdir_w * state.pt_normal, axis=-1)
    vis &= jnp.where(has_si, in_band & (viewcos > 0.5), True)
    # predicted pyramid level (MapPoint::PredictScale): the level whose
    # downscale factor maps the point's creation-time appearance size to
    # its current one; drives the per-point search radius like the
    # reference's r * mvScaleFactors[nPredictedLevel]
    log_s = jnp.log(jnp.asarray(pt_scale, jnp.float32))
    n_pred = jnp.ceil(jnp.log(jnp.maximum(state.pt_dist_max, 1e-9)
                              / jnp.maximum(dist, 1e-9)) / log_s)
    n_pred = jnp.clip(n_pred, 0, n_levels - 1).astype(jnp.int32)
    n_pred = jnp.where(has_si, n_pred, 0)
    pt_radius = radius * jnp.asarray(pt_scale, jnp.float32) ** n_pred

    # --- candidate compaction: the map's point table is a fixed-capacity
    # 32k-slot array, but only the in-frustum points (typically a few
    # thousand) can match -- running the (K, 256)x(256, NP) descriptor
    # matmul over every slot wastes 4-8x MXU work on dead/behind-camera
    # rows. Stable cumsum compaction gathers the visible rows into a
    # max_candidates-sized buffer first (the reference's SearchByProjection
    # also iterates in-frustum points only, ORBmatcher.cc:46). Overflow
    # beyond max_candidates drops newest slots first (slot order ~
    # insertion order, so long-established landmarks are kept).
    # max_candidates <= 0 disables compaction (full-table matmul): measured
    # on the v5e chip both are within run noise at the default 32k capacity
    # (the per-frame program is dispatch-bound), so compaction is opt-in
    # via TrackingConfig.match_candidates for larger capacities.
    NC = min(max_candidates, NP) if max_candidates > 0 else NP
    if NC < NP:
        pos = jnp.cumsum(vis.astype(jnp.int32)) - 1
        tgt = jnp.where(vis & (pos < NC), pos, NC)
        cand = (jnp.zeros((NC + 1,), jnp.int32)
                .at[tgt].set(jnp.arange(NP, dtype=jnp.int32))[:NC])
        n_cand = jnp.minimum(jnp.sum(vis), NC)
        cand_valid = jnp.arange(NC) < n_cand
        pt_desc = state.pt_desc[cand]
        pt_angle = state.pt_angle[cand]
        uv_c = uv[cand]
        rad_c = pt_radius[cand]
        lvl_c = n_pred[cand]
        si_c = has_si[cand]
    else:
        NC = NP
        cand = jnp.arange(NP, dtype=jnp.int32)
        cand_valid = vis
        pt_desc, pt_angle = state.pt_desc, state.pt_angle
        uv_c, rad_c, lvl_c, si_c = uv, pt_radius, n_pred, has_si

    if _resolve_pallas(use_pallas):
        # ---- Pallas streaming path: one Mosaic kernel, no (K, NC) f32
        # distance block in HBM (ops/match_pallas.py). Bit-exact vs the
        # scan path below (test_match_projection_pallas_equivalent).
        from dr_slam_tpu.ops.match_pallas import TILE_C, gated_top2_hamming

        padp = -NC % TILE_C

        def pad_p(x, fill=0):
            if padp == 0:
                return x
            return jnp.pad(x, [(0, padp)] + [(0, 0)] * (x.ndim - 1),
                           constant_values=fill)

        signs_kp = bits_to_signs(unpack_bits(kp_desc))        # (K, 256)
        psigns = bits_to_signs(unpack_bits(pad_p(pt_desc)))
        oct_ = (jnp.zeros((K,), jnp.int32) if kp_octave is None
                else kp_octave)
        si_p = (jnp.zeros_like(pad_p(si_c, False)) if kp_octave is None
                else pad_p(si_c, False))
        best_d, best_pt, second, pbest_k = gated_top2_hamming(
            signs_kp, kp_uv, kp_valid, oct_, psigns, pad_p(uv_c, 1e9),
            pad_p(rad_c), pad_p(lvl_c), si_p, pad_p(cand_valid, False),
            interpret=jax.default_backend() == "cpu")
        pbest_k = pbest_k[:NC]
        pt_angle_c = pt_angle
    else:
        best_d, best_pt, second, pbest_k, signs_kp, pt_angle_c = \
            _match_scan_path(kp_desc, kp_uv, kp_valid, kp_octave, pt_desc,
                             pt_angle, uv_c, rad_c, lvl_c, si_c,
                             cand_valid, NC)

    ok = best_d <= max_hamming
    # ambiguity test: a second candidate nearly as good means a repetitive
    # region -- reject (ORBmatcher's mfNNratio idea); crucial against
    # window-gate bias feedback on periodic texture
    ok &= best_d < 0.85 * second
    # mutual best
    k_idx = jnp.arange(K, dtype=jnp.int32)
    ok &= pbest_k[best_pt] == k_idx
    if kp_angle is not None:
        dangle = kp_angle - pt_angle_c[best_pt]
        ok = rotation_consistency(ok, dangle)
    mp_idx = jnp.where(ok, cand[best_pt], -1)   # candidate -> map-point id
    return PointMatches(mp_idx=mp_idx, n_matches=jnp.sum(ok), visible=vis)


def _match_scan_path(kp_desc, kp_uv, kp_valid, kp_octave, pt_desc, pt_angle,
                     uv_c, rad_c, lvl_c, si_c, cand_valid, NC):
    """The XLA lax.scan matcher core (CPU path and pallas cross-check)."""
    from dr_slam_tpu.ops.orb import bits_to_signs, unpack_bits

    K = kp_uv.shape[0]
    C = min(_MATCH_CHUNK, NC)
    n_chunks = -(-NC // C)
    pad = n_chunks * C - NC

    def pad_to(x, fill=0):
        if pad == 0:
            return x
        return jnp.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1),
                       constant_values=fill)

    signs_kp = bits_to_signs(unpack_bits(kp_desc))            # (K, 256)
    pt_signs = bits_to_signs(unpack_bits(pad_to(pt_desc)))
    pt_signs = pt_signs.reshape(n_chunks, C, 256)
    uv_ch = pad_to(uv_c, 1e9).reshape(n_chunks, C, 2)
    vis_ch = pad_to(cand_valid, False).reshape(n_chunks, C)
    rad_ch = pad_to(rad_c).reshape(n_chunks, C)
    lvl_ch = pad_to(lvl_c).reshape(n_chunks, C)
    si_ch = pad_to(si_c, False).reshape(n_chunks, C)
    offs = (jnp.arange(n_chunks, dtype=jnp.int32) * C)

    k_idx = jnp.arange(K, dtype=jnp.int32)

    def body(carry, chunk):
        best_d, best_i, second_d = carry
        sg, uvc, vc, radc, lvlc, sic, off = chunk

        def compute(carry):
            best_d, best_i, second_d = carry
            dot = jnp.dot(signs_kp, sg.T,
                          preferred_element_type=jnp.float32)
            ham = (256.0 - dot) * 0.5                          # (K, C)
            du = jnp.abs(kp_uv[:, 0:1] - uvc[None, :, 0])
            dv = jnp.abs(kp_uv[:, 1:2] - uvc[None, :, 1])
            gate = ((du < radc[None, :]) & (dv < radc[None, :])
                    & vc[None, :] & kp_valid[:, None])
            if kp_octave is not None:
                # keypoint must live within one pyramid level of the
                # predicted one (ORBmatcher::SearchByProjection's
                # nPredictedLevel-1 .. nPredictedLevel window) -- a far
                # landmark cannot match a fine-level corner and vice versa
                dlvl = jnp.abs(kp_octave[:, None].astype(jnp.int32)
                               - lvlc[None, :])
                gate &= (dlvl <= 1) | ~sic[None, :]
            D = jnp.where(gate, ham, jnp.inf)
            cmin = jnp.min(D, 1)
            carg = jnp.argmin(D, 1).astype(jnp.int32)
            csec = jnp.min(D.at[k_idx, carg].set(jnp.inf), 1)
            # merge (best, second) pairs across chunks
            new_best = jnp.minimum(best_d, cmin)
            new_second = jnp.minimum(jnp.maximum(best_d, cmin),
                                     jnp.minimum(second_d, csec))
            new_i = jnp.where(cmin < best_d, carg + off, best_i)
            # per-point best keypoint (for the mutual check)
            pbest_k = jnp.argmin(D, 0).astype(jnp.int32)
            pbest_d = jnp.min(D, 0)
            return (new_best, new_i, new_second), (pbest_k, pbest_d)

        def skip(carry):
            return carry, (jnp.zeros((sg.shape[0],), jnp.int32),
                           jnp.full((sg.shape[0],), jnp.inf))

        # chunks with no visible point contribute nothing: skip their
        # descriptor matmul entirely (runtime branch). Cost then scales
        # with the LIVE map extent, not the 32k slot capacity -- the
        # tensor-program analog of SearchByProjection iterating only
        # in-frustum points (ORBmatcher.cc:46). Slots fill low-first, so
        # early maps touch 1-2 chunks out of 8.
        return jax.lax.cond(jnp.any(vc), compute, skip, carry)

    init = (jnp.full((K,), jnp.inf), jnp.zeros((K,), jnp.int32),
            jnp.full((K,), jnp.inf))
    (best_d, best_pt, second), (pk, pd) = jax.lax.scan(
        body, init, (pt_signs, uv_ch, vis_ch, rad_ch, lvl_ch, si_ch, offs))
    pbest_k = pk.reshape(-1)[:NC]                              # (NC,)
    return best_d, best_pt, second, pbest_k, signs_kp, pt_angle


@jax.jit
def match_reference_kf(state: MapState, kf_id, kp_desc, kp_valid,
                       max_hamming: float = TH_LOW, ratio: float = 0.75,
                       kp_word=None, kf_word=None) -> PointMatches:
    """Frame <-> keyframe descriptor matching, returning map-point ids
    through the keyframe's observation table (SearchByBoW capability).

    When per-descriptor vocabulary word ids are supplied (kp_word/kf_word,
    from vocabulary.word_ids), candidate pairs are restricted to the SAME
    word -- the DBoW2 FeatureVector bucketing of ORBmatcher::SearchByBoW
    (ORBmatcher.cc:160) that keeps brute-force Hamming from aliasing on
    repetitive texture."""
    kdesc = state.kf_desc[kf_id]
    # gate on current pt_valid too: a culled point must not be re-served
    # through an old keyframe row (observations are erased lazily in cull_map
    # but a row written between culls can still reference a dying point)
    row = state.kf_mp[kf_id]
    kvalid = (state.kf_kp_valid[kf_id] & (row >= 0)
              & state.pt_valid[jnp.clip(row, 0)])
    ham = hamming_matrix(kp_desc, kdesc)
    gate = kp_valid[:, None] & kvalid[None, :]
    if kp_word is not None and kf_word is not None:
        gate &= kp_word[:, None] == kf_word[None, :]
    D = jnp.where(gate, ham, jnp.inf)
    best_j = jnp.argmin(D, 1)
    k_idx = jnp.arange(D.shape[0])
    best_d = D[k_idx, best_j]
    masked = D.at[k_idx, best_j].set(jnp.inf)
    second = jnp.min(masked, 1)
    ok = (best_d <= max_hamming) & (best_d < ratio * second)
    best_i = jnp.argmin(D, 0)
    ok &= best_i[best_j] == k_idx
    # a map point may win through two different keypoints (two frame
    # features matching two distinct keyframe features that observe the
    # same landmark); keep exactly one -- the reference's SearchByBoW is
    # one-to-one by construction (ORBmatcher.cc:160). Without this, the
    # duplicated observation double-counts in the pose solve and in the
    # keyframe-insertion obs statistics.
    mp_idx = dedup_matches(jnp.where(ok, state.kf_mp[kf_id][best_j], -1),
                           state.pt_pos.shape[0])
    return PointMatches(mp_idx=mp_idx, n_matches=jnp.sum(mp_idx >= 0),
                        visible=state.pt_valid)


def dedup_matches(mp_idx: jnp.ndarray, n_points: int) -> jnp.ndarray:
    """(K,) map-point ids with possible duplicates -> one keypoint per map
    point (ownership-table scatter; the duplicate loses its match)."""
    K = mp_idx.shape[0]
    k_idx = jnp.arange(K, dtype=jnp.int32)
    tgt = jnp.where(mp_idx >= 0, mp_idx, n_points)   # n_points = dump row
    owner = jnp.full(n_points + 1, -1, jnp.int32).at[tgt].set(k_idx)
    return jnp.where(owner[jnp.clip(mp_idx, 0)] == k_idx, mp_idx, -1)


@functools.partial(jax.jit, static_argnames=())
def creation_block_mask(state: MapState, kp_uv, kp_depth, T_cw, K4,
                        radius: float = 5.0) -> jnp.ndarray:
    """(K,) bool: a valid map point already projects within `radius` px of
    this keypoint at a compatible depth -- duplicate-landmark prevention
    (the role of ORBmatcher::Fuse in SearchInNeighbors,
    LocalMapping.cc:1039)."""
    NP = state.pt_pos.shape[0]
    pos_c = se3.transform_points(T_cw, state.pt_pos)
    uv = se3.project(jnp.asarray(K4), pos_c)
    z = pos_c[:, 2]
    ok = state.pt_valid & (z > 0.1)
    C = min(_MATCH_CHUNK, NP)
    n_chunks = -(-NP // C)
    pad = n_chunks * C - NP
    uv_ch = jnp.pad(uv, ((0, pad), (0, 0)), constant_values=1e9
                    ).reshape(n_chunks, C, 2)
    z_ch = jnp.pad(z, (0, pad), constant_values=1.0).reshape(n_chunks, C)
    ok_ch = jnp.pad(ok, (0, pad)).reshape(n_chunks, C)

    def body(blocked, chunk):
        uvc, zc, okc = chunk
        du = jnp.abs(kp_uv[:, 0:1] - uvc[None, :, 0])
        dv = jnp.abs(kp_uv[:, 1:2] - uvc[None, :, 1])
        ratio = kp_depth[:, None] / jnp.maximum(zc[None, :], 1e-6)
        near = ((du < radius) & (dv < radius) & okc[None, :]
                & (ratio > 0.8) & (ratio < 1.25))
        return blocked | jnp.any(near, axis=1), None

    blocked, _ = jax.lax.scan(body, jnp.zeros(kp_uv.shape[0], bool),
                              (uv_ch, z_ch, ok_ch))
    return blocked


class PlaneMatches(NamedTuple):
    match_idx: jnp.ndarray   # (P,) map-plane id or -1 (direct association)
    par_idx: jnp.ndarray     # (P,) parallel-relation map plane or -1
    ver_idx: jnp.ndarray     # (P,) vertical-relation map plane or -1
    obs_world: jnp.ndarray   # (P, 4) observed planes in world frame


@jax.jit
def match_planes(state: MapState, coeffs_c, valid, T_cw,
                 assoc_ang: float = 0.985, assoc_dis: float = 0.05,
                 par_th: float = 0.9962, ver_th: float = 0.0871
                 ) -> PlaneMatches:
    """PlaneMatcher::SearchMapByCoefficients (PlaneMatcher.cpp:11-94):
    transform observed planes to world; direct match needs normal angle
    within acos(assoc_ang) AND min point-to-plane distance < assoc_dis;
    otherwise best parallel (>par_th) / vertical (<ver_th) relations."""
    obs_w = jax.vmap(lambda p: se3.plane_to_world(T_cw, p))(coeffs_c)
    n_obs = obs_w[:, :3]
    cosang = jnp.abs(n_obs @ state.pl_coef[:, :3].T)       # (P, NF)
    # min |n_obs . x + d_obs| over each map plane's cloud
    dist = jnp.abs(jnp.einsum("pc,fqc->pfq", n_obs, state.pl_cloud)
                   + obs_w[:, 3][:, None, None])
    dist = jnp.where(state.pl_cloud_valid[None], dist, jnp.inf)
    mind = jnp.min(dist, -1)                                # (P, NF)

    live = state.pl_valid[None, :] & valid[:, None]
    direct = live & (cosang > assoc_ang) & (mind < assoc_dis)
    score = jnp.where(direct, -mind, -jnp.inf)
    best = jnp.argmax(score, 1).astype(jnp.int32)
    match_idx = jnp.where(jnp.any(direct, 1), best, -1)

    par = live & (cosang > par_th) & ~direct
    par_best = jnp.argmax(jnp.where(par, cosang, -jnp.inf), 1).astype(jnp.int32)
    par_idx = jnp.where(jnp.any(par, 1), par_best, -1)

    ver = live & (cosang < ver_th)
    ver_best = jnp.argmax(jnp.where(ver, -cosang, -jnp.inf), 1).astype(jnp.int32)
    ver_idx = jnp.where(jnp.any(ver, 1), ver_best, -1)
    return PlaneMatches(match_idx=match_idx, par_idx=par_idx, ver_idx=ver_idx,
                        obs_world=obs_w)


class LineMatches(NamedTuple):
    ml_idx: jnp.ndarray      # (L,) map-line id or -1
    n_matches: jnp.ndarray


@functools.partial(jax.jit, static_argnames=("width", "height"))
def match_lines_projection(state: MapState, lf_seg2d, lf_desc, lf_valid,
                           T_pred, K4, radius: float = 40.0,
                           max_hamming: float = 90.0,
                           width: int = 640, height: int = 480
                           ) -> LineMatches:
    """LSDmatcher capability: Hamming matmul over binary line descriptors
    gated by projected midpoint distance."""
    mid_w = 0.5 * (state.ln_ep[:, :3] + state.ln_ep[:, 3:])
    mid_c = se3.transform_points(T_pred, mid_w)
    uv = se3.project(jnp.asarray(K4), mid_c)
    vis = (state.ln_valid & (mid_c[:, 2] > 0.1)
           & (uv[:, 0] >= -50) & (uv[:, 0] < width + 50)
           & (uv[:, 1] >= -50) & (uv[:, 1] < height + 50))
    mid_f = 0.5 * (lf_seg2d[:, :2] + lf_seg2d[:, 2:])
    ham = hamming_matrix(lf_desc, state.ln_desc)
    d2 = jnp.sum((mid_f[:, None] - uv[None]) ** 2, -1)
    gate = (d2 < radius * radius) & vis[None] & lf_valid[:, None]
    D = jnp.where(gate, ham, jnp.inf)
    best = jnp.argmin(D, 1)
    l_idx = jnp.arange(D.shape[0])
    ok = D[l_idx, best] <= max_hamming
    best_rev = jnp.argmin(D, 0)
    ok &= best_rev[best] == l_idx
    ml_idx = jnp.where(ok, best.astype(jnp.int32), -1)
    return LineMatches(ml_idx=ml_idx, n_matches=jnp.sum(ok))


@functools.partial(jax.jit, static_argnames=("n_struct",))
def build_pose_obs(state: MapState, feats: FrameFeatures,
                   mp_idx: jnp.ndarray, pm: PlaneMatches,
                   lm_idx: jnp.ndarray, n_struct: int = 16
                   ) -> PoseObservations:
    """Assemble the fixed-capacity observation set for pose_optimize."""
    K = mp_idx.shape[0]
    ok = mp_idx >= 0
    ids = jnp.clip(mp_idx, 0)
    pt_world = state.pt_pos[ids]
    pt_obs = jnp.concatenate([feats.kp.uv, feats.kp_ur[:, None]], -1)
    inv_sigma2 = 1.0 / jnp.maximum(feats.kp.sigma2, 1e-6)

    # lines: observed 2D line equation vs matched map line world endpoints
    lok = lm_idx >= 0
    lids = jnp.clip(lm_idx, 0)
    ln_world = state.ln_ep[lids]
    ln_obs = feats.lines.lineq

    P = pm.match_idx.shape[0]
    pok = pm.match_idx >= 0
    pids = jnp.clip(pm.match_idx, 0)
    pl_world = state.pl_coef[pids]
    pl_obs = feats.planes.coeffs

    def pad_to(x, n):
        return jnp.pad(x, [(0, max(0, n - x.shape[0]))] + [(0, 0)] * (x.ndim - 1)
                       )[:n]

    par_ok = pm.par_idx >= 0
    ver_ok = pm.ver_idx >= 0
    par_world = state.pl_coef[jnp.clip(pm.par_idx, 0)]
    ver_world = state.pl_coef[jnp.clip(pm.ver_idx, 0)]

    return PoseObservations(
        pt_world=pt_world, pt_obs=pt_obs, pt_inv_sigma2=inv_sigma2,
        pt_valid=ok & feats.kp.valid,
        ln_world=ln_world, ln_obs=ln_obs,
        # cell-grid line endpoints carry a few px of noise: weight ~ 1/sigma^2
        ln_inv_sigma2=jnp.ones(ln_obs.shape[0]) * 0.25,
        ln_valid=lok & feats.lines.valid,
        pl_world=pl_world, pl_obs=pl_obs, pl_valid=pok & feats.planes.valid,
        par_world=pad_to(par_world, n_struct),
        par_obs=pad_to(feats.planes.coeffs, n_struct),
        par_valid=pad_to(par_ok & feats.planes.valid, n_struct),
        ver_world=pad_to(ver_world, n_struct),
        ver_obs=pad_to(feats.planes.coeffs, n_struct),
        ver_valid=pad_to(ver_ok & feats.planes.valid, n_struct),
    )


@jax.jit
def update_point_stats(state: MapState, visible, mp_idx) -> MapState:
    """MapPoint IncreaseVisible/IncreaseFound bookkeeping."""
    found = jnp.zeros_like(state.pt_found).at[jnp.clip(mp_idx, 0)].add(
        (mp_idx >= 0).astype(jnp.int32))
    return state._replace(
        pt_visible=state.pt_visible + visible.astype(jnp.int32),
        pt_found=state.pt_found + found)


@functools.partial(jax.jit, static_argnames=("cfg",), donate_argnums=(0,))
def add_keyframe(state: MapState, feats: FrameFeatures, T_cw, ts,
                 mp_idx, pm: PlaneMatches, lm_idx, bow, cfg: SlamConfig,
                 blocked=None) -> tuple[MapState, jnp.ndarray]:
    """Insert a keyframe; create map points from depth (RGB-D path of
    CreateNewKeyFrame, Tracking.cc:3040), new map planes/lines; update
    matched landmark statistics. Returns (state, kf_slot)."""
    K = cfg.orb.max_keypoints
    NP = cfg.map.max_points
    # keyframe rows are SLOTS: KeyFrameCulling frees rows, so allocate the
    # lowest free one; temporal order lives in kf_seq (insertion counter)
    k = _free_slots(state.kf_valid)[0]
    T_wc = se3.inv_T(T_cw)
    cam_center = T_wc[:3, 3]

    # ---- new map points from depth -----------------------------------------
    # every unmatched keypoint with valid depth becomes a landmark (RGB-D
    # depth is metric; the reference's close/far split exists to limit CPU
    # map growth -- CreateNewKeyFrame adds close points plus the nearest far
    # ones, Tracking.cc:3040+. Capacity masks bound growth here instead, and
    # an absolute depth cap rejects the noisiest readings.)
    creatable = (feats.kp.valid & (feats.kp_depth > 1e-3)
                 & (feats.kp_depth < 8.0) & (mp_idx < 0))
    if blocked is not None:
        creatable &= ~blocked
    slots_all = _free_slots(state.pt_valid)              # (NP,)
    rank = jnp.cumsum(creatable) - 1
    n_free = jnp.sum(~state.pt_valid)
    can = creatable & (rank < n_free)
    slot = jnp.where(can, slots_all[jnp.clip(rank, 0, NP - 1)], NP)  # NP=drop
    pos_w = se3.transform_points(T_wc, feats.kp_xyz)
    view = pos_w - cam_center
    view = view / jnp.maximum(jnp.linalg.norm(view, axis=-1, keepdims=True), 1e-9)

    pt_pos = state.pt_pos.at[slot].set(pos_w, mode="drop")
    pt_normal = state.pt_normal.at[slot].set(view, mode="drop")
    pt_angle = state.pt_angle.at[slot].set(feats.kp.angle, mode="drop")
    # scale-invariance band (MapPoint::UpdateNormalAndDepth): the far bound
    # is the creation distance lifted to pyramid level 0 (dist * scale^oct);
    # the near bound divides by the full pyramid span. sigma2 = scale^(2*oct)
    # so sqrt recovers the per-keypoint level factor without an int gather.
    lvl_factor = jnp.sqrt(feats.kp.sigma2)
    span = float(cfg.orb.scale_factor) ** (cfg.orb.n_levels - 1)
    dist_new = jnp.linalg.norm(pos_w - cam_center, axis=-1)
    dmax_new = dist_new * lvl_factor
    pt_dmax = state.pt_dist_max.at[slot].set(dmax_new, mode="drop")
    pt_dmin = state.pt_dist_min.at[slot].set(dmax_new / span, mode="drop")
    pt_desc = state.pt_desc.at[slot].set(feats.kp.desc, mode="drop")
    pt_valid = state.pt_valid.at[slot].set(True, mode="drop")
    pt_visible = state.pt_visible.at[slot].set(1, mode="drop")
    pt_found = state.pt_found.at[slot].set(1, mode="drop")
    pt_first = state.pt_first_kf.at[slot].set(k, mode="drop")

    kf_mp_row = jnp.where(can & (slot < NP), slot.astype(jnp.int32), mp_idx)
    pt_obs = state.pt_obs_count.at[jnp.clip(kf_mp_row, 0)].add(
        (kf_mp_row >= 0).astype(jnp.int32))
    # MapPoint::ComputeDistinctiveDescriptors: each point keeps a ring of
    # its R most recent observed descriptors; the REPRESENTATIVE descriptor
    # is the ring entry with the least median Hamming distance to the
    # others -- descriptor identity stays central instead of drifting with
    # the latest viewpoint. Computed only over this frame's K keypoints
    # (matmul-shaped, ~K*R^2 distances), not the whole map.
    Kk = feats.kp.desc.shape[0]
    Rr = state.pt_desc_ring.shape[1]
    m_tgt = jnp.where(mp_idx >= 0, mp_idx, NP)
    ring_slot = state.pt_obs_count[jnp.clip(mp_idx, 0)] % Rr
    # creation fills the whole ring with the first descriptor
    pt_ring = state.pt_desc_ring.at[slot].set(
        jnp.broadcast_to(feats.kp.desc[:, None, :], (Kk, Rr, 8)),
        mode="drop")
    pt_ring = pt_ring.at[m_tgt, ring_slot].set(feats.kp.desc, mode="drop")
    ring_m = pt_ring[jnp.clip(m_tgt, 0, NP - 1)]             # (K, R, 8)
    sg = orb_ops.bits_to_signs(orb_ops.unpack_bits(
        ring_m.reshape(-1, 8))).reshape(Kk, Rr, 256)
    dot = jnp.einsum("krc,kqc->krq", sg, sg,
                     preferred_element_type=jnp.float32)
    ham = (256.0 - dot) * 0.5
    ham = jnp.where(jnp.eye(Rr, dtype=bool)[None], jnp.inf, ham)
    med = jnp.sort(ham, axis=-1)[:, :, (Rr - 2) // 2]        # median of R-1
    best_r = jnp.argmin(med, axis=-1)                        # (K,)
    distinct = jnp.take_along_axis(
        ring_m, best_r[:, None, None].astype(jnp.int32), 1)[:, 0]
    pt_desc = pt_desc.at[m_tgt].set(distinct, mode="drop")
    pt_angle = pt_angle.at[m_tgt].set(feats.kp.angle, mode="drop")
    # UpdateNormalAndDepth for RE-observed points: running-mean viewing
    # direction over observations, and a refreshed invariance band from this
    # observation's distance + octave (keeps the band tracking loop-closure
    # gauge corrections that move landmarks).
    obs_pos = state.pt_pos[jnp.clip(mp_idx, 0, NP - 1)]
    view_m = obs_pos - cam_center
    view_m = view_m / jnp.maximum(
        jnp.linalg.norm(view_m, axis=-1, keepdims=True), 1e-9)
    w_obs = state.pt_obs_count[jnp.clip(mp_idx, 0, NP - 1)]
    n_mean = (pt_normal[jnp.clip(mp_idx, 0, NP - 1)]
              * w_obs.astype(jnp.float32)[:, None] + view_m)
    n_mean = n_mean / jnp.maximum(
        jnp.linalg.norm(n_mean, axis=-1, keepdims=True), 1e-9)
    pt_normal = pt_normal.at[m_tgt].set(n_mean, mode="drop")
    dmax_obs = jnp.linalg.norm(obs_pos - cam_center, axis=-1) * lvl_factor
    pt_dmax = pt_dmax.at[m_tgt].set(dmax_obs, mode="drop")
    pt_dmin = pt_dmin.at[m_tgt].set(dmax_obs / span, mode="drop")

    # ---- write keyframe row -------------------------------------------------
    state = state._replace(
        pt_pos=pt_pos, pt_normal=pt_normal, pt_desc=pt_desc,
        pt_desc_ring=pt_ring,
        pt_valid=pt_valid, pt_visible=pt_visible, pt_found=pt_found,
        pt_first_kf=pt_first, pt_obs_count=pt_obs, pt_angle=pt_angle,
        pt_dist_min=pt_dmin, pt_dist_max=pt_dmax,
        kf_pose=state.kf_pose.at[k].set(T_cw),
        kf_valid=state.kf_valid.at[k].set(True),
        kf_seq=state.kf_seq.at[k].set(state.kf_next_seq),
        kf_next_seq=state.kf_next_seq + 1,
        kf_ts=state.kf_ts.at[k].set(ts),
        kf_uv=state.kf_uv.at[k].set(feats.kp.uv),
        kf_ur=state.kf_ur.at[k].set(feats.kp_ur),
        kf_xyz=state.kf_xyz.at[k].set(feats.kp_xyz),
        kf_desc=state.kf_desc.at[k].set(feats.kp.desc),
        kf_sigma2=state.kf_sigma2.at[k].set(feats.kp.sigma2),
        kf_angle=state.kf_angle.at[k].set(feats.kp.angle),
        kf_kp_valid=state.kf_kp_valid.at[k].set(feats.kp.valid),
        kf_mp=state.kf_mp.at[k].set(kf_mp_row),
        kf_bow=state.kf_bow.at[k].set(bow),
        # cache per-feature word ids once at insertion (DBoW2 computes the
        # FeatureVector once in the KeyFrame ctor); track_step reads
        # state.kf_word[ref_kf] instead of re-running the assignment matmul
        kf_word=state.kf_word.at[k].set(
            _vocab_word_ids(feats.kp.desc, state.kf_bow.shape[1])),
        n_kfs=jnp.sum(state.kf_valid.at[k].set(True)).astype(jnp.int32),
    )

    # ---- planes: update matched, add unmatched ------------------------------
    Q = cfg.plane.cloud_points
    cloud_w = se3.transform_points(T_wc, feats.planes.cloud.reshape(-1, 3)
                                   ).reshape(feats.planes.cloud.shape)
    matched = pm.match_idx >= 0
    mids = jnp.clip(pm.match_idx, 0)
    NF = cfg.map.max_planes
    mids_w = jnp.where(matched, mids, NF)  # NF = dropped scatter target
    # running-average coefficients (MapPlane::UpdateCoefficientsAndPoints)
    w_old = state.pl_obs_count[mids].astype(jnp.float32)[:, None]
    new_coef = se3.normalize_plane(
        (state.pl_coef[mids] * w_old + pm.obs_world) / (w_old + 1.0))
    pl_coef = state.pl_coef.at[mids_w].set(new_coef, mode="drop")
    # refresh half the cloud slots with new samples (ring offset by obs count)
    ring = (jnp.arange(Q // 2)[None, :] * 2
            + state.pl_obs_count[mids][:, None] % 2)
    take = jnp.arange(Q // 2)[None, :] * 2
    upd_pts = jnp.take_along_axis(cloud_w, take[..., None].repeat(3, -1), 1)
    upd_ok = jnp.take_along_axis(feats.planes.cloud_valid, take, 1) & matched[:, None]
    rows = jnp.where(upd_ok, jnp.broadcast_to(mids[:, None], ring.shape), NF)
    pl_cloud = state.pl_cloud.at[rows, ring].set(upd_pts, mode="drop")
    pl_cloud_valid = state.pl_cloud_valid.at[rows, ring].set(True, mode="drop")
    pl_obs = state.pl_obs_count.at[mids_w].add(1, mode="drop")

    # new planes
    new_pl = feats.planes.valid & (pm.match_idx < 0)
    pslots_all = _free_slots(state.pl_valid)
    prank = jnp.cumsum(new_pl) - 1
    pfree = jnp.sum(~state.pl_valid)
    pcan = new_pl & (prank < pfree)
    pslot = jnp.where(pcan, pslots_all[jnp.clip(prank, 0, NF - 1)], NF)
    pl_coef = pl_coef.at[pslot].set(pm.obs_world, mode="drop")
    pl_cloud = pl_cloud.at[pslot].set(cloud_w, mode="drop")
    pl_cloud_valid = pl_cloud_valid.at[pslot].set(
        feats.planes.cloud_valid, mode="drop")
    pl_valid = state.pl_valid.at[pslot].set(True, mode="drop")
    pl_obs = pl_obs.at[pslot].set(1, mode="drop")
    pl_first = state.pl_first_kf.at[pslot].set(k, mode="drop")

    # per-keyframe plane observation row (KeyFrame::AddMapPlane; feeds
    # LocalBA/GBA EdgePlane/EdgeParallelPlane/EdgeVerticalPlane,
    # Optimizer.cc:2441-2562): direct id = match or freshly created slot
    NFcap = state.pl_coef.shape[0]
    kf_pl_row = jnp.where(matched, pm.match_idx,
                          jnp.where(pcan & (pslot < NFcap),
                                    pslot.astype(jnp.int32), -1))
    kf_pl_row = jnp.where(feats.planes.valid, kf_pl_row, -1)
    par_row = jnp.where(feats.planes.valid, pm.par_idx, -1)
    ver_row = jnp.where(feats.planes.valid, pm.ver_idx, -1)

    state = state._replace(pl_coef=pl_coef, pl_cloud=pl_cloud,
                           pl_cloud_valid=pl_cloud_valid, pl_valid=pl_valid,
                           pl_obs_count=pl_obs, pl_first_kf=pl_first,
                           kf_pl=state.kf_pl.at[k].set(kf_pl_row),
                           kf_pl_par=state.kf_pl_par.at[k].set(par_row),
                           kf_pl_ver=state.kf_pl_ver.at[k].set(ver_row),
                           kf_pl_obs=state.kf_pl_obs.at[k].set(
                               feats.planes.coeffs))

    # ---- lines: add unmatched 3D lines, bump matched ------------------------
    NL = cfg.map.max_lines
    ep_w = jnp.concatenate([
        se3.transform_points(T_wc, feats.lines.ep3d[:, :3]),
        se3.transform_points(T_wc, feats.lines.ep3d[:, 3:])], -1)
    dir_w = (feats.lines.dir3d @ T_wc[:3, :3].T)
    lmatched = lm_idx >= 0
    ln_found = state.ln_found.at[jnp.clip(lm_idx, 0)].add(
        lmatched.astype(jnp.int32))
    ln_obs = state.ln_obs_count.at[jnp.clip(lm_idx, 0)].add(
        lmatched.astype(jnp.int32))
    new_ln = feats.lines.has3d & (lm_idx < 0)
    lslots_all = _free_slots(state.ln_valid)
    lrank = jnp.cumsum(new_ln) - 1
    lfree = jnp.sum(~state.ln_valid)
    lcan = new_ln & (lrank < lfree)
    lslot = jnp.where(lcan, lslots_all[jnp.clip(lrank, 0, NL - 1)], NL)
    # per-keyframe line observation row (KeyFrame::AddMapLine; feeds BA
    # EdgeLineProjectXYZ): matched map line or freshly created slot
    kf_ln_row = jnp.where(lmatched, lm_idx,
                          jnp.where(lcan & (lslot < NL),
                                    lslot.astype(jnp.int32), -1))
    kf_ln_row = jnp.where(feats.lines.valid, kf_ln_row, -1)
    # matched-line geometry refresh (MapLine::UpdateAverageDir,
    # src/MapLine.cpp): direction is the obs-count-weighted running average
    # (new observation sign-aligned first), endpoints become the EXTREMES of
    # old+new endpoints projected on the refreshed direction -- re-observed
    # lines extend and straighten instead of freezing at creation.
    lmids = jnp.clip(lm_idx, 0)
    d_old = state.ln_dir[lmids]
    # geometry refresh requires direction AGREEMENT (<~11 deg): a
    # descriptor-aliased match to a different physical line must not be
    # averaged in -- extend-to-extremes would glue the two lines into one
    # long wrong segment and poison every later projection match
    d_agree = jnp.abs(jnp.sum(d_old * dir_w, -1)) > 0.98
    lm_tgt = jnp.where(lmatched & d_agree, lm_idx, NL)
    flip = jnp.sign(jnp.sum(d_old * dir_w, -1, keepdims=True))
    flip = jnp.where(flip == 0.0, 1.0, flip)
    w_obs = state.ln_obs_count[lmids].astype(jnp.float32)[:, None]
    d_avg = d_old * w_obs + dir_w * flip
    d_avg = d_avg / jnp.maximum(
        jnp.linalg.norm(d_avg, axis=-1, keepdims=True), 1e-9)
    eps4 = jnp.stack([state.ln_ep[lmids, :3], state.ln_ep[lmids, 3:],
                      ep_w[:, :3], ep_w[:, 3:]], 1)         # (Fl, 4, 3)
    ctr = jnp.mean(eps4, 1)
    s4 = jnp.einsum("fpc,fc->fp", eps4 - ctr[:, None], d_avg)
    ep_lo = ctr + jnp.min(s4, 1)[:, None] * d_avg
    ep_hi = ctr + jnp.max(s4, 1)[:, None] * d_avg
    ep_refreshed = jnp.concatenate([ep_lo, ep_hi], -1)
    ln_ep2 = state.ln_ep.at[lm_tgt].set(ep_refreshed, mode="drop")
    ln_dir2 = state.ln_dir.at[lm_tgt].set(d_avg, mode="drop")
    state = state._replace(
        ln_ep=ln_ep2.at[lslot].set(ep_w, mode="drop"),
        ln_dir=ln_dir2.at[lslot].set(dir_w, mode="drop"),
        ln_desc=state.ln_desc.at[lslot].set(feats.lines.desc, mode="drop"),
        ln_valid=state.ln_valid.at[lslot].set(True, mode="drop"),
        ln_obs_count=ln_obs.at[lslot].set(1, mode="drop"),
        ln_found=ln_found.at[lslot].set(1, mode="drop"),
        ln_visible=state.ln_visible.at[lslot].set(1, mode="drop"),
        ln_first_kf=state.ln_first_kf.at[lslot].set(k, mode="drop"),
        kf_ln=state.kf_ln.at[k].set(kf_ln_row),
        kf_ln_obs=state.kf_ln_obs.at[k].set(feats.lines.lineq),
        kf_ln_xyz=state.kf_ln_xyz.at[k].set(
            jnp.where(feats.lines.has3d[:, None], feats.lines.ep3d, 0.0)),
        n_lns=jnp.sum(state.ln_valid.at[lslot].set(True, mode="drop")),
        n_pts=jnp.sum(pt_valid),
    )
    return state, k


@functools.partial(jax.jit, donate_argnums=(0,))
def cull_map(state: MapState, merge_angle_cos: float = 0.985,
             merge_dist: float = 0.05) -> MapState:
    """LocalMapping culling pass:
    - map points with found/visible < 0.25 after enough sightings die
      (MapPointCulling, LocalMapping.cc:175)
    - duplicate planes merge into the older slot (MapPlaneCulling + merge,
      LocalMapping.cc:239-276)
    - map lines with poor found/visible die (MapLineCulling)."""
    vis = jnp.maximum(state.pt_visible, 1)
    ratio = state.pt_found.astype(jnp.float32) / vis.astype(jnp.float32)
    bad = state.pt_valid & (state.pt_visible > 8) & (ratio < 0.25)
    pt_valid = state.pt_valid & ~bad

    # Erase keyframe observations of dead points (MapPoint::SetBadFlag erases
    # itself from every observing keyframe, src/MapPoint.cc). Without this,
    # add_keyframe's slot recycling would silently re-attach old keyframes'
    # uv observations to an unrelated new landmark, corrupting BA,
    # covisibility counts and loop verification.
    stale = (state.kf_mp >= 0) & ~pt_valid[jnp.clip(state.kf_mp, 0)]
    kf_mp = jnp.where(stale, -1, state.kf_mp)
    pt_obs_count = jnp.where(pt_valid, state.pt_obs_count, 0)

    lvis = jnp.maximum(state.ln_visible, 1)
    lratio = state.ln_found.astype(jnp.float32) / lvis.astype(jnp.float32)
    lbad = state.ln_valid & (state.ln_visible > 8) & (lratio < 0.2)
    ln_valid = state.ln_valid & ~lbad

    # map-line fusion (LSDmatcher::Fuse role, LSDmatcher.cpp:750,884):
    # segments with mutually-close endpoints (either order), aligned
    # directions and similar descriptors are duplicates -- the loser (fewer
    # observations; ties to the higher slot) dies, the winner inherits its
    # statistics
    e1 = state.ln_ep[:, :3]
    e2 = state.ln_ep[:, 3:]
    d11 = jnp.linalg.norm(e1[:, None] - e1[None], axis=-1)
    d22 = jnp.linalg.norm(e2[:, None] - e2[None], axis=-1)
    d12 = jnp.linalg.norm(e1[:, None] - e2[None], axis=-1)
    d21 = jnp.linalg.norm(e2[:, None] - e1[None], axis=-1)
    d_pair = jnp.minimum(jnp.maximum(d11, d22), jnp.maximum(d12, d21))
    dir_ok = jnp.abs(jnp.einsum("ic,jc->ij", state.ln_dir, state.ln_dir)) > 0.966
    lham = hamming_matrix(state.ln_desc, state.ln_desc)
    NLn = e1.shape[0]
    li = jnp.arange(NLn)
    same_pair = (ln_valid[:, None] & ln_valid[None, :]
                 & (d_pair < 0.10) & dir_ok & (lham <= 80.0)
                 & (li[:, None] != li[None, :]))
    i_wins = ((state.ln_obs_count[:, None] > state.ln_obs_count[None, :])
              | ((state.ln_obs_count[:, None] == state.ln_obs_count[None, :])
                 & (li[:, None] < li[None, :])))
    lose_to = same_pair & i_wins           # [i, j]: j loses to i
    loser = jnp.any(lose_to, 0)
    winner_of = jnp.argmax(lose_to, 0)     # first winning i per j
    gain_tgt = jnp.where(loser, winner_of, NLn)
    ln_obs2 = state.ln_obs_count.at[gain_tgt].add(
        jnp.where(loser, state.ln_obs_count, 0), mode="drop")
    ln_found2 = state.ln_found.at[gain_tgt].add(
        jnp.where(loser, state.ln_found, 0), mode="drop")
    ln_valid = ln_valid & ~loser

    # plane merge: j merges into i if i<j, normals aligned, i's plane passes
    # through j's cloud
    n = state.pl_coef[:, :3]
    cosang = jnp.abs(n @ n.T)
    dist = jnp.abs(jnp.einsum("ic,jqc->ijq", n, state.pl_cloud)
                   + state.pl_coef[:, 3][:, None, None])
    dist = jnp.where(state.pl_cloud_valid[None], dist, jnp.inf)
    mind = jnp.min(dist, -1)
    NF = n.shape[0]
    ii = jnp.arange(NF)
    dup = (state.pl_valid[:, None] & state.pl_valid[None, :]
           & (cosang > merge_angle_cos) & (mind < merge_dist)
           & (ii[:, None] < ii[None, :]))
    merged_away = jnp.any(dup, 0)
    pl_valid = state.pl_valid & ~merged_away

    # rewrite keyframe structural observations through the merges and drop
    # entries whose landmark died (MapPlane/MapLine::Replace + SetBadFlag
    # erase themselves from observing keyframes) -- stale ids would attach
    # old observations to unrelated recycled slots in BA
    pl_redirect = jnp.where(merged_away, jnp.argmax(dup, 0), ii)

    def _remap(tab, redirect, alive):
        t = jnp.where(tab >= 0, redirect[jnp.clip(tab, 0)], -1)
        return jnp.where((t >= 0) & alive[jnp.clip(t, 0)], t, -1)

    kf_pl = _remap(state.kf_pl, pl_redirect, pl_valid)
    kf_pl_par = _remap(state.kf_pl_par, pl_redirect, pl_valid)
    kf_pl_ver = _remap(state.kf_pl_ver, pl_redirect, pl_valid)
    ln_redirect = jnp.where(loser, winner_of, li)
    kf_ln = _remap(state.kf_ln, ln_redirect, ln_valid)

    return state._replace(pt_valid=pt_valid, pl_valid=pl_valid,
                          ln_valid=ln_valid, kf_mp=kf_mp,
                          kf_pl=kf_pl, kf_pl_par=kf_pl_par,
                          kf_pl_ver=kf_pl_ver, kf_ln=kf_ln,
                          ln_obs_count=ln_obs2, ln_found=ln_found2,
                          pt_obs_count=pt_obs_count, n_pts=jnp.sum(pt_valid),
                          n_lns=jnp.sum(ln_valid))


# ===========================================================================
# LocalMapping completion: fuse, keyframe culling, triangulation
# ===========================================================================


def _recount_point_obs(kf_mp, kf_kp_valid, kf_valid, NP) -> jnp.ndarray:
    """(NP,) int32: exact per-point observation counts from the kf_mp table
    (alive keyframes only). The single source of truth after any merge."""
    NK, K = kf_mp.shape
    flat = kf_mp.reshape(-1)
    ok = ((flat >= 0) & kf_kp_valid.reshape(-1)
          & jnp.repeat(kf_valid, K))
    tgt = jnp.where(ok, flat, NP)
    return jnp.zeros(NP + 1, jnp.int32).at[tgt].add(1)[:NP]


def _dedup_kf_rows(kf_mp: jnp.ndarray) -> jnp.ndarray:
    """Per keyframe row, keep only the first feature observing each map
    point (a merge can leave two features of one KF pointing at the same
    landmark, which would double-count its BA observation)."""

    def dedup_row(row):
        order = jnp.argsort(row)          # stable: first feature wins
        srt = row[order]
        dup_s = (srt == jnp.roll(srt, 1)) & (srt >= 0)
        dup_s = dup_s.at[0].set(False)
        dup = jnp.zeros_like(dup_s).at[order].set(dup_s)
        return jnp.where(dup, -1, row)

    return jax.vmap(dedup_row)(kf_mp)


def fuse_new_points(state: MapState, new_kf,
                    fuse_dist: float = 0.05,
                    max_hamming: float = TH_LOW) -> MapState:
    """Merge landmarks created by keyframe `new_kf` into pre-existing
    landmarks they duplicate (capability of SearchInNeighbors /
    ORBmatcher::Fuse, LocalMapping.cc:1039 / ORBmatcher.cc:829: the
    reference projects and replaces; here duplicates are found directly by
    3D proximity + descriptor distance, then every keyframe observation of
    the loser is rewritten to the winner -- MapPoint::Replace semantics)."""
    new = state.pt_valid & (state.pt_first_kf == new_kf)
    return fuse_points_mask(state, new, fuse_dist, max_hamming)


@functools.partial(jax.jit, donate_argnums=(0,))
def fuse_points_mask(state: MapState, new: jnp.ndarray,
                     fuse_dist: float = 0.05,
                     max_hamming: float = TH_LOW) -> MapState:
    """Merge each point in `new` into its nearest duplicate OUTSIDE `new`
    (3D proximity + descriptor gate). Shared by per-keyframe fuse and by
    loop-closure SearchAndFuse (LoopClosing.cc:633), where `new` is the
    current loop side of the seam."""
    from dr_slam_tpu.ops.orb import bits_to_signs, unpack_bits

    NP = state.pt_pos.shape[0]
    NK, K = state.kf_mp.shape
    new = state.pt_valid & new
    old = state.pt_valid & ~new

    # compact the (<= K) new points into fixed-size tables
    rank = jnp.cumsum(new) - 1
    tgt = jnp.where(new & (rank < K), rank, K)
    new_ids = jnp.full(K + 1, -1, jnp.int32).at[tgt].set(
        jnp.arange(NP, dtype=jnp.int32))[:K]
    has_new = new_ids >= 0
    ids = jnp.clip(new_ids, 0)
    pos_new = state.pt_pos[ids]                        # (K, 3)
    sg_new = bits_to_signs(unpack_bits(state.pt_desc[ids]))  # (K, 256)

    C = min(_MATCH_CHUNK, NP)
    n_chunks = -(-NP // C)
    pad = n_chunks * C - NP

    def pad_to(x, fill=0):
        if pad == 0:
            return x
        return jnp.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1),
                       constant_values=fill)

    pos_ch = pad_to(state.pt_pos, 1e9).reshape(n_chunks, C, 3)
    old_ch = pad_to(old, False).reshape(n_chunks, C)
    sg_ch = bits_to_signs(unpack_bits(pad_to(state.pt_desc))
                          ).reshape(n_chunks, C, 256)
    offs = jnp.arange(n_chunks, dtype=jnp.int32) * C

    def body(carry, chunk):
        best_d, best_i = carry
        pc, oc, sc, off = chunk
        d2 = jnp.sum((pos_new[:, None] - pc[None]) ** 2, -1)   # (K, C)
        ham = (256.0 - jnp.dot(sg_new, sc.T,
                               preferred_element_type=jnp.float32)) * 0.5
        gate = (oc[None, :] & has_new[:, None]
                & (d2 < fuse_dist * fuse_dist) & (ham <= max_hamming))
        D = jnp.where(gate, d2, jnp.inf)
        cmin = jnp.min(D, 1)
        carg = jnp.argmin(D, 1).astype(jnp.int32)
        upd = cmin < best_d
        return (jnp.minimum(best_d, cmin),
                jnp.where(upd, carg + off, best_i)), None

    init = (jnp.full((K,), jnp.inf), jnp.zeros((K,), jnp.int32))
    (best_d, best_old), _ = jax.lax.scan(
        body, init, (pos_ch, old_ch, sg_ch, offs))
    fused = has_new & jnp.isfinite(best_d)

    # redirect table: loser -> winner
    redirect = jnp.arange(NP, dtype=jnp.int32)
    redirect = redirect.at[jnp.where(fused, ids, NP)].set(
        best_old, mode="drop")
    kf_mp = jnp.where(state.kf_mp >= 0,
                      redirect[jnp.clip(state.kf_mp, 0)], state.kf_mp)
    kf_mp = _dedup_kf_rows(kf_mp)

    # the winner inherits the loser's match statistics (MapPoint::Replace
    # accumulates nVisible/nFound onto the replacement)
    win = jnp.where(fused, best_old, NP)
    lose = jnp.clip(ids, 0)
    pt_visible = state.pt_visible.at[win].add(
        jnp.where(fused, state.pt_visible[lose], 0), mode="drop")
    pt_found = state.pt_found.at[win].add(
        jnp.where(fused, state.pt_found[lose], 0), mode="drop")
    pt_valid = state.pt_valid.at[jnp.where(fused, ids, NP)].set(
        False, mode="drop")
    pt_obs = _recount_point_obs(kf_mp, state.kf_kp_valid, state.kf_valid, NP)
    pt_obs = jnp.where(pt_valid, pt_obs, 0)
    return state._replace(kf_mp=kf_mp, pt_valid=pt_valid,
                          pt_visible=pt_visible, pt_found=pt_found,
                          pt_obs_count=pt_obs, n_pts=jnp.sum(pt_valid))


@functools.partial(jax.jit, donate_argnums=(0,),
                   static_argnames=("keep_recent", "force"))
def cull_one_keyframe(state: MapState, redundancy: float = 0.9,
                      min_obs: int = 20, keep_recent: int = 2,
                      force: bool = False) -> MapState:
    """KeyFrameCulling (LocalMapping.cc:1226): erase the most redundant
    keyframe whose observations are >= `redundancy` covered by >= 3 other
    keyframes. One cull per call (per keyframe insertion) -- culling many at
    once could cascade two mutually-redundant keyframes away together. The
    first keyframe (seq 0) and the `keep_recent` newest are protected.

    force=True: evict the MOST redundant non-protected keyframe even when
    none passes the redundancy threshold. The reference has no capacity
    wall (its KeyFrameCulling is purely opportunistic); a fixed-capacity
    map must keep inserting when the tracker demands a new reference view,
    so at the wall the least informative old keyframe yields its slot --
    threshold-passing candidates still win when they exist."""
    NK, K = state.kf_mp.shape
    NP = state.pt_pos.shape[0]
    obs = _recount_point_obs(state.kf_mp, state.kf_kp_valid, state.kf_valid,
                             NP)
    entry_ok = ((state.kf_mp >= 0) & state.kf_kp_valid
                & state.kf_valid[:, None]
                & state.pt_valid[jnp.clip(state.kf_mp, 0)])
    well = obs[jnp.clip(state.kf_mp, 0)] >= 4          # self + 3 others
    n_obs = jnp.sum(entry_ok, 1)
    n_red = jnp.sum(entry_ok & well, 1)

    seq = state.kf_seq
    recent_th = jax.lax.top_k(seq, keep_recent)[0][keep_recent - 1]
    protect = (seq <= 0) | (seq >= jnp.maximum(recent_th, 1))
    ratio = n_red.astype(jnp.float32) / jnp.maximum(n_obs, 1).astype(jnp.float32)
    cand = (state.kf_valid & ~protect & (n_obs >= min_obs)
            & (ratio > redundancy))
    if force:
        fallback = state.kf_valid & ~protect
        score = jnp.where(cand, ratio + 10.0,
                          jnp.where(fallback, ratio, -1.0))
        kill = jnp.argmax(score).astype(jnp.int32)
        do = jnp.any(cand | fallback)
    else:
        kill = jnp.argmax(jnp.where(cand, ratio, -1.0)).astype(jnp.int32)
        do = jnp.any(cand)

    kf_valid = jnp.where(do, state.kf_valid.at[kill].set(False),
                         state.kf_valid)
    kf_mp = jnp.where(do, state.kf_mp.at[kill].set(-1), state.kf_mp)
    kf_seq = jnp.where(do, state.kf_seq.at[kill].set(-1), state.kf_seq)
    kf_kp_valid = jnp.where(do, state.kf_kp_valid.at[kill].set(False),
                            state.kf_kp_valid)

    # refresh per-point bookkeeping: observation counts, liveness (a point
    # whose only observer died dies too), and the re-anchoring reference
    # keyframe (pt_first_kf must stay an ALIVE slot for loop correction)
    pt_obs = _recount_point_obs(kf_mp, kf_kp_valid, kf_valid, NP)
    pt_valid = state.pt_valid & (pt_obs > 0)
    flat = kf_mp.reshape(-1)
    rows = jnp.repeat(jnp.arange(NK, dtype=jnp.int32), K)
    ok = (flat >= 0) & kf_kp_valid.reshape(-1) & jnp.repeat(kf_valid, K)
    first = jnp.full(NP + 1, NK, jnp.int32).at[
        jnp.where(ok, flat, NP)].min(rows)[:NP]
    pt_first_kf = jnp.where(pt_valid & (first < NK), first,
                            state.pt_first_kf)
    return state._replace(
        kf_valid=kf_valid, kf_mp=kf_mp, kf_seq=kf_seq,
        kf_kp_valid=kf_kp_valid, pt_obs_count=jnp.where(pt_valid, pt_obs, 0),
        pt_valid=pt_valid, pt_first_kf=pt_first_kf,
        n_pts=jnp.sum(pt_valid), n_kfs=jnp.sum(kf_valid).astype(jnp.int32))


@functools.partial(jax.jit, donate_argnums=(0,))
def triangulate_with_kf(state: MapState, kf_a, kf_b, K4,
                        max_hamming: float = TH_LOW,
                        epipolar_chi2: float = 3.84,
                        min_parallax_cos: float = 0.9998,
                        reproj_chi2: float = 5.991) -> MapState:
    """CreateNewMapPoints (LocalMapping.cc:309): epipolar-gated descriptor
    matching between keyframe `kf_a` (new) and `kf_b` (neighbor) over
    features with NO landmark and NO valid depth, then two-view mid-point
    triangulation -- landmarks in depth-hole regions (beyond the sensor
    range, holes, reflective surfaces) that per-frame depth can never
    create. Parallax / positive-depth / reprojection gates as in the
    reference."""
    NP = state.pt_pos.shape[0]
    NK, K = state.kf_mp.shape
    fx, fy, cx, cy = K4
    Km = jnp.asarray([[fx, 0, cx], [0, fy, cy], [0, 0, 1.0]])

    # eligible: no landmark AND no usable depth (none measured, or beyond
    # the depth-creation cap -- the reference triangulates far points too)
    def _free(kf):
        no_depth = (state.kf_ur[kf] < 0) | (state.kf_xyz[kf, :, 2] >= 8.0)
        return state.kf_kp_valid[kf] & (state.kf_mp[kf] < 0) & no_depth

    # degenerate pair guard (kf_a == kf_b: first keyframe after init or a
    # recycled slot) handled IN-jit so the caller never pays a host readback
    # of the device keyframe id just to compare it
    distinct = jnp.asarray(kf_a) != jnp.asarray(kf_b)
    free_a = _free(kf_a) & distinct
    free_b = _free(kf_b)

    ham = hamming_matrix(state.kf_desc[kf_a], state.kf_desc[kf_b])
    T_a = state.kf_pose[kf_a]
    T_b = state.kf_pose[kf_b]
    # relative pose b -> a and fundamental matrix F_ab (x_b' F x_a = 0 with
    # x in pixels): F = K^-T [t]x R K^-1 for the a->b transform
    T_ba = T_b @ se3.inv_T(T_a)
    R = T_ba[:3, :3]
    t = T_ba[:3, 3]
    tx = jnp.asarray([[0, -t[2], t[1]], [t[2], 0, -t[0]], [-t[1], t[0], 0.0]])
    Kinv = jnp.linalg.inv(Km)
    F = Kinv.T @ tx @ R @ Kinv

    uv_a = state.kf_uv[kf_a]
    uv_b = state.kf_uv[kf_b]
    ones = jnp.ones((K, 1))
    xa = jnp.concatenate([uv_a, ones], -1)                 # (K, 3)
    xb = jnp.concatenate([uv_b, ones], -1)
    l_b = xa @ F.T                                          # (K, 3) lines in b
    num = jnp.abs(jnp.einsum("ac,bc->ab", l_b, xb))         # (Ka, Kb)
    den = jnp.sqrt(l_b[:, 0] ** 2 + l_b[:, 1] ** 2)[:, None]
    d_epi = num / jnp.maximum(den, 1e-9)
    sigma_b = jnp.sqrt(state.kf_sigma2[kf_b])[None, :]
    epi_ok = d_epi < jnp.sqrt(epipolar_chi2) * sigma_b

    gate = free_a[:, None] & free_b[None, :] & epi_ok
    D = jnp.where(gate, ham, jnp.inf)
    best_b = jnp.argmin(D, 1).astype(jnp.int32)
    a_idx = jnp.arange(K)
    best_d = D[a_idx, best_b]
    rev = jnp.argmin(D, 0).astype(jnp.int32)
    m_ok = (best_d <= max_hamming) & (rev[best_b] == a_idx)

    # --- mid-point triangulation in world coordinates -----------------------
    T_wa = se3.inv_T(T_a)
    T_wb = se3.inv_T(T_b)
    o_a = T_wa[:3, 3]
    o_b = T_wb[:3, 3]
    ray_a = jnp.stack([(uv_a[:, 0] - cx) / fx, (uv_a[:, 1] - cy) / fy,
                       jnp.ones(K)], -1) @ T_wa[:3, :3].T   # (K, 3)
    uvb = uv_b[best_b]
    ray_b = jnp.stack([(uvb[:, 0] - cx) / fx, (uvb[:, 1] - cy) / fy,
                       jnp.ones(K)], -1) @ T_wb[:3, :3].T
    # solve min |o_a + s ra - o_b - u rb|: 2x2 normal equations
    raa = jnp.sum(ray_a * ray_a, -1)
    rbb = jnp.sum(ray_b * ray_b, -1)
    rab = jnp.sum(ray_a * ray_b, -1)
    dov = o_b - o_a
    pa = jnp.sum(ray_a * dov, -1)
    pb = jnp.sum(ray_b * dov, -1)
    det = raa * rbb - rab * rab
    safe_det = jnp.where(jnp.abs(det) < 1e-9, 1e-9, det)
    s = (pa * rbb - pb * rab) / safe_det
    u = (pa * rab - pb * raa) / safe_det
    X = 0.5 * (o_a + s[:, None] * ray_a + o_b + u[:, None] * ray_b)

    norm_a = ray_a / jnp.linalg.norm(ray_a, axis=-1, keepdims=True)
    norm_b = ray_b / jnp.linalg.norm(ray_b, axis=-1, keepdims=True)
    parallax = jnp.sum(norm_a * norm_b, -1)

    Xc_a = se3.transform_points(T_a, X)
    Xc_b = se3.transform_points(T_b, X)
    uv_ra = se3.project(jnp.asarray(K4, jnp.float32), Xc_a)
    uv_rb = se3.project(jnp.asarray(K4, jnp.float32), Xc_b)
    e_a = jnp.sum((uv_ra - uv_a) ** 2, -1) / state.kf_sigma2[kf_a]
    e_b = jnp.sum((uv_rb - uvb) ** 2, -1) / state.kf_sigma2[kf_b][best_b]
    good = (m_ok & (Xc_a[:, 2] > 0.1) & (Xc_b[:, 2] > 0.1)
            & (parallax < min_parallax_cos) & (parallax > 0.0)
            & (e_a < reproj_chi2) & (e_b < reproj_chi2)
            & jnp.all(jnp.isfinite(X), -1))

    # --- allocate point slots ------------------------------------------------
    slots_all = _free_slots(state.pt_valid)
    rank = jnp.cumsum(good) - 1
    n_free = jnp.sum(~state.pt_valid)
    can = good & (rank < n_free)
    slot = jnp.where(can, slots_all[jnp.clip(rank, 0, NP - 1)], NP)
    view = X - o_a
    dist_a = jnp.linalg.norm(view, axis=-1)
    view = view / jnp.maximum(dist_a[:, None], 1e-9)
    # scale-invariance band from the creating keyframe's octave (sigma2 =
    # scale^(2*oct)); span fixed at the default 8-level/1.2 pyramid
    dmax_tri = dist_a * jnp.sqrt(state.kf_sigma2[kf_a])
    span_tri = 1.2 ** 7
    two = jnp.full((K,), 2, jnp.int32)
    state = state._replace(
        pt_pos=state.pt_pos.at[slot].set(X, mode="drop"),
        pt_normal=state.pt_normal.at[slot].set(view, mode="drop"),
        pt_dist_max=state.pt_dist_max.at[slot].set(dmax_tri, mode="drop"),
        pt_dist_min=state.pt_dist_min.at[slot].set(dmax_tri / span_tri,
                                                   mode="drop"),
        pt_desc=state.pt_desc.at[slot].set(state.kf_desc[kf_a], mode="drop"),
        pt_desc_ring=state.pt_desc_ring.at[slot].set(
            jnp.broadcast_to(state.kf_desc[kf_a][:, None, :],
                             (K, state.pt_desc_ring.shape[1], 8)),
            mode="drop"),
        pt_angle=state.pt_angle.at[slot].set(state.kf_angle[kf_a],
                                             mode="drop"),
        pt_valid=state.pt_valid.at[slot].set(True, mode="drop"),
        pt_visible=state.pt_visible.at[slot].set(two, mode="drop"),
        pt_found=state.pt_found.at[slot].set(two, mode="drop"),
        pt_obs_count=state.pt_obs_count.at[slot].set(two, mode="drop"),
        pt_first_kf=state.pt_first_kf.at[slot].set(kf_a, mode="drop"),
    )
    slot_c = jnp.clip(slot, 0, NP - 1).astype(jnp.int32)
    row_a = state.kf_mp[kf_a].at[jnp.where(can, a_idx, K)].set(
        slot_c, mode="drop")
    row_b = state.kf_mp[kf_b].at[jnp.where(can, best_b, K)].set(
        slot_c, mode="drop")
    kf_mp = state.kf_mp.at[kf_a].set(row_a).at[kf_b].set(row_b)
    return state._replace(kf_mp=kf_mp, n_pts=jnp.sum(state.pt_valid))


@jax.jit
def covisible_keyframes(state: MapState, mp_idx: jnp.ndarray) -> jnp.ndarray:
    """(NK,) int32: per-keyframe count of shared map points with the given
    match set -- the covisibility weights used by UpdateLocalKeyFrames
    (Tracking.cc:3447), computed as one gather+reduce."""
    NP = state.pt_pos.shape[0]
    indicator = jnp.zeros(NP + 1, dtype=jnp.int32).at[
        jnp.where(mp_idx >= 0, mp_idx, NP)].set(1)
    counts = indicator[jnp.clip(state.kf_mp, 0)] * (state.kf_mp >= 0)
    return jnp.sum(counts, -1) * state.kf_valid
