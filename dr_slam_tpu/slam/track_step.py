"""The fused per-frame tracking step: ONE device program.

The reference interleaves matching, optimization and bookkeeping across
threads and data structures (Tracking.cc:242-724). The TPU-native version
fuses the whole normal-tracking path -- Manhattan mean shift, pose
prediction, projection + reference-KF matching, two-stage pose optimization
with structural plane edges, local-map rematch, landmark statistics -- into
a single jit with NO host round-trips: the host reads back one small scalar
bundle per frame to run the keyframe/LOST state machine.

All branching is speculative/branchless (both prediction variants are
computed and selected on device); at ~1 ms of device work per branch this is
cheaper than one host sync over the TPU link."""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from dr_slam_tpu.config import SlamConfig
from dr_slam_tpu.frontend.frame import FrameFeatures
from dr_slam_tpu.geometry import se3
from dr_slam_tpu.manhattan.tracker import track_manhattan_frame
from dr_slam_tpu.optimize.pose_opt import pose_optimize
from dr_slam_tpu.slam import map_ops
from dr_slam_tpu.slam.state import MapState


class TrackStepOut(NamedTuple):
    T_cw: jnp.ndarray          # (4, 4) optimized pose
    R_cm: jnp.ndarray          # (3, 3) refreshed Manhattan->camera
    n_matches: jnp.ndarray     # () int32 motion-stage matches
    n_inliers: jnp.ndarray     # () int32 final inliers
    man_ok: jnp.ndarray        # () bool
    jump: jnp.ndarray          # () float32 |t - t_pred|
    velocity: jnp.ndarray      # (4, 4) T_cur @ inv(T_last) -- computed on
                               # device so the host runs NO eager math per
                               # frame (each mini-program activation costs
                               # ~50-100 ms on the tunneled runtime)
    bundle: jnp.ndarray        # (23,) f32: T_cw.ravel() ++ [n_inliers,
                               # n_matches, man_ok, jump, n_close_tracked,
                               # n_close_untracked, ref_tracked] -- ONE host
                               # readback per frame instead of six (each
                               # fresh-buffer D2H costs ~90 ms on the axon
                               # tunnel; a completed one 1.2 ms)
    mp_idx: jnp.ndarray        # (K,) final per-keypoint map-point matches
    plane_match: jnp.ndarray   # (P,) map-plane ids (direct association)
    plane_par: jnp.ndarray     # (P,)
    plane_ver: jnp.ndarray     # (P,)
    line_match: jnp.ndarray    # (L,)
    visible: jnp.ndarray       # (NP,) map points in-frustum this frame --
                               # lets a deferred resolver RE-APPLY the
                               # visibility statistics onto a map state
                               # mutated since dispatch (new_map_state is
                               # the whole pytree and would clobber it)
    new_map_state: MapState    # with updated visibility statistics


@functools.partial(jax.jit, static_argnames=("cfg",))
def extract_and_track(gray, depth, state: MapState, T_last, velocity,
                      R_cm_prev, ref_kf, cfg: SlamConfig):
    """Front-end extraction + the fused track step as ONE device program.

    Per-frame alternation between two separate executables (extract_frame,
    track_step) costs ~400 ms/frame on the tunneled TPU runtime (program
    swap); fused, the steady-state frame is one dispatch + one ~30 ms
    readback. Returns (feats, TrackStepOut)."""
    from dr_slam_tpu.frontend.frame import _extract_frame
    feats = _extract_frame(gray, depth, cfg.camera, cfg.orb, cfg.plane,
                           cfg.line)
    return feats, track_step(state, feats, T_last, velocity, R_cm_prev,
                             ref_kf, cfg)


@functools.partial(jax.jit, static_argnames=("cfg",))
def track_step(state: MapState, feats: FrameFeatures, T_last, velocity,
               R_cm_prev, ref_kf, cfg: SlamConfig) -> TrackStepOut:
    cam = cfg.camera
    tr = cfg.tracking

    # --- Manhattan rotation tracking (Tracking.cc:328-332) ----------------
    # line evidence: man_dir/man_ok = metric 3D directions where depth
    # backed the lift, vanishing-point directions otherwise (Frame.cc:306)
    man = track_manhattan_frame(
        R_cm_prev, feats.normals, feats.normals_valid,
        feats.lines.man_dir, feats.lines.man_ok,
        cone_normals=cfg.manhattan.cone_angle_normals,
        cone_lines=cfg.manhattan.cone_angle_lines,
        kernel=cfg.manhattan.mean_shift_kernel,
        min_ratio=cfg.manhattan.min_sn_ratio,
        n_iterations=cfg.manhattan.n_iterations)
    man_ok = man.success & state.manhattan_ok

    # --- predict pose (velocity model; Manhattan R as rotation prior) -----
    T_vel = velocity @ T_last
    R_cw_man = man.R_cm @ state.R_wm.T        # Tracking.cc:347-350
    T_man = se3.make_T(R_cw_man, T_vel[:3, 3])
    T_pred = jnp.where(man_ok, T_man, T_vel)

    # --- stage 1: motion-model matching + full pose solve ------------------
    pm = map_ops.match_points_projection(
        state, feats.kp.uv, feats.kp.desc, feats.kp.valid, T_pred, cam.K4,
        radius=tr.motion_search_radius, max_hamming=64.0,
        width=cam.width, height=cam.height, kp_angle=feats.kp.angle,
        kp_octave=feats.kp.octave, pt_scale=cfg.orb.scale_factor,
        n_levels=cfg.orb.n_levels, max_candidates=tr.match_candidates,
        use_pallas=tr.pallas_matcher)
    mp_idx = pm.mp_idx
    if tr.use_ref_kf_anchor:
        # BoW-word-bucketed SearchByBoW (ORBmatcher.cc:160): same-word
        # restriction is what makes a pose-free descriptor match safe on
        # repetitive texture (TrackReferenceKeyFrame, Tracking.cc:2304).
        # Wrapped in lax.cond so the steady state (motion model healthy,
        # Tracking.cc:370-375 takes the fallback only on collapse) skips
        # both the frame-side word-assignment matmul (K,256)x(256,W) and
        # the KxK Hamming matmul entirely; the keyframe-side word ids are
        # cached in state.kf_word at insertion, never recomputed.
        from dr_slam_tpu.associate.vocabulary import word_ids

        use_ref = pm.n_matches < 20

        def _ref_fallback(_):
            kpw = word_ids(feats.kp.desc, cfg.map.vocab_words)
            ref = map_ops.match_reference_kf(
                state, ref_kf, feats.kp.desc, feats.kp.valid,
                kp_word=kpw, kf_word=state.kf_word[ref_kf])
            return ref.mp_idx

        ref_idx = jax.lax.cond(
            use_ref, _ref_fallback,
            lambda _: jnp.full_like(mp_idx, -1), operand=None)
        # strict FALLBACK, not a blend: pose-free descriptor matches only
        # replace the motion-model associations when projection matching
        # has collapsed -- otherwise they can override geometrically-gated
        # matches with aliased ones
        mp_idx = jnp.where(use_ref & (ref_idx >= 0), ref_idx, mp_idx)
        T_pred = jnp.where(use_ref, T_last, T_pred)

    plane_m = map_ops.match_planes(
        state, feats.planes.coeffs, feats.planes.valid, T_pred,
        assoc_ang=cfg.plane.association_ang_ref,
        assoc_dis=cfg.plane.association_dis_ref,
        par_th=cfg.plane.parallel_threshold,
        ver_th=cfg.plane.vertical_threshold)
    line_m = map_ops.match_lines_projection(
        state, feats.lines.seg2d, feats.lines.desc,
        feats.lines.valid & feats.lines.has3d, T_pred, cam.K4,
        width=cam.width, height=cam.height)
    no_lines = jnp.full_like(line_m.ml_idx, -1)
    lm_pose = line_m.ml_idx if tr.use_lines_in_pose else no_lines
    if not tr.use_planes_in_pose:
        plane_m = plane_m._replace(
            match_idx=jnp.full_like(plane_m.match_idx, -1),
            par_idx=jnp.full_like(plane_m.par_idx, -1),
            ver_idx=jnp.full_like(plane_m.ver_idx, -1))

    obs = map_ops.build_pose_obs(state, feats, mp_idx, plane_m, lm_pose,
                                 n_struct=cfg.map.max_kf_planes)
    # translation-only stage 1 when configured: rotation stays the
    # Manhattan-predicted one (TranslationWithMotionModel capability,
    # Tracking.cc:2544); stage 2 below always refines the full SE3
    opt = pose_optimize(
        T_pred, obs, cam.K4, cam.bf,
        translation_only=tr.translation_only_with_manhattan,
        struct_on=False,
        angle_info=cfg.plane.angle_info, dist_info=cfg.plane.distance_info,
        plane_chi2=cfg.plane.chi2, vp_chi2=cfg.plane.vp_chi2,
        prior_sigma_t=0.3, prior_sigma_r=0.03)

    # --- stage 2: local-map rematch at the refined pose + struct edges -----
    pm2 = map_ops.match_points_projection(
        state, feats.kp.uv, feats.kp.desc, feats.kp.valid, opt.T_cw, cam.K4,
        radius=tr.local_search_radius, max_hamming=map_ops.TH_LOW + 10.0,
        width=cam.width, height=cam.height, kp_angle=feats.kp.angle,
        kp_octave=feats.kp.octave, pt_scale=cfg.orb.scale_factor,
        n_levels=cfg.orb.n_levels, max_candidates=tr.match_candidates,
        use_pallas=tr.pallas_matcher)
    mp_idx2 = jnp.where(pm2.mp_idx >= 0, pm2.mp_idx, mp_idx)
    # Deduplicate across the two passes: stage-1 and stage-2 are each
    # mutually-exclusive internally, but a stage-1 carry-over can collide
    # with another keypoint's stage-2 win on the same map point, producing
    # duplicate observations in the pose solve and double obs counts at KF
    # insertion. Ownership table indexed by map-point id; stage-2 wins.
    NP = state.pt_pos.shape[0]
    K = mp_idx2.shape[0]
    k_idx = jnp.arange(K, dtype=jnp.int32)
    tgt = jnp.where(mp_idx2 >= 0, mp_idx2, NP)
    stage2 = pm2.mp_idx >= 0
    owner = jnp.full(NP + 1, -1, jnp.int32)
    owner = owner.at[jnp.where(~stage2, tgt, NP)].set(k_idx)
    owner = owner.at[jnp.where(stage2, tgt, NP)].set(k_idx)
    mp_idx2 = jnp.where(owner[jnp.clip(mp_idx2, 0)] == k_idx, mp_idx2, -1)
    plane_m2 = map_ops.match_planes(
        state, feats.planes.coeffs, feats.planes.valid, opt.T_cw,
        assoc_ang=cfg.plane.association_ang_ref,
        assoc_dis=cfg.plane.association_dis_ref,
        par_th=cfg.plane.parallel_threshold,
        ver_th=cfg.plane.vertical_threshold)
    if not tr.use_planes_in_pose:
        plane_m2 = plane_m2._replace(
            match_idx=jnp.full_like(plane_m2.match_idx, -1),
            par_idx=jnp.full_like(plane_m2.par_idx, -1),
            ver_idx=jnp.full_like(plane_m2.ver_idx, -1))
    obs2 = map_ops.build_pose_obs(state, feats, mp_idx2, plane_m2, lm_pose,
                                  n_struct=cfg.map.max_kf_planes)
    opt2 = pose_optimize(
        opt.T_cw, obs2, cam.K4, cam.bf, translation_only=False,
        struct_on=True,  # par/ver edges masked by their own validity
        angle_info=cfg.plane.angle_info, dist_info=cfg.plane.distance_info,
        plane_chi2=cfg.plane.chi2, vp_chi2=cfg.plane.vp_chi2,
        prior_sigma_t=0.3, prior_sigma_r=0.03)
    T_cur = opt2.T_cw

    # --- bookkeeping (MapPoint Increase{Visible,Found}) ---------------------
    new_state = map_ops.update_point_stats(state, pm2.visible, mp_idx2)

    # --- NeedNewKeyFrame inputs (Tracking.cc:2944-2964) ---------------------
    # close = depth-bearing keypoints nearer than mThDepth; tracked = holding
    # a map-point association after stage 2. ref_tracked mirrors
    # KeyFrame::TrackedMapPoints(nMinObs): the reference keyframe's live
    # map-point observations with >= nMinObs observers (nMinObs = 3, or 2
    # while the map holds <= 2 keyframes).
    close = feats.kp.valid & (feats.kp_depth > 1e-3) \
        & (feats.kp_depth < cam.th_depth_m)
    n_close_tracked = jnp.sum(close & (mp_idx2 >= 0))
    n_close_untracked = jnp.sum(close & (mp_idx2 < 0))
    ref_mp = state.kf_mp[ref_kf]
    # The reference uses TrackedMapPoints(nMinObs=3): its per-frame temporal
    # map-point creation (UpdateLastFrame) keeps observation counts high, so
    # that filter still leaves hundreds. Here observations accrue only at
    # keyframe insertion, so an obs>=3 filter collapses the denominator
    # right after the 3rd keyframe (measured: 96 vs ~200 inliers) and the
    # c2 gate deadlocks -- no keyframe can ever be inserted again. The
    # live-point count of the reference keyframe's row serves the same
    # intent (how much of the reference view is still available to track)
    # without the chicken-and-egg: slot culling already removes unreliable
    # points, which is what the obs floor guarded against.
    ref_tracked = jnp.sum((ref_mp >= 0)
                          & state.pt_valid[jnp.clip(ref_mp, 0)])

    # refreshed Manhattan rotation from the optimized pose (Tracking.cc:516)
    R_cm_new = jnp.where(state.manhattan_ok,
                         T_cur[:3, :3] @ state.R_wm, R_cm_prev)
    jump = jnp.linalg.norm(T_cur[:3, 3] - T_pred[:3, 3])
    velocity_new = T_cur @ se3.inv_T(T_last)
    bundle = jnp.concatenate([
        T_cur.reshape(-1),
        jnp.stack([opt2.n_inliers.astype(jnp.float32),
                   pm.n_matches.astype(jnp.float32),
                   man_ok.astype(jnp.float32), jump,
                   n_close_tracked.astype(jnp.float32),
                   n_close_untracked.astype(jnp.float32),
                   ref_tracked.astype(jnp.float32)])])
    return TrackStepOut(
        T_cw=T_cur, R_cm=R_cm_new, n_matches=pm.n_matches,
        n_inliers=opt2.n_inliers, man_ok=man_ok, jump=jump,
        velocity=velocity_new, bundle=bundle,
        mp_idx=mp_idx2, plane_match=plane_m2.match_idx,
        plane_par=plane_m2.par_idx, plane_ver=plane_m2.ver_idx,
        line_match=line_m.ml_idx, visible=pm2.visible,
        new_map_state=new_state)
