"""Tracking: the per-frame state machine (host orchestrator over jitted steps).

Capability of the reference Tracking (src/Tracking.cc:242 Track()): states
NOT_INITIALIZED / OK / LOST (Tracking.h:103-109), per frame:

1. front-end extraction            (frontend/frame.py -- one device program)
2. 3x Manhattan rotation tracking  (Tracking.cc:328-332)
3. motion-model tracking: project map into predicted pose, match, optimize
   -- translation-only when the Manhattan rotation is trusted
   (TranslationWithMotionModel, Tracking.cc:2544), full SE3 otherwise
   (TrackWithMotionModel, :2164); reference-KF descriptor matching as the
   low-match fallback (TrackReferenceKeyFrame, :2304)
4. local-map tracking with structural plane edges (TrackLocalMap, :2794,
   bStruct=true, :480)
5. Manhattan R refresh from the optimized pose (:516-521)
6. keyframe decision (NeedNewKeyFrame, :2907) -> insertion + local-mapping
   culling pass
7. LOST -> relocalization (:3543) via BoW candidates + PnP RANSAC

The reference holds the global map mutex across all of this
(Tracking.cc:255); here every step is a pure function of (MapState, frame),
and only small scalars (match counts, success flags) are read back to drive
the state machine."""

from __future__ import annotations

import enum
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from dr_slam_tpu.associate.vocabulary import compute_bow
from dr_slam_tpu.config import SlamConfig
from dr_slam_tpu.frontend.frame import FrameFeatures, extract_frame
from dr_slam_tpu.geometry import se3
from dr_slam_tpu.manhattan import find_manhattan, track_manhattan_frame
from dr_slam_tpu.optimize.pose_opt import pose_optimize
from dr_slam_tpu.slam import map_ops
from dr_slam_tpu.slam.state import MapState, make_empty_state


class TrackState(enum.Enum):
    NOT_INITIALIZED = 1
    OK = 2
    LOST = 3


@dataclass
class TrackingResult:
    T_cw: np.ndarray
    state: TrackState
    n_inliers: int
    n_matches: int
    manhattan_ok: bool
    is_keyframe: bool
    timestamp: float


@dataclass
class Tracker:
    cfg: SlamConfig
    metrics: object = None           # optional MetricsLogger
    state: TrackState = TrackState.NOT_INITIALIZED
    map_state: MapState = None
    T_cw: jnp.ndarray = None         # current pose
    velocity: jnp.ndarray = None     # T_cw(t) @ inv(T_cw(t-1))
    R_cm: jnp.ndarray = None         # Manhattan -> camera
    last_kf_frame: int = -1000
    ref_kf: int = 0
    frame_id: int = -1
    trajectory: list = field(default_factory=list)   # (ts, T_cw)
    kf_log: list = field(default_factory=list)

    def __post_init__(self):
        self.map_state = make_empty_state(self.cfg)
        self.T_cw = jnp.eye(4)
        self.velocity = jnp.eye(4)
        self.R_cm = jnp.eye(3)

    # ------------------------------------------------------------------
    def process_frame(self, gray, depth, timestamp: float) -> TrackingResult:
        self.frame_id += 1
        cfg = self.cfg
        gray = jnp.asarray(gray, dtype=jnp.float32)
        depth = jnp.asarray(depth, dtype=jnp.float32)
        feats = extract_frame(gray, depth, cfg)

        if self.state == TrackState.NOT_INITIALIZED:
            res = self._initialize(feats, timestamp)
        elif self.state == TrackState.LOST:
            res = self._relocalize(feats, timestamp)
        else:
            res = self._track(feats, timestamp)

        self.trajectory.append((timestamp, np.asarray(res.T_cw)))
        if self.metrics is not None:
            self.metrics.log("frame", idx=self.frame_id,
                             state=res.state.name, inliers=res.n_inliers,
                             matches=res.n_matches, kf=res.is_keyframe,
                             manhattan=res.manhattan_ok)
        return res

    # ------------------------------------------------------------------
    def _initialize(self, feats: FrameFeatures, ts: float) -> TrackingResult:
        """StereoInitialization (Tracking.cc:1549): first frame becomes
        KF0 at the origin; points from depth; planes seed the map; the
        Manhattan frame is bootstrapped from the frame's planes/lines
        (Map::FindManhattan)."""
        n_depth = int(jnp.sum(feats.kp.valid & (feats.kp_depth > 1e-3)))
        if n_depth < 200:
            return TrackingResult(np.eye(4), self.state, 0, 0, False, False, ts)

        T0 = jnp.eye(4)
        R_cm, mok = find_manhattan(
            feats.planes.coeffs[:, :3], feats.planes.valid,
            feats.planes.n_blocks.astype(jnp.float32),
            feats.lines.dir3d, feats.lines.has3d,
            vertical_cos=self.cfg.plane.vertical_threshold)
        if bool(mok):
            out = track_manhattan_frame(
                R_cm, feats.normals, feats.normals_valid,
                feats.lines.dir3d, feats.lines.has3d,
                cone_normals=self.cfg.manhattan.cone_angle_normals,
                cone_lines=self.cfg.manhattan.cone_angle_lines,
                kernel=self.cfg.manhattan.mean_shift_kernel,
                min_ratio=self.cfg.manhattan.min_sn_ratio)
            if bool(out.success):
                R_cm = out.R_cm
        self.R_cm = R_cm

        K = self.cfg.orb.max_keypoints
        no_match = jnp.full((K,), -1, jnp.int32)
        pm = map_ops.match_planes(self.map_state, feats.planes.coeffs,
                                  feats.planes.valid, T0)  # all unmatched
        lm = jnp.full((self.cfg.line.max_lines,), -1, jnp.int32)
        bow = compute_bow(feats.kp.desc, feats.kp.valid,
                          self.cfg.map.vocab_words)
        self.map_state, kf_id = map_ops.add_keyframe(
            self.map_state, feats, T0, ts, no_match, pm, lm, bow, self.cfg)
        # world frame = first camera; Manhattan axes in world = R_cm
        self.map_state = self.map_state._replace(
            R_wm=R_cm, manhattan_ok=jnp.asarray(bool(mok)))
        self.T_cw = T0
        self.velocity = jnp.eye(4)
        self.state = TrackState.OK
        self.last_kf_frame = self.frame_id
        self.ref_kf = int(kf_id)
        self.kf_log.append((ts, np.eye(4)))
        return TrackingResult(np.eye(4), self.state, n_depth, n_depth,
                              bool(mok), True, ts)

    # ------------------------------------------------------------------
    def _track(self, feats: FrameFeatures, ts: float) -> TrackingResult:
        cfg = self.cfg
        cam = cfg.camera
        st = self.map_state

        # --- Manhattan rotation (3 fixed-point calls inside the jit) -------
        man = track_manhattan_frame(
            self.R_cm, feats.normals, feats.normals_valid,
            feats.lines.dir3d, feats.lines.has3d,
            cone_normals=cfg.manhattan.cone_angle_normals,
            cone_lines=cfg.manhattan.cone_angle_lines,
            kernel=cfg.manhattan.mean_shift_kernel,
            min_ratio=cfg.manhattan.min_sn_ratio,
            n_iterations=cfg.manhattan.n_iterations)
        man_ok = bool(man.success) and bool(st.manhattan_ok)

        # --- predict pose ---------------------------------------------------
        T_pred = self.velocity @ self.T_cw
        if man_ok:
            # drift-free rotation: R_cw = R_cm @ R_wm^T (Tracking.cc:347-350)
            R_cw = man.R_cm @ st.R_wm.T
            T_pred = se3.make_T(R_cw, T_pred[:3, 3])

        # --- motion-model matching + pose opt -------------------------------
        pmres = map_ops.match_points_projection(
            st, feats.kp.uv, feats.kp.desc, feats.kp.valid, T_pred, cam.K4,
            radius=cfg.tracking.motion_search_radius, max_hamming=64.0,
            width=cam.width, height=cam.height, kp_angle=feats.kp.angle)
        n_matches = int(pmres.n_matches)
        # Always blend in prediction-FREE descriptor matches against the
        # reference keyframe (TrackReferenceKeyFrame capability,
        # Tracking.cc:2304). Projection matches are harvested inside a window
        # around the prediction, so they inherit its bias; the ref-KF matches
        # anchor the solve and break the velocity-feedback loop.
        ref = map_ops.match_reference_kf(st, jnp.asarray(self.ref_kf),
                                         feats.kp.desc, feats.kp.valid)
        if cfg.tracking.use_ref_kf_anchor:
            mp_idx = jnp.where(ref.mp_idx >= 0, ref.mp_idx, pmres.mp_idx)
        else:
            mp_idx = pmres.mp_idx
        if n_matches < 20:
            if int(ref.n_matches) > n_matches:
                n_matches = int(ref.n_matches)
                T_pred = self.T_cw  # no motion assumption

        plane_m = map_ops.match_planes(
            st, feats.planes.coeffs, feats.planes.valid, T_pred,
            assoc_ang=cfg.plane.association_ang_ref,
            assoc_dis=cfg.plane.association_dis_ref,
            par_th=cfg.plane.parallel_threshold,
            ver_th=cfg.plane.vertical_threshold)
        line_m = map_ops.match_lines_projection(
            st, feats.lines.seg2d, feats.lines.desc,
            feats.lines.valid & feats.lines.has3d, T_pred, cam.K4,
            width=cam.width, height=cam.height)
        lm_for_pose = (line_m.ml_idx if cfg.tracking.use_lines_in_pose
                       else jnp.full_like(line_m.ml_idx, -1))

        obs = map_ops.build_pose_obs(st, feats, mp_idx, plane_m, lm_for_pose,
                                     n_struct=cfg.map.max_kf_planes)
        # Full-pose solve with the Manhattan rotation as the *prior* in
        # T_pred -- the reference's active path (TrackWithMotionModel +
        # Manhattan re-derivation, Tracking.cc:365,516-521). The strict
        # TranslationWithMotionModel variant (Tracking.cc:2544) exists as
        # pose_optimize(translation_only=True) but locking the mean-shift
        # rotation bakes its ~0.5 deg noise into translation, so the default
        # pipeline uses it only as a prior.
        opt = pose_optimize(
            T_pred, obs, cam.K4, cam.bf,
            translation_only=False, struct_on=False,
            angle_info=cfg.plane.angle_info, dist_info=cfg.plane.distance_info,
            plane_chi2=cfg.plane.chi2, vp_chi2=cfg.plane.vp_chi2)
        n_inliers = int(opt.n_inliers)
        T_cur = opt.T_cw
        if n_inliers < 10 and man_ok:
            # retry from the pure velocity prediction (Tracking.cc:365-375)
            opt = pose_optimize(
                self.velocity @ self.T_cw, obs, cam.K4, cam.bf,
                translation_only=False, struct_on=False,
                angle_info=cfg.plane.angle_info,
                dist_info=cfg.plane.distance_info,
                plane_chi2=cfg.plane.chi2, vp_chi2=cfg.plane.vp_chi2)
            n_inliers = int(opt.n_inliers)
            T_cur = opt.T_cw
            man_ok = False

        # --- local-map tracking (re-match with refined pose) ----------------
        pmres2 = map_ops.match_points_projection(
            st, feats.kp.uv, feats.kp.desc, feats.kp.valid, T_cur, cam.K4,
            radius=6.0, max_hamming=map_ops.TH_LOW + 10.0,
            width=cam.width, height=cam.height, kp_angle=feats.kp.angle)
        mp_idx2 = jnp.where(pmres2.mp_idx >= 0, pmres2.mp_idx, mp_idx)
        plane_m2 = map_ops.match_planes(
            st, feats.planes.coeffs, feats.planes.valid, T_cur,
            assoc_ang=cfg.plane.association_ang_ref,
            assoc_dis=cfg.plane.association_dis_ref,
            par_th=cfg.plane.parallel_threshold,
            ver_th=cfg.plane.vertical_threshold)
        obs2 = map_ops.build_pose_obs(st, feats, mp_idx2, plane_m2,
                                      lm_for_pose,
                                      n_struct=cfg.map.max_kf_planes)
        # local-map stage always optimizes the FULL pose (the reference's
        # active path: PoseOptimization in TrackLocalMap, Tracking.cc:2810);
        # the Manhattan rotation only seeds it via T_cur.
        opt2 = pose_optimize(
            T_cur, obs2, cam.K4, cam.bf,
            translation_only=False, struct_on=man_ok,
            angle_info=cfg.plane.angle_info, dist_info=cfg.plane.distance_info,
            plane_chi2=cfg.plane.chi2, vp_chi2=cfg.plane.vp_chi2)
        n_inliers = int(opt2.n_inliers)
        T_cur = opt2.T_cw

        # --- bookkeeping ------------------------------------------------------
        self.map_state = map_ops.update_point_stats(st, pmres2.visible, mp_idx2)

        if n_inliers < 10:
            self.state = TrackState.LOST
            return TrackingResult(np.asarray(self.T_cw), self.state,
                                  n_inliers, n_matches, man_ok, False, ts)

        self.velocity = T_cur @ se3.inv_T(self.T_cw)
        self.T_cw = T_cur
        # refresh Manhattan R from the optimized pose (Tracking.cc:516-521)
        if bool(self.map_state.manhattan_ok):
            self.R_cm = T_cur[:3, :3] @ self.map_state.R_wm
        self.state = TrackState.OK

        # --- keyframe decision (NeedNewKeyFrame, Tracking.cc:2907) ----------
        frames_since = self.frame_id - self.last_kf_frame
        need_kf = (frames_since >= cfg.tracking.max_frames or
                   (frames_since >= cfg.tracking.min_frames
                    and n_inliers < 350))
        is_kf = False
        if need_kf and int(self.map_state.n_kfs) < cfg.map.max_keyframes - 1:
            bow = compute_bow(feats.kp.desc, feats.kp.valid,
                              cfg.map.vocab_words)
            blocked = map_ops.creation_block_mask(
                self.map_state, feats.kp.uv, feats.kp_depth, T_cur, cam.K4)
            self.map_state, kf_id = map_ops.add_keyframe(
                self.map_state, feats, T_cur, ts, mp_idx2, plane_m2,
                line_m.ml_idx, bow, cfg, blocked=blocked)
            if cfg.tracking.run_cull_on_keyframe:
                self.map_state = map_ops.cull_map(
                    self.map_state,
                    merge_angle_cos=cfg.plane.merge_angle_cos,
                    merge_dist=cfg.plane.merge_dist)
            # map refinement: full on-device BA over all keyframes+points
            # (capability of LocalBundleAdjustment/GlobalBundleAdjustemnt;
            # the reference disables local BA, LocalMapping.cc:67-69, and
            # reprojection-only BA is weakly constrained in low-parallax
            # RGB-D geometry -- gated off by default like the reference)
            if cfg.tracking.run_ba_on_keyframe:
                self._map_ba()
                T_cur = self.map_state.kf_pose[int(kf_id)]
                self.T_cw = T_cur
            self.last_kf_frame = self.frame_id
            self.ref_kf = int(kf_id)
            self.kf_log.append((ts, np.asarray(T_cur)))
            is_kf = True

        return TrackingResult(np.asarray(T_cur), self.state, n_inliers,
                              n_matches, man_ok, is_kf, ts)

    # ------------------------------------------------------------------
    def _map_ba(self):
        """Refine all keyframe poses + map points (matrix-free LM-PCG)."""
        from dr_slam_tpu.optimize.global_ba import (bundle_adjust,
                                                    problem_from_state)
        prob = problem_from_state(self.map_state)
        kf_pose, pt_pos = bundle_adjust(prob, self.cfg.camera.K4,
                                        n_gn_iters=4, n_cg_iters=24)
        self.map_state = self.map_state._replace(kf_pose=kf_pose,
                                                 pt_pos=pt_pos)

    # ------------------------------------------------------------------
    def _relocalize(self, feats: FrameFeatures, ts: float) -> TrackingResult:
        """Relocalization (Tracking.cc:3543): BoW candidates over keyframes,
        descriptor match against the best, PnP-RANSAC + pose optimization."""
        from dr_slam_tpu.associate.vocabulary import bow_scores
        from dr_slam_tpu.optimize.pnp import pnp_ransac

        cfg = self.cfg
        st = self.map_state
        bow = compute_bow(feats.kp.desc, feats.kp.valid, cfg.map.vocab_words)
        scores = bow_scores(bow, st.kf_bow, st.kf_valid)
        order = np.argsort(-np.asarray(scores))[:3]

        for kf_id in order:
            if float(scores[kf_id]) <= 0:
                continue
            ref = map_ops.match_reference_kf(st, jnp.asarray(int(kf_id)),
                                             feats.kp.desc, feats.kp.valid,
                                             max_hamming=map_ops.TH_HIGH)
            if int(ref.n_matches) < 15:
                continue
            ok3d = ref.mp_idx >= 0
            pts3d = st.pt_pos[jnp.clip(ref.mp_idx, 0)]
            T0, n_in = pnp_ransac(pts3d, feats.kp.uv, ok3d, cfg.camera.K4)
            if int(n_in) < 10:
                continue
            pm = map_ops.match_planes(st, feats.planes.coeffs,
                                      feats.planes.valid, T0)
            lm = map_ops.match_lines_projection(
                st, feats.lines.seg2d, feats.lines.desc,
                feats.lines.valid & feats.lines.has3d, T0, cfg.camera.K4,
                width=cfg.camera.width, height=cfg.camera.height)
            obs = map_ops.build_pose_obs(st, feats, ref.mp_idx, pm, lm.ml_idx,
                                         n_struct=cfg.map.max_kf_planes)
            opt = pose_optimize(T0, obs, cfg.camera.K4, cfg.camera.bf)
            if int(opt.n_inliers) >= 30:
                self.T_cw = opt.T_cw
                self.velocity = jnp.eye(4)
                self.state = TrackState.OK
                self.ref_kf = int(kf_id)
                if bool(st.manhattan_ok):
                    self.R_cm = opt.T_cw[:3, :3] @ st.R_wm
                return TrackingResult(np.asarray(opt.T_cw), self.state,
                                      int(opt.n_inliers), int(ref.n_matches),
                                      False, False, ts)
        return TrackingResult(np.asarray(self.T_cw), TrackState.LOST,
                              0, 0, False, False, ts)
