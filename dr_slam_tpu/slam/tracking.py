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

import collections
import enum
import os
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
from dr_slam_tpu.slam.track_step import track_step
from dr_slam_tpu.utils.profiling import PROFILER


class TrackState(enum.Enum):
    NOT_INITIALIZED = 1
    OK = 2
    LOST = 3


@jax.jit
def _kf_scalar_bundle(state: MapState, kf_id, prev_kf) -> jnp.ndarray:
    """(34,) f32: [kf_id, n_kfs, T_kf(16), T_prev(16)] -- every host-side
    bookkeeping value of a keyframe insertion in ONE device array, so the
    host pays ONE blocking round-trip instead of ~10."""
    return jnp.concatenate([
        jnp.stack([kf_id.astype(jnp.float32),
                   state.n_kfs.astype(jnp.float32)]),
        state.kf_pose[kf_id].reshape(-1),
        state.kf_pose[prev_kf].reshape(-1)])


@dataclass
class TrackingResult:
    T_cw: np.ndarray
    state: TrackState
    n_inliers: int
    n_matches: int
    manhattan_ok: bool
    is_keyframe: bool
    timestamp: float
    rot_residual_deg: float = None  # set when gt_R is fed to track_rgbd
                                    # (reference MatrixResidual diagnostics)


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
    last_kf_inliers: int = 500
    ref_kf: int = 0
    frame_id: int = -1
    only_tracking: bool = False      # mbOnlyTracking (Tracking.cc:378-457)
    trajectory: list = field(default_factory=list)   # (ts, T_cw) at track time
    kf_log: list = field(default_factory=list)
    # Loop-corrected trajectory bookkeeping (Tracking.cc:712-724): per frame
    # store (ts, ref_kf, T_frame_cw @ inv(T_refkf_cw at track time)) so loop
    # closure / GBA corrections of keyframe poses retroactively fix every
    # frame at save time (System.cc:379-440).
    traj_rel: list = field(default_factory=list)  # (ts, ref, pose, seq, T)
    kf_pose_host: dict = field(default_factory=dict)  # kf_id -> np 4x4 at insert
    kf_seq_host: dict = field(default_factory=dict)   # slot -> insertion seq
    # odometry measurements for the pose graph: new kf seq -> (prev kf seq,
    # T_new @ inv(T_prev) captured AT INSERTION). Loop closing uses these as
    # the temporal-edge measurements instead of re-deriving them from current
    # pose estimates -- re-derived edges absorb accumulated drift into the
    # "measurement" and make the essential graph blind to it.
    kf_odom_host: dict = field(default_factory=dict)  # seq -> (prev_seq, 4x4)
    _seq_counter: int = 0
    # deferred-readback bookkeeping (bounded-lag state machine)
    _pending: object = field(default_factory=collections.deque)
    _last_inliers: int = 0
    _last_matches: int = 0
    _last_man_ok: bool = False
    _reloc_failures: int = 0
    _n_kfs_host: int = 0        # host mirror of map_state.n_kfs (refreshed
                                #   from the packed keyframe readback; avoids
                                #   a blocking device read per KF decision)
    _map_gen: int = 0           # bumped on EVERY map mutation (KF insertion,
                                #   reloc, reset, loop correction): a deferred
                                #   frame dispatched against an older
                                #   generation must NOT write its
                                #   new_map_state back -- it would silently
                                #   clobber the mutation
    _hard_gen: int = 0          # bumped only on DESTRUCTIVE mutations (reloc,
                                #   reset, map load, loop correction). A
                                #   pending frame stale only in _map_gen was
                                #   merely overtaken by an additive keyframe
                                #   insertion: its pose and match indices are
                                #   still meaningful, so it still drives the
                                #   keyframe decision (otherwise every
                                #   insertion shadows the next 1-2 frames and
                                #   the KF cadence collapses); a frame stale
                                #   in _hard_gen is gauge-poisoned and is
                                #   dropped entirely
    _ref_kf_cache: object = None
    kf_inserted_event: bool = False   # set by _maybe_insert_keyframe; the
                                      # System consumes it to trigger loop
                                      # closing (res.is_keyframe lags in
                                      # deferred mode)

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

        if self.state == TrackState.NOT_INITIALIZED:
            res = self._initialize(extract_frame(gray, depth, cfg), timestamp)
        elif cfg.tracking.deferred_readback:
            # one-frame-lag state machine: resolve the PREVIOUS frame's
            # scalar bundle (its device work has completed by now), then
            # dispatch this frame's fused extract+track program without any
            # blocking host round-trip.
            self._resolve_pending(force=False)
            if self.state == TrackState.LOST:
                res = self._relocalize(extract_frame(gray, depth, cfg),
                                       timestamp)
            else:
                res = self._track_deferred(gray, depth, timestamp)
        elif self.state == TrackState.LOST:
            res = self._relocalize(extract_frame(gray, depth, cfg), timestamp)
        else:
            res = self._track(extract_frame(gray, depth, cfg), timestamp)

        # trajectory bookkeeping is readback-free: device poses are stored
        # as-is and converted lazily at save time; the reference-keyframe
        # pose snapshot (host dict) anchors the relative recomposition
        self.trajectory.append((timestamp, res.T_cw))
        self.traj_rel.append((timestamp, self.ref_kf,
                              self.kf_pose_host.get(self.ref_kf),
                              self.kf_seq_host.get(self.ref_kf, -1),
                              res.T_cw))
        if self.metrics is not None:
            self.metrics.log("frame", idx=self.frame_id,
                             state=res.state.name, inliers=res.n_inliers,
                             matches=res.n_matches, kf=res.is_keyframe,
                             manhattan=res.manhattan_ok)
        return res

    # ------------------------------------------------------------------
    def flush(self):
        """Resolve any pending deferred frame (call before saving/shutdown
        so the last frame's keyframe/LOST decision is applied)."""
        self._resolve_pending()

    # ------------------------------------------------------------------
    def process_localization_only(self, gray, depth,
                                  timestamp: float) -> TrackingResult:
        """Pure-localization tracking (System::ActivateLocalizationMode,
        System.cc:338; the mbOnlyTracking branch of Track(),
        Tracking.cc:378-457): match + optimize against a FROZEN map. No
        keyframe insertion, no culling, no BA, no landmark statistics --
        the map state is bit-identical before and after."""
        prev = self.only_tracking
        self.only_tracking = True
        try:
            return self.process_frame(gray, depth, timestamp)
        finally:
            self.only_tracking = prev

    # ------------------------------------------------------------------
    def corrected_trajectory(self) -> list:
        """[(ts, T_cw)] with each frame recomposed from its reference
        keyframe's CURRENT pose (System::SaveTrajectoryTUM semantics,
        System.cc:379-440): loop closure / GBA corrections of keyframe
        poses propagate retroactively to every tracked frame. The relative
        pose is computed here (lazily) from the ref-pose snapshot taken at
        track time, so the hot loop never paid a host readback for it.
        Frames whose reference keyframe was CULLED (slot recycled by a
        different keyframe, detected by insertion-sequence mismatch) keep
        their at-track-time absolute pose -- the reference re-binds such
        frames to the parent keyframe; keeping the tracked pose is the
        slot-based equivalent."""
        kf_pose = np.asarray(self.map_state.kf_pose)
        kf_seq = np.asarray(self.map_state.kf_seq)
        kf_valid = np.asarray(self.map_state.kf_valid)
        out = []
        for ts, ref, ref_pose, seq, T in self.traj_rel:
            T_np = np.asarray(T)
            if (ref_pose is None or not kf_valid[ref]
                    or kf_seq[ref] != seq):
                out.append((ts, T_np))
                continue
            out.append((ts, (T_np @ np.linalg.inv(ref_pose)) @ kf_pose[ref]))
        return out

    # ------------------------------------------------------------------
    def _initialize(self, feats: FrameFeatures, ts: float) -> TrackingResult:
        """StereoInitialization (Tracking.cc:1549): first frame becomes
        KF0 at the origin; points from depth; planes seed the map; the
        Manhattan frame is bootstrapped from the frame's planes/lines
        (Map::FindManhattan)."""
        if self.only_tracking:
            raise RuntimeError(
                "localization-only mode needs a loaded map (System.load_map) "
                "-- cannot initialize a new map without mutating it")
        n_depth = int(jnp.sum(feats.kp.valid & (feats.kp_depth > 1e-3)))
        if n_depth < self.cfg.tracking.init_min_depth_points:
            return TrackingResult(np.eye(4), self.state, 0, 0, False, False, ts)

        T0 = jnp.eye(4)
        R_cm, mok = find_manhattan(
            feats.planes.coeffs[:, :3], feats.planes.valid,
            feats.planes.n_blocks.astype(jnp.float32),
            feats.lines.man_dir, feats.lines.man_ok,
            vertical_cos=self.cfg.plane.vertical_threshold)
        if bool(mok):
            out = track_manhattan_frame(
                R_cm, feats.normals, feats.normals_valid,
                feats.lines.man_dir, feats.lines.man_ok,
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
        with PROFILER.span("kf.add"):
            self.map_state, kf_id = map_ops.add_keyframe(
                self.map_state, feats, T0, ts, no_match, pm, lm, bow,
                self.cfg)
        # world frame = first camera; Manhattan axes in world = R_cm
        self.map_state = self.map_state._replace(
            R_wm=R_cm, manhattan_ok=jnp.asarray(bool(mok)))
        self.T_cw = T0
        self.velocity = jnp.eye(4)
        self.state = TrackState.OK
        self.last_kf_frame = self.frame_id
        self.ref_kf = int(kf_id)
        self._n_kfs_host = 1
        self.kf_log.append((ts, np.eye(4)))
        self.kf_pose_host[int(kf_id)] = np.eye(4)
        self.kf_seq_host[int(kf_id)] = self._seq_counter
        self._seq_counter += 1
        self.kf_inserted_event = True
        return TrackingResult(np.eye(4), self.state, n_depth, n_depth,
                              bool(mok), True, ts)

    # ------------------------------------------------------------------
    def _track(self, feats: FrameFeatures, ts: float) -> TrackingResult:
        """Normal tracking: ONE fused device program (slam/track_step.py)
        plus a host-side state machine driven by one scalar readback."""
        cfg = self.cfg
        out = track_step(self.map_state, feats, self.T_cw, self.velocity,
                         self.R_cm, self._ref_kf_dev(), cfg)
        # single host readback of the per-frame scalars (the packed bundle;
        # separate int()/float() casts each cost a blocking round-trip on
        # tunneled runtimes)
        b = np.asarray(out.bundle)
        n_inliers, n_matches = int(b[16]), int(b[17])
        man_ok, jump = bool(b[18] > 0.5), float(b[19])
        T_cur = out.T_cw

        # failure detection (SURVEY.md section 5): reject implausible updates
        # and relocalize rather than integrating a bad pose. The map update
        # (visibility statistics) is applied only AFTER this check, matching
        # the deferred path -- rejected frames must not mutate map statistics
        # in one mode but not the other (ADVICE r2).
        bad_pose = (n_inliers < 10
                    or n_inliers < 0.3 * max(n_matches, 1)
                    or jump > 0.30)
        if bad_pose:
            self.state = TrackState.LOST
            return TrackingResult(np.asarray(self.T_cw), self.state,
                                  n_inliers, n_matches, man_ok, False, ts)
        if not self.only_tracking:
            # localization-only mode keeps the map frozen: not even the
            # visibility statistics move (they feed culling, which won't run)
            self.map_state = out.new_map_state

        self.velocity = T_cur @ se3.inv_T(self.T_cw)
        self.T_cw = T_cur
        self.R_cm = out.R_cm
        self.state = TrackState.OK

        is_kf = self._maybe_insert_keyframe(
            feats, out, ts, self.frame_id, n_inliers,
            n_close_tracked=int(b[20]), n_close_untracked=int(b[21]),
            ref_tracked=int(b[22]))
        return TrackingResult(np.asarray(self.T_cw), self.state, n_inliers,
                              n_matches, man_ok, is_kf, ts)

    # ------------------------------------------------------------------
    def _maybe_insert_keyframe(self, feats: FrameFeatures, out, ts: float,
                               frame_id: int, n_inliers: int,
                               n_close_tracked: int = 0,
                               n_close_untracked: int = 0,
                               ref_tracked: int = 0) -> bool:
        """NeedNewKeyFrame (Tracking.cc:2907) + CreateNewKeyFrame (:3040) +
        the synchronous LocalMapping pass (culling, triangulation, fuse,
        BA, keyframe culling). `out` is the frame's TrackStepOut; the
        tracker pose must already be seated on out.T_cw.

        The keyframe decision is the reference's RGB-D gate set
        (Tracking.cc:2944-3000): c1a forces consideration after max_frames;
        c1b after min_frames (LocalMapping here is synchronous, i.e. always
        idle); c1c fires on tracking collapse vs the reference keyframe or
        on close-point starvation (bNeedToInsertClose); c2 requires the
        frame to actually add information (inliers below kf_ref_ratio of
        the reference keyframe's tracked points, or close-point
        starvation), with an absolute inlier floor. A stationary camera
        therefore inserts almost no keyframes (c2 stays false; only the
        forced max_frames anchor fires, and culling reclaims it if
        redundant)."""
        cfg = self.cfg
        tr = cfg.tracking
        frames_since = frame_id - self.last_kf_frame
        # close thresholds are per-1000-features (see TrackingConfig)
        fscale = cfg.orb.n_features / 1000.0
        need_close = (n_close_tracked < tr.kf_close_tracked_max * fscale
                      and n_close_untracked > tr.kf_close_untracked_min
                      * fscale)
        ref_floor = max(ref_tracked, 1)
        c1a = frames_since >= tr.max_frames
        c1b = frames_since >= tr.min_frames
        c1c = n_inliers < tr.kf_collapse_ratio * ref_floor or need_close
        c2 = ((n_inliers < tr.kf_ref_ratio * ref_floor or need_close)
              and n_inliers > tr.kf_min_inliers)
        # c1a (max_frames) FORCES a keyframe past the c2 information gate
        # (VERDICT r4 item 6): a long c2-quiet stretch must still anchor a
        # fresh reference keyframe; KeyFrameCulling reclaims it if it turns
        # out redundant (insert-generously-cull-later, LocalMapping.cc:1226)
        forced = c1a and n_inliers > tr.kf_min_inliers
        need_kf = (not self.only_tracking) \
            and (forced or ((c1b or c1c) and c2))
        # gate-input snapshot for diagnostics (host ints, no device cost)
        self._kf_gate_dbg = dict(
            frame=frame_id, inliers=n_inliers, close_tracked=n_close_tracked,
            close_untracked=n_close_untracked, ref_tracked=ref_tracked,
            frames_since=frames_since, need_close=need_close,
            c1a=c1a, c1b=c1b, c1c=c1c, c2=c2, need_kf=need_kf)
        if not need_kf:
            return False
        if self._n_kfs_host >= cfg.map.max_keyframes - 1:
            # Capacity wall. The reference never hits one (opportunistic
            # KeyFrameCulling, no fixed capacity); here the tracker DEMANDS
            # a new reference view, so force-evict the most redundant
            # non-protected keyframe to free a slot -- refusing to insert
            # forever would strand tracking as the camera leaves mapped
            # territory. Rare event => the one extra scalar readback is off
            # the steady-state path.
            self.map_state = map_ops.cull_one_keyframe(self.map_state,
                                                       force=True)
            self._n_kfs_host = int(self.map_state.n_kfs)
            if self._n_kfs_host >= cfg.map.max_keyframes - 1:
                return False
        T_cur = out.T_cw
        bow = compute_bow(feats.kp.desc, feats.kp.valid, cfg.map.vocab_words)
        blocked = map_ops.creation_block_mask(
            self.map_state, feats.kp.uv, feats.kp_depth, T_cur,
            cfg.camera.K4)
        pm = map_ops.PlaneMatches(
            match_idx=out.plane_match, par_idx=out.plane_par,
            ver_idx=out.plane_ver,
            obs_world=jax.vmap(
                lambda p: se3.plane_to_world(T_cur, p))(feats.planes.coeffs))
        prev_kf = self.ref_kf
        with PROFILER.span("kf.add"):
            self.map_state, kf_id = map_ops.add_keyframe(
                self.map_state, feats, T_cur, ts, out.mp_idx, pm,
                out.line_match, bow, cfg, blocked=blocked)
        if cfg.tracking.run_cull_on_keyframe:
            with PROFILER.span("kf.cull_map"):
                self.map_state = map_ops.cull_map(
                    self.map_state,
                    merge_angle_cos=cfg.plane.merge_angle_cos,
                    merge_dist=cfg.plane.merge_dist)
        # LocalMapping completion (reference LocalMapping.cc Run):
        # triangulate depth-less features against the previous keyframe
        # (CreateNewMapPoints, :309), merge duplicate landmarks
        # (SearchInNeighbors/Fuse, :1039), then cull one redundant
        # keyframe (KeyFrameCulling, :1226) after BA.
        if cfg.tracking.run_triangulation:
            # kf_id stays a DEVICE scalar through the whole LocalMapping
            # pass; the kf_a == kf_b degenerate pair is masked inside the
            # jit (one blocked host round-trip here used to cost a full
            # tunnel RPC on remote-TPU runtimes)
            with PROFILER.span("kf.triangulate"):
                self.map_state = map_ops.triangulate_with_kf(
                    self.map_state, kf_id, jnp.asarray(prev_kf),
                    cfg.camera.K4)
        if cfg.tracking.run_fuse_on_keyframe:
            with PROFILER.span("kf.fuse"):
                self.map_state = map_ops.fuse_new_points(
                    self.map_state, kf_id, fuse_dist=cfg.tracking.fuse_dist)
        # map refinement: on-device BA (reproj + depth) over the map
        # (capability of Local/GlobalBundleAdjustment; the reference
        # disables local BA, LocalMapping.cc:67-69 -- cheap on TPU)
        if cfg.tracking.run_ba_on_keyframe:
            with PROFILER.span("kf.local_ba"):
                self._map_ba(center_kf=kf_id)
            T_cur = self.map_state.kf_pose[kf_id]
            self.T_cw = T_cur
            # NOTE: the velocity (frame-to-frame relative motion) is KEPT
            # across the BA correction -- resetting it to identity made the
            # next prediction miss the match window entirely under fast
            # rotation (17 px/frame image motion vs a 15 px search radius),
            # which cascaded into LOST on rotation-heavy trajectories.
        if cfg.tracking.run_kf_culling:
            with PROFILER.span("kf.cull_keyframe"):
                self.map_state = map_ops.cull_one_keyframe(self.map_state)
        self.last_kf_frame = frame_id
        self.last_kf_inliers = n_inliers
        # ONE packed scalar readback for every host-side bookkeeping value
        # (slot id, live kf count, new + previous keyframe poses): each
        # separate int()/np.asarray() costs a full blocking round-trip on
        # tunneled TPU runtimes (~20-50 ms), and this path used to pay ~10
        # of them -- the dominant cost of a keyframe frame (650 ms -> ~1
        # round-trip)
        with PROFILER.span("kf.readback"):
            b = np.asarray(_kf_scalar_bundle(self.map_state, kf_id,
                                             jnp.asarray(prev_kf)))
        kf_i = int(b[0])
        self._n_kfs_host = int(b[1])
        T_kf = b[2:18].reshape(4, 4).astype(np.float64)
        T_prev = b[18:34].reshape(4, 4).astype(np.float64)
        self.ref_kf = kf_i
        self.kf_log.append((ts, T_kf))
        self.kf_pose_host[kf_i] = T_kf
        self.kf_seq_host[kf_i] = self._seq_counter
        # odometry edge vs the previous reference keyframe's CURRENT
        # estimate (post-BA, so the pair is locally consistent)
        prev_seq = self.kf_seq_host.get(prev_kf)
        if prev_seq is not None and prev_kf != kf_i:
            self.kf_odom_host[self._seq_counter] = (
                prev_seq, T_kf @ np.linalg.inv(T_prev))
        self._seq_counter += 1
        self._map_gen += 1
        self.kf_inserted_event = True
        return True

    # ------------------------------------------------------------------
    def _ref_kf_dev(self):
        """Device mirror of ref_kf (avoids a per-frame tiny H2D transfer +
        mini-program activation; ref_kf changes only at keyframes/reloc)."""
        if self._ref_kf_cache is None or self._ref_kf_cache[0] != self.ref_kf:
            self._ref_kf_cache = (self.ref_kf, jnp.asarray(self.ref_kf))
        return self._ref_kf_cache[1]

    # ------------------------------------------------------------------
    def consume_kf_event(self) -> bool:
        """True once per keyframe insertion (works in deferred mode, where
        TrackingResult.is_keyframe lags the actual insertion)."""
        ev = self.kf_inserted_event
        self.kf_inserted_event = False
        return ev

    # ------------------------------------------------------------------
    def _track_deferred(self, gray, depth, ts: float) -> TrackingResult:
        """Dispatch this frame's fused extract+track step (ONE device
        program -- per-frame executable alternation costs ~400 ms on the
        tunneled runtime) WITHOUT any host readback; its LOST/keyframe
        decision is resolved at the START of the next frame (one-frame
        lag), by which time the scalar bundle has already been computed on
        device. Steady-state frame cost = dispatch + a ~30 ms readback,
        not the ~600 ms of six blocking round-trips (VERDICT round-1
        item 6)."""
        from dr_slam_tpu.slam.track_step import extract_and_track
        with PROFILER.span("track.dispatch"):
            feats, out = extract_and_track(
                gray, depth, self.map_state, self.T_cw, self.velocity,
                self.R_cm, self._ref_kf_dev(), self.cfg)
        if PROFILER.enabled:
            # device time of the fused frame program (profiling mode only:
            # the sync defeats the pipelined schedule by design)
            with PROFILER.span("track.device", sync=out.bundle):
                pass
        T_prev = self.T_cw
        R_cm_prev = self.R_cm
        # speculative advance (device futures, no readback, no eager math:
        # the velocity came out of the fused program)
        self.velocity = out.velocity
        self.T_cw = out.T_cw
        self.R_cm = out.R_cm
        # start the scalar-bundle D2H NOW: on tunneled runtimes a blocking
        # device->host readback costs ~200 ms (transport round-trip +
        # serialization), while an async copy overlaps the next frame's
        # extract+track and lands before _resolve_pending touches it
        # (measured: sync 227 ms -> async-lagged 19 ms per frame)
        try:
            out.bundle.copy_to_host_async()
        except AttributeError:
            pass  # non-jax array (tests with numpy stubs)
        self._pending.append((ts, feats, out, T_prev, R_cm_prev,
                              self.frame_id, self.only_tracking,
                              self._map_gen, self._hard_gen))
        return TrackingResult(out.T_cw, self.state, self._last_inliers,
                              self._last_matches, self._last_man_ok,
                              False, ts)

    # ------------------------------------------------------------------
    def _resolve_pending(self, force: bool = True):
        """Apply deferred frames' LOST / map-statistics / keyframe decisions
        from their (now complete) scalar bundles, oldest first.

        With force=False, only bundles that have already LANDED on the host
        (jax.Array.is_ready) are resolved -- an unpaced caller (benchmark
        tight loop, burst ingest) never blocks on an in-flight D2H, which on
        tunneled runtimes both stalls ~20 ms AND degrades the transport for
        the rest of the process. The queue is bounded (2): beyond that the
        oldest is resolved blocking, so state-machine lag stays <= 2 frames.
        force=True (flush / frame boundaries with slack) drains everything."""
        while self._pending:
            entry = self._pending[0]
            out = entry[2]
            if not force and len(self._pending) <= 1:
                try:
                    if not out.bundle.is_ready():
                        return
                except AttributeError:
                    pass
            self._pending.popleft()
            self._resolve_one(entry)
            if self.state == TrackState.LOST:
                # the remaining speculative frames were dispatched off the
                # rejected pose -- their results are gauge-poisoned; drop
                # them (their map updates never apply)
                self._pending.clear()
                return

    def _resolve_one(self, entry):
        (ts, feats, out, T_prev, R_cm_prev, frame_id, was_loc,
         gen, hard) = entry
        if hard != self._hard_gen:
            # dispatched before a destructive mutation (reloc / reset /
            # map load / loop correction): pose, matches and statistics
            # are all gauge-poisoned -- drop without touching anything
            return
        with PROFILER.span("resolve.readback"):
            b = np.asarray(out.bundle)
        n_inliers = int(b[16])
        n_matches = int(b[17])
        man_ok = bool(b[18] > 0.5)
        jump = float(b[19])
        self._last_inliers, self._last_matches = n_inliers, n_matches
        self._last_man_ok = man_ok

        bad_pose = (n_inliers < 10
                    or n_inliers < 0.3 * max(n_matches, 1)
                    or jump > 0.30)
        if bad_pose:
            # roll the speculative pose back to the last good one -- the
            # Manhattan anchor too (it was advanced to the rejected pose's
            # R_cm, ADVICE r2)
            self.state = TrackState.LOST
            self.T_cw = T_prev
            self.R_cm = R_cm_prev
            self.velocity = jnp.eye(4)
            if self.metrics is not None:
                self.metrics.log("frame_resolved", idx=frame_id,
                                 state="LOST", inliers=n_inliers,
                                 matches=n_matches)
            return
        if not (self.only_tracking or was_loc):
            if gen == self._map_gen:
                self.map_state = out.new_map_state
            else:
                # the map mutated (keyframe insertion) since this frame was
                # dispatched: the full new_map_state pytree would clobber
                # the mutation, so RE-APPLY the visibility statistics onto
                # the current state (a tiny scatter; only the 1-2 frames
                # after an insertion pay it)
                self.map_state = map_ops.update_point_stats(
                    self.map_state, out.visible, out.mp_idx)
            self._maybe_insert_keyframe(
                feats, out, ts, frame_id, n_inliers,
                n_close_tracked=int(b[20]), n_close_untracked=int(b[21]),
                ref_tracked=int(b[22]))

    # ------------------------------------------------------------------
    def _map_ba(self, center_kf=None):
        """Per-keyframe map refinement (matrix-free LM-PCG).

        Local-window mode (default; the reference's LocalBundleAdjustment,
        Optimizer.cc:2067): only the `local_ba_window` keyframes most
        covisible with the new keyframe and their points move -- O(window)
        per keyframe, so long runs don't pay O(map) at every insertion.
        Full-map mode remains for small maps / loop-closure GBA."""
        from dr_slam_tpu.optimize.global_ba import (bundle_adjust,
                                                    local_problem_from_state,
                                                    problem_from_state)
        cfg = self.cfg
        ws = cfg.tracking.use_struct_in_ba
        if cfg.tracking.use_local_ba and center_kf is not None:
            prob, win = local_problem_from_state(
                self.map_state, jnp.asarray(center_kf),
                window=cfg.tracking.local_ba_window, with_struct=ws)
            out = bundle_adjust(prob, cfg.camera.K4,
                                n_gn_iters=4, n_cg_iters=24)
            kf_pose = self.map_state.kf_pose.at[win].set(out[0])
        else:
            prob = problem_from_state(self.map_state, with_struct=ws)
            out = bundle_adjust(prob, cfg.camera.K4,
                                n_gn_iters=4, n_cg_iters=24)
            kf_pose = out[0]
        pt_pos = out[1]
        pl_coef = out[2] if ws else self.map_state.pl_coef
        ln_ep = out[3] if ws else self.map_state.ln_ep
        self.map_state = self.map_state._replace(kf_pose=kf_pose,
                                                 pt_pos=pt_pos,
                                                 pl_coef=pl_coef,
                                                 ln_ep=ln_ep)

    # ------------------------------------------------------------------
    def _relocalize(self, feats: FrameFeatures, ts: float) -> TrackingResult:
        """Relocalization (Tracking.cc:3543): covisibility-group BoW
        candidates over keyframes (KeyFrameDatabase.cc:201 Detect-
        RelocalizationCandidates), descriptor match per candidate,
        PnP/Horn-RANSAC + pose optimization, then the reference's inlier
        ladder: if the first optimization lands under 50 inliers, a wide
        projection search against the map re-feeds a second optimization
        (Tracking.cc:3627-3664) before the full-map acceptance check."""
        from dr_slam_tpu.associate import keyframe_db
        from dr_slam_tpu.associate.vocabulary import bow_scores
        from dr_slam_tpu.optimize.pnp import pnp_ransac
        from dr_slam_tpu.slam.loop_closing import _covis_full

        cfg = self.cfg
        st = self.map_state
        bow = compute_bow(feats.kp.desc, feats.kp.valid, cfg.map.vocab_words)
        scores = np.asarray(bow_scores(bow, st.kf_bow, st.kf_valid))
        # group-accumulated shortlist; no minScore floor for reloc (the
        # query frame has no covisible neighbors to derive one from)
        common = np.asarray(keyframe_db.common_word_counts(
            bow, st.kf_bow, st.kf_valid))
        order = keyframe_db.group_candidates(
            scores, common, np.asarray(_covis_full(st)),
            np.asarray(st.kf_valid, dtype=bool))[:5]
        # UNION with the raw-score top-3: group accumulation favors densely
        # covisible OLD regions; when the vocabulary is weakly discriminative
        # (scores near-uniform) the accumulated ranking can exclude the
        # actually-nearby keyframe that raw L1 score ranks first. Geometric
        # verification below is the arbiter either way; candidates are cheap.
        for k in np.argsort(-scores)[:3]:
            if int(k) not in order and scores[int(k)] > 0:
                order.append(int(k))
        _dbg = bool(os.environ.get("DRSLAM_RELOC_DEBUG"))
        if _dbg:
            print(f"[reloc] order={order} "
                  f"scores={[round(float(scores[k]), 3) for k in order]}",
                  flush=True)

        for kf_id in order:
            if float(scores[kf_id]) <= 0:
                continue
            from dr_slam_tpu.associate.vocabulary import word_ids
            ref = map_ops.match_reference_kf(
                st, jnp.asarray(int(kf_id)), feats.kp.desc, feats.kp.valid,
                max_hamming=map_ops.TH_HIGH,
                kp_word=word_ids(feats.kp.desc, cfg.map.vocab_words),
                kf_word=st.kf_word[int(kf_id)])
            if _dbg:
                print(f"[reloc]  kf={int(kf_id)} n_matches={int(ref.n_matches)}", flush=True)
            if int(ref.n_matches) < 15:
                continue
            ok3d = ref.mp_idx >= 0
            pts3d = st.pt_pos[jnp.clip(ref.mp_idx, 0)]
            # RGB-D relocalization: prefer 3D-3D Horn RANSAC (frame depth vs
            # map positions). The reference uses EPnP; a 2D-3D DLT solve is
            # DEGENERATE when the matched landmarks are coplanar -- e.g. a
            # single close wall or a far-wall-dominated corridor view, which
            # is exactly where relocalization tends to be needed. 3D-3D
            # alignment is well-posed for coplanar (non-collinear) points.
            pairs3d = ok3d & (feats.kp_depth > 1e-3)
            used_horn = int(jnp.sum(pairs3d)) >= 10
            if used_horn:
                from dr_slam_tpu.optimize.sim3 import sim3_ransac
                T0, _, n_in = sim3_ransac(pts3d, feats.kp_xyz, pairs3d,
                                          inlier_dist=0.10)
            else:  # mono fallback (depth holes): EPnP-style 2D-3D RANSAC
                T0, n_in = pnp_ransac(pts3d, feats.kp.uv, ok3d,
                                      cfg.camera.K4)
            if _dbg:
                print(f"[reloc]  kf={int(kf_id)} ransac_inl={int(n_in)}", flush=True)
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
            if int(opt.n_inliers) < 50:
                # candidate ladder (Tracking.cc:3627-3664): the candidate-
                # keyframe matches were too thin -- search the WHOLE map by
                # projection from the coarse pose with a wide window, then
                # re-optimize on the richer association set
                wide = map_ops.match_points_projection(
                    st, feats.kp.uv, feats.kp.desc, feats.kp.valid,
                    opt.T_cw, cfg.camera.K4, radius=10.0,
                    max_hamming=map_ops.TH_HIGH,
                    width=cfg.camera.width, height=cfg.camera.height,
                    kp_angle=feats.kp.angle)
                if int(wide.n_matches) > int(opt.n_inliers):
                    obs = map_ops.build_pose_obs(
                        st, feats, wide.mp_idx, pm, lm.ml_idx,
                        n_struct=cfg.map.max_kf_planes)
                    opt = pose_optimize(opt.T_cw, obs, cfg.camera.K4,
                                        cfg.camera.bf)
            # verify against the FULL map, not just the candidate keyframe:
            # an aliased BoW+PnP pose matches one keyframe consistently but
            # projects poorly against the rest of the map
            verify = map_ops.match_points_projection(
                st, feats.kp.uv, feats.kp.desc, feats.kp.valid, opt.T_cw,
                cfg.camera.K4, radius=6.0, max_hamming=map_ops.TH_LOW + 10.0,
                width=cfg.camera.width, height=cfg.camera.height,
                kp_angle=feats.kp.angle, kp_octave=feats.kp.octave,
                pt_scale=cfg.orb.scale_factor, n_levels=cfg.orb.n_levels)
            if _dbg:
                print(f"[reloc]  kf={int(kf_id)} opt_inl={int(opt.n_inliers)} verify={int(verify.n_matches)}", flush=True)
            # Acceptance. Primary gate: joint-opt inliers + full-map
            # projection consistency (stricter than the reference's plain
            # nGood>=50, Tracking.cc:3668 -- guards BoW aliasing). But on a
            # DRIFTED map that gate is unattainable by construction: each
            # landmark carries its newest observer's gauge, so no rigid pose
            # is consistent with the whole map, and reloc would stall for
            # dozens of frames until the camera re-enters a low-drift region
            # (observed: Horn finds 60-80 metric 3D-3D inliers while the
            # full-map verify saturates at ~40-60). Secondary gate: a STRONG
            # metric consensus -- >=50 Horn 3D-3D RANSAC inliers at 0.10 m on
            # measured depth is a rigid alignment that 2D BoW aliasing cannot
            # fake -- with relaxed joint/verify floors for candidate-local
            # consistency (the reference's own acceptance level).
            strong_metric = (used_horn and int(n_in) >= 50
                             and int(opt.n_inliers) >= 15
                             and int(verify.n_matches) >= 35)
            if ((int(opt.n_inliers) >= 30 and int(verify.n_matches) >= 60)
                    or strong_metric):
                self.T_cw = opt.T_cw
                self.velocity = jnp.eye(4)
                self.state = TrackState.OK
                self._reloc_failures = 0
                self._map_gen += 1
                self._hard_gen += 1
                self.ref_kf = int(kf_id)
                if self.ref_kf not in self.kf_pose_host:
                    # relocalizing into a loaded map: cache the ref pose +
                    # insertion sequence so the relative-trajectory
                    # bookkeeping has a verifiable anchor
                    self.kf_pose_host[self.ref_kf] = np.asarray(
                        st.kf_pose[self.ref_kf])
                    self.kf_seq_host[self.ref_kf] = int(
                        st.kf_seq[self.ref_kf])
                    self._seq_counter = max(self._seq_counter,
                                            self.kf_seq_host[self.ref_kf] + 1)
                if bool(st.manhattan_ok):
                    self.R_cm = opt.T_cw[:3, :3] @ st.R_wm
                return TrackingResult(np.asarray(opt.T_cw), self.state,
                                      int(opt.n_inliers), int(ref.n_matches),
                                      False, False, ts)
        # reference behavior (Tracking.cc:698-703): losing track on a YOUNG
        # map (<= 5 keyframes soon after initialization) resets the system
        # instead of relocalizing forever against a map not worth keeping
        self._reloc_failures += 1
        if (not self.only_tracking and self._reloc_failures >= 3
                and self._n_kfs_host <= 5 and self._seq_counter <= 5):
            if self.metrics is not None:
                self.metrics.log("map_reset", frame=self.frame_id)
            self.map_state = make_empty_state(self.cfg)
            self.state = TrackState.NOT_INITIALIZED
            self._reloc_failures = 0
            self._n_kfs_host = 0
            self._map_gen += 1
            self._hard_gen += 1
            self.kf_pose_host.clear()
            self.kf_seq_host.clear()
            self.kf_odom_host.clear()
            # device kf_seq restarts at 0 with the fresh map state; the host
            # counter must restart with it or corrected_trajectory()'s
            # seq-match check silently rejects every post-reset frame
            # (ADVICE r2, medium)
            self._seq_counter = 0
        return TrackingResult(np.asarray(self.T_cw), TrackState.LOST,
                              0, 0, False, False, ts)
