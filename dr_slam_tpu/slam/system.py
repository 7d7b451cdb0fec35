"""System facade: the public API mirroring the reference's System class.

Reference: include/System.h:70-80 / src/System.cc -- construct with settings,
feed frames with TrackRGBD (System.cc:284), switch localization-only mode
(:338), save trajectories (:379-562), save/load the map (Map::Save/Load via
System), shutdown. Same surface here, minus threads: LocalMapping's culling
runs synchronously at keyframe insertion (the reference's LocalBundle-
Adjustment call is disabled in this revision anyway, LocalMapping.cc:67-69),
and LoopClosing runs as an explicit per-keyframe detection step."""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np

from dr_slam_tpu.config import SlamConfig, load_config
from dr_slam_tpu.io.metrics import MetricsLogger
from dr_slam_tpu.io.trajectory import (save_keyframe_trajectory_tum,
                                       save_trajectory_manhattan,
                                       save_trajectory_tum)
from dr_slam_tpu.slam.tracking import Tracker, TrackState


def rotation_residual_deg(R_est: np.ndarray, R_gt: np.ndarray) -> float:
    """Angular distance between two rotations in degrees:
    2 cos(alpha) = trace(R_gt^T R_est) - 1 (the reference's MatrixResidual,
    src/Tracking.cc:3773-3783, after 'Benchmarking 6DOF Outdoor Visual
    Localization in Changing Conditions')."""
    tr = float(np.trace(R_gt.T @ R_est))
    return float(np.degrees(np.arccos(np.clip(0.5 * (tr - 1.0), -1.0, 1.0))))


class System:
    """DR-SLAM-TPU system facade."""

    def __init__(self, config: SlamConfig | str | None = None,
                 use_viewer: bool = False, metrics_path: str | None = None,
                 enable_loop_closing: bool = True, detector=None,
                 live_viewer: bool = False, live_viewer_port: int = 0):
        """detector: optional object detector with .detect(rgb) -> Detections
        (e.g. models.yolox.YOLOX) -- the reference runs YOLOX per frame for
        the 2D overlay only (Frame::ExtractObject -> FrameDrawer::DrawObjects,
        src/Frame.cc:1330, src/FrameDrawer.cc:219); here it runs per KEYFRAME
        off the hot path, and the latest detections feed the viewer overlay."""
        if isinstance(config, str):
            config = load_config(config)
        self.cfg = config or SlamConfig()
        self._load_default_vocabulary()
        self.detector = detector
        self.last_detections = None
        self.metrics = MetricsLogger(metrics_path)
        self.tracker = Tracker(self.cfg, metrics=self.metrics)
        self.only_tracking = False
        self.enable_loop_closing = enable_loop_closing
        self._loop_closer = None
        self._viewer = None
        if use_viewer or self.cfg.viewer.use_viewer:
            from dr_slam_tpu.viz.viewer import Viewer
            self._viewer = Viewer(self)
        self._live = None
        if live_viewer:
            # browser-stream live viewer (the reference's Pangolin window
            # capability, src/Viewer.cc:43, headless-host redesign)
            from dr_slam_tpu.viz.live import LiveViewer
            self._live = LiveViewer(self, port=live_viewer_port)

    def _load_default_vocabulary(self):
        """Register the shipped trained BoW codebook matching the config's
        word count (the reference loads ORBvoc.txt at startup, System.cc:51;
        ours is trained by scripts/train_vocab.py). Shipped artifacts:
        data/vocab.npz (4096 words, the default config) and
        data/vocab512.npz (512 words, the reduced test configs)."""
        import numpy as _np
        from dr_slam_tpu.associate import vocabulary as voc
        W = self.cfg.map.vocab_words
        data_dir = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "data")
        for name in (f"vocab{W}.npz", "vocab.npz"):
            path = os.path.join(data_dir, name)
            if not os.path.exists(path):
                continue
            try:
                words = _np.load(path)["words"]
            except Exception:
                continue
            if words.shape[0] == W:
                voc.set_vocabulary(words)
                return

    # -- main API ----------------------------------------------------------
    def track_rgbd(self, gray, depth, timestamp: float, gt_R=None):
        """Process one RGB-D frame; returns the TrackingResult (with T_cw).

        Reference: System::TrackRGBD (System.cc:284) -> Tracking::
        GrabImageRGBD (Tracking.cc:191). Color conversion/resizing is the
        caller's job here; gray is (H, W) [0,255], depth (H, W) meters.

        gt_R: optional (3, 3) ground-truth world->camera rotation for
        rotation-residual diagnostics (the reference's GroundTruth_R input,
        Tracking.cc:191, scored by MatrixResidual, :3773-3783). When given,
        the angular error of the estimated rotation is logged as
        `rot_residual_deg` -- a diagnostic mode, so the host readback of the
        pose it requires is acceptable here and only here."""
        if self.only_tracking:
            res = self.tracker.process_localization_only(gray, depth, timestamp)
        else:
            res = self.tracker.process_frame(gray, depth, timestamp)
        if gt_R is not None:
            res.rot_residual_deg = rotation_residual_deg(
                np.asarray(res.T_cw)[:3, :3], np.asarray(gt_R))
            self.metrics.log("rot_residual", frame=self.tracker.frame_id,
                             deg=res.rot_residual_deg)
        if self.tracker.consume_kf_event():
            if self.detector is not None:
                import jax.numpy as jnp
                g = jnp.asarray(gray, jnp.float32)
                rgb = jnp.stack([g, g, g], -1)
                self.last_detections = self.detector.detect(rgb)
            if self.enable_loop_closing:
                self._run_loop_closing()
        if self._viewer is not None:
            self._viewer.update(res)
        if self._live is not None:
            from dr_slam_tpu.frontend.frame import extract_frame
            import jax.numpy as jnp
            cfg = self.cfg
            self._live.update(
                res, gray=gray,
                feats_fn=lambda: extract_frame(
                    jnp.asarray(gray, jnp.float32),
                    jnp.asarray(depth, jnp.float32), cfg),
                detections=self.last_detections)
        return res

    def _run_loop_closing(self):
        try:
            from dr_slam_tpu.slam.loop_closing import LoopCloser
        except ImportError:
            return
        if self._loop_closer is None:
            self._loop_closer = LoopCloser(
                self.cfg,
                consistency_needed=self.cfg.tracking.loop_consistency)
        from dr_slam_tpu.utils.profiling import PROFILER
        tr0 = self.tracker
        # async-GBA resolution (the reference's detached GBA thread joining
        # back, LoopClosing.cc:691): merge a landed result before detection,
        # never blocking -- if the buffers are still in flight, try again at
        # the next keyframe
        with PROFILER.span("loop.resolve_gba"):
            merged = self._loop_closer.resolve_gba(tr0.map_state,
                                                   guard_gen=tr0._hard_gen)
        if merged is not None:
            tr0.map_state = merged
            tr0._map_gen += 1   # additive: pending frames re-apply stats
            self.metrics.log("gba_merged", kf=tr0.ref_kf)
        with PROFILER.span("loop.process"):
            new_state, corrected = self._loop_closer.process(
                self.tracker.map_state, self.tracker.ref_kf,
                odom=self.tracker.kf_odom_host)
        if corrected:
            import jax.numpy as jnp
            tr = self.tracker
            tr.map_state = new_state
            tr._map_gen += 1    # pending frames predate the correction --
            tr._hard_gen += 1   # destructive: drop them outright
            # the correction moved the current keyframe (= current pose):
            # re-seat the tracker on the corrected pose (CorrectLoop adjusts
            # mpCurrentKF and propagates, LoopClosing.cc:448+)
            T_c = new_state.kf_pose[tr.ref_kf]
            tr.T_cw = T_c
            tr.velocity = jnp.eye(4)
            tr.kf_pose_host[tr.ref_kf] = np.asarray(T_c)
            if bool(new_state.manhattan_ok):
                tr.R_cm = T_c[:3, :3] @ new_state.R_wm
            self.metrics.log("loop_closed", kf=tr.ref_kf)
            # detached global BA (LoopClosing.cc:625): dispatch now, merge
            # at a later keyframe via resolve_gba -- the tracking loop never
            # waits for the O(map) solve
            self._loop_closer.dispatch_gba(tr.map_state,
                                           guard_gen=tr._hard_gen)

    # -- modes (System.cc:338-354) ------------------------------------------
    def activate_localization_mode(self):
        self.only_tracking = True

    def deactivate_localization_mode(self):
        self.only_tracking = False

    def reset(self):
        self.tracker = Tracker(self.cfg, metrics=self.metrics)

    # -- state ----------------------------------------------------------------
    @property
    def track_state(self) -> TrackState:
        return self.tracker.state

    def map_summary(self) -> dict:
        self.tracker.flush()
        st = self.tracker.map_state
        return {
            "n_keyframes": int(st.n_kfs),
            "n_points": int(np.asarray(st.pt_valid).sum()),
            "n_planes": int(np.asarray(st.pl_valid).sum()),
            "n_lines": int(np.asarray(st.ln_valid).sum()),
            "manhattan": bool(st.manhattan_ok),
        }

    def block_until_ready(self):
        jax.block_until_ready(self.tracker.map_state)

    # -- savers (System.cc:379-562) -------------------------------------------
    def save_trajectory_tum(self, path: str):
        """Loop-corrected export (System.cc:379-440): every frame's pose is
        recomposed from its reference keyframe's CURRENT pose, so loop
        closure / global BA corrections reach the saved trajectory."""
        self.tracker.flush()
        corrected = self.tracker.corrected_trajectory()
        ts = [t for t, _ in corrected]
        poses = [p for _, p in corrected]
        save_trajectory_tum(path, ts, poses)

    def save_keyframe_trajectory_tum(self, path: str):
        """Keyframe poses read from the CURRENT map state (System.cc:442+),
        alive slots in insertion order."""
        import numpy as _np
        self.tracker.flush()
        st = self.tracker.map_state
        valid = _np.asarray(st.kf_valid)
        seq = _np.asarray(st.kf_seq)
        alive = _np.where(valid)[0]
        order = alive[_np.argsort(seq[alive])]
        kf_pose = _np.asarray(st.kf_pose)[order]
        kf_ts = _np.asarray(st.kf_ts)[order]
        save_keyframe_trajectory_tum(path, list(kf_ts), list(kf_pose))

    def save_trajectory_manhattan(self, path: str):
        corrected = self.tracker.corrected_trajectory()
        ts = [t for t, _ in corrected]
        poses = [p for _, p in corrected]
        R_wm = np.asarray(self.tracker.map_state.R_wm)
        save_trajectory_manhattan(path, ts, poses, R_mw=R_wm.T)

    def save_map(self, path: str):
        from dr_slam_tpu.io.map_io import save_map
        save_map(path, self.tracker.map_state)

    def load_map(self, path: str):
        from dr_slam_tpu.io.map_io import load_map
        self.tracker._pending.clear()  # drop deferred frames of the old map
        self.tracker.map_state = load_map(path, self.cfg)
        self.tracker._map_gen += 1
        self.tracker._hard_gen += 1
        self.tracker._n_kfs_host = int(self.tracker.map_state.n_kfs)
        self.tracker.state = TrackState.LOST  # relocalize into the map

    def shutdown(self, save_dir: Optional[str] = None):
        self.tracker.flush()
        if self._loop_closer is not None:
            # join the detached GBA (the reference blocks shutdown on its
            # GBA thread too, System.cc:356-377)
            merged = self._loop_closer.resolve_gba(
                self.tracker.map_state, guard_gen=self.tracker._hard_gen,
                block=True)
            if merged is not None:
                self.tracker.map_state = merged
                self.tracker._map_gen += 1
        if save_dir:
            os.makedirs(save_dir, exist_ok=True)
            self.save_trajectory_tum(os.path.join(save_dir, "CameraTrajectory.txt"))
            self.save_keyframe_trajectory_tum(
                os.path.join(save_dir, "KeyFrameTrajectory.txt"))
            from dr_slam_tpu.utils.profiling import PROFILER
            if PROFILER.enabled:
                PROFILER.dump(os.path.join(save_dir, "stage_profile.json"))
        self.metrics.close()
