"""Fully device-resident SLAM tracking loop: ZERO host readbacks per frame.

Motivation (measured on the axon-tunneled TPU runtime, round 3): the runtime
has two modes. In its fast mode, the fused per-frame program executes in
~0.5 ms and dispatches are asynchronous. The FIRST host-value readback in a
process (any `np.asarray`/`float()` of a device buffer, async-copied or not)
stalls for seconds AND permanently degrades the process: every later
execution of a multi-output program costs ~30-110 ms of synchronous RPC.
A host-side state machine -- even one readback per frame -- therefore caps
closed-loop tracking at ~8 fps no matter how fast the kernels are.

The TPU-native answer is to move the WHOLE per-frame state machine onto the
device: keyframe need/insertion, the full LocalMapping pass (culling,
triangulation, fuse, local BA), LOST detection with pose rollback, and map
initialization all run under `lax.cond` inside ONE jitted step. The host
feeds frames and appends opaque device records; nothing is read back until
`flush()` after the run (or at an explicit epoch boundary). This is the
tensor-program equivalent of the reference's real-time Tracking thread
(src/Tracking.cc:242-724) plus its LocalMapping worker
(src/LocalMapping.cc:28-80) -- fused, branchless at the host level, and
immune to host-link pathology. Loop closing (the reference's asynchronous
LoopClosing thread) stays a host/offline stage over the flushed map, exactly
as the reference runs it off the critical path.

Semantics vs the host state machine (slam/tracking.py):
- decisions are per-frame synchronous ON DEVICE (no one-frame lag);
- LOST recovery is two-rung, both device-side: first re-track from the
  last good pose with an identity velocity prior (brief occlusion/blur),
  then -- if the previous frame was already lost -- full relocalization
  under lax.cond (_reloc_attempt: BoW top-k candidates, word-bucketed
  matching, Horn 3D-3D RANSAC, pose optimization, full-map projection
  verification), so even teleports recover without a host readback;
- loop closing can run as a bounded host-assist epoch between segments
  (loop_closing_epoch()), or entirely after flush();
- host-side trajectory bookkeeping is reconstructed at flush() from the
  per-frame records (pose, reference keyframe slot + insertion seq + pose
  at track time), giving the same loop-correctable trajectory the host
  tracker maintains incrementally.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from dr_slam_tpu.config import SlamConfig
from dr_slam_tpu.geometry import se3
from dr_slam_tpu.manhattan.bootstrap import find_manhattan
from dr_slam_tpu.manhattan.tracker import track_manhattan_frame
from dr_slam_tpu.slam import map_ops
from dr_slam_tpu.slam.state import MapState, make_empty_state
from dr_slam_tpu.slam.track_step import track_step


class LoopCarry(NamedTuple):
    """Everything the per-frame state machine needs, device-resident."""
    map_state: MapState
    T_cw: jnp.ndarray           # (4, 4)
    velocity: jnp.ndarray       # (4, 4)
    R_cm: jnp.ndarray           # (3, 3)
    ref_kf: jnp.ndarray         # () int32 reference keyframe slot
    lost: jnp.ndarray           # () bool
    frame_id: jnp.ndarray       # () int32
    last_kf_frame: jnp.ndarray  # () int32
    last_kf_inliers: jnp.ndarray  # () int32


# per-frame record layout (f32): [0:16] T_cw  [16] state(0 ok/1 lost/2 noinit)
# [17] n_inliers [18] n_matches [19] is_kf [20] ref_kf [21] ref_seq
# [22:38] ref kf pose at track time [38] man_ok [39] frame_id
REC_SIZE = 40


def init_carry(cfg: SlamConfig, map_state: MapState | None = None,
               T_cw=None) -> LoopCarry:
    st = map_state if map_state is not None else make_empty_state(cfg)
    return LoopCarry(
        map_state=st,
        T_cw=jnp.eye(4) if T_cw is None else jnp.asarray(T_cw, jnp.float32),
        velocity=jnp.eye(4),
        R_cm=jnp.eye(3),
        ref_kf=jnp.asarray(0, jnp.int32),
        lost=jnp.asarray(False),
        frame_id=jnp.asarray(0, jnp.int32),
        last_kf_frame=jnp.asarray(0, jnp.int32),
        last_kf_inliers=jnp.asarray(0, jnp.int32))


def _pack_record(carry: LoopCarry, state_code, n_inl, n_mat, is_kf,
                 man_ok) -> jnp.ndarray:
    ref = carry.ref_kf
    ref_pose = carry.map_state.kf_pose[ref]
    ref_seq = carry.map_state.kf_seq[ref]
    return jnp.concatenate([
        carry.T_cw.reshape(-1).astype(jnp.float32),
        jnp.stack([state_code.astype(jnp.float32),
                   n_inl.astype(jnp.float32), n_mat.astype(jnp.float32),
                   is_kf.astype(jnp.float32), ref.astype(jnp.float32),
                   ref_seq.astype(jnp.float32)]),
        ref_pose.reshape(-1).astype(jnp.float32),
        jnp.stack([man_ok.astype(jnp.float32),
                   carry.frame_id.astype(jnp.float32)])])


def _init_branch(carry: LoopCarry, feats, ts, cfg: SlamConfig):
    """StereoInitialization on device (Tracking.cc:1549 semantics; mirrors
    Tracker._initialize): first frame with enough depth becomes KF0 at the
    origin, planes/lines seed the map, Manhattan axes bootstrap from the
    frame's planes (Map::FindManhattan, src/Map.cc:178)."""
    n_depth = jnp.sum(feats.kp.valid & (feats.kp_depth > 1e-3))
    ok = n_depth >= cfg.tracking.init_min_depth_points

    def do_init(c: LoopCarry):
        from dr_slam_tpu.associate.vocabulary import compute_bow
        T0 = jnp.eye(4)
        R_cm, mok = find_manhattan(
            feats.planes.coeffs[:, :3], feats.planes.valid,
            feats.planes.n_blocks.astype(jnp.float32),
            feats.lines.man_dir, feats.lines.man_ok,
            vertical_cos=cfg.plane.vertical_threshold)
        man = track_manhattan_frame(
            R_cm, feats.normals, feats.normals_valid,
            feats.lines.man_dir, feats.lines.man_ok,
            cone_normals=cfg.manhattan.cone_angle_normals,
            cone_lines=cfg.manhattan.cone_angle_lines,
            kernel=cfg.manhattan.mean_shift_kernel,
            min_ratio=cfg.manhattan.min_sn_ratio)
        R_cm = jnp.where(mok & man.success, man.R_cm, R_cm)
        K = cfg.orb.max_keypoints
        no_match = jnp.full((K,), -1, jnp.int32)
        pm = map_ops.match_planes(c.map_state, feats.planes.coeffs,
                                  feats.planes.valid, T0)
        lm = jnp.full((cfg.line.max_lines,), -1, jnp.int32)
        bow = compute_bow(feats.kp.desc, feats.kp.valid, cfg.map.vocab_words)
        st, kf_id = map_ops.add_keyframe(
            c.map_state, feats, T0, ts, no_match, pm, lm, bow, cfg)
        st = st._replace(R_wm=R_cm, manhattan_ok=mok)
        return LoopCarry(
            map_state=st, T_cw=T0, velocity=jnp.eye(4), R_cm=R_cm,
            ref_kf=kf_id.astype(jnp.int32), lost=jnp.asarray(False),
            frame_id=c.frame_id, last_kf_frame=c.frame_id,
            last_kf_inliers=n_depth.astype(jnp.int32))

    new = jax.lax.cond(ok, do_init, lambda c: c, carry)
    code = jnp.where(ok, 0.0, 2.0)
    rec = _pack_record(new, code, n_depth, n_depth, ok, new.map_state.manhattan_ok)
    return new, rec


def _kf_branch(state: MapState, feats, out, T_cur, ts, prev_kf,
               cfg: SlamConfig):
    """The synchronous LocalMapping pass, device-side (mirrors
    Tracker._maybe_insert_keyframe, which mirrors Tracking.cc:3040 +
    LocalMapping.cc:28-80)."""
    from dr_slam_tpu.associate.vocabulary import compute_bow
    tr = cfg.tracking
    bow = compute_bow(feats.kp.desc, feats.kp.valid, cfg.map.vocab_words)
    blocked = map_ops.creation_block_mask(
        state, feats.kp.uv, feats.kp_depth, T_cur, cfg.camera.K4)
    pm = map_ops.PlaneMatches(
        match_idx=out.plane_match, par_idx=out.plane_par,
        ver_idx=out.plane_ver,
        obs_world=jax.vmap(
            lambda p: se3.plane_to_world(T_cur, p))(feats.planes.coeffs))
    state, kf_id = map_ops.add_keyframe(
        state, feats, T_cur, ts, out.mp_idx, pm, out.line_match, bow, cfg,
        blocked=blocked)
    if tr.run_cull_on_keyframe:
        state = map_ops.cull_map(state,
                                 merge_angle_cos=cfg.plane.merge_angle_cos,
                                 merge_dist=cfg.plane.merge_dist)
    if tr.run_triangulation:
        state = map_ops.triangulate_with_kf(state, kf_id, prev_kf,
                                            cfg.camera.K4)
    if tr.run_fuse_on_keyframe:
        state = map_ops.fuse_new_points(state, kf_id, fuse_dist=tr.fuse_dist)
    if tr.run_ba_on_keyframe:
        from dr_slam_tpu.optimize.global_ba import (bundle_adjust,
                                                    local_problem_from_state,
                                                    problem_from_state)
        ws = tr.use_struct_in_ba
        if tr.use_local_ba:
            prob, win = local_problem_from_state(
                state, kf_id, window=tr.local_ba_window, with_struct=ws)
            ba = bundle_adjust(prob, cfg.camera.K4, n_gn_iters=4,
                               n_cg_iters=24)
            kf_pose = state.kf_pose.at[win].set(ba[0])
        else:
            prob = problem_from_state(state, with_struct=ws)
            ba = bundle_adjust(prob, cfg.camera.K4, n_gn_iters=4,
                               n_cg_iters=24)
            kf_pose = ba[0]
        state = state._replace(
            kf_pose=kf_pose, pt_pos=ba[1],
            pl_coef=ba[2] if ws else state.pl_coef,
            ln_ep=ba[3] if ws else state.ln_ep)
        T_cur = state.kf_pose[kf_id]
    if tr.run_kf_culling:
        state = map_ops.cull_one_keyframe(state)
    return state, kf_id.astype(jnp.int32), T_cur


def _reloc_attempt(carry: LoopCarry, feats, cfg: SlamConfig):
    """Device-side Relocalization (Tracking.cc:3543-3688 capability, fully
    under jit so the readback-free regime survives being lost): BoW L1
    scores over all keyframes -> top-3 candidates -> word-bucketed
    descriptor matching per candidate -> Horn 3D-3D RANSAC (RGB-D metric
    consensus, well-posed where 2D-3D DLT degenerates on coplanar walls)
    -> joint pose optimization on the best candidate -> full-map projection
    verification. Returns (accepted, T_cw, ref_kf_slot, n_inliers)."""
    from dr_slam_tpu.associate.vocabulary import (bow_scores, compute_bow,
                                                  word_ids)
    from dr_slam_tpu.optimize.pose_opt import pose_optimize
    from dr_slam_tpu.optimize.sim3 import sim3_ransac

    st = carry.map_state
    cam = cfg.camera
    bow = compute_bow(feats.kp.desc, feats.kp.valid, cfg.map.vocab_words)
    scores = bow_scores(bow, st.kf_bow, st.kf_valid)
    _, top_idx = jax.lax.top_k(scores, 3)
    kpw = word_ids(feats.kp.desc, cfg.map.vocab_words)

    def try_candidate(kf_id):
        ref = map_ops.match_reference_kf(
            st, kf_id, feats.kp.desc, feats.kp.valid,
            max_hamming=map_ops.TH_HIGH, kp_word=kpw,
            kf_word=st.kf_word[kf_id])
        pts3d = st.pt_pos[jnp.clip(ref.mp_idx, 0)]
        pairs3d = (ref.mp_idx >= 0) & (feats.kp_depth > 1e-3)
        T0, _, n_in = sim3_ransac(pts3d, feats.kp_xyz, pairs3d,
                                  inlier_dist=0.10)
        return T0, n_in, ref.mp_idx

    T0s, n_ins, mp_idxs = jax.vmap(try_candidate)(top_idx)
    best = jnp.argmax(n_ins)
    T0, n_in, mp_idx = T0s[best], n_ins[best], mp_idxs[best]
    kf_best = top_idx[best]

    pm = map_ops.match_planes(st, feats.planes.coeffs, feats.planes.valid,
                              T0)
    no_lines = jnp.full((cfg.line.max_lines,), -1, jnp.int32)
    obs = map_ops.build_pose_obs(st, feats, mp_idx, pm, no_lines,
                                 n_struct=cfg.map.max_kf_planes)
    opt = pose_optimize(T0, obs, cam.K4, cam.bf)
    verify = map_ops.match_points_projection(
        st, feats.kp.uv, feats.kp.desc, feats.kp.valid, opt.T_cw, cam.K4,
        radius=6.0, max_hamming=map_ops.TH_LOW + 10.0,
        width=cam.width, height=cam.height, kp_angle=feats.kp.angle,
        kp_octave=feats.kp.octave, pt_scale=cfg.orb.scale_factor,
        n_levels=cfg.orb.n_levels)
    # acceptance = the host tracker's strong-metric gate
    # (tracking.py _relocalize): a >=30-inlier rigid 3D-3D consensus on
    # measured depth plus joint-opt and full-map projection floors
    accepted = ((n_in >= 30) & (opt.n_inliers >= 15)
                & (verify.n_matches >= 35))
    return accepted, opt.T_cw, kf_best.astype(jnp.int32), opt.n_inliers


def _track_branch(carry: LoopCarry, feats, ts, cfg: SlamConfig,
                  localization_only: bool):
    out = track_step(carry.map_state, feats, carry.T_cw, carry.velocity,
                     carry.R_cm, carry.ref_kf, cfg)
    n_inl = out.n_inliers
    n_mat = out.n_matches
    bad = ((n_inl < 10) | (n_inl < 0.3 * jnp.maximum(n_mat, 1))
           | (out.jump > 0.30))
    # failure recovery, two rungs:
    # 1. rollback to the last good pose with an identity velocity prior;
    #    next frame retries from there (the BoW-bucketed reference-KF
    #    fallback inside track_step handles match collapse) -- covers brief
    #    occlusions/blur where the camera hasn't moved far;
    # 2. if the PREVIOUS frame was already lost and this frame is bad again
    #    (rung 1 failed), run full device-side relocalization -- covers
    #    teleports/long occlusions the re-track can never recover from.
    st0 = carry.map_state
    reloc_ok, T_reloc, reloc_kf, reloc_inl = jax.lax.cond(
        carry.lost & bad,
        lambda: _reloc_attempt(carry, feats, cfg),
        lambda: (jnp.asarray(False), carry.T_cw,
                 carry.ref_kf, jnp.asarray(0, jnp.int32)))
    T_new = jnp.where(reloc_ok, T_reloc,
                      jnp.where(bad, carry.T_cw, out.T_cw))
    vel_new = jnp.where(bad | reloc_ok, jnp.eye(4), out.velocity)
    R_new = jnp.where(
        reloc_ok & st0.manhattan_ok, T_reloc[:3, :3] @ st0.R_wm,
        jnp.where(bad, carry.R_cm, out.R_cm))
    ref_base = jnp.where(reloc_ok, reloc_kf, carry.ref_kf)
    lost_new = bad & ~reloc_ok
    n_inl = jnp.where(reloc_ok, reloc_inl, n_inl)
    if localization_only:
        state = carry.map_state  # frozen map: no statistics, no keyframes
    else:
        # rejected frames must not mutate map statistics (matches the host
        # deferred path); a reloc frame's track stats came from the WRONG
        # pose, so they are rejected too
        state = jax.tree_util.tree_map(
            lambda a, b: jnp.where(bad, a, b),
            carry.map_state, out.new_map_state)

    tr = cfg.tracking
    frames_since = carry.frame_id - carry.last_kf_frame
    n_kfs = jnp.sum(state.kf_valid)
    # NeedNewKeyFrame (Tracking.cc:2944-3000), identical to the host policy
    # in Tracker._maybe_insert_keyframe -- see there for the rationale; the
    # close/ref counts come out of track_step's scalar bundle
    n_close_tracked = out.bundle[20]
    n_close_untracked = out.bundle[21]
    ref_floor = jnp.maximum(out.bundle[22], 1.0)
    n_inl_f = n_inl.astype(jnp.float32)
    # close thresholds are per-1000-features (see TrackingConfig)
    fscale = cfg.orb.n_features / 1000.0
    need_close = ((n_close_tracked < tr.kf_close_tracked_max * fscale)
                  & (n_close_untracked > tr.kf_close_untracked_min * fscale))
    c1a = frames_since >= tr.max_frames
    c1b = frames_since >= tr.min_frames
    c1c = (n_inl_f < tr.kf_collapse_ratio * ref_floor) | need_close
    c2 = (((n_inl_f < tr.kf_ref_ratio * ref_floor) | need_close)
          & (n_inl > tr.kf_min_inliers))
    forced = c1a & (n_inl > tr.kf_min_inliers)
    want_kf = ~bad & (forced | ((c1b | c1c) & c2))
    # capacity wall: the tracker demands a new reference view but no slot
    # is free -- force-evict the most redundant non-protected keyframe
    # (see cull_one_keyframe force=True; mirrors the host tracker). Under
    # lax.cond the recount/evict program only runs on wall frames.
    at_wall = n_kfs >= cfg.map.max_keyframes - 1
    if not localization_only:
        state = jax.lax.cond(
            want_kf & at_wall,
            lambda s: map_ops.cull_one_keyframe(s, force=True),
            lambda s: s, state)
    need_kf = want_kf & (jnp.sum(state.kf_valid)
                         < cfg.map.max_keyframes - 1)
    if localization_only:
        need_kf = jnp.asarray(False)
        new_state, new_ref, T_post = state, ref_base, T_new
    else:
        new_state, new_ref, T_post = jax.lax.cond(
            need_kf,
            lambda s: _kf_branch(s, feats, out, T_new, ts, ref_base, cfg),
            lambda s: (s, ref_base, T_new),
            state)

    new = LoopCarry(
        map_state=new_state, T_cw=T_post, velocity=vel_new, R_cm=R_new,
        ref_kf=new_ref, lost=lost_new, frame_id=carry.frame_id,
        last_kf_frame=jnp.where(need_kf, carry.frame_id,
                                carry.last_kf_frame),
        last_kf_inliers=jnp.where(need_kf, n_inl.astype(jnp.int32),
                                  carry.last_kf_inliers))
    rec = _pack_record(new, jnp.where(lost_new, 1.0, 0.0), n_inl, n_mat,
                       need_kf, out.man_ok)
    return new, rec


def device_track_step_impl(carry: LoopCarry, gray, depth, ts,
                           cfg: SlamConfig,
                           localization_only: bool = False):
    """Un-jitted body of device_track_step -- also the unit
    parallel/multi_seq.py maps over a device mesh (shard_map keeps the
    lax.cond branches dynamic per device, unlike vmap's select)."""
    from dr_slam_tpu.frontend.frame import _extract_frame
    feats = _extract_frame(gray, depth, cfg.camera, cfg.orb, cfg.plane,
                           cfg.line)
    carry = carry._replace(frame_id=carry.frame_id + 1)
    initialized = jnp.any(carry.map_state.kf_valid)
    if localization_only:
        # a frozen map is by definition initialized; skip the init program
        return _track_branch(carry, feats, ts, cfg, True)
    return jax.lax.cond(
        initialized,
        lambda c: _track_branch(c, feats, ts, cfg, False),
        lambda c: _init_branch(c, feats, ts, cfg),
        carry)


@functools.partial(jax.jit, static_argnames=("cfg", "localization_only"),
                   donate_argnums=(0,))
def device_track_step(carry: LoopCarry, gray, depth, ts,
                      cfg: SlamConfig, localization_only: bool = False):
    """ONE device program per frame: front-end extraction + tracking + the
    whole keyframe/LocalMapping state machine under lax.cond. Returns
    (carry', record (REC_SIZE,) f32). The caller must never read the record
    back until the end of the run (see module docstring)."""
    return device_track_step_impl(carry, gray, depth, ts, cfg,
                                  localization_only)


@functools.partial(jax.jit, static_argnames=("cfg", "localization_only"),
                   donate_argnums=(0,))
def device_track_chunk(carry: LoopCarry, gray_stack, depth_stack, ts_stack,
                       cfg: SlamConfig, localization_only: bool = False):
    """N frames per dispatch: the full per-frame state machine scanned over a
    stacked frame chunk inside ONE device program.

    A recorded or bounded-latency stream (the reference's dataset-runner
    regime, Examples/RGB-D/main.cc:71-109) trades <= N frames of decision
    latency for one dispatch per N frames: host dispatch work drops by N and
    the H2D camera copy coalesces into one transfer. Semantically identical
    to N device_track_step calls: scan is sequential, so the lax.cond
    keyframe / init / LOST branches stay dynamic per frame exactly as in the
    unchunked step (unlike vmap, which would select-merge them); equivalence
    is tested in test_device_loop_chunked_equivalent (same state-machine
    path, poses to ~1e-3 -- different compiled programs round differently).

    Honest perf note (measured on the tunneled v5e runtime, round 5): this
    is NOT a throughput win there -- the scan carries the whole MapState, so
    each iteration rewrites carry buffers that the per-frame path updates
    in place via donation (measured 275 fps chunked vs 380-835 fps
    per-frame, same process). Use it where host dispatch capacity, not
    wall-clock per frame, is the scarce resource (many trackers per host,
    or the multi-sequence mesh in parallel/multi_seq.py).

    Returns (carry', records (N, REC_SIZE))."""

    def body(c, xs):
        g, d, ts = xs
        return device_track_step_impl(c, g, d, ts, cfg, localization_only)

    return jax.lax.scan(body, carry, (gray_stack, depth_stack, ts_stack))


class DeviceLoopTracker:
    """Host shell around the device-resident loop.

    track() does exactly: two H2D transfers + one program dispatch + one
    host list append of opaque device buffers. flush() performs the single
    end-of-run readback and reconstructs host-side trajectories (raw and
    reference-keyframe-relative, the latter loop-correctable like
    Tracker.corrected_trajectory)."""

    def __init__(self, cfg: SlamConfig, map_state: MapState | None = None,
                 localization_only: bool = False):
        self.cfg = cfg
        self.localization_only = bool(localization_only)
        self.carry = init_carry(cfg, map_state)
        self._records: list = []      # device (REC_SIZE,) buffers
        self._ts: list[float] = []    # host floats (no device trip)
        self._flushed = None
        self._loop_closer = None      # lazy; see loop_closing_epoch()

    @staticmethod
    def _native_dtypes(gray, depth):
        # native-dtype passthrough: uint8 gray / uint16 depth transfer 2.7x
        # less over the TPU link and are cast+scaled on device
        # (frontend.frame.ingest); float inputs behave exactly as before
        g = jnp.asarray(gray)
        d = jnp.asarray(depth)
        if g.dtype not in (jnp.uint8, jnp.float32):
            g = g.astype(jnp.float32)
        # integer depth of ANY width is sensor units: keep it integer so
        # ingest() applies the 1/DepthMapFactor scale on device (casting to
        # f32 here would smuggle sensor units through as meters)
        if not (d.dtype == jnp.float32
                or jnp.issubdtype(d.dtype, jnp.integer)):
            d = d.astype(jnp.float32)
        return g, d

    def track(self, gray, depth, timestamp: float):
        g, d = self._native_dtypes(gray, depth)
        self.carry, rec = device_track_step(
            self.carry, g, d, jnp.asarray(timestamp, jnp.float32),
            self.cfg, self.localization_only)
        self._records.append(rec)
        self._ts.append(float(timestamp))
        self._flushed = None
        return rec   # opaque device buffer; do NOT read back mid-run

    def track_chunk(self, gray_stack, depth_stack, timestamps):
        """Track N stacked frames in ONE dispatch (device_track_chunk).

        Bit-identical to N track() calls; use for recorded streams or any
        consumer that can afford <= N frames of decision latency in exchange
        for per-frame dispatch amortization. `timestamps` is a length-N
        sequence of floats."""
        g, d = self._native_dtypes(gray_stack, depth_stack)
        ts = jnp.asarray(np.asarray(timestamps, np.float32))
        self.carry, recs = device_track_chunk(
            self.carry, g, d, ts, self.cfg, self.localization_only)
        self._records.append(recs)            # (N, REC_SIZE) device buffer
        self._ts.extend(float(t) for t in np.asarray(timestamps))
        self._flushed = None
        return recs  # opaque device buffer; do NOT read back mid-run

    @property
    def map_state(self) -> MapState:
        return self.carry.map_state

    def loop_closing_epoch(self, loop_closer=None) -> bool:
        """Online loop closing for the device-resident loop: a BOUNDED
        host-assist epoch the caller runs every N frames/keyframes (the
        reference's LoopClosing thread waking up, LoopClosing.cc:57).

        Reads back the current reference-keyframe slot (one small D2H) and
        hands the device map state to the LoopCloser's detection +
        correction pipeline; on a correction the carry is re-seated on the
        corrected pose. Between epochs the per-frame regime stays
        readback-free, so a long on-device run gets drift correction
        online instead of only at flush(). Returns True if a loop fired."""
        from dr_slam_tpu.slam.loop_closing import LoopCloser
        if loop_closer is None:
            if self._loop_closer is None:
                self._loop_closer = LoopCloser(
                    self.cfg,
                    consistency_needed=self.cfg.tracking.loop_consistency,
                    # the epoch is synchronous by design (it IS the bounded
                    # stall); async GBA would merge into a stale carry
                    gba_async=False)
            loop_closer = self._loop_closer
        ref = int(np.asarray(self.carry.ref_kf))
        new_state, corrected = loop_closer.process(self.carry.map_state, ref)
        if corrected:
            T_c = new_state.kf_pose[jnp.asarray(ref)]
            R_cm = jnp.where(new_state.manhattan_ok,
                             T_c[:3, :3] @ new_state.R_wm, self.carry.R_cm)
            self.carry = self.carry._replace(
                map_state=new_state, T_cw=T_c, velocity=jnp.eye(4),
                R_cm=R_cm)
        return bool(corrected)

    def flush(self) -> dict:
        """The ONE readback. Returns {'records': (N, REC_SIZE) np.ndarray,
        'trajectory': [(ts, T_cw)], 'states': [str], 'n_keyframes': int}."""
        if self._flushed is not None:
            return self._flushed
        if not self._records:
            return {"records": np.zeros((0, REC_SIZE), np.float32),
                    "trajectory": [], "states": [], "n_keyframes": 0}
        # records are (REC_SIZE,) rows from track() and/or (N, REC_SIZE)
        # blocks from track_chunk(); one concatenate is the single readback
        recs = np.asarray(jnp.concatenate(
            [jnp.reshape(r, (-1, REC_SIZE)) for r in self._records]))
        traj = [(ts, r[:16].reshape(4, 4).astype(np.float64))
                for ts, r in zip(self._ts, recs)]
        names = {0.0: "OK", 1.0: "LOST", 2.0: "NOT_INITIALIZED"}
        states = [names.get(float(r[16]), "OK") for r in recs]
        self._flushed = {
            "records": recs, "trajectory": traj, "states": states,
            "n_keyframes": int(np.asarray(
                jnp.sum(self.carry.map_state.kf_valid))),
        }
        return self._flushed

    def corrected_trajectory(self) -> list:
        """[(ts, T_cw)] recomposed from each frame's reference keyframe's
        CURRENT pose (System::SaveTrajectoryTUM semantics, System.cc:379):
        map refinements (BA; host-side loop closure run after flush) reach
        every tracked frame. Frames whose reference slot was recycled
        (insertion-seq mismatch) keep their at-track pose."""
        f = self.flush()
        st = self.carry.map_state
        kf_pose = np.asarray(st.kf_pose)
        kf_seq = np.asarray(st.kf_seq)
        kf_valid = np.asarray(st.kf_valid)
        out = []
        for ts, r in zip(self._ts, f["records"]):
            T = r[:16].reshape(4, 4).astype(np.float64)
            ref = int(r[20])
            seq = int(r[21])
            ref_pose_then = r[22:38].reshape(4, 4).astype(np.float64)
            if (0 <= ref < kf_pose.shape[0] and kf_valid[ref]
                    and kf_seq[ref] == seq):
                T_rel = T @ np.linalg.inv(ref_pose_then)
                T = T_rel @ kf_pose[ref]
            out.append((ts, T))
        return out
