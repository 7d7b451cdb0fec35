"""Loop closing: detection, geometric verification, correction, global BA.

Capability of the reference LoopClosing thread (src/LoopClosing.cc):
- DetectLoop (:108): DBoW2 candidates gated by the minimum BoW score among
  covisible neighbors, plus consistency across consecutive keyframes
  (mnCovisibilityConsistencyTh = 3).
- ComputeSim3 (:277): descriptor matches -> Sim3Solver RANSAC (fixed scale
  for RGB-D) -> refinement.
- CorrectLoop (:448): propagate the correction, optimize the essential
  graph (Optimizer::OptimizeEssentialGraph), then run global BA in a
  detached thread (:625 -> RunGlobalBundleAdjustment :691).

TPU design: detection is one BoW matmul over all keyframes; verification is
batched Horn-RANSAC on device; correction is one pose-graph solve (matrix-
free PCG) + a vectorized landmark re-anchoring (every point moves with its
reference keyframe). The host only sequences these device programs."""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from dr_slam_tpu.associate import keyframe_db
from dr_slam_tpu.associate.vocabulary import bow_scores
from dr_slam_tpu.config import SlamConfig
from dr_slam_tpu.geometry import se3
from dr_slam_tpu.ops.hamming import hamming_matrix, mutual_best_matches
from dr_slam_tpu.optimize.global_ba import bundle_adjust, problem_from_state
from dr_slam_tpu.optimize.pose_graph import PoseGraph, optimize_pose_graph
from dr_slam_tpu.optimize.sim3 import sim3_ransac
from dr_slam_tpu.slam.state import MapState


@jax.jit
def _covis_counts(state: MapState, kf_id) -> jnp.ndarray:
    """(NK,) shared-map-point counts between kf_id and every keyframe."""
    NP = state.pt_pos.shape[0]
    row = state.kf_mp[kf_id]
    ind = jnp.zeros(NP + 1, jnp.int32).at[jnp.where(row >= 0, row, NP)].set(1)
    cnt = ind[jnp.clip(state.kf_mp, 0)] * (state.kf_mp >= 0)
    return jnp.sum(cnt, -1) * state.kf_valid


@jax.jit
def _match_kf_pairs(state: MapState, kf_a, kf_b):
    """Descriptor matches between two keyframes' depth-backed features ->
    camera-frame 3D pairs for Horn alignment (+ the matched feature index in
    kf_b for projection refinement).

    The 3D pairs come from the keyframes' STORED per-feature backprojections
    (kf_xyz, measured RGB-D depth at capture time), NOT from the current map
    positions the reference uses (LoopClosing.cc:318 ComputeSim3 on MapPoint
    world coords). Map positions are drift-deformed -- each landmark carries
    the gauge of whichever keyframes refined it last -- so a true revisit
    pair yields a NON-RIGID 3D-3D set that starves Horn-RANSAC consensus
    (round-2 regression: 1-7 inliers on true pairs). Measured depth is rigid
    per keyframe by construction, and needs no landmark association, which
    also multiplies the usable pair count."""
    da = state.kf_desc[kf_a]
    db = state.kf_desc[kf_b]

    def _depth_ok(kf):
        z = state.kf_xyz[kf][:, 2]
        return (state.kf_ur[kf] >= 0) & (z > 0.1) & (z < 8.0)

    va = state.kf_kp_valid[kf_a] & _depth_ok(kf_a)
    vb = state.kf_kp_valid[kf_b] & _depth_ok(kf_b)
    D = jnp.where(va[:, None] & vb[None, :],
                  hamming_matrix(da, db), jnp.inf)
    match, _ = mutual_best_matches(D, max_dist=60.0, ratio=0.8)
    ok = match >= 0
    Xa = state.kf_xyz[kf_a]
    Xb = state.kf_xyz[kf_b][jnp.clip(match, 0)]
    return Xa, Xb, ok, match


@jax.jit
def _refine_loop_rel(state: MapState, cur_kf, Xa, match_b, ok, T_rel, K4,
                     bf):
    """Refine the loop relative transform by minimizing the reprojection of
    the loop keyframe's measured points (camera-frame Xa) against their
    matched STEREO observations (u, v, uR) in the current keyframe -- the
    projection-error refinement the reference runs as OptimizeSim3
    (Optimizer.cc:3982) between Sim3-RANSAC and the essential graph.

    The observations must be stereo (depth-bearing): mono reprojection of
    these pairs is nearly degenerate -- loop pairs in a Manhattan scene are
    dominated by ONE wall plane, and coplanar mono observations admit a
    pose family sliding along the plane (round-3 root cause: the mono
    refine walked a 5 cm-accurate Horn estimate 2 m away while keeping
    52/67 points within 8 px). A trust region guards the remaining gauge:
    if the refined pose moved > 0.3 m / ~11 deg from the Horn estimate,
    keep the Horn estimate (it has hundreds of 3D-3D inliers behind it)."""
    from dr_slam_tpu.optimize.pose_opt import PoseObservations, pose_optimize

    K = Xa.shape[0]
    mb = jnp.clip(match_b, 0)
    uv_b = state.kf_uv[cur_kf][mb]
    ur_b = state.kf_ur[cur_kf][mb]
    sigma2 = state.kf_sigma2[cur_kf][mb]
    obs = PoseObservations.empty(K, 1, 1, 1)
    obs = obs._replace(
        pt_world=Xa,
        pt_obs=jnp.concatenate([uv_b, ur_b[:, None]], -1),
        pt_inv_sigma2=1.0 / jnp.maximum(sigma2, 1e-6),
        pt_valid=ok)
    opt = pose_optimize(T_rel, obs, jnp.asarray(K4, jnp.float32), bf=bf,
                        n_rounds=2, n_iters=8)
    d = opt.T_cw @ se3.inv_T(T_rel)
    moved_t = jnp.linalg.norm(d[:3, 3])
    moved_r = jnp.arccos(jnp.clip((jnp.trace(d[:3, :3]) - 1) / 2, -1, 1))
    good = (opt.n_inliers >= 15) & (moved_t < 0.3) & (moved_r < 0.2)
    T_out = jnp.where(good, opt.T_cw, T_rel)
    # acceptance count with a FIXED 8 px radius: accumulated drift deforms
    # the map non-rigidly around the seam, so true loop pairs carry several
    # px of irreducible reprojection error that a strict chi2 gate rejects
    Xc = se3.transform_points(T_out, Xa)
    uv_p = se3.project(jnp.asarray(K4, jnp.float32), Xc)
    err = jnp.linalg.norm(uv_p - uv_b, axis=-1)
    n_ok = jnp.sum(ok & (Xc[:, 2] > 0.1) & (err < 8.0))
    return T_out, n_ok


@dataclass
class LoopCloser:
    cfg: SlamConfig
    min_kf_gap: int = 10          # temporal exclusion window
    consistency_needed: int = 2   # consecutive detections (reference: 3)
    run_gba: bool = True
    # run the post-correction global BA ASYNCHRONOUSLY (the reference's
    # detached GBA thread, LoopClosing.cc:625): _correct only does the
    # pose-graph solve + seam fuse; the full-map bundle_adjust is dispatched
    # afterwards (device futures, host never blocks) and its result is
    # merged at a later keyframe via resolve_gba() once the buffers are
    # ready -- so the tracking loop never stalls on an O(map) solve.
    gba_async: bool = True
    _pending_gba: object = None
    _consistency: dict = field(default_factory=dict)
    _last_fire_seq: int = -1000   # cooldown (mLastLoopKFid, LoopClosing.cc:114)
    # accepted loop constraints, persisted across corrections: the
    # reference's essential graph keeps every past loop edge
    # (KeyFrame::AddLoopEdge consumed by OptimizeEssentialGraph,
    # Optimizer.cc:2894). Without them, a SECOND correction's weight-1
    # odometry/covis edges still encode the drift the FIRST correction
    # removed and can partially undo it (ADVICE r3). Keyed by insertion
    # sequence so keyframe-slot recycling cannot alias an edge.
    # entries: (seq_loop, seq_cur, T_rel 4x4 np: T_cur' = T_rel @ T_loop)
    _accepted_loops: list = field(default_factory=list)

    def process(self, state: MapState, cur_kf: int,
                odom: dict | None = None) -> tuple[MapState, bool]:
        """One detection step for the freshly inserted keyframe cur_kf.

        Two detection paths, each feeding the same verification+correction:
        - classic (reference DetectLoop, LoopClosing.cc:108): BoW candidates
          among NON-covisible keyframes -- catches revisits the tracker did
          NOT reconnect to (large drift).
        - seam-drift: the current keyframe became strongly covisible with a
          temporally DISTANT keyframe -- the tracker reconnected to an old
          map region through its match windows (implicit loop). The
          reference cannot fire here (covisible candidates are excluded,
          KeyFrameDatabase.cc:84) and silently leaves the accumulated chain
          drift in the graph; we geometrically verify the seam pair and fire
          the essential-graph correction when the measured relative pose
          disagrees with the current estimates.

        `odom`: {seq -> (prev_seq, T_rel)} odometry measurements captured at
        keyframe insertion (Tracker.kf_odom_host) -- used as temporal-edge
        measurements so the pose graph can SEE accumulated drift."""
        n_kfs = int(state.n_kfs)
        if n_kfs < self.min_kf_gap + 2:
            return state, False

        # ---- detection -----------------------------------------------------
        # keyframe rows are SLOTS; temporal adjacency lives in kf_seq
        valid = np.asarray(state.kf_valid)
        seq = np.asarray(state.kf_seq)
        if int(seq[cur_kf]) - self._last_fire_seq < self.min_kf_gap:
            return state, False  # cooldown after a correction
        scores = np.asarray(bow_scores(state.kf_bow[cur_kf], state.kf_bow,
                                       state.kf_valid))
        covis = np.asarray(_covis_counts(state, jnp.asarray(cur_kf)))
        neighbor = covis > 10
        neighbor[cur_kf] = True
        recent = np.abs(seq - seq[cur_kf]) < self.min_kf_gap
        min_score = float(scores[neighbor & (scores > 0)].min()) \
            if (neighbor & (scores > 0)).any() else 0.05
        # discriminative detection (KeyFrameDatabase.cc:76-199): shared-word
        # gate (>0.8*maxCommonWords), the covisible-neighbor minScore floor
        # (LoopClosing.cc:135), then covisibility-group score ACCUMULATION --
        # only groups within 0.75x of the best group survive, represented by
        # their best member. This is what keeps self-similar texture from
        # flooding the verifier with a candidate at every keyframe.
        common = np.asarray(keyframe_db.common_word_counts(
            state.kf_bow[cur_kf], state.kf_bow, state.kf_valid))
        allowed = valid & ~neighbor & ~recent
        covis_full_np = np.asarray(_covis_full(state))
        candidates = keyframe_db.group_candidates(
            scores, common, covis_full_np, allowed, min_score=min_score)
        if os.environ.get("DRSLAM_LC_DEBUG"):
            print(f"[loop] kf={cur_kf} seq={seq[cur_kf]} min_score="
                  f"{min_score:.3f} cands={list(candidates)} "
                  f"best_nonneighbor="
                  f"{[(int(k), round(float(scores[k]), 3)) for k in np.argsort(-scores * allowed)[:3]]}",
                  flush=True)
        if len(candidates) == 0:
            self._consistency = {}
            confirmed = []
        else:
            # consistency across consecutive keyframes (LoopClosing.cc:
            # 199-257); keyed by insertion sequence so slot reuse cannot
            # alias a streak
            new_consistency = {}
            confirmed = []
            for c in candidates:
                streak = 1 + max((v for k, v in self._consistency.items()
                                  if abs(k - seq[c]) <= 3), default=0)
                new_consistency[int(seq[c])] = streak
                if streak >= self.consistency_needed:
                    confirmed.append(int(c))
            self._consistency = new_consistency

        # ---- geometric verification (ComputeSim3 capability) ----------------
        # the reference tries EVERY consistent candidate with its own
        # Sim3Solver (LoopClosing.cc:277-349). Verification order: the best
        # by BoW score PLUS the oldest by insertion sequence -- true loop
        # partners are OLD keyframes, while self-similarity false positives
        # cluster near the recent end and can crowd a score-only shortlist.
        by_score = sorted(confirmed, key=lambda c: -scores[c])[:5]
        by_age = sorted(confirmed, key=lambda c: seq[c])[:3]
        trials = [(b, False) for b in dict.fromkeys(by_age + by_score)]

        # seam-drift partner: strongest covisible keyframe with a LARGE
        # insertion-sequence gap (the tracker reconnected across the loop)
        seam_mask = (valid & (covis > 30)
                     & (np.abs(seq - seq[cur_kf]) > self.min_kf_gap))
        if seam_mask.any():
            partner = int(np.argmax(np.where(seam_mask, covis, -1)))
            if partner not in [b for b, _ in trials]:
                trials.append((partner, True))

        for best, is_seam in trials:
            Xa, Xb, ok, match_b = _match_kf_pairs(state, jnp.asarray(best),
                                                  jnp.asarray(cur_kf))
            n_pairs = int(jnp.sum(ok))
            if n_pairs < 20:
                continue
            # T maps candidate-frame coords -> current-frame coords
            T_rel, s, n_inl = sim3_ransac(Xa, Xb, ok, inlier_dist=0.10)
            # a seam correction rewrites the whole graph off this one pair:
            # demand a dominant rigid consensus, not just 12 votes
            need = max(30, int(0.4 * n_pairs)) if is_seam else 12
            if int(n_inl) < need:
                if os.environ.get("DRSLAM_LC_DEBUG"):
                    print(f"[loop]   verify {best}->{cur_kf}"
                          f"{' (seam)' if is_seam else ''}: pairs={n_pairs} "
                          f"sim3_inl={int(n_inl)} REJ", flush=True)
                continue
            # projection-error refinement between RANSAC and the pose graph
            # (OptimizeSim3 role, Optimizer.cc:3982; scale fixed for RGB-D);
            # its reprojection inlier count is the decisive acceptance gate
            T_rel, n_reproj = _refine_loop_rel(
                state, jnp.asarray(cur_kf), Xa, match_b, ok, T_rel,
                self.cfg.camera.K4, self.cfg.camera.bf)
            if int(n_reproj) < 12:
                if os.environ.get("DRSLAM_LC_DEBUG"):
                    print(f"[loop]   verify {best}->{cur_kf}: pairs="
                          f"{n_pairs} sim3_inl={int(n_inl)} "
                          f"reproj_inl={int(n_reproj)} REJ", flush=True)
                continue
            # measured vs estimated relative pose: fire only when the graph
            # actually disagrees with the measurement (a consistent revisit
            # needs no correction -- and for covisible seam partners the
            # estimates are usually close, so this is the decisive gate)
            T_est = np.asarray(state.kf_pose[cur_kf]) @ np.linalg.inv(
                np.asarray(state.kf_pose[best]))
            delta = np.asarray(T_rel) @ np.linalg.inv(T_est)
            d_t = float(np.linalg.norm(delta[:3, 3]))
            d_r = float(np.arccos(np.clip(
                (np.trace(delta[:3, :3]) - 1) / 2, -1, 1)))
            if os.environ.get("DRSLAM_LC_DEBUG"):
                print(f"[loop]   verify {best}->{cur_kf}"
                      f"{' (seam)' if is_seam else ''}: pairs={n_pairs} "
                      f"sim3_inl={int(n_inl)} reproj_inl={int(n_reproj)} "
                      f"d_t={d_t:.3f} d_r={d_r:.4f}", flush=True)
            if d_t < 0.02 and d_r < 0.005:
                continue  # graph already consistent with the measurement

            # ---- correction --------------------------------------------------
            state = self._correct(state, cur_kf, best, T_rel, odom)
            self._accepted_loops.append(
                (int(seq[best]), int(seq[cur_kf]),
                 np.asarray(T_rel, dtype=np.float32)))
            self._consistency = {}
            self._last_fire_seq = int(seq[cur_kf])
            return state, True
        return state, False

    # ------------------------------------------------------------------
    def _correct(self, state: MapState, cur_kf: int, loop_kf: int,
                 T_rel: jnp.ndarray, odom: dict | None = None) -> MapState:
        NK = state.kf_pose.shape[0]
        valid = np.asarray(state.kf_valid)
        seq = np.asarray(state.kf_seq)
        alive = np.where(valid)[0]
        order = alive[np.argsort(seq[alive])]  # slots in temporal order
        poses_np = np.asarray(state.kf_pose)

        # edge table: temporal chain (odometry-measured where available) +
        # near-temporal covisibility + the loop edge. Temporal measurements
        # come from the odometry captured at insertion (Tracker.kf_odom_host)
        # -- measuring them from CURRENT estimates would bake accumulated
        # drift into the constraints and make the graph blind to it.
        edges_i, edges_j, weights, meas = [], [], [], []
        odom = odom or {}
        for a, b in zip(order[:-1], order[1:]):
            edges_i.append(int(a))
            edges_j.append(int(b))
            weights.append(1.0)
            rec = odom.get(int(seq[b]))
            if rec is not None and rec[0] == int(seq[a]):
                # stored: T_b @ inv(T_a); edge measures T_a @ inv(T_b)
                meas.append(np.linalg.inv(rec[1]).astype(np.float32))
            else:
                meas.append(poses_np[a] @ np.linalg.inv(poses_np[b]))
        # covisibility-edge measurements: compose the stored odometry chain
        # between the pair when it is complete -- measuring these edges from
        # CURRENT estimates bakes the accumulated drift into dozens of
        # weight-1 constraints that collectively out-pull the single loop
        # edge (measured: ~35% of injected drift survived the correction
        # mid-chain). The odometry chain is drift-free by construction.
        def _odom_rel(lo_seq: int, hi_seq: int):
            """T_lo @ inv(T_hi) composed from per-insertion odometry, or
            None where the prev-pointer chain is broken (reloc/reset)."""
            X = np.eye(4, dtype=np.float64)
            s = hi_seq
            while s != lo_seq:
                rec = odom.get(s)
                if rec is None or rec[0] >= s:
                    return None
                X = np.linalg.inv(rec[1]) @ X
                s = rec[0]
                if s < lo_seq:
                    return None
            return X.astype(np.float32)

        # covisibility edges: one masked argpartition over the whole matrix
        # instead of a per-keyframe argsort (round-1 review item). Only
        # NEAR-temporal pairs qualify: a covisibility edge spanning the loop
        # (seam) measured from current estimates would freeze the very drift
        # the correction is removing.
        covis_full = np.asarray(_covis_full(state))
        seq_gap = np.abs(seq[:, None] - seq[None, :])
        eligible = (valid[None, :] & valid[:, None] & (covis_full > 15)
                    & (seq_gap > 1) & (seq_gap <= self.min_kf_gap))
        masked = np.where(eligible, covis_full, -1.0)
        kk = min(4, masked.shape[1] - 1)
        top = np.argpartition(-masked, kk, axis=1)[:, :kk]
        for k in order:
            for j in top[k]:
                if masked[k, j] > 0:
                    edges_i.append(int(k))
                    edges_j.append(int(j))
                    weights.append(1.0)
                    sk, sj = int(seq[k]), int(seq[j])
                    rel = (_odom_rel(sk, sj) if sk < sj
                           else _odom_rel(sj, sk))
                    if rel is not None:
                        m = rel if sk < sj else np.linalg.inv(rel)
                        meas.append(m.astype(np.float32))
                    else:
                        meas.append(poses_np[k] @ np.linalg.inv(poses_np[j]))
        # past accepted loop edges (the reference's persisted
        # KeyFrame::mspLoopEdges): without these a later correction's
        # drift-encoding weight-1 edges can partially undo this one
        slot_of_seq = {int(seq[s]): int(s) for s in order}
        for s_loop, s_cur, T_l in self._accepted_loops:
            a = slot_of_seq.get(s_loop)
            b = slot_of_seq.get(s_cur)
            if a is None or b is None:
                continue  # one endpoint was culled; the constraint is gone
            edges_i.append(a)
            edges_j.append(b)
            weights.append(10.0)
            meas.append(np.linalg.inv(T_l).astype(np.float32))

        edges_i.append(int(loop_kf))
        edges_j.append(int(cur_kf))
        weights.append(10.0)  # strong loop constraint
        # the loop edge's measurement is the Horn/refined result:
        # T_cur' = T_rel @ T_loop  =>  T_loop @ inv(T_cur) = inv(T_rel)
        meas.append(np.linalg.inv(np.asarray(T_rel)).astype(np.float32))

        E = len(edges_i)
        ei = jnp.asarray(edges_i, dtype=jnp.int32)
        ej = jnp.asarray(edges_j, dtype=jnp.int32)
        poses = state.kf_pose
        T_ij = jnp.asarray(np.stack(meas).astype(np.float32))

        first_slot = int(order[0])  # oldest alive keyframe anchors the gauge
        fixed = jnp.zeros(NK, dtype=bool).at[first_slot].set(True)
        # odometry/covis edges are IRLS-robust (a seam keyframe's recorded
        # odometry can contain a 0.3-0.6 m gauge jump instead of camera
        # motion); loop edges -- the weight-10 ones -- are RANSAC-verified
        # and exempt, else their drift-sized residual self-downweights the
        # very correction this solve exists to apply (pose_graph.py).
        robust = jnp.asarray([wgt <= 1.0 for wgt in weights], dtype=bool)
        g = PoseGraph(
            poses=poses, pose_valid=state.kf_valid,
            edge_i=ei, edge_j=ej, edge_T_ij=T_ij,
            edge_valid=jnp.ones(E, dtype=bool),
            edge_weight=jnp.asarray(weights, dtype=jnp.float32),
            fixed=fixed, edge_robust=robust)
        new_poses = optimize_pose_graph(g)

        state = _reanchor_map(state, new_poses)

        # SearchAndFuse (LoopClosing.cc:633): after correction the two map
        # copies around the seam overlap -- merge landmarks created by the
        # recent keyframes into their older duplicates. fuse_points_mask
        # compacts at most K new points per call; the seam side can hold
        # several keyframes' worth, so batch it (ADVICE r2) -- overflow
        # points silently surviving as duplicates was the alternative.
        from dr_slam_tpu.slam import map_ops
        K = state.kf_mp.shape[1]
        recent_slots = valid & (seq >= seq[cur_kf] - 5)
        seam_np = (np.asarray(state.pt_valid)
                   & recent_slots[np.clip(np.asarray(state.pt_first_kf), 0,
                                          None)])
        seam_idx = np.where(seam_np)[0]
        NP = seam_np.shape[0]
        for s in range(0, len(seam_idx), K):
            batch = np.zeros(NP, dtype=bool)
            batch[seam_idx[s:s + K]] = True
            state = map_ops.fuse_points_mask(state, jnp.asarray(batch),
                                             fuse_dist=0.10)

        if self.run_gba and not self.gba_async:
            prob = problem_from_state(state)
            kf_pose, pt_pos, pl_coef, ln_ep = bundle_adjust(
                prob, self.cfg.camera.K4, n_gn_iters=4, n_cg_iters=30)
            state = state._replace(kf_pose=kf_pose, pt_pos=pt_pos,
                                   pl_coef=pl_coef, ln_ep=ln_ep)
        return state

    # ------------------------------------------------------------------
    def dispatch_gba(self, state: MapState, guard_gen: int = 0) -> None:
        """Start the post-correction global BA WITHOUT blocking: the solve
        is dispatched as device programs whose outputs stay futures (the
        reference's RunGlobalBundleAdjustment detached thread,
        LoopClosing.cc:625/:691). Call resolve_gba() later to merge."""
        if not (self.run_gba and self.gba_async):
            return
        prob = problem_from_state(state)
        out = bundle_adjust(prob, self.cfg.camera.K4,
                            n_gn_iters=4, n_cg_iters=30)
        self._pending_gba = (out, state.kf_valid, state.kf_seq,
                             state.pt_valid, state.pl_valid, state.ln_valid,
                             guard_gen)

    def resolve_gba(self, state: MapState, guard_gen: int = 0,
                    block: bool = False) -> MapState | None:
        """Merge a completed async GBA into the CURRENT state, or None if
        nothing is pending / the result has not landed yet / the map was
        destructively mutated since dispatch.

        Merge rule (the slot-table analog of the reference's post-GBA map
        re-anchoring, LoopClosing.cc:706-790): BA results apply only to
        slots that still hold the SAME entity as at dispatch -- keyframes by
        (valid, insertion seq), landmarks by (valid-at-both AND a bounded
        position delta, since landmark slots carry no sequence number and a
        recycled slot would otherwise inherit a foreign position). Entities
        created after dispatch keep their current estimates: they were
        tracked in the already-pose-graph-corrected gauge, so the residual
        GBA polish they miss is small and the next local BA reconciles it."""
        if self._pending_gba is None:
            return None
        (out, sv_d, ss_d, spt_d, spl_d, sln_d, gen) = self._pending_gba
        if gen != guard_gen:
            self._pending_gba = None   # reloc/reset/load since dispatch
            return None
        kf_pose_ba, pt_ba, pl_ba, ln_ba = out
        try:
            if not (block or kf_pose_ba.is_ready()):
                return None            # still computing; try at the next KF
        except AttributeError:
            pass                       # non-jax array: treat as ready
        self._pending_gba = None
        snap_valid = np.asarray(sv_d)
        snap_seq = np.asarray(ss_d)
        same_kf = jnp.asarray(snap_valid) & state.kf_valid \
            & (jnp.asarray(snap_seq) == state.kf_seq)
        kf_pose = jnp.where(same_kf[:, None, None], kf_pose_ba,
                            state.kf_pose)
        same_pt = jnp.asarray(np.asarray(spt_d)) & state.pt_valid \
            & (jnp.linalg.norm(pt_ba - state.pt_pos, axis=-1) < 0.5)
        pt_pos = jnp.where(same_pt[:, None], pt_ba, state.pt_pos)
        same_pl = jnp.asarray(np.asarray(spl_d)) & state.pl_valid \
            & (jnp.linalg.norm(pl_ba - state.pl_coef, axis=-1) < 0.5)
        pl_coef = jnp.where(same_pl[:, None], pl_ba, state.pl_coef)
        same_ln = jnp.asarray(np.asarray(sln_d)) & state.ln_valid \
            & (jnp.linalg.norm(ln_ba - state.ln_ep, axis=-1) < 1.0)
        ln_ep = jnp.where(same_ln[:, None], ln_ba, state.ln_ep)
        return state._replace(kf_pose=kf_pose, pt_pos=pt_pos,
                              pl_coef=pl_coef, ln_ep=ln_ep)


@jax.jit
def _covis_full(state: MapState) -> jnp.ndarray:
    """(NK, NK) shared-point counts via one matmul over the observation
    indicator matrix (the covisibility graph, KeyFrame::UpdateConnections)."""
    NK, K = state.kf_mp.shape
    NP = state.pt_pos.shape[0]
    # indicator (NK, NP) built by scatter
    rows = jnp.repeat(jnp.arange(NK, dtype=jnp.int32), K)
    cols = state.kf_mp.reshape(-1)
    ok = cols >= 0
    ind = jnp.zeros((NK, NP + 1), dtype=jnp.float32).at[
        rows, jnp.where(ok, cols, NP)].set(1.0)[:, :NP]
    C = jnp.dot(ind, ind.T, preferred_element_type=jnp.float32)
    return C * state.kf_valid[:, None] * state.kf_valid[None, :]


def _newest_observer(obs_tab, kp_ok, kf_valid, kf_seq, n_items, fallback):
    """(n_items,) keyframe slot of the NEWEST (highest insertion seq)
    observer of each landmark, from a (NK, K) id table; `fallback` where a
    landmark has no live observer."""
    NK, K = obs_tab.shape
    flat = obs_tab.reshape(-1)
    kfs = jnp.repeat(jnp.arange(NK, dtype=jnp.int32), K)
    ok = (flat >= 0) & kp_ok.reshape(-1) & kf_valid[kfs]
    code = jnp.where(ok, kf_seq[kfs] * NK + kfs, -1)
    best = jnp.full(n_items, -1, jnp.int32).at[
        jnp.where(ok, flat, n_items)].max(code, mode="drop")
    return jnp.where(best >= 0, best % NK, fallback)


@jax.jit
def _reanchor_map(state: MapState, new_poses: jnp.ndarray) -> MapState:
    """Move each landmark with its NEWEST observing keyframe's correction:
    X' = inv(T_new_ref) @ T_old_ref @ X (LoopClosing::CorrectLoop landmark
    propagation; the reference propagates via each point's reference KF and
    lets GBA clean up). The newest observer is the right anchor: a
    landmark's current position reflects where its latest observations and
    BA refinements put it, i.e. the newest observer's gauge -- anchoring to
    the FIRST observer leaves mid-chain landmarks displaced by the full
    inter-gauge drift after a correction, which the Huber-weighted GBA then
    refuses to pull back (round-3 regression: 70+ LOST frames after a
    mid-chain seam correction). Planes and lines move too -- a capability
    the reference LACKS (LoopClosing.cc corrects points only), which here
    would fight the plane/line BA edges after the correction."""
    NK = state.kf_pose.shape[0]

    def corr_of(ref_kf):
        """A = inv(T_new) @ T_old per landmark: world -> corrected world."""
        ref = jnp.clip(ref_kf, 0)
        T_old = state.kf_pose[ref]
        Tn_inv = jax.vmap(se3.inv_T)(new_poses[ref])
        return Tn_inv @ T_old

    pt_ref = _newest_observer(state.kf_mp, state.kf_kp_valid, state.kf_valid,
                              state.kf_seq, state.pt_pos.shape[0],
                              jnp.clip(state.pt_first_kf, 0))
    A_pt = corr_of(pt_ref)
    X_w = jnp.einsum("nij,nj->ni", A_pt[:, :3, :3], state.pt_pos) \
        + A_pt[:, :3, 3]
    pt_pos = jnp.where(state.pt_valid[:, None], X_w, state.pt_pos)

    # planes: X' = A X  =>  p' = inv(A)^T p; clouds move with A
    pl_ref = _newest_observer(
        state.kf_pl, jnp.ones(state.kf_pl.shape, bool), state.kf_valid,
        state.kf_seq, state.pl_coef.shape[0],
        jnp.clip(state.pl_first_kf, 0))
    A_pl = corr_of(pl_ref)
    A_pl_inv = jax.vmap(se3.inv_T)(A_pl)
    p_new = jnp.einsum("nji,nj->ni", A_pl_inv, state.pl_coef)
    p_new = p_new / jnp.maximum(
        jnp.linalg.norm(p_new[:, :3], axis=-1, keepdims=True), 1e-9)
    p_new = p_new * jnp.where(p_new[:, 3:4] < 0, -1.0, 1.0)
    pl_coef = jnp.where(state.pl_valid[:, None], p_new, state.pl_coef)
    cloud_new = (jnp.einsum("nij,nqj->nqi", A_pl[:, :3, :3], state.pl_cloud)
                 + A_pl[:, None, :3, 3])
    pl_cloud = jnp.where(state.pl_valid[:, None, None], cloud_new,
                         state.pl_cloud)

    # lines: both endpoints move with the newest observer's correction
    ln_ref = _newest_observer(
        state.kf_ln, jnp.ones(state.kf_ln.shape, bool), state.kf_valid,
        state.kf_seq, state.ln_ep.shape[0], jnp.clip(state.ln_first_kf, 0))
    A_ln = corr_of(ln_ref)
    e1 = jnp.einsum("nij,nj->ni", A_ln[:, :3, :3], state.ln_ep[:, :3]) \
        + A_ln[:, :3, 3]
    e2 = jnp.einsum("nij,nj->ni", A_ln[:, :3, :3], state.ln_ep[:, 3:]) \
        + A_ln[:, :3, 3]
    ln_new = jnp.concatenate([e1, e2], -1)
    ln_ep = jnp.where(state.ln_valid[:, None], ln_new, state.ln_ep)
    dir_new = jnp.einsum("nij,nj->ni", A_ln[:, :3, :3], state.ln_dir)
    ln_dir = jnp.where(state.ln_valid[:, None], dir_new, state.ln_dir)

    return state._replace(pt_pos=pt_pos, pl_coef=pl_coef, pl_cloud=pl_cloud,
                          ln_ep=ln_ep, ln_dir=ln_dir, kf_pose=new_poses)
