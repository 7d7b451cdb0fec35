"""Progressive-drift injection for loop-closure evaluation.

Real odometry accumulates drift along the trajectory; this synthetic world's
plane/Manhattan/depth anchors suppress natural drift below the loop
detector's implicit-reconnection radius, so evaluating loop closing needs
drift injected by hand. The protocol (validated by tests/test_loop_closure.py
and reused by the bench's accuracy leg, scripts/bench_accuracy.py): every
keyframe is shifted by a twist scaled with its insertion sequence, and
points/planes/lines move with their NEWEST observing keyframe -- locally
consistent, globally drifted, exactly the shape of real drift. The
reference's equivalent evaluation is running TUM sequences with real drift
and scoring via evo_ape (/root/reference/run.sh:2-3)."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def drift_T(frac: float, xi_t=(0.35, 0.0, 0.15), xi_r: float = 0.07
            ) -> np.ndarray:
    """SE3 twist at drift fraction ``frac`` in [0, 1]: a y-axis rotation of
    xi_r*frac radians plus translation xi_t*frac."""
    th = xi_r * frac
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = np.array([[np.cos(th), 0, np.sin(th)], [0, 1, 0],
                          [-np.sin(th), 0, np.cos(th)]], np.float32)
    T[:3, 3] = np.asarray(xi_t, np.float32) * frac
    return T


def inject_progressive_drift(tr, xi_t=(0.35, 0.0, 0.15), xi_r: float = 0.07
                             ) -> None:
    """Apply progressive gauge drift to a host Tracker's map in place.

    tr is slam.tracking.Tracker (NOT the device loop). Keyframe k moves by
    drift_T(seq_k / max_seq); every landmark moves with its newest observing
    keyframe; the live pose rides the full twist."""
    tr.flush()
    st = tr.map_state
    kf_valid = np.asarray(st.kf_valid)
    seqs = np.asarray(st.kf_seq)
    max_seq = seqs.max()
    kf_pose = np.asarray(st.kf_pose).copy()
    pt = np.asarray(st.pt_pos).copy()
    pt_valid = np.asarray(st.pt_valid)
    kf_mp = np.asarray(st.kf_mp)
    NPts = pt.shape[0]
    pt_newest = np.full(NPts, -1, np.int64)
    pt_newest_seq = np.full(NPts, -1, np.int64)
    for k in np.where(kf_valid)[0]:
        r_ = kf_mp[k][kf_mp[k] >= 0]
        upd = seqs[k] > pt_newest_seq[r_]
        pt_newest[r_[upd]] = k
        pt_newest_seq[r_[upd]] = seqs[k]
    shifts = {}
    for k in np.where(kf_valid)[0]:
        S = drift_T(seqs[k] / max(max_seq, 1), xi_t, xi_r)
        shifts[int(k)] = S
        kf_pose[k] = kf_pose[k] @ np.linalg.inv(S)
        if int(k) in tr.kf_pose_host:
            tr.kf_pose_host[int(k)] = (tr.kf_pose_host[int(k)]
                                       @ np.linalg.inv(S))
    for p in np.where(pt_valid)[0]:
        S = shifts.get(int(pt_newest[p]))
        if S is not None:
            pt[p] = S[:3, :3] @ pt[p] + S[:3, 3]

    # planes and lines drift too (with their newest observing keyframe, like
    # points): real odometry drift carries the WHOLE local map; leaving them
    # in the original gauge would make the structural BA edges fight the
    # drifted points instead of modeling drift
    def newest_observer(kf_tab, n_items):
        newest = np.full(n_items, -1, np.int64)
        newest_seq = np.full(n_items, -1, np.int64)
        for k in np.where(kf_valid)[0]:
            ids = kf_tab[k][kf_tab[k] >= 0]
            upd = seqs[k] > newest_seq[ids]
            newest[ids[upd]] = k
            newest_seq[ids[upd]] = seqs[k]
        return newest

    pl_coef = np.asarray(st.pl_coef).copy()
    pl_cloud = np.asarray(st.pl_cloud).copy()
    pl_newest = newest_observer(np.asarray(st.kf_pl), pl_coef.shape[0])
    for f in np.where(np.asarray(st.pl_valid))[0]:
        S = shifts.get(int(pl_newest[f]))
        if S is not None:
            pl_coef[f] = np.linalg.inv(S).T @ pl_coef[f]
            pl_coef[f] /= np.linalg.norm(pl_coef[f][:3])
            if pl_coef[f][3] < 0:
                pl_coef[f] *= -1
            pl_cloud[f] = pl_cloud[f] @ S[:3, :3].T + S[:3, 3]
    ln_ep = np.asarray(st.ln_ep).copy()
    ln_dir = np.asarray(st.ln_dir).copy()
    ln_newest = newest_observer(np.asarray(st.kf_ln), ln_ep.shape[0])
    for l in np.where(np.asarray(st.ln_valid))[0]:
        S = shifts.get(int(ln_newest[l]))
        if S is not None:
            ln_ep[l, :3] = S[:3, :3] @ ln_ep[l, :3] + S[:3, 3]
            ln_ep[l, 3:] = S[:3, :3] @ ln_ep[l, 3:] + S[:3, 3]
            ln_dir[l] = S[:3, :3] @ ln_dir[l]

    tr.map_state = st._replace(kf_pose=jnp.asarray(kf_pose),
                               pt_pos=jnp.asarray(pt),
                               pl_coef=jnp.asarray(pl_coef),
                               pl_cloud=jnp.asarray(pl_cloud),
                               ln_ep=jnp.asarray(ln_ep),
                               ln_dir=jnp.asarray(ln_dir))
    tr.T_cw = jnp.asarray(np.asarray(tr.T_cw)
                          @ np.linalg.inv(drift_T(1.0, xi_t, xi_r)))
