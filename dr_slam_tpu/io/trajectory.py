"""Trajectory export in TUM format + Manhattan-frame projection.

Mirrors the reference savers: System::SaveTrajectoryTUM (src/System.cc:379),
SaveKeyFrameTrajectoryTUM (:441) and SaveTrajectoryManhattan (:489) -- output
rows are ``timestamp tx ty tz qx qy qz qw`` of T_wc, consumable by evo_ape
(run.sh:2-3)."""

from __future__ import annotations

import numpy as np

from dr_slam_tpu.geometry import se3


def pose_to_tum_row(timestamp: float, T_cw: np.ndarray) -> str:
    import jax.numpy as jnp
    T_wc = np.asarray(se3.inv_T(jnp.asarray(T_cw, dtype=jnp.float32)))
    t = T_wc[:3, 3]
    q = np.asarray(se3.rot_to_quat(jnp.asarray(T_wc[:3, :3])))
    return (f"{timestamp:.6f} {t[0]:.7f} {t[1]:.7f} {t[2]:.7f} "
            f"{q[0]:.7f} {q[1]:.7f} {q[2]:.7f} {q[3]:.7f}")


def save_trajectory_tum(path: str, timestamps, poses_cw) -> None:
    """Write a full-frame trajectory (reference System.cc:379-440)."""
    with open(path, "w") as f:
        for ts, T in zip(timestamps, poses_cw):
            f.write(pose_to_tum_row(float(ts), np.asarray(T)) + "\n")


def save_keyframe_trajectory_tum(path: str, timestamps, poses_cw, valid=None) -> None:
    """Write keyframe-only trajectory (reference System.cc:441-487)."""
    with open(path, "w") as f:
        for i, (ts, T) in enumerate(zip(timestamps, poses_cw)):
            if valid is not None and not bool(valid[i]):
                continue
            f.write(pose_to_tum_row(float(ts), np.asarray(T)) + "\n")


def save_trajectory_manhattan(path: str, timestamps, poses_cw, R_mw=None) -> None:
    """Write the trajectory expressed in the Manhattan frame: positions rotated
    by the world->Manhattan rotation so axes align with the dominant structure
    (reference System.cc:489-562 projects onto the Manhattan directions)."""
    R = np.eye(3) if R_mw is None else np.asarray(R_mw)
    with open(path, "w") as f:
        for ts, T_cw in zip(timestamps, poses_cw):
            import jax.numpy as jnp
            T_wc = np.asarray(se3.inv_T(jnp.asarray(T_cw, dtype=jnp.float32)))
            p = R @ T_wc[:3, 3]
            f.write(f"{float(ts):.6f} {p[0]:.7f} {p[1]:.7f} {p[2]:.7f}\n")


def load_trajectory_tum(path: str):
    """-> (timestamps (N,), T_wc (N,4,4))."""
    ts, Ts = [], []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            v = [float(x) for x in line.split()]
            ts.append(v[0])
            import jax.numpy as jnp
            R = np.asarray(se3.quat_to_rot(jnp.asarray(v[4:8])))
            T = np.eye(4)
            T[:3, :3] = R
            T[:3, 3] = v[1:4]
            Ts.append(T)
    return np.asarray(ts), np.asarray(Ts)
