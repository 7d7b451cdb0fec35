import jax
import jax.numpy as jnp
import numpy as np

from dr_slam_tpu.geometry import se3
from dr_slam_tpu.optimize.pose_opt import PoseObservations, pose_optimize

K4 = (535.4, 539.2, 320.1, 247.6)
BF = 40.0


def make_scene(n_pts=200, seed=0, noise_px=0.3, outlier_frac=0.0,
               stereo=True):
    rng = np.random.RandomState(seed)
    pts_w = rng.uniform([-2, -1.5, 2.0], [2, 1.5, 6.0], (n_pts, 3))
    T_true = np.asarray(se3.se3_exp(jnp.array([0.1, -0.05, 0.2, 0.02, -0.03, 0.05])))
    Xc = pts_w @ T_true[:3, :3].T + T_true[:3, 3]
    uv = np.stack([K4[0] * Xc[:, 0] / Xc[:, 2] + K4[2],
                   K4[1] * Xc[:, 1] / Xc[:, 2] + K4[3]], -1)
    uv += noise_px * rng.randn(n_pts, 2)
    # RGB-D convention: uR derives from the measured depth (u - bf/z_meas),
    # so (u, uR) reconstructs z_meas exactly; depth noise is multiplicative
    z_meas = Xc[:, 2] * (1.0 + 0.003 * rng.randn(n_pts))
    ur = uv[:, 0] - BF / z_meas
    if not stereo:
        ur = -np.ones(n_pts)
    n_out = int(outlier_frac * n_pts)
    if n_out:
        uv[:n_out] += rng.uniform(20, 60, (n_out, 2)) * np.sign(rng.randn(n_out, 2))
        if stereo:
            ur[:n_out] = uv[:n_out, 0] - BF / z_meas[:n_out]
    obs3 = np.concatenate([uv, ur[:, None]], -1)
    return T_true, pts_w.astype(np.float32), obs3.astype(np.float32)


def build_obs(pts_w, obs3, n_cap=256):
    n = len(pts_w)
    obs = PoseObservations.empty(n_cap, 8, 8, 8)
    return obs._replace(
        pt_world=obs.pt_world.at[:n].set(pts_w),
        pt_obs=obs.pt_obs.at[:n].set(obs3),
        pt_valid=obs.pt_valid.at[:n].set(True),
    )


def pose_err(T_est, T_true):
    E = np.asarray(T_est) @ np.linalg.inv(T_true)
    dt = np.linalg.norm(E[:3, 3])
    dr = np.arccos(np.clip((np.trace(E[:3, :3]) - 1) / 2, -1, 1))
    return dt, dr


def test_pose_opt_converges_from_perturbation():
    T_true, pts, obs3 = make_scene()
    obs = build_obs(pts, obs3)
    T0 = np.asarray(se3.se3_exp(jnp.array([0.1, 0.1, -0.1, 0.05, -0.05, 0.08]))) @ T_true
    out = pose_optimize(jnp.asarray(T0, dtype=jnp.float32), obs, K4, BF)
    dt, dr = pose_err(out.T_cw, T_true)
    assert dt < 5e-3 and dr < 5e-4, (dt, dr)
    assert int(out.n_inliers) > 190


def test_pose_opt_mono_only():
    T_true, pts, obs3 = make_scene(stereo=False)
    obs = build_obs(pts, obs3)
    T0 = np.asarray(se3.se3_exp(jnp.array([0.05, -0.05, 0.05, 0.02, 0.02, -0.02]))) @ T_true
    out = pose_optimize(jnp.asarray(T0, dtype=jnp.float32), obs, K4, BF)
    dt, dr = pose_err(out.T_cw, T_true)
    assert dt < 1e-2 and dr < 1e-3, (dt, dr)


def test_pose_opt_rejects_outliers():
    T_true, pts, obs3 = make_scene(outlier_frac=0.3)
    obs = build_obs(pts, obs3)
    T0 = np.asarray(se3.se3_exp(jnp.array([0.05, 0.0, -0.05, 0.01, -0.02, 0.03]))) @ T_true
    out = pose_optimize(jnp.asarray(T0, dtype=jnp.float32), obs, K4, BF)
    dt, dr = pose_err(out.T_cw, T_true)
    assert dt < 1e-2 and dr < 1e-3, (dt, dr)
    # outliers flagged
    inl = np.asarray(out.pt_inlier)
    assert inl[:60].mean() < 0.2       # the corrupted ones
    assert inl[60:200].mean() > 0.9


def test_translation_only_keeps_rotation():
    T_true, pts, obs3 = make_scene()
    obs = build_obs(pts, obs3)
    # correct rotation, wrong translation
    T0 = np.asarray(T_true).copy()
    T0[:3, 3] += [0.2, -0.1, 0.15]
    out = pose_optimize(jnp.asarray(T0, dtype=jnp.float32), obs, K4, BF,
                        translation_only=True)
    dt, dr = pose_err(out.T_cw, T_true)
    assert dt < 5e-3, dt
    np.testing.assert_allclose(np.asarray(out.T_cw)[:3, :3], T_true[:3, :3],
                               atol=1e-6)  # rotation untouched


def test_pose_opt_with_planes():
    """Planes alone constrain the pose (3 orthogonal planes = full pose)."""
    T_true = np.asarray(se3.se3_exp(jnp.array([0.3, -0.2, 0.5, 0.1, -0.08, 0.12])),
                        dtype=np.float32)
    planes_w = np.asarray([
        [1, 0, 0, 0.0], [0, 1, 0, 1.5], [0, 0, 1, -0.5],
        [0.7071, 0.7071, 0, 2.0]], dtype=np.float32)
    planes_w = np.asarray([np.asarray(se3.normalize_plane(jnp.asarray(p)))
                           for p in planes_w])
    obs_c = np.asarray([np.asarray(se3.plane_to_camera(jnp.asarray(T_true),
                                                       jnp.asarray(p)))
                        for p in planes_w])
    obs = PoseObservations.empty(8, 8, 8, 8)
    obs = obs._replace(
        pl_world=obs.pl_world.at[:4].set(planes_w),
        pl_obs=obs.pl_obs.at[:4].set(obs_c),
        pl_valid=obs.pl_valid.at[:4].set(True),
    )
    T0 = np.asarray(se3.se3_exp(jnp.array([0.05, 0.05, -0.05, 0.03, -0.02, 0.02]))) @ T_true
    out = pose_optimize(jnp.asarray(T0, dtype=jnp.float32), obs, K4, BF)
    dt, dr = pose_err(out.T_cw, T_true)
    assert dt < 1e-3 and dr < 1e-3, (dt, dr)


def test_pose_opt_empty_observations_is_noop():
    obs = PoseObservations.empty(16, 8, 8, 8)
    T0 = jnp.eye(4)
    out = pose_optimize(T0, obs, K4, BF)
    assert bool(jnp.all(jnp.isfinite(out.T_cw)))
    np.testing.assert_allclose(np.asarray(out.T_cw), np.eye(4), atol=1e-3)


def test_pose_opt_with_lines():
    T_true = np.asarray(se3.se3_exp(jnp.array([0.1, -0.05, 0.2, 0.02, -0.03, 0.05])),
                        dtype=np.float32)
    rng = np.random.RandomState(3)
    # random 3D segments; observed 2D line = projection of the segment
    s_w = rng.uniform([-2, -1.5, 2.5], [2, 1.5, 5.0], (32, 3)).astype(np.float32)
    dirs = rng.randn(32, 3).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    e_w = s_w + 0.8 * dirs
    Xs = s_w @ T_true[:3, :3].T + T_true[:3, 3]
    Xe = e_w @ T_true[:3, :3].T + T_true[:3, 3]
    def proj(X):
        return np.stack([K4[0] * X[:, 0] / X[:, 2] + K4[2],
                         K4[1] * X[:, 1] / X[:, 2] + K4[3]], -1)
    us, ue = proj(Xs), proj(Xe)
    l = np.cross(np.concatenate([us, np.ones((32, 1))], -1),
                 np.concatenate([ue, np.ones((32, 1))], -1))
    l /= np.linalg.norm(l[:, :2], axis=1, keepdims=True)
    obs = PoseObservations.empty(8, 64, 8, 8)
    obs = obs._replace(
        ln_world=obs.ln_world.at[:32].set(
            np.concatenate([s_w, e_w], -1).astype(np.float32)),
        ln_obs=obs.ln_obs.at[:32].set(l.astype(np.float32)),
        ln_valid=obs.ln_valid.at[:32].set(True),
    )
    T0 = np.asarray(se3.se3_exp(jnp.array([0.04, 0.02, -0.03, 0.02, -0.01, 0.02]))) @ T_true
    out = pose_optimize(jnp.asarray(T0, dtype=jnp.float32), obs, K4, BF)
    dt, dr = pose_err(out.T_cw, T_true)
    # lines leave a sliding DoF family; still should reduce error a lot
    assert dt < 0.02 and dr < 2e-3, (dt, dr)


def test_pnp_coplanar_points():
    """The mono PnP solver must handle COPLANAR landmarks (single-wall
    views) -- the 3D DLT alone is rank-deficient there; the homography
    branch covers it (round-2 fix after relocalization collapsed on
    close-wall views)."""
    import numpy as np
    import jax.numpy as jnp
    from dr_slam_tpu.optimize.pnp import pnp_ransac

    rng = np.random.RandomState(4)
    K4 = (300.0, 300.0, 160.0, 120.0)
    # points on the plane z = 3 (world), camera rotated + translated
    pts = np.stack([rng.uniform(-1.5, 1.5, 48),
                    rng.uniform(-1.0, 1.0, 48),
                    np.full(48, 3.0)], -1).astype(np.float32)
    th = 0.15
    R = np.array([[np.cos(th), 0, np.sin(th)], [0, 1, 0],
                  [-np.sin(th), 0, np.cos(th)]], np.float32)
    t = np.array([0.2, -0.1, 0.3], np.float32)
    Xc = pts @ R.T + t
    uv = np.stack([K4[0] * Xc[:, 0] / Xc[:, 2] + K4[2],
                   K4[1] * Xc[:, 1] / Xc[:, 2] + K4[3]], -1)
    # 25% outliers
    uv[::4] += rng.uniform(30, 80, (12, 2))
    T, n_in = pnp_ransac(jnp.asarray(pts), jnp.asarray(uv),
                         jnp.ones(48, bool), K4)
    assert int(n_in) >= 30, int(n_in)
    T = np.asarray(T)
    assert np.linalg.norm(T[:3, 3] - t) < 0.05, T
    assert np.abs(T[:3, :3] - R).max() < 0.02, T
