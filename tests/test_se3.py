import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dr_slam_tpu.geometry import se3


def rand_rot(key):
    w = jax.random.normal(key, (3,))
    return se3.so3_exp(w)


def test_so3_exp_log_roundtrip():
    for seed in range(5):
        w = jax.random.normal(jax.random.PRNGKey(seed), (3,))
        w = w / jnp.linalg.norm(w) * (0.1 + 0.5 * seed)  # angles in (0, pi)
        R = se3.so3_exp(w)
        np.testing.assert_allclose(np.asarray(se3.so3_log(R)), np.asarray(w),
                                   atol=1e-4)


def test_so3_exp_is_rotation():
    R = se3.so3_exp(jnp.array([0.3, -0.2, 0.9]))
    np.testing.assert_allclose(np.asarray(R @ R.T), np.eye(3), atol=1e-5)
    assert abs(float(jnp.linalg.det(R)) - 1.0) < 1e-5


def test_so3_small_angle():
    R = se3.so3_exp(jnp.array([1e-9, 0.0, 0.0]))
    np.testing.assert_allclose(np.asarray(R), np.eye(3), atol=1e-6)


def test_se3_exp_log_roundtrip():
    xi = jnp.array([0.1, -0.4, 0.2, 0.3, 0.1, -0.5])
    T = se3.se3_exp(xi)
    np.testing.assert_allclose(np.asarray(se3.se3_log(T)), np.asarray(xi), atol=1e-4)


def test_inv_T():
    T = se3.se3_exp(jnp.array([1.0, 2.0, 3.0, 0.2, -0.1, 0.4]))
    np.testing.assert_allclose(np.asarray(T @ se3.inv_T(T)), np.eye(4), atol=1e-5)


def test_quat_roundtrip():
    for seed in range(8):
        R = rand_rot(jax.random.PRNGKey(seed))
        q = se3.rot_to_quat(R)
        R2 = se3.quat_to_rot(q)
        np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-5)


def test_project_backproject():
    K4 = jnp.array([535.4, 539.2, 320.1, 247.6])
    uv = jnp.array([[100.0, 200.0], [320.0, 240.0]])
    depth = jnp.array([2.0, 3.5])
    pts = se3.backproject(K4, uv, depth)
    uv2 = se3.project(K4, pts)
    np.testing.assert_allclose(np.asarray(uv2), np.asarray(uv), atol=1e-4)


def test_orthonormalize():
    R = rand_rot(jax.random.PRNGKey(0))
    noisy = R + 0.01 * jax.random.normal(jax.random.PRNGKey(1), (3, 3))
    R2 = se3.orthonormalize_rotation(noisy)
    np.testing.assert_allclose(np.asarray(R2 @ R2.T), np.eye(3), atol=1e-5)
    assert float(jnp.linalg.det(R2)) > 0.99


def test_plane_transform_roundtrip():
    T = se3.se3_exp(jnp.array([0.5, -1.0, 2.0, 0.1, 0.2, -0.3]))
    p_w = se3.normalize_plane(jnp.array([0.2, 0.5, 0.9, 1.5]))
    p_c = se3.plane_to_camera(T, p_w)
    p_w2 = se3.plane_to_world(T, p_c)
    np.testing.assert_allclose(np.asarray(p_w2), np.asarray(p_w), atol=1e-5)


def test_plane_transform_point_consistency():
    """A point on the world plane must lie on the camera-frame plane."""
    T = se3.se3_exp(jnp.array([0.5, -1.0, 2.0, 0.1, 0.2, -0.3]))
    p_w = se3.normalize_plane(jnp.array([0.0, 0.0, 1.0, -2.0]))  # z=2 plane
    x_w = jnp.array([[0.7, -0.3, 2.0]])
    assert abs(float(x_w[0] @ p_w[:3] + p_w[3])) < 1e-6
    x_c = se3.transform_points(T, x_w)[0]
    p_c = se3.plane_to_camera(T, p_w)
    assert abs(float(x_c @ p_c[:3] + p_c[3])) < 1e-5


def test_plane_ominus_zero():
    p = se3.normalize_plane(jnp.array([0.3, 0.4, 0.8, 1.2]))
    e = se3.plane_ominus(p, p)
    np.testing.assert_allclose(np.asarray(e), np.zeros(3), atol=1e-6)
