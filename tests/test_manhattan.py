import jax
import jax.numpy as jnp
import numpy as np

from dr_slam_tpu.geometry import se3
from dr_slam_tpu.io import synthetic
from dr_slam_tpu.manhattan import find_manhattan, track_manhattan_frame
from dr_slam_tpu.ops import normals


def synthetic_normal_field(R_cm, n_per_axis=200, noise=0.02, seed=0):
    """Noisy normals around the 3 Manhattan axes (camera frame)."""
    rng = np.random.RandomState(seed)
    dirs = []
    for a in range(3):
        axis = np.asarray(R_cm)[:, a]
        n = axis[None] + noise * rng.randn(n_per_axis, 3)
        n /= np.linalg.norm(n, axis=1, keepdims=True)
        # random hemisphere flips (normals are undirected for the tracker)
        n *= np.where(rng.rand(n_per_axis, 1) > 0.5, 1.0, -1.0)
        dirs.append(n)
    d = np.concatenate(dirs).astype(np.float32)
    return jnp.asarray(d), jnp.ones(len(d), dtype=bool)


def test_track_manhattan_recovers_perturbed_rotation():
    R_true = np.asarray(se3.so3_exp(jnp.array([0.3, -0.2, 0.5])))
    dirs, valid = synthetic_normal_field(R_true)
    # start from a 5-degree-perturbed estimate
    R0 = np.asarray(se3.so3_exp(jnp.array([0.05, 0.03, -0.04]))) @ R_true
    out = track_manhattan_frame(jnp.asarray(R0), dirs, valid)
    assert bool(out.success)
    # compare up to axis permutation/sign: R_est^T R_true ~ signed permutation
    M = np.abs(np.asarray(out.R_cm).T @ R_true)
    err = np.abs(M - np.eye(3)).max()
    assert err < 0.01, M


def test_track_manhattan_fails_gracefully_without_structure():
    rng = np.random.RandomState(0)
    d = rng.randn(500, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    R0 = np.eye(3, dtype=np.float32)
    out = track_manhattan_frame(jnp.asarray(R0), jnp.asarray(d),
                                jnp.ones(500, dtype=bool))
    # isotropic normals: tracker keeps previous rotation
    if not bool(out.success):
        np.testing.assert_allclose(np.asarray(out.R_cm), R0, atol=1e-5)


def test_track_manhattan_on_rendered_room():
    seq = synthetic.SyntheticSequence(synthetic.corridor_trajectory(2))
    _, depth = seq.render(0)
    n, ok = normals.surface_normals(depth, seq.K4)
    T_cw = np.asarray(seq.poses_cw[0])
    R_cw = T_cw[:3, :3]  # world IS the Manhattan frame in the box room
    # perturb by ~3 degrees
    R0 = np.asarray(se3.so3_exp(jnp.array([0.03, -0.02, 0.04]))) @ R_cw
    out = track_manhattan_frame(jnp.asarray(R0), n.reshape(-1, 3),
                                ok.reshape(-1))
    assert bool(out.success)
    M = np.abs(np.asarray(out.R_cm).T @ R_cw)
    err = np.abs(M - np.eye(3)).max()
    assert err < 0.02, (M, np.asarray(out.n_members))


def test_find_manhattan_from_planes():
    R = np.asarray(se3.so3_exp(jnp.array([0.2, 0.1, -0.3])))
    normals_c = jnp.asarray(np.stack([R[:, 0], R[:, 1],
                                      [0.577, 0.577, 0.577]]), dtype=jnp.float32)
    valid = jnp.array([True, True, True])
    weight = jnp.array([100.0, 80.0, 500.0])  # big diagonal plane is not perp
    R_cm, ok = find_manhattan(normals_c, valid, weight)
    assert bool(ok)
    M = np.abs(np.asarray(R_cm).T @ R)
    # first two columns must align with the two plane normals
    assert np.abs(M[:2, :2] - np.eye(2)).max() < 1e-3


def test_find_manhattan_no_planes():
    R_cm, ok = find_manhattan(jnp.zeros((4, 3)), jnp.zeros(4, dtype=bool),
                              jnp.zeros(4))
    assert not bool(ok)
