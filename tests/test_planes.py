import jax
import jax.numpy as jnp
import numpy as np

from dr_slam_tpu.geometry import se3
from dr_slam_tpu.io import synthetic
from dr_slam_tpu.ops import eig33, normals, planes

K4 = (535.4, 539.2, 320.1, 247.6)


def test_eig33_matches_numpy():
    rng = np.random.RandomState(0)
    M = rng.randn(10, 3, 3)
    A = (M + M.transpose(0, 2, 1)) / 2 + np.eye(3)

    @jax.jit
    def run(A):
        ev = eig33.eigvals_sym3(A)
        v = eig33.smallest_eigvec_sym3(A, ev[:, 0])
        return ev, v

    ev, v = run(jnp.asarray(A, dtype=jnp.float32))
    ev, v = np.asarray(ev), np.asarray(v)
    for i in range(10):
        ref = np.linalg.eigvalsh(A[i])
        np.testing.assert_allclose(ev[i], ref, atol=1e-4)
        # eigenvector check: A v = lambda v
        np.testing.assert_allclose(A[i] @ v[i], ref[0] * v[i], atol=1e-3)


def _flat_depth(z=2.0, h=120, w=160):
    return jnp.full((h, w), z, dtype=jnp.float32)


def test_normals_flat_plane():
    n, ok = normals.surface_normals(_flat_depth(), K4)
    nn = np.asarray(n)[np.asarray(ok)]
    assert len(nn) > 50
    # fronto-parallel plane at z=2: normal = (0,0,-1) (toward camera)
    np.testing.assert_allclose(nn.mean(0), [0, 0, -1], atol=1e-2)


def test_normals_synthetic_room_manhattan():
    """Normals in a Manhattan room cluster around 3 orthogonal directions."""
    seq = synthetic.SyntheticSequence(synthetic.corridor_trajectory(1))
    _, depth = seq.render(0)
    n, ok = normals.surface_normals(depth, K4)
    nn = np.asarray(n)[np.asarray(ok)]
    # project onto world axes (camera ~ axis aligned at frame 0)
    T_cw = np.asarray(seq.poses_cw[0])
    R_wc = np.linalg.inv(T_cw)[:3, :3]
    world_n = nn @ R_wc.T
    aligned = (np.abs(world_n) > 0.95).any(axis=1).mean()
    assert aligned > 0.8


def test_segment_planes_single_plane():
    seg = planes.segment_planes(_flat_depth(h=160, w=160), K4)
    v = np.asarray(seg.valid)
    assert v[0]  # dominant plane found
    c = np.asarray(seg.coeffs[0])
    np.testing.assert_allclose(c[:3], [0, 0, -1], atol=2e-2)
    np.testing.assert_allclose(c[3], 2.0, atol=2e-2)
    assert float(seg.mse[0]) < 1e-4


def test_segment_planes_two_planes():
    """Left half z=1.5, right half z=3.0 -> two segments, not merged."""
    d = np.full((160, 160), 1.5, dtype=np.float32)
    d[:, 80:] = 3.0
    seg = planes.segment_planes(jnp.asarray(d), K4=(200.0, 200.0, 80.0, 80.0))
    v = np.asarray(seg.valid)
    assert v.sum() >= 2
    ds = sorted(np.asarray(seg.coeffs)[v][:, 3][:2].tolist())
    got = sorted([float(x) for x in np.asarray(seg.coeffs)[v][:2, 3]])
    assert any(abs(x - 1.5) < 0.05 for x in got)
    assert any(abs(x - 3.0) < 0.05 for x in got)


def test_segment_planes_synthetic_room():
    seq = synthetic.SyntheticSequence(synthetic.corridor_trajectory(1))
    _, depth = seq.render(0)
    seg = planes.segment_planes(depth, K4)
    v = np.asarray(seg.valid)
    assert v.sum() >= 3  # floor/ceiling/walls visible
    # every valid plane's coefficients describe its own cloud
    for p in np.where(v)[0]:
        c = np.asarray(seg.coeffs[p])
        cl = np.asarray(seg.cloud[p])[np.asarray(seg.cloud_valid[p])]
        dist = np.abs(cl @ c[:3] + c[3])
        assert dist.mean() < 0.03, (p, c, dist.mean())
    # world-frame plane normals are axis aligned (Manhattan room)
    T_cw = jnp.asarray(seq.poses_cw[0])
    for p in np.where(v)[0]:
        pw = np.asarray(se3.plane_to_world(T_cw, jnp.asarray(seg.coeffs[p])))
        assert np.abs(pw[:3]).max() > 0.97


def test_max_point_distance():
    seg = planes.segment_planes(_flat_depth(h=160, w=160), K4)
    md = planes.max_point_distance_from_plane(seg.coeffs[0], seg.cloud[0],
                                              seg.cloud_valid[0])
    assert float(md) < 0.02
