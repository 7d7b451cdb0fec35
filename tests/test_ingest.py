"""Camera-native ingestion: uint8 gray / uint16 depth in, identical
features out (vs the float path) when the inputs are exactly representable.

Reference converts on the CPU before Frame construction
(src/Tracking.cc:223 imDepth.convertTo(CV_32F, dFactor)); here the cast and
DepthMapFactor scale run inside the fused device program
(frontend.frame.ingest) so the host ships 2.7x fewer bytes per frame."""

import jax.numpy as jnp
import numpy as np

from dr_slam_tpu.config import tum_freiburg3
from dr_slam_tpu.frontend.frame import extract_frame


def test_native_dtypes_match_float():
    cfg = tum_freiburg3()
    rng = np.random.RandomState(3)
    g8 = rng.randint(0, 256, (cfg.camera.height, cfg.camera.width),
                     dtype=np.uint8)
    # structured depth (a tilted wall): pure-noise depth makes the plane
    # eigendecomposition chaotic and amplifies ULP differences into
    # arbitrary coefficient swings -- not what this test is about
    yy, xx = np.mgrid[0:g8.shape[0], 0:g8.shape[1]]
    d16 = (10000 + 8 * xx + 4 * yy).astype(np.uint16)
    f_native = extract_frame(jnp.asarray(g8), jnp.asarray(d16), cfg)
    f_float = extract_frame(jnp.asarray(g8, jnp.float32),
                            jnp.asarray(d16, jnp.float32)
                            / cfg.camera.depth_factor, cfg)
    np.testing.assert_array_equal(np.asarray(f_native.kp.uv),
                                  np.asarray(f_float.kp.uv))
    np.testing.assert_array_equal(np.asarray(f_native.kp.desc),
                                  np.asarray(f_float.kp.desc))
    # the two depth paths differ by ~1 ULP (x*(1/f) vs x/f); tile
    # boundaries of the MaxPointDistance splitter may shift a block, so
    # plane SETS are not bitwise comparable -- assert the geometry: every
    # valid plane is (up to sign) the wall normal, and counts agree
    vn = np.asarray(f_native.planes.valid)
    vf = np.asarray(f_float.planes.valid)
    assert vn.sum() == vf.sum() > 0
    cn = np.asarray(f_native.planes.coeffs)[vn]
    cf = np.asarray(f_float.planes.coeffs)[vf]
    n_wall = np.mean(np.concatenate([cn[:, :3], cf[:, :3]]), 0)
    n_wall /= np.linalg.norm(n_wall)
    for row in np.concatenate([cn, cf]):
        assert abs(np.dot(row[:3], n_wall)) > 0.95, (row, n_wall)


def test_depth_scaling_exact():
    """uint16 sensor units -> meters on device matches DepthMapFactor."""
    import jax

    from dr_slam_tpu.frontend.frame import ingest

    cfg = tum_freiburg3()
    d16 = jnp.asarray(np.array([[0, 5000, 10000, 65535]], np.uint16))
    g8 = jnp.zeros((1, 4), jnp.uint8)
    g, d = jax.jit(lambda a, b: ingest(a, b, cfg.camera))(g8, d16)
    assert g.dtype == jnp.float32 and d.dtype == jnp.float32
    np.testing.assert_allclose(
        np.asarray(d), [[0.0, 1.0, 2.0, 65535.0 / 5000.0]], rtol=1e-6)
