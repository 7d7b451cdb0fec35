import jax.numpy as jnp
import numpy as np

from dr_slam_tpu.ops import lines as line_ops

K4 = (200.0, 200.0, 128.0, 96.0)


def synthetic_line_image(h=192, w=256):
    """Dark background with a bright band (two strong parallel edges) and a
    vertical edge."""
    img = np.full((h, w), 40.0, dtype=np.float32)
    # horizontal band across the image at y ~ 60..70
    img[60:70, 20:236] = 220.0
    # vertical edge: bright region right of x=180
    img[110:180, 180:] = 160.0
    return img


def test_extract_lines_finds_edges():
    img = jnp.asarray(synthetic_line_image())
    depth = jnp.full(img.shape, 2.0)
    lf = line_ops.extract_lines(img, depth, K4, max_lines=16)
    v = np.asarray(lf.valid)
    assert v.sum() >= 2, v.sum()
    segs = np.asarray(lf.seg2d)[v]
    # at least one near-horizontal long segment around y=60 or y=70
    found_h = False
    for x1, y1, x2, y2 in segs:
        if abs(y2 - y1) < 6 and abs(x2 - x1) > 80 and (abs(y1 - 60) < 8 or abs(y1 - 70) < 8):
            found_h = True
    assert found_h, segs


def test_extract_lines_3d_direction():
    """Line on a fronto-parallel plane at z=2: 3D direction ~ image direction."""
    img = jnp.asarray(synthetic_line_image())
    depth = jnp.full(img.shape, 2.0)
    lf = line_ops.extract_lines(img, depth, K4, max_lines=16)
    v = np.asarray(lf.valid & lf.has3d)
    assert v.sum() >= 1
    for i in np.where(v)[0]:
        d3 = np.asarray(lf.dir3d[i])
        assert abs(d3[2]) < 0.1, d3  # in-plane line: no z component
        ep = np.asarray(lf.ep3d[i])
        assert abs(ep[2] - 2.0) < 0.05 and abs(ep[5] - 2.0) < 0.05


def test_extract_lines_none_on_flat():
    img = jnp.full((192, 256), 100.0)
    depth = jnp.full((192, 256), 2.0)
    lf = line_ops.extract_lines(img, depth, K4, max_lines=16)
    assert int(np.asarray(lf.valid).sum()) == 0


def test_line_descriptor_stable_under_shift():
    img = synthetic_line_image()
    img2 = np.roll(img, 3, axis=1)
    depth = jnp.full(img.shape, 2.0)
    lf1 = line_ops.extract_lines(jnp.asarray(img), depth, K4, max_lines=16)
    lf2 = line_ops.extract_lines(jnp.asarray(img2), depth, K4, max_lines=16)
    from dr_slam_tpu.ops import hamming
    d = hamming.hamming_matrix(lf1.desc, lf2.desc)
    d = np.asarray(jnp.where(lf1.valid[:, None] & lf2.valid[None, :], d, jnp.inf))
    v1 = np.asarray(lf1.valid)
    # each valid line in frame1 has a close match in frame2
    best = d.min(axis=1)[v1]
    assert (best < 80).mean() > 0.6, best


def test_line_equation_subpixel_bias():
    """Gradient-ridge refinement: the 2D line equation must sit on the true
    edge within 0.5 px for subpixel edge positions (round-1 gated lines out
    of the pose solve over a ~3 px bias here)."""
    import numpy as np
    import jax.numpy as jnp
    from dr_slam_tpu.ops import lines as line_ops

    K4 = (267.7, 269.6, 160.0, 120.0)
    for u0 in (160.0, 160.37, 160.8):
        x = np.arange(320)
        cov = np.clip((x + 0.5) - u0, 0, 1)[None, :]
        gray = jnp.asarray(
            np.repeat(60.0 + 140.0 * cov, 240, 0).astype(np.float32))
        depth = jnp.asarray(np.full((240, 320), 2.0, np.float32))
        lf = line_ops.extract_lines(gray, depth, K4, max_lines=8)
        v = np.asarray(lf.valid)
        assert v.any(), u0
        i = np.argmax(np.asarray(lf.response) * v)
        a, b, c = np.asarray(lf.lineq[i])
        pts = np.stack([np.full(5, u0), np.linspace(40, 200, 5)], -1)
        d = np.abs(pts @ np.asarray([a, b]) + c)
        assert d.mean() < 0.5, (u0, d.mean())


def test_line_mle_beats_unweighted_pca():
    """Mahalanobis MLE (per-point depth covariance, reference levmar line
    MLE LineExtractor.cpp:14-260): with noise growing ~z^2, far samples must
    be down-weighted -- the MLE direction error is below the unweighted PCA
    error on the same data."""
    import jax.numpy as jnp
    import numpy as np
    from dr_slam_tpu.ops.lines import refine_line_mle

    rng = np.random.RandomState(0)
    L, S = 48, 40
    d_true = np.array([0.3, 0.1, 0.95]); d_true /= np.linalg.norm(d_true)
    t = np.linspace(0, 4.0, S)
    errs_pca, errs_mle = [], []
    for l in range(L):
        p0 = np.array([0.5, 0.3, 0.8 + 0.05 * l])
        X = p0 + t[:, None] * d_true          # z spans ~0.8..5 m
        sigma = 0.0012 * X[:, 2] ** 2 + 1e-3
        Xn = X + rng.randn(S, 3) * sigma[:, None]  # the modeled sensor noise
        Xj = jnp.asarray(Xn[None], jnp.float32)
        w = jnp.ones((1, S), jnp.float32)
        # unweighted PCA baseline
        mu = Xn.mean(0)
        cov = (Xn - mu).T @ (Xn - mu) / S
        v_pca = np.linalg.eigh(cov)[1][:, -1]
        v_pca *= np.sign(v_pca @ d_true)
        # MLE init from the PCA estimate
        mu_r, d_r = refine_line_mle(Xj, w, jnp.asarray(mu[None], jnp.float32),
                                    jnp.asarray(v_pca[None], jnp.float32))
        v_mle = np.array(d_r[0]); v_mle *= np.sign(v_mle @ d_true)
        errs_pca.append(np.degrees(np.arccos(np.clip(v_pca @ d_true, -1, 1))))
        errs_mle.append(np.degrees(np.arccos(np.clip(v_mle @ d_true, -1, 1))))
    assert np.mean(errs_mle) < np.mean(errs_pca) * 0.8, \
        (np.mean(errs_mle), np.mean(errs_pca))
