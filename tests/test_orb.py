import jax
import jax.numpy as jnp
import numpy as np

from dr_slam_tpu.io import synthetic
from dr_slam_tpu.ops import fast as fast_ops
from dr_slam_tpu.ops import hamming, orb
from dr_slam_tpu.ops import image as image_ops


def checkerboard(h=120, w=160, cell=16):
    """Grid of isolated bright squares (L-corners, FAST-9 detectable)."""
    yy, xx = np.mgrid[0:h, 0:w]
    inside = ((yy % cell) < cell * 2 // 3) & ((xx % cell) < cell * 2 // 3)
    rnd = np.sin((yy // cell) * 12.9898 + (xx // cell) * 78.233) * 43758.5453
    rnd = rnd - np.floor(rnd)
    return (20.0 + inside * (100.0 + 100.0 * rnd)).astype(np.float32)


def test_fast_score_detects_square_corners():
    img = jnp.asarray(checkerboard())
    score = fast_ops.fast_score(img)
    score = fast_ops.nms3x3(score)
    corners = np.argwhere(np.asarray(score) > 20.0)
    assert len(corners) > 10
    # every detection near a square corner (square edges at 0 and 2/3*cell)
    for y, x in corners[:50]:
        dy = min(y % 16, abs(y % 16 - 10), 16 - y % 16)
        dx = min(x % 16, abs(x % 16 - 10), 16 - x % 16)
        assert dy <= 3 and dx <= 3


def test_fast_flat_region_no_corners():
    img = jnp.full((64, 64), 100.0)
    score = fast_ops.fast_score(img)
    assert float(jnp.max(score)) <= 0.0


def test_fast_score_threshold_semantics():
    """score > t iff 9 contiguous circle pixels differ from center by > t."""
    img = np.full((32, 32), 50.0, dtype=np.float32)
    img[10:22, 10:22] = 180.0  # bright square: its corners are FAST corners
    score = np.asarray(fast_ops.fast_score(jnp.asarray(img)))
    assert score[10, 10] > 100.0  # corner of square: half circle differs by 130


def test_pyramid_shapes():
    img = jnp.zeros((480, 640))
    pyr = image_ops.build_pyramid(img, 8, 1.2)
    assert len(pyr) == 8
    assert pyr[0].shape == (480, 640)
    assert pyr[1].shape == (400, 533)
    assert pyr[7].shape[0] < 140


def test_extract_orb_on_synthetic():
    seq = synthetic.SyntheticSequence(synthetic.corridor_trajectory(1))
    gray, _ = seq.render(0)
    kp = orb.extract_orb(gray, n_features=500, max_keypoints=512)
    n_valid = int(jnp.sum(kp.valid))
    assert n_valid > 300
    uv = np.asarray(kp.uv)[np.asarray(kp.valid)]
    assert uv[:, 0].min() >= 0 and uv[:, 0].max() < 640
    assert uv[:, 1].min() >= 0 and uv[:, 1].max() < 480
    # spatial spread: keypoints cover at least half the image quadrants
    qx = (uv[:, 0] > 320).astype(int)
    qy = (uv[:, 1] > 240).astype(int)
    quads = set(map(tuple, np.stack([qx, qy], -1)))
    assert len(quads) == 4


def test_descriptor_stability_under_translation():
    """Same scene shifted: matched descriptors should be close in Hamming."""
    img = checkerboard(240, 320, 24) + np.random.RandomState(0).randn(240, 320) * 2
    img = jnp.asarray(img, dtype=jnp.float32)
    img2 = jnp.roll(img, (0, 5), axis=(0, 1))
    kp1 = orb.extract_orb(img, n_features=200, max_keypoints=256)
    kp2 = orb.extract_orb(img2, n_features=200, max_keypoints=256)
    d = hamming.hamming_matrix(kp1.desc, kp2.desc)
    d = jnp.where(kp1.valid[:, None] & kp2.valid[None, :], d, jnp.inf)
    match, dist = hamming.mutual_best_matches(d, max_dist=60.0)
    m = np.asarray(match)
    ok = 0
    uv1, uv2 = np.asarray(kp1.uv), np.asarray(kp2.uv)
    for i, j in enumerate(m):
        if j >= 0:
            du = uv2[j] - uv1[i]
            if abs(du[0] - 5) < 2 and abs(du[1]) < 2:
                ok += 1
    assert ok > 30


def test_pack_unpack_roundtrip():
    rng = np.random.RandomState(0)
    bits = jnp.asarray(rng.rand(16, 256) > 0.5)
    packed = orb.pack_bits(bits)
    assert packed.shape == (16, 8)
    np.testing.assert_array_equal(np.asarray(orb.unpack_bits(packed)),
                                  np.asarray(bits))


def test_hamming_matmul_equals_popcount():
    rng = np.random.RandomState(1)
    a = jnp.asarray(rng.randint(0, 2 ** 32, (32, 8), dtype=np.uint32))
    b = jnp.asarray(rng.randint(0, 2 ** 32, (48, 8), dtype=np.uint32))
    hm = np.asarray(hamming.hamming_matrix(a, b))
    hp = np.asarray(hamming.hamming_popcount(a, b))
    np.testing.assert_array_equal(hm.astype(np.int32), hp)


def test_level_feature_counts():
    counts = orb.level_feature_counts(1000, 8, 1.2)
    assert sum(counts) == 1000
    assert counts[0] > counts[-1]


def test_subpixel_corner_tracking():
    """Subpixel FAST refinement (quadratic fit on the score map): the
    detected corner must move LINEARLY with a subpixel shift of the
    underlying corner. An integer detector snaps to the same pixel for
    sub-0.5px shifts, producing the viewpoint-dependent keypoint bias that
    accumulated into closed-loop drift in round 1 (docs/ROUND1_NOTES.md)."""
    import numpy as np
    import jax.numpy as jnp
    from dr_slam_tpu.ops.orb import extract_orb

    def corner_img(cx_, cy_, h=96, w=96):
        x = np.arange(w)
        y = np.arange(h)
        covx = np.clip((x + 0.5) - cx_, 0, 1)[None, :] * (x[None, :] < cx_ + 40)
        covy = np.clip((y + 0.5) - cy_, 0, 1)[:, None] * (y[:, None] < cy_ + 40)
        return (30.0 + 200.0 * covx * covy).astype(np.float32)

    offsets = [0.0, 0.2, 0.4, 0.6, 0.8]
    det = []
    for off in offsets:
        img = jnp.asarray(corner_img(40.0 + off, 40.0 + off))
        kp = extract_orb(img, n_features=20, n_levels=1, max_keypoints=32,
                         cell=16)
        uv = np.asarray(kp.uv)
        v = np.asarray(kp.valid)
        r = np.asarray(kp.response)
        best = np.argmax(np.where(v, r, -1))
        det.append(uv[best])
    det = np.asarray(det)
    # detected position minus true offset must be a CONSTANT (any fixed
    # detector convention offset is fine; snapping to integers is not)
    rel = det - np.asarray(offsets)[:, None]
    spread = rel.max(0) - rel.min(0)
    assert spread.max() < 0.1, (det, spread)
