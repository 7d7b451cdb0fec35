"""Auxiliary subsystems: YOLOX, occupancy grids, mesh export, native loader,
vocabulary, map IO."""

import os

import jax.numpy as jnp
import numpy as np
import pytest


def test_vocabulary_assign_and_score():
    from dr_slam_tpu.associate.vocabulary import bow_scores, compute_bow
    rng = np.random.RandomState(0)
    d1 = jnp.asarray(rng.randint(0, 2 ** 32, (64, 8), dtype=np.uint32))
    d2 = jnp.asarray(rng.randint(0, 2 ** 32, (64, 8), dtype=np.uint32))
    v = jnp.ones(64, dtype=bool)
    b1 = compute_bow(d1, v, 256)
    b2 = compute_bow(d2, v, 256)
    assert abs(float(jnp.sum(b1)) - 1.0) < 1e-4
    kf_bows = jnp.stack([b1, b2])
    s = bow_scores(b1, kf_bows, jnp.ones(2, dtype=bool))
    assert abs(float(s[0]) - 1.0) < 1e-4       # self-similarity = 1
    assert float(s[1]) < float(s[0])


def test_yolox_runs_and_shapes():
    from dr_slam_tpu.models.yolox import YOLOX
    det = YOLOX(input_size=256)
    rgb = jnp.asarray(np.random.RandomState(0).rand(120, 160, 3) * 255,
                      dtype=jnp.float32)
    out = det.detect(rgb)
    assert out.boxes.shape == (32, 4)
    assert out.scores.shape == (32,)
    assert bool(jnp.all(jnp.isfinite(out.boxes)))


def test_occupancy_grid():
    from dr_slam_tpu.io.occupancy import occupancy_grid_2d
    pts = jnp.asarray([[0.0, 0.0, 0.0], [1.0, 0.0, 1.0], [1.02, 0.0, 1.02]])
    grid, origin = occupancy_grid_2d(pts, jnp.ones(3, dtype=bool),
                                     resolution=0.1, size=32)
    g = np.asarray(grid)
    assert g.sum() == 3
    assert g.max() == 2  # two nearby points share a cell


def test_mesh_export(tmp_path):
    from dr_slam_tpu.io.mesh_export import save_mesh_ply
    from dr_slam_tpu.slam.state import make_empty_state
    from tests.test_tracking_e2e import small_cfg
    st = make_empty_state(small_cfg())
    # one synthetic plane: z=2, cloud on a grid
    xs, ys = np.meshgrid(np.linspace(-1, 1, 10), np.linspace(-1, 1, 10))
    cloud = np.stack([xs.ravel(), ys.ravel(), 2 * np.ones(100)], -1)
    Q = st.pl_cloud.shape[1]
    st = st._replace(
        pl_coef=st.pl_coef.at[0].set(jnp.asarray([0, 0, -1.0, 2.0])),
        pl_valid=st.pl_valid.at[0].set(True),
        pl_cloud=st.pl_cloud.at[0, :100].set(jnp.asarray(cloud)),
        pl_cloud_valid=st.pl_cloud_valid.at[0, :100].set(True))
    p = str(tmp_path / "mesh.ply")
    save_mesh_ply(p, st, cell=0.25)
    text = open(p).read()
    assert "element vertex" in text
    n_verts = int(text.split("element vertex ")[1].split("\n")[0])
    assert n_verts > 20


def test_native_loader_matches_pil(tmp_path):
    from PIL import Image

    from dr_slam_tpu.io.native_loader import NativeTUMLoader, build_native
    from dr_slam_tpu.io.tum import TUMDataset
    if not build_native():
        pytest.skip("native toolchain unavailable")
    root = str(tmp_path)
    os.makedirs(root + "/rgb")
    os.makedirs(root + "/depth")
    rows = []
    for i in range(2):
        g = (np.random.RandomState(i).rand(32, 48) * 255).astype(np.uint8)
        d = (np.random.RandomState(i + 5).rand(32, 48) * 30000).astype(np.uint16)
        Image.fromarray(g, mode="L").save(f"{root}/rgb/{i}.png")
        Image.fromarray(d, mode="I;16").save(f"{root}/depth/{i}.png")
        rows.append(f"{i}.0 rgb/{i}.png {i}.0 depth/{i}.png")
    open(root + "/associate.txt", "w").write("\n".join(rows))
    ds = TUMDataset(root)
    ld = NativeTUMLoader(ds)
    n = 0
    for idx, ts, gray, depth in ld:
        ref = ds[idx]
        np.testing.assert_allclose(gray, ref.gray, atol=1e-3)
        np.testing.assert_allclose(depth, ref.depth, atol=1e-5)
        n += 1
    ld.close()
    assert n == 2


def test_occupancy_save(tmp_path):
    from dr_slam_tpu.io.occupancy import save_occupancy_map
    from dr_slam_tpu.slam.state import make_empty_state
    from tests.test_tracking_e2e import small_cfg
    st = make_empty_state(small_cfg())
    st = st._replace(
        pt_pos=st.pt_pos.at[:50].set(
            jnp.asarray(np.random.RandomState(0).rand(50, 3) * 3)),
        pt_valid=st.pt_valid.at[:50].set(True))
    p = str(tmp_path / "occ")
    save_occupancy_map(p, st)
    assert os.path.exists(p + ".npz") and os.path.exists(p + ".pgm")


def test_yolox_decode_golden():
    """Golden decode+NMS test (VERDICT round-1 missing item 8): hand-built
    head outputs with known grid placements must decode to exact boxes, and
    class-aware NMS must suppress the overlapping same-class detection but
    keep the overlapping other-class one."""
    import numpy as np
    import jax.numpy as jnp
    from dr_slam_tpu.models.yolox import STRIDES, _decode, _select

    img = 64
    HIGH, LOW = 8.0, -8.0   # sigmoid ~ 1 / ~ 0
    outs = []
    for stride in STRIDES:
        h = w = img // stride
        reg = np.zeros((1, h, w, 4), np.float32)
        obj = np.full((1, h, w, 1), LOW, np.float32)
        cls = np.full((1, h, w, 80), LOW, np.float32)
        outs.append((reg, obj, cls))

    s0 = STRIDES[0]
    reg, obj, cls = outs[0]
    # detection A: cell (2,3), offset (0.5, 0.25), size 2x1 strides, class 7
    reg[0, 2, 3] = [0.5, 0.25, np.log(2.0), np.log(1.0)]
    obj[0, 2, 3, 0] = HIGH
    cls[0, 2, 3, 7] = HIGH
    # detection B: same cell region (cell (2,4) overlaps A), class 7, weaker
    reg[0, 2, 4] = [-0.5, 0.25, np.log(2.0), np.log(1.0)]  # same center as A
    obj[0, 2, 4, 0] = 2.0   # sigmoid ~ 0.88 < A
    cls[0, 2, 4, 7] = HIGH
    # detection C: same place but class 3 -> class-aware NMS keeps it
    reg[0, 2, 5] = [-1.5, 0.25, np.log(2.0), np.log(1.0)]
    obj[0, 2, 5, 0] = HIGH
    cls[0, 2, 5, 3] = HIGH

    dets = _decode([(jnp.asarray(r), jnp.asarray(o), jnp.asarray(c))
                    for r, o, c in outs], img)
    sel = _select(dets, score_th=0.3, iou_th=0.45, max_det=8)
    valid = np.asarray(sel.valid)
    boxes = np.asarray(sel.boxes)[valid]
    classes = np.asarray(sel.classes)[valid]
    assert valid.sum() == 2, (valid.sum(), classes)
    # expected box A: center ((3+0.5)*s, (2+0.25)*s), size (2s, 1s)
    cx, cy = (3 + 0.5) * s0, (2 + 0.25) * s0
    expA = np.asarray([cx - s0, cy - s0 / 2, cx + s0, cy + s0 / 2])
    dA = np.abs(boxes - expA).max(-1).min()
    assert dA < 1e-3, (boxes, expA)
    assert set(classes.tolist()) == {7, 3}, classes


def test_frame_overlay_with_detections(tmp_path):
    """FrameDrawer capability: overlay renders keypoints, lines, the plane
    segmentation mask and YOLOX boxes (src/FrameDrawer.cc:35,219)."""
    import numpy as np
    import jax.numpy as jnp
    from dr_slam_tpu.frontend.frame import extract_frame
    from dr_slam_tpu.io import synthetic
    from dr_slam_tpu.models.yolox import Detections
    from dr_slam_tpu.viz.viewer import draw_frame_overlay
    from tests.test_tracking_e2e import small_cfg

    cfg = small_cfg()
    seq = synthetic.SyntheticSequence(
        synthetic.corridor_trajectory(1), K4=cfg.camera.K4,
        height=240, width=320)
    gray, depth = seq.render(0)
    feats = extract_frame(jnp.asarray(gray, jnp.float32),
                          jnp.asarray(depth, jnp.float32), cfg)
    dets = Detections(
        boxes=jnp.asarray([[40.0, 40.0, 120.0, 100.0]]),
        scores=jnp.asarray([0.9]), classes=jnp.asarray([7]),
        valid=jnp.asarray([True]))
    out = str(tmp_path / "overlay.png")
    draw_frame_overlay(gray, feats, out, detections=dets,
                       plane_block=cfg.plane.block)
    import os
    assert os.path.getsize(out) > 10000


def test_system_detector_hook():
    """YOLOX wiring: an injected detector runs at keyframe events and its
    detections are exposed for the overlay (Frame::ExtractObject ->
    FrameDrawer::DrawObjects role)."""
    import numpy as np
    import jax.numpy as jnp
    from dr_slam_tpu.io import synthetic
    from dr_slam_tpu.models.yolox import Detections
    from dr_slam_tpu.slam.system import System
    from tests.test_tracking_e2e import small_cfg

    calls = []

    class FakeDetector:
        def detect(self, rgb):
            calls.append(rgb.shape)
            return Detections(boxes=jnp.zeros((1, 4)),
                              scores=jnp.ones(1), classes=jnp.zeros(1, jnp.int32),
                              valid=jnp.ones(1, bool))

    cfg = small_cfg()
    seq = synthetic.SyntheticSequence(
        synthetic.corridor_trajectory(3), K4=cfg.camera.K4,
        height=240, width=320)
    sysm = System(cfg, enable_loop_closing=False, detector=FakeDetector())
    for i in range(3):
        gray, depth = seq.render(i)
        sysm.track_rgbd(gray, depth, i / 30.0)
    assert len(calls) >= 1                  # ran at the init keyframe
    assert calls[0] == (240, 320, 3)
    assert sysm.last_detections is not None


def test_map_render_keyframe_frusta(tmp_path):
    """MapDrawer capability: the 3D map render includes keyframe frusta and
    covisibility-graph edges (src/MapDrawer.cc:278 DrawKeyFrames, :374
    DrawGraph) on a map with >= 2 covisible keyframes."""
    import dataclasses
    import os
    import numpy as np
    from dr_slam_tpu.io import synthetic
    from dr_slam_tpu.slam.system import System
    from dr_slam_tpu.viz.viewer import Viewer
    from tests.test_tracking_e2e import small_cfg

    cfg0 = small_cfg()
    cfg = cfg0.replace(
        tracking=dataclasses.replace(cfg0.tracking, min_frames=2))
    seq = synthetic.SyntheticSequence(
        synthetic.corridor_trajectory(8), K4=cfg.camera.K4,
        height=240, width=320)
    sysm = System(cfg, enable_loop_closing=False)
    for i in range(8):
        gray, depth = seq.render(i)
        sysm.track_rgbd(gray, depth, i / 30.0)
    sysm.tracker.flush()
    st = sysm.tracker.map_state
    assert int(np.asarray(st.kf_valid).sum()) >= 2  # frusta have subjects
    out = str(tmp_path / "map.png")
    Viewer(sysm).render_map(out)
    assert os.path.getsize(out) > 20000


def test_gt_rotation_residual_diagnostic():
    """GroundTruth_R diagnostic input (Tracking.cc:191 GrabImageRGBD +
    MatrixResidual :3773): feeding the true rotation yields a small residual
    on clean synthetic tracking; feeding a wrong rotation yields ~the
    injected angle."""
    import numpy as np
    from dr_slam_tpu.io import synthetic
    from dr_slam_tpu.slam.system import System, rotation_residual_deg
    from tests.test_tracking_e2e import small_cfg

    # unit identities of the residual formula itself
    Rz = lambda a: np.array([[np.cos(a), -np.sin(a), 0],
                             [np.sin(a), np.cos(a), 0], [0, 0, 1.0]])
    assert abs(rotation_residual_deg(np.eye(3), np.eye(3))) < 1e-6
    assert abs(rotation_residual_deg(Rz(np.radians(10)), np.eye(3)) - 10) < 1e-4

    cfg = small_cfg()
    n = 6
    poses = synthetic.corridor_trajectory(n, step=0.01)
    seq = synthetic.SyntheticSequence(poses, K4=cfg.camera.K4,
                                      height=240, width=320)
    sysm = System(cfg, enable_loop_closing=False)
    res = None
    for i in range(n):
        gray, depth = seq.render(i)
        res = sysm.track_rgbd(gray, depth, i / 30.0,
                              gt_R=np.asarray(poses[i])[:3, :3])
    assert res.rot_residual_deg is not None
    assert res.rot_residual_deg < 2.0, res.rot_residual_deg


def test_stage_profiler_collects_device_times(tmp_path):
    """Structured per-stage profiling (SURVEY.md section 5 tracing
    obligation): enabling the profiler around a short run yields stage
    timings for dispatch, keyframe insertion phases, and readbacks, and
    dumps a JSON summary."""
    import json
    import os
    from dr_slam_tpu.io import synthetic
    from dr_slam_tpu.slam.system import System
    from dr_slam_tpu.utils.profiling import PROFILER
    from tests.test_tracking_e2e import small_cfg

    cfg = small_cfg()
    seq = synthetic.SyntheticSequence(
        synthetic.corridor_trajectory(8), K4=cfg.camera.K4,
        height=240, width=320)
    PROFILER.reset()
    PROFILER.enable()
    try:
        sysm = System(cfg, enable_loop_closing=False)
        for i in range(8):
            gray, depth = seq.render(i)
            sysm.track_rgbd(gray, depth, i / 30.0)
        sysm.shutdown(save_dir=str(tmp_path))
    finally:
        PROFILER.disable()
    summ = json.loads(open(tmp_path / "stage_profile.json").read())
    assert "kf.add" in summ and summ["kf.add"]["count"] >= 1
    for st in summ.values():
        assert st["mean_ms"] >= 0 and st["p95_ms"] >= st["p50_ms"] - 1e-6
