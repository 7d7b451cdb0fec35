"""The shipped synthetic-trained YOLOX weights actually detect.

The reference ships no weights either (System.cc:88 loads an absolute-path
TensorRT engine trained elsewhere); we go further and commit a functional
tiny detector (scripts/train_yolox.py) so the overlay capability
(Frame::ExtractObject -> FrameDrawer::DrawObjects, src/Frame.cc:1330)
works out of the box. This test is the acceptance gate for that artifact:
fresh scenes from the same generator, every GT person recovered with
IoU > 0.4 and no more than 2 false boxes per image.
"""

import os

import numpy as np
import pytest

WEIGHTS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "dr_slam_tpu", "data", "yolox_synth.npz")

pytestmark = pytest.mark.skipif(
    not os.path.exists(WEIGHTS), reason="no shipped detector weights")


def _iou(a, b):
    x1, y1 = max(a[0], b[0]), max(a[1], b[1])
    x2, y2 = min(a[2], b[2]), min(a[3], b[3])
    inter = max(x2 - x1, 0) * max(y2 - y1, 0)
    ua = (a[2] - a[0]) * (a[3] - a[1]) + (b[2] - b[0]) * (b[3] - b[1]) - inter
    return inter / max(ua, 1e-6)


def test_shipped_weights_detect():
    import importlib.util

    from dr_slam_tpu.models.yolox import YOLOX

    spec = importlib.util.spec_from_file_location(
        "train_yolox", os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "scripts", "train_yolox.py"))
    ty = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ty)
    render_scene, SIZE = ty.render_scene, ty.SIZE

    det = YOLOX(weights=WEIGHTS, input_size=SIZE, score_th=0.4)
    rng = np.random.RandomState(123)  # NOT the training seed (7)
    hits = misses = extras = total = 0
    for _ in range(6):
        img, boxes, n = render_scene(rng)
        out = det.detect(img * 255.0)
        pred = np.asarray(out.boxes)[np.asarray(out.valid)]
        total += n
        for gt in boxes[:n]:
            if any(_iou(gt, p) > 0.4 for p in pred):
                hits += 1
            else:
                misses += 1
        extras += max(len(pred) - n, 0)
    assert hits / total >= 0.8, (hits, total)
    assert extras <= 2 * 6, extras


def test_system_accepts_detector():
    """System(detector=...) runs detections on keyframes and exposes them
    via last_detections (viewer overlay path; like the reference the boxes
    stay out of pose math -- Frame::ExtractObject feeds only DrawObjects)."""
    from dr_slam_tpu.io import synthetic
    from dr_slam_tpu.models.yolox import YOLOX
    from dr_slam_tpu.slam.system import System
    from tests.test_tracking_e2e import small_cfg

    cfg = small_cfg()
    det = YOLOX(weights=WEIGHTS, input_size=256, score_th=0.4)
    seq = synthetic.SyntheticSequence(
        synthetic.corridor_trajectory(12), K4=cfg.camera.K4,
        height=cfg.camera.height, width=cfg.camera.width)
    sys_ = System(cfg, detector=det, enable_loop_closing=False)
    saw_detections = False
    for i in range(12):
        g, d = seq.render(i)
        sys_.track_rgbd(np.asarray(g), np.asarray(d), i / 30.0)
        if sys_.last_detections is not None:
            saw_detections = True
    # a keyframe was inserted, so the detector ran and its output is exposed
    assert saw_detections
    out = sys_.last_detections
    assert hasattr(out, "boxes") and hasattr(out, "valid")
    assert np.asarray(out.boxes).shape[-1] == 4
