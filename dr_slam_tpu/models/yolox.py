"""YOLOX object detector in pure JAX (the reference's Semanticer).

Capability of the reference's TensorRT YOLOX integration (include/YOLOX.h,
src/YOLOX.cpp:398): 640x640 letterboxed input, CSPDarknet + PAFPN + decoupled
head, per-stride grid decode, class-aware NMS over 80 COCO classes; results
feed the 2D overlay (FrameDrawer::DrawObjects, src/FrameDrawer.cc:219) and
are NOT used in pose math (SURVEY.md 2.2), so detector quality does not gate
SLAM accuracy.

Here: a YOLOX-s-shaped network as pure jnp (conv/bn folded at load time,
SiLU activations) compiled by XLA for the MXU -- no TensorRT, no engine
files. Weights load from an .npz checkpoint when provided; otherwise the
deterministic random init still exercises the full compute path (useful for
benchmarking and for the queue plumbing), matching the reference's behavior
of hard-requiring an engine file only when detection is enabled
(src/System.cc:88)."""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

COCO_CLASSES = 80
STRIDES = (8, 16, 32)


class Detections(NamedTuple):
    boxes: jnp.ndarray    # (N, 4) x1,y1,x2,y2 in input pixels
    scores: jnp.ndarray   # (N,)
    classes: jnp.ndarray  # (N,) int32
    valid: jnp.ndarray    # (N,) bool


def _conv_params(rng, c_in, c_out, k):
    w = rng.randn(k, k, c_in, c_out).astype(np.float32)
    w *= np.sqrt(2.0 / (k * k * c_in))
    return {"w": w, "b": np.zeros(c_out, np.float32)}


def init_params(depth_mul: float = 0.33, width_mul: float = 0.50,
                seed: int = 0) -> dict:
    """YOLOX-s scale: depth 0.33, width 0.50."""
    rng = np.random.RandomState(seed)
    w = lambda c: max(int(round(c * width_mul)), 8)
    d = lambda n: max(int(round(n * depth_mul)), 1)
    p = {"meta": {"widths": [w(64), w(128), w(256), w(512), w(1024)],
                  "depths": [d(3), d(9), d(9), d(3)]}}

    def csp(name, c_in, c_out, n):
        p[name + ".main"] = _conv_params(rng, c_in, c_out // 2, 1)
        p[name + ".short"] = _conv_params(rng, c_in, c_out // 2, 1)
        p[name + ".final"] = _conv_params(rng, c_out, c_out, 1)
        for i in range(n):
            p[f"{name}.b{i}.1"] = _conv_params(rng, c_out // 2, c_out // 2, 1)
            p[f"{name}.b{i}.2"] = _conv_params(rng, c_out // 2, c_out // 2, 3)

    ws = p["meta"]["widths"]
    ds = p["meta"]["depths"]
    p["stem"] = _conv_params(rng, 12, ws[0], 3)          # focus: 12 = 3*4
    p["down1"] = _conv_params(rng, ws[0], ws[1], 3)
    csp("csp1", ws[1], ws[1], ds[0])
    p["down2"] = _conv_params(rng, ws[1], ws[2], 3)
    csp("csp2", ws[2], ws[2], ds[1])
    p["down3"] = _conv_params(rng, ws[2], ws[3], 3)
    csp("csp3", ws[3], ws[3], ds[2])
    p["down4"] = _conv_params(rng, ws[3], ws[4], 3)
    # SPP bottleneck (official CSPDarknet dark5: Conv -> SPPBottleneck ->
    # CSPLayer) -- 1x1 squeeze, parallel 5/9/13 max-pools, 1x1 expand
    p["spp.pre"] = _conv_params(rng, ws[4], ws[4] // 2, 1)
    p["spp.post"] = _conv_params(rng, (ws[4] // 2) * 4, ws[4], 1)
    csp("csp4", ws[4], ws[4], ds[3])
    # PAFPN lateral/merge convs (official YOLOPAFPN: CSP depth = round(3*d))
    p["lat2"] = _conv_params(rng, ws[4], ws[3], 1)
    csp("fpn2", ws[3] * 2, ws[3], ds[3])
    p["lat1"] = _conv_params(rng, ws[3], ws[2], 1)
    csp("fpn1", ws[2] * 2, ws[2], ds[3])
    p["pan1"] = _conv_params(rng, ws[2], ws[2], 3)
    csp("pan1c", ws[2] * 2, ws[3], ds[3])
    p["pan2"] = _conv_params(rng, ws[3], ws[3], 3)
    csp("pan2c", ws[3] * 2, ws[4], ds[3])
    # decoupled heads per level
    for lvl, c in enumerate([ws[2], ws[3], ws[4]]):
        p[f"head{lvl}.stem"] = _conv_params(rng, c, ws[2], 1)
        p[f"head{lvl}.cls1"] = _conv_params(rng, ws[2], ws[2], 3)
        p[f"head{lvl}.cls2"] = _conv_params(rng, ws[2], ws[2], 3)
        p[f"head{lvl}.reg1"] = _conv_params(rng, ws[2], ws[2], 3)
        p[f"head{lvl}.reg2"] = _conv_params(rng, ws[2], ws[2], 3)
        p[f"head{lvl}.cls"] = _conv_params(rng, ws[2], COCO_CLASSES, 1)
        p[f"head{lvl}.reg"] = _conv_params(rng, ws[2], 4, 1)
        p[f"head{lvl}.obj"] = _conv_params(rng, ws[2], 1, 1)
    return p


def load_params(path: str) -> dict:
    data = np.load(path, allow_pickle=True)
    p = {k: data[k].item() if data[k].dtype == object else data[k]
         for k in data.files}
    # checkpoints may store fp16 (scripts/train_yolox.py); compute in fp32.
    # Upcast float arrays in place, preserving any extra keys a checkpoint
    # carries (BN stats, scales, ...) instead of rebuilding {'w','b'} only.
    for k, v in p.items():
        if isinstance(v, dict):
            p[k] = {kk: (np.asarray(vv, np.float32)
                         if isinstance(vv, np.ndarray)
                         and vv.dtype.kind == "f" else vv)
                    for kk, vv in v.items()}
    return p


def _conv(x, prm, stride=1):
    w = jnp.asarray(prm["w"])
    y = jax.lax.conv_general_dilated(
        x, w, (stride, stride), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return jax.nn.silu(y + jnp.asarray(prm["b"]))


def _csp(x, p, name, n, shortcut=True):
    """CSPLayer: official backbone dark2-4 use residual bottlenecks
    (shortcut=True); dark5 and every PAFPN merge use shortcut=False."""
    a = _conv(x, p[name + ".main"])
    b = _conv(x, p[name + ".short"])
    for i in range(n):
        h = _conv(a, p[f"{name}.b{i}.1"])
        h = _conv(h, p[f"{name}.b{i}.2"])
        a = a + h if shortcut else h
    return _conv(jnp.concatenate([a, b], -1), p[name + ".final"])


def _spp(x, p):
    """SPPBottleneck (official CSPDarknet dark5): 1x1 squeeze, identity +
    5/9/13 SAME max-pools concatenated, 1x1 expand."""
    h = _conv(x, p["spp.pre"])
    pools = [h]
    for k in (5, 9, 13):
        pools.append(jax.lax.reduce_window(
            h, -jnp.inf, jax.lax.max, (1, k, k, 1), (1, 1, 1, 1), "SAME"))
    return _conv(jnp.concatenate(pools, -1), p["spp.post"])


def _upsample(x):
    n, h, w, c = x.shape
    return jax.image.resize(x, (n, h * 2, w * 2, c), "nearest")


def _forward(p, img):
    """img (1, H, W, 3) in [0,1], H,W multiples of 32 -> 3 head tensors."""
    ds = p["meta"]["depths"]
    # focus: space-to-depth 2x
    x = jnp.concatenate([img[:, ::2, ::2], img[:, 1::2, ::2],
                         img[:, ::2, 1::2], img[:, 1::2, 1::2]], -1)
    x = _conv(x, p["stem"])
    x = _conv(x, p["down1"], 2)
    x = _csp(x, p, "csp1", ds[0])
    x = _conv(x, p["down2"], 2)
    c3 = _csp(x, p, "csp2", ds[1])          # stride 8
    x = _conv(c3, p["down3"], 2)
    c4 = _csp(x, p, "csp3", ds[2])          # stride 16
    x = _conv(c4, p["down4"], 2)
    x = _spp(x, p)
    c5 = _csp(x, p, "csp4", ds[3], shortcut=False)   # stride 32

    # PAFPN (all merge CSPs are shortcut=False, official YOLOPAFPN)
    nf = ds[3]
    l5 = _conv(c5, p["lat2"])
    f4 = _csp(jnp.concatenate([_upsample(l5), c4], -1), p, "fpn2", nf,
              shortcut=False)
    l4 = _conv(f4, p["lat1"])
    f3 = _csp(jnp.concatenate([_upsample(l4), c3], -1), p, "fpn1", nf,
              shortcut=False)
    d3 = _conv(f3, p["pan1"], 2)
    f4b = _csp(jnp.concatenate([d3, l4], -1), p, "pan1c", nf, shortcut=False)
    d4 = _conv(f4b, p["pan2"], 2)
    f5 = _csp(jnp.concatenate([d4, l5], -1), p, "pan2c", nf, shortcut=False)

    outs = []
    for lvl, feat in enumerate([f3, f4b, f5]):
        h = _conv(feat, p[f"head{lvl}.stem"])
        hc = _conv(_conv(h, p[f"head{lvl}.cls1"]), p[f"head{lvl}.cls2"])
        hr = _conv(_conv(h, p[f"head{lvl}.reg1"]), p[f"head{lvl}.reg2"])
        cls = jax.lax.conv_general_dilated(
            hc, jnp.asarray(p[f"head{lvl}.cls"]["w"]), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")) \
            + jnp.asarray(p[f"head{lvl}.cls"]["b"])
        reg = jax.lax.conv_general_dilated(
            hr, jnp.asarray(p[f"head{lvl}.reg"]["w"]), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")) \
            + jnp.asarray(p[f"head{lvl}.reg"]["b"])
        obj = jax.lax.conv_general_dilated(
            hr, jnp.asarray(p[f"head{lvl}.obj"]["w"]), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")) \
            + jnp.asarray(p[f"head{lvl}.obj"]["b"])
        outs.append((reg, obj, cls))
    return outs


def _decode(outs, img_size):
    """Grid/stride decode (YOLOX.h:89-114 capability) -> (M, 6)."""
    rows = []
    for (reg, obj, cls), stride in zip(outs, STRIDES):
        _, h, w, _ = reg.shape
        gy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
        gx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
        cxy = jnp.stack([(reg[0, ..., 0] + gx) * stride,
                         (reg[0, ..., 1] + gy) * stride], -1)
        wh = jnp.exp(jnp.clip(reg[0, ..., 2:4], -10, 6)) * stride
        score = jax.nn.sigmoid(obj[0, ..., 0])
        cls_p = jax.nn.sigmoid(cls[0])
        best_c = jnp.argmax(cls_p, -1)
        best_p = jnp.max(cls_p, -1)
        row = jnp.concatenate([
            cxy - wh / 2, cxy + wh / 2,
            (score * best_p)[..., None], best_c[..., None].astype(jnp.float32),
        ], -1)
        rows.append(row.reshape(-1, 6))
    return jnp.concatenate(rows, 0)


@functools.partial(jax.jit, static_argnames=("max_det",))
def _select(dets, score_th: float, iou_th: float, max_det: int = 32):
    """Top-k + class-aware greedy NMS (fixed iterations)."""
    scores = jnp.where(dets[:, 4] >= score_th, dets[:, 4], 0.0)
    top_s, idx = jax.lax.top_k(scores, max_det * 4)
    cand = dets[idx]

    def iou(a, b):
        x1 = jnp.maximum(a[0], b[..., 0])
        y1 = jnp.maximum(a[1], b[..., 1])
        x2 = jnp.minimum(a[2], b[..., 2])
        y2 = jnp.minimum(a[3], b[..., 3])
        inter = jnp.maximum(x2 - x1, 0) * jnp.maximum(y2 - y1, 0)
        area_a = (a[2] - a[0]) * (a[3] - a[1])
        area_b = (b[..., 2] - b[..., 0]) * (b[..., 3] - b[..., 1])
        return inter / jnp.maximum(area_a + area_b - inter, 1e-6)

    n = cand.shape[0]
    keep = jnp.zeros(n, bool)
    alive = top_s > 0

    def body(i, carry):
        keep, alive = carry
        take = alive[i]
        keep = keep.at[i].set(take)
        same_cls = cand[:, 5] == cand[i, 5]
        sup = (iou(cand[i, :4], cand[:, :4]) > iou_th) & same_cls & take
        alive = alive & ~sup.at[i].set(False)
        return keep, alive

    keep, _ = jax.lax.fori_loop(0, n, body, (keep, alive))
    order = jnp.argsort(~keep)  # kept first
    sel = cand[order][:max_det]
    kv = keep[order][:max_det]
    return Detections(boxes=sel[:, :4], scores=sel[:, 4],
                      classes=sel[:, 5].astype(jnp.int32), valid=kv)


class YOLOX:
    """Detector facade mirroring the reference's YOLOX queue interface
    (include/YOLOX.h:79-81: push images, pop results)."""

    def __init__(self, weights: str | None = None, input_size: int = 640,
                 score_th: float = 0.3, iou_th: float = 0.45):
        self.params = load_params(weights) if weights else init_params()
        self.input_size = input_size
        self.score_th = score_th
        self.iou_th = iou_th
        self._jit = jax.jit(self._detect_impl)

    def _detect_impl(self, img):
        outs = _forward(self.params, img[None] / 255.0)
        dets = _decode(outs, self.input_size)
        return _select(dets, self.score_th, self.iou_th)

    def detect(self, rgb: jnp.ndarray) -> Detections:
        """rgb (H, W, 3) float32 [0,255] -> Detections in input pixels.
        The caller letterboxes to (input_size, input_size) like the
        reference's static 640x640 resize (YOLOX.cpp)."""
        s = self.input_size
        img = jax.image.resize(jnp.asarray(rgb, jnp.float32), (s, s, 3),
                               "bilinear")
        return self._jit(img)
