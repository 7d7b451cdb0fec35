"""YOLOX checkpoint converter: BN folding numerics vs torch, and a full
synthetic official-layout checkpoint converting into a runnable jnp model.

The official module names used here are written out INDEPENDENTLY of the
converter's internal mapping (from the Megvii YOLOX module tree: CSPDarknet
dark2-5, YOLOPAFPN C3_p4/C3_p3/C3_n3/C3_n4, YOLOXHead stems/cls_convs/...),
so a converter mapping typo shows up as a KeyError/shape mismatch here.
Reference capability: the TensorRT engine the reference hard-requires at
startup (include/YOLOX.h:54, src/System.cc:88) is built from these same
official checkpoints."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from dr_slam_tpu.models import yolox
from dr_slam_tpu.models.yolox_convert import (convert_state_dict,
                                              fold_conv_bn)


def test_fold_conv_bn_matches_torch():
    """conv(no bias)+BN+SiLU in torch == our folded conv+bias+SiLU in jnp."""
    import jax.numpy as jnp
    from dr_slam_tpu.models.yolox import _conv

    rng = np.random.RandomState(0)
    x = rng.randn(1, 6, 10, 12).astype(np.float32)          # NCHW
    w = (rng.randn(8, 6, 3, 3) * 0.2).astype(np.float32)    # OIHW
    gamma = rng.rand(8).astype(np.float32) + 0.5
    beta = rng.randn(8).astype(np.float32)
    mean = rng.randn(8).astype(np.float32)
    var = rng.rand(8).astype(np.float32) + 0.1

    with torch.no_grad():
        y = torch.nn.functional.conv2d(torch.from_numpy(x),
                                       torch.from_numpy(w), padding=1)
        y = torch.nn.functional.batch_norm(
            y, torch.from_numpy(mean), torch.from_numpy(var),
            torch.from_numpy(gamma), torch.from_numpy(beta), eps=1e-3)
        y = torch.nn.functional.silu(y).numpy()

    prm = fold_conv_bn(w, gamma, beta, mean, var, eps=1e-3)
    ours = np.asarray(_conv(jnp.asarray(np.transpose(x, (0, 2, 3, 1))), prm))
    assert np.allclose(np.transpose(ours, (0, 3, 1, 2)), y, atol=2e-5), \
        np.abs(np.transpose(ours, (0, 3, 1, 2)) - y).max()


def _official_state_dict(seed=0):
    """A YOLOX-s state dict with the official module names and shapes,
    random values (depth 0.33 -> csp bottleneck counts 1,3,3,1; width 0.50
    -> channels 32,64,128,256,512)."""
    rng = np.random.RandomState(seed)
    sd = {}

    def base_conv(mod, c_in, c_out, k):
        sd[f"{mod}.conv.weight"] = torch.from_numpy(
            (rng.randn(c_out, c_in, k, k) * 0.1).astype(np.float32))
        for suffix, val in (("weight", rng.rand(c_out) + 0.5),
                            ("bias", rng.randn(c_out) * 0.1),
                            ("running_mean", rng.randn(c_out) * 0.1),
                            ("running_var", rng.rand(c_out) + 0.5)):
            sd[f"{mod}.bn.{suffix}"] = torch.from_numpy(
                val.astype(np.float32))

    def csp(mod, c_in, c_out, n):
        base_conv(f"{mod}.conv1", c_in, c_out // 2, 1)
        base_conv(f"{mod}.conv2", c_in, c_out // 2, 1)
        base_conv(f"{mod}.conv3", c_out, c_out, 1)
        for i in range(n):
            base_conv(f"{mod}.m.{i}.conv1", c_out // 2, c_out // 2, 1)
            base_conv(f"{mod}.m.{i}.conv2", c_out // 2, c_out // 2, 3)

    W = [32, 64, 128, 256, 512]
    base_conv("backbone.backbone.stem.conv", 12, W[0], 3)
    base_conv("backbone.backbone.dark2.0", W[0], W[1], 3)
    csp("backbone.backbone.dark2.1", W[1], W[1], 1)
    base_conv("backbone.backbone.dark3.0", W[1], W[2], 3)
    csp("backbone.backbone.dark3.1", W[2], W[2], 3)
    base_conv("backbone.backbone.dark4.0", W[2], W[3], 3)
    csp("backbone.backbone.dark4.1", W[3], W[3], 3)
    base_conv("backbone.backbone.dark5.0", W[3], W[4], 3)
    base_conv("backbone.backbone.dark5.1.conv1", W[4], W[4] // 2, 1)
    base_conv("backbone.backbone.dark5.1.conv2", W[4] * 2, W[4], 1)
    csp("backbone.backbone.dark5.2", W[4], W[4], 1)
    base_conv("backbone.lateral_conv0", W[4], W[3], 1)
    csp("backbone.C3_p4", W[3] * 2, W[3], 1)
    base_conv("backbone.reduce_conv1", W[3], W[2], 1)
    csp("backbone.C3_p3", W[2] * 2, W[2], 1)
    base_conv("backbone.bu_conv2", W[2], W[2], 3)
    csp("backbone.C3_n3", W[2] * 2, W[3], 1)
    base_conv("backbone.bu_conv1", W[3], W[3], 3)
    csp("backbone.C3_n4", W[3] * 2, W[4], 1)
    for lvl in range(3):
        c_in = [W[2], W[3], W[4]][lvl]
        base_conv(f"head.stems.{lvl}", c_in, W[2], 1)
        base_conv(f"head.cls_convs.{lvl}.0", W[2], W[2], 3)
        base_conv(f"head.cls_convs.{lvl}.1", W[2], W[2], 3)
        base_conv(f"head.reg_convs.{lvl}.0", W[2], W[2], 3)
        base_conv(f"head.reg_convs.{lvl}.1", W[2], W[2], 3)
        for kind, c_out in (("cls", 80), ("reg", 4), ("obj", 1)):
            sd[f"head.{kind}_preds.{lvl}.weight"] = torch.from_numpy(
                (rng.randn(c_out, W[2], 1, 1) * 0.1).astype(np.float32))
            sd[f"head.{kind}_preds.{lvl}.bias"] = torch.from_numpy(
                (rng.randn(c_out) * 0.1).astype(np.float32))
    return sd


def test_convert_full_checkpoint_layout_and_forward(tmp_path):
    """Converted params: exact key/shape agreement with init_params, and the
    forward pass + decode + NMS run on the converted weights."""
    import jax
    import jax.numpy as jnp

    sd = _official_state_dict()
    params = convert_state_dict(sd)

    init = yolox.init_params()
    missing = set(init) - set(params)
    extra = set(params) - set(init)
    assert not missing, sorted(missing)[:6]
    assert not extra, sorted(extra)[:6]
    for k in init:
        if k == "meta":
            assert params[k] == init[k]
            continue
        for leaf in ("w", "b"):
            assert params[k][leaf].shape == init[k][leaf].shape, \
                (k, leaf, params[k][leaf].shape, init[k][leaf].shape)

    # npz round-trip through the runtime loader
    from dr_slam_tpu.models.yolox_convert import np as _np
    flat = {k: np.asarray(v, dtype=object) for k, v in params.items()}
    path = str(tmp_path / "conv.npz")
    np.savez(path, **flat)
    det = yolox.YOLOX(weights=path, input_size=160)
    out = det.detect(jnp.asarray(
        np.random.RandomState(1).rand(120, 160, 3) * 255, jnp.float32))
    assert out.boxes.shape[1] == 4
    assert np.isfinite(np.asarray(out.scores)).all()


def test_convert_rejects_wrong_scale():
    """A truncated/incompatible checkpoint raises instead of silently
    producing a half-initialized model."""
    sd = _official_state_dict()
    for k in list(sd):
        if k.startswith("backbone.backbone.dark5"):
            del sd[k]
    with pytest.raises(KeyError):
        convert_state_dict(sd)
