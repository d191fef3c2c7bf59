"""Torch→flax weight conversion correctness for the PatchCore backbone.

Builds one wide-resnet bottleneck's torch parameters by hand (no torchvision
needed), runs the torch math with functional ops, converts via
convert_torch_state_dict, and checks the flax Bottleneck reproduces it.
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from localdiffusion_tpu.ood.wide_resnet import (
    Bottleneck,
    WideResNet50Features,
    convert_torch_state_dict,
)


def _torch_bottleneck_params(cin, width, cout, seed=0):
    g = torch.Generator().manual_seed(seed)
    p = {}

    def conv(name, co, ci, k):
        p[name + ".weight"] = torch.randn(co, ci, k, k, generator=g) * 0.05

    def bn(name, c):
        p[name + ".weight"] = torch.rand(c, generator=g) + 0.5
        p[name + ".bias"] = torch.randn(c, generator=g) * 0.1
        p[name + ".running_mean"] = torch.randn(c, generator=g) * 0.1
        p[name + ".running_var"] = torch.rand(c, generator=g) + 0.5

    conv("layer1.0.conv1", width, cin, 1)
    bn("layer1.0.bn1", width)
    conv("layer1.0.conv2", width, width, 3)
    bn("layer1.0.bn2", width)
    conv("layer1.0.conv3", cout, width, 1)
    bn("layer1.0.bn3", cout)
    conv("layer1.0.downsample.0", cout, cin, 1)
    bn("layer1.0.downsample.1", cout)
    return p


def _torch_bottleneck_forward(p, x):
    """Eval-mode bottleneck math with functional torch ops (NCHW)."""

    def bn(name, h):
        return F.batch_norm(
            h,
            p[name + ".running_mean"],
            p[name + ".running_var"],
            p[name + ".weight"],
            p[name + ".bias"],
            training=False,
            eps=1e-5,
        )

    h = F.relu(bn("layer1.0.bn1", F.conv2d(x, p["layer1.0.conv1.weight"])))
    h = F.relu(bn("layer1.0.bn2", F.conv2d(h, p["layer1.0.conv2.weight"], padding=1)))
    h = bn("layer1.0.bn3", F.conv2d(h, p["layer1.0.conv3.weight"]))
    idn = bn("layer1.0.downsample.1", F.conv2d(x, p["layer1.0.downsample.0.weight"]))
    return F.relu(h + idn)


def test_bottleneck_weight_conversion_parity():
    cin, width, cout = 8, 16, 32
    tp = _torch_bottleneck_params(cin, width, cout)
    x = torch.randn(2, cin, 12, 12, generator=torch.Generator().manual_seed(1))
    want = _torch_bottleneck_forward(tp, x).numpy()

    converted = convert_torch_state_dict({k: v.numpy() for k, v in tp.items()})
    block_params = {"params": converted["params"]["layer1_block0"]}

    # base_width drives `width`: planes·(base_width/64) == width
    blk = Bottleneck(
        planes=cout // 4, stride=1, downsample=True,
        base_width=int(64 * width / (cout // 4)),
    )
    got = blk.apply(block_params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), want, rtol=2e-4, atol=2e-4
    )


def _synth_wrn_state_dict(seed=0, stages=3):
    """A complete synthetic torchvision wide_resnet50_2 state dict for the
    stem + layer1..layer{stages} (width = planes·128/64, the 'wide' factor)."""
    rng = np.random.default_rng(seed)
    sd = {}

    def conv(name, co, ci, k):
        sd[name + ".weight"] = (
            rng.standard_normal((co, ci, k, k)) * 0.03
        ).astype(np.float32)

    def bn(name, c):
        sd[name + ".weight"] = rng.uniform(0.5, 1.5, c).astype(np.float32)
        sd[name + ".bias"] = (rng.standard_normal(c) * 0.05).astype(np.float32)
        sd[name + ".running_mean"] = (rng.standard_normal(c) * 0.05).astype(np.float32)
        sd[name + ".running_var"] = rng.uniform(0.5, 1.5, c).astype(np.float32)

    conv("conv1", 64, 3, 7)
    bn("bn1", 64)
    blocks = [3, 4, 6, 3]
    planes = [64, 128, 256, 512]
    cin = 64
    for stage in range(stages):
        p = planes[stage]
        width = p * 2
        cout = p * 4
        for b in range(blocks[stage]):
            tp = f"layer{stage + 1}.{b}"
            conv(tp + ".conv1", width, cin, 1)
            bn(tp + ".bn1", width)
            conv(tp + ".conv2", width, width, 3)
            bn(tp + ".bn2", width)
            conv(tp + ".conv3", cout, width, 1)
            bn(tp + ".bn3", cout)
            if b == 0:
                conv(tp + ".downsample.0", cout, cin, 1)
                bn(tp + ".downsample.1", cout)
            cin = cout
    return sd


def _torch_wrn_forward(sd, x, stages=3):
    """Eval-mode torchvision wide_resnet50_2 forward (stem + layer1..N) with
    functional ops — the oracle for full-model conversion parity."""
    sdt = {k: torch.from_numpy(v) for k, v in sd.items()}

    def bn(prefix, h):
        return F.batch_norm(
            h, sdt[prefix + ".running_mean"], sdt[prefix + ".running_var"],
            sdt[prefix + ".weight"], sdt[prefix + ".bias"],
            training=False, eps=1e-5,
        )

    h = F.conv2d(x, sdt["conv1.weight"], stride=2, padding=3)
    h = F.relu(bn("bn1", h))
    h = F.max_pool2d(h, 3, stride=2, padding=1)
    feats = {}
    blocks = [3, 4, 6, 3]
    for stage in range(stages):
        for b in range(blocks[stage]):
            tp = f"layer{stage + 1}.{b}"
            stride = 2 if (b == 0 and stage > 0) else 1
            idn = h
            o = F.relu(bn(tp + ".bn1", F.conv2d(h, sdt[tp + ".conv1.weight"])))
            o = F.relu(bn(tp + ".bn2", F.conv2d(o, sdt[tp + ".conv2.weight"],
                                                stride=stride, padding=1)))
            o = bn(tp + ".bn3", F.conv2d(o, sdt[tp + ".conv3.weight"]))
            if tp + ".downsample.0.weight" in sdt:
                idn = bn(tp + ".downsample.1",
                         F.conv2d(h, sdt[tp + ".downsample.0.weight"],
                                  stride=stride))
            h = F.relu(o + idn)
        feats[f"layer{stage + 1}"] = h
    return feats


import pytest


@pytest.mark.slow
def test_full_model_weight_conversion_parity():
    """VERDICT-r1 item 1: full-model converter check — a synthetically
    generated torch wide_resnet50_2 state dict (stem + layer1..layer3, the
    PatchCore extraction depth) converted via convert_torch_state_dict must
    reproduce the torch eval-mode features at layer2 AND layer3."""
    sd = _synth_wrn_state_dict(seed=3)
    x = torch.from_numpy(
        np.random.default_rng(4).standard_normal((1, 3, 64, 64)).astype(np.float32)
    )
    want = _torch_wrn_forward(sd, x)

    model = WideResNet50Features(layers=("layer2", "layer3"))
    params = convert_torch_state_dict(sd)
    got = model.apply(params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    for layer in ("layer2", "layer3"):
        np.testing.assert_allclose(
            np.asarray(got[layer]).transpose(0, 3, 1, 2),
            want[layer].numpy(),
            rtol=2e-3, atol=2e-3,
        )


def test_full_backbone_conversion_shapes():
    """Converted params for layer1..layer3 must init-replace cleanly."""
    # synthesize a minimal state dict covering the stem + first block only;
    # the converter must skip absent blocks without error
    sd = {
        "conv1.weight": np.random.default_rng(0).standard_normal((64, 3, 7, 7)),
        "bn1.weight": np.ones(64),
        "bn1.bias": np.zeros(64),
        "bn1.running_mean": np.zeros(64),
        "bn1.running_var": np.ones(64),
    }
    out = convert_torch_state_dict(sd)
    assert "conv1" in out["params"] and "bn1" in out["params"]
    assert out["params"]["conv1"]["kernel"].shape == (7, 7, 3, 64)
