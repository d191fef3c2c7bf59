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
