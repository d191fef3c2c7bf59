from localdiffusion_tpu.models.blocks import (  # noqa: F401
    Attention,
    Block,
    Downsample,
    LinearAttention,
    ResnetBlock,
    RMSNorm,
    SinusoidalPosEmb,
    TimeMlp,
    Upsample,
)
from localdiffusion_tpu.models.cond_encoder import BasicBlock, CondEncoder  # noqa: F401
from localdiffusion_tpu.models.seg_unet import SegUNet, bce_dice_loss, dice_loss  # noqa: F401
from localdiffusion_tpu.models.simple_cnn import SimpleCNN  # noqa: F401
from localdiffusion_tpu.models.unet import UNet, encode_cond  # noqa: F401
