"""localdiffusion_tpu — TPU-native local-diffusion framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
edshkim98/LocalDiffusion-Hallucination ("Tackling Structural Hallucination in
Image Translation with Local Diffusion", ECCV'24): conditional diffusion
image translation with hallucination suppression via OOD-masked branched
reverse diffusion and mid-chain fusion.

Design principles (TPU-first, not a port):
  * All sampling loops are `lax.scan`s — fully jit-compiled, device-resident.
  * The reference's two sequential per-step UNet calls (reference
    ddpm.py:694-695) become ONE batched call on a leading branch axis.
  * The reference's mutable config-flag state machine (ddpm.py:779-781,
    874-927) becomes static phase structure + scan-carried state.
  * Data layout is NHWC (channels-last) throughout for MXU-friendly convs.
  * Parallelism is `jax.sharding.Mesh` + NamedSharding; XLA emits the
    collectives (no hand-written comms).
"""

__version__ = "0.1.0"

from localdiffusion_tpu.config import (  # noqa: F401
    Config,
    DataConfig,
    DiffusionConfig,
    ModelConfig,
    OODConfig,
    SamplerConfig,
    TrainConfig,
    load_reference_yaml,
)
