from localdiffusion_tpu.ops.schedules import (  # noqa: F401
    Schedule,
    cosine_beta_schedule,
    linear_beta_schedule,
    make_schedule,
    sigmoid_beta_schedule,
)
from localdiffusion_tpu.ops import diffusion_math  # noqa: F401
