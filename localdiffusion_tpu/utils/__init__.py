from localdiffusion_tpu.utils.logging import CsvLogger, Timer, profile_trace  # noqa: F401
from localdiffusion_tpu.utils.metrics import mse, psnr, ssim  # noqa: F401
