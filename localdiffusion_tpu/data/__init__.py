from localdiffusion_tpu.data.loader import ArrayLoader, cycle  # noqa: F401
from localdiffusion_tpu.data.stream import (  # noqa: F401
    StreamLoader,
    device_prefetch,
    npy_shard,
)
from localdiffusion_tpu.data.mnist import (  # noqa: F401
    MNISTDataset,
    degrade,
    load_mnist_arrays,
    read_idx,
)
from localdiffusion_tpu.data.brats import (  # noqa: F401
    BRATSPngDataset,
    BRATSSegDataset,
    BRATSVolumeDataset,
)
from localdiffusion_tpu.data.mvtec import MvtecDatasetSR, salt_and_pepper, sr_degrade  # noqa: F401
from localdiffusion_tpu.data.synthetic import (  # noqa: F401
    synthetic_brain_pair,
    synthetic_brain_translation,
    synthetic_digits,
)
from localdiffusion_tpu.data.folder import ImageFolderDataset  # noqa: F401
