from localdiffusion_tpu.ood.classifier import (  # noqa: F401
    ClassifierPatchCore,
    preprocess_for_patchcore,
    roc_optimal_threshold,
)
from localdiffusion_tpu.ood.frontend import OODFrontend  # noqa: F401
from localdiffusion_tpu.ood.patchcore import (  # noqa: F401
    PatchCore,
    anomaly_map_from_scores,
    compute_anomaly_score,
    euclidean_dist,
    generate_embedding,
    kcenter_greedy_indices,
    nearest_neighbors,
    subsample_embedding,
)
from localdiffusion_tpu.ood.thresholds import (  # noqa: F401
    LADDERS,
    ThresholdLadder,
    ladder_for,
    manual_mask,
    soft_mask_from_map,
)
from localdiffusion_tpu.ood.wide_resnet import (  # noqa: F401
    WideResNet50Features,
    convert_torch_state_dict,
)
