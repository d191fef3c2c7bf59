from localdiffusion_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    branch_batch_sharding,
    make_mesh,
    replicated,
    shard_batch,
)
from localdiffusion_tpu.parallel.fsdp import (  # noqa: F401
    gather_tree,
    put_tree_sharded,
    shard_info,
    spec_for_shape,
    state_shardings,
    tp_param_shardings,
    tree_shardings,
)
from localdiffusion_tpu.parallel.multihost import (  # noqa: F401
    init_distributed,
    is_multiprocess,
    is_primary,
    put_tree,
    sync,
    warmup_collectives,
)
from localdiffusion_tpu.parallel.patch import (  # noqa: F401
    PatchGrid,
    extract_patches,
    patch_parallel_sample,
    patch_parallel_sample_bucketed,
    plan_patches,
    stitch_patches,
)
