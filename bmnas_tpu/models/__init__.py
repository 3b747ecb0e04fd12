from bmnas_tpu.models.supernet import (  # noqa: F401
    FusionCell,
    FusionNetwork,
    SearchNodeCell,
    derive_genotype_from_arch,
    init_arch_params,
    inner_num_edges,
    outer_num_edges,
)
from bmnas_tpu.models.foundnet import (  # noqa: F401
    FoundFusionCell,
    FoundFusionNetwork,
    FoundNodeCell,
)
