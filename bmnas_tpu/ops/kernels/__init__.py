from bmnas_tpu.ops.kernels.node_mixed import (  # noqa: F401
    NodeMixedParams,
    fuse_bn_into_dense,
    node_mixed_op_fused,
    node_mixed_op_reference,
)
