from bmnas_tpu.parallel.mesh import (  # noqa: F401
    ParallelContext,
    make_parallel_context,
)
