from vinet_tpu.utils.runtime import (
    enable_compilation_cache,
    enable_profiling,
    init_distributed,
    num_params,
)

__all__ = ["enable_compilation_cache", "enable_profiling", "init_distributed", "num_params"]
