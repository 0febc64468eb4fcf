from vinet_tpu.utils.runtime import enable_compilation_cache, enable_profiling

__all__ = ["enable_compilation_cache", "enable_profiling"]
