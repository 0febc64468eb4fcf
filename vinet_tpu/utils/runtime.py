"""Runtime knobs: persistent XLA compilation cache, profiler hooks.

TPU compiles of the full model take 20-200 s on this stack; the persistent
cache makes every CLI invocation after the first start in seconds. (The
reference has no analogue — torch eager — and no profiling hooks at all,
SURVEY.md §5 tracing.)
"""

from __future__ import annotations

import contextlib
import os


def enable_compilation_cache(path: str | None = None) -> None:
    import jax

    path = path or os.environ.get(
        "VINET_XLA_CACHE", os.path.expanduser("~/.cache/vinet_tpu_xla")
    )
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax or backend restrictions: cache is best-effort


def num_params(tree) -> int:
    """Total parameter count of a pytree (reference utils.py:81-82; dedup by
    data pointer is unnecessary here — pytrees never alias leaves)."""
    import jax

    return sum(int(leaf.size) for leaf in jax.tree_util.tree_leaves(tree))


def init_distributed() -> tuple:
    """Multi-host bring-up: jax.distributed.initialize(), then
    (process_index, process_count). The reference has no multi-node story at
    all (SURVEY.md §2.6); here one flag turns the same mesh/step into a
    DCN-spanning program — collectives ride ICI within a slice and DCN
    across, inserted by GSPMD.

    Two entry modes:
    - VINET_COORDINATOR=host:port + VINET_NUM_PROCESSES + VINET_PROCESS_ID
      set: explicit bring-up — failures PROPAGATE (the user asked for
      multi-host; silently proceeding single-host would corrupt the run).
      This is also how the 2-process CPU test drives it
      (tests/test_multihost.py; gloo CPU collectives).
    - otherwise: jax's own cluster autodetection (Cloud TPU / SLURM / OMPI);
      errors downgrade to single-process since --multihost on a single-host
      TPU box is a valid no-op."""
    import os

    import jax

    coord = os.environ.get("VINET_COORDINATOR")
    if coord:
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=int(os.environ["VINET_NUM_PROCESSES"]),
            process_id=int(os.environ["VINET_PROCESS_ID"]))
    else:
        try:
            jax.distributed.initialize()
        except Exception:
            pass  # single-process (or already initialized)
    return jax.process_index(), jax.process_count()


@contextlib.contextmanager
def enable_profiling(logdir: str):
    """jax.profiler trace around a code region (view with TensorBoard)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
