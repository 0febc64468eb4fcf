"""Root pytest config: force a virtual 8-device CPU mesh before JAX backends init.

The reference (samyak0210/ViNet) has no test suite at all (SURVEY.md §4); this
framework tests everything on a fake 8-device CPU backend so sharded code paths
are exercised without TPU hardware.

Note: this container's sitecustomize imports jax at interpreter startup and the
shell env pins JAX_PLATFORMS=axon (TPU tunnel), so plain env-var overrides are
too late / ignored. We use jax.config.update, which takes effect as long as no
backend has been initialized yet.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"  # for any late readers
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_num_cpu_devices", 8)
except Exception:
    pass  # older jax: the XLA_FLAGS path above covers it

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
