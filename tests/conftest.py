"""Test configuration: force an 8-virtual-device CPU JAX platform.

Distributed-without-cluster testing (SURVEY.md §4): pjit/mesh sharding,
EMA-under-DP and sliding-window batch sharding are exercised on a
simulated 8-device CPU mesh, the JAX-idiomatic substitute for the fake
process-group backends the reference never had.

Note: this image registers an experimental 'axon' TPU platform plugin
that overrides the JAX_PLATFORMS env var, so the CPU platform must be
forced through jax.config *before* any backend initialization.
"""

import os
import sys
from pathlib import Path

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# This JAX build defaults matmuls to bf16-class precision on TPU; pin
# float32 so golden-value tests are deterministic and tight.
jax.config.update("jax_default_matmul_precision", "float32")

# Persistent compilation cache: XLA compiles of the full model are slow;
# cache them across test runs.
_cache_dir = Path(__file__).resolve().parent.parent / ".jax_cache"
jax.config.update("jax_compilation_cache_dir", str(_cache_dir))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
