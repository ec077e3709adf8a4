"""Test configuration: force an 8-virtual-device CPU JAX platform.

Distributed-without-cluster testing (SURVEY.md §4): pjit/mesh sharding,
EMA-under-DP and sliding-window batch sharding are exercised on a
simulated 8-device CPU mesh, the JAX-idiomatic substitute for the fake
process-group backends the reference never had.
"""

import os
import sys
from pathlib import Path

# Must be set before jax is imported anywhere.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
