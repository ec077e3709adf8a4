"""Backend/runtime knobs shared by the CLI entry points.

Two environment realities this repo runs under (see CLAUDE.md):

* An out-of-tree TPU platform plugin may register itself at import time
  and OVERRIDE the ``JAX_PLATFORMS`` environment variable — ``jax.config``
  must be updated explicitly BEFORE the first backend init for the
  variable to take effect.  :func:`configure_backend` re-asserts the
  env var through ``jax.config`` so ``JAX_PLATFORMS=cpu python -m …``
  behaves the way every JAX user expects.
* TPU compiles may go through a slow remote-compile service, so every
  entry point enables the persistent compilation cache.
"""

from __future__ import annotations

import os
import pathlib

_CACHE_DIR = str(pathlib.Path(__file__).resolve().parents[2] / ".jax_cache")


def configure_backend() -> None:
    """Honor ``JAX_PLATFORMS`` and enable the persistent compile cache.

    Must run before the first backend use (``jax.devices()``, any op).
    Safe to call more than once; a no-op after backend init unless the
    requested platform differs (then jax itself raises).
    """
    import jax

    platforms = os.environ.get("JAX_PLATFORMS", "").strip()
    if platforms:
        jax.config.update("jax_platforms", platforms)
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("MIVP_COMPILE_CACHE", _CACHE_DIR))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
