"""Shared JAX configuration for the device kernels.

Compiles of the big unrolled codec graphs take 30-60s on the axon remote
compiler; the persistent compilation cache makes them one-time per
machine. Imported for side effects by every module that jits.
"""

from __future__ import annotations

import os

import jax

_CACHE_DIR = os.environ.get(
    "TPU_DEFLATE_JAX_CACHE", os.path.expanduser("~/.cache/tpu_deflate_jax")
)

try:
    os.makedirs(_CACHE_DIR, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
except Exception:  # pragma: no cover - cache is best-effort
    pass
