"""Test configuration: force an 8-device virtual CPU mesh for JAX tests.

The axon sitecustomize registers the TPU PJRT plugin at interpreter start
(before conftest can set env vars), so we override via jax.config after
import — backends initialize lazily, so this still wins as long as no
jax.devices() call has happened yet. Benchmarks (bench.py) run under the
default environment, i.e. on the real chip.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
