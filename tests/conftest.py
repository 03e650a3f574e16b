"""Test config: force CPU backend with 8 virtual devices.

Mirrors the SURVEY.md §4 translation: Pallas kernels run in interpret mode on
CPU for CI; multi-device sharding tests use the 8-device virtual mesh. Real
TPU runs happen via bench.py, never in unit tests.

Note: the environment's sitecustomize pins ``jax_platforms`` to the TPU
plugin via jax.config (env vars alone don't win), so we update the config
explicitly. XLA_FLAGS must be set before the CPU client is instantiated,
which is lazy, so doing it here is early enough.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["CKT_INTERPRET"] = "1"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
