"""Test harness: force an 8-device virtual CPU mesh before JAX initializes.

All unit tests run on CPU (fast, deterministic, no TPU needed); sharding tests
use the 8 virtual devices.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # override axon/tpu: unit tests are CPU-only
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# The env var alone is too late when sitecustomize already pulled jax in at
# interpreter start (axon TPU claim); force the platform at config level too.
try:
    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass
jax.config.update("jax_default_matmul_precision", "highest")
