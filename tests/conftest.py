"""Test harness: run everything on a virtual 8-device CPU mesh.

The reference can only test distributed behavior under torchrun on real GPUs
(SURVEY.md §4); here multi-device tests run anywhere via XLA's host-platform
device partitioning. Env vars must be set before jax initializes.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")
