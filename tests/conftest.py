"""Test harness: run everything on a virtual 8-device CPU mesh.

The reference can only test distributed behavior under torchrun on real GPUs
(SURVEY.md §4); here multi-device tests run anywhere via XLA's host-platform
device partitioning. The environment pre-imports jax via sitecustomize with
JAX_PLATFORMS=axon (the real TPU), so we must override through jax.config
BEFORE the backend initializes, not through env vars.

Set MAGICDEC_TEST_TPU=1 to run the suite against the real chip instead.
"""

import os

import jax

if os.environ.get("MAGICDEC_TEST_TPU") != "1":
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)

jax.config.update("jax_default_matmul_precision", "highest")
