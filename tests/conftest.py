"""Test harness config: force CPU with 8 virtual devices (before jax import).

This is the TPU-native analogue of multi-node simulation: sharding tests run
on an 8-device host mesh (SURVEY.md §4).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402  (after env setup)

# The axon TPU plugin's sitecustomize overwrites jax_platforms at interpreter
# start (env JAX_PLATFORMS is ignored); force CPU via the config API so tests
# never touch the (single-client, tunnel-fragile) TPU.
jax.config.update("jax_platforms", "cpu")

# The CPU/TPU backends default to low-precision (bf16-ish) fp32 matmuls;
# oracle tests need exact fp32 (the framework exposes the same switch via
# TPU.PARITY_FP32 — see pevit_tpu/train/trainer.py).
jax.config.update("jax_default_matmul_precision", "highest")
