"""Test harness config: force CPU with 8 virtual devices.

This mirrors how the reference exercises multi-node behaviour without a
cluster — Spark local[4] threads stand in for executors
(reference: src/main/scala/skc/test/LocalTestKmerCounter.scala:62); here an
8-device virtual CPU mesh stands in for a TPU pod slice.

The harness presets JAX_PLATFORMS=axon (real TPU via a network tunnel) and
its sitecustomize imports jax at interpreter start, so the env var is
already consumed; jax.config.update still switches the default platform,
and XLA_FLAGS is read lazily at CPU-backend init so the virtual device
count takes effect as long as it is set before the first CPU computation.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
