"""Test harness config: force CPU with 8 virtual devices BEFORE jax imports.

This mirrors how the reference exercises multi-node behaviour without a
cluster — Spark local[4] threads stand in for executors
(reference: src/main/scala/skc/test/LocalTestKmerCounter.scala:62); here an
8-device virtual CPU mesh stands in for a TPU pod slice.
"""

import os

# The harness presets JAX_PLATFORMS=axon (real TPU via tunnel); tests must
# override it unconditionally or every tiny op crosses the network.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
