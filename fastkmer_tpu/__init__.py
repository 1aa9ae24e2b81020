"""fastkmer_tpu — TPU-native exact k-mer counting engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the Spark
reference (maruscia/fastkmer, see SURVEY.md): KMC2-style minimizer-signature
binning and exact canonical k-mer counting, distributed over a TPU device
mesh with shard_map + all-to-all instead of a Spark shuffle.
"""

__version__ = "0.1.0"
