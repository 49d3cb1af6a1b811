"""xorfilter_spark — a PySpark-native approximate-membership / sketch engine.

Re-expresses the capabilities of the xorfilter reference crate
(/root/reference) as Spark DataFrame operators: xor8 / binary-fuse filter
banks built by hash-prefix sharding + vectorized Arrow kernels, probed via
broadcast lookup, plus a mergeable sketch suite (HLL, Bloom, count-min,
t-digest, KLL) and web-text pipeline operators.
"""

__version__ = "0.1.0"
