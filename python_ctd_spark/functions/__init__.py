"""Scalar/kernel function library: pure-NumPy signal kernels (scipy-free)
and TEOS-10 seawater functions exposed as vectorized pandas UDFs."""
