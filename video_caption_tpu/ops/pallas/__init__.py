"""Pallas TPU kernels for the hot ops — the TPU-native equivalents of the
reference's CuPy RawKernels (core/operators/cupy_vit_pool.py,
core/operators/cupy_linear_mapper.py). Every kernel keeps the reference's
graceful-fallback contract: unsupported shapes return None and the caller
uses the fused pure-XLA path."""
