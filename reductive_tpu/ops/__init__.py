"""Pallas TPU kernels for the hot paths.

* :mod:`~reductive_tpu.ops.assign` — fused distance + argmin encode kernel
  (the serving hot loop and the k-means assign step).
"""

from .assign import assign_nearest, pq_encode

__all__ = ["pq_encode", "assign_nearest"]
