"""Pallas TPU kernels for the hot paths.

* :mod:`~reductive_tpu.ops.assign` — fused distance + argmin encode kernel
  (the serving hot loop and the k-means assign step).
* :mod:`~reductive_tpu.ops.stats` — fused assign + per-centroid
  sums/counts kernel (the Lloyd's-iteration hot loop for large corpora).
"""

from .assign import assign_nearest, pq_encode
from .stats import pq_assign_stats

__all__ = ["pq_encode", "assign_nearest", "pq_assign_stats"]
