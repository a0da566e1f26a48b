"""Pallas (Mosaic) TPU kernels for the hot ops.

Device-native kernels where fusion beats what XLA emits from the high-level
program:

* ``assign``: tiled distance + running argmin for k-means assignment — the
  (points x centroids) distance matrix never touches HBM.
"""

from .assign import assign_argmin_pallas, pallas_supported

__all__ = ["assign_argmin_pallas", "pallas_supported"]
