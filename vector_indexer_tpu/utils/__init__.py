"""Utility layer (L0): heuristics, file I/O helpers, timestamps.

TPU-native re-implementation of the reference's utility layer
(/root/reference/src/utils.rs). The numeric heuristics match the reference
exactly so that index geometry (nlist, shard count, iteration budgets) is
comparable; the file helpers speak the same batched container concept but a
documented, self-describing format (see storage/).
"""

from .heuristics import (
    calculate_num_clusters,
    calculate_max_iterations,
    mini_batch_size,
    suggest_nlist,
)
from .io import (
    generate_test_vectors,
    read_vectors_from_file,
    write_vectors_to_file,
    unix_timestamp_secs,
)

__all__ = [
    "calculate_num_clusters",
    "calculate_max_iterations",
    "mini_batch_size",
    "suggest_nlist",
    "generate_test_vectors",
    "read_vectors_from_file",
    "write_vectors_to_file",
    "unix_timestamp_secs",
]
