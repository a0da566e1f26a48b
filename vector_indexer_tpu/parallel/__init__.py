"""Parallel layer: multi-chip sharded search and data-parallel training.

TPU-native replacement for the reference's "distribution" story (§2c of the
survey): the reference fans out async file reads over probed shards
(/root/reference/src/ivf_index.rs:228-249) within one host; here shards are
HBM partitions across chips on a ``jax.sharding.Mesh`` axis ``'shards'``, the
per-shard search runs under ``shard_map``, and the global top-k merge rides
ICI via ``all_gather`` — the degenerate 1-device mesh reproduces the
single-chip path exactly.
"""

from .mesh import make_shard_mesh
from .sharded import ShardedSearcher
from .mesh2d import Sharded2DSearcher, make_mesh_2d
from .multihost import MultiHostSearcher, make_mesh_hosts
from .dp_kmeans import run_kmeans_lloyd_dp

__all__ = [
    "make_shard_mesh",
    "ShardedSearcher",
    "Sharded2DSearcher",
    "make_mesh_2d",
    "MultiHostSearcher",
    "make_mesh_hosts",
    "run_kmeans_lloyd_dp",
]
