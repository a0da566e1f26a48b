"""vector_indexer_tpu — a TPU-native vector index-and-query framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
NirajNair/vector-indexer (a Rust IVF-Flat ANN engine): two-level k-means
clustering, super-centroid-sharded inverted lists, batched exact re-ranking
and top-k — designed MXU-first (distances as tiled matmuls), with HBM-resident
posting lists instead of io_uring file streaming, and multi-chip sharded
search over a jax.sharding.Mesh instead of async file fan-out.
"""

__version__ = "0.1.0"

_API = (
    "VectorIndexer",
    "VectorIndexerConfig",
    "VectorRecord",
    "SearchRequest",
    "SearchResult",
)
_BINDINGS = ("build", "load", "suggest_nlist", "VectorIndex")

__all__ = list(_API + _BINDINGS)


def __getattr__(name):
    # Lazy so that `import vector_indexer_tpu.ops` doesn't pay for (or
    # require) the full API stack.
    if name in _API:
        from . import api

        return getattr(api, name)
    if name in _BINDINGS:
        from . import bindings

        return getattr(bindings, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
