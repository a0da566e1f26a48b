"""Storage layer (L2): in-memory vector store, HBM posting-list layout,
and the on-disk shard container.

TPU-native re-design of the reference's storage
(/root/reference/src/vector_store.rs, /root/reference/src/shards.rs). The
reference streams shard files from disk per query over io_uring; here the
whole sharded index is staged into HBM at load time (mmap -> device_put) and
queries never touch the filesystem. The binary container itself keeps the
same structure (header / centroid index / aligned cluster blocks) so the
persistence semantics — selective centroid reads, id validation, corruption
-> error — carry over, with a C++ reader/writer as the native I/O path.
"""

from .vector_store import Vector, VectorStore
from .layout import PostingLayout, build_layout
from .shard_format import (
    Shard,
    ShardHeader,
    save_shard,
    read_shard_header,
    read_centroid_vectors,
    load_shard_from_disk,
    ShardFormatError,
)

__all__ = [
    "Vector",
    "VectorStore",
    "PostingLayout",
    "build_layout",
    "Shard",
    "ShardHeader",
    "save_shard",
    "read_shard_header",
    "read_centroid_vectors",
    "load_shard_from_disk",
    "ShardFormatError",
]
