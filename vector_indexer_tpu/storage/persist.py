"""Index persistence: metadata file + shard files -> load-or-build.

Two-artifact layout, parity with the reference
(/root/reference/src/ivf_index.rs:274-316 for index.bin;
/root/reference/src/shards.rs for shard_{id}.bin):

  index_dir/index.bin   — centroid table, centroid->shard map, geometry
  shards_dir/shard_N.bin — posting lists (vectors + ids + timestamps)

Resume = load: metadata is read, every shard file is parsed, and the whole
posting set is re-staged into device HBM (the layout the queries run on).
Failure semantics match the reference's graceful degradation
(ivf_index.rs:254, integration_tests.rs:489-533): a missing or corrupt shard
file is logged and skipped — its clusters simply drop out of the searchable
set; search never crashes.
"""

from __future__ import annotations

import logging
import os
import struct
import zlib
from pathlib import Path

import numpy as np

from .shard_format import (
    ClusterData,
    Shard,
    ShardFormatError,
    load_shard_from_disk,
    save_shard,
    shard_path,
)
from ..utils.tracing import trace

log = logging.getLogger("vector_indexer_tpu")

INDEX_MAGIC = 0x56495849  # 'VIXI'
INDEX_VERSION = 1
_IDX_HEADER = struct.Struct("<IIIIIIQII")  # 40 bytes incl. crc+pad


def index_path(index_dir) -> Path:
    return Path(index_dir) / "index.bin"


def save_index(index, index_dir, shards_dir=None) -> None:
    """Write index.bin (and shard files when shards_dir is given)."""
    os.makedirs(index_dir, exist_ok=True)
    kc = index.num_clusters
    dim = index.dimension
    n_total = index.layout.n if index.layout is not None else 0

    metric_id = {"l2": 0, "ip": 1, "cosine": 2}[getattr(index, "metric", "l2")]
    body = _IDX_HEADER.pack(
        INDEX_MAGIC,
        INDEX_VERSION,
        dim,
        kc,
        index.num_shards,
        metric_id,
        n_total,
        0,
        0,
    )
    crc = zlib.crc32(body[:32])
    # Trailing u32 carries the spill (multi-assignment) count; 0 for
    # reference-parity single-assignment indexes (backward compatible).
    header = body[:32] + struct.pack("<II", crc, getattr(index, "spill", 0))

    with open(index_path(index_dir), "wb") as f:
        f.write(header)
        f.write(np.ascontiguousarray(index.centroids, np.float32).tobytes())
        f.write(np.ascontiguousarray(index.centroids_to_shard, np.int32).tobytes())

    if shards_dir is not None:
        save_shards(index, shards_dir)


def save_shards(index, shards_dir) -> None:
    """Materialize per-shard files from the HBM layout.

    Payload rows come from the index's host mirror when available (fit keeps
    the internal-id-ordered corpus on host), avoiding a full-table
    device->host fetch (~0.5 GB at 1M)."""
    lay = index.layout
    if lay is None:
        raise RuntimeError("index has no posting layout to persist")
    host = getattr(index, "_host_data", None)
    vectors = None
    if host is None or host.shape[0] < lay.n:
        vectors = np.asarray(lay.vectors)[: lay.rows_used]
    starts = np.asarray(lay.offsets)[:-1]
    lengths = np.asarray(lay.lengths)
    perm = lay.perm

    for sid in range(index.num_shards):
        cids = np.flatnonzero(index.centroids_to_shard == sid)
        clusters = []
        for cid in cids:
            s, m = int(starts[cid]), int(lengths[cid])
            rows = slice(s, s + m)
            internal = perm[rows]
            clusters.append(
                ClusterData(
                    centroid_id=int(cid),
                    centroid=index.centroids[cid],
                    internal_ids=internal.astype(np.uint64),
                    external_ids=index.external_ids[internal],
                    timestamps=index.timestamps[internal],
                    vectors=host[internal] if vectors is None
                    else vectors[rows],
                )
            )
        shard = Shard(id=sid, dimension=index.dimension, clusters=clusters)
        try:
            save_shard(shard, shards_dir)
        except OSError as e:  # log-and-continue (ivf_index.rs:167-171)
            log.error("failed to write shard %d: %s", sid, e)
    log.info("%d shards written to %s", index.num_shards, shards_dir)


def load_index(
    index_dir,
    shards_dir=None,
    resident: str = "device",
    offload_rerank: str = "host",
):
    """Read index.bin; if shards_dir given, re-stage posting lists.

    ``resident``: 'device' (default) stages the layout into HBM; 'host'
    keeps it in host RAM and serves via per-batch probed-cell staging
    (index/staged.py) — the unbounded-corpus mode, which never performs
    the corpus-sized h2d transfer at load time; 'offload' quantizes the
    compact int8 stream table on the host and uploads only it (~1/16 of
    the f32 residency) — full-throughput device serving for corpora whose
    f32 table exceeds HBM (IvfIndex.offload_from_host).

    ``offload_rerank`` (resident='offload' only): 'host' (exact re-rank
    from the host mirror), 'device' (two-layer int8 corrected re-rank on
    device, ops/correction.py), or 'none' (raw quantized ranking)."""
    if resident not in ("device", "host", "offload"):
        raise ValueError("resident must be 'device', 'host', or 'offload'")
    from ..index.ivf import IvfIndex
    from .layout import PostingLayout

    p = index_path(index_dir)
    if not os.path.exists(p):
        raise FileNotFoundError(f"index file not found: {p}")
    with open(p, "rb") as f:
        buf = f.read()
    if len(buf) < 40:
        raise ShardFormatError(f"{p}: truncated index header")
    magic, version, dim, kc, num_shards, metric_id, n_total, crc, spill = (
        _IDX_HEADER.unpack_from(buf, 0)
    )
    if magic != INDEX_MAGIC:
        raise ShardFormatError(f"{p}: bad index magic")
    if zlib.crc32(buf[:32]) != crc:
        raise ShardFormatError(f"{p}: index header CRC mismatch")
    if version != INDEX_VERSION:
        raise ShardFormatError(f"{p}: unsupported index version {version}")

    off = 40
    cent = np.frombuffer(buf, "<f4", count=kc * dim, offset=off).reshape(kc, dim)
    off += 4 * kc * dim
    c2s = np.frombuffer(buf, "<i4", count=kc, offset=off)

    idx = IvfIndex(dim)
    idx.centroids = cent.copy()
    idx.centroids_to_shard = c2s.copy()
    idx.num_shards = num_shards
    idx.metric = {0: "l2", 1: "ip", 2: "cosine"}.get(metric_id, "l2")
    idx.spill = int(spill)

    if shards_dir is not None:
        _stage_shards(idx, shards_dir, n_total, device_put=resident == "device")
        idx.host_resident = resident == "host"
        if resident == "offload":
            idx.offload_from_host(rerank=offload_rerank)
    return idx


def _stage_shards(idx, shards_dir, n_total: int, device_put: bool = True) -> None:
    """Parse all shard files and rebuild the HBM posting layout.

    Missing/corrupt shards are skipped with a warning (partial-result
    semantics); their clusters keep zero-length posting lists.
    """
    from .layout import ALIGN, _finalize

    kc = idx.num_clusters
    dim = idx.dimension
    clusters: dict[int, ClusterData] = {}
    with trace("load.stage_shards", shards=idx.num_shards):
        for sid in range(idx.num_shards):
            path = shard_path(shards_dir, sid)
            try:
                shard = load_shard_from_disk(path)
                if shard.id != sid:
                    raise ShardFormatError(f"{path}: shard id mismatch")
            except (ShardFormatError, OSError) as e:
                log.warning("skipping shard %d: %s", sid, e)
                continue
            for cl in shard.clusters:
                clusters[cl.centroid_id] = cl

    # Cluster placement identical to build: grouped by shard (stable),
    # run starts ALIGN-aligned.
    cluster_order = np.argsort(idx.centroids_to_shard, kind="stable")

    lengths = np.zeros(kc, np.int64)
    vec_parts, perm_parts = [], []
    starts = np.zeros(kc, np.int64)
    row = 0
    for cid in cluster_order:
        cl = clusters.get(int(cid))
        starts[cid] = row
        if cl is None:
            continue
        m = cl.vectors.shape[0]
        lengths[cid] = m
        vec_parts.append(cl.vectors)
        perm_parts.append(cl.internal_ids.astype(np.int64))
        row += -(-m // ALIGN) * ALIGN

    if vec_parts:
        allvecs = np.concatenate(vec_parts, axis=0)
        perm_real = np.concatenate(perm_parts)
    else:
        allvecs = np.zeros((0, dim), np.float32)
        perm_real = np.zeros(0, np.int64)

    idx.layout = _finalize(
        allvecs, perm_real, starts, lengths, kc,
        device_put=device_put,
        n_real=n_total if n_total else None,
    )

    # Record columns indexed by internal id; internal ids are dense 0..n_total.
    size = max(n_total, int(perm_real.max()) + 1 if len(perm_real) else 0)
    ext = np.zeros(size, np.uint64)
    ts = np.zeros(size, np.uint64)
    host = np.zeros((size, dim), np.float32)
    for cid, cl in clusters.items():
        ii = cl.internal_ids.astype(np.int64)
        ext[ii] = cl.external_ids
        ts[ii] = cl.timestamps
        host[ii] = cl.vectors
    idx.external_ids = ext
    idx.timestamps = ts
    # Host mirror so a loaded index can re-save without a device fetch.
    idx._host_data = host
