"""Binary shard container tests.

Ports the behavioral contract of /root/reference/tests/shards_tests.rs:
roundtrips, selective centroid reads, metadata preservation, exotic ids,
float precision, missing-file/centroid errors, corruption -> error (never a
crash), overwrite semantics.
"""

import numpy as np
import pytest

from vector_indexer_tpu.storage import (
    Shard,
    ShardFormatError,
    load_shard_from_disk,
    read_centroid_vectors,
    read_shard_header,
    save_shard,
)
from vector_indexer_tpu.storage.shard_format import ClusterData, shard_path


def _mk_cluster(cid, dim, m, seed=0, id_offset=0):
    g = np.random.default_rng(seed)
    return ClusterData(
        centroid_id=cid,
        centroid=g.normal(size=dim).astype(np.float32),
        internal_ids=np.arange(id_offset, id_offset + m, dtype=np.uint64),
        external_ids=np.arange(1000 + id_offset, 1000 + id_offset + m, dtype=np.uint64),
        timestamps=np.full(m, 77, dtype=np.uint64),
        vectors=g.normal(size=(m, dim)).astype(np.float32),
    )


def test_save_creates_file(tmp_path):
    shard = Shard(id=3, dimension=8, clusters=[_mk_cluster(0, 8, 5)])
    p = save_shard(shard, tmp_path)
    assert p.exists()
    assert p.name == "shard_3.bin"
    h = read_shard_header(p)
    assert h.shard_id == 3 and h.dimensions == 8 and h.num_centroids == 1


def test_multi_centroid_roundtrip(tmp_path):
    clusters = [_mk_cluster(i, 16, 10 + i, seed=i, id_offset=100 * i) for i in range(4)]
    shard = Shard(id=0, dimension=16, clusters=clusters)
    save_shard(shard, tmp_path)
    back = load_shard_from_disk(shard_path(tmp_path, 0))
    assert back.id == 0 and back.dimension == 16
    assert len(back.clusters) == 4
    for orig, got in zip(clusters, back.clusters):
        assert got.centroid_id == orig.centroid_id
        np.testing.assert_array_equal(got.centroid, orig.centroid)
        np.testing.assert_array_equal(got.vectors, orig.vectors)
        np.testing.assert_array_equal(got.internal_ids, orig.internal_ids)
        np.testing.assert_array_equal(got.external_ids, orig.external_ids)
        np.testing.assert_array_equal(got.timestamps, orig.timestamps)


def test_selective_centroid_read(tmp_path):
    clusters = [_mk_cluster(i, 8, 6, seed=i) for i in range(5)]
    save_shard(Shard(id=1, dimension=8, clusters=clusters), tmp_path)
    out = read_centroid_vectors(shard_path(tmp_path, 1), 1, [2, 4])
    assert set(out) == {2, 4}
    np.testing.assert_array_equal(out[2].vectors, clusters[2].vectors)


def test_empty_posting_list(tmp_path):
    shard = Shard(id=0, dimension=4, clusters=[_mk_cluster(0, 4, 0)])
    save_shard(shard, tmp_path)
    back = load_shard_from_disk(shard_path(tmp_path, 0))
    assert back.clusters[0].vectors.shape == (0, 4)


def test_odd_dim_alignment(tmp_path):
    # dim=5 -> 20-byte records need padding; roundtrip must be exact.
    shard = Shard(id=0, dimension=5, clusters=[_mk_cluster(0, 5, 9)])
    save_shard(shard, tmp_path)
    back = load_shard_from_disk(shard_path(tmp_path, 0))
    np.testing.assert_array_equal(back.clusters[0].vectors, shard.clusters[0].vectors)


def test_large_cluster_1000(tmp_path):
    shard = Shard(id=0, dimension=32, clusters=[_mk_cluster(0, 32, 1000)])
    save_shard(shard, tmp_path)
    back = load_shard_from_disk(shard_path(tmp_path, 0))
    assert back.clusters[0].vectors.shape == (1000, 32)


def test_nonsequential_and_huge_centroid_ids(tmp_path):
    ids = [7, 42, 2**64 - 1000]
    clusters = [_mk_cluster(cid, 4, 3, seed=i) for i, cid in enumerate(ids)]
    save_shard(Shard(id=9, dimension=4, clusters=clusters), tmp_path)
    out = read_centroid_vectors(shard_path(tmp_path, 9), 9, ids)
    assert set(out) == set(ids)


def test_float_precision(tmp_path):
    c = _mk_cluster(0, 8, 4)
    c.vectors = (np.arange(32, dtype=np.float32).reshape(4, 8) * 1e-6 + 1e-7)
    save_shard(Shard(id=0, dimension=8, clusters=[c]), tmp_path)
    back = load_shard_from_disk(shard_path(tmp_path, 0))
    np.testing.assert_array_equal(back.clusters[0].vectors, c.vectors)


def test_missing_shard_errors(tmp_path):
    with pytest.raises(ShardFormatError):
        load_shard_from_disk(shard_path(tmp_path, 5))


def test_missing_centroid_errors(tmp_path):
    save_shard(Shard(id=0, dimension=4, clusters=[_mk_cluster(0, 4, 2)]), tmp_path)
    with pytest.raises(ShardFormatError, match="centroid"):
        read_centroid_vectors(shard_path(tmp_path, 0), 0, [99])


def test_shard_id_mismatch_errors(tmp_path):
    save_shard(Shard(id=0, dimension=4, clusters=[_mk_cluster(0, 4, 2)]), tmp_path)
    with pytest.raises(ShardFormatError, match="mismatch"):
        read_centroid_vectors(shard_path(tmp_path, 0), 123, [0])


def test_corrupt_header_errors_not_crashes(tmp_path):
    # parity: shards_tests.rs:588-630
    save_shard(Shard(id=0, dimension=4, clusters=[_mk_cluster(0, 4, 2)]), tmp_path)
    p = shard_path(tmp_path, 0)
    raw = bytearray(p.read_bytes())
    raw[5] ^= 0xFF
    raw[20] ^= 0xAA
    p.write_bytes(bytes(raw))
    with pytest.raises(ShardFormatError):
        load_shard_from_disk(p)


def test_truncated_file_errors(tmp_path):
    save_shard(Shard(id=0, dimension=4, clusters=[_mk_cluster(0, 4, 50)]), tmp_path)
    p = shard_path(tmp_path, 0)
    raw = p.read_bytes()
    p.write_bytes(raw[: len(raw) // 2])
    with pytest.raises(ShardFormatError):
        load_shard_from_disk(p)


def test_overwrite_semantics(tmp_path):
    save_shard(Shard(id=0, dimension=4, clusters=[_mk_cluster(0, 4, 10)]), tmp_path)
    new = Shard(id=0, dimension=4, clusters=[_mk_cluster(0, 4, 2, seed=9)])
    save_shard(new, tmp_path)
    back = load_shard_from_disk(shard_path(tmp_path, 0))
    assert back.clusters[0].vectors.shape == (2, 4)


def test_concurrent_reads(tmp_path):
    # parity: shards_tests.rs:729-767 (4-thread concurrent reads)
    import concurrent.futures

    clusters = [_mk_cluster(i, 8, 20, seed=i) for i in range(4)]
    save_shard(Shard(id=0, dimension=8, clusters=clusters), tmp_path)
    p = shard_path(tmp_path, 0)

    def work(i):
        out = read_centroid_vectors(p, 0, [i])
        return np.array_equal(out[i].vectors, clusters[i].vectors)

    with concurrent.futures.ThreadPoolExecutor(4) as ex:
        assert all(ex.map(work, range(4)))


def test_corruption_fuzz_never_crashes(tmp_path, rng):
    # Any byte-level corruption must surface as ShardFormatError (or parse
    # cleanly if it misses validated fields) — never a crash or hang.
    clusters = [_mk_cluster(i, 8, 12, seed=i) for i in range(3)]
    save_shard(Shard(id=2, dimension=8, clusters=clusters), tmp_path)
    p = shard_path(tmp_path, 2)
    raw = bytearray(p.read_bytes())
    for trial in range(50):
        bad = bytearray(raw)
        for _ in range(rng.integers(1, 4)):
            pos = int(rng.integers(0, len(bad)))
            bad[pos] ^= int(rng.integers(1, 256))
        p.write_bytes(bytes(bad))
        try:
            load_shard_from_disk(p)
        except ShardFormatError:
            pass
    # Truncation fuzz.
    for trial in range(20):
        cut = int(rng.integers(0, len(raw)))
        p.write_bytes(bytes(raw[:cut]))
        try:
            load_shard_from_disk(p)
        except ShardFormatError:
            pass


def test_native_mmap_view_matches_read(tmp_path):
    """The zero-copy mmap staging path must see exactly the file bytes and
    release cleanly; loads through it must equal loads through read()."""
    from vector_indexer_tpu.storage.native import shardio

    if not shardio.available():
        pytest.skip("native shard-io library unavailable")
    shard = Shard(
        id=5, dimension=12,
        clusters=[_mk_cluster(0, 12, 9), _mk_cluster(1, 12, 4, seed=1)],
    )
    p = save_shard(shard, tmp_path)
    raw = p.read_bytes()
    with shardio.mmap_view(str(p)) as mv:
        assert bytes(mv) == raw
        assert mv.readonly
    # Whole-shard load goes through _open_buffer (mmap when available).
    got = load_shard_from_disk(p)
    assert got.num_vectors == 13
    np.testing.assert_array_equal(
        got.clusters[1].vectors, shard.clusters[1].vectors
    )
    # Empty file: mmap_open refuses (size 0) and the fallback read path
    # surfaces a format error, not a crash.
    empty = tmp_path / "shard_9.bin"
    empty.write_bytes(b"")
    with pytest.raises(ShardFormatError):
        load_shard_from_disk(empty)
