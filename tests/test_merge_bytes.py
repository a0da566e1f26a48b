"""Merge-economics tests: collective BYTE COUNTS of the hierarchical
ICI-then-DCN multi-host merge, asserted from the traced jaxpr.

Real ICI/DCN hardware is unavailable here, but the merge's wire cost is
fully determined at trace time: every ``all_gather`` the program issues
names its mesh axis and carries a static payload shape. These tests walk
the jaxpr and assert the claim multihost.py makes — stage 2 moves ONLY
each host's fused top-k over the slow (DCN) hop, so a mesh of H hosts x
S chips sends S-fold fewer bytes across hosts than a flat H*S-device
gather would. If the merge ever regresses to flat H*S gathering (one
gather over both axes, or a host-axis gather carrying S-scaled payload),
these tests fail.

Reference analog: the shard fan-out merge (/root/reference/src/
ivf_index.rs:228-249) has no wire-topology awareness; SURVEY §5.8.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conftest import make_gaussian_clusters
from vector_indexer_tpu.index import IvfIndex
from vector_indexer_tpu.parallel import (
    MultiHostSearcher,
    ShardedSearcher,
    make_mesh_hosts,
    make_shard_mesh,
)
from vector_indexer_tpu.parallel.multihost import _multihost_search_program
from vector_indexer_tpu.parallel.sharded import _sharded_search_program
from vector_indexer_tpu.storage import VectorStore


def _sub_jaxprs(params):
    """Yield every jaxpr nested in an eqn's params (pjit/shard_map carry
    'jaxpr'; control flow carries 'branches'/'call_jaxpr'/'cond_jaxpr'...)."""
    for v in params.values():
        vs = v if isinstance(v, (tuple, list)) else (v,)
        for x in vs:
            if hasattr(x, "jaxpr"):  # ClosedJaxpr
                yield x.jaxpr
            elif hasattr(x, "eqns"):  # raw Jaxpr
                yield x


def collect_all_gathers(jaxpr):
    """All all_gather eqns in a jaxpr, recursively: a list of
    (axis_names: tuple, axis_size: int, in_bytes: int)."""
    found = []
    for eqn in jaxpr.eqns:
        if eqn.primitive.name == "all_gather":
            ax = eqn.params["axis_name"]
            ax = ax if isinstance(ax, tuple) else (ax,)
            aval = eqn.invars[0].aval
            found.append(
                (ax, int(eqn.params["axis_size"]),
                 int(np.prod(aval.shape)) * aval.dtype.itemsize)
            )
        for sub in _sub_jaxprs(eqn.params):
            found.extend(collect_all_gathers(sub))
    return found


@pytest.fixture(scope="module")
def built_index():
    data, _, _ = make_gaussian_clusters(10, 100, 24, spread=0.4,
                                        separation=8.0)
    store = VectorStore(
        external_ids=np.arange(len(data), dtype=np.uint64), vectors=data
    )
    return IvfIndex.fit(store, seed=42)


def _trace_searcher_gathers(searcher, program, mesh_axes, nq, k, n_probe):
    """make_jaxpr over the (jitted) mesh program with the searcher's own
    staged tables, mirroring search_batch's dense branch."""
    idx = searcher.index
    nq_pad = -(-nq // 8) * 8
    qp = jnp.zeros((nq_pad, idx.dimension), jnp.float32)
    probe_bound = min(max(n_probe, 1), searcher.centroids.shape[0])
    fn = functools.partial(
        program, searcher.mesh, *mesh_axes,
        k=k, probe_bound=probe_bound, fused_plan=None,
        interpret=True, metric="l2",
    )
    jaxpr = jax.make_jaxpr(fn)(
        qp, searcher.centroids, searcher.c_sq, searcher.local_vecs,
        searcher.local_norms, searcher.local_cent, searcher.local_csq,
        searcher.local_run_starts_b, jnp.int32(n_probe),
    )
    return collect_all_gathers(jaxpr.jaxpr), nq_pad


def test_hier_merge_byte_counts(built_index):
    """The hierarchical merge issues exactly 3 gathers per stage (D, row,
    owner), each of per-device payload nq*k elements — the host-axis
    (DCN) payload is independent of S."""
    H, S, nq, k, n_probe = 2, 4, 16, 5, 4
    mh = MultiHostSearcher(built_index, make_mesh_hosts(H, S),
                           method="dense")
    gathers, nq_pad = _trace_searcher_gathers(
        mh, _multihost_search_program, (mh.host_axis, mh.shard_axis),
        nq, k, n_probe,
    )
    unit = nq_pad * k * 4  # every payload is (nq, k) f32/i32

    by_axis = {}
    for ax, size, in_bytes in gathers:
        by_axis.setdefault(ax, []).append((size, in_bytes))

    # No gather spans both axes (that would be the flat H*S merge).
    assert (mh.host_axis, mh.shard_axis) not in by_axis
    assert (mh.shard_axis, mh.host_axis) not in by_axis

    # Stage 1 (ICI): 3 gathers over shards, each (nq, k), axis_size S.
    ici = by_axis[(mh.shard_axis,)]
    assert len(ici) == 3
    assert all(size == S and b == unit for size, b in ici)

    # Stage 2 (DCN): 3 gathers over hosts, each STILL (nq, k) — the
    # fused per-host list, NOT the S-fold concatenation.
    dcn = by_axis[(mh.host_axis,)]
    assert len(dcn) == 3
    assert all(size == H and b == unit for size, b in dcn)

    # Nothing else crosses the wire in the merge.
    assert len(gathers) == 6


def test_hier_merge_dcn_bytes_s_fold_below_flat(built_index):
    """Cross-host (DCN) receive bytes: hierarchical = unit*3*(H-1);
    a flat 8-device merge on the same (H, S) physical layout receives
    unit*3*(H-1)*S from remote hosts — exactly S-fold more."""
    H, S, nq, k, n_probe = 2, 4, 16, 5, 4
    idx = built_index
    mh = MultiHostSearcher(idx, make_mesh_hosts(H, S), method="dense")
    hier, nq_pad = _trace_searcher_gathers(
        mh, _multihost_search_program, (mh.host_axis, mh.shard_axis),
        nq, k, n_probe,
    )
    # DCN receive bytes/device = payload from each of the (H-1) remote
    # hosts' representatives.
    hier_dcn = sum(
        b * (H - 1) for ax, size, b in hier if ax == (mh.host_axis,)
    )

    flat_s = ShardedSearcher(idx, make_shard_mesh(H * S), method="dense")
    flat, nq_pad2 = _trace_searcher_gathers(
        flat_s, _sharded_search_program, (flat_s.axis,), nq, k, n_probe,
    )
    assert nq_pad2 == nq_pad
    # Flat gather over all H*S devices: with hosts of S chips, (H-1)*S of
    # the remote participants sit across the DCN hop.
    flat_dcn = sum(
        b * (H - 1) * S for ax, size, b in flat
        if ax == (flat_s.axis,) and size == H * S
    )
    assert hier_dcn > 0 and flat_dcn > 0
    assert flat_dcn == S * hier_dcn
