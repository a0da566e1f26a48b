"""Dataset loaders: synthetic, .npy, .fvecs/.ivecs — with GT validation.

Parity with the reference loaders (bench_all_ivf.py:55-275): seeded
standard-normal synthetic data; fvecs/ivecs little-endian (dim:i32 + payload)
records; npy triplets; ground-truth bounds checking with brute-force
recomputation when slicing invalidates the provided GT (bench_all_ivf.py:
240-270) — using our own on-device exact oracle instead of faiss FlatL2.
"""

from __future__ import annotations

import logging
from typing import Optional, Tuple

import numpy as np

log = logging.getLogger("vector_indexer_tpu")


def synthetic(
    n: int, d: int, nq: int, seed: int = 42
) -> Tuple[np.ndarray, np.ndarray]:
    """Seeded standard-normal corpus + queries (bench_all_ivf.py:55-80)."""
    rng = np.random.default_rng(seed)
    xb = rng.standard_normal((n, d), dtype=np.float32)
    xq = rng.standard_normal((nq, d), dtype=np.float32)
    return xb, xq


def clustered(
    n: int, d: int, nq: int, seed: int = 42, ncent: Optional[int] = None,
    spread: float = 4.0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Seeded clustered (SIFT-shaped) corpus + queries: ``ncent`` Gaussian
    centers at scale ``spread``, unit-variance points and queries around
    them — the realistic IVF regime (isotropic noise needs nprobe in the
    hundreds and demonstrates nothing about selectivity). ONE generator
    shared by the headline bench's stage 2, the capacity artifacts, and
    the kernel A/B scripts so they all measure the same distribution.
    Filled in 500k-row chunks to bound the peak RNG scratch at 10M+."""
    g = np.random.default_rng(seed)
    if ncent is None:
        ncent = max(64, min(1024, n // 1000))
    centers = g.normal(0, spread, size=(ncent, d)).astype(np.float32)
    xb = np.empty((n, d), np.float32)
    step = 500_000
    for s in range(0, n, step):
        e = min(s + step, n)
        xb[s:e] = (
            centers[g.integers(0, ncent, e - s)]
            + g.normal(0, 1.0, (e - s, d))
        ).astype(np.float32)
    xq = (
        centers[g.integers(0, ncent, nq)] + g.normal(0, 1.0, (nq, d))
    ).astype(np.float32)
    return xb, xq


def read_fvecs(path: str, count: Optional[int] = None) -> np.ndarray:
    """fvecs: per record [dim:int32 little-endian][dim float32s]."""
    raw = np.fromfile(path, dtype=np.uint8)
    if raw.size < 4:
        return np.zeros((0, 0), np.float32)
    dim = int(raw[:4].view(np.int32)[0])
    record = 4 + 4 * dim
    n = raw.size // record
    if count is not None:
        n = min(n, count)
    mat = raw[: n * record].view(np.int32).reshape(n, 1 + dim)
    dims = mat[:, 0]
    if not (dims == dim).all():
        raise ValueError(f"{path}: inconsistent fvecs dimensions")
    return mat[:, 1:].view(np.float32).copy()


def read_ivecs(path: str, count: Optional[int] = None) -> np.ndarray:
    """ivecs: same framing with int32 payload (used for ground truth)."""
    raw = np.fromfile(path, dtype=np.uint8)
    if raw.size < 4:
        return np.zeros((0, 0), np.int32)
    dim = int(raw[:4].view(np.int32)[0])
    record = 4 + 4 * dim
    n = raw.size // record
    if count is not None:
        n = min(n, count)
    mat = raw[: n * record].view(np.int32).reshape(n, 1 + dim)
    dims = mat[:, 0]
    if not (dims == dim).all():
        raise ValueError(f"{path}: inconsistent ivecs dimensions")
    return mat[:, 1:].copy()


def compute_ground_truth(
    xb: np.ndarray, xq: np.ndarray, k: int, metric: str = "l2"
) -> np.ndarray:
    """Exact k-NN ids via the on-device brute-force oracle."""
    from vector_indexer_tpu.ops import brute_force_topk

    if metric == "cosine":
        xb = xb / np.maximum(np.linalg.norm(xb, axis=1, keepdims=True), 1e-12)
        xq = xq / np.maximum(np.linalg.norm(xq, axis=1, keepdims=True), 1e-12)
        metric = "ip"
    _, gt = brute_force_topk(xq, xb, k, metric=metric)
    return np.asarray(gt)


def load_dataset(
    xb_path: str,
    xq_path: str,
    gt_path: Optional[str] = None,
    n: Optional[int] = None,
    nq: Optional[int] = None,
    k: int = 100,
    metric: str = "l2",
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Load (xb, xq, gt), slicing to n/nq and validating the provided GT.

    If slicing makes GT ids point outside the kept corpus (or no GT is
    given), ground truth is recomputed exactly — the reference's
    bounds-check + recompute rule (bench_all_ivf.py:240-270).
    """

    def _load_x(path, count):
        if path.endswith(".npy"):
            arr = np.load(path).astype(np.float32)
            return arr[:count] if count else arr
        if path.endswith(".fvecs"):
            return read_fvecs(path, count)
        raise ValueError(f"unsupported vector file: {path}")

    xb = _load_x(xb_path, n)
    xq = _load_x(xq_path, nq)

    gt = None
    if gt_path:
        if gt_path.endswith(".npy"):
            gt = np.load(gt_path)
        elif gt_path.endswith(".ivecs"):
            gt = read_ivecs(gt_path)
        else:
            raise ValueError(f"unsupported gt file: {gt_path}")
        gt = gt[: xq.shape[0]]
        if gt.shape[0] < xq.shape[0] or (gt >= xb.shape[0]).any() or (gt < 0).any():
            log.warning(
                "ground truth invalid for sliced dataset (ids out of range); "
                "recomputing exactly"
            )
            gt = None

    if gt is None:
        gt = compute_ground_truth(xb, xq, k, metric=metric)
    return xb, xq, gt[:, :k]
