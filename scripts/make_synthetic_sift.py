"""Generate a SIFT1M-shaped dataset in the fvecs/ivecs protocol.

The reference's acceptance benchmark consumes SIFT1M (.fvecs base/query +
.ivecs ground truth; /root/reference/bench/faiss_bench_official/
bench_all_ivf.py:88-143, Readme.md:63-114). This environment has no network
egress, so this script synthesizes data with SIFT1M's shape and value
profile — 128-d descriptors, non-negative integer-valued components in
[0, ~220], heavy cluster structure — and writes the exact same file formats,
including a ground-truth file computed on the FULL corpus so that slicing
with --n at bench time exercises the harness's GT bounds-check + recompute
rule (bench_all_ivf.py:240-270).

Usage:
    python scripts/make_synthetic_sift.py --out /tmp/sift1m_syn \
        --n 1100000 --nq 10000 --k 100
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def write_fvecs(path: str, arr: np.ndarray) -> None:
    n, d = arr.shape
    out = np.empty((n, 1 + d), np.int32)
    out[:, 0] = d
    out[:, 1:] = arr.astype(np.float32).view(np.int32)
    out.tofile(path)


def write_ivecs(path: str, arr: np.ndarray) -> None:
    n, d = arr.shape
    out = np.empty((n, 1 + d), np.int32)
    out[:, 0] = d
    out[:, 1:] = arr.astype(np.int32)
    out.tofile(path)


def synth_sift_like(n: int, d: int, rng: np.random.Generator,
                    centers: np.ndarray, spread: float) -> np.ndarray:
    """Cluster-mixture descriptors: integer-valued, non-negative, clipped —
    matching SIFT's value profile (uint8-quantized gradient histograms)."""
    out = np.empty((n, d), np.float32)
    block = 200_000
    k = centers.shape[0]
    for s in range(0, n, block):
        e = min(n, s + block)
        which = rng.integers(0, k, e - s)
        x = centers[which] + rng.normal(0, spread, (e - s, d))
        np.clip(x, 0, 255, out=x)
        out[s:e] = np.rint(x)
    return out


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", default="/tmp/sift1m_syn")
    p.add_argument("--n", type=int, default=1_100_000)
    p.add_argument("--nq", type=int, default=10_000)
    p.add_argument("--d", type=int, default=128)
    p.add_argument("--k", type=int, default=100)
    p.add_argument("--clusters", type=int, default=4096)
    p.add_argument(
        "--spread", type=float, default=30.0,
        help="within-cluster noise sigma; ~30 gives SIFT-like overlap "
        "(recall@10 needs nprobe >= 8-16), lower values separate clusters",
    )
    p.add_argument("--seed", type=int, default=42)
    args = p.parse_args()

    os.makedirs(args.out, exist_ok=True)
    rng = np.random.default_rng(args.seed)
    # SIFT components are small non-negative ints with a long tail; a gamma
    # center profile plus per-point noise reproduces that and the cluster
    # structure real descriptors have.
    centers = rng.gamma(1.4, 22.0, (args.clusters, args.d)).astype(np.float32)
    xb = synth_sift_like(args.n, args.d, rng, centers, spread=args.spread)
    xq = synth_sift_like(args.nq, args.d, rng, centers, spread=args.spread)

    write_fvecs(os.path.join(args.out, "base.fvecs"), xb)
    write_fvecs(os.path.join(args.out, "query.fvecs"), xq)
    print(f"wrote base {xb.shape} / query {xq.shape} to {args.out}")

    # Exact GT on the FULL corpus (on-device brute force).
    from vector_indexer_tpu.ops import brute_force_topk

    gt = np.empty((args.nq, args.k), np.int32)
    qblock = 2048
    for s in range(0, args.nq, qblock):
        e = min(args.nq, s + qblock)
        _, I = brute_force_topk(xq[s:e], xb, args.k)
        gt[s:e] = np.asarray(I)
        print(f"gt {e}/{args.nq}")
    write_ivecs(os.path.join(args.out, "gt.ivecs"), gt)
    print("wrote gt", gt.shape)


if __name__ == "__main__":
    main()
