"""Benchmark harness (L6): official-Faiss-methodology IVF benchmarks.

Re-implementation of the reference harness
(/root/reference/bench/faiss_bench_official/bench_all_ivf.py) against the
TPU-native backend: synthetic or local datasets (.npy / .fvecs / .ivecs with
ground-truth validation and brute-force recompute), repeat-until-min-duration
timing, R@1/10/100 with the true-NN-in-top-rank definition, nprobe sweeps,
JSON + Markdown reports.
"""
