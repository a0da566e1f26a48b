"""Test configuration: force an 8-device virtual CPU mesh.

Real multi-chip hardware is unavailable in CI; sharded-search tests run on
XLA's host-platform device emulation. This must be set before JAX is
imported anywhere.
"""

import os

# Force the local virtual-device CPU backend. NOTE: the outer environment's
# sitecustomize registers the axon (remote TPU) PJRT plugin and overrides
# JAX_PLATFORMS env settings, so the env var is NOT sufficient here — only
# jax.config.update('jax_platforms', ...) reliably wins.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent compilation cache: the k-means while-loop programs are expensive
# to compile; cache them across test runs.
jax.config.update("jax_compilation_cache_dir", "/tmp/vix_jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)


def make_gaussian_clusters(
    n_clusters: int,
    points_per_cluster: int,
    dim: int,
    spread: float = 0.1,
    separation: float = 10.0,
    seed: int = 42,
):
    """Well-separated Gaussian blobs with ground-truth labels.

    Mirrors the reference's main quality fixture
    (/root/reference/tests/test_utils/mod.rs:34-66).
    """
    g = np.random.default_rng(seed)
    centers = g.normal(0.0, separation, size=(n_clusters, dim)).astype(np.float32)
    pts = (
        centers[:, None, :]
        + g.normal(0.0, spread, size=(n_clusters, points_per_cluster, dim))
    ).astype(np.float32)
    labels = np.repeat(np.arange(n_clusters), points_per_cluster)
    return pts.reshape(-1, dim), labels, centers
