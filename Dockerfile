# Dev image: toolchain for the native shard-I/O library + test environment.
# TPU-native counterpart of the reference's dev container
# (/root/reference/Dockerfile). Tests run on a virtual 8-device CPU mesh
# (tests/conftest.py), so no TPU is needed inside the container; on a TPU VM
# pass the accelerator through (see docker-compose.bench.yml).

FROM python:3.12-slim

WORKDIR /workspace

# Build dependencies for storage/native/shardio.cpp (ctypes-loaded .so).
RUN apt-get update && apt-get install -y --no-install-recommends \
    g++ \
    make \
    && rm -rf /var/lib/apt/lists/*

# Dependency layer first for build caching.
COPY pyproject.toml ./
RUN pip install --no-cache-dir "jax[cpu]" flax optax numpy pytest

COPY . .
RUN pip install --no-cache-dir -e . && make native

# Default command (can be overridden), parity with the reference's dev image.
CMD ["bash"]
