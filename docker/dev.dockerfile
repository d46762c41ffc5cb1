# Development image: full test suite on a virtual CPU mesh.
#
# Counterpart of the reference's docker/dev.dockerfile (CUDA + bazel
# toolchain); this build is pure-Python + JAX, so the dev image is a
# plain Python base with the [dev] extras. TPU wheels are installed in
# the release image instead (libtpu only exists on TPU VMs).
#
#   docker build -f docker/dev.dockerfile -t envpool-tpu-dev .
#   docker run --rm envpool-tpu-dev make test

FROM python:3.12-slim-bookworm

ENV DEBIAN_FRONTEND=noninteractive \
    PIP_NO_CACHE_DIR=1 \
    # tests run on a virtual 8-device CPU mesh (tests/conftest.py
    # re-asserts these, but having them in the image makes ad-hoc
    # `docker run ... python` sessions behave the same way)
    JAX_PLATFORMS=cpu \
    XLA_FLAGS=--xla_force_host_platform_device_count=8

# g++/make for the optional native tier (envpool_tpu/native/*.cpp is
# compiled on demand via ctypes; the wheel works without it)
RUN apt-get update \
    && apt-get install -y --no-install-recommends g++ make git \
    && apt-get clean \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /app
COPY . .

RUN pip install -e ".[dev]"

CMD ["make", "test"]
