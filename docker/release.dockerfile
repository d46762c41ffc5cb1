# Release image: TPU-VM runtime with the package installed.
#
# Counterpart of the reference's docker/release.dockerfile (manylinux
# wheel builds). There is no native wheel matrix here — the package is
# pure Python over jax[tpu]; run this image ON a TPU VM (libtpu attaches
# to the host accelerator).
#
#   docker build -f docker/release.dockerfile -t envpool-tpu .
#   docker run --privileged --net=host --rm envpool-tpu \
#       python -c "import envpool_tpu, jax; print(jax.devices())"

FROM python:3.12-slim-bookworm

ENV DEBIAN_FRONTEND=noninteractive PIP_NO_CACHE_DIR=1

RUN apt-get update \
    && apt-get install -y --no-install-recommends g++ make \
    && apt-get clean \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /app
COPY . .

RUN pip install "jax[tpu]" -f \
      https://storage.googleapis.com/jax-releases/libtpu_releases.html \
    && pip install .

CMD ["python", "bench.py"]
