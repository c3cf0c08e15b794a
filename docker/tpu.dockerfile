# TPU runtime environment (reference analog: docker/x86_64.dockerfile, which
# ships CUDA + TensorRT; here the accelerator stack is jax[tpu] + libtpu).
#
#   docker build -f docker/tpu.dockerfile -t tensorrtx-tpu .
#   docker run --privileged --net=host -it tensorrtx-tpu   # on a TPU VM
FROM python:3.11-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
        build-essential cmake ninja-build git \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /workspace/tensorrtx_tpu
COPY pyproject.toml ./
COPY tensorrtx_tpu ./tensorrtx_tpu
COPY tests ./tests
COPY bench.py README.md ./

# jax[tpu] pulls libtpu from the Google releases index on TPU VMs
RUN pip install --no-cache-dir -U pip \
    && pip install --no-cache-dir "jax[tpu]" \
         -f https://storage.googleapis.com/jax-releases/libtpu_releases.html \
    && pip install --no-cache-dir -e . \
    && pip install --no-cache-dir pytest pillow numpy

# CPU-only torch: used exclusively by the test suite's reference graphs
RUN pip install --no-cache-dir torch --index-url https://download.pytorch.org/whl/cpu

CMD ["python", "-m", "pytest", "tests/", "-m", "fast", "-q"]
