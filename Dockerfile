# ARTalk-TPU serving image (TPU-VM base; equivalent of the reference's CUDA
# Dockerfile:1-58 for the TPU world).
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
        g++ ffmpeg wget && rm -rf /var/lib/apt/lists/*

WORKDIR /workspace/artalk_tpu
COPY . .

# libtpu-enabled jax for Cloud TPU VMs; CPU fallback works everywhere else
RUN pip install --no-cache-dir -U "jax[tpu]" \
        -f https://storage.googleapis.com/jax-releases/libtpu_releases.html \
    && pip install --no-cache-dir flax optax orbax-checkpoint einops scipy \
        av gradio pytest

# checkpoints are mounted or fetched at runtime (FLAME license gate):
#   ./build_resources.sh
EXPOSE 8960
CMD ["python", "-m", "artalk_tpu.cli", "--run_app"]
