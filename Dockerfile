# lightx2v_tpu — TPU-native video generation inference.
# (reference ships a CUDA 12.8 image building vllm/sgl-kernel; the TPU
# image needs only jax[tpu] + the pure-Python deps and the tiny native
# loader built from source.)
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
        g++ make ffmpeg && rm -rf /var/lib/apt/lists/*

WORKDIR /workspace
COPY . /workspace

RUN pip install --no-cache-dir "jax[tpu]" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html \
    && pip install --no-cache-dir ml_dtypes einops numpy pydantic imageio imageio-ffmpeg \
        opencv-python-headless pillow transformers safetensors pytest \
    && sh csrc/build.sh

ENTRYPOINT ["python", "-m", "lightx2v_tpu.api_server"]
