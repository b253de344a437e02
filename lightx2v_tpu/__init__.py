"""lightx2v_tpu — a TPU-native (JAX/XLA/Pallas) video-generation inference framework.

A from-scratch rebuild of the capabilities of ModelTC/lightx2v (X-to-Video:
text-to-video / image-to-video / audio-to-video inference for Wan2.1,
HunyuanVideo, CogVideoX, SkyReels-V2-DF and distilled/quantized variants),
redesigned for TPU:

* one jit-compiled denoiser per (model, shape-bucket): ``lax.scan`` over
  diffusion steps, block weights stacked and scanned, CFG as a batched axis;
* Pallas kernels for flash attention, quantized (int8/fp8) matmuls, fused
  RMSNorm/AdaLN;
* GSPMD sequence/head parallelism over a ``jax.sharding.Mesh`` (Ulysses
  all-to-all, ring attention via ``ppermute``) instead of NCCL wrappers;
* HBM-resident sharded weights instead of disk->CPU->GPU offload tiers.

Public surface mirrors the reference: ``python -m lightx2v_tpu.infer``,
config JSON schema, ``/v1/tasks`` serving API, safetensors checkpoints.
"""

__version__ = "0.1.0"
