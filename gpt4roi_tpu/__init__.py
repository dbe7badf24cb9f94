"""gpt4roi_tpu — a TPU-native region-level multimodal chat framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of GPT4RoI
(jshilong/GPT4RoI): user-drawn bounding boxes become per-region embeddings
(multi-level CLIP ViT features, fused + RoIAligned) spliced into a LLaMA-7B
conversation at every ``<bbox>`` token.

Design stance (vs. the reference's torch/CUDA stack):
  * RoIAlign / bilinear resize are *separable linear maps* -> expressed as
    per-RoI interpolation-matrix contractions that run on the MXU, instead of
    gather kernels + atomicAdd backward (reference:
    mmcv-1.4.7 csrc/common/cuda/roi_align_cuda_kernel.cuh).
  * All shapes are static: regions, sequence lengths, and image token spans
    are padded + masked, replacing the reference's per-sample python splice
    loop (reference: gpt4roi/models/spi_llava.py:99-196).
  * Parallelism is jax.sharding over a Mesh (data/fsdp axes) rather than
    torchrun+DDP/FSDP (reference: train_stage1.sh, train_stage2.sh).
"""

__version__ = "0.1.0"
