"""dinov2_distillation_tpu — a TPU-native DINOv2 knowledge-distillation framework.

A ground-up JAX / XLA / Pallas re-design of the capabilities of the
``ardaerendogru/dinov2_distillation`` reference (PyTorch Lightning + DDP):
a frozen DINOv2 ViT teacher produces a patch-token feature map, and a small
student backbone (from a multi-family model zoo) is trained so that
attention-based projections of its multi-scale features match the teacher's
feature map under the ScaleKD loss (spatial MSE + DCT-filtered frequency MSE).

Design notes (TPU-first, not a port):
  * NHWC feature layout everywhere (native for TPU convolutions).
  * Models are ``flax.linen`` modules; parameters live in fp32, compute in
    bfloat16 (the reference used AMP fp16 on CUDA).
  * Data parallelism is ``jax.sharding`` over a Mesh with a ``data`` axis
    (the reference used Lightning DDP/NCCL); gradient reduction is an XLA
    collective inserted by the compiler, not an explicit allreduce.
  * Teacher attention runs as a fused Pallas flash-attention kernel on TPU.
  * The DCT used by the frequency loss is a pair of static matmul bases
    (the reference rebuilt FFT-derived ``nn.Linear`` layers every call).
"""

__version__ = "0.1.0"

from . import config as config  # noqa: F401
