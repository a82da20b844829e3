"""fasterseg_tpu — a TPU-native neural-architecture-search framework for
real-time semantic segmentation.

A ground-up JAX/XLA/Pallas rebuild with the capabilities of
VITA-Group/FasterSeg (ICLR'20): multi-resolution supernet search with
latency regularization, genotype decoding, teacher/student training with
distillation, whole-image evaluation, and an on-device latency-LUT
subsystem — all designed for TPU (NHWC layouts, bf16 MXU compute, static
shapes, SPMD data/spatial parallelism over a jax.sharding.Mesh).

Package layout:
  core/      typed configs, PRNG discipline, genotype decode (pure numpy)
  ops/       NHWC conv/norm primitives, the 5 searchable ops, seg heads, resize
  models/    supernet (search) and derived (inference) networks
  search/    gumbel sampling, the Architect (bi-level arch optimizer), driver
  train/     losses (OHEM/KL/focal), teacher-student training loop
  latency/   TPU latency LUT: measurement harness + differentiable estimator
  data/      file-list datasets, augmentation pipeline, host loader
  eval/      whole-image/sliding evaluator, confusion-matrix metrics
  parallel/  mesh construction, sharding helpers, collectives
  pallas/    fused TPU kernels for the inference hot path
  utils/     logging, checkpointing, visualization, plotting
"""

__version__ = "0.1.0"
