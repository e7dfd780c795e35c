"""Compute ops: distance kernels, top-k selection, vector math.

This package replaces three reference layers at once:
- scalar distance kernels (NeuronDB/src/core/distance.c,
  src/vector/vector_distance.c),
- SIMD variants (src/vector/vector_distance_simd.c) — vectorization is
  free under XLA on the VPU/MXU,
- GPU distance/batch kernels (src/gpu/cuda/gpu_kernels.cu,
  src/gpu/common/gpu_batch.c) — replaced by XLA GEMMs and fused
  Pallas kernels in ``neurondb_tpu.ops.pallas``.
"""

from neurondb_tpu.ops import distance, topk, vector_ops  # noqa: F401
