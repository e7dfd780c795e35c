"""Pallas TPU kernels: the hot compute paths.

These replace the reference's CUDA kernel layer (NeuronDB/src/gpu/cuda/):
- ivf_scan: fused posting-list scan (contiguous DMA + distance + top-k)
  replacing gpu_kernels.cu distance kernels + host-side sort;
- flash_attention: tiled O(N)-memory attention for the cross-encoder
  reranker, replacing gpu_flash_attention.cu.

Every kernel has a pure-jnp reference implementation used as its
correctness oracle in tests; the dispatcher falls back to XLA paths on
CPU (interpret mode is used for CI).
"""
