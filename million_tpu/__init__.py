"""million-tpu: TPU-native product-quantized KV-cache inference engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of MILLION
(DAC'25, reference: Zhaohui-Xu/MILLION): long-context LLM inference with the
KV cache compressed by product quantization — per-subspace k-means codebooks
trained offline, uint8 codes stored instead of fp16 KV, and a fused decode
attention kernel that evaluates QK^T scores through an asymmetric-distance
lookup table and the score.V product directly from codes, with an exact
high-precision residual window for the most recent tokens.

Unlike the reference (single GPU, singleton caches, monkey-patched HF
modules, 240 precompiled CUDA kernel variants), this package is functional
and mesh-native: cache state is an explicit pytree threaded through jitted
steps, kernels are Pallas programs specialized by static shapes at trace
time, and multi-chip execution shards the coded KV sequence across a
`jax.sharding.Mesh` with LSE-merged partial attention.
"""

__version__ = "0.1.0"

from million_tpu.pq import ops as pq_ops  # noqa: F401
