"""sam_textvqa_tpu: a TPU-native (JAX/XLA/Pallas/pjit) framework with the
capabilities of the SA-M4C TextVQA reference (yashkant/sam-textvqa).

Design stance (vs /root/reference, cited per-module):
  * No global mutable registry — one frozen config tree threaded explicitly.
  * Fixed shapes everywhere; batches are typed pytrees of arrays.
  * Spatial graph is a vectorized op; per-head attention masks are derived
    on-device from a single int8 relation-class matrix via a (13, 12) LUT.
  * The 12-step M4C decoder is a `jax.lax.scan`; beam search is batched
    on-device. Data parallelism is `jit` over a `jax.sharding.Mesh`.
"""

__version__ = "0.1.0"
