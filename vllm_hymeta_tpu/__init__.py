"""vllm-hymeta-tpu: a TPU-native (JAX/XLA/Pallas) serving framework for the
hymeta hybrid-attention model families.

Re-implements, TPU-first, the capabilities of the reference `vllm-hymeta`
plugin (see /root/reference): the Hymeta-70B intra-layer hybrid
(sliding-window attention with 128 global metatokens + gated linear
attention, MoE FFNs) and the 7B GLA+SWA inter-layer hybrid, together with
the engine layers the reference borrowed from vLLM (continuous batching,
caching, sampling, OpenAI-compatible serving) rebuilt natively for TPU:

- static-shape ring-buffer sliding-window KV caches instead of paged blocks
- constant-size slot caches for the GLA matrix state
- Pallas kernels for chunked-GLA, decode-GLA, windowed flash attention and
  quantized matmuls
- GSPMD/shard_map parallelism over a (data, model, expert) mesh
"""

__version__ = "0.1.0"

from vllm_hymeta_tpu.config import GLAswaConfig, HymetaConfig  # noqa: F401
