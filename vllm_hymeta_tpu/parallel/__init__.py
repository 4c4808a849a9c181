"""Parallelism over a (data, model) device mesh.

TPU-native replacement for the reference's NCCL/ray/vLLM-parallel-layer
stack (SURVEY.md §2.7, §2.8 N15):
  * TP: heads (attention, GLA state, KV rings) and MLP intermediate dims
    sharded over the "model" axis; row-parallel outputs reduced with
    lax.psum over ICI — mirroring `tensor_model_parallel_all_reduce`
    call sites (`modeling_hymeta.py:24,158-160`).
  * EP: experts sharded over the "model" axis (16 experts / tp ranks),
    combined with the same psum that merges the row-parallel shards.
  * DP: decode slot batch sharded over the "data" axis.
  * PP: intentionally absent — on a TPU pod slice pure TP/EP scales
    further than PP over fast ICI (SURVEY.md §5 distributed notes); the
    28-layer models fit without pipeline stages.

Everything runs inside one shard_map-wrapped jitted step per engine
iteration, so XLA schedules collectives against compute.
"""

from vllm_hymeta_tpu.parallel.pctx import NULL_CTX, ParallelCtx  # noqa: F401
from vllm_hymeta_tpu.parallel.mesh import make_mesh  # noqa: F401
