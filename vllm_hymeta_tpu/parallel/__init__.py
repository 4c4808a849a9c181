"""Parallelism over a (data, [pipe,] model) device mesh.

TPU-native replacement for the reference's NCCL/ray/vLLM-parallel-layer
stack (SURVEY.md §2.7, §2.8 N15):
  * TP: heads (attention, GLA state, KV rings) and MLP intermediate dims
    sharded over the "model" axis; row-parallel outputs reduced with
    lax.psum over ICI — mirroring `tensor_model_parallel_all_reduce`
    call sites (`modeling_hymeta.py:24,158-160`).
  * EP: experts sharded over the "model" axis (16 experts / tp ranks),
    combined with the same psum that merges the row-parallel shards.
  * DP: decode slot batch / training batch sharded over the "data" axis.
  * PP: GPipe-style microbatch pipeline over a "pipe" axis for TRAINING
    (parallel/pipeline.py — lax.scan + ppermute over stacked layer
    pairs, the in-SPMD analogue of vLLM's make_layers +
    IntermediateTensors hand-off).  Inference serving intentionally uses
    pure TP/EP/DP: on a pod slice ICI makes TP/EP scale further than PP
    (SURVEY.md §5 distributed notes).
  * SP: Megatron-style sequence parallelism inside TP regions
    (ParallelCtx.sp — token-sharded activations, all-gather on block
    entry, reduce-scatter on exit).

Everything runs inside one shard_map-wrapped jitted step per engine
iteration, so XLA schedules collectives against compute.
"""

from vllm_hymeta_tpu.parallel.pctx import NULL_CTX, ParallelCtx  # noqa: F401
from vllm_hymeta_tpu.parallel.mesh import (make_mesh,  # noqa: F401
                                           make_train_mesh)
