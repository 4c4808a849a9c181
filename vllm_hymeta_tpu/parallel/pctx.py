"""ParallelCtx: the collective surface threaded through the model code.

With axis=None every operation is the identity, so single-device code paths
are untouched; under shard_map the same model code runs per-shard and the
ctx inserts the Megatron-style reductions.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class ParallelCtx:
    model_axis: Optional[str] = None   # TP/EP axis
    data_axis: Optional[str] = None    # DP axis (decode slot batch)
    # Megatron-style sequence parallelism: activations between blocks are
    # sharded along the TOKEN dim over the model axis; norms/elementwise
    # run on the local shard (no collective — they are per-token), blocks
    # all-gather tokens on entry and reduce-scatter on exit, replacing the
    # TP psum with an equal-volume pair and cutting activation memory /tp.
    sp: bool = False
    # dp-grouped prefill: each data rank runs its OWN request, so the
    # owner-broadcast of prefill logits (psum_data) must be an identity —
    # each rank keeps its request's logits (gathered by the out_specs).
    dp_grouped: bool = False
    # MoE expert parallelism via ragged_all_to_all token dispatch instead
    # of the replicated-psum combine (ops/moe_gemm.moe_apply_ep_a2a; see
    # its comm-volume note).  The right wire pattern for token-sharded /
    # multi-host EP; off by default for single-host TP-replicated serving.
    ep_a2a: bool = False

    # ----- model (TP) axis -----
    @property
    def tp(self) -> int:
        return jax.lax.axis_size(self.model_axis) if self.model_axis else 1

    def rank(self) -> jax.Array:
        if not self.model_axis:
            return jnp.int32(0)
        return jax.lax.axis_index(self.model_axis)

    def psum(self, x):
        """Row-parallel output reduction (the TP all-reduce)."""
        return jax.lax.psum(x, self.model_axis) if self.model_axis else x

    def all_gather(self, x, axis: int = -1):
        """Gather column-parallel outputs (e.g. vocab-sharded logits)."""
        if not self.model_axis:
            return x
        return jax.lax.all_gather(x, self.model_axis, axis=axis,
                                  tiled=True)

    def sp_gather(self, x, axis: int = -2):
        """SP block entry: all-gather the token dim (identity without SP)."""
        if not (self.sp and self.model_axis):
            return x
        return jax.lax.all_gather(x, self.model_axis, axis=axis, tiled=True)

    def sp_reduce(self, x, axis: int = -2):
        """SP block exit: reduce-scatter the row-parallel partial over the
        token dim; plain psum when SP is off."""
        if not self.model_axis:
            return x
        if not self.sp:
            return jax.lax.psum(x, self.model_axis)
        return jax.lax.psum_scatter(x, self.model_axis, scatter_dimension=
                                    axis % x.ndim, tiled=True)

    # ----- data (DP) axis -----
    @property
    def dp(self) -> int:
        return jax.lax.axis_size(self.data_axis) if self.data_axis else 1

    def psum_data(self, x):
        """Reduce across the data axis (owner-broadcast of prefill logits).
        Identity in dp-grouped prefill, where every rank serves a
        different request."""
        if self.dp_grouped or not self.data_axis:
            return x
        return jax.lax.psum(x, self.data_axis)

    def data_rank(self) -> jax.Array:
        if not self.data_axis:
            return jnp.int32(0)
        return jax.lax.axis_index(self.data_axis)

    def data_all_gather(self, x, axis: int = 0):
        """Concatenate per-rank shards along `axis` across the data axis
        (split-T prefill: reassemble the chunk's keys / per-rank GLA
        summaries). Identity without a data axis."""
        if not self.data_axis:
            return x
        return jax.lax.all_gather(x, self.data_axis, axis=axis, tiled=True)

    def local_slot(self, slot: jax.Array, n_local: int
                   ) -> Tuple[jax.Array, jax.Array]:
        """Map a global slot id to (local index, owned-here mask) when the
        slot dimension is sharded over the data axis."""
        if not self.data_axis:
            # python literal True: write paths use `enable is True` to
            # select compile-time-unconditional fast kernels
            return slot, True
        base = self.data_rank() * n_local
        local = slot - base
        owned = (local >= 0) & (local < n_local)
        return jnp.clip(local, 0, n_local - 1), owned


NULL_CTX = ParallelCtx()


def rms_norm_tp(x: jax.Array, weight: jax.Array, eps: float,
                pctx: ParallelCtx) -> jax.Array:
    """RMSNorm over a TP-sharded hidden dim: partial sum of squares,
    psum across the model axis, normalize the local shard — mirrors
    `HymetaRMSNormTP._forward` (`modeling_hymeta.py:122-181`, allreduce
    at 158-160)."""
    xf = x.astype(jnp.float32)
    ssq = jnp.sum(xf * xf, axis=-1, keepdims=True)
    ssq = pctx.psum(ssq)
    full_dim = x.shape[-1] * pctx.tp
    out = xf * jax.lax.rsqrt(ssq / full_dim + eps)
    return (out * weight.astype(jnp.float32)).astype(x.dtype)
