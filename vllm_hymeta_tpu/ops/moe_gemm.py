"""Grouped expert GEMM for MoE — TPU-native replacement of vLLM's FusedMoE
Triton/CUDA kernel (`modeling_hymeta.py:312-324`, SURVEY.md §2.8 N11).

Strategy: sort token assignments by expert id and run `jax.lax.ragged_dot`
(megablocks-style grouped matmul on the MXU), then scatter back.  All
shapes static; the sort/gather/scatter are O(N log N) device ops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def moe_apply(p: dict, x: jax.Array, top_k: int = 1,
              renormalize: bool = True,
              expert_offset=None,
              num_global_experts: int = 0) -> jax.Array:
    """x: [N, h]; expert weights p["experts"]: gate/up [E, h, I], down [E, I, h].

    Routing semantics per `hf_model/moe.py:64-101` (softmax fp32 -> top-k ->
    optional renormalize).

    Expert parallelism: when `expert_offset` is given, p["experts"] holds
    only a contiguous slice of `num_global_experts` starting at that
    (traced) offset; routing runs on the replicated gate over ALL experts,
    non-local assignments are parked on a zero-weight dummy expert, and the
    caller psums partial results across EP ranks (replacing vLLM's
    FusedMoE EP all-to-all, `modeling_hymeta.py:312-324`).
    """
    N, h = x.shape
    wg = p["experts"]["gate_proj"]
    wu = p["experts"]["up_proj"]
    wd = p["experts"]["down_proj"]
    E_local = wg.shape[0]
    E_route = num_global_experts if expert_offset is not None else E_local

    router_logits = jnp.dot(x, p["gate"]["w"],
                            preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(router_logits.astype(jnp.float32), axis=-1)
    topw, topi = jax.lax.top_k(probs, top_k)  # [N, k]
    if renormalize:
        topw = topw / jnp.sum(topw, axis=-1, keepdims=True)

    # flatten assignments and sort by (local) expert
    flat_e = topi.reshape(-1)                      # [N*k] global expert ids
    flat_w = topw.reshape(-1)
    if expert_offset is not None:
        local_e = flat_e - expert_offset
        is_local = (local_e >= 0) & (local_e < E_local)
        flat_e = jnp.where(is_local, local_e, E_local)  # dummy bucket
        flat_w = jnp.where(is_local, flat_w, 0.0)
        n_groups = E_local + 1
        zeros_gu = jnp.zeros((1,) + wg.shape[1:], wg.dtype)
        wg = jnp.concatenate([wg, zeros_gu], axis=0)
        wu = jnp.concatenate([wu, zeros_gu], axis=0)
        wd = jnp.concatenate(
            [wd, jnp.zeros((1,) + wd.shape[1:], wd.dtype)], axis=0)
    else:
        n_groups = E_local
    flat_tok = jnp.repeat(jnp.arange(N), top_k)    # token index per assignment
    order = jnp.argsort(flat_e)                    # stable
    tok_sorted = flat_tok[order]
    group_sizes = jnp.bincount(flat_e, length=n_groups).astype(jnp.int32)

    xs = x[tok_sorted]                             # [N*k, h] grouped by expert
    hg = jax.lax.ragged_dot(xs, wg, group_sizes)
    hu = jax.lax.ragged_dot(xs, wu, group_sizes)
    inner = (jax.nn.silu(hg.astype(jnp.float32))
             * hu.astype(jnp.float32)).astype(x.dtype)
    y = jax.lax.ragged_dot(inner, wd, group_sizes)  # [N*k, h]

    y = y.astype(jnp.float32) * flat_w[order][:, None]
    out = jnp.zeros((N, h), jnp.float32).at[tok_sorted].add(y)
    return out.astype(x.dtype)
