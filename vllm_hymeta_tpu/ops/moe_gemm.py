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


def _excl_cumsum(x, axis=0):
    return jnp.cumsum(x, axis=axis) - x


def _ragged_a2a(operand, output, input_offsets, send_sizes,
                output_offsets, recv_sizes, axis_name):
    """jax.lax.ragged_all_to_all, with a semantics-faithful emulation for
    backends whose XLA lacks the `ragged-all-to-all` HLO (XLA:CPU — the
    virtual-device test/dryrun meshes).  The emulation implements the
    primitive's documented contract exactly (input_offsets/send_sizes
    index MY operand per target rank; output_offsets[j] is where my block
    starts in rank j's output buffer), so the CPU-mesh equivalence tests
    validate the same offset bookkeeping the TPU primitive consumes."""
    if jax.default_backend() in ("tpu", "axon"):
        return jax.lax.ragged_all_to_all(
            operand, output, input_offsets, send_sizes, output_offsets,
            recv_sizes, axis_name=axis_name)
    ep = jax.lax.axis_size(axis_name)
    me = jax.lax.axis_index(axis_name)
    n_in = operand.shape[0]
    cap = output.shape[0]
    all_op = jax.lax.all_gather(operand, axis_name, axis=0)      # [ep,n,h]
    all_in = jax.lax.all_gather(input_offsets, axis_name, axis=0)
    all_sz = jax.lax.all_gather(send_sizes, axis_name, axis=0)
    all_out = jax.lax.all_gather(output_offsets, axis_name, axis=0)
    out = output
    rows = jnp.arange(cap)
    for r in range(ep):   # static: source ranks
        idx = rows - all_out[r, me]
        ok = (idx >= 0) & (idx < all_sz[r, me])
        src = jnp.take(all_op[r],
                       jnp.clip(all_in[r, me] + idx, 0, n_in - 1), axis=0)
        out = jnp.where(ok[:, None], src, out)
    return out


def moe_apply_ep_a2a(p: dict, x: jax.Array, top_k: int,
                     renormalize: bool, axis_name: str,
                     num_global_experts: int) -> jax.Array:
    """Expert parallelism with REAL token dispatch: `ragged_all_to_all`
    sends each token only to the rank(s) owning its routed experts and a
    second a2a returns the expert outputs — the TPU wire pattern of
    vLLM's FusedMoE EP dispatch/combine (`modeling_hymeta.py:312-324`,
    SURVEY.md §2.7/N11).

    x: [n, h] — THIS RANK'S token shard (token-parallel over
    `axis_name`); p["experts"]: this rank's contiguous expert slice.
    Returns [n, h] for the local token shard.

    Comm volume per rank per layer (h hidden, k=top_k, ep ranks):
      * this path:  dispatch + combine ≈ 2·n·k·(1−1/ep)·h — only the
        rows that actually route off-rank move, and traffic stays
        proportional to the LOCAL token count n = N/ep.
      * the psum path (moe_apply + caller psum): 2·N·h·(ep−1)/ep per
        rank REGARDLESS of routing — each rank all-reduces the full
        replicated activation.  At k=2, ep=8: a2a moves ~0.44·N/ep·h·4B
        vs psum's ~1.75·N·h·4B → ~32x less wire traffic, and on
        multi-host meshes the a2a rides only the links tokens actually
        cross (the psum pattern crosses DCN with the full batch).
    The psum path remains the default for single-host TP-replicated
    serving where activations are already resident on every rank; this
    path is selected via ParallelCtx(ep_a2a=True) / VLLM_EP_A2A=1 for
    token-sharded and multi-host EP deployments.

    Capacity note: the receive buffer holds the static worst case
    (n·k·ep rows). Production capacity-factor dropping is intentionally
    not applied — parity with the reference's dropless FusedMoE.
    """
    n, h = x.shape
    ep = jax.lax.axis_size(axis_name)
    me = jax.lax.axis_index(axis_name)
    wg = p["experts"]["gate_proj"]
    wu = p["experts"]["up_proj"]
    wd = p["experts"]["down_proj"]
    E_local = wg.shape[0]

    router_logits = jnp.dot(x, p["gate"]["w"],
                            preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(router_logits.astype(jnp.float32), axis=-1)
    topw, topi = jax.lax.top_k(probs, top_k)           # [n, k]
    if renormalize:
        topw = topw / jnp.sum(topw, axis=-1, keepdims=True)

    nk = n * top_k
    flat_e = topi.reshape(-1).astype(jnp.int32)        # global expert ids
    flat_w = topw.reshape(-1)
    flat_tok = jnp.repeat(jnp.arange(n, dtype=jnp.int32), top_k)
    dest = flat_e // E_local                           # owning rank
    order = jnp.argsort(dest, stable=True)
    xs_send = x[flat_tok[order]]                       # [nk, h]
    e_send = flat_e[order][:, None]                    # ride-along ids

    send_sizes = jnp.bincount(dest, length=ep).astype(jnp.int32)
    input_offsets = _excl_cumsum(send_sizes)
    # every rank needs the full send-size matrix to place blocks
    S_all = jax.lax.all_gather(send_sizes, axis_name, axis=0)   # [ep, ep]
    recv_sizes = S_all[:, me]                          # from rank r
    # my block in rank j's buffer starts after ranks r < me
    output_offsets = _excl_cumsum(S_all, axis=0)[me]   # [ep]

    cap = nk * ep                                      # static worst case
    recv_x = _ragged_a2a(
        xs_send, jnp.zeros((cap, h), x.dtype), input_offsets, send_sizes,
        output_offsets, recv_sizes, axis_name=axis_name)
    recv_e = _ragged_a2a(
        e_send, jnp.full((cap, 1), -1, jnp.int32), input_offsets,
        send_sizes, output_offsets, recv_sizes, axis_name=axis_name)

    m = jnp.sum(recv_sizes)
    valid = jnp.arange(cap) < m
    le = jnp.where(valid, recv_e[:, 0] - me * E_local, E_local)
    order2 = jnp.argsort(le, stable=True)
    xs2 = recv_x[order2]
    group_sizes = jnp.bincount(le, length=E_local + 1).astype(jnp.int32)
    zeros_gu = jnp.zeros((1,) + wg.shape[1:], wg.dtype)
    wg_ = jnp.concatenate([wg, zeros_gu], axis=0)
    wu_ = jnp.concatenate([wu, zeros_gu], axis=0)
    wd_ = jnp.concatenate(
        [wd, jnp.zeros((1,) + wd.shape[1:], wd.dtype)], axis=0)
    hg = jax.lax.ragged_dot(xs2, wg_, group_sizes)
    hu = jax.lax.ragged_dot(xs2, wu_, group_sizes)
    inner = (jax.nn.silu(hg.astype(jnp.float32))
             * hu.astype(jnp.float32)).astype(x.dtype)
    y2 = jax.lax.ragged_dot(inner, wd_, group_sizes)   # [cap, h]
    y_recv_order = jnp.zeros((cap, h), y2.dtype).at[order2].set(y2)

    # combine: the exact reverse exchange (swap send/recv roles)
    rev_in_off = _excl_cumsum(recv_sizes)
    # my returned block lands where rank j's send-block to me started
    rev_out_off = _excl_cumsum(S_all, axis=1)[:, me]   # [ep]
    y_back = _ragged_a2a(
        y_recv_order, jnp.zeros((nk, h), y2.dtype), rev_in_off,
        recv_sizes, rev_out_off, send_sizes, axis_name=axis_name)

    y_w = y_back.astype(jnp.float32) * flat_w[order][:, None]
    out = jnp.zeros((n, h), jnp.float32).at[flat_tok[order]].add(y_w)
    return out.astype(x.dtype)
