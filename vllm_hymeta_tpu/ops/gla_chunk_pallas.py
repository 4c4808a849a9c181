"""Pallas chunked-GLA kernel (SURVEY.md N1/N2): the TPU replacement for
fla's `fused_chunk_gla` Triton kernel.

Grid (B·H, T/C): TPU grids execute sequentially per core, so the fp32
state lives in a VMEM scratch carried across the chunk axis while the
grid pipeline streams q/k/v/g chunks from HBM.

Within a chunk everything batchable runs as full-chunk [C, ·] ops:
  * the inclusive gate cumsum per 16-token sub-chunk is ONE
    block-diagonal lower-triangular matmul  bl = Btri @ g
  * the intra-sub-chunk attention is ONE [C, C] matmul masked by the same
    block-diagonal causal pattern (cross-sub-chunk entries are garbage
    under per-sub-chunk references and are masked; sub-chunk 16 keeps all
    exponentials inside fp32 — the same bound fla's secondary chunking
    uses)
  * the per-sub-chunk state contributions  upd_i = (k·e^{Bs-bl})ᵀ @ v are
    ONE batched dot_general
leaving only the irreducible sequential part in the loop:
    o_i += (q_i·e^{bl}) @ U ;  U = e^{Bs_i} ⊙ U + upd_i
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SUB = 16


def _kernel(q_ref, k_ref, v_ref, g_ref, s0_ref, o_ref, sout_ref, s_ref, *,
            nc: int, ns: int, scale: float, rep: int):
    """rep > 1 = GQA mode: `rep` query heads share this program's
    k/v/g head AND its state (the 7B repeats k/v/gates across the group,
    so per-query-head states are identical — SURVEY `repeat_kv`,
    `hf_model/linear_attention.py:24-33`; storing one state per KV head
    cuts state memory and traffic by `rep`)."""
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _():
        s_ref[:] = s0_ref[0]

    C = q_ref.shape[2]
    D = q_ref.shape[-1]
    row = jax.lax.broadcasted_iota(jnp.int32, (C, C), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (C, C), 1)
    same_sub = (row // SUB) == (col // SUB)
    btri = jnp.where(same_sub & (row >= col), 1.0, 0.0)  # [C, C]

    g = g_ref[0].astype(jnp.float32)                     # [C, D]
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)

    # exact fp32 per-sub-chunk inclusive cumsum via log-shift adds (bl
    # feeds exponentials — matmul-based cumsum would cost either fp32
    # matmul passes or precision)
    rpos = jax.lax.broadcasted_iota(jnp.int32, (C, 1), 0) % SUB
    bl = g
    sh = 1
    while sh < SUB:
        rolled = pltpu.roll(bl, sh, axis=0)
        bl = bl + jnp.where(rpos >= sh, rolled, 0.0)
        sh *= 2

    ebl = jnp.exp(bl)
    ka_in = k * jnp.exp(-bl)

    # MXU inputs in bf16 (same exponent range as fp32 — the sub-chunk
    # bound that keeps exponentials finite holds; only mantissa differs,
    # within the GLA path's tolerance), fp32 accumulation
    ka16 = ka_in.astype(jnp.bfloat16)
    v16 = v.astype(jnp.bfloat16)

    # batched raw state contributions: upd0_i = ka_inᵀ @ v_i ; the real
    # update is U <- e^{Bs_i} ⊙ (U + upd0_i)  since
    # Σ_t k e^{Bs-bl} ⊗ v = e^{Bs} ⊙ Σ_t (k e^{-bl}) ⊗ v
    upd0 = jax.lax.dot_general(
        ka16.reshape(ns, SUB, D), v16.reshape(ns, SUB, D),
        (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)

    # sequential part reduced to ELEMENTWISE state evolution (VPU): U
    # before each sub-chunk is recorded, then ALL inter-chunk outputs run
    # as batched MXU matmuls qa_i @ U_i — no small sequential dots
    U = s_ref[:]
    states = []
    for i in range(ns):                                  # static unroll
        states.append(U)
        hi = (i + 1) * SUB
        decay = jnp.exp(bl[hi - 1:hi, :]).T              # [D, 1]
        U = decay * (U + upd0[i])
    s_ref[:] = U
    St16 = jnp.stack(states, axis=0).astype(jnp.bfloat16)  # [ns, D, D]

    for r in range(rep):                                 # static unroll
        q = q_ref[0, r].astype(jnp.float32) * scale      # [C, D]
        qa = q * ebl
        qa16 = qa.astype(jnp.bfloat16)
        A = jax.lax.dot_general(
            qa16, ka16, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        A = A * btri                                     # mask + zero cross
        o_intra = jax.lax.dot(A.astype(jnp.bfloat16), v16,
                              preferred_element_type=jnp.float32)
        o_inter = jax.lax.dot_general(
            qa16.reshape(ns, SUB, D), St16,
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)          # [ns, SUB, D]
        o_ref[0, r] = (o_inter.reshape(C, D) + o_intra).astype(o_ref.dtype)

    @pl.when(c == nc - 1)
    def _():
        sout_ref[0] = s_ref[:]


@functools.partial(jax.jit, static_argnames=("scale", "chunk"))
def gla_chunked_pallas(
    q: jax.Array,  # [B, Hq, T, Dk]  (Hq = rep * Hkv, GQA folded in-kernel)
    k: jax.Array,  # [B, Hkv, T, Dk]
    v: jax.Array,  # [B, Hkv, T, Dv]
    g: jax.Array,  # [B, Hkv, T, Dk] log gates
    initial_state: Optional[jax.Array] = None,  # [B, Hkv, Dk, Dv] fp32
    scale: Optional[float] = None,
    chunk: int = 512,
) -> Tuple[jax.Array, jax.Array]:
    B, Hq, T, Dk = q.shape
    Hkv = k.shape[1]
    rep = Hq // Hkv
    Dv = v.shape[-1]
    assert Dk == Dv, "kernel assumes square state"
    assert Hq == rep * Hkv
    if scale is None:
        scale = Dk ** -0.5
    C = chunk
    assert C % SUB == 0
    pad = (-T) % C
    if pad:
        zq = ((0, 0), (0, 0), (0, pad), (0, 0))
        q = jnp.pad(q, zq)
        k = jnp.pad(k, zq)
        v = jnp.pad(v, zq)
        g = jnp.pad(g, zq)
    Tp = T + pad
    nc = Tp // C
    ns = C // SUB
    BH = B * Hkv

    if initial_state is None:
        s0 = jnp.zeros((BH, Dk, Dv), jnp.float32)
    else:
        s0 = initial_state.astype(jnp.float32).reshape(BH, Dk, Dv)

    def flat(x):
        return x.reshape(BH, Tp, x.shape[-1])

    qg = q.reshape(B, Hkv, rep, Tp, Dk).reshape(BH, rep, Tp, Dk)

    kernel = functools.partial(_kernel, nc=nc, ns=ns, scale=scale, rep=rep)
    o, s_out = pl.pallas_call(
        kernel,
        grid=(BH, nc),
        in_specs=[
            pl.BlockSpec((1, rep, C, Dk), lambda b, c: (b, 0, c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, Dk), lambda b, c: (b, c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, Dv), lambda b, c: (b, c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, Dk), lambda b, c: (b, c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Dk, Dv), lambda b, c: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, rep, C, Dv), lambda b, c: (b, 0, c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Dk, Dv), lambda b, c: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((BH, rep, Tp, Dv), v.dtype),
            jax.ShapeDtypeStruct((BH, Dk, Dv), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((Dk, Dv), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=BH * rep * Tp * (2 * C + 4 * Dk) * Dv,
            bytes_accessed=BH * Tp * Dk * 2 * (3 + rep) + BH * Dk * Dv * 4,
            transcendentals=BH * Tp * Dk * 3),
    )(qg, flat(k), flat(v), flat(g), s0)

    o = o.reshape(B, Hkv, rep, Tp, Dv).reshape(B, Hq, Tp, Dv)[:, :, :T]
    return o, s_out.reshape(B, Hkv, Dk, Dv)
