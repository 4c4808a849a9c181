"""Fused decode attention kernel: per-slot ring buffer + (optionally) the
128 metatoken K/V in ONE joint softmax — the Pallas replacement for
`fwd_kvcache` + dense meta pass + LSE merge (`fa_kernel_metatoken.py:
157-192`, SURVEY.md N4/N6).  Joint softmax == the reference's two-pass
LSE merge (property-tested in tests/test_ops.py).

Grid (S, Hkv, nkb): ring visited in blocks with flash accumulation so
global-attention layers (ring == max_model_len) stay within VMEM; the
metatoken block is folded into the first step.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _kernel(pos_ref, q_ref, k_ref, v_ref, *rest, R: int, bR: int,
            nkb: int, window_keys: int, M: int, scale: float,
            quantized: bool):
    if quantized:
        (ks_ref, vs_ref, mk_ref, mv_ref,
         o_ref, m_ref, l_ref, acc_ref) = rest
    else:
        mk_ref, mv_ref, o_ref, m_ref, l_ref, acc_ref = rest
    s = pl.program_id(0)
    j = pl.program_id(2)
    p = pos_ref[s]

    q = q_ref[0, 0].astype(jnp.float32) * scale           # [rep, D]

    @pl.when(j == 0)
    def _():
        if M > 0:
            mk = mk_ref[0].astype(jnp.float32)            # [M, D]
            mv = mv_ref[0].astype(jnp.float32)
            sm = jax.lax.dot_general(
                q, mk, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)       # [rep, M]
            mx = jnp.max(sm, axis=1, keepdims=True)
            pm = jnp.exp(sm - mx)
            m_ref[:] = mx
            l_ref[:] = jnp.sum(pm, axis=1, keepdims=True)
            acc_ref[:] = jax.lax.dot(pm.astype(mv.dtype), mv,
                                     preferred_element_type=jnp.float32)
        else:
            m_ref[:] = jnp.full_like(m_ref, NEG_INF)
            l_ref[:] = jnp.zeros_like(l_ref)
            acc_ref[:] = jnp.zeros_like(acc_ref)

    k = k_ref[0, 0].astype(jnp.float32)                   # [bR, D]
    v = v_ref[0, 0]
    sr = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)               # [rep, bR]
    if quantized:
        # int8 ring entries: per-(head, position) scales ride in as
        # [Hkv, bR] tiles (full-head blocks — a (1, bR) block violates the
        # TPU (8, 128) tiling rule); slice this head's row.  K scale
        # multiplies the score row; the V scale is folded into the
        # probability row below ((p*vs) @ v == p @ diag(vs) v), which
        # avoids a lane->sublane transpose of the scale vector.
        g = pl.program_id(1)
        sr = sr * ks_ref[0, pl.ds(g, 1), :]               # [1, bR] bcast
        vs_row = vs_ref[0, pl.ds(g, 1), :]                # [1, bR]

    idx = j * bR + jax.lax.broadcasted_iota(jnp.int32, (1, bR), 1)
    k_pos = p - jnp.mod(p - idx, R)
    d = p - k_pos
    mask = k_pos >= 0
    if window_keys > 0:
        mask = mask & (d < window_keys)
    sr = jnp.where(mask, sr, NEG_INF)

    m_prev = m_ref[:]
    m_new = jnp.maximum(m_prev, jnp.max(sr, axis=1, keepdims=True))
    alpha = jnp.exp(m_prev - m_new)
    pr = jnp.exp(sr - m_new)
    l_ref[:] = l_ref[:] * alpha + jnp.sum(pr, axis=1, keepdims=True)
    if quantized:
        pv = jax.lax.dot(pr * vs_row, v.astype(jnp.float32),
                         preferred_element_type=jnp.float32)
    else:
        pv = jax.lax.dot(pr.astype(v.dtype), v,
                         preferred_element_type=jnp.float32)
    acc_ref[:] = acc_ref[:] * alpha + pv
    m_ref[:] = m_new

    @pl.when(j == nkb - 1)
    def _():
        o_ref[0, 0] = (acc_ref[:] /
                       jnp.maximum(l_ref[:], 1e-37)).astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("window_keys", "scale", "bR"))
def fused_decode_attention_pallas(
    q: jax.Array,          # [S, Hq, D]
    ring_k: jax.Array,     # [S, Hkv, R, D] bf16 or int8
    ring_v: jax.Array,
    positions: jax.Array,  # [S] int32
    window_keys: int,
    meta_k: Optional[jax.Array] = None,   # [M, Hkv, D]
    meta_v: Optional[jax.Array] = None,
    scale: Optional[float] = None,
    bR: int = 2048,
    k_scale: Optional[jax.Array] = None,  # [S, Hkv, R] f32 (int8 rings)
    v_scale: Optional[jax.Array] = None,
) -> jax.Array:
    S, Hq, D = q.shape
    Hkv, R = ring_k.shape[1], ring_k.shape[2]
    rep = Hq // Hkv
    if scale is None:
        scale = D ** -0.5
    bR = min(bR, R)
    assert R % bR == 0, (R, bR)
    nkb = R // bR
    quantized = ring_k.dtype == jnp.int8

    if meta_k is None:
        M = 0
        mk = jnp.zeros((Hkv, 8, D), jnp.bfloat16)
        mv = jnp.zeros((Hkv, 8, D), jnp.bfloat16)
    else:
        M = meta_k.shape[0]
        mk = jnp.swapaxes(meta_k, 0, 1)                   # [Hkv, M, D]
        mv = jnp.swapaxes(meta_v, 0, 1)

    q4 = q.reshape(S, Hkv, rep, D)

    ring_specs = [
        pl.BlockSpec((1, 1, bR, D), lambda s, g, j, pos: (s, g, j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, bR, D), lambda s, g, j, pos: (s, g, j, 0),
                     memory_space=pltpu.VMEM),
    ]
    operands = [q4, ring_k, ring_v]
    if quantized:
        # full-Hkv blocks: (1, 1, bR) would put a size-1 tile on the
        # second-to-last dim (array dim Hkv) — illegal on TPU; the kernel
        # slices its head's row
        ring_specs.append(pl.BlockSpec(
            (1, Hkv, bR), lambda s, g, j, pos: (s, 0, j),
            memory_space=pltpu.VMEM))
        ring_specs.append(pl.BlockSpec(
            (1, Hkv, bR), lambda s, g, j, pos: (s, 0, j),
            memory_space=pltpu.VMEM))
        operands += [k_scale.astype(jnp.float32),
                     v_scale.astype(jnp.float32)]
    operands += [mk, mv]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(S, Hkv, nkb),
        in_specs=[
            pl.BlockSpec((1, 1, rep, D), lambda s, g, j, pos: (s, g, 0, 0),
                         memory_space=pltpu.VMEM),
            *ring_specs,
            pl.BlockSpec((1, mk.shape[1], D), lambda s, g, j, pos: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mk.shape[1], D), lambda s, g, j, pos: (g, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, rep, D),
                               lambda s, g, j, pos: (s, g, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((rep, 1), jnp.float32),
            pltpu.VMEM((rep, 1), jnp.float32),
            pltpu.VMEM((rep, D), jnp.float32),
        ],
    )

    kern = functools.partial(_kernel, R=R, bR=bR, nkb=nkb,
                             window_keys=window_keys, M=M, scale=scale,
                             quantized=quantized)

    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((S, Hkv, rep, D),
                                       jnp.bfloat16 if quantized
                                       else q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=4 * S * Hq * (R + M) * D,
            bytes_accessed=(S * Hkv * R * D * 2 * ring_k.dtype.itemsize
                            + (S * Hkv * R * 4 * 2 if quantized else 0)),
            transcendentals=2 * S * Hq * (R + M)),
    )(positions.astype(jnp.int32), *operands)
    return out.reshape(S, Hq, D)


def fused_decode_attention(q, ring_k, ring_v, positions, window_keys,
                           meta_k=None, meta_v=None, scale=None,
                           k_scale=None, v_scale=None):
    """Dispatcher: Pallas on TPU (bf16 or int8 rings), jnp composition
    elsewhere.  Returns out [S, Hq, D] fp32."""
    from vllm_hymeta_tpu.ops import swa
    if ring_k.dtype == jnp.int8:
        assert k_scale is not None and v_scale is not None, (
            "int8 ring requires both k_scale and v_scale "
            "(per-(head, position) dequant scales)")
    on_tpu = jax.default_backend() in ("tpu", "axon")
    R = ring_k.shape[2]
    bR = max((b for b in range(128, 2048 + 1, 128) if R % b == 0),
             default=0)
    if on_tpu and bR and (
            ring_k.dtype == jnp.bfloat16
            or (ring_k.dtype == jnp.int8 and k_scale is not None)):
        out = fused_decode_attention_pallas(
            q, ring_k, ring_v, positions, window_keys, meta_k, meta_v,
            scale, bR=bR, k_scale=k_scale, v_scale=v_scale)
        return out.astype(jnp.float32)
    if ring_k.dtype == jnp.int8:
        ring_k = ring_k.astype(jnp.bfloat16) \
            * k_scale[..., None].astype(jnp.bfloat16)
        ring_v = ring_v.astype(jnp.bfloat16) \
            * v_scale[..., None].astype(jnp.bfloat16)
    out1, lse1 = swa.swa_decode(q, ring_k, ring_v, positions, window_keys,
                                scale)
    if meta_k is None:
        return out1
    out2, lse2 = swa.meta_decode(q, meta_k, meta_v, scale)
    out, _ = swa.merge_two(out1, lse1, out2, lse2)
    return out
