"""Chunked gated-linear-attention prefill — TPU-native replacement for fla's
`fused_chunk_gla` Triton kernel (SURVEY.md §2.8 N1/N2; call sites
`modeling_hymeta.py:59,463,512`, `gla_attention.py:27,206`).

Algorithm (matches the recurrence in ops/naive.py:gla_scan exactly):

  state S ∈ R^{Dk×Dv} (fp32), per-dim log gates g_t ≤ 0.
  Two-level chunking: an outer scan over chunks of C tokens streams q/k/v/g
  and carries S; inside a chunk, an unrolled pass over sub-chunks of 16
  tokens keeps every exponential in a numerically-safe range:

  for sub-chunk i with local inclusive gate-cumsum bl (bl ≤ 0) and total Bs:
    o_i      = (q_i ⊙ e^{bl_i}) @ U · scale          (inter: all history)
             + [((q_i ⊙ e^{bl_i}) @ (k_i ⊙ e^{-bl_i})ᵀ) ⊙ causal] @ v_i · scale
    U        = e^{Bs_i} ⊙ U + (k_i ⊙ e^{Bs_i - bl_i})ᵀ @ v_i

  Exponent ranges: bl ∈ [-16·|g|max, 0], -bl ∈ [0, 16·|g|max],
  Bs - bl ∈ [-16·|g|max, 0].  With the 70B clamp (g ≥ log 0.05 ≈ -3) the
  worst case is e^48 ≈ 7e20 — safely inside fp32.  This mirrors fla's
  "secondary chunking" at 16 (the same constant its Triton kernels use).

  The sequential dependence is only through U (Dk×Dv per head) — the scan
  carries it in registers/VMEM while XLA pipelines the per-chunk HBM reads.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

SUB = 16  # sub-chunk size; exponent-safety bound, see module docstring


def gla_chunked(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    g: jax.Array,
    initial_state: Optional[jax.Array] = None,
    scale: Optional[float] = None,
    chunk: int = 128,
) -> Tuple[jax.Array, jax.Array]:
    """Dispatcher: Pallas kernel on TPU, XLA scan elsewhere.

    Differentiable on both paths: the Pallas forward carries a custom VJP
    whose backward is the XLA reference's VJP (same math, so gradients are
    exact) — this is the training capability of the reference's fla GLA ops
    (`hf_model/linear_attention.py:17,161`, SURVEY.md N7).

    GQA: q may carry rep*Hkv heads against Hkv-headed k/v/g — the shared
    group state is stored ONCE per KV head (the 7B repeats k/v/gates
    across the group, so per-query-head states are identical); the state
    in/out is then [B, Hkv, Dk, Dv]."""
    if jax.default_backend() in ("tpu", "axon"):
        if q.shape[-1] == v.shape[-1] and q.shape[2] > 1:
            if scale is None:
                scale = q.shape[-1] ** -0.5
            if initial_state is None:
                B, Hkv, _, Dk = k.shape
                initial_state = jnp.zeros((B, Hkv, Dk, v.shape[-1]),
                                          jnp.float32)
            return _gla_pallas_diff(q, k, v, g, initial_state, scale)
    return _gla_ref_gqa(q, k, v, g, initial_state, scale, chunk)


def _gla_ref_gqa(q, k, v, g, s0, scale, chunk: int = 128):
    """XLA reference with GQA folded via repeat (+ state de-dup on the
    way out); VJP through the repeats sums group gradients correctly."""
    rep = q.shape[1] // k.shape[1]
    if rep == 1:
        return gla_chunked_ref(q, k, v, g, initial_state=s0, scale=scale,
                               chunk=chunk)
    kr = jnp.repeat(k, rep, axis=1)
    vr = jnp.repeat(v, rep, axis=1)
    gr = jnp.repeat(g, rep, axis=1)
    s0r = jnp.repeat(s0, rep, axis=1) if s0 is not None else None
    o, S = gla_chunked_ref(q, kr, vr, gr, initial_state=s0r, scale=scale,
                           chunk=chunk)
    return o, S[:, ::rep]


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _gla_pallas_diff(q, k, v, g, s0, scale: float):
    from vllm_hymeta_tpu.ops.gla_chunk_pallas import gla_chunked_pallas
    return gla_chunked_pallas(q, k, v, g, initial_state=s0, scale=scale)


def _gla_pallas_fwd(q, k, v, g, s0, scale: float):
    return _gla_pallas_diff(q, k, v, g, s0, scale), (q, k, v, g, s0)


def _gla_pallas_bwd(scale: float, res, cts):
    q, k, v, g, s0 = res
    _, vjp = jax.vjp(
        lambda q_, k_, v_, g_, s_: _gla_ref_gqa(
            q_, k_, v_, g_, s_, scale),
        q, k, v, g, s0)
    return vjp(cts)


_gla_pallas_diff.defvjp(_gla_pallas_fwd, _gla_pallas_bwd)


@functools.partial(jax.jit, static_argnames=("scale", "chunk"))
def gla_chunked_ref(
    q: jax.Array,  # [B, H, T, Dk]
    k: jax.Array,  # [B, H, T, Dk]
    v: jax.Array,  # [B, H, T, Dv]
    g: jax.Array,  # [B, H, T, Dk] log-space gates
    initial_state: Optional[jax.Array] = None,  # [B, H, Dk, Dv] fp32
    scale: Optional[float] = None,
    chunk: int = 128,
) -> Tuple[jax.Array, jax.Array]:
    B, H, T, Dk = q.shape
    Dv = v.shape[-1]
    if scale is None:
        scale = Dk ** -0.5
    if initial_state is None:
        S0 = jnp.zeros((B, H, Dk, Dv), jnp.float32)
    else:
        S0 = initial_state.astype(jnp.float32)

    C = chunk
    assert C % SUB == 0
    pad = (-T) % C
    if pad:
        # identity padding: g=0 (decay 1), k=v=0 leaves the state untouched
        zq = ((0, 0), (0, 0), (0, pad), (0, 0))
        q = jnp.pad(q, zq)
        k = jnp.pad(k, zq)
        v = jnp.pad(v, zq)
        g = jnp.pad(g, zq)
    Tp = T + pad
    NC = Tp // C
    ns = C // SUB

    # [NC, B, H, ns, SUB, D]
    def to_chunks(x, d):
        return (x.reshape(B, H, NC, ns, SUB, d)
                .transpose(2, 0, 1, 3, 4, 5))

    qf = to_chunks(q.astype(jnp.float32) * scale, Dk)
    kf = to_chunks(k.astype(jnp.float32), Dk)
    vf = to_chunks(v.astype(jnp.float32), Dv)
    gf = to_chunks(g.astype(jnp.float32), Dk)

    causal = jnp.tril(jnp.ones((SUB, SUB), jnp.float32))

    def chunk_step(S, inp):
        qc, kc, vc, gc = inp  # [B, H, ns, SUB, D]
        bl = jnp.cumsum(gc, axis=-2)           # [B,H,ns,SUB,Dk], <= 0
        bs = bl[..., -1, :]                    # [B,H,ns,Dk] sub-chunk totals
        qa = qc * jnp.exp(bl)
        ka_in = kc * jnp.exp(-bl)              # intra keys
        ka_up = kc * jnp.exp(bs[..., None, :] - bl)  # state-update keys

        # intra-sub-chunk attention
        A = jnp.einsum("bhntd,bhnsd->bhnts", qa, ka_in) * causal
        o_intra = jnp.einsum("bhnts,bhnsv->bhntv", A, vc)

        # sequential over sub-chunks (unrolled, ns is small)
        outs = []
        U = S
        for i in range(ns):
            o_inter = jnp.einsum("bhtd,bhdv->bhtv", qa[:, :, i], U)
            outs.append(o_inter + o_intra[:, :, i])
            U = (jnp.exp(bs[:, :, i])[..., None] * U
                 + jnp.einsum("bhtd,bhtv->bhdv", ka_up[:, :, i], vc[:, :, i]))
        o = jnp.stack(outs, axis=2)  # [B,H,ns,SUB,Dv]
        return U, o

    S, o = jax.lax.scan(chunk_step, S0, (qf, kf, vf, gf))
    # o: [NC, B, H, ns, SUB, Dv] -> [B, H, T, Dv]
    o = o.transpose(1, 2, 0, 3, 4, 5).reshape(B, H, Tp, Dv)[:, :, :T]
    return o.astype(v.dtype), S
