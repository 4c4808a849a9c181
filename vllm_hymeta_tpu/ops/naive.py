"""Pure-jnp reference implementations — the executable numerics spec.

These functions define the exact semantics every Pallas kernel must match.
They are derived from the reference's own "golden" paths:

  * GLA recurrence: fla `fused_recurrent_gla` semantics as used by
    `hf_model/linear_attention.py:159-167` and re-implemented by the decode
    Triton kernel `models/my_fused_recurrent.py:59-80`:
        S_t = exp(g_t) (broadcast over the value dim) * S_{t-1} + k_t ⊗ v_t
        o_t = (q_t * scale) · S_t            with scale = head_dim ** -0.5
  * metatoken sliding-window attention: the pure-torch spec at
    `attention/fa_kernel_metatoken.py:377-410` (naive_metatoken_flash_attn)
  * LSE merge: `attention/fa_kernel_metatoken.py:110-122`
  * rotary embedding: neox-style, fp32 trig (`hf_model/attention.py:26-82`)
  * RMSNorm (+ fused residual): fla RMSNorm semantics used throughout
    (`hf_7B_model/layernorm.py`, call sites e.g.
    `hf_model/modeling_hymeta.py:189`).

Everything here is plain XLA — usable on CPU for tests and as a fallback
path on TPU; shapes are static and jit-friendly.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

NEG_INF = float("-inf")


# ---------------------------------------------------------------------------
# norms
# ---------------------------------------------------------------------------

def rms_norm(x: jax.Array, weight: jax.Array, eps: float = 1e-6) -> jax.Array:
    """RMSNorm computed in fp32, result cast back to x.dtype.

    On TPU with lane-aligned shapes this routes to the fused Pallas
    kernel (ops/norms.py): one bf16 read + one bf16 write instead of
    XLA's materialized-f32 lowering (custom VJP keeps it differentiable)."""
    from vllm_hymeta_tpu.ops import norms
    if norms.fits(x, weight):
        return norms.rms_norm(x, weight, eps)
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    out = xf * jax.lax.rsqrt(var + eps)
    return (out * weight.astype(jnp.float32)).astype(x.dtype)


def rms_norm_residual(
    x: jax.Array, residual: jax.Array, weight: jax.Array, eps: float = 1e-6
) -> Tuple[jax.Array, jax.Array]:
    """Fused prenorm-residual: r = x + residual; return (rms_norm(r), r).

    Matches fla RMSNorm(prenorm=True) as called at
    `hf_model/modeling_hymeta.py:189` / `hf_7B_model/modeling_gla_swa.py:119`.
    The residual add happens in fp32 in fla's kernel; we mirror that.
    """
    from vllm_hymeta_tpu.ops import norms
    if norms.fits(x, weight) and residual.shape == x.shape:
        return norms.rms_norm_residual(x, residual, weight, eps)
    r = (x.astype(jnp.float32) + residual.astype(jnp.float32))
    out = rms_norm(r, weight, eps).astype(x.dtype)
    return out, r.astype(x.dtype)


# ---------------------------------------------------------------------------
# rotary embedding (neox style)
# ---------------------------------------------------------------------------

def rope_cos_sin(
    positions: jax.Array, head_dim: int, theta: float
) -> Tuple[jax.Array, jax.Array]:
    """cos/sin tables for given positions: [..., head_dim] each, fp32.

    neox convention: freqs over half dim, duplicated (`hf_model/attention.py:33,47`).
    """
    inv_freq = 1.0 / (
        theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim)
    )
    freqs = positions.astype(jnp.float32)[..., None] * inv_freq  # [..., hd/2]
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def _rotate_half(x: jax.Array) -> jax.Array:
    h = x.shape[-1] // 2
    return jnp.concatenate([-x[..., h:], x[..., :h]], axis=-1)


def apply_rope(
    x: jax.Array, cos: jax.Array, sin: jax.Array
) -> jax.Array:
    """x: [..., T, n_heads, head_dim]; cos/sin: [..., T, head_dim]."""
    cos = cos[..., :, None, :]
    sin = sin[..., :, None, :]
    xf = x.astype(jnp.float32)
    out = xf * cos + _rotate_half(xf) * sin
    return out.astype(x.dtype)


# ---------------------------------------------------------------------------
# GLA: gated linear attention
# ---------------------------------------------------------------------------

def gla_scan(
    q: jax.Array,  # [B, H, T, Dk]
    k: jax.Array,  # [B, H, T, Dk]
    v: jax.Array,  # [B, H, T, Dv]
    g: jax.Array,  # [B, H, T, Dk] log-space gates (<= 0)
    initial_state: Optional[jax.Array] = None,  # [B, H, Dk, Dv] fp32
    scale: Optional[float] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Token-recurrent GLA — the defining recurrence (fp32 state).

    Returns (o [B,H,T,Dv] in v.dtype, final_state [B,H,Dk,Dv] fp32).
    """
    B, H, T, Dk = q.shape
    Dv = v.shape[-1]
    if scale is None:
        scale = Dk ** -0.5
    if initial_state is None:
        initial_state = jnp.zeros((B, H, Dk, Dv), jnp.float32)

    qf = q.astype(jnp.float32) * scale
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    gf = g.astype(jnp.float32)

    def step(S, inp):
        qt, kt, vt, gt = inp  # [B,H,Dk],[B,H,Dk],[B,H,Dv],[B,H,Dk]
        S = jnp.exp(gt)[..., None] * S + kt[..., None] * vt[..., None, :]
        ot = jnp.einsum("bhk,bhkv->bhv", qt, S)
        return S, ot

    xs = (
        jnp.moveaxis(qf, 2, 0),
        jnp.moveaxis(kf, 2, 0),
        jnp.moveaxis(vf, 2, 0),
        jnp.moveaxis(gf, 2, 0),
    )
    S, os_ = jax.lax.scan(step, initial_state, xs)
    o = jnp.moveaxis(os_, 0, 2)  # [B,H,T,Dv]
    return o.astype(v.dtype), S


def gla_quadratic(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    g: jax.Array,
    initial_state: Optional[jax.Array] = None,
    scale: Optional[float] = None,
) -> Tuple[jax.Array, jax.Array]:
    """O(T^2·D) closed form of the same recurrence — an independent oracle.

    o_t = scale * Σ_{s<=t} Σ_d q_t[d] k_s[d] exp(b_t[d]-b_s[d]) v_s
          + scale * Σ_d q_t[d] exp(b_t[d]) S0[d,:]
    with b = cumsum(g) inclusive.
    """
    B, H, T, Dk = q.shape
    Dv = v.shape[-1]
    if scale is None:
        scale = Dk ** -0.5
    qf = q.astype(jnp.float32) * scale
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    b = jnp.cumsum(g.astype(jnp.float32), axis=2)  # [B,H,T,Dk]

    # pairwise per-dim decay: exp(b_t - b_s) for s<=t else 0
    # A[t,s] = sum_d q_t[d] k_s[d] exp(b_t[d]-b_s[d])
    diff = b[:, :, :, None, :] - b[:, :, None, :, :]  # [B,H,T,S,Dk]
    causal = jnp.tril(jnp.ones((T, T), bool))
    decay = jnp.where(causal[None, None, :, :, None], jnp.exp(diff), 0.0)
    A = jnp.einsum("bhtd,bhsd,bhtsd->bhts", qf, kf, decay)
    o = jnp.einsum("bhts,bhsv->bhtv", A, vf)
    if initial_state is not None:
        o = o + jnp.einsum("bhtd,bhdv->bhtv", qf * jnp.exp(b), initial_state)
        final = (
            jnp.exp(b[:, :, -1])[..., None] * initial_state
            + jnp.einsum("bhsd,bhsd,bhsv->bhdv", kf,
                         jnp.exp(b[:, :, -1:, :] - b), vf)
        )
    else:
        final = jnp.einsum(
            "bhsd,bhsd,bhsv->bhdv", kf, jnp.exp(b[:, :, -1:, :] - b), vf
        )
    return o.astype(v.dtype), final


def gla_decode_step(
    q: jax.Array,  # [B, Hq, Dk]
    k: jax.Array,  # [B, Hkv, Dk]  (Hq = rep * Hkv: GQA group state)
    v: jax.Array,  # [B, Hkv, Dv]
    g: jax.Array,  # [B, Hkv, Dk]
    state: jax.Array,  # [B, Hkv, Dk, Dv] fp32
    scale: Optional[float] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Single decode token: the spec of `models/my_fused_recurrent.py:59-80`
    (state updated first, output computed against the NEW state).  With
    Hq > Hkv the `rep` query heads of a group read the group's single
    state (k/v/g are shared across the group, so the states coincide)."""
    Dk = q.shape[-1]
    if scale is None:
        scale = Dk ** -0.5
    S = (
        jnp.exp(g.astype(jnp.float32))[..., None] * state
        + k.astype(jnp.float32)[..., None] * v.astype(jnp.float32)[..., None, :]
    )
    B, Hq, _ = q.shape
    Hkv = k.shape[1]
    qg = (q.astype(jnp.float32) * scale).reshape(
        B, Hkv, Hq // Hkv, Dk)
    o = jnp.einsum("bgrk,bgkv->bgrv", qg, S).reshape(B, Hq, -1)
    return o.astype(v.dtype), S


# ---------------------------------------------------------------------------
# GLA gate construction (the two families' feature maps)
# ---------------------------------------------------------------------------

def hymeta_gates(
    q: jax.Array,          # [..., H, Dk] raw q after projection
    k: jax.Array,          # [..., H, Dk] raw k (already GQA-repeated)
    lower_bound: Optional[jax.Array],  # [H, Dk] fp32 or None
    clamp_max: float = 0.95,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """70B gate math (`modeling_hymeta.py:611-629`,
    `hf_model/linear_attention.py:143-157`): returns (q', k', g) where
    q' = relu(q); and with s = sigmoid(k) in fp32:
      no lower bound:  k' = clip(s, max=clamp_max); g = log(1 - k')
      lower bound lb:  G = 1 - (1-lb)*s ; k' = 1 - G ; g = log(G)
    """
    qp = jax.nn.relu(q)
    s = jax.nn.sigmoid(k.astype(jnp.float32))
    if lower_bound is None:
        kp = jnp.minimum(s, clamp_max)
        g = jnp.log1p(-kp)
    else:
        lb = lower_bound.astype(jnp.float32)
        G = 1.0 - (1.0 - lb) * s
        kp = 1.0 - G
        g = jnp.log(G)
    return qp, kp, g


def glaswa_gates(
    q: jax.Array,
    k: jax.Array,
    gk: jax.Array,  # raw low-rank gate projection output (GQA-repeated)
    gate_logit_normalizer: int = 16,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """7B gate math (`hf_7B_model/gla_attention.py:134-145`):
    q,k -> relu feature map; g = logsigmoid(gk)/normalizer (fp32)."""
    qp = jax.nn.relu(q)
    kp = jax.nn.relu(k)
    g = jax.nn.log_sigmoid(gk.astype(jnp.float32)) / gate_logit_normalizer
    return qp, kp, g


# ---------------------------------------------------------------------------
# softmax attention with sliding window (+ optional metatokens), LSE out
# ---------------------------------------------------------------------------

def _masked_attention(
    q: jax.Array,  # [B, Hq, Tq, D]
    k: jax.Array,  # [B, Hq, Tk, D]
    v: jax.Array,  # [B, Hq, Tk, D]
    mask: jax.Array,  # [Tq, Tk] or broadcastable bool
    scale: float,
) -> Tuple[jax.Array, jax.Array]:
    """Returns (out [B,Hq,Tq,D] fp32, lse [B,Hq,Tq] fp32, natural log)."""
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q.astype(jnp.float32), k.astype(jnp.float32)
    ) * scale
    logits = jnp.where(mask, logits, NEG_INF)
    m = jnp.max(logits, axis=-1, keepdims=True)
    m = jnp.where(jnp.isfinite(m), m, 0.0)  # all-masked rows
    p = jnp.exp(logits - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    out = jnp.einsum("bhqk,bhkd->bhqd", p, v.astype(jnp.float32))
    out = out / jnp.maximum(denom, 1e-37)
    lse = (m + jnp.log(jnp.maximum(denom, 1e-37)))[..., 0]
    return out, lse


def window_mask(
    q_pos: jax.Array,  # [Tq] absolute key-timeline positions of queries
    k_pos: jax.Array,  # [Tk]
    window: int,       # 0 => global
    inclusive: bool,
) -> jax.Array:
    """Causal sliding-window mask.

    window==0 -> plain causal (global).  Otherwise a query attends to key
    iff 0 <= q_pos - k_pos < window (exclusive, 70B naive spec
    `fa_kernel_metatoken.py:448-451`) or <= window (inclusive, 7B FA2
    convention `window_attention.py:191`).
    """
    d = q_pos[:, None] - k_pos[None, :]
    m = d >= 0
    if window > 0:
        m = m & (d <= window if inclusive else d < window)
    return m


def swa_attention(
    q: jax.Array,  # [B, Tq, Hq, D]
    k: jax.Array,  # [B, Tk, Hkv, D]
    v: jax.Array,
    q_pos: jax.Array,
    k_pos: jax.Array,
    window: int,
    inclusive: bool,
    scale: Optional[float] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Sliding-window attention with GQA; returns (out [B,Tq,Hq,D] fp32,
    lse [B,Hq,Tq] fp32)."""
    D = q.shape[-1]
    Hq, Hkv = q.shape[2], k.shape[2]
    if scale is None:
        scale = D ** -0.5
    rep = Hq // Hkv
    kk = jnp.repeat(k, rep, axis=2).transpose(0, 2, 1, 3)
    vv = jnp.repeat(v, rep, axis=2).transpose(0, 2, 1, 3)
    qq = q.transpose(0, 2, 1, 3)
    mask = window_mask(q_pos, k_pos, window, inclusive)
    out, lse = _masked_attention(qq, kk, vv, mask[None, None], scale)
    return out.transpose(0, 2, 1, 3), lse


def merge_lse(
    out1: jax.Array,  # [B, T, H, D] fp32 — windowed pass
    lse1: jax.Array,  # [B, H, T] fp32
    out2: jax.Array,  # [B, T, H, D] fp32 — metatoken pass
    lse2: jax.Array,  # [B, H, T] fp32
) -> Tuple[jax.Array, jax.Array]:
    """Numerically-stable softmax merge of two attention passes.

    Spec: `attention/fa_kernel_metatoken.py:110-122`:
        lse = lse1 - logsigmoid(lse1 - lse2)   ( = log(e^lse1 + e^lse2) )
        out = out1 - sigmoid(lse2 - lse1) * (out1 - out2)
    """
    new_lse = lse1 - jax.nn.log_sigmoid(lse1 - lse2)
    w2 = jax.nn.sigmoid(lse2 - lse1)  # [B,H,T]
    w2 = jnp.moveaxis(w2, 1, 2)[..., None]  # [B,T,H,1]
    out = out1 - w2 * (out1 - out2)
    return out, new_lse


def metatoken_swa_attention(
    q: jax.Array,   # [B, T, Hq, D] real-token queries (RoPE applied)
    k: jax.Array,   # [B, Tk, Hkv, D] real-token keys
    v: jax.Array,
    meta_k: jax.Array,  # [M, Hkv, D] cached metatoken keys
    meta_v: jax.Array,
    q_pos: jax.Array,
    k_pos: jax.Array,
    window: int,
    inclusive: bool = False,
    meta_q: Optional[jax.Array] = None,  # [M, Hq, D] (first pass only)
    scale: Optional[float] = None,
) -> Tuple[jax.Array, Optional[jax.Array]]:
    """Full metatoken attention semantics (two passes + LSE merge).

    Spec: `attention/fa_kernel_metatoken.py:377-410` (naive) and the serving
    two-pass implementation (`fa_kernel_metatoken.py:140-298`):
      pass 1: causal sliding-window over real tokens
      pass 2: non-causal attention of real queries vs the M metatokens
      merge:  softmax-consistent LSE merge
      meta queries (when given) attend ONLY to metatokens (non-causal) and
      their outputs are returned separately.

    Returns (real_out [B,T,Hq,D] in q.dtype, meta_out [M,Hq,D] or None).
    """
    B = q.shape[0]
    D = q.shape[-1]
    Hq, Hkv = q.shape[2], k.shape[2]
    if scale is None:
        scale = D ** -0.5
    rep = Hq // Hkv

    out1, lse1 = swa_attention(q, k, v, q_pos, k_pos, window, inclusive, scale)

    mk = jnp.repeat(meta_k, rep, axis=1)  # [M, Hq, D]
    mv = jnp.repeat(meta_v, rep, axis=1)
    M = mk.shape[0]
    qq = q.transpose(0, 2, 1, 3)  # [B,Hq,T,D]
    kk = jnp.broadcast_to(mk.transpose(1, 0, 2)[None], (B, Hq, M, D))
    vv = jnp.broadcast_to(mv.transpose(1, 0, 2)[None], (B, Hq, M, D))
    allow = jnp.ones((q.shape[1], M), bool)
    out2, lse2 = _masked_attention(qq, kk, vv, allow[None, None], scale)
    out2 = out2.transpose(0, 2, 1, 3)

    out, _ = merge_lse(out1, lse1, out2, lse2)
    out = out.astype(q.dtype)

    meta_out = None
    if meta_q is not None:
        mq = meta_q.transpose(1, 0, 2)[None]  # [1,Hq,M,D]
        mo, _ = _masked_attention(
            mq, kk[:1], vv[:1], jnp.ones((M, M), bool)[None, None], scale
        )
        meta_out = mo[0].transpose(1, 0, 2).astype(q.dtype)  # [M,Hq,D]
    return out, meta_out
