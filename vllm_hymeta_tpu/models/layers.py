"""Shared layer primitives: linear (with quantized dispatch), embeddings,
GLU MLP, MoE.

Linears are parameter dicts:
  bf16:  {"w": [in, out], "b"?: [out]}
  gptq:  {"qw": int8 [in, out] (int4 stored as int8) or packed,
          "scales": [in/g, out], "zeros": [in/g, out], "bits": ...}
  w8a8:  {"qw": int8 [in, out], "w_scale": [out]}

The quantized paths route to Pallas kernels (ops.quant_matmul); the bf16
path is a plain jnp matmul that XLA maps onto the MXU.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp

from vllm_hymeta_tpu.ops import quant_matmul


def linear(p: dict, x: jax.Array) -> jax.Array:
    """y = x @ w (+ b). Dispatches on the parameter layout."""
    if "act_perm" in p:
        # desc_act GPTQ: weight rows live in group order; gather the
        # activations to match (x[perm] @ W[perm] == x @ W)
        x = jnp.take(x, p["act_perm"], axis=-1)
    if "qw4" in p or "qw4p" in p:
        rows = 1
        for d in x.shape[:-1]:
            rows *= d
        if "qw8" in p and rows > 64:
            # dual-precision layout (quant/transform.attach_prefill_int8):
            # compute-bound prefill takes the INT8 shadow on the MXU's
            # int8 path; bandwidth-bound decode streams the INT4 packing
            y = quant_matmul.w8a8_matmul(x, p["qw8"], p["w8_scale"])
        elif "qw4p" in p and rows <= 64:
            # sublane-nibble-packed decode matvec (fuse_params "qw4p"
            # layout): in-kernel pltpu.bitcast unpack — native-s4 speed
            # with no per-decode-block conversion pass
            y = quant_matmul.int4gp_matvec(x, p["qw4p"], p["s4_scales"],
                                           p["s4_zeros"])
        elif "qw4g" in p and rows <= 64:
            # grouped-s4 decode matvec (prepare_decode_params layout):
            # native int4 reads at ~570 GB/s-of-int4 vs ~330 for the
            # VPU-unpack kernel below
            y = quant_matmul.int4g_matvec(x, p["qw4g"], p["s4_scales"],
                                          p["s4_zeros"])
        else:
            y = quant_matmul.int4_matmul(x, p["qw4"], p["scales"],
                                         p["zeros"])
    elif "qw" in p:
        if "w_scale" in p:
            y = quant_matmul.w8a8_matmul(x, p["qw"], p["w_scale"])
        else:
            y = quant_matmul.groupwise_dequant_matmul(
                x, p["qw"], p["scales"], p["zeros"])
    else:
        y = jnp.dot(x, p["w"], preferred_element_type=x.dtype)
    if "b" in p and p["b"] is not None:
        y = y + p["b"].astype(y.dtype)
    return y


def embed(p: dict, ids: jax.Array) -> jax.Array:
    return jnp.take(p["w"], ids, axis=0)


def lm_head(p: dict, x: jax.Array) -> jax.Array:
    """Final projection in fp32 (`modeling_hymeta.py:1413-1429,1459-1469`
    upcasts hidden states and keeps the LM head in fp32).  Also accepts
    the optional int8 layout (quant/transform.quantize_lm_head)."""
    if "qw" in p:
        # out_dtype=fp32: keep the scale multiply and logits in fp32
        return quant_matmul.w8a8_matmul(
            x.astype(jnp.bfloat16), p["qw"], p["w_scale"],
            out_dtype=jnp.float32)
    return jnp.dot(
        x.astype(jnp.float32), p["w"].astype(jnp.float32),
        preferred_element_type=jnp.float32)


def glu_mlp(p: dict, x: jax.Array) -> jax.Array:
    """SwiGLU MLP: down(silu(gate(x)) * up(x)).

    Reference: `hf_model/moe.py:9-29`, `hf_7B_model/modeling_gla_swa.py:33-54`.
    Supports the fused gate_up layout from models.common.fuse_params.
    """
    if "gate_up_proj" in p:
        gu = linear(p["gate_up_proj"], x)
        dp = p["down_proj"]
        rows = 1
        for d in gu.shape[:-1]:
            rows *= d
        # int8 down-proj weights: W8A8 proper ("qw") or the dual-precision
        # prefill shadow of an INT4 tensor ("qw8")
        qw8 = dp.get("qw") if ("qw" in dp and "w_scale" in dp) \
            else dp.get("qw8")
        ws8 = dp.get("w_scale") if "w_scale" in dp else dp.get("w8_scale")
        if qw8 is not None and rows > 64:
            # fuse silu·mul with the activation quant (one HBM pass) and
            # feed XLA's int8 dot pre-quantized
            sh = gu.shape
            qa, a_scale = quant_matmul.glu_quant(gu.reshape(-1, sh[-1]))
            y = quant_matmul.w8a8_matmul_prequant(
                qa, a_scale, qw8, ws8, out_dtype=x.dtype)
            # keep the residual-add + next-norm row-reduce OUT of the
            # matmul fusion: fused, XLA's int8 dot on this K=18944 shape
            # drops to ~half MXU rate (trace-verified 182 vs 366 TOPS)
            y = jax.lax.optimization_barrier(y)
            y = y.reshape(*sh[:-1], qw8.shape[1])
            if "b" in dp and dp["b"] is not None:
                y = y + dp["b"].astype(y.dtype)
            return y
        g, u = jnp.split(gu, 2, axis=-1)
    else:
        g = linear(p["gate_proj"], x)
        u = linear(p["up_proj"], x)
    return linear(p["down_proj"], jax.nn.silu(g) * u)


def moe_block(
    p: dict,
    x: jax.Array,            # [N, h]
    top_k: int,
    renormalize: bool,
) -> jax.Array:
    """Sparse MoE (dense-compute reference form, masked one-hot).

    Semantics: `hf_model/moe.py:34-102` — router softmax in fp32, top-k,
    optional renormalization (top-1 + renormalize => weight 1.0).  The
    efficient grouped-GEMM path lives in ops.moe_gemm; this masked form is
    the numerics spec and the small-batch fallback.
    """
    router_logits = jnp.dot(x, p["gate"]["w"],
                            preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(router_logits.astype(jnp.float32), axis=-1)
    topw, topi = jax.lax.top_k(probs, top_k)  # [N,k]
    if renormalize:
        topw = topw / jnp.sum(topw, axis=-1, keepdims=True)
    E = p["experts"]["gate_proj"].shape[0]

    # one-hot combine weights [N, E]
    comb = jax.nn.one_hot(topi, E, dtype=jnp.float32) * topw[..., None]
    comb = jnp.sum(comb, axis=1)  # [N, E]

    wg, wu, wd = (p["experts"]["gate_proj"], p["experts"]["up_proj"],
                  p["experts"]["down_proj"])
    # dense loop over experts (E is small: 16); XLA fuses each branch
    out = jnp.zeros(x.shape, jnp.float32)
    for e in range(E):
        g = jnp.dot(x, wg[e], preferred_element_type=jnp.float32)
        u = jnp.dot(x, wu[e], preferred_element_type=jnp.float32)
        h = jax.nn.silu(g) * u
        o = jnp.dot(h.astype(x.dtype), wd[e],
                    preferred_element_type=jnp.float32)
        out = out + comb[:, e:e + 1] * o
    return out.astype(x.dtype)


def moe_block_grouped(p: dict, x: jax.Array, top_k: int,
                      renormalize: bool) -> jax.Array:
    """Efficient top-1 MoE via sort + ragged grouped GEMM (ops.moe_gemm)."""
    from vllm_hymeta_tpu.ops import moe_gemm
    return moe_gemm.moe_apply(p, x, top_k=top_k, renormalize=renormalize)
