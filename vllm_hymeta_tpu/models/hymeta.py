"""Hymeta-70B ("hybrid"): every layer is an intra-layer hybrid — a
sliding-window softmax branch with 128 global metatokens AND a gated linear
attention branch over the same normalized input, RMS-normed and averaged —
with MoE(16, top-1) + shared-MLP FFNs on most layers.

Semantics references:
  * hybrid average: `hf_model/modeling_hymeta.py:127-128`
    ((norm1(attn) + norm2(linear)) / 2 -> out_proj)
  * SWA branch + metatoken split/caching: `hf_model/attention.py:97-263`,
    serving two-pass LSE merge `attention/fa_kernel_metatoken.py:140-298`
  * GLA branch gates/lower bounds: `hf_model/linear_attention.py:143-157`,
    `modeling_hymeta.py:611-629`
  * lower-bound schedule: softmax(0).cumsum(0) - lb[0]
    (`hf_model/modeling_hymeta.py:339-341`)
  * metatokens prepended, positions offset by num_meta_tokens
    (`hf_model/modeling_hymeta.py:313-316`, `modeling_hymeta.py:1313-1323`)
  * MoE + shared MLP: `hf_model/moe.py:34-102`,
    `hf_model/modeling_hymeta.py:190-198`
  * fp32 LM head: `modeling_hymeta.py:1413-1429,1459-1469`

TPU-first deviation: the metatoken state is input-independent (metatokens
attend only to themselves in both branches), so `precompute_meta` runs the
metatoken-only forward once after weight loading and caches per layer the
GLA state [H, Dk, Dv] and the SWA K/V [M, Hkv, D].  This replaces the
reference's warm-up threshold hacks (`modeling_hymeta.py:1160-1164`) and
per-prefill recomputation (`modeling_hymeta.py:444-467`) with an exact,
one-time computation.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from vllm_hymeta_tpu import cache as cache_lib
from vllm_hymeta_tpu.config import HymetaConfig
from vllm_hymeta_tpu.models import common
from vllm_hymeta_tpu.models.layers import (embed, glu_mlp, linear,
                                           lm_head, moe_block,
                                           moe_block_grouped)
from vllm_hymeta_tpu.ops import gla_chunk, naive, swa
from vllm_hymeta_tpu.parallel.pctx import NULL_CTX, rms_norm_tp


# ---------------------------------------------------------------------------
# parameters
# ---------------------------------------------------------------------------

def init_params(cfg: HymetaConfig, key: jax.Array,
                dtype=jnp.bfloat16) -> dict:
    h, D = cfg.hidden_size, cfg.head_dim
    kvd = cfg.num_key_value_heads * D
    E = cfg.num_local_experts
    keys = iter(jax.random.split(key, 16 * cfg.num_hidden_layers + 8))
    layers = []
    for i in range(cfg.num_hidden_layers):
        attn = {
            "swa": {
                "q_proj": common.init_linear(next(keys), h, h, True, dtype),
                "k_proj": common.init_linear(next(keys), h, kvd, True, dtype),
                "v_proj": common.init_linear(next(keys), h, kvd, True, dtype),
            },
            "gla": {
                "q_proj": common.init_linear(next(keys), h, h, True, dtype),
                "k_proj": common.init_linear(next(keys), h, kvd, True, dtype),
                "v_proj": common.init_linear(next(keys), h, kvd, True, dtype),
            },
            "norm1": {"w": jnp.ones((h,), dtype)},
            "norm2": {"w": jnp.ones((h,), dtype)},
            "out_proj": common.init_linear(next(keys), h, h, False, dtype),
        }
        lp = {
            "attn_norm": {"w": jnp.ones((h,), dtype)},
            "mlp_norm": {"w": jnp.ones((h,), dtype)},
            "attn": attn,
        }
        if cfg.is_dense_mlp_layer(i):
            lp["mlp"] = common.init_glu(next(keys), h,
                                        cfg.intermediate_size, dtype)
        else:
            ke = jax.random.split(next(keys), 3)
            lp["moe"] = {
                "gate": common.init_linear(next(keys), h, E, False, dtype),
                "experts": {
                    "gate_proj": (jax.random.normal(
                        ke[0], (E, h, cfg.intermediate_size), jnp.float32)
                        * 0.02).astype(dtype),
                    "up_proj": (jax.random.normal(
                        ke[1], (E, h, cfg.intermediate_size), jnp.float32)
                        * 0.02).astype(dtype),
                    "down_proj": (jax.random.normal(
                        ke[2], (E, cfg.intermediate_size, h), jnp.float32)
                        * 0.02).astype(dtype),
                },
            }
            if cfg.shared_intermediate_size > 0:
                lp["shared_mlp"] = common.init_glu(
                    next(keys), h, cfg.shared_intermediate_size, dtype)
        layers.append(lp)

    params = {
        "embed": {"w": (jax.random.normal(
            next(keys), (cfg.vocab_size, h), jnp.float32) * 0.02
        ).astype(dtype)},
        "layers": layers,
        "final_norm": {"w": jnp.ones((h,), dtype)},
        # fp32 LM head (`modeling_hymeta.py:1413-1429`)
        "lm_head": {"w": jax.random.normal(
            next(keys), (h, cfg.vocab_size), jnp.float32) * 0.02},
        "meta_tokens": (jax.random.normal(
            next(keys), (cfg.num_meta_tokens, h), jnp.float32)).astype(dtype),
    }
    if cfg.use_lower_bound:
        params["lower_bounds"] = jnp.zeros(
            (cfg.num_hidden_layers, h), jnp.float32)
    return params


def init_cache(cfg: HymetaConfig, cc: cache_lib.CacheConfig) -> dict:
    layers = []
    for i in range(cfg.num_hidden_layers):
        lc = cache_lib.init_layer_kv(
            cc, cfg.num_key_value_heads, cfg.head_dim,
            0 if cfg.is_full_attn_layer(i) else cfg.window_keys)
        lc.update(cache_lib.init_layer_state(
            cc, cfg.num_attention_heads, cfg.head_dim))
        layers.append(lc)
    return {"layers": layers}


# ---------------------------------------------------------------------------
# shared pieces
# ---------------------------------------------------------------------------

def lower_bound_table(cfg: HymetaConfig,
                      params: dict) -> Optional[jax.Array]:
    """lbs = softmax(raw, axis=0).cumsum(0) - lbs[0]
    (`hf_model/modeling_hymeta.py:339-341`)."""
    if not cfg.use_lower_bound:
        return None
    raw = params["lower_bounds"].astype(jnp.float32)
    sm = jax.nn.softmax(raw, axis=0)
    return jnp.cumsum(sm, axis=0) - sm[0]


def _layer_lower_bound(cfg: HymetaConfig, lbs: Optional[jax.Array],
                       i: int, pctx=NULL_CTX) -> Optional[jax.Array]:
    """Per-layer lower bound reshaped to [H_local, D], or None where
    disabled.  Under TP `lbs` arrives head-sharded, matching the per-rank
    slice at `modeling_hymeta.py:623-625`."""
    if lbs is None or cfg.lower_bound_disabled(i):
        return None
    lb = lbs[cfg.lower_bound_index(i)]
    H, _ = common.local_heads(cfg, pctx)
    return lb.reshape(H, cfg.head_dim)


def _project_both(cfg: HymetaConfig, ap: dict, x: jax.Array,
                  pctx=NULL_CTX):
    """Project both branches' q/k/v — one fused matmul when fuse_params
    merged them (qkv6_proj), else two QKV projections.
    Returns ((sq, sk, sv), (gq, gk, gv)) with heads split."""
    H, Hkv = common.local_heads(cfg, pctx)
    D = cfg.head_dim
    if "qkv6_proj" in ap:
        qd, kvd = H * D, Hkv * D
        y = linear(ap["qkv6_proj"], x)
        cuts = [qd, qd + kvd, qd + 2 * kvd, 2 * qd + 2 * kvd,
                2 * qd + 3 * kvd]
        sq, sk, sv, gq, gk, gv = jnp.split(y, cuts, axis=-1)
        return ((common.split_heads(sq, H), common.split_heads(sk, Hkv),
                 common.split_heads(sv, Hkv)),
                (common.split_heads(gq, H), common.split_heads(gk, Hkv),
                 common.split_heads(gv, Hkv)))
    return (common.project_qkv(ap["swa"], x, H, Hkv, D),
            common.project_qkv(ap["gla"], x, H, Hkv, D))


def _gla_qkvg(cfg: HymetaConfig, gp: dict, x: jax.Array,
              lower_bound: Optional[jax.Array], pctx=NULL_CTX,
              qkv=None):
    """70B GLA branch projections + gates. x: [..., T, h]."""
    H, Hkv = common.local_heads(cfg, pctx)
    D = cfg.head_dim
    if qkv is None:
        qkv = common.project_qkv(gp, x, H, Hkv, D)
    q, k, v = qkv
    rep = H // Hkv
    k = common.repeat_kv_heads(k, rep)
    v = common.repeat_kv_heads(v, rep)
    q, k, g = naive.hymeta_gates(q, k, lower_bound, cfg.clamp_max)
    return q, k.astype(v.dtype), v, g


def _ffn(cfg: HymetaConfig, lp: dict, x: jax.Array,
         grouped_moe: bool = True, pctx=NULL_CTX) -> jax.Array:
    """Dense GLU or MoE + shared MLP (`hf_model/modeling_hymeta.py:190-198`).

    All three sub-paths produce row-parallel partial sums (TP-sharded down
    projections; EP-sharded experts), merged by ONE psum at the end —
    replacing the separate all-reduces of vLLM's RowParallelLinear +
    FusedMoE(reduce_results=True) (`modeling_hymeta.py:312-324`)."""
    if "mlp" in lp:
        return pctx.psum(glu_mlp(lp["mlp"], x))
    shape = x.shape
    flat = x.reshape(-1, shape[-1])
    if (pctx.model_axis is not None and pctx.ep_a2a
            and flat.shape[0] % pctx.tp == 0):
        # real EP dispatch: route this rank's token shard with
        # ragged_all_to_all (only off-rank-routed rows move), combine with
        # the reverse a2a, then all-gather token shards back to the
        # replicated layout.  The MoE part arrives COMPLETE (not a partial
        # sum), so only the shared MLP still needs the TP psum.
        from vllm_hymeta_tpu.ops import moe_gemm
        n_local = flat.shape[0] // pctx.tp
        x_local = jax.lax.dynamic_slice_in_dim(
            flat, pctx.rank() * n_local, n_local, axis=0)
        y_local = moe_gemm.moe_apply_ep_a2a(
            lp["moe"], x_local, top_k=cfg.num_experts_per_topk,
            renormalize=cfg.moe_renormalize,
            axis_name=pctx.model_axis,
            num_global_experts=cfg.num_local_experts)
        y = pctx.all_gather(y_local, axis=0).reshape(shape)
        if "shared_mlp" in lp:
            y = y + pctx.psum(glu_mlp(lp["shared_mlp"], x))
        return y
    if pctx.model_axis is not None:
        from vllm_hymeta_tpu.ops import moe_gemm
        e_local = lp["moe"]["experts"]["gate_proj"].shape[0]
        y = moe_gemm.moe_apply(
            lp["moe"], flat, top_k=cfg.num_experts_per_topk,
            renormalize=cfg.moe_renormalize,
            expert_offset=pctx.rank() * e_local,
            num_global_experts=cfg.num_local_experts)
    else:
        fn = moe_block_grouped if grouped_moe else moe_block
        y = fn(lp["moe"], flat, cfg.num_experts_per_topk,
               cfg.moe_renormalize)
    y = y.reshape(shape)
    if "shared_mlp" in lp:
        y = y + glu_mlp(lp["shared_mlp"], x)
    return pctx.psum(y)


# ---------------------------------------------------------------------------
# metatoken precompute
# ---------------------------------------------------------------------------

def precompute_meta(cfg: HymetaConfig, params: dict) -> dict:
    """Run the metatoken-only forward once; cache per layer the SWA K/V
    (post-RoPE, positions 0..M-1) and the GLA final state.

    Exact because metatokens never attend to real tokens in either branch
    (`fa_kernel_metatoken.py:455-456`: meta queries see only meta keys; GLA
    is causal and metatokens come first).  Replaces the per-run meta cache
    computation at `modeling_hymeta.py:444-467` / meta split at `:774-792`.
    """
    M = cfg.num_meta_tokens
    H, Hkv, D = (cfg.num_attention_heads, cfg.num_key_value_heads,
                 cfg.head_dim)
    lbs = lower_bound_table(cfg, params)
    x = params["meta_tokens"].astype(params["embed"]["w"].dtype)  # [M, h]
    positions = jnp.arange(M, dtype=jnp.int32)

    meta = {"k": [], "v": [], "state": []}
    for i, lp in enumerate(params["layers"]):
        res = x
        y = naive.rms_norm(x, lp["attn_norm"]["w"], cfg.norm_eps)
        ap = lp["attn"]

        # SWA branch on metatokens: RoPE then self-only non-causal attention
        swa_qkv, gla_qkv = _project_both(cfg, ap, y[None])
        q, k, v = swa_qkv
        cos, sin = naive.rope_cos_sin(positions[None], D, cfg.rope_theta)
        q = naive.apply_rope(q, cos, sin)
        k = naive.apply_rope(k, cos, sin)
        meta['k'].append(k[0])
        meta['v'].append(v[0])
        # meta queries attend ALL metatokens non-causally
        # (`fa_kernel_metatoken.py:455-456`)
        out, _ = swa.flash_window_prefill_ref(
            q[0], k[0], v[0], positions, positions, 0, mask_mode="all")
        swa_out = out.astype(y.dtype)[None]

        # GLA branch from zero state
        lb = _layer_lower_bound(cfg, lbs, i)
        qg, kg, vg, g = _gla_qkvg(cfg, ap["gla"], y[None], lb,
                                  qkv=gla_qkv)
        o, S = gla_chunk.gla_chunked(
            qg.transpose(0, 2, 1, 3), kg.transpose(0, 2, 1, 3),
            vg.transpose(0, 2, 1, 3), g.transpose(0, 2, 1, 3))
        meta["state"].append(S[0])
        gla_out = o[0].transpose(1, 0, 2)[None]

        att = _hybrid_merge(cfg, ap, common.merge_heads(swa_out[0]),
                            common.merge_heads(gla_out[0]))
        y2, res = naive.rms_norm_residual(att, res,
                                          lp["mlp_norm"]["w"], cfg.norm_eps)
        x = res + _ffn(cfg, lp, y2, grouped_moe=False)

    return {
        "k": jnp.stack(meta["k"]),        # [L, M, Hkv, D]
        "v": jnp.stack(meta["v"]),
        "state": jnp.stack(meta["state"]),  # [L, H, Dk, Dv] fp32
    }


def _hybrid_merge(cfg: HymetaConfig, ap: dict, swa_out: jax.Array,
                  gla_out: jax.Array, pctx=NULL_CTX) -> jax.Array:
    """(norm1(attn) + norm2(linear)) / 2 -> out_proj
    (`hf_model/modeling_hymeta.py:127-128`, `modeling_hymeta.py:909-920`).
    swa_out/gla_out: [..., T, h_local] (heads already merged).  Under TP
    the norms reduce variance across the model axis
    (HymetaRMSNormTP, `modeling_hymeta.py:122-181`) and out_proj is
    row-parallel (psum)."""
    a = rms_norm_tp(swa_out, ap["norm1"]["w"], cfg.norm_eps, pctx)
    b = rms_norm_tp(gla_out, ap["norm2"]["w"], cfg.norm_eps, pctx)
    mixed = ((a.astype(jnp.float32) + b.astype(jnp.float32)) / 2
             ).astype(swa_out.dtype)
    return pctx.psum(linear(ap["out_proj"], mixed))


# ---------------------------------------------------------------------------
# full forward (golden path; metatokens inline, exactly like HF)
# ---------------------------------------------------------------------------

def layer_forward(cfg: HymetaConfig, lp: dict, x: jax.Array,
                  positions: jax.Array, i: int, lbs) -> jax.Array:
    """One full-sequence decoder layer over the [meta ∥ tokens] stream
    (the body of forward_full, exposed for the golden path, calibration
    (quant/gptq.py) and any layer-sequential driver).  x: [B, M+T, h]."""
    B = x.shape[0]
    M = cfg.num_meta_tokens
    T = x.shape[1] - M
    H, Hkv, D = (cfg.num_attention_heads, cfg.num_key_value_heads,
                 cfg.head_dim)
    res = x
    y = naive.rms_norm(x, lp["attn_norm"]["w"], cfg.norm_eps)
    ap = lp["attn"]

    # SWA branch with metatokens
    q, k, v = common.project_qkv(ap["swa"], y, H, Hkv, D)
    cos, sin = naive.rope_cos_sin(positions[None], D, cfg.rope_theta)
    q = naive.apply_rope(q, cos, sin)
    k = naive.apply_rope(k, cos, sin)
    if swa.can_flash_train(M + T, D):
        # ONE differentiable splash pass over [meta ∥ tokens]: the
        # windowed-causal OR meta-column mask reproduces the two-pass
        # LSE merge exactly, with flash fwd+bwd (O(T·W+T·M) memory)
        swa_out = swa.train_window_attention(
            q, k, v, cfg.layer_window(i), num_meta=M).astype(y.dtype)
    else:
        out, meta_out = naive.metatoken_swa_attention(
            q[:, M:], k[:, M:], v[:, M:], k[0, :M], v[0, :M],
            positions[M:], positions[M:], cfg.layer_window(i),
            cfg.inclusive_window, meta_q=q[0, :M])
        swa_out = jnp.concatenate(
            [jnp.broadcast_to(meta_out[None], (B, M, H, D)), out],
            axis=1)

    # GLA branch (metatokens are just the first M positions)
    lb = _layer_lower_bound(cfg, lbs, i)
    qg, kg, vg, g = _gla_qkvg(cfg, ap["gla"], y, lb)
    o, _ = gla_chunk.gla_chunked(
        qg.transpose(0, 2, 1, 3), kg.transpose(0, 2, 1, 3),
        vg.transpose(0, 2, 1, 3), g.transpose(0, 2, 1, 3))
    gla_out = o.transpose(0, 2, 1, 3)

    att = _hybrid_merge(cfg, ap, common.merge_heads(swa_out),
                        common.merge_heads(gla_out))
    y2, res2 = naive.rms_norm_residual(att, res, lp["mlp_norm"]["w"],
                                       cfg.norm_eps)
    return res2 + _ffn(cfg, lp, y2, grouped_moe=False)


def forward_full(cfg: HymetaConfig, params: dict,
                 tokens: jax.Array, remat: bool = False) -> jax.Array:
    """tokens [B, T] -> logits [B, T, V] fp32.  Prepends the metatokens and
    strips them at the end (`hf_model/modeling_hymeta.py:313-316,384-385`).

    remat=True checkpoints each layer (the reference's
    `gradient_checkpointing`, `hf_model/modeling_hymeta.py:349-361`)."""
    B, T = tokens.shape
    M = cfg.num_meta_tokens
    lbs = lower_bound_table(cfg, params)
    emb = embed(params["embed"], tokens)
    meta = jnp.broadcast_to(
        params["meta_tokens"].astype(emb.dtype)[None], (B, M, emb.shape[-1]))
    x = jnp.concatenate([meta, emb], axis=1)
    positions = jnp.arange(M + T, dtype=jnp.int32)

    for i, lp in enumerate(params["layers"]):
        fn = functools.partial(layer_forward, cfg, positions=positions,
                               i=i, lbs=lbs)
        if remat:
            fn = jax.checkpoint(fn)
        x = fn(lp, x)

    x = naive.rms_norm(x, params["final_norm"]["w"], cfg.norm_eps)
    x = x[:, M:]
    return lm_head(params["lm_head"], x)


# ---------------------------------------------------------------------------
# prefill
# ---------------------------------------------------------------------------

def prefill(cfg: HymetaConfig, params: dict, meta: dict, cache: dict,
            tokens: jax.Array, slot: jax.Array, pos0: jax.Array,
            n_valid: jax.Array, pctx=NULL_CTX,
            need_logits: bool = True) -> Tuple[jax.Array, dict]:
    """One prompt chunk for `slot` using the precomputed meta caches.

    The engine must initialize the slot's GLA state to meta["state"] before
    the first chunk (the reference seeds prefill with the meta linear cache:
    `modeling_hymeta.py:486-504`).
    """
    T = tokens.shape[0]
    M = cfg.num_meta_tokens
    lbs = lower_bound_table(cfg, params)
    n_local_slots = cache["layers"][0]["state"].shape[0]
    lslot, owned = pctx.local_slot(slot, n_local_slots)
    positions = pos0 + jnp.arange(T, dtype=jnp.int32)
    rope_pos = positions + M  # offset (`modeling_hymeta.py:1313-1323`)
    valid = jnp.arange(T) < n_valid
    x = common.embed_vp(params["embed"], tokens, pctx)

    H, Hkv = common.local_heads(cfg, pctx)
    D = cfg.head_dim
    new_layers = []
    for i, lp in enumerate(params["layers"]):
        res = x
        y = naive.rms_norm(x, lp["attn_norm"]["w"], cfg.norm_eps)
        ap = lp["attn"]
        lc = cache["layers"][i]
        window = cfg.layer_window(i)

        # ---- SWA branch: windowed pass + metatoken pass, LSE merge
        swa_qkv, gla_qkv = _project_both(cfg, ap, y[None], pctx)
        q, k, v = swa_qkv
        cos, sin = naive.rope_cos_sin(rope_pos[None], D, cfg.rope_theta)
        q = naive.apply_rope(q, cos, sin)[0]
        k = naive.apply_rope(k, cos, sin)[0]
        v = v[0]
        ctx_k, ctx_v, ctx_pos = common.gather_ring_context(lc, lslot, pos0)
        R = ctx_k.shape[0]
        k_all = jnp.concatenate([ctx_k, k], axis=0)
        v_all = jnp.concatenate([ctx_v, v], axis=0)
        qp = jnp.where(valid, positions, swa.INVALID_POS)
        kp_all = jnp.concatenate([ctx_pos, qp])
        out1, lse1 = swa.flash_window_prefill(
            q, k_all, v_all, qp, kp_all, window, ctx_len=R,
            mask_mode="window" if window > 0 else "causal")
        out2, lse2 = swa.flash_window_prefill(
            q, meta["k"][i], meta["v"][i],
            qp, jnp.zeros((M,), jnp.int32), 0, mask_mode="all")
        mo, _ = swa.merge_two(
            jnp.swapaxes(out1, 0, 1).astype(jnp.float32), lse1,
            jnp.swapaxes(out2, 0, 1).astype(jnp.float32), lse2)
        swa_out = jnp.swapaxes(mo, 0, 1).astype(y.dtype)  # [T, H, D]
        lc = cache_lib.write_prefill_kv(lc, lslot, k, v, positions, valid,
                                        enable=owned)

        # ---- GLA branch
        lb = _layer_lower_bound(cfg, lbs, i, pctx)
        qg, kg, vg, g = _gla_qkvg(
            cfg, ap["gla"], y, lb, pctx,
            qkv=tuple(t[0] for t in gla_qkv))
        kg = jnp.where(valid[:, None, None], kg, 0.0)
        vg = jnp.where(valid[:, None, None], vg, 0.0)
        g = jnp.where(valid[:, None, None], g, 0.0)
        S0 = lc["state"][lslot][None].astype(jnp.float32)
        o, S = gla_chunk.gla_chunked(
            qg.transpose(1, 0, 2)[None], kg.transpose(1, 0, 2)[None],
            vg.transpose(1, 0, 2)[None], g.transpose(1, 0, 2)[None],
            initial_state=S0)
        gla_out = o[0].transpose(1, 0, 2)
        lc = dict(lc)
        S_new = jnp.where(owned, S[0].astype(lc["state"].dtype),
                          lc["state"][lslot])
        lc["state"] = lc["state"].at[lslot].set(S_new)
        new_layers.append(lc)

        att = _hybrid_merge(cfg, ap, common.merge_heads(swa_out),
                            common.merge_heads(gla_out), pctx)
        y2, res = naive.rms_norm_residual(att, res, lp["mlp_norm"]["w"],
                                          cfg.norm_eps)
        x = res + _ffn(cfg, lp, y2, pctx=pctx)

    if not need_logits:
        # mid-prompt chunk: skip the fp32 LM head read + sampling
        return jnp.zeros((cfg.vocab_size,), jnp.float32), \
            {"layers": new_layers}
    x_last = x[n_valid - 1]
    x_last = naive.rms_norm(x_last, params["final_norm"]["w"], cfg.norm_eps)
    logits = common.lm_head_gather(params["lm_head"], x_last, pctx)
    if pctx.data_axis is not None:
        logits = pctx.psum_data(jnp.where(owned, logits, 0.0))
    return logits, {"layers": new_layers}


def prefill_split(cfg: HymetaConfig, params: dict, meta: dict, cache: dict,
                  tokens: jax.Array, slot: jax.Array, pos0: jax.Array,
                  n_valid: jax.Array, pctx,
                  need_logits: bool = True) -> Tuple[jax.Array, dict]:
    """Split-T prefill: ONE request's chunk token-sharded over the data
    ranks (see gla_swa.prefill_split for the scheme; VERDICT r3 item 6).

    70B specifics relative to the 7B:
      * every layer runs BOTH branches; the metatoken pass uses the
        replicated meta caches against local queries, so only the
        windowed/causal pass needs the key all-gather;
      * global layers (window=0) attend the FULL prefix, so the per-rank
        context must include every earlier key, not just the last R: the
        key timeline is [pad(T-Tl) ∥ ring(R) ∥ chunk(T)] and each rank
        takes the static-size slice [seg0, seg0 + (T-Tl) + R + Tl) —
        ctx_len = R + T - Tl keeps the splash index-alignment contract
        for both mask modes (the window mask never visits the extra
        blocks, so windowed layers pay nothing for the padding);
      * the slot's GLA state is meta-seeded — owner-broadcast like the
        ring context.
    """
    T = tokens.shape[0]
    M = cfg.num_meta_tokens
    dp = jax.lax.axis_size(pctx.data_axis)
    Tl = T // dp
    assert Tl * dp == T, (T, dp)
    r = pctx.data_rank()
    seg0 = r * Tl
    P = T - Tl                               # junk-pad before the ring
    lbs = lower_bound_table(cfg, params)
    n_local_slots = cache["layers"][0]["state"].shape[0]
    lslot, owned = pctx.local_slot(slot, n_local_slots)
    H, Hkv = common.local_heads(cfg, pctx)
    D = cfg.head_dim
    rep = H // Hkv
    scale = D ** -0.5

    positions_f = pos0 + jnp.arange(T, dtype=jnp.int32)
    valid_f = jnp.arange(T) < n_valid
    kp_full = jnp.where(valid_f, positions_f, swa.INVALID_POS)
    toks_l = jax.lax.dynamic_slice(tokens, (seg0,), (Tl,))
    pos_l = jax.lax.dynamic_slice(positions_f, (seg0,), (Tl,))
    valid_l = jax.lax.dynamic_slice(valid_f, (seg0,), (Tl,))
    rope_pos = pos_l + M
    x = common.embed_vp(params["embed"], toks_l, pctx)

    new_layers = []
    for i, lp in enumerate(params["layers"]):
        res = x
        y = naive.rms_norm(x, lp["attn_norm"]["w"], cfg.norm_eps)
        ap = lp["attn"]
        lc = cache["layers"][i]
        window = cfg.layer_window(i)

        # ---- SWA branch: windowed/causal pass + metatoken pass
        swa_qkv, gla_qkv = _project_both(cfg, ap, y[None], pctx)
        q, k, v = swa_qkv
        cos, sin = naive.rope_cos_sin(rope_pos[None], D, cfg.rope_theta)
        q = naive.apply_rope(q, cos, sin)[0]
        k = naive.apply_rope(k, cos, sin)[0]
        v = v[0]                                            # [Tl, Hkv, D]
        k_full = pctx.data_all_gather(k, axis=0)            # [T, Hkv, D]
        v_full = pctx.data_all_gather(v, axis=0)
        ctx_k, ctx_v, ctx_pos = common.gather_ring_context(lc, lslot, pos0)
        ctx_k = pctx.psum_data(jnp.where(owned, ctx_k, 0.0))
        ctx_v = pctx.psum_data(jnp.where(owned, ctx_v, 0.0))
        R = ctx_k.shape[0]
        C = R + P                                           # static ctx_len
        pad_k = jnp.zeros((P, Hkv, D), k_full.dtype)
        allk = jnp.concatenate([pad_k, ctx_k, k_full], axis=0)
        allv = jnp.concatenate([pad_k, ctx_v, v_full], axis=0)
        allp = jnp.concatenate(
            [jnp.full((P,), swa.INVALID_POS, jnp.int32), ctx_pos, kp_full])
        k_in = jax.lax.dynamic_slice(allk, (seg0, 0, 0), (C + Tl, Hkv, D))
        v_in = jax.lax.dynamic_slice(allv, (seg0, 0, 0), (C + Tl, Hkv, D))
        kp_in = jax.lax.dynamic_slice(allp, (seg0,), (C + Tl,))
        qp = jnp.where(valid_l, pos_l, swa.INVALID_POS)
        out1, lse1 = swa.flash_window_prefill(
            q, k_in, v_in, qp, kp_in, window, ctx_len=C,
            mask_mode="window" if window > 0 else "causal")
        out2, lse2 = swa.flash_window_prefill(
            q, meta["k"][i], meta["v"][i],
            qp, jnp.zeros((M,), jnp.int32), 0, mask_mode="all")
        mo, _ = swa.merge_two(
            jnp.swapaxes(out1, 0, 1).astype(jnp.float32), lse1,
            jnp.swapaxes(out2, 0, 1).astype(jnp.float32), lse2)
        swa_out = jnp.swapaxes(mo, 0, 1).astype(y.dtype)    # [Tl, H, D]
        lc = cache_lib.write_prefill_kv(lc, lslot, k_full, v_full,
                                        positions_f, valid_f, enable=owned)

        # ---- GLA branch (associative split, see gla_swa.prefill_split)
        lb = _layer_lower_bound(cfg, lbs, i, pctx)
        qg, kg, vg, g = _gla_qkvg(
            cfg, ap["gla"], y, lb, pctx,
            qkv=tuple(t[0] for t in gla_qkv))
        kg = jnp.where(valid_l[:, None, None], kg, 0.0)
        vg = jnp.where(valid_l[:, None, None], vg, 0.0)
        g = jnp.where(valid_l[:, None, None], g, 0.0)
        o0, U = gla_chunk.gla_chunked(
            qg.transpose(1, 0, 2)[None], kg.transpose(1, 0, 2)[None],
            vg.transpose(1, 0, 2)[None], g.transpose(1, 0, 2)[None],
            initial_state=jnp.zeros((1, kg.shape[1], D, D), jnp.float32))
        gf = g.astype(jnp.float32)
        bts = pctx.data_all_gather(jnp.sum(gf, axis=0)[None], axis=0)
        Us = pctx.data_all_gather(U[0][None], axis=0)
        S0 = pctx.psum_data(jnp.where(
            owned, lc["state"][lslot].astype(jnp.float32), 0.0))
        S_cur = S0
        prefix = []
        for j in range(dp):
            prefix.append(S_cur)
            S_cur = jnp.exp(bts[j])[..., None] * S_cur + Us[j]
        S_out = S_cur
        S_in = jnp.stack(prefix)[r]
        grep = kg.shape[1]
        qrep = qg.shape[1] // grep
        qs = (qg.astype(jnp.float32) * scale
              * jnp.repeat(jnp.exp(jnp.cumsum(gf, axis=0)), qrep, axis=1))
        o_corr = jnp.einsum("thd,hdv->thv", qs,
                            jnp.repeat(S_in, qrep, axis=0))
        gla_out = o0[0].transpose(1, 0, 2).astype(jnp.float32) + o_corr
        lc = dict(lc)
        S_new = jnp.where(owned, S_out.astype(lc["state"].dtype),
                          lc["state"][lslot])
        lc["state"] = lc["state"].at[lslot].set(S_new)
        new_layers.append(lc)

        att = _hybrid_merge(cfg, ap, common.merge_heads(swa_out),
                            common.merge_heads(gla_out.astype(y.dtype)),
                            pctx)
        y2, res = naive.rms_norm_residual(att, res, lp["mlp_norm"]["w"],
                                          cfg.norm_eps)
        x = res + _ffn(cfg, lp, y2, pctx=pctx)

    if not need_logits:
        return jnp.zeros((cfg.vocab_size,), jnp.float32), \
            {"layers": new_layers}
    gi = n_valid - 1
    li = jnp.clip(gi - seg0, 0, Tl - 1)
    x_last = jnp.where(gi // Tl == r, x[li], 0.0)
    x_last = jax.lax.psum(x_last, pctx.data_axis)
    x_last = naive.rms_norm(x_last, params["final_norm"]["w"], cfg.norm_eps)
    logits = common.lm_head_gather(params["lm_head"], x_last, pctx)
    return logits, {"layers": new_layers}


def prefill_mixed(cfg: HymetaConfig, params: dict, meta: dict, cache: dict,
                  tokens: jax.Array,       # [T] prefill chunk (padded)
                  slot: jax.Array,         # scalar int32
                  pos0: jax.Array,         # scalar int32
                  n_valid: jax.Array,      # scalar int32
                  d_tokens: jax.Array,     # [S] one decode token per slot
                  d_positions: jax.Array,  # [S]
                  d_active: jax.Array,     # [S] bool (False for `slot`)
                  need_logits: bool = True,
                  pctx=NULL_CTX,
                  ) -> Tuple[jax.Array, jax.Array, dict]:
    """ONE program = one prefill chunk + one decode step — the TPU form of
    the reference's mixed `[meta | prefills | decodes]` batches
    (`attention/meta_attention.py:612-639`).  Decode rows share every
    projection/branch/MLP matmul with the chunk rows; see
    gla_swa.prefill_mixed for the design notes (incl. the mesh/pctx
    contract: sharded slot batch, owner-masked or dp-grouped chunk).

    Returns (prefill_logits [V], decode_logits [S, V], cache)."""
    T = tokens.shape[0]
    S = d_tokens.shape[0]
    M = cfg.num_meta_tokens
    lbs = lower_bound_table(cfg, params)
    n_local_slots = cache["layers"][0]["state"].shape[0]
    lslot, owned = pctx.local_slot(slot, n_local_slots)
    positions = pos0 + jnp.arange(T, dtype=jnp.int32)
    valid = jnp.arange(T) < n_valid
    all_tokens = jnp.concatenate([tokens, d_tokens])
    all_positions = jnp.concatenate([positions, d_positions])
    rope_pos = all_positions + M  # offset (`modeling_hymeta.py:1313-1323`)
    x = common.embed_vp(params["embed"], all_tokens, pctx)

    H, Hkv = common.local_heads(cfg, pctx)
    D = cfg.head_dim
    new_layers = []
    for i, lp in enumerate(params["layers"]):
        res = x
        y = naive.rms_norm(x, lp["attn_norm"]["w"], cfg.norm_eps)
        ap = lp["attn"]
        lc = cache["layers"][i]
        window = cfg.layer_window(i)

        swa_qkv, gla_qkv = _project_both(cfg, ap, y[None], pctx)
        q, k, v = swa_qkv
        cos, sin = naive.rope_cos_sin(rope_pos[None], D, cfg.rope_theta)
        q = naive.apply_rope(q, cos, sin)[0]
        k = naive.apply_rope(k, cos, sin)[0]
        v = v[0]

        # ---- SWA prefill rows: windowed + metatoken passes, LSE merge
        ctx_k, ctx_v, ctx_pos = common.gather_ring_context(lc, lslot, pos0)
        R = ctx_k.shape[0]
        k_all = jnp.concatenate([ctx_k, k[:T]], axis=0)
        v_all = jnp.concatenate([ctx_v, v[:T]], axis=0)
        qp = jnp.where(valid, positions, swa.INVALID_POS)
        kp_all = jnp.concatenate([ctx_pos, qp])
        out1, lse1 = swa.flash_window_prefill(
            q[:T], k_all, v_all, qp, kp_all, window, ctx_len=R,
            mask_mode="window" if window > 0 else "causal")
        out2, lse2 = swa.flash_window_prefill(
            q[:T], meta["k"][i], meta["v"][i],
            qp, jnp.zeros((M,), jnp.int32), 0, mask_mode="all")
        mo, _ = swa.merge_two(
            jnp.swapaxes(out1, 0, 1).astype(jnp.float32), lse1,
            jnp.swapaxes(out2, 0, 1).astype(jnp.float32), lse2)
        swa_p = jnp.swapaxes(mo, 0, 1).astype(y.dtype)     # [T, H, D]
        lc = cache_lib.write_prefill_kv(lc, lslot, k[:T], v[:T], positions,
                                        valid, enable=owned)
        # ---- SWA decode rows (updated ring: token attends itself)
        lc = cache_lib.write_decode_kv(lc, k[T:], v[T:], d_positions,
                                       d_active)
        from vllm_hymeta_tpu.ops.swa_decode_pallas import \
            fused_decode_attention
        if lc["k"].dtype == jnp.int8:
            swa_d = fused_decode_attention(
                q[T:], lc["k"], lc["v"], d_positions, window,
                meta["k"][i], meta["v"][i],
                k_scale=lc["k_scale"], v_scale=lc["v_scale"])
        else:
            rk, rv = cache_lib.kv_entry(lc)
            swa_d = fused_decode_attention(q[T:], rk, rv, d_positions,
                                           window, meta["k"][i],
                                           meta["v"][i])
        swa_out = jnp.concatenate([swa_p, swa_d.astype(y.dtype)], axis=0)

        # ---- GLA branch
        lb = _layer_lower_bound(cfg, lbs, i, pctx)
        qg, kg, vg, g = _gla_qkvg(cfg, ap["gla"], y, lb, pctx,
                                  qkv=tuple(t[0] for t in gla_qkv))
        from vllm_hymeta_tpu.ops.gla_decode_pallas import gla_decode_active
        # N3 kernel: state traffic ∝ active slots
        o_d, S_dec = gla_decode_active(qg[T:], kg[T:], vg[T:], g[T:],
                                       lc["state"], d_active)
        kp2 = jnp.where(valid[:, None, None], kg[:T], 0.0)
        vp2 = jnp.where(valid[:, None, None], vg[:T], 0.0)
        gp2 = jnp.where(valid[:, None, None], g[:T], 0.0)
        S0 = lc["state"][lslot][None].astype(jnp.float32)
        o_p, S_p = gla_chunk.gla_chunked(
            qg[:T].transpose(1, 0, 2)[None], kp2.transpose(1, 0, 2)[None],
            vp2.transpose(1, 0, 2)[None], gp2.transpose(1, 0, 2)[None],
            initial_state=S0)
        gla_out = jnp.concatenate(
            [o_p[0].transpose(1, 0, 2).astype(jnp.float32),
             o_d.astype(jnp.float32)], axis=0).astype(y.dtype)
        lc = dict(lc)
        lc["state"] = S_dec.at[lslot].set(
            jnp.where(owned, S_p[0].astype(S_dec.dtype), S_dec[lslot])
        ).astype(lc["state"].dtype)
        new_layers.append(lc)

        att = _hybrid_merge(cfg, ap, common.merge_heads(swa_out),
                            common.merge_heads(gla_out), pctx)
        y2, res = naive.rms_norm_residual(att, res, lp["mlp_norm"]["w"],
                                          cfg.norm_eps)
        x = res + _ffn(cfg, lp, y2, pctx=pctx)

    xd = x[T:]
    if need_logits:
        xh = jnp.concatenate([x[n_valid - 1][None], xd], axis=0)
    else:
        xh = xd
    xh = naive.rms_norm(xh, params["final_norm"]["w"], cfg.norm_eps)
    logits = common.lm_head_gather(params["lm_head"], xh, pctx)
    if need_logits:
        p_logits = logits[0]
        if pctx.data_axis is not None:
            p_logits = pctx.psum_data(jnp.where(owned, p_logits, 0.0))
        return p_logits, logits[1:], {"layers": new_layers}
    return jnp.zeros((cfg.vocab_size,), jnp.float32), logits, \
        {"layers": new_layers}


def prefill_mixed_batched(cfg: HymetaConfig, params: dict, meta: dict,
                          cache: dict,
                          tokens: jax.Array,       # [B, T] (padded)
                          slots: jax.Array,        # [B] int32
                          pos0: jax.Array,         # [B]
                          n_valid: jax.Array,      # [B]
                          d_tokens: jax.Array,     # [S]
                          d_positions: jax.Array,  # [S]
                          d_active: jax.Array,     # [S] bool
                          ) -> Tuple[jax.Array, jax.Array, dict]:
    """B same-bucket 70B chunks + one decode step for the active slots in
    ONE program — the full `[meta | prefills | decodes]` batch layout of
    the reference (`attention/meta_attention.py:612-639`); see
    gla_swa.prefill_mixed_batched for the scheduling rationale.

    Returns (prefill_logits [B, V], decode_logits [S, V], cache)."""
    B, T = tokens.shape
    S = d_tokens.shape[0]
    N = B * T
    M = cfg.num_meta_tokens
    lbs = lower_bound_table(cfg, params)
    positions = pos0[:, None] + jnp.arange(T, dtype=jnp.int32)[None]
    valid = jnp.arange(T)[None] < n_valid[:, None]            # [B, T]
    all_tokens = jnp.concatenate([tokens.reshape(N), d_tokens])
    all_rope = jnp.concatenate([positions.reshape(N), d_positions]) + M
    x = common.embed_vp(params["embed"], all_tokens, NULL_CTX)  # [N+S, h]

    H, Hkv, D = (cfg.num_attention_heads, cfg.num_key_value_heads,
                 cfg.head_dim)
    new_layers = []
    for i, lp in enumerate(params["layers"]):
        res = x
        y = naive.rms_norm(x, lp["attn_norm"]["w"], cfg.norm_eps)
        ap = lp["attn"]
        lc = cache["layers"][i]
        window = cfg.layer_window(i)

        swa_qkv, gla_qkv = _project_both(cfg, ap, y[None])
        q, k, v = swa_qkv
        cos, sin = naive.rope_cos_sin(all_rope[None], D, cfg.rope_theta)
        q = naive.apply_rope(q, cos, sin)[0]
        k = naive.apply_rope(k, cos, sin)[0]
        v = v[0]                                              # [N+S, *, D]

        # ---- SWA prefill rows: batched windowed splash + meta LSE merge
        qb = q[:N].reshape(B, T, H, D)
        kb = k[:N].reshape(B, T, Hkv, D)
        vb = v[:N].reshape(B, T, Hkv, D)
        ctx_k, ctx_v, ctx_pos = common.gather_ring_context_batched(
            lc, slots, pos0)
        R = ctx_k.shape[1]
        k_all = jnp.concatenate([ctx_k, kb], axis=1)
        v_all = jnp.concatenate([ctx_v, vb], axis=1)
        qp = jnp.where(valid, positions, swa.INVALID_POS)
        kp_all = jnp.concatenate([ctx_pos, qp], axis=1)
        out1, lse1 = swa.splash_prefill_batched(
            qb, k_all, v_all, kp_all, window, ctx_len=R, need_lse=True,
            mask_mode="window" if window > 0 else "causal")

        def meta_pass(qr, qpr):
            return swa.flash_window_prefill(
                qr, meta["k"][i], meta["v"][i], qpr,
                jnp.zeros((M,), jnp.int32), 0, mask_mode="all")
        out2, lse2 = jax.vmap(meta_pass)(qb, qp)
        mo, _ = swa.merge_two(
            jnp.swapaxes(out1, 1, 2).astype(jnp.float32), lse1,
            jnp.swapaxes(out2, 1, 2).astype(jnp.float32), lse2)
        swa_p = jnp.swapaxes(mo, 1, 2).astype(y.dtype)        # [B,T,H,D]
        for b in range(B):
            lc = cache_lib.write_prefill_kv(lc, slots[b], kb[b], vb[b],
                                            positions[b], valid[b])
        # ---- SWA decode rows (updated ring: token attends itself)
        lc = cache_lib.write_decode_kv(lc, k[N:], v[N:], d_positions,
                                       d_active)
        from vllm_hymeta_tpu.ops.swa_decode_pallas import \
            fused_decode_attention
        if lc["k"].dtype == jnp.int8:
            swa_d = fused_decode_attention(
                q[N:], lc["k"], lc["v"], d_positions, window,
                meta["k"][i], meta["v"][i],
                k_scale=lc["k_scale"], v_scale=lc["v_scale"])
        else:
            rk, rv = cache_lib.kv_entry(lc)
            swa_d = fused_decode_attention(q[N:], rk, rv, d_positions,
                                           window, meta["k"][i],
                                           meta["v"][i])
        swa_out = jnp.concatenate(
            [swa_p.reshape(N, H, D), swa_d.astype(y.dtype)], axis=0)

        # ---- GLA branch
        lb = _layer_lower_bound(cfg, lbs, i)
        qg, kg, vg, g = _gla_qkvg(cfg, ap["gla"], y, lb,
                                  qkv=tuple(t[0] for t in gla_qkv))
        from vllm_hymeta_tpu.ops.gla_decode_pallas import gla_decode_active
        S0 = lc["state"][slots].astype(jnp.float32)           # [B,*,D,D]
        o_d, S_dec = gla_decode_active(qg[N:], kg[N:], vg[N:], g[N:],
                                       lc["state"], d_active)
        qb2 = qg[:N].reshape(B, T, -1, D)
        kb2 = jnp.where(valid[..., None, None],
                        kg[:N].reshape(B, T, -1, D), 0.0)
        vb2 = jnp.where(valid[..., None, None],
                        vg[:N].reshape(B, T, -1, D), 0.0)
        gb2 = jnp.where(valid[..., None, None],
                        g[:N].reshape(B, T, -1, D), 0.0)
        o_p, S_p = gla_chunk.gla_chunked(
            qb2.transpose(0, 2, 1, 3), kb2.transpose(0, 2, 1, 3),
            vb2.transpose(0, 2, 1, 3), gb2.transpose(0, 2, 1, 3),
            initial_state=S0)
        gla_out = jnp.concatenate(
            [o_p.transpose(0, 2, 1, 3).astype(jnp.float32
                                              ).reshape(N, -1, D),
             o_d.astype(jnp.float32)], axis=0).astype(y.dtype)
        lc = dict(lc)
        lc["state"] = S_dec.at[slots].set(S_p.astype(S_dec.dtype))
        new_layers.append(lc)

        att = _hybrid_merge(cfg, ap, common.merge_heads(swa_out),
                            common.merge_heads(gla_out))
        y2, res = naive.rms_norm_residual(att, res, lp["mlp_norm"]["w"],
                                          cfg.norm_eps)
        x = res + _ffn(cfg, lp, y2)

    xp = x[:N].reshape(B, T, -1)
    x_last = jnp.take_along_axis(
        xp, jnp.maximum(n_valid - 1, 0)[:, None, None], axis=1)[:, 0]
    xh = jnp.concatenate([x_last, x[N:]], axis=0)             # [B+S, h]
    xh = naive.rms_norm(xh, params["final_norm"]["w"], cfg.norm_eps)
    logits = common.lm_head_gather(params["lm_head"], xh, NULL_CTX)
    return logits[:B], logits[B:], {"layers": new_layers}


def prefill_batched(cfg: HymetaConfig, params: dict, meta: dict,
                    cache: dict,
                    tokens: jax.Array,    # [B, T] (padded)
                    slots: jax.Array,     # [B] int32
                    pos0: jax.Array,      # [B]
                    n_valid: jax.Array,   # [B]
                    ) -> Tuple[jax.Array, dict]:
    """Multi-request 70B prefill: B same-bucket chunks in ONE step — the
    projections, MoE and merges run at M = B*T rows (full MXU tiles), the
    windowed pass is the batched splash kernel, and the metatoken pass +
    LSE merge vectorize over B (role of the reference's mixed
    [prefills | decodes] batches, `attention/meta_attention.py:612-639`).
    Single-device path."""
    B, T = tokens.shape
    M = cfg.num_meta_tokens
    lbs = lower_bound_table(cfg, params)
    positions = pos0[:, None] + jnp.arange(T, dtype=jnp.int32)[None]
    rope_pos = positions + M
    valid = jnp.arange(T)[None] < n_valid[:, None]            # [B, T]
    x = common.embed_vp(params["embed"], tokens, NULL_CTX)    # [B, T, h]

    H, Hkv, D = (cfg.num_attention_heads, cfg.num_key_value_heads,
                 cfg.head_dim)
    new_layers = []
    for i, lp in enumerate(params["layers"]):
        res = x
        y = naive.rms_norm(x, lp["attn_norm"]["w"], cfg.norm_eps)
        ap = lp["attn"]
        lc = cache["layers"][i]
        window = cfg.layer_window(i)

        # ---- SWA branch: batched windowed splash + metatoken LSE merge
        swa_qkv, gla_qkv = _project_both(cfg, ap, y)
        q, k, v = swa_qkv                                     # [B,T,*,D]
        cos, sin = naive.rope_cos_sin(rope_pos, D, cfg.rope_theta)
        q = naive.apply_rope(q, cos, sin)
        k = naive.apply_rope(k, cos, sin)
        ctx_k, ctx_v, ctx_pos = common.gather_ring_context_batched(
            lc, slots, pos0)
        R = ctx_k.shape[1]
        k_all = jnp.concatenate([ctx_k, k], axis=1)
        v_all = jnp.concatenate([ctx_v, v], axis=1)
        qp = jnp.where(valid, positions, swa.INVALID_POS)
        kp_all = jnp.concatenate([ctx_pos, qp], axis=1)
        out1, lse1 = swa.splash_prefill_batched(
            q, k_all, v_all, kp_all, window, ctx_len=R, need_lse=True,
            mask_mode="window" if window > 0 else "causal")

        def meta_pass(qb, qpb):
            return swa.flash_window_prefill(
                qb, meta["k"][i], meta["v"][i], qpb,
                jnp.zeros((M,), jnp.int32), 0, mask_mode="all")
        out2, lse2 = jax.vmap(meta_pass)(q, qp)
        mo, _ = swa.merge_two(
            jnp.swapaxes(out1, 1, 2).astype(jnp.float32), lse1,
            jnp.swapaxes(out2, 1, 2).astype(jnp.float32), lse2)
        swa_out = jnp.swapaxes(mo, 1, 2).astype(y.dtype)      # [B,T,H,D]
        for b in range(B):
            lc = cache_lib.write_prefill_kv(lc, slots[b], k[b], v[b],
                                            positions[b], valid[b])

        # ---- GLA branch (batched over B natively)
        lb = _layer_lower_bound(cfg, lbs, i)
        qg, kg, vg, g = _gla_qkvg(cfg, ap["gla"], y, lb, qkv=gla_qkv)
        kg = jnp.where(valid[..., None, None], kg, 0.0)
        vg = jnp.where(valid[..., None, None], vg, 0.0)
        g = jnp.where(valid[..., None, None], g, 0.0)
        S0 = lc["state"][slots].astype(jnp.float32)           # [B,H,D,D]
        o, S = gla_chunk.gla_chunked(
            qg.transpose(0, 2, 1, 3), kg.transpose(0, 2, 1, 3),
            vg.transpose(0, 2, 1, 3), g.transpose(0, 2, 1, 3),
            initial_state=S0)
        gla_out = o.transpose(0, 2, 1, 3)
        lc = dict(lc)
        lc["state"] = lc["state"].at[slots].set(
            S.astype(lc["state"].dtype))
        new_layers.append(lc)

        att = _hybrid_merge(cfg, ap, common.merge_heads(swa_out),
                            common.merge_heads(gla_out))
        y2, res = naive.rms_norm_residual(att, res, lp["mlp_norm"]["w"],
                                          cfg.norm_eps)
        x = res + _ffn(cfg, lp, y2)

    x_last = jnp.take_along_axis(
        x, jnp.maximum(n_valid - 1, 0)[:, None, None], axis=1)[:, 0]
    x_last = naive.rms_norm(x_last, params["final_norm"]["w"], cfg.norm_eps)
    logits = common.lm_head_gather(params["lm_head"], x_last, NULL_CTX)
    return logits, {"layers": new_layers}


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------

def decode(cfg: HymetaConfig, params: dict, meta: dict, cache: dict,
           tokens: jax.Array, positions: jax.Array, active: jax.Array,
           pctx=NULL_CTX) -> Tuple[jax.Array, dict]:
    S = tokens.shape[0]
    M = cfg.num_meta_tokens
    lbs = lower_bound_table(cfg, params)
    rope_pos = positions + M
    x = common.embed_vp(params["embed"], tokens, pctx)

    H, Hkv = common.local_heads(cfg, pctx)
    D = cfg.head_dim
    new_layers = []
    for i, lp in enumerate(params["layers"]):
        res = x
        y = naive.rms_norm(x, lp["attn_norm"]["w"], cfg.norm_eps)
        ap = lp["attn"]
        lc = cache["layers"][i]
        window = cfg.layer_window(i)

        # ---- SWA branch
        swa_qkv, gla_qkv = _project_both(cfg, ap, y, pctx)
        q, k, v = swa_qkv                                      # [S,H,D]
        cos, sin = naive.rope_cos_sin(rope_pos, D, cfg.rope_theta)
        q = naive.apply_rope(q, cos, sin)
        k = naive.apply_rope(k, cos, sin)
        lc = cache_lib.write_decode_kv(lc, k, v, positions, active)
        from vllm_hymeta_tpu.ops.swa_decode_pallas import \
            fused_decode_attention
        if lc["k"].dtype == jnp.int8:
            mo = fused_decode_attention(
                q, lc["k"], lc["v"], positions, window,
                meta["k"][i], meta["v"][i],
                k_scale=lc["k_scale"], v_scale=lc["v_scale"])
        else:
            rk, rv = cache_lib.kv_entry(lc)
            mo = fused_decode_attention(q, rk, rv, positions, window,
                                        meta["k"][i], meta["v"][i])
        swa_out = mo.astype(y.dtype)

        # ---- GLA branch
        lb = _layer_lower_bound(cfg, lbs, i, pctx)
        qg, kg, vg, g = _gla_qkvg(cfg, ap["gla"], y, lb, pctx,
                                  qkv=gla_qkv)
        from vllm_hymeta_tpu.ops.gla_decode_pallas import gla_decode_active
        # N3 kernel: state HBM traffic ∝ active slots (aliased in-place
        # update; inactive rows untouched, o rows zeroed)
        o, S_new = gla_decode_active(qg, kg, vg, g, lc["state"], active)
        lc = dict(lc)
        lc["state"] = S_new
        new_layers.append(lc)

        att = _hybrid_merge(cfg, ap, common.merge_heads(swa_out),
                            common.merge_heads(o.astype(y.dtype)), pctx)
        y2, res = naive.rms_norm_residual(att, res, lp["mlp_norm"]["w"],
                                          cfg.norm_eps)
        x = res + _ffn(cfg, lp, y2, pctx=pctx)

    x = naive.rms_norm(x, params["final_norm"]["w"], cfg.norm_eps)
    logits = common.lm_head_gather(params["lm_head"], x, pctx)
    return logits, {"layers": new_layers}
