"""Hymeta-7B "GLAswa": inter-layer hybrid — odd layers sliding-window
softmax attention, even layers gated linear attention.

Semantics references:
  * layer alternation: `model_for_7B/configuration_gla_swa.py:66-68`
  * SWA layer: `hf_7B_model/window_attention.py:94-222` (FA2 window (W,0),
    i.e. a query attends q_pos - k_pos <= W)
  * GLA layer: `hf_7B_model/gla_attention.py:36-190` (relu feature maps,
    low-rank gate gk_proj -> logsigmoid/16, per-head g_norm RMSNorm)
  * block wiring: `hf_7B_model/modeling_gla_swa.py:57-125` (attn_norm ->
    attn -> fused mlp_norm(residual) -> GLU -> residual)

Three execution modes over the same parameters:
  forward_full — whole sequences, no cache (golden/numerics path)
  prefill      — one request chunk, kernel attention, cache writes
  decode       — one token for each active slot, ring/state caches
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from vllm_hymeta_tpu import cache as cache_lib
from vllm_hymeta_tpu.config import GLAswaConfig
from vllm_hymeta_tpu.models import common
from vllm_hymeta_tpu.models.layers import glu_mlp, linear
from vllm_hymeta_tpu.ops import gla_chunk, naive, swa
from vllm_hymeta_tpu.parallel.pctx import NULL_CTX


# ---------------------------------------------------------------------------
# parameters
# ---------------------------------------------------------------------------

def init_params(cfg: GLAswaConfig, key: jax.Array,
                dtype=jnp.bfloat16) -> dict:
    h, D = cfg.hidden_size, cfg.head_dim
    kvd = cfg.num_key_value_heads * D
    keys = iter(jax.random.split(key, 8 * cfg.num_hidden_layers + 8))
    layers = []
    for i in range(cfg.num_hidden_layers):
        lp = {
            "attn_norm": {"w": jnp.ones((h,), dtype)},
            "mlp_norm": {"w": jnp.ones((h,), dtype)},
            "mlp": common.init_glu(next(keys), h, cfg.intermediate_size,
                                   dtype),
        }
        attn = {
            "q_proj": common.init_linear(next(keys), h, h, True, dtype),
            "k_proj": common.init_linear(next(keys), h, kvd, True, dtype),
            "v_proj": common.init_linear(next(keys), h, kvd, True, dtype),
            "o_proj": common.init_linear(next(keys), h, h, False, dtype),
        }
        if not cfg.is_swa_layer(i):
            # low-rank gate: Linear(h,16,bias=F) -> Linear(16,kvd,bias=T)
            # (`hf_7B_model/gla_attention.py:82-83`)
            attn["gk_a"] = common.init_linear(
                next(keys), h, cfg.gate_low_rank_dim, False, dtype)
            attn["gk_b"] = common.init_linear(
                next(keys), cfg.gate_low_rank_dim, kvd, True, dtype)
            attn["g_norm"] = {"w": jnp.ones((D,), dtype)}
        lp["attn"] = attn
        layers.append(lp)
    return {
        "embed": {"w": (jax.random.normal(
            next(keys), (cfg.vocab_size, h), jnp.float32) * 0.02
        ).astype(dtype)},
        "layers": layers,
        "final_norm": {"w": jnp.ones((h,), dtype)},
        "lm_head": {"w": (jax.random.normal(
            next(keys), (h, cfg.vocab_size), jnp.float32) * 0.02
        ).astype(dtype)},
    }


def init_cache(cfg: GLAswaConfig, cc: cache_lib.CacheConfig) -> dict:
    layers = []
    for i in range(cfg.num_hidden_layers):
        if cfg.is_swa_layer(i):
            layers.append(cache_lib.init_layer_kv(
                cc, cfg.num_key_value_heads, cfg.head_dim, cfg.window_keys))
        else:
            # one state per KV head: query heads of a group share it
            # (k/v/gates are group-level — see _gla_qkvg)
            layers.append(cache_lib.init_layer_state(
                cc, cfg.num_key_value_heads, cfg.head_dim))
    return {"layers": layers}


# ---------------------------------------------------------------------------
# layer pieces
# ---------------------------------------------------------------------------

def _gla_qkvg(cfg: GLAswaConfig, ap: dict, x: jax.Array, pctx=NULL_CTX):
    """Project + feature-map + gates for a GLA layer.
    x: [..., T, h] -> q [..., T, Hq, D]; k, v, g [..., T, Hkv, D] (g fp32).

    k/v/gates are NOT GQA-repeated: every query head in a group shares
    its KV head's state, so the GLA kernels take group-level k/v/g and
    one state per KV head (7x less state memory/traffic at rep=7; the
    repeat semantics of `hf_7B_model/gla_attention.py` are reproduced
    inside the kernels)."""
    H, Hkv = common.local_heads(cfg, pctx)
    D = cfg.head_dim
    if "qkvg_proj" in ap:
        # fused [q | k | v | gk_a] projection (fuse_params)
        qd, kvd = H * D, Hkv * D
        y = linear(ap["qkvg_proj"], x)
        q, k, v, gk_lr = jnp.split(
            y, [qd, qd + kvd, qd + 2 * kvd], axis=-1)
        q = common.split_heads(q, H)
        k = common.split_heads(k, Hkv)
        v = common.split_heads(v, Hkv)
        gk = common.split_heads(linear(ap["gk_b"], gk_lr), Hkv)
    else:
        q, k, v = common.project_qkv(ap, x, H, Hkv, D)
        gk = common.split_heads(
            linear(ap["gk_b"], linear(ap["gk_a"], x)), Hkv)
    q, k, g = naive.glaswa_gates(q, k, gk, cfg.gate_logit_normalizer)
    return q, k, v, g


def _gla_out(cfg: GLAswaConfig, ap: dict, o: jax.Array,
             pctx=NULL_CTX) -> jax.Array:
    """Per-head g_norm then output projection (row-parallel -> psum, or
    reduce-scatter under sequence parallelism)
    (`hf_7B_model/gla_attention.py:170-171`). o: [..., T, H, D]."""
    o = naive.rms_norm(o, ap["g_norm"]["w"], cfg.norm_eps)
    return pctx.sp_reduce(linear(ap["o_proj"], common.merge_heads(o)))


def _swa_rope(cfg: GLAswaConfig, q, k, positions):
    cos, sin = naive.rope_cos_sin(positions, cfg.head_dim, cfg.rope_theta)
    return naive.apply_rope(q, cos, sin), naive.apply_rope(k, cos, sin)


# ---------------------------------------------------------------------------
# full forward (golden path, no cache)
# ---------------------------------------------------------------------------

def layer_forward(cfg: GLAswaConfig, lp: dict, x: jax.Array,
                  positions: jax.Array, is_swa: bool,
                  pctx=NULL_CTX) -> jax.Array:
    """One decoder layer over full sequences (no cache) — shared by the
    golden forward and the pipeline-parallel stage function.

    Under sequence parallelism (pctx.sp) `x` enters and leaves sharded
    along the token dim over the model axis; norms run on the local shard,
    the attention/MLP blocks all-gather tokens on entry and
    reduce-scatter on exit (`positions` stays full-length)."""
    res = x
    y = naive.rms_norm(x, lp["attn_norm"]["w"], cfg.norm_eps)
    y = pctx.sp_gather(y)
    ap = lp["attn"]
    if is_swa:
        H, Hkv = common.local_heads(cfg, pctx)
        D = cfg.head_dim
        q, k, v = common.project_qkv(ap, y, H, Hkv, D)
        q, k = _swa_rope(cfg, q, k, positions)
        if swa.can_flash_train(q.shape[1], D):
            # differentiable splash path: flash fwd+bwd, O(T·W) memory
            # (coords == positions: the training/PP paths feed arange)
            out = swa.train_window_attention(q, k, v, cfg.window_keys)
        else:
            out, _ = naive.swa_attention(
                q, k, v, positions[0], positions[0], cfg.sliding_window,
                cfg.inclusive_window)
        att = pctx.sp_reduce(linear(
            ap["o_proj"], common.merge_heads(out.astype(y.dtype))))
    else:
        q, k, v, g = _gla_qkvg(cfg, ap, y, pctx)
        o, _ = gla_chunk.gla_chunked(
            q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
            v.transpose(0, 2, 1, 3), g.transpose(0, 2, 1, 3))
        att = _gla_out(cfg, ap, o.transpose(0, 2, 1, 3), pctx)
    y, res2 = naive.rms_norm_residual(att, res, lp["mlp_norm"]["w"],
                                      cfg.norm_eps)
    y = pctx.sp_gather(y)
    return res2 + pctx.sp_reduce(glu_mlp(lp["mlp"], y))


def forward_full(cfg: GLAswaConfig, params: dict, tokens: jax.Array,
                 positions: Optional[jax.Array] = None,
                 pctx=NULL_CTX, remat: bool = False) -> jax.Array:
    """tokens [B, T] -> logits [B, T, V] (fp32). Naive attention ops.

    remat=True checkpoints each layer (activation memory O(L·h) instead of
    O(L·T·h) — the role of the reference's `gradient_checkpointing`,
    `hf_model/modeling_hymeta.py:349-361`)."""
    B, T = tokens.shape
    if positions is None:
        positions = jnp.arange(T, dtype=jnp.int32)[None].repeat(B, 0)
    x = common.embed_vp(params["embed"], tokens, pctx)

    for i, lp in enumerate(params["layers"]):
        fn = functools.partial(layer_forward, cfg,
                               positions=positions,
                               is_swa=cfg.is_swa_layer(i), pctx=pctx)
        if remat:
            fn = jax.checkpoint(fn)
        x = fn(lp, x)
    x = naive.rms_norm(x, params["final_norm"]["w"], cfg.norm_eps)
    return common.lm_head_gather(params["lm_head"], x, pctx)


# ---------------------------------------------------------------------------
# prefill (single request chunk; cache in/out)
# ---------------------------------------------------------------------------

def prefill(cfg: GLAswaConfig, params: dict, cache: dict,
            tokens: jax.Array,     # [T] (padded)
            slot: jax.Array,       # scalar int32 (global slot id)
            pos0: jax.Array,       # scalar int32: first token's position
            n_valid: jax.Array,    # scalar int32: valid token count
            pctx=NULL_CTX,
            need_logits: bool = True,
            ) -> Tuple[jax.Array, dict]:
    """Process one prompt chunk for `slot`; returns (last-token logits [V],
    updated cache).  The engine clears slot state before the first chunk.

    Under data parallelism every rank computes the chunk but only the
    slot's owner commits cache writes; logits are owner-broadcast."""
    T = tokens.shape[0]
    n_local_slots = cache["layers"][0][next(iter(cache["layers"][0]))].shape[0]
    lslot, owned = pctx.local_slot(slot, n_local_slots)
    positions = pos0 + jnp.arange(T, dtype=jnp.int32)
    valid = jnp.arange(T) < n_valid
    x = common.embed_vp(params["embed"], tokens, pctx)

    new_layers = []
    for i, lp in enumerate(params["layers"]):
        res = x
        y = naive.rms_norm(x, lp["attn_norm"]["w"], cfg.norm_eps)
        ap = lp["attn"]
        lc = cache["layers"][i]
        if cfg.is_swa_layer(i):
            H, Hkv = common.local_heads(cfg, pctx)
            D = cfg.head_dim
            q, k, v = common.project_qkv(ap, y[None], H, Hkv, D)
            q, k = _swa_rope(cfg, q, k, positions[None])
            q, k, v = q[0], k[0], v[0]
            from vllm_hymeta_tpu.ops import ring_attention
            if ring_attention.ring_window_supported(q, lc["k"],
                                                    cfg.window_keys):
                # zero-copy path: the kernel reads the slot's ring IN
                # PLACE (arithmetic positions/masks) — no gather, no
                # concat, no k_pos arrays (r5 redesign)
                out, _ = ring_attention.ring_window_prefill(
                    q, lc["k"], lc["v"], k, v, lslot, pos0, n_valid,
                    cfg.window_keys)
            else:
                ctx_k, ctx_v, ctx_pos = common.gather_ring_context(
                    lc, lslot, pos0)
                R = ctx_k.shape[0]
                k_all = jnp.concatenate([ctx_k, k], axis=0)
                v_all = jnp.concatenate([ctx_v, v], axis=0)
                kp_all = jnp.concatenate(
                    [ctx_pos,
                     jnp.where(valid, positions, swa.INVALID_POS)])
                qp = jnp.where(valid, positions, swa.INVALID_POS)
                out, _ = swa.flash_window_prefill(
                    q, k_all, v_all, qp, kp_all, cfg.window_keys,
                    ctx_len=R, need_lse=False)
            att = pctx.psum(linear(ap["o_proj"], common.merge_heads(out)))
            lc = cache_lib.write_prefill_kv(lc, lslot, k, v, positions,
                                            valid, enable=owned)
        else:
            q, k, v, g = _gla_qkvg(cfg, ap, y, pctx)
            # identity updates on padded rows: k=v=0, g=0
            k = jnp.where(valid[:, None, None], k, 0.0)
            v = jnp.where(valid[:, None, None], v, 0.0)
            g = jnp.where(valid[:, None, None], g, 0.0)
            S0 = lc["state"][lslot][None].astype(jnp.float32)
            o, S = gla_chunk.gla_chunked(
                q.transpose(1, 0, 2)[None], k.transpose(1, 0, 2)[None],
                v.transpose(1, 0, 2)[None], g.transpose(1, 0, 2)[None],
                initial_state=S0)
            att = _gla_out(cfg, ap, o[0].transpose(1, 0, 2), pctx)
            S_new = jnp.where(owned, S[0].astype(lc["state"].dtype),
                              lc["state"][lslot])
            lc = {"state": lc["state"].at[lslot].set(S_new)}
        new_layers.append(lc)
        y, res = naive.rms_norm_residual(att, res, lp["mlp_norm"]["w"],
                                         cfg.norm_eps)
        x = res + pctx.psum(glu_mlp(lp["mlp"], y))

    if not need_logits:
        # mid-prompt chunk: only the cache writes matter — skip the
        # LM head read (+ downstream sampling) entirely
        return jnp.zeros((cfg.vocab_size,), jnp.float32), \
            {"layers": new_layers}
    x_last = x[n_valid - 1]
    x_last = naive.rms_norm(x_last, params["final_norm"]["w"], cfg.norm_eps)
    logits = common.lm_head_gather(params["lm_head"], x_last, pctx)
    if pctx.data_axis is not None:
        logits = pctx.psum_data(jnp.where(owned, logits, 0.0))
    return logits, {"layers": new_layers}


def prefill_split(cfg: GLAswaConfig, params: dict, cache: dict,
                  tokens: jax.Array,     # [T] full chunk (replicated)
                  slot: jax.Array,       # scalar int32 (global slot id)
                  pos0: jax.Array,       # scalar int32
                  n_valid: jax.Array,    # scalar int32
                  pctx,                  # data axis REQUIRED
                  need_logits: bool = True,
                  ) -> Tuple[jax.Array, dict]:
    """Split-T prefill: ONE request's chunk sharded over the data ranks —
    each rank runs T/dp tokens through every projection/MLP, so a single
    long prompt uses the whole mesh instead of the owner-masked
    replication of `prefill` (which wastes (dp-1)/dp of the FLOPs;
    VERDICT r3 item 6).  The role of vLLM's batched model runner for the
    single-sequence case (`attention/meta_attention.py:411-608`).

    Cross-rank coupling, handled with one small collective per layer:
      * SWA: keys/values are all-gathered over the data axis (4 MB per
        layer at T=4096 — rides ICI); each rank attends its queries
        against [last-R keys before its segment ∥ its segment], a
        dynamic slice of [ring ∥ chunk] (R is static, so the splash
        kernel sees the same shapes as single-rank prefill).
      * GLA: the recurrence is associative over segments — each rank
        runs its segment from a ZERO state, then (decay-total, state)
        pairs are all-gathered (Hkv·D + Hkv·D² floats) and combined in
        an unrolled exclusive prefix; the incoming state's contribution
        is added as o_t += (q_t·scale·e^{cumsum g}) @ S_in, exactly the
        initial-state term of `gla_chunked_ref` (ops/gla_chunk.py:168).
    """
    T = tokens.shape[0]
    dp = jax.lax.axis_size(pctx.data_axis)
    Tl = T // dp
    assert Tl * dp == T, (T, dp)
    r = pctx.data_rank()
    seg0 = r * Tl
    n_local_slots = cache["layers"][0][next(iter(cache["layers"][0]))].shape[0]
    lslot, owned = pctx.local_slot(slot, n_local_slots)
    H, Hkv = common.local_heads(cfg, pctx)
    D = cfg.head_dim
    rep = H // Hkv
    scale = D ** -0.5

    positions_f = pos0 + jnp.arange(T, dtype=jnp.int32)       # full chunk
    valid_f = jnp.arange(T) < n_valid
    toks_l = jax.lax.dynamic_slice(tokens, (seg0,), (Tl,))
    pos_l = jax.lax.dynamic_slice(positions_f, (seg0,), (Tl,))
    valid_l = jax.lax.dynamic_slice(valid_f, (seg0,), (Tl,))
    x = common.embed_vp(params["embed"], toks_l, pctx)        # [Tl, h]

    new_layers = []
    for i, lp in enumerate(params["layers"]):
        res = x
        y = naive.rms_norm(x, lp["attn_norm"]["w"], cfg.norm_eps)
        ap = lp["attn"]
        lc = cache["layers"][i]
        if cfg.is_swa_layer(i):
            q, k, v = common.project_qkv(ap, y[None], H, Hkv, D)
            q, k = _swa_rope(cfg, q, k, pos_l[None])
            q, k, v = q[0], k[0], v[0]                        # [Tl, *, D]
            k_full = pctx.data_all_gather(k, axis=0)          # [T, Hkv, D]
            v_full = pctx.data_all_gather(v, axis=0)
            ctx_k, ctx_v, ctx_pos = common.gather_ring_context(
                lc, lslot, pos0)
            # the slot's ring lives only on the owner rank's cache shard —
            # owner-broadcast the context (ctx_pos is arithmetic, no data)
            ctx_k = pctx.psum_data(jnp.where(owned, ctx_k, 0.0))
            ctx_v = pctx.psum_data(jnp.where(owned, ctx_v, 0.0))
            R = ctx_k.shape[0]
            kp_full = jnp.where(valid_f, positions_f, swa.INVALID_POS)
            # this rank's context = the R keys preceding its segment in
            # the [ring(R) ∥ chunk(T)] timeline: slice [seg0, seg0+R)
            allk = jnp.concatenate([ctx_k, k_full], axis=0)   # [R+T]
            allv = jnp.concatenate([ctx_v, v_full], axis=0)
            allp = jnp.concatenate([ctx_pos, kp_full])
            ctx_k_r = jax.lax.dynamic_slice(
                allk, (seg0, 0, 0), (R, Hkv, D))
            ctx_v_r = jax.lax.dynamic_slice(
                allv, (seg0, 0, 0), (R, Hkv, D))
            ctx_p_r = jax.lax.dynamic_slice(allp, (seg0,), (R,))
            k_in = jnp.concatenate([ctx_k_r, k], axis=0)
            v_in = jnp.concatenate([ctx_v_r, v], axis=0)
            qp = jnp.where(valid_l, pos_l, swa.INVALID_POS)
            kp = jnp.concatenate([ctx_p_r, qp])
            out, _ = swa.flash_window_prefill(
                q, k_in, v_in, qp, kp, cfg.window_keys, ctx_len=R,
                need_lse=False)
            att = pctx.psum(linear(ap["o_proj"], common.merge_heads(out)))
            lc = cache_lib.write_prefill_kv(
                lc, lslot, k_full, v_full, positions_f, valid_f,
                enable=owned)
        else:
            q, k, v, g = _gla_qkvg(cfg, ap, y, pctx)          # [Tl, *, D]
            k = jnp.where(valid_l[:, None, None], k, 0.0)
            v = jnp.where(valid_l[:, None, None], v, 0.0)
            g = jnp.where(valid_l[:, None, None], g, 0.0)
            # local segment from a zero state
            o0, U = gla_chunk.gla_chunked(
                q.transpose(1, 0, 2)[None], k.transpose(1, 0, 2)[None],
                v.transpose(1, 0, 2)[None], g.transpose(1, 0, 2)[None],
                initial_state=jnp.zeros((1, Hkv, D, D), jnp.float32))
            gf = g.astype(jnp.float32)
            btot = jnp.sum(gf, axis=0)                        # [Hkv, D]
            binc = jnp.cumsum(gf, axis=0)                     # [Tl, Hkv, D]
            bts = pctx.data_all_gather(btot[None], axis=0)    # [dp, Hkv, D]
            Us = pctx.data_all_gather(U[0][None], axis=0)     # [dp,Hkv,D,D]
            # owner-broadcast the carried state (owner's shard only)
            S0 = pctx.psum_data(jnp.where(
                owned, lc["state"][lslot].astype(jnp.float32), 0.0))
            # exclusive prefix over ranks (dp is small; unrolled)
            S_cur = S0
            prefix = []
            for j in range(dp):
                prefix.append(S_cur)
                S_cur = jnp.exp(bts[j])[..., None] * S_cur + Us[j]
            S_out = S_cur
            S_in = jnp.stack(prefix)[r]                       # [Hkv, D, D]
            # initial-state contribution to the local outputs
            qs = (q.astype(jnp.float32) * scale
                  * jnp.repeat(jnp.exp(binc), rep, axis=1))
            o_corr = jnp.einsum("thd,hdv->thv", qs,
                                jnp.repeat(S_in, rep, axis=0))
            o = o0[0].transpose(1, 0, 2).astype(jnp.float32) + o_corr
            att = _gla_out(cfg, ap, o, pctx)
            S_new = jnp.where(owned, S_out.astype(lc["state"].dtype),
                              lc["state"][lslot])
            lc = {"state": lc["state"].at[lslot].set(S_new)}
        new_layers.append(lc)
        y, res = naive.rms_norm_residual(att, res, lp["mlp_norm"]["w"],
                                         cfg.norm_eps)
        x = res + pctx.psum(glu_mlp(lp["mlp"], y))

    if not need_logits:
        return jnp.zeros((cfg.vocab_size,), jnp.float32), \
            {"layers": new_layers}
    # the last valid token lives on rank (n_valid-1)//Tl
    gi = n_valid - 1
    li = jnp.clip(gi - seg0, 0, Tl - 1)
    x_last = jnp.where(gi // Tl == r, x[li], 0.0)
    x_last = jax.lax.psum(x_last, pctx.data_axis)
    x_last = naive.rms_norm(x_last, params["final_norm"]["w"], cfg.norm_eps)
    logits = common.lm_head_gather(params["lm_head"], x_last, pctx)
    return logits, {"layers": new_layers}


def prefill_mixed(cfg: GLAswaConfig, params: dict, cache: dict,
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
    """ONE program = one prefill chunk for `slot` + one decode step for
    every active slot — the TPU form of the reference's mixed
    `[meta | prefills | decodes]` batches
    (`attention/meta_attention.py:612-639`).  The decode rows are
    CONCATENATED with the chunk rows through every projection/MLP matmul,
    so the weight streams the prefill already pays serve the decode
    tokens for free; only the attention/state ops split by row kind.
    Active generations therefore emit a token every chunk instead of
    stalling behind it (VERDICT r3 item 4).

    Under a mesh (pctx): TP splits heads, the data axis shards the slot
    batch (decode rows arrive pre-sharded), and the chunk runs
    owner-masked — or one-chunk-per-rank under dp_grouped (the mesh
    engine's batched-mixed form, VERDICT r4 item 3).

    Returns (prefill_logits [V], decode_logits [S, V], cache)."""
    T = tokens.shape[0]
    S = d_tokens.shape[0]
    n_local_slots = cache["layers"][0][
        next(iter(cache["layers"][0]))].shape[0]
    lslot, owned = pctx.local_slot(slot, n_local_slots)
    positions = pos0 + jnp.arange(T, dtype=jnp.int32)
    valid = jnp.arange(T) < n_valid
    all_tokens = jnp.concatenate([tokens, d_tokens])
    all_positions = jnp.concatenate([positions, d_positions])
    x = common.embed_vp(params["embed"], all_tokens, pctx)  # [T+S, h]
    H, Hkv = common.local_heads(cfg, pctx)
    D = cfg.head_dim

    new_layers = []
    for i, lp in enumerate(params["layers"]):
        res = x
        y = naive.rms_norm(x, lp["attn_norm"]["w"], cfg.norm_eps)
        ap = lp["attn"]
        lc = cache["layers"][i]
        if cfg.is_swa_layer(i):
            q, k, v = common.project_qkv(ap, y[None], H, Hkv, D)
            q, k = _swa_rope(cfg, q, k, all_positions[None])
            q, k, v = q[0], k[0], v[0]
            # --- prefill rows ---
            from vllm_hymeta_tpu.ops import ring_attention
            if ring_attention.ring_window_supported(q[:T], lc["k"],
                                                    cfg.window_keys):
                out_p, _ = ring_attention.ring_window_prefill(
                    q[:T], lc["k"], lc["v"], k[:T], v[:T], lslot, pos0,
                    n_valid, cfg.window_keys)
            else:
                ctx_k, ctx_v, ctx_pos = common.gather_ring_context(
                    lc, lslot, pos0)
                R = ctx_k.shape[0]
                k_all = jnp.concatenate([ctx_k, k[:T]], axis=0)
                v_all = jnp.concatenate([ctx_v, v[:T]], axis=0)
                kp_all = jnp.concatenate(
                    [ctx_pos,
                     jnp.where(valid, positions, swa.INVALID_POS)])
                qp = jnp.where(valid, positions, swa.INVALID_POS)
                out_p, _ = swa.flash_window_prefill(
                    q[:T], k_all, v_all, qp, kp_all, cfg.window_keys,
                    ctx_len=R, need_lse=False)
            lc = cache_lib.write_prefill_kv(lc, lslot, k[:T], v[:T],
                                            positions, valid, enable=owned)
            # --- decode rows (ring updated first: token attends itself) ---
            lc = cache_lib.write_decode_kv(lc, k[T:], v[T:], d_positions,
                                           d_active)
            from vllm_hymeta_tpu.ops.swa_decode_pallas import \
                fused_decode_attention
            if lc["k"].dtype == jnp.int8:
                out_d = fused_decode_attention(
                    q[T:], lc["k"], lc["v"], d_positions, cfg.window_keys,
                    k_scale=lc["k_scale"], v_scale=lc["v_scale"])
            else:
                rk, rv = cache_lib.kv_entry(lc)
                out_d = fused_decode_attention(q[T:], rk, rv, d_positions,
                                               cfg.window_keys)
            out = jnp.concatenate(
                [out_p.astype(y.dtype), out_d.astype(y.dtype)], axis=0)
            att = pctx.psum(linear(ap["o_proj"], common.merge_heads(out)))
        else:
            q, k, v, g = _gla_qkvg(cfg, ap, y, pctx)
            # --- decode rows first (their compute uses pre-chunk state;
            # the prefill slot is inactive in d_active, so writes stay
            # disjoint) --- N3 kernel: traffic ∝ active slots
            from vllm_hymeta_tpu.ops.gla_decode_pallas import \
                gla_decode_active
            o_d, S_dec = gla_decode_active(q[T:], k[T:], v[T:], g[T:],
                                           lc["state"], d_active)
            # --- prefill rows ---
            kp = jnp.where(valid[:, None, None], k[:T], 0.0)
            vp = jnp.where(valid[:, None, None], v[:T], 0.0)
            gp = jnp.where(valid[:, None, None], g[:T], 0.0)
            S0 = lc["state"][lslot][None].astype(jnp.float32)
            o_p, S_p = gla_chunk.gla_chunked(
                q[:T].transpose(1, 0, 2)[None], kp.transpose(1, 0, 2)[None],
                vp.transpose(1, 0, 2)[None], gp.transpose(1, 0, 2)[None],
                initial_state=S0)
            o = jnp.concatenate(
                [o_p[0].transpose(1, 0, 2).astype(jnp.float32),
                 o_d.astype(jnp.float32)], axis=0)
            att = _gla_out(cfg, ap, o, pctx)
            S_new = S_dec.at[lslot].set(
                jnp.where(owned, S_p[0].astype(S_dec.dtype), S_dec[lslot]))
            lc = {"state": S_new.astype(lc["state"].dtype)}
        new_layers.append(lc)
        y, res = naive.rms_norm_residual(att, res, lp["mlp_norm"]["w"],
                                         cfg.norm_eps)
        x = res + pctx.psum(glu_mlp(lp["mlp"], y))

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


def prefill_mixed_batched(cfg: GLAswaConfig, params: dict, cache: dict,
                          tokens: jax.Array,       # [B, T] (padded)
                          slots: jax.Array,        # [B] int32
                          pos0: jax.Array,         # [B]
                          n_valid: jax.Array,      # [B]
                          d_tokens: jax.Array,     # [S]
                          d_positions: jax.Array,  # [S]
                          d_active: jax.Array,     # [S] bool
                          ) -> Tuple[jax.Array, jax.Array, dict]:
    """B same-bucket chunks + one decode step for every active slot in
    ONE program: the decode rows and ALL B chunks share every
    projection/MLP/LM-head weight stream.  This is the full TPU form of
    the reference's `[meta | prefills | decodes]` batch layout
    (`attention/meta_attention.py:612-639`): under continuous batching
    with staggered completions, single-request mixed steps serialize
    prompt ingestion — this keeps decode latency bounded AND prefill at
    batched-matmul efficiency.

    Returns (prefill_logits [B, V], decode_logits [S, V], cache)."""
    B, T = tokens.shape
    S = d_tokens.shape[0]
    N = B * T
    positions = pos0[:, None] + jnp.arange(T, dtype=jnp.int32)[None]
    valid = jnp.arange(T)[None] < n_valid[:, None]            # [B, T]
    all_tokens = jnp.concatenate([tokens.reshape(N), d_tokens])
    x = common.embed_vp(params["embed"], all_tokens, NULL_CTX)  # [N+S, h]
    H, Hkv = cfg.num_attention_heads, cfg.num_key_value_heads
    D = cfg.head_dim

    new_layers = []
    for i, lp in enumerate(params["layers"]):
        res = x
        y = naive.rms_norm(x, lp["attn_norm"]["w"], cfg.norm_eps)
        ap = lp["attn"]
        lc = cache["layers"][i]
        if cfg.is_swa_layer(i):
            q, k, v = common.project_qkv(ap, y[None], H, Hkv, D)
            q, k, v = q[0], k[0], v[0]                        # [N+S, *, D]
            # --- prefill rows (identical to prefill_batched) ---
            qp_ = q[:N].reshape(B, T, H, D)
            kp_ = k[:N].reshape(B, T, Hkv, D)
            vp_ = v[:N].reshape(B, T, Hkv, D)
            qp_, kp_ = _swa_rope(cfg, qp_, kp_, positions)
            ctx_k, ctx_v, ctx_pos = common.gather_ring_context_batched(
                lc, slots, pos0)
            R = ctx_k.shape[1]
            k_all = jnp.concatenate([ctx_k, kp_], axis=1)
            v_all = jnp.concatenate([ctx_v, vp_], axis=1)
            qpos = jnp.where(valid, positions, swa.INVALID_POS)
            kp_all = jnp.concatenate([ctx_pos, qpos], axis=1)
            out_p = swa.splash_prefill_batched(
                qp_, k_all, v_all, kp_all, cfg.window_keys, ctx_len=R)
            for b in range(B):
                lc = cache_lib.write_prefill_kv(
                    lc, slots[b], kp_[b], vp_[b], positions[b], valid[b])
            # --- decode rows (ring updated first: token attends itself) ---
            qd, kd = _swa_rope(cfg, q[N:][None], k[N:][None],
                               d_positions[None])
            qd, kd, vd = qd[0], kd[0], v[N:]
            lc = cache_lib.write_decode_kv(lc, kd, vd, d_positions,
                                           d_active)
            from vllm_hymeta_tpu.ops.swa_decode_pallas import \
                fused_decode_attention
            if lc["k"].dtype == jnp.int8:
                out_d = fused_decode_attention(
                    qd, lc["k"], lc["v"], d_positions, cfg.window_keys,
                    k_scale=lc["k_scale"], v_scale=lc["v_scale"])
            else:
                rk, rv = cache_lib.kv_entry(lc)
                out_d = fused_decode_attention(qd, rk, rv, d_positions,
                                               cfg.window_keys)
            out = jnp.concatenate(
                [out_p.astype(y.dtype).reshape(N, H, D),
                 out_d.astype(y.dtype)], axis=0)
            att = linear(ap["o_proj"], common.merge_heads(out))
        else:
            q, k, v, g = _gla_qkvg(cfg, ap, y)                # [N+S, *, D]
            # --- decode rows on the PRE-chunk states (prefill slots are
            # inactive in d_active, so writes stay disjoint) ---
            from vllm_hymeta_tpu.ops.gla_decode_pallas import \
                gla_decode_active
            S0 = lc["state"][slots].astype(jnp.float32)       # [B,Hkv,D,D]
            o_d, S_dec = gla_decode_active(q[N:], k[N:], v[N:], g[N:],
                                           lc["state"], d_active)
            # --- prefill rows ---
            qp_ = q[:N].reshape(B, T, H, D)
            kp_ = jnp.where(valid[..., None, None],
                            k[:N].reshape(B, T, Hkv, D), 0.0)
            vp_ = jnp.where(valid[..., None, None],
                            v[:N].reshape(B, T, Hkv, D), 0.0)
            gp_ = jnp.where(valid[..., None, None],
                            g[:N].reshape(B, T, Hkv, D), 0.0)
            o_p, S_p = gla_chunk.gla_chunked(
                qp_.transpose(0, 2, 1, 3), kp_.transpose(0, 2, 1, 3),
                vp_.transpose(0, 2, 1, 3), gp_.transpose(0, 2, 1, 3),
                initial_state=S0)
            o = jnp.concatenate(
                [o_p.transpose(0, 2, 1, 3).astype(jnp.float32
                                                  ).reshape(N, H, D),
                 o_d.astype(jnp.float32)], axis=0)
            att = _gla_out(cfg, ap, o)
            S_comb = S_dec.at[slots].set(S_p.astype(S_dec.dtype))
            lc = {"state": S_comb}
        new_layers.append(lc)
        y, res = naive.rms_norm_residual(att, res, lp["mlp_norm"]["w"],
                                         cfg.norm_eps)
        x = res + glu_mlp(lp["mlp"], y)

    xp = x[:N].reshape(B, T, -1)
    x_last = jnp.take_along_axis(
        xp, jnp.maximum(n_valid - 1, 0)[:, None, None], axis=1)[:, 0]
    xh = jnp.concatenate([x_last, x[N:]], axis=0)             # [B+S, h]
    xh = naive.rms_norm(xh, params["final_norm"]["w"], cfg.norm_eps)
    logits = common.lm_head_gather(params["lm_head"], xh, NULL_CTX)
    return logits[:B], logits[B:], {"layers": new_layers}


def prefill_batched(cfg: GLAswaConfig, params: dict, cache: dict,
                    tokens: jax.Array,    # [B, T] (padded)
                    slots: jax.Array,     # [B] int32
                    pos0: jax.Array,      # [B] first position per request
                    n_valid: jax.Array,   # [B] valid token counts
                    ) -> Tuple[jax.Array, dict]:
    """Multi-request prefill: B same-bucket chunks in ONE step, so the
    projections/MLP run at M = B*T (full MXU tiles) instead of B separate
    M = T dispatches — the role of the reference's mixed
    [prefills | decodes] batches (`attention/meta_attention.py:612-639`)
    for short-prompt serving.  Single-device path (the mesh engine keeps
    per-chunk dispatch)."""
    B, T = tokens.shape
    positions = pos0[:, None] + jnp.arange(T, dtype=jnp.int32)[None]
    valid = jnp.arange(T)[None] < n_valid[:, None]          # [B, T]
    x = common.embed_vp(params["embed"], tokens, NULL_CTX)  # [B, T, h]
    H, Hkv = cfg.num_attention_heads, cfg.num_key_value_heads
    D = cfg.head_dim

    new_layers = []
    for i, lp in enumerate(params["layers"]):
        res = x
        y = naive.rms_norm(x, lp["attn_norm"]["w"], cfg.norm_eps)
        ap = lp["attn"]
        lc = cache["layers"][i]
        if cfg.is_swa_layer(i):
            q, k, v = common.project_qkv(ap, y, H, Hkv, D)  # [B,T,*,D]
            q, k = _swa_rope(cfg, q, k, positions)
            ctx_k, ctx_v, ctx_pos = common.gather_ring_context_batched(
                lc, slots, pos0)
            R = ctx_k.shape[1]
            k_all = jnp.concatenate([ctx_k, k], axis=1)
            v_all = jnp.concatenate([ctx_v, v], axis=1)
            qp = jnp.where(valid, positions, swa.INVALID_POS)
            kp_all = jnp.concatenate([ctx_pos, qp], axis=1)
            out = swa.splash_prefill_batched(
                q, k_all, v_all, kp_all, cfg.window_keys, ctx_len=R)
            att = linear(ap["o_proj"],
                         common.merge_heads(out.astype(y.dtype)))
            for b in range(B):
                lc = cache_lib.write_prefill_kv(
                    lc, slots[b], k[b], v[b], positions[b], valid[b])
        else:
            q, k, v, g = _gla_qkvg(cfg, ap, y)
            k = jnp.where(valid[..., None, None], k, 0.0)
            v = jnp.where(valid[..., None, None], v, 0.0)
            g = jnp.where(valid[..., None, None], g, 0.0)
            S0 = lc["state"][slots].astype(jnp.float32)     # [B, H, D, D]
            o, S = gla_chunk.gla_chunked(
                q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
                v.transpose(0, 2, 1, 3), g.transpose(0, 2, 1, 3),
                initial_state=S0)
            att = _gla_out(cfg, ap, o.transpose(0, 2, 1, 3))
            lc = {"state": lc["state"].at[slots].set(
                S.astype(lc["state"].dtype))}
        new_layers.append(lc)
        y, res = naive.rms_norm_residual(att, res, lp["mlp_norm"]["w"],
                                         cfg.norm_eps)
        x = res + glu_mlp(lp["mlp"], y)

    x_last = jnp.take_along_axis(
        x, jnp.maximum(n_valid - 1, 0)[:, None, None], axis=1)[:, 0]
    x_last = naive.rms_norm(x_last, params["final_norm"]["w"], cfg.norm_eps)
    logits = common.lm_head_gather(params["lm_head"], x_last, NULL_CTX)
    return logits, {"layers": new_layers}


# ---------------------------------------------------------------------------
# decode (one token per active slot)
# ---------------------------------------------------------------------------

def decode(cfg: GLAswaConfig, params: dict, cache: dict,
           tokens: jax.Array,      # [S]
           positions: jax.Array,   # [S] position of the new token
           active: jax.Array,      # [S] bool
           pctx=NULL_CTX,
           ) -> Tuple[jax.Array, dict]:
    """One decode step for the whole slot batch; returns (logits [S, V],
    updated cache).  Under DP the slot batch arrives pre-sharded."""
    S = tokens.shape[0]
    x = common.embed_vp(params["embed"], tokens, pctx)  # [S, h]

    new_layers = []
    for i, lp in enumerate(params["layers"]):
        res = x
        y = naive.rms_norm(x, lp["attn_norm"]["w"], cfg.norm_eps)
        ap = lp["attn"]
        lc = cache["layers"][i]
        if cfg.is_swa_layer(i):
            H, Hkv = common.local_heads(cfg, pctx)
            D = cfg.head_dim
            # treat the slot batch as a length-S "sequence" of independent rows
            q, k, v = common.project_qkv(ap, y, H, Hkv, D)  # [S, H, D]
            cos, sin = naive.rope_cos_sin(positions, D, cfg.rope_theta)
            q = naive.apply_rope(q, cos, sin)
            k = naive.apply_rope(k, cos, sin)
            lc = cache_lib.write_decode_kv(lc, k, v, positions, active)
            from vllm_hymeta_tpu.ops.swa_decode_pallas import \
                fused_decode_attention
            if lc["k"].dtype == jnp.int8:
                # int8 ring straight into the kernel (scales applied
                # in-kernel; no [S,Hkv,R,D] dequant materialization) —
                # the dispatcher dequantizes itself on non-TPU backends
                out = fused_decode_attention(
                    q, lc["k"], lc["v"], positions, cfg.window_keys,
                    k_scale=lc["k_scale"], v_scale=lc["v_scale"])
            else:
                rk, rv = cache_lib.kv_entry(lc)
                out = fused_decode_attention(q, rk, rv, positions,
                                             cfg.window_keys)
            att = pctx.psum(linear(
                ap["o_proj"], common.merge_heads(out.astype(y.dtype))))
        else:
            q, k, v, g = _gla_qkvg(cfg, ap, y, pctx)  # [S, H, D]
            from vllm_hymeta_tpu.ops.gla_decode_pallas import \
                gla_decode_active
            # N3 kernel: state HBM traffic ∝ active slots (aliased
            # in-place update; inactive rows untouched, o rows zeroed)
            o, S_new = gla_decode_active(q, k, v, g, lc["state"], active)
            att = _gla_out(cfg, ap, o, pctx)
            lc = {"state": S_new}
        new_layers.append(lc)
        y, res = naive.rms_norm_residual(att, res, lp["mlp_norm"]["w"],
                                         cfg.norm_eps)
        x = res + pctx.psum(glu_mlp(lp["mlp"], y))

    x = naive.rms_norm(x, params["final_norm"]["w"], cfg.norm_eps)
    logits = common.lm_head_gather(params["lm_head"], x, pctx)
    return logits, {"layers": new_layers}
