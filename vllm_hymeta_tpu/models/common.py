"""Pieces shared by both model families: projections, ring-context
assembly, parameter initializers."""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from vllm_hymeta_tpu.models.layers import linear
from vllm_hymeta_tpu.ops.swa import INVALID_POS
from vllm_hymeta_tpu import cache as cache_lib


def split_heads(x: jax.Array, n_heads: int) -> jax.Array:
    """[..., T, H*D] -> [..., T, H, D]"""
    return x.reshape(*x.shape[:-1], n_heads, x.shape[-1] // n_heads)


def merge_heads(x: jax.Array) -> jax.Array:
    return x.reshape(*x.shape[:-2], x.shape[-2] * x.shape[-1])


def project_qkv(p: dict, x: jax.Array, n_heads: int, n_kv_heads: int,
    head_dim: int):
    """Separate projections, or one fused matmul when fuse_params merged
    them (mirrors vLLM's QKVParallelLinear, `modeling_hymeta.py:420-428`).
    Fused layout per TP rank: [q_local | k_local | v_local]."""
    if "qkv_proj" in p:
        y = linear(p["qkv_proj"], x)
        qd = n_heads * head_dim
        kvd = n_kv_heads * head_dim
        q, k, v = jnp.split(y, [qd, qd + kvd], axis=-1)
        return (split_heads(q, n_heads), split_heads(k, n_kv_heads),
                split_heads(v, n_kv_heads))
    q = split_heads(linear(p["q_proj"], x), n_heads)
    k = split_heads(linear(p["k_proj"], x), n_kv_heads)
    v = split_heads(linear(p["v_proj"], x), n_kv_heads)
    return q, k, v


def _fusable(ps) -> bool:
    """Projection groups with per-tensor activation permutations
    (desc_act GPTQ) cannot share one fused matmul — each tensor gathers
    its input differently."""
    return not any("act_perm" in p for p in ps)


def _concat_linears(ps, tp: int = 1) -> dict:
    """Concatenate column-parallel linear params along the output dim,
    rank-block-interleaved so a "model"-axis shard of the result equals
    the concat of the shards ([p0_r | p1_r | ...] per rank r)."""
    fused: dict = {}

    def cat(vals, axis):
        if tp == 1:
            return jnp.concatenate(vals, axis=axis)
        blocks = []
        for r in range(tp):
            for v in vals:
                n = v.shape[axis] // tp
                blocks.append(jax.lax.slice_in_dim(v, r * n, (r + 1) * n,
                                                   axis=axis))
        return jnp.concatenate(blocks, axis=axis)

    if all("w" in p for p in ps):
        fused["w"] = cat([p["w"] for p in ps], 1)
    elif all("qw4" in p for p in ps):
        fused["qw4"] = cat([p["qw4"] for p in ps], 1)
        fused["scales"] = cat([p["scales"] for p in ps], 1)
        fused["zeros"] = cat([p["zeros"] for p in ps], 1)
        if all("qw8" in p for p in ps):   # dual-precision prefill shadow
            fused["qw8"] = cat([p["qw8"] for p in ps], 1)
            fused["w8_scale"] = cat([p["w8_scale"] for p in ps], 0)
    else:  # int8 layouts: concat along N for qw/scales/zeros
        fused["qw"] = cat([p["qw"] for p in ps], 1)
        if "w_scale" in ps[0]:
            fused["w_scale"] = cat([p["w_scale"] for p in ps], 0)
        else:
            fused["scales"] = cat([p["scales"] for p in ps], 1)
            fused["zeros"] = cat([p["zeros"] for p in ps], 1)
    if any("b" in p for p in ps):
        fused["b"] = cat([p.get("b", jnp.zeros((_out_dim(p),),
                                               _bias_dtype(ps)))
                          for p in ps], 0)
    return fused


def _out_dim(p: dict) -> int:
    for key in ("w", "qw", "qw4"):
        if key in p:
            return p[key].shape[1]
    raise KeyError(f"no weight leaf in {list(p)}")


def _bias_dtype(ps):
    for p in ps:
        if "b" in p:
            return p["b"].dtype
    return jnp.bfloat16


def fuse_params(cfg, params: dict, tp: int = 1) -> dict:
    """Merge per-layer projections into single matmuls:
      * q/k/v (+ the 7B low-rank gate down-projection gk_a) -> qkv_proj
      * for the 70B hybrid, BOTH branches' q/k/v -> one qkv6_proj
      * gate/up -> gate_up_proj
    Cuts the number of big matmuls per layer roughly in half — decode is
    weight-read and op-overhead bound.  `tp` controls the rank-block
    layout so "model"-axis sharding stays correct.

    Idempotent: already-fused trees pass through, so callers can fuse on
    the host before device_put (avoids holding fused + unfused copies in
    HBM at once).  A pre-fused tree must have used the same `tp`."""
    import copy
    from vllm_hymeta_tpu.config import HymetaConfig
    if params["layers"]:
        l0 = params["layers"][0]
        a0 = l0.get("attn", {})
        if any(k in a0 for k in ("qkv_proj", "qkvg_proj", "qkv6_proj")):
            return params   # already fused (e.g. on host before device_put)
    out = copy.copy(params)
    out["layers"] = []
    is_hymeta = isinstance(cfg, HymetaConfig)
    for i, lp in enumerate(params["layers"]):
        lp = {k: (dict(v) if isinstance(v, dict) else v)
              for k, v in lp.items()}
        ap = dict(lp["attn"])
        if is_hymeta:
            sw, gl = dict(ap["swa"]), dict(ap["gla"])
            six = [sw["q_proj"], sw["k_proj"], sw["v_proj"],
                   gl["q_proj"], gl["k_proj"], gl["v_proj"]]
            if _fusable(six):
                ap["qkv6_proj"] = _concat_linears(six, tp)
                for key in ("q_proj", "k_proj", "v_proj"):
                    sw.pop(key)
                    gl.pop(key)
            ap["swa"], ap["gla"] = sw, gl
        else:
            parts = [ap["q_proj"], ap["k_proj"], ap["v_proj"]]
            if _fusable(parts):
                for key in ("q_proj", "k_proj", "v_proj"):
                    ap.pop(key)
                same_layout = ("gk_a" in ap and all(
                    ((key in ap["gk_a"]) == (key in parts[0]))
                    for key in ("w", "qw", "qw4")))
                if "gk_a" in ap and tp == 1 and same_layout:
                    # gk_a's low-rank output is replicated under TP (and
                    # is excluded from quantization), so it only rides
                    # the fused matmul when layouts match single-rank
                    parts.append(ap.pop("gk_a"))
                    ap["qkvg_proj"] = _concat_linears(parts, tp)
                else:
                    ap["qkv_proj"] = _concat_linears(parts, tp)
        lp["attn"] = ap
        for mkey in ("mlp", "shared_mlp"):
            if mkey in lp:
                m = dict(lp[mkey])
                gu = [m["gate_proj"], m["up_proj"]]
                if _fusable(gu):
                    m.pop("gate_proj")
                    m.pop("up_proj")
                    m["gate_up_proj"] = _concat_linears(gu, tp)
                lp[mkey] = m
        _attach_sublane_int4(lp)
        if tp > 1:
            _repack_row_int4(lp, tp)
        out["layers"].append(lp)
    return out


def _attach_sublane_int4(lp: dict):
    """Attach the decode-side sublane-nibble-packed INT4 layout ("qw4p"
    int8 [G, g/2, N] + bf16 [G, 1, N] group params) to every packed-INT4
    linear, replacing the per-decode-block packed->s4 conversion with an
    in-kernel `pltpu.bitcast` (ops.quant_matmul.int4gp_matvec; VERDICT
    r4 weak #2).  Runs on the PRE-repack qw4 (pack_int4_sublane needs
    the global split-half layout; qw4p row-shards along G as-is).

    When an INT8 prefill shadow ("qw8") is present the big qw4 tensor
    (and its [G, N] scales/zeros) is DROPPED — prefill takes qw8, decode
    takes qw4p, so keeping qw4 would only double the INT4 weight HBM."""
    from vllm_hymeta_tpu.ops.quant_matmul import pack_int4_sublane

    def visit(node):
        if isinstance(node, dict):
            if ("qw4" in node and "scales" in node
                    and node["qw4"].ndim == 2 and "qw4p" not in node):
                K2, N = node["qw4"].shape
                G = node["scales"].shape[0]
                g = 2 * K2 // G
                if g % 2 or (2 * K2) % G:
                    return node
                node = dict(node)
                node["qw4p"] = pack_int4_sublane(node["qw4"], g)
                node["s4_scales"] = node["scales"].astype(
                    jnp.bfloat16).reshape(G, 1, N)
                node["s4_zeros"] = node["zeros"].astype(
                    jnp.bfloat16).reshape(G, 1, N)
                if "qw8" in node:
                    del node["qw4"], node["scales"], node["zeros"]
                return node
            return {k: visit(v) for k, v in node.items()}
        if isinstance(node, list):
            return [visit(v) for v in node]
        return node

    for key in list(lp.keys()):
        lp[key] = visit(lp[key])


def _repack_row_int4(lp: dict, tp: int):
    """Row-sharded packed-INT4 tensors must be split-half packed PER
    SHARD (ops.quant_matmul.repack_int4_rows)."""
    from vllm_hymeta_tpu.ops.quant_matmul import repack_int4_rows

    def visit(d):
        for name in ("o_proj", "out_proj", "down_proj"):
            p = d.get(name)
            if isinstance(p, dict) and "qw4" in p:
                p = dict(p)
                p["qw4"] = repack_int4_rows(p["qw4"], tp)
                d[name] = p

    visit(lp.get("attn", {}))
    for mkey in ("mlp", "shared_mlp"):
        if mkey in lp:
            visit(lp[mkey])


def prepare_decode_params(params: dict) -> dict:
    """Decode-program preamble: convert every split-half-packed INT4
    tensor to the grouped-s4 layout consumed by ops.quant_matmul.
    int4g_matvec ("qw4g" s4 [G, g, N] + bf16 [G, 1, N] group params).

    Called INSIDE the jitted decode-block program, before the fori_loop,
    so the conversion runs once per block (s4 arrays cannot cross the jit
    boundary — see ops/quant_matmul.py).  No-op off-TPU and for non-INT4
    layouts."""
    if jax.default_backend() not in ("tpu", "axon"):
        return params
    from vllm_hymeta_tpu.ops.quant_matmul import qw4_to_grouped_s4

    def visit(node):
        if isinstance(node, dict):
            if "qw4p" in node:
                return node   # sublane-packed layout: no conversion
            if "qw4" in node and "scales" in node:
                K2, N = node["qw4"].shape
                G = node["scales"].shape[0]
                gsz = 2 * K2 // G
                out = dict(node)
                out["qw4g"] = qw4_to_grouped_s4(node["qw4"], gsz)
                out["s4_scales"] = node["scales"].astype(
                    jnp.bfloat16).reshape(G, 1, N)
                out["s4_zeros"] = node["zeros"].astype(
                    jnp.bfloat16).reshape(G, 1, N)
                return out
            return {k: visit(v) for k, v in node.items()}
        if isinstance(node, list):
            return [visit(v) for v in node]
        return node

    return visit(params)


def repeat_kv_heads(x: jax.Array, rep: int) -> jax.Array:
    """GQA repeat along the heads axis (torch repeat_interleave semantics,
    `hf_model/linear_attention.py:24-33`). x: [..., Hkv, D]."""
    if rep == 1:
        return x
    return jnp.repeat(x, rep, axis=-2)


def gather_ring_context(
    layer_cache: dict, slot: jax.Array, pos0: jax.Array
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Read a slot's ring in ascending-position order for chunked prefill.

    Returns (k [R, Hkv, D], v [R, Hkv, D], k_pos [R]) where entry i holds
    timeline position pos0 - R + i (INVALID_POS when that position was
    never written, i.e. < 0).
    """
    kc, vc = cache_lib.kv_entry(layer_cache)
    S, Hkv, R, D = kc.shape
    k_pos = pos0 - R + jnp.arange(R, dtype=jnp.int32)
    # ascending-position view = circular roll by pos0 mod R.  Device-trace
    # comparison (r3): a mod-index gather runs at ~81 GB/s and a
    # doubled-ring dynamic_slice at ~59 GB/s (dynamic sublane starts are
    # strided) — the gather wins, so it stays.
    idx = jnp.mod(k_pos, R)
    k = jnp.swapaxes(kc[slot][:, idx, :], 0, 1)  # [R, Hkv, D]
    v = jnp.swapaxes(vc[slot][:, idx, :], 0, 1)
    k_pos = jnp.where(k_pos >= 0, k_pos, INVALID_POS)
    return k, v, k_pos


def gather_ring_context_batched(
    layer_cache: dict, slots: jax.Array, pos0: jax.Array
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Batched gather_ring_context: slots/pos0 [B] ->
    (k [B, R, Hkv, D], v [B, R, Hkv, D], k_pos [B, R])."""
    kc, vc = cache_lib.kv_entry(layer_cache)
    S, Hkv, R, D = kc.shape
    k_pos = pos0[:, None] - R + jnp.arange(R, dtype=jnp.int32)[None]
    idx = jnp.mod(k_pos, R)                                  # [B, R]
    sel = idx[:, None, :, None]
    k = jnp.take_along_axis(kc[slots], sel, axis=2)          # [B,Hkv,R,D]
    v = jnp.take_along_axis(vc[slots], sel, axis=2)
    k_pos = jnp.where(k_pos >= 0, k_pos, INVALID_POS)
    return jnp.swapaxes(k, 1, 2), jnp.swapaxes(v, 1, 2), k_pos


def local_heads(cfg, pctx) -> Tuple[int, int]:
    """(query heads, kv heads) on this model-parallel rank.  Requires
    tp <= num_key_value_heads (the replicate-if-fewer path of
    `modeling_hymeta.py:407-418` is future work)."""
    tp = pctx.tp
    Hq = cfg.num_attention_heads // tp
    assert cfg.num_key_value_heads % tp == 0, (
        f"tp={tp} must divide num_key_value_heads="
        f"{cfg.num_key_value_heads}")
    return Hq, cfg.num_key_value_heads // tp


def embed_vp(p: dict, ids: jax.Array, pctx) -> jax.Array:
    """Vocab-parallel embedding lookup: local-range gather + psum
    (the TP layout of vLLM's VocabParallelEmbedding,
    `modeling_hymeta.py:1104-1108`)."""
    w = p["w"]
    if pctx.model_axis is None:
        return jnp.take(w, ids, axis=0)
    vl = w.shape[0]
    local = ids - pctx.rank() * vl
    ok = (local >= 0) & (local < vl)
    x = jnp.take(w, jnp.clip(local, 0, vl - 1), axis=0)
    x = jnp.where(ok[..., None], x, 0)
    return pctx.psum(x)


def lm_head_gather(p: dict, x: jax.Array, pctx) -> jax.Array:
    """fp32 LM head over the vocab-sharded weight, gathered to full vocab
    (`modeling_hymeta.py:1459-1469`).  Dispatches on the optional int8
    layout from quant/transform.quantize_lm_head ("qw" + "w_scale")."""
    if "qw" in p:
        from vllm_hymeta_tpu.ops import quant_matmul
        # out_dtype=fp32 so the scale multiply never rounds through bf16 —
        # preserving the fp32-logit convention of the unquantized path
        y = quant_matmul.w8a8_matmul(
            x.astype(jnp.bfloat16), p["qw"], p["w_scale"],
            out_dtype=jnp.float32)
    else:
        y = jnp.dot(x.astype(jnp.float32), p["w"].astype(jnp.float32),
                    preferred_element_type=jnp.float32)
    return pctx.all_gather(y, axis=-1) if pctx.model_axis else y


def init_linear(key, d_in: int, d_out: int, bias: bool, dtype,
                std: float = 0.02) -> dict:
    k1, _ = jax.random.split(key)
    p = {"w": (jax.random.normal(k1, (d_in, d_out), jnp.float32)
               * std).astype(dtype)}
    if bias:
        p["b"] = jnp.zeros((d_out,), dtype)
    return p


def init_glu(key, h: int, inter: int, dtype) -> dict:
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "gate_proj": init_linear(k1, h, inter, False, dtype),
        "up_proj": init_linear(k2, h, inter, False, dtype),
        "down_proj": init_linear(k3, inter, h, False, dtype),
    }
