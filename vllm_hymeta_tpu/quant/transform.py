"""Parameter-tree quantization transforms.

These produce the runtime layouts consumed by ops/quant_matmul (see
models/layers.linear dispatch):
  gptq:  {"qw": int8 [K, N], "scales": [K/g, N], "zeros": [K/g, N]}
  w8a8:  {"qw": int8 [K, N], "w_scale": [N]}

Exclusion rules mirror the reference pipelines: lm_head never quantized
(`hf_model/quant_w8a8.py:96` ignore=["lm_head"]), gk_proj excluded for the
7B (`hf_7B_model/quant_7B.py:15`, `gla_swa_gptq.py:8-24`), norms and
embeddings untouched.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

DEFAULT_EXCLUDE = ("lm_head", "gk_a", "gk_b", "g_norm", "norm", "embed",
                   "gate")  # "gate" = MoE router; mlp gate_proj is matched
                            # by its full name below


def _should_quantize(path: Tuple[str, ...], w: jax.Array,
                     exclude: Tuple[str, ...]) -> bool:
    if w.ndim != 2:
        return False
    name = "/".join(str(p) for p in path)
    leaf = path[-2] if len(path) >= 2 else ""
    if leaf == "gate" or "embed" in name or "lm_head" in name:
        return False
    for e in exclude:
        if e in ("gate", "embed", "lm_head"):
            continue
        if e in name:
            return False
    return any(k in name for k in
               ("q_proj", "k_proj", "v_proj", "o_proj", "out_proj",
                "gate_proj", "up_proj", "down_proj"))


def _walk(tree, path=()):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _walk(v, path + (k,))
    elif isinstance(tree, list):
        for i, v in enumerate(tree):
            yield from _walk(v, path + (i,))
    else:
        yield path, tree


def _get(tree, path):
    for p in path:
        tree = tree[p]
    return tree


def _set(tree, path, val):
    for p in path[:-1]:
        tree = tree[p]
    tree[path[-1]] = val


def quantize_params_w8a8(params: dict,
                         exclude: Tuple[str, ...] = DEFAULT_EXCLUDE) -> dict:
    """Symmetric per-output-channel INT8 weight quantization; activations
    are quantized per-token at runtime (ops/quant_matmul.w8a8_matmul)."""
    import copy
    out = copy.deepcopy(jax.tree.map(lambda x: x, params))

    for path, w in list(_walk(params)):
        if path[-1] != "w" or not _should_quantize(path, w, exclude):
            continue
        wf = w.astype(jnp.float32)
        scale = jnp.maximum(jnp.max(jnp.abs(wf), axis=0), 1e-8) / 127.0
        qw = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
        parent = _get(out, path[:-1])
        del parent["w"]
        parent["qw"] = qw
        parent["w_scale"] = scale
    return out


def quantize_params_gptq(params: dict, bits: int = 4, group_size: int = 64,
                         exclude: Tuple[str, ...] = DEFAULT_EXCLUDE) -> dict:
    """Round-to-nearest group-wise asymmetric weight quantization in the
    GPTQ runtime layout (per-group scale+zero, group_size along the input
    dim — matching gptqmodel's `QuantizeConfig(bits, group_size=64)`,
    `hf_7B_model/quant_7B.py:13-36`).

    This is the RTN fallback for checkpoints that were never GPTQ-processed
    (e.g. random benchmark weights); real GPTQ checkpoints load through
    quant/gptq_reader.py preserving their optimized scales/zeros.
    """
    import copy
    out = copy.deepcopy(jax.tree.map(lambda x: x, params))
    qmax = 2 ** bits - 1

    for path, w in list(_walk(params)):
        if path[-1] != "w" or not _should_quantize(path, w, exclude):
            continue
        K, N = w.shape
        g = group_size
        if K % g != 0:
            continue
        wf = w.astype(jnp.float32).reshape(K // g, g, N)
        wmin = jnp.min(wf, axis=1)
        wmax = jnp.max(wf, axis=1)
        scale = jnp.maximum(wmax - wmin, 1e-8) / qmax
        zero = jnp.round(-wmin / scale)
        q = jnp.clip(jnp.round(wf / scale[:, None, :])
                     + zero[:, None, :], 0, qmax)
        parent = _get(out, path[:-1])
        del parent["w"]
        # stored zero-centered so integer kernels apply directly
        q_centered = (q - (qmax + 1) // 2).astype(jnp.int8).reshape(K, N)
        if bits == 4:
            from vllm_hymeta_tpu.ops.quant_matmul import pack_int4
            parent["qw4"] = pack_int4(q_centered)   # 2 weights / byte
        else:
            parent["qw"] = q_centered
        parent["scales"] = scale
        parent["zeros"] = zero - (qmax + 1) // 2
    return out


def quantize_lm_head(params: dict) -> dict:
    """OPTIONAL int8 LM head (per-output-channel symmetric, same layout as
    W8A8 linears).  The reference always excludes lm_head from quantization
    (`hf_model/quant_w8a8.py:96`) and upcasts it to fp32
    (`modeling_hymeta.py:1459-1469`) — this is an extra serving knob for
    bandwidth-bound decode, where the bf16 head is ~14% of per-step HBM
    traffic on the 7B.  Top-1 agreement vs the bf16 head is property-tested
    (tests/test_quant.py); off by default — opt in via BENCH_INT8_HEAD=1
    in bench.py or by calling this transform before Engine construction.
    """
    import copy
    out = copy.deepcopy(jax.tree.map(lambda x: x, params))
    head = out.get("lm_head")
    if head is None or "w" not in head:
        return out
    wf = head["w"].astype(jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(wf), axis=0), 1e-8) / 127.0
    qw = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    out["lm_head"] = {"qw": qw, "w_scale": scale}
    return out


def attach_prefill_int8(params: dict) -> dict:
    """Dual-precision serving layout: alongside each packed-INT4 tensor,
    store an INT8 per-channel requantization of the SAME dequantized
    values ("qw8" + "w8_scale").

    Rationale (TPU roofline): decode is HBM-bandwidth bound, so it streams
    the INT4 packing (half the bytes); prefill is MXU-compute bound, where
    XLA's native int8 dot runs ~2x bf16 FLOPs — the int8 shadow feeds the
    MXU directly instead of paying a dequant-to-bf16 matmul.  The shadow is
    derived from the int4 grid, so prefill accuracy is >= the int4 path's
    (requantization error is second-order).  models/layers.linear picks the
    copy by batch size (<=64 rows => decode => INT4).
    """
    import copy
    from vllm_hymeta_tpu.ops.quant_matmul import dequant_groupwise, unpack_int4
    out = copy.deepcopy(jax.tree.map(lambda x: x, params))
    for path, leaf in list(_walk(params)):
        if path[-1] != "qw4":
            continue
        parent = _get(out, path[:-1])
        w = dequant_groupwise(unpack_int4(parent["qw4"]),
                              parent["scales"], parent["zeros"],
                              dtype=jnp.float32)
        scale = jnp.maximum(jnp.max(jnp.abs(w), axis=0), 1e-8) / 127.0
        parent["qw8"] = jnp.clip(jnp.round(w / scale), -127,
                                 127).astype(jnp.int8)
        parent["w8_scale"] = scale
    return out
