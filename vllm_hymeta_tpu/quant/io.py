"""Quantized-checkpoint I/O.

save_quantized / load_quantized: persist a (possibly quantized) param
pytree as sharded safetensors — the analogue of the offline quantization
pipelines' outputs (`hf_model/quant_w8a8.py:128-138` saves a compressed
checkpoint; `hf_7B_model/quant_7B.py:30-36` saves gptq shards).

load_gptq_checkpoint: ingest a real gptqmodel/AutoGPTQ checkpoint
(qweight/qzeros/scales/g_idx tensors) into the runtime layout, falling
back to dense weights for non-quantized entries.
"""

from __future__ import annotations

import json
import os
import re
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from vllm_hymeta_tpu import weights as weights_lib
from vllm_hymeta_tpu.quant import gptq_reader


def _flatten(tree, path=()):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _flatten(v, path + (str(k),))
    elif isinstance(tree, list):
        for i, v in enumerate(tree):
            yield from _flatten(v, path + (str(i),))
    else:
        yield ".".join(path), tree


def save_quantized(params: dict, path: str, meta: Optional[dict] = None):
    """Write the param tree (any mix of bf16 / int8 layouts) to
    `<path>/quantized.safetensors` + an index json for reconstruction."""
    os.makedirs(path, exist_ok=True)
    try:
        import ml_dtypes
        from safetensors.numpy import save_file
    except Exception as e:  # pragma: no cover
        raise RuntimeError(f"safetensors writer unavailable: {e}")

    flat = {}
    index = {}
    for name, arr in _flatten(params):
        # safetensors writes raw buffers: views must be made contiguous
        a = np.ascontiguousarray(np.asarray(arr))
        index[name] = {"dtype": str(a.dtype), "shape": list(a.shape)}
        flat[name] = a
    save_file(flat, os.path.join(path, "quantized.safetensors"))
    with open(os.path.join(path, "quantized_index.json"), "w") as f:
        json.dump({"tensors": index, "meta": meta or {}}, f)


def load_quantized(path: str) -> dict:
    """Rebuild the param tree saved by save_quantized."""
    from vllm_hymeta_tpu.native import safetensors as native_st
    tree: dict = {}
    for name, arr in native_st.iter_tensors(
            os.path.join(path, "quantized.safetensors"),
            bf16_as="ml_dtypes"):
        parts = name.split(".")
        d = tree
        for i, p in enumerate(parts[:-1]):
            key = int(p) if p.isdigit() else p
            nxt_is_idx = parts[i + 1].isdigit() if i + 1 < len(parts) else False
            if isinstance(d, list):
                while len(d) <= key:
                    d.append([] if nxt_is_idx else {})
                d = d[key]
            else:
                if key not in d:
                    d[key] = [] if nxt_is_idx else {}
                d = d[key]
        last = parts[-1]
        key = int(last) if last.isdigit() else last
        val = jnp.asarray(arr)
        if isinstance(d, list):
            while len(d) <= key:
                d.append(None)
            d[key] = val
        else:
            d[key] = val
    return tree


def is_gptq_checkpoint(path: str) -> bool:
    """True when the checkpoint declares a gptq/AutoGPTQ quantization
    (quantize_config.json, or config.json quant_method gptq).  Other
    packed formats (awq, ...) share tensor names but NOT the bit layout —
    they are rejected, not mis-unpacked."""
    if os.path.exists(os.path.join(path, "quantize_config.json")):
        return True
    p = os.path.join(path, "config.json")
    if not os.path.exists(p):
        return False
    with open(p) as f:
        qc = json.load(f).get("quantization_config", {})
    if not isinstance(qc, dict):
        return False
    method = qc.get("quant_method")
    if method is not None:
        return method == "gptq"
    # legacy gptq configs carry bits/group_size without quant_method
    return "bits" in qc and "group_size" in qc


def is_compressed_tensors_checkpoint(path: str) -> bool:
    """True when config.json declares a compressed-tensors (llmcompressor)
    quantization_config — the save format of the reference's W8A8 pipeline
    (`hf_model/quant_w8a8.py:120-138`, GPTQModifier(scheme="W8A8") +
    save_pretrained(save_compressed=True))."""
    p = os.path.join(path, "config.json")
    if not os.path.exists(p):
        return False
    with open(p) as f:
        qc = json.load(f).get("quantization_config", {})
    return isinstance(qc, dict) and qc.get("quant_method") in (
        "compressed-tensors", "sparseml")


def load_compressed_w8a8_checkpoint(cfg, path: str,
                                    dtype=jnp.bfloat16) -> dict:
    """Ingest a compressed-tensors W8A8 checkpoint (llmcompressor
    `int-quantized` format) into the runtime W8A8 layout.

    Checkpoint tensors per quantized Linear (torch [out, in] layout):
      <name>.weight            : int8 [N, K]
      <name>.weight_scale      : fp  [N, 1] (strategy "channel") or scalar
      <name>.weight_zero_point : optional (symmetric scheme: all zeros)
    Activations are dynamic per-token (nothing stored).  Runtime layout
    (models/layers.linear dispatch): {"qw" int8 [K, N], "w_scale" [N]} —
    scales preserved exactly, no RTN re-quantization.

    Modules our runtime keeps dense (MoE expert stacks, anything the
    name router can't place) are dequantized to `dtype` and routed through
    the normal dense loader instead of being dropped.
    """
    groups: Dict[str, dict] = {}
    dense = []
    for name, arr in weights_lib._iter_checkpoint_tensors(path):
        name = weights_lib._fix_name(name)
        m = re.match(r"(.*)\.(weight_scale|weight_zero_point|weight_shape"
                     r"|weight_g_idx|input_scale|input_zero_point)$", name)
        if m:
            groups.setdefault(m.group(1), {})[m.group(2)] = arr
        elif name.endswith(".weight") and arr.dtype == np.int8:
            groups.setdefault(name[: -len(".weight")], {})["weight"] = arr
        else:
            dense.append((name, arr))

    from vllm_hymeta_tpu.config import HymetaConfig
    is_hymeta = isinstance(cfg, HymetaConfig)
    route = weights_lib._route_hymeta if is_hymeta \
        else weights_lib._route_glaswa
    expert_pat = re.compile(
        r"model\.layers\.\d+\.block_sparse_moe\.experts\.\d+"
        r"\.(gate_proj|up_proj|down_proj)")

    quantized = {}
    for prefix, g in groups.items():
        if "weight" not in g or "weight_scale" not in g:
            # scale-only leftovers (e.g. input_scale for a static scheme)
            continue
        w = g["weight"]                      # int8 [N, K]
        scale = np.asarray(g["weight_scale"], np.float32).reshape(-1)
        if scale.size == 1:                  # per-tensor -> broadcast
            scale = np.full((w.shape[0],), float(scale[0]), np.float32)
        elif scale.size != w.shape[0]:
            raise NotImplementedError(
                f"{prefix}: weight_scale shape "
                f"{np.asarray(g['weight_scale']).shape} is neither "
                f"per-tensor nor per-channel [{w.shape[0]}] — group-wise "
                "compressed-tensors strategies are unsupported")
        zp = g.get("weight_zero_point")
        if zp is not None and np.any(np.asarray(zp) != 0):
            raise NotImplementedError(
                f"{prefix}: asymmetric weight_zero_point unsupported "
                "(reference W8A8 scheme is symmetric)")
        r = route(cfg, prefix + ".weight")
        if r is None or expert_pat.match(prefix):
            # dense-only destination: dequantize and hand to the router
            dense.append((prefix + ".weight",
                          w.astype(np.float32) * scale[:, None]))
            continue
        quantized[prefix] = {
            "qw": np.ascontiguousarray(w.T),          # [K, N] int8
            "w_scale": scale,                          # [N]
        }

    params = weights_lib.load_checkpoint_tensors(cfg, dense, dtype=dtype)
    for prefix, q in quantized.items():
        path_keys, _, _ = route(cfg, prefix + ".weight")
        d = params
        for pk in path_keys[:-1]:
            d = d[pk]
        d.pop("w", None)
        d["qw"] = jnp.asarray(q["qw"])
        d["w_scale"] = jnp.asarray(q["w_scale"])
    return params


def load_gptq_checkpoint(cfg, path: str, dtype=jnp.bfloat16,
                         zero_offset: bool = False) -> dict:
    """Load a checkpoint containing gptqmodel packed tensors: for every
    quantized Linear, `<module>.qweight/.qzeros/.scales[/.g_idx]` replace
    `<module>.weight`; everything else loads densely.

    Bits inferred from the quantize_config.json / config.json
    quantization_config if present, else from pack ratios.
    """
    bits = None
    for cfg_name in ("quantize_config.json", "config.json"):
        p = os.path.join(path, cfg_name)
        if os.path.exists(p):
            with open(p) as f:
                d = json.load(f)
            qc = d if cfg_name == "quantize_config.json" else \
                d.get("quantization_config", {})
            if isinstance(qc, dict) and "bits" in qc:
                bits = int(qc["bits"])
                zero_offset = not qc.get("sym", not zero_offset)
                break

    # ONE pass over the shards: packed groups collected by module prefix,
    # dense tensors routed straight into the tree (the r4 version
    # iterated the same files a second time through load_checkpoint —
    # 2x the load I/O at 70B scale; `modeling_hymeta.py:1487-1691`
    # streams once)
    packed: Dict[str, dict] = {}
    dense = []
    for name, arr in weights_lib._iter_checkpoint_tensors(path):
        name = weights_lib._fix_name(name)
        m = re.match(r"(.*)\.(qweight|qzeros|scales|g_idx)$", name)
        if m:
            packed.setdefault(m.group(1), {})[m.group(2)] = arr
        else:
            dense.append((name, arr))

    if dense:
        params = weights_lib.load_checkpoint_tensors(cfg, dense,
                                                     dtype=dtype)
    else:
        from vllm_hymeta_tpu.models import get_model
        params = get_model(cfg).init_params(cfg, jax.random.PRNGKey(0),
                                            dtype=dtype)

    from vllm_hymeta_tpu.config import HymetaConfig
    is_hymeta = isinstance(cfg, HymetaConfig)
    route = weights_lib._route_hymeta if is_hymeta \
        else weights_lib._route_glaswa

    for prefix, group in packed.items():
        if "qweight" not in group:
            continue
        if bits is None:
            # infer: qweight rows * (32/bits) == in_features; try 4 then 8
            bits = 4 if group["qweight"].shape[0] * 8 == \
                group["scales"].shape[0] * 64 * 1 else 8
        r = route(cfg, prefix + ".weight")
        if r is None:
            continue
        path_keys, _, _ = r
        converted = gptq_reader.convert_gptq_linear(
            group["qweight"], group["qzeros"], group["scales"],
            group.get("g_idx"), bits, zero_offset)
        d = params
        for pk in path_keys[:-1]:
            d = d[pk]
        d.pop("w", None)
        if bits == 4 and converted["qw"].shape[0] % 2 == 0:
            # serve 4-bit weights in the split-half packed layout the
            # grouped-s4 decode kernel streams (half the bytes of the
            # int8-stored form), with the INT8 prefill shadow attached
            # by the caller (attach_prefill_int8)
            from vllm_hymeta_tpu.ops.quant_matmul import pack_int4
            d["qw4"] = jnp.asarray(
                np.asarray(pack_int4(jnp.asarray(converted["qw"]))))
            d["scales"] = jnp.asarray(converted["scales"])
            d["zeros"] = jnp.asarray(converted["zeros"])
        else:
            d["qw"] = jnp.asarray(converted["qw"])
            d["scales"] = jnp.asarray(converted["scales"])
            d["zeros"] = jnp.asarray(converted["zeros"])
        if "act_perm" in converted:
            d["act_perm"] = jnp.asarray(converted["act_perm"])
    return params
