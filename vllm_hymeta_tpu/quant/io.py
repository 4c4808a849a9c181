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

    # collect packed groups by module prefix
    packed: Dict[str, dict] = {}
    dense = {}
    for name, arr in weights_lib._iter_checkpoint_tensors(path):
        name = weights_lib._fix_name(name)
        m = re.match(r"(.*)\.(qweight|qzeros|scales|g_idx)$", name)
        if m:
            packed.setdefault(m.group(1), {})[m.group(2)] = arr
        else:
            dense[name] = arr

    params = weights_lib.load_checkpoint(cfg, path, dtype=dtype) \
        if dense else None
    if params is None:
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
        d["qw"] = jnp.asarray(converted["qw"])
        d["scales"] = jnp.asarray(converted["scales"])
        d["zeros"] = jnp.asarray(converted["zeros"])
    return params
