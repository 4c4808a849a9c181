"""Checkpoint ingestion: HF safetensors/pytorch checkpoints -> param pytree.

Name schema per the checkpoint dump `/root/reference/70weight.txt` and the
reference loaders (`modeling_hymeta.py:1487-1691`,
`model_for_7B/modeling_gla_swa.py:640-700`):

  model.embeddings.weight            -> embed.w
  model.meta_tokens                  -> meta_tokens          (70B)
  model.lower_bounds                 -> lower_bounds         (70B)
  model.layers.{i}.attn_norm.weight  -> layers[i].attn_norm.w
  ... (see _route functions)
  model.norm.weight                  -> final_norm.w
  lm_head.weight                     -> lm_head.w (fp32 for 70B,
                                        `modeling_hymeta.py:1413-1429`)

Quirks honoured: the "mode." -> "model." checkpoint typo repair
(`modeling_hymeta.py:1670-1671`); torch Linear weights are [out, in] and
are transposed to the [in, out] layout used here; the 7B gk_proj
Sequential indices 0/1 map to gk_a / gk_b
(`hf_7B_model/gla_attention.py:82-83`, serving rename at
`modeling_gla_swa.py:676-679`).
"""

from __future__ import annotations

import glob
import os
import re
from typing import Iterator, Tuple

import jax.numpy as jnp
import numpy as np

from vllm_hymeta_tpu.config import GLAswaConfig, HymetaConfig


def _iter_checkpoint_tensors(path: str) -> Iterator[Tuple[str, np.ndarray]]:
    """Stream (name, array) from safetensors (preferred; zero-copy via the
    native C++ mmap reader when built — csrc/) or torch .bin."""
    st_files = sorted(glob.glob(os.path.join(path, "*.safetensors")))
    if st_files:
        from vllm_hymeta_tpu.native import safetensors as native_st
        for f in st_files:
            yield from native_st.iter_tensors(f)
        return
    bin_files = sorted(glob.glob(os.path.join(path, "pytorch_model*.bin")))
    if not bin_files:
        raise FileNotFoundError(f"no checkpoint shards under {path}")
    import torch
    for f in bin_files:
        sd = torch.load(f, map_location="cpu", weights_only=True)
        for name, t in sd.items():
            yield name, t.float().numpy()


def _fix_name(name: str) -> str:
    # checkpoint typo repair (`modeling_hymeta.py:1670-1671`)
    if name.startswith("mode.") and not name.startswith("model."):
        name = "model." + name[len("mode."):]
    return name


def _as_dtype(a: np.ndarray, dtype) -> jnp.ndarray:
    return jnp.asarray(a).astype(dtype)


def _set(params: dict, path: list, value):
    d = params
    for p in path[:-1]:
        d = d[p]
    d[path[-1]] = value


def load_checkpoint(cfg, path: str, dtype=jnp.bfloat16) -> dict:
    """Build the param pytree, routing each checkpoint tensor."""
    return load_checkpoint_tensors(cfg, _iter_checkpoint_tensors(path),
                                   dtype=dtype)


def load_checkpoint_tensors(cfg, tensors, dtype=jnp.bfloat16) -> dict:
    """Like load_checkpoint but over an iterable of (name, array) —
    lets quantized-checkpoint readers route their dense remainder through
    the same name schema."""
    from vllm_hymeta_tpu.models import get_model
    import jax
    model = get_model(cfg)
    # skeleton with correct structure (tiny random init, overwritten)
    params = model.init_params(cfg, jax.random.PRNGKey(0), dtype=dtype)
    is_hymeta = isinstance(cfg, HymetaConfig)
    seen = set()

    expert_pat = re.compile(
        r"model\.layers\.(\d+)\.block_sparse_moe\.experts\.(\d+)"
        r"\.(gate_proj|up_proj|down_proj)\.weight")
    for name, arr in tensors:
        name = _fix_name(name)
        if is_hymeta:
            me = expert_pat.match(name)
            if me:
                i, e, proj = int(me.group(1)), int(me.group(2)), me.group(3)
                stacked = params["layers"][i]["moe"]["experts"][proj]
                params["layers"][i]["moe"]["experts"][proj] = (
                    stacked.at[e].set(jnp.asarray(
                        arr.astype(np.float32).T).astype(stacked.dtype)))
                seen.add(name)
                continue
        route = _route_hymeta(cfg, name) if is_hymeta \
            else _route_glaswa(cfg, name)
        if route is None:
            continue
        path_keys, transpose, want_fp32 = route
        a = arr.astype(np.float32)
        if transpose:
            a = a.T
        tgt_dtype = jnp.float32 if want_fp32 else dtype
        _set(params, path_keys, _as_dtype(a, tgt_dtype))
        seen.add(name)
    return params


def _route_glaswa(cfg: GLAswaConfig, name: str):
    """-> (path, transpose, fp32) or None."""
    if name == "model.embeddings.weight":
        return ["embed", "w"], False, False
    if name == "model.norm.weight":
        return ["final_norm", "w"], False, False
    if name == "lm_head.weight":
        return ["lm_head", "w"], True, False
    m = re.match(r"model\.layers\.(\d+)\.(.*)", name)
    if not m:
        return None
    i, rest = int(m.group(1)), m.group(2)
    L = ["layers", i]
    simple = {
        "attn_norm.weight": L + ["attn_norm", "w"],
        "mlp_norm.weight": L + ["mlp_norm", "w"],
        "attn.g_norm.weight": L + ["attn", "g_norm", "w"],
    }
    if rest in simple:
        return simple[rest], False, False
    for proj in ("q_proj", "k_proj", "v_proj", "o_proj"):
        if rest == f"attn.{proj}.weight":
            return L + ["attn", proj, "w"], True, False
        if rest == f"attn.{proj}.bias":
            return L + ["attn", proj, "b"], False, False
    if rest == "attn.gk_proj.0.weight":
        return L + ["attn", "gk_a", "w"], True, False
    if rest == "attn.gk_proj.1.weight":
        return L + ["attn", "gk_b", "w"], True, False
    if rest == "attn.gk_proj.1.bias":
        return L + ["attn", "gk_b", "b"], False, False
    for proj in ("gate_proj", "up_proj", "down_proj"):
        if rest == f"mlp.{proj}.weight":
            return L + ["mlp", proj, "w"], True, False
    return None


def _route_hymeta(cfg: HymetaConfig, name: str):
    if name == "model.embeddings.weight":
        return ["embed", "w"], False, False
    if name == "model.meta_tokens":
        return ["meta_tokens"], False, False
    if name == "model.lower_bounds":
        return ["lower_bounds"], False, True
    if name == "model.norm.weight":
        return ["final_norm", "w"], False, False
    if name == "lm_head.weight":
        return ["lm_head", "w"], True, True  # fp32 LM head
    m = re.match(r"model\.layers\.(\d+)\.(.*)", name)
    if not m:
        return None
    i, rest = int(m.group(1)), m.group(2)
    L = ["layers", i]
    simple = {
        "attn_norm.weight": L + ["attn_norm", "w"],
        "mlp_norm.weight": L + ["mlp_norm", "w"],
        "attn.norm1.weight": L + ["attn", "norm1", "w"],
        "attn.norm2.weight": L + ["attn", "norm2", "w"],
    }
    if rest in simple:
        return simple[rest], False, False
    if rest == "attn.out_proj.weight":
        return L + ["attn", "out_proj", "w"], True, False
    for branch, key in (("vanilla_attn", "swa"), ("linear_attn", "gla")):
        for proj in ("q_proj", "k_proj", "v_proj"):
            if rest == f"attn.{branch}.{proj}.weight":
                return L + ["attn", key, proj, "w"], True, False
            if rest == f"attn.{branch}.{proj}.bias":
                return L + ["attn", key, proj, "b"], False, False
    for proj in ("gate_proj", "up_proj", "down_proj"):
        if rest == f"mlp.{proj}.weight":
            return L + ["mlp", proj, "w"], True, False
        if rest == f"shared_mlp.{proj}.weight":
            return L + ["shared_mlp", proj, "w"], True, False
    if rest == "block_sparse_moe.gate.weight":
        return L + ["moe", "gate", "w"], True, False
    m2 = re.match(
        r"block_sparse_moe\.experts\.(\d+)\.(gate_proj|up_proj|down_proj)"
        r"\.weight", rest)
    if m2:
        # routed specially: per-expert slices of the stacked tensors
        return None  # handled by load_checkpoint_moe below
    return None


