"""PartitionSpec assignment for params / caches / meta caches.

Mirrors the reference's TP layout (SURVEY.md §2.7): column-parallel
q/k/v/gate/up (output dim sharded by heads / intermediate), row-parallel
o/out/down (input dim sharded), vocab-parallel embedding + LM head,
head-sharded hybrid norms and lower bounds, expert-parallel MoE tensors,
slot-sharded caches over the data axis.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from vllm_hymeta_tpu.config import HymetaConfig

REPL = P()

_COL = P(None, "model")      # [in, out_sharded]
_ROW = P("model", None)      # [in_sharded, out]
_BIAS = P("model")


def _linear_specs(col: bool, bias: bool) -> dict:
    d = {"w": _COL if col else _ROW}
    if bias:
        d["b"] = _BIAS if col else REPL
    return d


def _glu_specs() -> dict:
    return {
        "gate_proj": _linear_specs(True, False),
        "up_proj": _linear_specs(True, False),
        "down_proj": _linear_specs(False, False),
    }


def param_specs(cfg, params: dict) -> dict:
    """Spec pytree congruent with the param tree."""
    is_hymeta = isinstance(cfg, HymetaConfig)
    layers = []
    for i, lp in enumerate(params["layers"]):
        d: dict = {
            "attn_norm": {"w": REPL},
            "mlp_norm": {"w": REPL},
        }
        if is_hymeta:
            d["attn"] = {
                "swa": {
                    "q_proj": _linear_specs(True, True),
                    "k_proj": _linear_specs(True, True),
                    "v_proj": _linear_specs(True, True),
                },
                "gla": {
                    "q_proj": _linear_specs(True, True),
                    "k_proj": _linear_specs(True, True),
                    "v_proj": _linear_specs(True, True),
                },
                # head-sharded hybrid norms (`modeling_hymeta.py:122-181`)
                "norm1": {"w": _BIAS},
                "norm2": {"w": _BIAS},
                "out_proj": _linear_specs(False, False),
            }
            if "mlp" in lp:
                d["mlp"] = _glu_specs()
            if "moe" in lp:
                d["moe"] = {
                    "gate": {"w": REPL},
                    # expert-parallel over the model axis
                    "experts": {
                        "gate_proj": P("model", None, None),
                        "up_proj": P("model", None, None),
                        "down_proj": P("model", None, None),
                    },
                }
            if "shared_mlp" in lp:
                d["shared_mlp"] = _glu_specs()
        else:
            attn = {
                "q_proj": _linear_specs(True, True),
                "k_proj": _linear_specs(True, True),
                "v_proj": _linear_specs(True, True),
                "o_proj": _linear_specs(False, False),
            }
            if "gk_a" in lp["attn"]:
                attn["gk_a"] = {"w": REPL}
                attn["gk_b"] = _linear_specs(True, True)
                attn["g_norm"] = {"w": REPL}
            d["attn"] = attn
            d["mlp"] = _glu_specs()
        layers.append(d)

    specs: dict = {
        "embed": {"w": P("model", None)},        # vocab-parallel
        "layers": layers,
        "final_norm": {"w": REPL},
        "lm_head": {"w": P(None, "model")},      # vocab-sharded logits
    }
    if "meta_tokens" in params:
        specs["meta_tokens"] = REPL
    if "lower_bounds" in params:
        specs["lower_bounds"] = P(None, "model")  # head-sliced per rank
    return specs


def meta_specs(meta: dict) -> dict:
    return {
        "k": P(None, None, "model", None),
        "v": P(None, None, "model", None),
        "state": P(None, "model", None, None),
    }


def cache_specs(cache: dict) -> dict:
    layers = []
    for lc in cache["layers"]:
        d = {}
        for key in lc:
            if key in ("k", "v"):
                d[key] = P("data", "model", None, None)
            elif key in ("k_scale", "v_scale"):
                d[key] = P("data", "model", None)
            elif key == "state":
                d[key] = P("data", "model", None, None)
        layers.append(d)
    return {"layers": layers}


def place(mesh, tree: Any, specs: Any) -> Any:
    """device_put the tree with NamedShardings from the spec tree."""
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        tree, specs)
