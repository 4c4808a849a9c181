"""PartitionSpec assignment for params / caches / meta caches.

Mirrors the reference's TP layout (SURVEY.md §2.7): column-parallel
q/k/v/gate/up (output dim sharded by heads / intermediate), row-parallel
o/out/down (input dim sharded), vocab-parallel embedding + LM head,
head-sharded hybrid norms and lower bounds, expert-parallel MoE tensors,
slot-sharded caches over the data axis.

Specs are derived generically from the parameter tree, so fused
projections (models.common.fuse_params) and quantized layouts (qw /
w_scale / scales / zeros) shard correctly.  Row-sharded packed-INT4
(qw4) relies on fuse_params having re-packed each K-shard independently
(ops.quant_matmul.repack_int4_rows).
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from vllm_hymeta_tpu.config import HymetaConfig

REPL = P()

# parent-key -> "col" (output dim sharded) | "row" (input dim sharded)
#             | "repl"
_LINEAR_KIND = {
    "q_proj": "col", "k_proj": "col", "v_proj": "col",
    "qkv_proj": "col", "qkvg_proj": "col", "qkv6_proj": "col",
    "gate_up_proj": "col", "gate_proj": "col", "up_proj": "col",
    "gk_b": "col",
    "o_proj": "row", "out_proj": "row", "down_proj": "row",
    "gk_a": "repl", "gate": "repl",
}


def _linear_leaf_spec(kind: str, leaf: str, ndim: int):
    if kind == "repl":
        return REPL
    if kind == "col":
        if leaf in ("w", "qw", "qw4", "qw8", "scales", "zeros"):
            return P(None, "model")
        if leaf in ("qw4p", "s4_scales", "s4_zeros"):
            # [G, g/2|1, N]: N is the output dim
            return P(None, None, "model")
        if leaf in ("b", "w_scale", "w8_scale"):
            return P("model")
    if kind == "row":
        if leaf in ("w", "qw", "qw8", "scales", "zeros"):
            return P("model", None)
        if leaf == "qw4":
            # valid only after models.common.fuse_params repacked the
            # tensor per shard (repack_int4_rows)
            return P("model", None)
        if leaf in ("qw4p", "s4_scales", "s4_zeros"):
            # group dim G rides the K axis; qw4p needs NO per-shard
            # repack (uniform sublane-nibble layout)
            return P("model", None, None)
        if leaf in ("b", "w_scale", "w8_scale"):
            return REPL
    return REPL


def param_specs(cfg, params: dict) -> dict:
    """Spec pytree congruent with the param tree."""
    is_hymeta = isinstance(cfg, HymetaConfig)

    def layer_specs(lp: dict) -> dict:
        def mod_specs(name: str, p: dict) -> dict:
            kind = _LINEAR_KIND.get(name)
            if kind is None:
                return {k: REPL for k in p}
            return {k: _linear_leaf_spec(kind, k, None) for k in p}

        out: dict = {}
        for name, sub in lp.items():
            if name in ("attn_norm", "mlp_norm"):
                out[name] = {"w": REPL}
            elif name == "attn":
                a: dict = {}
                for an, ap in sub.items():
                    if an in ("norm1", "norm2"):
                        # head-sharded hybrid norms
                        # (`modeling_hymeta.py:122-181`)
                        a[an] = {"w": P("model")}
                    elif an == "g_norm":
                        a[an] = {"w": REPL}
                    elif an in ("swa", "gla"):
                        a[an] = {pn: mod_specs(pn, pp)
                                 for pn, pp in ap.items()}
                    elif an in _LINEAR_KIND:
                        a[an] = mod_specs(an, ap)
                    else:
                        a[an] = jax.tree.map(lambda _: REPL, ap)
                out[name] = a
            elif name in ("mlp", "shared_mlp"):
                out[name] = {pn: mod_specs(pn, pp)
                             for pn, pp in sub.items()}
            elif name == "moe":
                out[name] = {
                    "gate": mod_specs("gate", sub["gate"]),
                    "experts": {k: P("model", None, None)
                                for k in sub["experts"]},
                }
            else:
                out[name] = jax.tree.map(lambda _: REPL, sub)
        return out

    specs: dict = {
        "embed": {"w": P("model", None)},        # vocab-parallel
        "layers": [layer_specs(lp) for lp in params["layers"]],
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
