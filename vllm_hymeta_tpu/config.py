"""Model configurations for the hymeta families.

Mirrors the architecture hyper-parameters of the reference configs
(`/root/reference/vllm_hymeta/models/configuration_hymeta.py:15-106` and
`/root/reference/model_for_7B/configuration_gla_swa.py:15-76` /
`hf_7B_model/configuration_gla_swa.py:24-83`) as plain dataclasses — no
torch / transformers dependency on the hot path.

Fidelity notes (SURVEY.md §7 "fidelity trap"):
  * the serving config derives ``full_attn_layers = [3, 10, 17, 24]``
    (`models/configuration_hymeta.py:70`) while the HF training config uses
    ``[3, 11, 19, 27]`` (`hf_model/configuration_hymeta.py:83`).  The
    checkpoint's own ``config.json`` is authoritative: ``from_hf_dict``
    honours an explicit ``full_attn_layers`` entry and only falls back to a
    default (the HF variant) when absent.
  * the serving model indexes lower bounds with ``layer_idx % 7``
    (`modeling_hymeta.py:1329`) whereas the HF golden model uses the layer
    index directly (`hf_model/modeling_hymeta.py:347`).  ``lower_bound_mode``
    selects between the two; default is the HF ("per_layer") semantics.
  * HF MoE renormalizes top-k routing weights (top-1 => weight 1.0,
    `hf_model/moe.py:75`) while the serving FusedMoE is built with
    ``renormalize=False`` (`modeling_hymeta.py:312-324`).
    ``moe_renormalize`` selects; default True (HF semantics).
"""

from __future__ import annotations

import dataclasses
import json
import os
from dataclasses import dataclass, field
from typing import Any, List, Optional


@dataclass
class QuantConfig:
    """Runtime quantization description.

    method: "none" | "gptq" (weight-only INT4/INT8, group scales+zeros)
            | "w8a8" (INT8 weights, per-token dynamic INT8 activations)
    """

    method: str = "none"
    weight_bits: int = 4
    group_size: int = 64
    sym: bool = False
    # modules never quantized (reference excludes lm_head for W8A8 and
    # gk_proj for the 7B GPTQ pipeline: `hf_model/quant_w8a8.py:90-138`,
    # `hf_7B_model/quant_7B.py:15`, `gla_swa_gptq.py:8-24`).
    exclude: List[str] = field(default_factory=lambda: ["lm_head", "gk_proj"])
    # KV/state cache quantization ("bf16" | "int8")
    kv_cache_dtype: str = "bf16"

    @property
    def enabled(self) -> bool:
        return self.method != "none"


@dataclass
class BaseConfig:
    vocab_size: int = 152064
    hidden_size: int = 3584
    num_hidden_layers: int = 28
    num_attention_heads: int = 28
    num_key_value_heads: int = 4
    intermediate_size: int = 18944
    hidden_act: str = "swish"
    max_position_embeddings: int = 4096 * 32
    sliding_window: int = 4096
    norm_eps: float = 1e-6
    rope_theta: float = 1e6
    bos_token_id: int = 151643
    eos_token_id: int = 151643
    tie_word_embeddings: bool = False
    initializer_range: float = 0.02

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @property
    def num_kv_groups(self) -> int:
        return self.num_attention_heads // self.num_key_value_heads

    @classmethod
    def from_hf_dict(cls, d: dict) -> "BaseConfig":
        names = {f.name for f in dataclasses.fields(cls)}
        kwargs = {k: v for k, v in d.items() if k in names}
        cfg = cls(**kwargs)
        return cfg

    @classmethod
    def from_json(cls, path: str) -> "BaseConfig":
        with open(path) as f:
            return cls.from_hf_dict(json.load(f))

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)


@dataclass
class GLAswaConfig(BaseConfig):
    """Hymeta-7B ("gla_swa"): odd layers softmax SWA, even layers GLA.

    Reference: `model_for_7B/configuration_gla_swa.py:15-76`.
    """

    model_type: str = "gla_swa"
    gate_logit_normalizer: int = 16
    gate_low_rank_dim: int = 16
    attn_layers: Optional[List[int]] = None  # derived if None
    # FA2 window convention (w, 0): a query attends to keys with
    # q_pos - k_pos <= w, i.e. w+1 keys including self
    # (`hf_7B_model/window_attention.py:191`, and the vLLM side passes
    # sliding_window+1 to compensate vLLM's convention,
    # `model_for_7B/modeling_gla_swa.py:200`).
    inclusive_window: bool = True

    def __post_init__(self):
        if self.attn_layers is None:
            # odd layers are softmax attention
            # (`configuration_gla_swa.py:66-68`)
            self.attn_layers = list(range(1, self.num_hidden_layers, 2))

    def is_swa_layer(self, i: int) -> bool:
        return i in self.attn_layers

    @property
    def window_keys(self) -> int:
        """Number of attendable keys per query, including itself."""
        return self.sliding_window + (1 if self.inclusive_window else 0)


@dataclass
class HymetaConfig(BaseConfig):
    """Hymeta-70B ("hybrid"): every layer runs SWA(+metatokens) and GLA in
    parallel; FFN is MoE + shared MLP except on dense layers.

    Reference: `models/configuration_hymeta.py:15-106`,
    `hf_model/configuration_hymeta.py:24-96`.
    """

    model_type: str = "hybrid"
    num_meta_tokens: int = 128
    use_lower_bound: bool = True
    clamp_max: float = 0.95
    num_local_experts: int = 16
    num_experts_per_topk: int = 1
    shared_intermediate_size: int = 18944
    full_attn_layers: Optional[List[int]] = None
    dense_mlp_layers: List[int] = field(
        default_factory=lambda: [0, 1, 2, 4, 6, 8, 10])
    # "per_layer" = HF golden (`hf_model/modeling_hymeta.py:347`),
    # "mod7" = serving quirk (`modeling_hymeta.py:1329`, gate-disable on
    # layer_idx % 7 == 0 at `modeling_hymeta.py:611-613`).
    lower_bound_mode: str = "per_layer"
    # HF semantics: top-k renormalized (top-1 -> 1.0). False reproduces the
    # serving FusedMoE(renormalize=False) behaviour.
    moe_renormalize: bool = True
    # Naive-spec window convention: q_pos - k_pos < W, i.e. W keys
    # including self (`attention/fa_kernel_metatoken.py:377-410`; serving
    # stores the window as (W-1, 0): `attention/meta_attention.py:671-672`).
    inclusive_window: bool = False

    def __post_init__(self):
        if self.full_attn_layers is None:
            # HF training config default (`hf_model/configuration_hymeta.py:83`).
            # Serving default was [3, 10, 17, 24]; checkpoints carrying an
            # explicit list override this via from_hf_dict.
            self.full_attn_layers = [3, 11, 19, 27]

    def is_full_attn_layer(self, i: int) -> bool:
        return i in self.full_attn_layers

    def is_dense_mlp_layer(self, i: int) -> bool:
        return i in self.dense_mlp_layers

    def layer_window(self, i: int) -> int:
        """0 means global attention (`models/configuration_hymeta.py:74-77`)."""
        return 0 if self.is_full_attn_layer(i) else self.sliding_window

    @property
    def window_keys(self) -> int:
        return self.sliding_window + (1 if self.inclusive_window else 0)

    def lower_bound_index(self, layer_idx: int) -> int:
        return layer_idx % 7 if self.lower_bound_mode == "mod7" else layer_idx

    def lower_bound_disabled(self, layer_idx: int) -> bool:
        """Layers whose gate ignores the lower bound (uses clamp form)."""
        if self.lower_bound_mode == "mod7":
            return layer_idx % 7 == 0
        return layer_idx == 0


MODEL_TYPES = {
    "hybrid": HymetaConfig,
    "gla_swa": GLAswaConfig,
}


def load_config(model_path_or_dict: Any):
    """Load a config from a checkpoint dir (config.json), json path or dict,
    dispatching on model_type (mirrors the AutoConfig registration at
    `models/__init__.py:4-13` / `model_for_7B/__init__.py:4-13`)."""
    if isinstance(model_path_or_dict, dict):
        d = model_path_or_dict
    else:
        p = model_path_or_dict
        if os.path.isdir(p):
            p = os.path.join(p, "config.json")
        with open(p) as f:
            d = json.load(f)
    mt = d.get("model_type", "hybrid")
    if mt not in MODEL_TYPES:
        raise ValueError(f"unknown model_type {mt!r}; expected {list(MODEL_TYPES)}")
    return MODEL_TYPES[mt].from_hf_dict(d)
