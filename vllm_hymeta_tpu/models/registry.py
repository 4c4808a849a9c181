"""model_type -> implementation module dispatch (the TPU analogue of the
plugin's AutoConfig/ModelRegistry registration, `models/__init__.py:4-13`)."""

from __future__ import annotations

from vllm_hymeta_tpu.config import GLAswaConfig, HymetaConfig


def get_model(cfg):
    from vllm_hymeta_tpu.models import gla_swa, hymeta
    if isinstance(cfg, HymetaConfig):
        return hymeta
    if isinstance(cfg, GLAswaConfig):
        return gla_swa
    raise ValueError(f"no model implementation for {type(cfg)}")
