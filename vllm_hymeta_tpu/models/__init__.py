"""Model definitions (functional JAX) for the hymeta families.

`registry.get_model(config)` dispatches on config.model_type, mirroring the
reference's plugin registration (`vllm_hymeta/models/__init__.py:4-13`,
`model_for_7B/__init__.py:4-13`).
"""

from vllm_hymeta_tpu.models.registry import get_model  # noqa: F401
