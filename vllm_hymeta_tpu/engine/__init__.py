"""Serving engine: continuous-batching scheduler, jitted step functions,
sampling — the TPU-native replacement for the vLLM engine layers the
reference plugin depends on (SURVEY.md §1 "vLLM-provided layers")."""

from vllm_hymeta_tpu.engine.api import LLM, SamplingParams  # noqa: F401
