"""Quantization: offline converters + runtime parameter transforms.

Covers the reference's two schemes (SURVEY.md §2.6):
  * GPTQ weight-only INT4/INT8, group-size 64 (`hf_7B_model/quant_7B.py`,
    `hf_model/hymeta_gptq.py`) — checkpoint reader for gptqmodel layouts
    plus an on-the-fly quantizer for benchmarking without checkpoints
  * W8A8 (`hf_model/quant_w8a8.py`) — INT8 per-channel weights with
    dynamic per-token INT8 activations
"""

from vllm_hymeta_tpu.quant.transform import (  # noqa: F401
    attach_prefill_int8, quantize_params_gptq, quantize_params_w8a8)
