"""User-facing API mirroring the surface the reference exposes through vLLM
(`bench/speed_vllm.py`: LLM(model=...), llm.generate(prompts, sampling))."""

from __future__ import annotations

import os
from typing import List, Optional, Sequence, Union

import jax.numpy as jnp

from vllm_hymeta_tpu.config import load_config
from vllm_hymeta_tpu.engine.engine import Engine, EngineConfig
from vllm_hymeta_tpu.engine.sampler import SamplingParams  # re-export


class LLM:
    """Offline inference entry point.

    llm = LLM(model="/path/to/checkpoint")         # config.json + safetensors
    outs = llm.generate(["hello"], SamplingParams(max_tokens=32))
    """

    def __init__(self, model: str, *,
                 max_num_seqs: int = 8,
                 max_model_len: int = 32768,
                 kv_cache_dtype: str = "bfloat16",
                 dtype=jnp.bfloat16,
                 tokenizer: Optional[object] = None,
                 seed: int = 0):
        from vllm_hymeta_tpu import weights as weights_lib
        from vllm_hymeta_tpu.quant import io as quant_io
        self.cfg = load_config(model)
        # quantized checkpoints load through their dedicated readers,
        # preserving their calibrated scales (no RTN re-quantization)
        if quant_io.is_compressed_tensors_checkpoint(model):
            self.params = quant_io.load_compressed_w8a8_checkpoint(
                self.cfg, model, dtype=dtype)
        elif quant_io.is_gptq_checkpoint(model):
            self.params = quant_io.load_gptq_checkpoint(
                self.cfg, model, dtype=dtype)
        else:
            self.params = weights_lib.load_checkpoint(
                self.cfg, model, dtype=dtype)
        self.tokenizer = tokenizer
        if self.tokenizer is None:
            self.tokenizer = _try_load_tokenizer(model)
        ecfg = EngineConfig(max_num_seqs=max_num_seqs,
                            max_model_len=max_model_len,
                            kv_dtype=kv_cache_dtype)
        self.engine = Engine(self.cfg, self.params, ecfg, seed=seed)

    def generate(self,
                 prompts: Union[Sequence[str], Sequence[List[int]]],
                 sampling_params: Optional[SamplingParams] = None):
        token_lists = []
        for p in prompts:
            if isinstance(p, str):
                if self.tokenizer is None:
                    raise ValueError("string prompts require a tokenizer")
                token_lists.append(self.tokenizer.encode(p))
            else:
                token_lists.append(list(p))
        reqs = self.engine.generate(token_lists, sampling_params)
        outs = []
        for r in reqs:
            text = None
            if self.tokenizer is not None:
                text = self.tokenizer.decode(r.output)
            outs.append(CompletionOutput(
                request_id=r.req_id, token_ids=r.output, text=text,
                finish_reason=r.finish_reason))
        return outs


class CompletionOutput:
    def __init__(self, request_id, token_ids, text, finish_reason):
        self.request_id = request_id
        self.token_ids = token_ids
        self.text = text
        self.finish_reason = finish_reason

    def __repr__(self):
        return (f"CompletionOutput(id={self.request_id}, "
                f"n={len(self.token_ids)}, reason={self.finish_reason})")


def _try_load_tokenizer(path: str):
    try:
        if os.path.isdir(path) and (
                os.path.exists(os.path.join(path, "tokenizer.json"))
                or os.path.exists(os.path.join(path, "tokenizer_config.json"))):
            from transformers import AutoTokenizer
            return AutoTokenizer.from_pretrained(path)
    except Exception:
        pass
    return None
