"""User-facing API mirroring the surface the reference exposes through vLLM
(`bench/speed_vllm.py`: LLM(model=...), llm.generate(prompts, sampling))."""

from __future__ import annotations

import os
from typing import List, Optional, Sequence, Union

import jax.numpy as jnp

from vllm_hymeta_tpu.config import load_config
from vllm_hymeta_tpu.engine.engine import Engine, EngineConfig
from vllm_hymeta_tpu.engine.sampler import SamplingParams  # re-export


def scan_stop_strings(tokenizer, output, stops, new_tokens: int):
    """Shared stop-string scanner (used by LLM.generate and the OpenAI
    server): find the first stop string in the decoded output, scanning a
    CHAR-bounded tail so matches can't slip past either of two windows
    that a token-count tail gets wrong (ADVICE r3):
      * more than `new_tokens` tokens may have been emitted since the
        last scan (decode blocks) — the tail always covers them;
      * tokens can decode to empty strings, so a fixed token count may
        cover fewer chars than the stop string — the tail grows until it
        holds >= max_stop_len - 1 chars BEFORE the new tokens.

    Returns (matched_stop, text_before_match) or (None, None).
    """
    if not stops or not output:
        return None, None
    max_len = max(len(x) for x in stops)
    n = len(output)
    take = min(n, max(new_tokens, 1) + 1)
    while take < n:
        # chars preceding the newly-emitted tokens inside the tail
        head = tokenizer.decode(output[n - take:n - min(new_tokens, take)])
        if len(head) >= max_len - 1:
            break
        take = min(n, take * 2)
    tail = tokenizer.decode(output[n - take:])
    matched = next((x for x in stops if x in tail), None)
    if matched is None:
        return None, None
    text = tokenizer.decode(output)
    i = text.find(matched)
    if i < 0:  # pragma: no cover - tokenizer round-trip quirk
        return None, None
    return matched, text[:i]


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
                 logprobs_topk: int = 0,
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
            from vllm_hymeta_tpu.quant import attach_prefill_int8
            # 4-bit tensors load packed (qw4); give prefill its INT8
            # shadow so the MXU runs the int8 path at large M
            self.params = attach_prefill_int8(self.params)
        else:
            self.params = weights_lib.load_checkpoint(
                self.cfg, model, dtype=dtype)
        self.tokenizer = tokenizer
        if self.tokenizer is None:
            self.tokenizer = _try_load_tokenizer(model)
        ecfg = EngineConfig(max_num_seqs=max_num_seqs,
                            max_model_len=max_model_len,
                            kv_dtype=kv_cache_dtype,
                            logprobs_topk=logprobs_topk)
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
        sp = sampling_params or SamplingParams()
        if sp.best_of and sp.best_of < sp.n:
            raise ValueError("best_of must be >= n")
        if (sp.best_of and sp.best_of > sp.n
                and self.engine.ecfg.logprobs_topk <= 0):
            # without captured logprobs, candidates can't be ranked —
            # selecting by arrival order would silently return arbitrary
            # completions (ADVICE r3)
            raise ValueError(
                "best_of > n requires logprob capture: construct "
                "LLM(..., logprobs_topk=1) (vLLM ranks by cumulative "
                "logprob)")
        if sp.best_of and sp.best_of > sp.n and sp.logprobs <= 0:
            # force chosen-token logprob capture so ranking is real
            import dataclasses as _dc
            sp = _dc.replace(sp, logprobs=1)
        count = max(sp.n, sp.best_of or 1)
        # n/best_of: expand each prompt into `count` engine requests
        expanded = [p for p in token_lists for _ in range(count)]
        stop_strings = bool(sp.stop) and self.tokenizer is not None
        if not stop_strings:
            reqs = self.engine.generate(expanded, sp)
        else:
            # drive steps manually so stop strings can cancel mid-flight
            ids = [self.engine.add_request(p, sp) for p in expanded]
            running = {r.req_id: r for r in
                       list(self.engine.waiting)}
            done = {}
            scanned = {rid: 0 for rid in running}

            def check_stops(final=False):
                for rid, r in list(running.items()):
                    if rid in done and not final:
                        continue
                    if not r.output:
                        continue
                    new = len(r.output) - scanned.get(rid, 0)
                    scanned[rid] = len(r.output)
                    m, prefix = scan_stop_strings(
                        self.tokenizer, r.output, sp.stop, new)
                    if m is None:
                        continue
                    if not r.finished:
                        self.engine.cancel_request(rid, "stop")
                    r.finish_reason = "stop"
                    r.stop_text = prefix
                    done[rid] = r
                    running.pop(rid, None)
            while self.engine.has_work():
                for r in self.engine.step():
                    done[r.req_id] = r
                check_stops()
            check_stops(final=True)   # stop inside the final block
            reqs = [done[i] for i in ids]

        def _cum_lp(r):
            # vLLM ranks best_of candidates by CUMULATIVE logprob
            return sum(r.logprobs) if r.logprobs else 0.0
        outs = []
        for j in range(0, len(reqs), count):
            group = reqs[j:j + count]
            if sp.best_of and sp.best_of > sp.n:
                group = sorted(group, key=_cum_lp, reverse=True)[:sp.n]
            for r in group:
                text = getattr(r, "stop_text", None)
                if text is None and self.tokenizer is not None:
                    text = self.tokenizer.decode(r.output)
                outs.append(CompletionOutput(
                    request_id=r.req_id, token_ids=r.output, text=text,
                    finish_reason=r.finish_reason,
                    logprobs=r.logprobs or None,
                    top_logprobs=r.top_logprobs or None))
        return outs


class CompletionOutput:
    def __init__(self, request_id, token_ids, text, finish_reason,
                 logprobs=None, top_logprobs=None):
        self.request_id = request_id
        self.token_ids = token_ids
        self.text = text
        self.finish_reason = finish_reason
        self.logprobs = logprobs            # [n_tokens] chosen-token logp
        self.top_logprobs = top_logprobs    # [n_tokens] {token_id: logp}

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
