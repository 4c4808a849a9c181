"""Perplexity over a token stream (teacher-forced windows).

Usage: metric for the BASELINE "MMLU/perplexity Δ vs bf16 ≈ 0 at the same
bit-width" target — run twice (bf16 params, quantized params) and compare.
"""

from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from vllm_hymeta_tpu.models import get_model


def perplexity(cfg, params, tokens: List[int], window: int = 2048,
               stride: Optional[int] = None) -> float:
    """Sliding-window PPL: each window predicts its last `stride` tokens
    (standard HF strided evaluation)."""
    model = get_model(cfg)
    if stride is None:
        stride = window // 2
    toks = np.asarray(tokens, np.int32)
    n = len(toks)
    total_nll = 0.0
    total_cnt = 0

    @jax.jit
    def nll_fn(params, t, n_score):
        logits = model.forward_full(cfg, params, t[None])[0]
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        tgt = t[1:]
        token_logp = jnp.take_along_axis(
            logp[:-1], tgt[:, None], axis=-1)[:, 0]
        T = t.shape[0] - 1
        mask = jnp.arange(T) >= (T - n_score)
        return -jnp.sum(jnp.where(mask, token_logp, 0.0))

    pos = 0
    while pos + 1 < n:
        end = min(pos + window, n)
        t = toks[max(0, end - window):end]
        n_score = min(stride, end - 1) if pos > 0 else end - 1
        if len(t) < 2:
            break
        nll = float(nll_fn(params, jnp.asarray(t), jnp.int32(n_score)))
        total_nll += nll
        total_cnt += n_score
        pos = end
        if end == n:
            break
    return float(np.exp(total_nll / max(total_cnt, 1)))
