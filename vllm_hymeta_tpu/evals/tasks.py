"""Multiple-choice evaluation by log-likelihood scoring (the mechanism
behind MMLU/ARC/HellaSwag "ppl" variants in the reference's opencompass
configs, `bench/eval_mmlu.py` etc.).

Each item: {"prompt": str|token list, "choices": [str|token list, ...],
"answer": int}.  Scoring: sum log p(choice tokens | prompt ∥ prefix) —
the choice with the highest (optionally length-normalized) likelihood
wins.
"""

from __future__ import annotations

import json
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from vllm_hymeta_tpu.models import get_model


def choice_logprob(cfg, params, prompt: Sequence[int],
                   choice: Sequence[int]) -> float:
    model = get_model(cfg)
    toks = jnp.asarray(list(prompt) + list(choice), jnp.int32)
    logits = model.forward_full(cfg, params, toks[None])[0]
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    n_p = len(prompt)
    idx = jnp.arange(n_p - 1, len(toks) - 1)
    tgt = toks[n_p:]
    lp = jnp.take_along_axis(logp[idx], tgt[:, None], axis=-1)[:, 0]
    return float(jnp.sum(lp))


def mc_accuracy(cfg, params, items: List[dict],
                tokenizer=None, length_normalize: bool = False) -> dict:
    """Returns {"accuracy": float, "n": int, "correct": int}."""
    def encode(x):
        if isinstance(x, str):
            if tokenizer is None:
                raise ValueError("string items need a tokenizer")
            return tokenizer.encode(x)
        return list(x)

    correct = 0
    for item in items:
        prompt = encode(item["prompt"])
        scores = []
        for ch in item["choices"]:
            ct = encode(ch)
            s = choice_logprob(cfg, params, prompt, ct)
            if length_normalize:
                s /= max(len(ct), 1)
            scores.append(s)
        if int(np.argmax(scores)) == int(item["answer"]):
            correct += 1
    n = len(items)
    return {"accuracy": correct / max(n, 1), "n": n, "correct": correct}


def load_jsonl(path: str) -> List[dict]:
    with open(path) as f:
        return [json.loads(line) for line in f if line.strip()]
