"""Token sampling: greedy / temperature / top-k / top-p / repetition
penalty — the engine-side replacement for vLLM's sampler that the reference
relies on (`modeling_hymeta.py:43`, bench scripts pass temperature/top-p/
repetition_penalty: `bench/speed_vllm.py:41-148`).

Static-shape, jit-friendly: one fused function over the slot batch with
per-slot parameters.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e30


@dataclasses.dataclass
class SamplingParams:
    temperature: float = 1.0
    top_k: int = 0            # 0 = off
    top_p: float = 1.0
    repetition_penalty: float = 1.0
    max_tokens: int = 128
    ignore_eos: bool = False
    greedy: Optional[bool] = None  # None => greedy iff temperature == 0
    # extra token ids that stop generation like eos (vLLM stop_token_ids)
    stop_token_ids: Optional[list] = None
    # stop strings, enforced where a tokenizer exists (LLM / server):
    # generation halts and the text is truncated before the match
    stop: Optional[list] = None
    # return log-probabilities: number of top alternatives per emitted
    # token (0 = off).  Engine-wide topk is EngineConfig.logprobs_topk.
    logprobs: int = 0
    # parallel sampling (vLLM `n`/`best_of`): the API layer expands one
    # prompt into max(n, best_of) engine requests (prefix cache makes the
    # shared prompt nearly free) and returns the n best by mean logprob
    n: int = 1
    best_of: Optional[int] = None

    def is_greedy(self) -> bool:
        if self.greedy is not None:
            return self.greedy
        return self.temperature == 0.0


def apply_repetition_penalty(logits: jax.Array, seen_mask: jax.Array,
                             penalty: jax.Array) -> jax.Array:
    """HF-style: seen tokens' logits divided by p if > 0 else multiplied.

    logits [S, V] fp32; seen_mask [S, V] bool; penalty [S] fp32.
    """
    p = penalty[:, None]
    scaled = jnp.where(logits > 0, logits / p, logits * p)
    return jnp.where(seen_mask, scaled, logits)


def sample(logits: jax.Array,        # [S, V] fp32
           key: jax.Array,
           temperature: jax.Array,   # [S]
           top_k: jax.Array,         # [S] int32 (0 = off)
           top_p: jax.Array,         # [S]
           ) -> jax.Array:
    """Returns sampled token ids [S].  temperature<=0 rows sample greedily.

    The vocab-wide sort (O(V log V), V=152k) only runs when some slot
    actually needs top-k/top-p — an all-greedy batch takes the argmax
    branch via lax.cond.
    """
    S, V = logits.shape
    greedy_ids = jnp.argmax(logits, axis=-1)

    needs_sampling = jnp.any(temperature > 0.0)

    def full_path(_):
        t = jnp.maximum(temperature, 1e-6)[:, None]
        scaled = logits / t

        # top-k: mask everything below the k-th logit
        sorted_desc = jnp.sort(scaled, axis=-1)[:, ::-1]
        k_idx = jnp.clip(jnp.where(top_k > 0, top_k, V) - 1, 0, V - 1)
        kth = jnp.take_along_axis(sorted_desc, k_idx[:, None], axis=-1)
        masked = jnp.where(scaled < kth, NEG_INF, scaled)

        # top-p (nucleus) AFTER top-k, on the renormalized survivor
        # distribution (vLLM semantics: k first, then p over what's left)
        rank = jax.lax.broadcasted_iota(jnp.int32, (S, V), 1)
        keep_k = rank <= k_idx[:, None]
        sorted_kmasked = jnp.where(keep_k, sorted_desc, NEG_INF)
        probs_sorted = jax.nn.softmax(sorted_kmasked, axis=-1)
        cum = jnp.cumsum(probs_sorted, axis=-1)
        cutoff_rank = jnp.sum(cum < top_p[:, None], axis=-1)
        pth = jnp.take_along_axis(
            sorted_kmasked, jnp.clip(cutoff_rank, 0, V - 1)[:, None],
            axis=-1)
        masked = jnp.where(masked < pth, NEG_INF, masked)

        sampled = jax.random.categorical(key, masked, axis=-1)
        return jnp.where(temperature <= 0.0, greedy_ids, sampled)

    return jax.lax.cond(needs_sampling, full_path,
                        lambda _: greedy_ids, None)


def token_logprobs(logits: jax.Array,    # [S, V] fp32 RAW model logits
                   ids: jax.Array,       # [S] sampled token ids
                   topk: int):
    """Log-probabilities of the RAW model distribution (OpenAI semantics:
    reported logprobs are the model's, unaffected by repetition penalty or
    temperature — callers pass the pre-processing logits; the sampling
    distribution may differ).

    Returns (chosen [S] fp32, top_ids [S, topk] int32, top_lp [S, topk]).
    """
    logp = jax.nn.log_softmax(logits, axis=-1)
    chosen = jnp.take_along_axis(logp, ids[:, None], axis=-1)[:, 0]
    top_lp, top_ids = jax.lax.top_k(logp, topk)
    return chosen, top_ids.astype(jnp.int32), top_lp
