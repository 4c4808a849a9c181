"""Training-grade capability: loss + gradients through the golden forward.

The reference ships HF training implementations with fused cross-entropy
(`hf_model/modeling_hymeta.py:530-537`, FusedCrossEntropyLoss) and a full
metatoken-attention backward (`hf_model/fa_kernel_metatoken.py:118-183`).
Here the naive-op golden forward (models/*.forward_full) is differentiable
end-to-end under jax.grad — XLA generates the backward, including the
metatoken attention and the chunked-GLA scan — so fine-tuning parity needs
no hand-written VJP on CPU/small scale.  (A Pallas flash-attention VJP for
large-scale training is future work: SURVEY.md N7 notes the inference
engine itself needs none.)
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from vllm_hymeta_tpu.models import get_model


def causal_lm_loss(cfg, params, tokens: jax.Array,
                   loss_mask: Optional[jax.Array] = None) -> jax.Array:
    """Next-token cross entropy, fp32 log-softmax (the semantics of the
    reference's FusedCrossEntropyLoss: shift-by-one targets with the last
    position ignored, `hf_model/modeling_hymeta.py:535-537`)."""
    model = get_model(cfg)
    logits = model.forward_full(cfg, params, tokens)       # [B, T, V] fp32
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    tgt = tokens[:, 1:]
    token_lp = jnp.take_along_axis(logp[:, :-1], tgt[..., None],
                                   axis=-1)[..., 0]
    if loss_mask is None:
        mask = jnp.ones_like(token_lp)
    else:
        mask = loss_mask[:, 1:].astype(jnp.float32)
    return -jnp.sum(token_lp * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def loss_and_grad(cfg, params, tokens: jax.Array,
                  loss_mask: Optional[jax.Array] = None
                  ) -> Tuple[jax.Array, dict]:
    return jax.value_and_grad(
        lambda p: causal_lm_loss(cfg, p, tokens, loss_mask))(params)


def sgd_step(params: dict, grads: dict, lr: float) -> dict:
    """Minimal optimizer for smoke tests; real training plugs optax in."""
    return jax.tree.map(
        lambda p, g: (p - lr * g.astype(p.dtype))
        if jnp.issubdtype(p.dtype, jnp.floating) else p,
        params, grads)
