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
                   loss_mask: Optional[jax.Array] = None,
                   remat: bool = False) -> jax.Array:
    """Next-token cross entropy, fp32 log-softmax (the semantics of the
    reference's FusedCrossEntropyLoss: shift-by-one targets with the last
    position ignored, `hf_model/modeling_hymeta.py:535-537`).

    remat=True enables per-layer gradient checkpointing (the reference's
    `gradient_checkpointing`, `hf_model/modeling_hymeta.py:349-361`)."""
    model = get_model(cfg)
    logits = model.forward_full(cfg, params, tokens,
                                remat=remat)               # [B, T, V] fp32
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
                  loss_mask: Optional[jax.Array] = None,
                  remat: bool = False) -> Tuple[jax.Array, dict]:
    return jax.value_and_grad(
        lambda p: causal_lm_loss(cfg, p, tokens, loss_mask, remat))(params)


def sgd_step(params: dict, grads: dict, lr: float) -> dict:
    """Minimal optimizer for smoke tests; real training uses make_train_step."""
    return jax.tree.map(
        lambda p, g: (p - lr * g.astype(p.dtype))
        if jnp.issubdtype(p.dtype, jnp.floating) else p,
        params, grads)


def make_train_step(cfg, optimizer=None, remat: bool = False,
                    mesh=None):
    """Jitted optax train step: (params, opt_state, tokens, loss_mask) ->
    (params, opt_state, loss).

    optimizer: any optax GradientTransformation (default adamw(1e-4)).
    remat: per-layer gradient checkpointing.
    mesh: optional Mesh with a "data" axis — tokens are sharded over it and
    gradients averaged by GSPMD (DP training; TP composes via the params'
    shardings)."""
    import optax

    if optimizer is None:
        optimizer = optax.adamw(1e-4)

    def step(params, opt_state, tokens, loss_mask=None):
        loss, grads = loss_and_grad(cfg, params, tokens, loss_mask, remat)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        data_sh = NamedSharding(mesh, P("data"))
        jstep = jax.jit(step, in_shardings=(None, None, data_sh, None),
                        donate_argnums=(0, 1))
    else:
        jstep = jax.jit(step, donate_argnums=(0, 1))

    def init(params):
        return optimizer.init(params)

    return jstep, init
