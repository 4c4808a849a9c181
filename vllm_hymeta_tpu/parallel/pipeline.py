"""GPipe-style pipeline parallelism (+ sequence parallelism) for training.

The reference serves/trains with pipeline parallelism via vLLM's
`make_layers`/`PPMissingLayer` partition and `IntermediateTensors`
hand-off (`models/utils.py:625-643`, `modeling_hymeta.py:1356-1368`,
SURVEY.md §2.7).  On TPU a pipeline must live inside ONE SPMD program:

  * the 7B GLAswa alternates (GLA, SWA) layers, so consecutive layer
    PAIRS are homogeneous pytrees — we stack them on a leading axis and
    shard that axis over a "pipe" mesh axis;
  * microbatches flow through stages with `lax.ppermute` under a
    `lax.scan` schedule (n_micro + PP − 1 steps); every rank runs the
    same program and is busy once the pipeline fills;
  * TP composes inside each stage via ParallelCtx over the "model" axis,
    optionally with Megatron-style sequence parallelism (activations
    between blocks sharded along tokens: pctx.sp);
  * DP composes outside via a "data" mesh axis on the batch.

Inference serving intentionally uses pure TP/EP/DP instead (SURVEY.md §7:
on a pod slice ICI makes TP/EP scale further than PP; multi-host runs the
same mesh over DCN) — this module is the training-side PP capability.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vllm_hymeta_tpu.models import common, gla_swa
from vllm_hymeta_tpu.ops import naive
from vllm_hymeta_tpu.parallel import sharding
from vllm_hymeta_tpu.parallel.pctx import ParallelCtx

REPL = P()


# ---------------------------------------------------------------------------
# pair stacking
# ---------------------------------------------------------------------------

def stack_pairs(cfg, params: dict) -> dict:
    """Stack the (GLA, SWA) layer pairs on a leading axis.

    Layer 2p is GLA, layer 2p+1 is SWA (`configuration_gla_swa.py:66-68`:
    odd layers are softmax attention).  Requires an even layer count."""
    L = len(params["layers"])
    assert L % 2 == 0, "pair stacking needs an even number of layers"
    assert not cfg.is_swa_layer(0) and cfg.is_swa_layer(1), \
        "expected GLA on even layers, SWA on odd layers"
    gla_layers = params["layers"][0::2]
    swa_layers = params["layers"][1::2]
    stacked = {
        "gla": jax.tree.map(lambda *xs: jnp.stack(xs), *gla_layers),
        "swa": jax.tree.map(lambda *xs: jnp.stack(xs), *swa_layers),
    }
    return {
        "embed": params["embed"],
        "pairs": stacked,
        "final_norm": params["final_norm"],
        "lm_head": params["lm_head"],
    }


def unstack_pairs(cfg, stacked: dict) -> dict:
    """Inverse of stack_pairs (for checkpoint save interop)."""
    n_pairs = jax.tree.leaves(stacked["pairs"]["gla"])[0].shape[0]
    layers = []
    for p in range(n_pairs):
        layers.append(jax.tree.map(lambda x: x[p],
                                   stacked["pairs"]["gla"]))
        layers.append(jax.tree.map(lambda x: x[p],
                                   stacked["pairs"]["swa"]))
    return {
        "embed": stacked["embed"],
        "layers": layers,
        "final_norm": stacked["final_norm"],
        "lm_head": stacked["lm_head"],
    }


def stacked_specs(cfg, params: dict, stacked: dict) -> dict:
    """PartitionSpecs for the stacked tree: per-layer TP specs with the
    stacked axis sharded over "pipe"."""
    base = sharding.param_specs(cfg, params)
    gla_spec = base["layers"][0]
    swa_spec = base["layers"][1]

    def add_pipe(spec_tree, param_tree):
        return jax.tree.map(
            lambda s, _: P(*(("pipe",) + tuple(s))), spec_tree, param_tree,
            is_leaf=lambda x: isinstance(x, P))

    return {
        "embed": base["embed"],
        "pairs": {
            "gla": add_pipe(gla_spec, stacked["pairs"]["gla"]),
            "swa": add_pipe(swa_spec, stacked["pairs"]["swa"]),
        },
        "final_norm": base["final_norm"],
        "lm_head": base["lm_head"],
    }


# ---------------------------------------------------------------------------
# pipelined loss (runs inside shard_map over ("data", "pipe", "model"))
# ---------------------------------------------------------------------------

def _stage_forward(cfg, local_pairs: dict, x: jax.Array,
                   positions: jax.Array, pctx: ParallelCtx,
                   remat: bool) -> jax.Array:
    """Apply this rank's layer pairs (scan over the local stacked axis)."""

    def pair_body(h, pairp):
        h = gla_swa.layer_forward(cfg, pairp["gla"], h, positions,
                                  is_swa=False, pctx=pctx)
        h = gla_swa.layer_forward(cfg, pairp["swa"], h, positions,
                                  is_swa=True, pctx=pctx)
        return h, None

    body = jax.checkpoint(pair_body) if remat else pair_body
    x, _ = jax.lax.scan(body, x, local_pairs)
    return x


def _microbatch_loss(cfg, stacked, logits_x, tokens_mb, pctx):
    """CE loss pieces for one microbatch from final hidden states."""
    x = naive.rms_norm(logits_x, stacked["final_norm"]["w"], cfg.norm_eps)
    logits = common.lm_head_gather(stacked["lm_head"], x, pctx)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    tgt = tokens_mb[:, 1:]
    token_lp = jnp.take_along_axis(logp[:, :-1], tgt[..., None],
                                   axis=-1)[..., 0]
    return -jnp.sum(token_lp), token_lp.size


def pp_loss(cfg, stacked: dict, tokens: jax.Array, n_micro: int,
            pctx: ParallelCtx, pipe_axis: str = "pipe",
            remat: bool = False) -> jax.Array:
    """Pipelined causal-LM loss over local tokens [B, T].

    GPipe schedule: microbatch m enters stage 0 at step m and reaches
    stage d at step m+d; results are rotated with ppermute each step.
    Mean CE over all tokens (psum'd across pipe; caller averages data)."""
    d = jax.lax.axis_index(pipe_axis)
    PP = jax.lax.axis_size(pipe_axis)
    B, T = tokens.shape
    assert B % n_micro == 0, (B, n_micro)
    mb = B // n_micro
    tmicro = tokens.reshape(n_micro, mb, T)
    positions = jnp.arange(T, dtype=jnp.int32)[None].repeat(mb, 0)
    h_dim = stacked["embed"]["w"].shape[1]
    sp_div = pctx.tp if pctx.sp else 1
    n_steps = n_micro + PP - 1  # python int: PP from mesh at trace time
    local_pairs = stacked["pairs"]

    def step(carry, s):
        h, loss_sum, tok_cnt = carry
        # stage input: rank 0 embeds the entering microbatch, others use
        # the buffer received from the previous stage
        m_in = jnp.clip(s, 0, n_micro - 1)
        toks_in = jax.lax.dynamic_index_in_dim(tmicro, m_in, 0,
                                               keepdims=False)
        x0 = common.embed_vp(stacked["embed"], toks_in, pctx)
        if pctx.sp:
            x0 = x0.reshape(mb, pctx.tp, T // pctx.tp, h_dim)[
                :, pctx.rank() if pctx.model_axis else 0]
        h_in = jnp.where(d == 0, x0, h)
        h_out = _stage_forward(cfg, local_pairs, h_in, positions, pctx,
                               remat)
        # last stage: loss for the microbatch that just completed
        m_out = jnp.clip(s - (PP - 1), 0, n_micro - 1)
        toks_out = jax.lax.dynamic_index_in_dim(tmicro, m_out, 0,
                                                keepdims=False)
        h_full = pctx.sp_gather(h_out) if pctx.sp else h_out
        lsum, cnt = _microbatch_loss(cfg, stacked, h_full, toks_out, pctx)
        take = (d == PP - 1) & (s >= PP - 1)
        loss_sum = loss_sum + jnp.where(take, lsum, 0.0).astype(jnp.float32)
        tok_cnt = tok_cnt + jnp.where(take, jnp.int32(cnt), 0)
        # rotate buffers to the next stage
        h_next = jax.lax.ppermute(
            h_out, pipe_axis, [(i, (i + 1) % PP) for i in range(PP)])
        return (h_next, loss_sum, tok_cnt), None

    h0 = jnp.zeros((mb, T // sp_div, h_dim),
                   stacked["embed"]["w"].dtype)
    (h, loss_sum, tok_cnt), _ = jax.lax.scan(
        step, (h0, jnp.float32(0.0), jnp.int32(0)),
        jnp.arange(n_steps))
    loss_sum = jax.lax.psum(loss_sum, pipe_axis)
    tok_cnt = jax.lax.psum(tok_cnt, pipe_axis)
    # shape [1]: concatenated over the data axis by shard_map (per-shard
    # losses differ), averaged by the caller
    return (loss_sum / jnp.maximum(tok_cnt.astype(jnp.float32), 1.0))[None]


# ---------------------------------------------------------------------------
# jitted train step over a (data, pipe, model) mesh
# ---------------------------------------------------------------------------

def make_pp_train_step(cfg, mesh: Mesh, params: dict, n_micro: int = 4,
                       optimizer=None, remat: bool = False,
                       sp: bool = False):
    """Build (stacked_params, specs, jitted step, opt_init).

    The step is (stacked, opt_state, tokens [B, T]) ->
    (stacked, opt_state, loss) with tokens sharded over "data", layer
    pairs over "pipe", TP weights over "model" (optionally SP)."""
    import optax

    if optimizer is None:
        optimizer = optax.adamw(1e-4)
    stacked = stack_pairs(cfg, params)
    specs = stacked_specs(cfg, params, stacked)
    pctx = ParallelCtx(model_axis="model", data_axis="data", sp=sp)

    lossfn = jax.shard_map(
        functools.partial(pp_loss, cfg, n_micro=n_micro, pctx=pctx,
                          remat=remat),
        mesh=mesh,
        in_specs=(specs, P("data")),
        out_specs=P("data"),
        check_vma=False)

    def step(stacked, opt_state, tokens):
        def mean_loss(st):
            return jnp.mean(lossfn(st, tokens))

        loss, grads = jax.value_and_grad(mean_loss)(stacked)
        updates, opt_state = optimizer.update(grads, opt_state, stacked)
        stacked = optax.apply_updates(stacked, updates)
        return stacked, opt_state, loss

    stacked = sharding.place(mesh, stacked, specs)
    jstep = jax.jit(step, donate_argnums=(0, 1))
    return stacked, specs, jstep, optimizer.init
