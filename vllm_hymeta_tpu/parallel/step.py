"""shard_map-wrapped step functions over a (data, model) mesh.

One jitted program per engine step; inside, the model code runs per-shard
with ParallelCtx inserting the TP psums / EP combines, and Pallas kernels
see local shapes (GSPMD cannot partition opaque kernel calls — shard_map
can, which is why the whole step lives inside it).
"""

from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh, PartitionSpec as P

from vllm_hymeta_tpu.config import HymetaConfig
from vllm_hymeta_tpu.models import get_model
from vllm_hymeta_tpu.parallel import sharding
from vllm_hymeta_tpu.parallel.pctx import ParallelCtx

REPL = P()


def _shard_map(fn, mesh, in_specs, out_specs):
    return jax.shard_map(fn, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs, check_vma=False)


def make_local_prefill(cfg, mesh: Mesh, params: dict, cache: dict,
                       meta: Optional[dict], need_logits: bool = True):
    """shard_map-wrapped (un-jitted) prefill(params, meta, cache, tokens,
    slot, pos0, n_valid) -> (logits [V], cache).  need_logits=False skips
    the LM head for mid-prompt chunks."""
    model = get_model(cfg)
    is_hymeta = isinstance(cfg, HymetaConfig)
    pctx = ParallelCtx(model_axis="model", data_axis="data")
    pspecs = sharding.param_specs(cfg, params)
    cspecs = sharding.cache_specs(cache)
    mspecs = sharding.meta_specs(meta) if meta is not None else None

    def local(params, meta, cache, tokens, slot, pos0, n_valid):
        if is_hymeta:
            return model.prefill(cfg, params, meta, cache, tokens, slot,
                                 pos0, n_valid, pctx=pctx,
                                 need_logits=need_logits)
        return model.prefill(cfg, params, cache, tokens, slot, pos0,
                             n_valid, pctx=pctx, need_logits=need_logits)

    return _shard_map(
        local, mesh,
        in_specs=(pspecs, mspecs, cspecs, REPL, REPL, REPL, REPL),
        out_specs=(REPL, cspecs))


def build_prefill(cfg, mesh: Mesh, params: dict, cache: dict,
                  meta: Optional[dict], T: int):
    """Returns jitted prefill(params, meta, cache, tokens, slot, pos0,
    n_valid) -> (logits [V], cache)."""
    return jax.jit(make_local_prefill(cfg, mesh, params, cache, meta),
                   donate_argnums=(2,))


def make_local_prefill_group(cfg, mesh: Mesh, params: dict, cache: dict,
                             meta: Optional[dict]):
    """dp-grouped prefill: ONE request chunk per data rank in a single
    step (B == dp size) — the mesh path's multi-request prefill.  Each
    rank computes only its own request (vs the owner-masked replication
    of the single-request path, which wastes (dp-1)/dp of the FLOPs).
    Rows with n_valid == 0 are no-ops (dummy ranks).

    prefill_group(params, meta, cache, tokens [B, T], slots [B],
    pos0 [B], n_valid [B]) -> (logits [B, V], cache)."""
    model = get_model(cfg)
    is_hymeta = isinstance(cfg, HymetaConfig)
    pctx = ParallelCtx(model_axis="model", data_axis="data",
                       dp_grouped=True)
    pspecs = sharding.param_specs(cfg, params)
    cspecs = sharding.cache_specs(cache)
    mspecs = sharding.meta_specs(meta) if meta is not None else None

    def local(params, meta, cache, tokens, slots, pos0, n_valid):
        # local shards: tokens [1, T], slots/pos0/n_valid [1]
        if is_hymeta:
            logits, cache = model.prefill(
                cfg, params, meta, cache, tokens[0], slots[0], pos0[0],
                n_valid[0], pctx=pctx)
        else:
            logits, cache = model.prefill(
                cfg, params, cache, tokens[0], slots[0], pos0[0],
                n_valid[0], pctx=pctx)
        return logits[None], cache

    return _shard_map(
        local, mesh,
        in_specs=(pspecs, mspecs, cspecs, P("data"), P("data"),
                  P("data"), P("data")),
        out_specs=(P("data", None), cspecs))


def make_local_prefill_split(cfg, mesh: Mesh, params: dict, cache: dict,
                             meta: Optional[dict],
                             need_logits: bool = True):
    """Split-T prefill: ONE request's chunk token-sharded over the data
    ranks (each rank computes T/dp tokens through all matmuls) — the
    single-long-prompt path where owner-masked replication would waste
    (dp-1)/dp of the mesh.  Tokens arrive replicated [T]; the model fn
    slices per-rank internally (it needs the full chunk for the KV
    all-gather anyway)."""
    model = get_model(cfg)
    is_hymeta = isinstance(cfg, HymetaConfig)
    pctx = ParallelCtx(model_axis="model", data_axis="data")
    pspecs = sharding.param_specs(cfg, params)
    cspecs = sharding.cache_specs(cache)
    mspecs = sharding.meta_specs(meta) if meta is not None else None

    def local(params, meta, cache, tokens, slot, pos0, n_valid):
        if is_hymeta:
            return model.prefill_split(
                cfg, params, meta, cache, tokens, slot, pos0, n_valid,
                pctx=pctx, need_logits=need_logits)
        return model.prefill_split(
            cfg, params, cache, tokens, slot, pos0, n_valid,
            pctx=pctx, need_logits=need_logits)

    return _shard_map(
        local, mesh,
        in_specs=(pspecs, mspecs, cspecs, REPL, REPL, REPL, REPL),
        out_specs=(REPL, cspecs))


def make_local_prefill_mixed_group(cfg, mesh: Mesh, params: dict,
                                   cache: dict, meta: Optional[dict]):
    """Mesh mixed batching (VERDICT r4 item 3): ONE chunk per data rank
    (dp-grouped, dummy rows n_valid=0 no-op) PLUS one decode step for
    every active slot, in a single shard_map program — the mesh form of
    the single-device batched-mixed step, matching vLLM's batched model
    runner under TP (`attention/meta_attention.py:612-639`).

    mixed_group(params, meta, cache, tokens [dp, T], slots [dp],
    pos0 [dp], n_valid [dp], d_tokens [S], d_positions [S],
    d_active [S]) -> (p_logits [dp, V], d_logits [S, V], cache)."""
    model = get_model(cfg)
    is_hymeta = isinstance(cfg, HymetaConfig)
    pctx = ParallelCtx(model_axis="model", data_axis="data",
                       dp_grouped=True)
    pspecs = sharding.param_specs(cfg, params)
    cspecs = sharding.cache_specs(cache)
    mspecs = sharding.meta_specs(meta) if meta is not None else None

    def local(params, meta, cache, tokens, slots, pos0, n_valid,
              d_tokens, d_positions, d_active):
        # local shards: tokens [1, T]; slots/pos0/n_valid [1];
        # d_* [S/dp] (this rank's slot rows)
        if is_hymeta:
            p_logits, d_logits, cache = model.prefill_mixed(
                cfg, params, meta, cache, tokens[0], slots[0], pos0[0],
                n_valid[0], d_tokens, d_positions, d_active, pctx=pctx)
        else:
            p_logits, d_logits, cache = model.prefill_mixed(
                cfg, params, cache, tokens[0], slots[0], pos0[0],
                n_valid[0], d_tokens, d_positions, d_active, pctx=pctx)
        return p_logits[None], d_logits, cache

    return _shard_map(
        local, mesh,
        in_specs=(pspecs, mspecs, cspecs, P("data"), P("data"), P("data"),
                  P("data"), P("data"), P("data"), P("data")),
        out_specs=(P("data", None), P("data", None), cspecs))


def make_local_decode(cfg, mesh: Mesh, params: dict, cache: dict,
                      meta: Optional[dict]):
    """shard_map-wrapped (un-jitted) decode(params, meta, cache, tokens,
    positions, active) -> (logits [S, V], cache)."""
    model = get_model(cfg)
    is_hymeta = isinstance(cfg, HymetaConfig)
    pctx = ParallelCtx(model_axis="model", data_axis="data")
    pspecs = sharding.param_specs(cfg, params)
    cspecs = sharding.cache_specs(cache)
    mspecs = sharding.meta_specs(meta) if meta is not None else None

    def local(params, meta, cache, tokens, positions, active):
        if is_hymeta:
            return model.decode(cfg, params, meta, cache, tokens,
                                positions, active, pctx=pctx)
        return model.decode(cfg, params, cache, tokens, positions,
                            active, pctx=pctx)

    return _shard_map(
        local, mesh,
        in_specs=(pspecs, mspecs, cspecs, P("data"), P("data"), P("data")),
        out_specs=(P("data", None), cspecs))


def build_decode(cfg, mesh: Mesh, params: dict, cache: dict,
                 meta: Optional[dict]):
    """Returns jitted decode(params, meta, cache, tokens, positions,
    active) -> (logits [S, V], cache)."""
    return jax.jit(make_local_decode(cfg, mesh, params, cache, meta),
                   donate_argnums=(2,))


def place_all(cfg, mesh: Mesh, params: dict, cache: dict,
              meta: Optional[dict]):
    """device_put params/cache/meta with their shardings."""
    pspecs = sharding.param_specs(cfg, params)
    cspecs = sharding.cache_specs(cache)
    params = sharding.place(mesh, params, pspecs)
    cache = sharding.place(mesh, cache, cspecs)
    if meta is not None:
        meta = sharding.place(mesh, meta, sharding.meta_specs(meta))
    return params, cache, meta
