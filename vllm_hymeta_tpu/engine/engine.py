"""Continuous-batching engine: slot allocation, chunked prefill, batched
decode — the TPU-native replacement for the vLLM engine + scheduler +
model-runner stack the reference plugs into (SURVEY.md §1, §3.2-3.3).

Key differences from the CUDA design, driven by XLA's static-shape world:
  * token layout per step is either one prefill chunk (padded to a bucket)
    or the dense slot batch for decode — replacing the
    `[meta | prefills | decodes]` flattened layout of
    `attention/meta_attention.py:612-639`;
  * CUDA-graph capture is replaced by jit caching: one compiled program per
    prefill bucket + one for decode, with donated cache buffers;
  * request→slot mapping with clear-on-new-prefill mirrors
    `models/hymeta_cache.py` + `modeling_hymeta.py:1202-1227`;
  * the 70B metatoken caches are computed once at load
    (models/hymeta.py:precompute_meta), deleting the warm-up hacks.
"""

from __future__ import annotations

import dataclasses
import time
from collections import deque
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vllm_hymeta_tpu import cache as cache_lib
from vllm_hymeta_tpu.config import HymetaConfig
from vllm_hymeta_tpu.engine import sampler as sampler_lib
from vllm_hymeta_tpu.engine.sampler import SamplingParams
from vllm_hymeta_tpu.models import get_model


@dataclasses.dataclass
class EngineConfig:
    max_num_seqs: int = 8
    max_model_len: int = 32768
    prefill_chunk: int = 8192          # max tokens per prefill step
    # compiled chunk sizes: each bucket is one jitted program (compiled
    # lazily on first use).  The ladder is deliberately tight at the
    # short end — the r4 sonnet run measured ~45% padding waste for
    # ~550-token prompts under a pow2 ladder (512/2048/8192); 640/896
    # catch typical chat prompts within ~15% padding (VERDICT r4 #10)
    prefill_buckets: Tuple[int, ...] = (256, 512, 640, 896, 1280, 2048,
                                        4096, 8192)
    kv_dtype: str = "bfloat16"
    state_dtype: str = "float32"
    use_device_sampling: bool = True
    # merge q/k/v (+both 70B branches) and gate/up into single matmuls
    fuse_projections: bool = True
    # decode steps fused into one jitted program per host round-trip —
    # the TPU analogue of the reference's multi-step decoding
    # (`attention/meta_attention.py:338-409` advance_step)
    decode_block: int = 8
    # max same-bucket requests prefilled in ONE step (batch sizes used:
    # powers of two up to this) — large-M matmuls for short-prompt
    # serving; 1 disables
    prefill_batch: int = 8
    # cross-request prefix cache: completed prefill-chunk states are
    # snapshotted and re-installed for new requests sharing the prompt
    # prefix (the role of vLLM's automatic prefix caching / the
    # reference's prefix-cache hit path, `meta_attention.py:900-919`,
    # exact here because ring+GLA state at position p captures the whole
    # history).  Value = max snapshots kept (LRU); 0 disables.
    prefix_cache_size: int = 0
    # top-N alternatives captured per emitted token when a request asks
    # for logprobs (static: compiled into the step programs); 0 disables
    logprobs_topk: int = 0
    # while decodes are in flight, cap prefill chunks at this many tokens
    # so a long prompt can't stall active generations for a whole
    # `prefill_chunk` step (the role of the reference's mixed
    # [prefills | decodes] batches, `meta_attention.py:612-639`);
    # 0 disables the cap
    prefill_chunk_active: int = 1024
    # fold ONE decode step for every active slot into each prefill-chunk
    # program (models.*.prefill_mixed): decode rows ride the chunk's
    # weight streams, so generations emit a token per chunk instead of
    # stalling behind it.  On a mesh the step runs one chunk per data
    # rank (dp-grouped) plus the sharded decode batch.
    mixed_prefill_decode: bool = True
    # throughput mode: while decodes are active and MORE requests are
    # waiting, defer prefill until this many slots have freed, so the
    # (batched-)mixed step runs at B ~ prefill_batch instead of the
    # B ~ 1 that staggered completions produce (r4 sonnet trace: 318
    # real tokens per 161 ms single-request mixed step).  Decodes keep
    # running while the batch accumulates, so inter-token latency stays
    # decode-block bounded; TTFT of the deferred prompts grows by a few
    # decode blocks.  0 = off (latency mode, the server default).
    prefill_batch_wait: int = 0


@dataclasses.dataclass
class Request:
    req_id: int
    prompt: List[int]
    params: SamplingParams
    slot: int = -1
    prefill_done: int = 0              # prompt tokens already processed
    output: List[int] = dataclasses.field(default_factory=list)
    finished: bool = False
    finish_reason: Optional[str] = None
    t_arrival: float = 0.0
    t_first_token: Optional[float] = None
    # per emitted token, when params.logprobs > 0
    logprobs: List[float] = dataclasses.field(default_factory=list)
    top_logprobs: List[Dict[int, float]] = dataclasses.field(
        default_factory=list)


class Engine:
    """Single-program (one process / one mesh) serving engine."""

    def __init__(self, cfg, params, engine_cfg: Optional[EngineConfig] = None,
                 meta: Optional[dict] = None, seed: int = 0, mesh=None):
        """mesh: optional jax Mesh with ("data", "model") axes — runs every
        step as a shard_map program with TP/EP/DP shardings
        (parallel/step.py); None = single device."""
        self.cfg = cfg
        self.params = params
        self.ecfg = engine_cfg or EngineConfig()
        self.model = get_model(cfg)
        self.mesh = mesh
        self.is_hymeta = isinstance(cfg, HymetaConfig)
        if self.is_hymeta and meta is None:
            meta = self.model.precompute_meta(cfg, params)
        self.meta = meta
        tp = int(mesh.shape["model"]) if mesh is not None else 1
        if self.ecfg.fuse_projections:
            from vllm_hymeta_tpu.models import common as _common
            self.params = _common.fuse_params(cfg, params, tp=tp)
            params = self.params

        cc = cache_lib.CacheConfig(
            max_num_seqs=self.ecfg.max_num_seqs,
            max_model_len=self.ecfg.max_model_len,
            kv_dtype=self.ecfg.kv_dtype,
            state_dtype=self.ecfg.state_dtype)
        self.cache = self.model.init_cache(cfg, cc)
        self.cc = cc

        if mesh is not None:
            from vllm_hymeta_tpu.parallel import step as pstep
            self.params, self.cache, self.meta = pstep.place_all(
                cfg, mesh, self.params, self.cache, self.meta)
            params = self.params
            self._local_prefill = pstep.make_local_prefill(
                cfg, mesh, self.params, self.cache, self.meta)
            self._local_prefill_mid = pstep.make_local_prefill(
                cfg, mesh, self.params, self.cache, self.meta,
                need_logits=False)
            self._local_prefill_group = pstep.make_local_prefill_group(
                cfg, mesh, self.params, self.cache, self.meta)
            self._local_decode = pstep.make_local_decode(
                cfg, mesh, self.params, self.cache, self.meta)
            # mesh mixed batching: one chunk per data rank + the decode
            # batch in one program (VERDICT r4 item 3)
            self._local_prefill_mixed_group = None
            if hasattr(self.model, "prefill_mixed"):
                self._local_prefill_mixed_group = \
                    pstep.make_local_prefill_mixed_group(
                        cfg, mesh, self.params, self.cache, self.meta)
            # split-T prefill: one request's chunk token-sharded over the
            # data ranks (used when a single pending request would
            # otherwise run owner-masked replicated compute)
            self._local_prefill_split = None
            self._local_prefill_split_mid = None
            if (int(mesh.shape["data"]) > 1
                    and hasattr(self.model, "prefill_split")):
                self._local_prefill_split = pstep.make_local_prefill_split(
                    cfg, mesh, self.params, self.cache, self.meta)
                self._local_prefill_split_mid = \
                    pstep.make_local_prefill_split(
                        cfg, mesh, self.params, self.cache, self.meta,
                        need_logits=False)
        else:
            self._local_prefill = None
            self._local_prefill_mid = None
            self._local_prefill_group = None
            self._local_decode = None
            self._local_prefill_split = None
            self._local_prefill_split_mid = None
            self._local_prefill_mixed_group = None

        S = self.ecfg.max_num_seqs
        if mesh is not None and int(mesh.shape["data"]) > 1:
            # interleave slot handout across data ranks so concurrent
            # requests land on different ranks (dp-grouped prefill + DP
            # decode both want rank-balanced slots)
            dp = int(mesh.shape["data"])
            n_local = S // dp
            order = [r * n_local + i for i in range(n_local)
                     for r in range(dp)]
            self.free_slots = deque(order)
        else:
            self.free_slots = deque(range(S))
        self.slot_req: Dict[int, Request] = {}
        self.waiting: deque = deque()
        self.next_id = 0
        self.rng = jax.random.PRNGKey(seed)

        # device-side per-slot sampling state
        self.samp_state = {
            "temperature": jnp.zeros((S,), jnp.float32),
            "top_k": jnp.zeros((S,), jnp.int32),
            "top_p": jnp.ones((S,), jnp.float32),
            "rep_penalty": jnp.ones((S,), jnp.float32),
            "seen": jnp.zeros((S, cfg.vocab_size), jnp.bool_),
            # on-device stop ids (eos + up to 3 stop_token_ids; -1 = none):
            # a slot goes inactive the step it samples one, so decode
            # blocks chain without a host round-trip even for stopping
            # requests
            "stop_ids": jnp.full((S, 4), -1, jnp.int32),
        }
        # host mirrors
        self.positions = np.zeros((S,), np.int64)
        self.active = np.zeros((S,), bool)

        # prefix cache: key tuple(prompt[:p]) -> device snapshot pytree
        self._prefix_cache: Dict[tuple, dict] = {}
        self._prefix_lru: List[tuple] = []
        self._compiled_snap_extract = None
        self._compiled_snap_install = None
        self._compiled_prefill = {}
        self._compiled_prefill_batched = {}
        self._compiled_prefill_group = {}
        self._compiled_decode = None
        self._compiled_start = None
        self._last_was_prefill = False
        # in-flight decode block:
        # (was_active, ids_dev, active_dev, positions_dev)
        self._pending: Optional[Tuple[np.ndarray, jax.Array, jax.Array,
                                      jax.Array]] = None

    # ------------------------------------------------------------------ api

    def add_request(self, prompt: List[int],
                    params: Optional[SamplingParams] = None) -> int:
        req = Request(self.next_id, list(prompt),
                      params or SamplingParams(), t_arrival=time.time())
        self.next_id += 1
        self.waiting.append(req)
        return req.req_id

    def has_work(self) -> bool:
        return bool(self.waiting) or bool(self.slot_req)

    # ------------------------------------------------------- step functions

    def _prefill_fn(self, bucket: int, final: bool = True):
        """Prefill chunk + (on final chunks) on-device first-token
        sampling in one program.  Mid-prompt chunks skip the LM head read
        and sampling entirely — only the cache writes matter."""
        key_ = (bucket, final)
        if key_ in self._compiled_prefill:
            return self._compiled_prefill[key_]
        # token-shard the chunk over the data ranks when the model
        # supports it and the bucket divides evenly (single-request mesh
        # prefill would otherwise replicate the compute dp times)
        split = (self._local_prefill_split is not None
                 and bucket % int(self.mesh.shape["data"]) == 0)

        def fn(params, meta, cache, samp, tokens, slot, pos0, n_valid,
               key):
            if self._local_prefill is not None:
                if split:
                    lp_fn = self._local_prefill_split if final \
                        else self._local_prefill_split_mid
                else:
                    lp_fn = self._local_prefill if final \
                        else self._local_prefill_mid
                logits, cache = lp_fn(
                    params, meta, cache, tokens, slot, pos0, n_valid)
            elif self.is_hymeta:
                logits, cache = self.model.prefill(
                    self.cfg, params, meta, cache, tokens, slot, pos0,
                    n_valid, need_logits=final)
            else:
                logits, cache = self.model.prefill(
                    self.cfg, params, cache, tokens, slot, pos0, n_valid,
                    need_logits=final)
            if not final:
                return jnp.int32(0), (), cache
            raw = logits.astype(jnp.float32)[None]
            lg = sampler_lib.apply_repetition_penalty(
                raw, samp["seen"][slot][None],
                samp["rep_penalty"][slot][None])
            tok = sampler_lib.sample(
                lg, key, samp["temperature"][slot][None],
                samp["top_k"][slot][None], samp["top_p"][slot][None])[0]
            lp = ()
            if self.ecfg.logprobs_topk > 0:
                # raw model logprobs (OpenAI semantics), not post-penalty
                lp = sampler_lib.token_logprobs(
                    raw, tok[None], self.ecfg.logprobs_topk)
            return tok, lp, cache

        jfn = jax.jit(fn, donate_argnums=(2,))
        self._compiled_prefill[key_] = jfn
        return jfn

    def _prefill_batched_fn(self, bucket: int, B: int):
        """B same-bucket request chunks in one program (both model
        families; single-device path)."""
        key_ = (bucket, B)
        if key_ in self._compiled_prefill_batched:
            return self._compiled_prefill_batched[key_]

        def fn(params, meta, cache, samp, tokens, slots, pos0, n_valid,
               key):
            if self.is_hymeta:
                logits, cache = self.model.prefill_batched(
                    self.cfg, params, meta, cache, tokens, slots, pos0,
                    n_valid)
            else:
                logits, cache = self.model.prefill_batched(
                    self.cfg, params, cache, tokens, slots, pos0, n_valid)
            raw = logits.astype(jnp.float32)                # [B, V]
            lg = sampler_lib.apply_repetition_penalty(
                raw, samp["seen"][slots], samp["rep_penalty"][slots])
            toks = sampler_lib.sample(
                lg, key, samp["temperature"][slots],
                samp["top_k"][slots], samp["top_p"][slots])
            lp = ()
            if self.ecfg.logprobs_topk > 0:
                lp = sampler_lib.token_logprobs(
                    raw, toks, self.ecfg.logprobs_topk)
            return toks, lp, cache

        jfn = jax.jit(fn, donate_argnums=(2,))
        self._compiled_prefill_batched[key_] = jfn
        return jfn

    def _prefill_group_fn(self, bucket: int):
        """Mesh path: one request chunk per data rank in one program
        (B == dp), plus per-row sampling."""
        if bucket in self._compiled_prefill_group:
            return self._compiled_prefill_group[bucket]

        def fn(params, meta, cache, samp, tokens, slots, pos0, n_valid,
               key):
            logits, cache = self._local_prefill_group(
                params, meta, cache, tokens, slots, pos0, n_valid)
            raw = logits.astype(jnp.float32)                # [B, V]
            lg = sampler_lib.apply_repetition_penalty(
                raw, samp["seen"][slots], samp["rep_penalty"][slots])
            toks = sampler_lib.sample(
                lg, key, samp["temperature"][slots],
                samp["top_k"][slots], samp["top_p"][slots])
            lp = ()
            if self.ecfg.logprobs_topk > 0:
                lp = sampler_lib.token_logprobs(
                    raw, toks, self.ecfg.logprobs_topk)
            return toks, lp, cache

        jfn = jax.jit(fn, donate_argnums=(2,))
        self._compiled_prefill_group[bucket] = jfn
        return jfn

    def _prefill_mixed_fn(self, bucket: int, final: bool):
        """One program: prefill chunk for one slot + one decode step for
        the active slots, with sampling for both (mixed batching)."""
        key_ = ("mixed", bucket, final)
        if key_ in self._compiled_prefill:
            return self._compiled_prefill[key_]

        def fn(params, meta, cache, samp, tokens, slot, pos0, n_valid,
               d_tokens, d_positions, d_active, key):
            from vllm_hymeta_tpu.models import common as _common
            params = _common.prepare_decode_params(params)
            if self.is_hymeta:
                p_logits, d_logits, cache = self.model.prefill_mixed(
                    self.cfg, params, meta, cache, tokens, slot, pos0,
                    n_valid, d_tokens, d_positions, d_active,
                    need_logits=final)
            else:
                p_logits, d_logits, cache = self.model.prefill_mixed(
                    self.cfg, params, cache, tokens, slot, pos0,
                    n_valid, d_tokens, d_positions, d_active,
                    need_logits=final)
            kp, kd = jax.random.split(key)
            # decode rows
            raw_d = d_logits.astype(jnp.float32)
            lg_d = sampler_lib.apply_repetition_penalty(
                raw_d, samp["seen"], samp["rep_penalty"])
            d_ids = sampler_lib.sample(
                lg_d, kd, samp["temperature"], samp["top_k"],
                samp["top_p"])
            d_ids = jnp.where(d_active, d_ids, d_tokens)
            lp_d = ()
            if self.ecfg.logprobs_topk > 0:
                lp_d = sampler_lib.token_logprobs(
                    raw_d, d_ids, self.ecfg.logprobs_topk)
            samp = dict(samp)
            rows = jnp.arange(d_ids.shape[0])
            seen_rows = samp["seen"][rows, d_ids]
            samp["seen"] = samp["seen"].at[rows, d_ids].set(
                jnp.where(d_active, True, seen_rows))
            # prefill row
            p_tok = jnp.int32(0)
            lp_p = ()
            if final:
                raw_p = p_logits.astype(jnp.float32)[None]
                lg_p = sampler_lib.apply_repetition_penalty(
                    raw_p, samp["seen"][slot][None],
                    samp["rep_penalty"][slot][None])
                p_tok = sampler_lib.sample(
                    lg_p, kp, samp["temperature"][slot][None],
                    samp["top_k"][slot][None], samp["top_p"][slot][None])[0]
                if self.ecfg.logprobs_topk > 0:
                    lp_p = sampler_lib.token_logprobs(
                        raw_p, p_tok[None], self.ecfg.logprobs_topk)
            return p_tok, lp_p, d_ids, lp_d, cache, samp

        jfn = jax.jit(fn, donate_argnums=(2, 3))
        self._compiled_prefill[key_] = jfn
        return jfn

    def _prefill_mixed_batched_fn(self, bucket: int, B: int):
        """B same-bucket chunks + one decode step for the active slots in
        one program, with sampling for all rows (host emits only rows
        whose prompt completed)."""
        key_ = ("mixedB", bucket, B)
        if key_ in self._compiled_prefill:
            return self._compiled_prefill[key_]

        def fn(params, meta, cache, samp, tokens, slots, pos0, n_valid,
               d_tokens, d_positions, d_active, key):
            from vllm_hymeta_tpu.models import common as _common
            params = _common.prepare_decode_params(params)
            if self.is_hymeta:
                p_logits, d_logits, cache = self.model.prefill_mixed_batched(
                    self.cfg, params, meta, cache, tokens, slots, pos0,
                    n_valid, d_tokens, d_positions, d_active)
            else:
                p_logits, d_logits, cache = self.model.prefill_mixed_batched(
                    self.cfg, params, cache, tokens, slots, pos0,
                    n_valid, d_tokens, d_positions, d_active)
            kp, kd = jax.random.split(key)
            # decode rows
            raw_d = d_logits.astype(jnp.float32)
            lg_d = sampler_lib.apply_repetition_penalty(
                raw_d, samp["seen"], samp["rep_penalty"])
            d_ids = sampler_lib.sample(
                lg_d, kd, samp["temperature"], samp["top_k"],
                samp["top_p"])
            d_ids = jnp.where(d_active, d_ids, d_tokens)
            lp_d = ()
            if self.ecfg.logprobs_topk > 0:
                lp_d = sampler_lib.token_logprobs(
                    raw_d, d_ids, self.ecfg.logprobs_topk)
            samp = dict(samp)
            rows = jnp.arange(d_ids.shape[0])
            seen_rows = samp["seen"][rows, d_ids]
            samp["seen"] = samp["seen"].at[rows, d_ids].set(
                jnp.where(d_active, True, seen_rows))
            # prefill rows (sampled for every row; the host emits only
            # rows whose prompt completed this chunk)
            raw_p = p_logits.astype(jnp.float32)              # [B, V]
            lg_p = sampler_lib.apply_repetition_penalty(
                raw_p, samp["seen"][slots], samp["rep_penalty"][slots])
            p_toks = sampler_lib.sample(
                lg_p, kp, samp["temperature"][slots],
                samp["top_k"][slots], samp["top_p"][slots])
            lp_p = ()
            if self.ecfg.logprobs_topk > 0:
                lp_p = sampler_lib.token_logprobs(
                    raw_p, p_toks, self.ecfg.logprobs_topk)
            return p_toks, lp_p, d_ids, lp_d, cache, samp

        jfn = jax.jit(fn, donate_argnums=(2, 3))
        self._compiled_prefill[key_] = jfn
        return jfn

    def _prefill_mixed_group_fn(self, bucket: int):
        """Mesh path: one chunk per data rank + the decode batch in ONE
        shard_map program, with sampling for all rows."""
        key_ = ("mixedG", bucket)
        if key_ in self._compiled_prefill:
            return self._compiled_prefill[key_]

        def fn(params, meta, cache, samp, tokens, slots, pos0, n_valid,
               d_tokens, d_positions, d_active, key):
            p_logits, d_logits, cache = self._local_prefill_mixed_group(
                params, meta, cache, tokens, slots, pos0, n_valid,
                d_tokens, d_positions, d_active)
            kp, kd = jax.random.split(key)
            raw_d = d_logits.astype(jnp.float32)
            lg_d = sampler_lib.apply_repetition_penalty(
                raw_d, samp["seen"], samp["rep_penalty"])
            d_ids = sampler_lib.sample(
                lg_d, kd, samp["temperature"], samp["top_k"],
                samp["top_p"])
            d_ids = jnp.where(d_active, d_ids, d_tokens)
            lp_d = ()
            if self.ecfg.logprobs_topk > 0:
                lp_d = sampler_lib.token_logprobs(
                    raw_d, d_ids, self.ecfg.logprobs_topk)
            samp = dict(samp)
            rows = jnp.arange(d_ids.shape[0])
            seen_rows = samp["seen"][rows, d_ids]
            samp["seen"] = samp["seen"].at[rows, d_ids].set(
                jnp.where(d_active, True, seen_rows))
            raw_p = p_logits.astype(jnp.float32)              # [dp, V]
            lg_p = sampler_lib.apply_repetition_penalty(
                raw_p, samp["seen"][slots], samp["rep_penalty"][slots])
            p_toks = sampler_lib.sample(
                lg_p, kp, samp["temperature"][slots],
                samp["top_k"][slots], samp["top_p"][slots])
            lp_p = ()
            if self.ecfg.logprobs_topk > 0:
                lp_p = sampler_lib.token_logprobs(
                    raw_p, p_toks, self.ecfg.logprobs_topk)
            return p_toks, lp_p, d_ids, lp_d, cache, samp

        jfn = jax.jit(fn, donate_argnums=(2, 3))
        self._compiled_prefill[key_] = jfn
        return jfn

    def _step_mixed_mesh(self, pending: List[Request],
                         finished: List[Request]):
        """Mesh mixed step: one pending request per data rank (dummy
        no-op rows for idle ranks) + one decode token for every active
        slot, in one dispatch."""
        dp = int(self.mesh.shape["data"])
        n_local = self.ecfg.max_num_seqs // dp
        cap = self._chunk_cap()
        by_rank: Dict[int, Request] = {}
        for r in pending:
            by_rank.setdefault(r.slot // n_local, r)
        bucket = max(self._bucket_for(
            min(len(r.prompt) - r.prefill_done, cap))
            for r in by_rank.values())
        tokens = np.zeros((dp, bucket), np.int32)
        slots = np.zeros((dp,), np.int32)
        pos0 = np.zeros((dp,), np.int32)
        nval = np.zeros((dp,), np.int32)
        group = []
        for rk in range(dp):
            r = by_rank.get(rk)
            if r is None:
                # dummy row: slot -1 maps to owned=False on every rank, so
                # neither the ring write nor the GLA identity-state write
                # commits (a real slot id here would overwrite that slot's
                # decode-updated state with its pre-decode state)
                slots[rk] = -1
                continue
            n = min(len(r.prompt) - r.prefill_done, bucket)
            tokens[rk, :n] = r.prompt[r.prefill_done:r.prefill_done + n]
            slots[rk] = r.slot
            pos0[rk] = r.prefill_done
            nval[rk] = n
            group.append((rk, r))
        S = self.ecfg.max_num_seqs
        d_tokens = np.zeros((S,), np.int32)
        was_active = self.active.copy()
        for slot, req in self.slot_req.items():
            if was_active[slot]:
                d_tokens[slot] = req.output[-1]
        fn = self._prefill_mixed_group_fn(bucket)
        self.rng, k_ = jax.random.split(self.rng)
        (p_toks, lp_p, d_ids, lp_d, self.cache, self.samp_state) = fn(
            self.params, self.meta, self.cache, self.samp_state,
            jnp.asarray(tokens), jnp.asarray(slots), jnp.asarray(pos0),
            jnp.asarray(nval), jnp.asarray(d_tokens),
            jnp.asarray(self.positions.astype(np.int32)),
            jnp.asarray(was_active), k_)
        # harvest decode tokens
        ids = np.asarray(d_ids)
        lps = tuple(np.asarray(a) for a in lp_d) if lp_d else None
        in_group = {r.slot for _, r in group}
        for slot in list(self.slot_req):
            req = self.slot_req[slot]
            if not was_active[slot] or slot in in_group:
                continue
            self.positions[slot] += 1
            lp = None
            if lps is not None and req.params.logprobs > 0:
                lp = (float(lps[0][slot]), lps[1][slot], lps[2][slot])
            self._emit(req, int(ids[slot]), finished, lp)
        # advance the prefills; emit first tokens for completed prompts
        ptoks = None
        plps = None
        for rk, r in group:
            r.prefill_done += int(nval[rk])
            self.positions[r.slot] = r.prefill_done
            self._maybe_snapshot_prefix(r)
            if r.prefill_done >= len(r.prompt):
                if ptoks is None:
                    ptoks = np.asarray(p_toks)
                    plps = tuple(np.asarray(a) for a in lp_p) \
                        if lp_p else None
                lp = None
                if plps is not None and r.params.logprobs > 0:
                    lp = (float(plps[0][rk]), plps[1][rk], plps[2][rk])
                self._emit(r, int(ptoks[rk]), finished, lp)
                if not r.finished:
                    self.active[r.slot] = True
        return finished

    def _step_mixed_batched(self, group: List[Request], bucket: int,
                            finished: List[Request]):
        """Batched mixed step: advance B prompts one chunk each AND emit
        one token for every active slot, in one dispatch."""
        B = len(group)
        tokens = np.zeros((B, bucket), np.int32)
        slots = np.zeros((B,), np.int32)
        pos0 = np.zeros((B,), np.int32)
        nval = np.zeros((B,), np.int32)
        for b, r in enumerate(group):
            n = min(len(r.prompt) - r.prefill_done, bucket)
            tokens[b, :n] = r.prompt[r.prefill_done:r.prefill_done + n]
            slots[b] = r.slot
            pos0[b] = r.prefill_done
            nval[b] = n
        S = self.ecfg.max_num_seqs
        d_tokens = np.zeros((S,), np.int32)
        was_active = self.active.copy()
        for slot, req in self.slot_req.items():
            if was_active[slot]:
                d_tokens[slot] = req.output[-1]
        fn = self._prefill_mixed_batched_fn(bucket, B)
        self.rng, k_ = jax.random.split(self.rng)
        (p_toks, lp_p, d_ids, lp_d, self.cache, self.samp_state) = fn(
            self.params, self.meta, self.cache, self.samp_state,
            jnp.asarray(tokens), jnp.asarray(slots), jnp.asarray(pos0),
            jnp.asarray(nval), jnp.asarray(d_tokens),
            jnp.asarray(self.positions.astype(np.int32)),
            jnp.asarray(was_active), k_)
        # harvest decode tokens
        ids = np.asarray(d_ids)
        lps = tuple(np.asarray(a) for a in lp_d) if lp_d else None
        in_group = {r.slot for r in group}
        for slot in list(self.slot_req):
            req = self.slot_req[slot]
            if not was_active[slot] or slot in in_group:
                continue
            self.positions[slot] += 1
            lp = None
            if lps is not None and req.params.logprobs > 0:
                lp = (float(lps[0][slot]), lps[1][slot], lps[2][slot])
            self._emit(req, int(ids[slot]), finished, lp)
        # advance the prefills; emit first tokens for completed prompts
        ptoks = None
        plps = None
        for b, r in enumerate(group):
            r.prefill_done += int(nval[b])
            self.positions[r.slot] = r.prefill_done
            if r.prefill_done >= len(r.prompt):
                if ptoks is None:
                    ptoks = np.asarray(p_toks)
                    plps = tuple(np.asarray(a) for a in lp_p) \
                        if lp_p else None
                lp = None
                if plps is not None and r.params.logprobs > 0:
                    lp = (float(plps[0][b]), plps[1][b], plps[2][b])
                self._emit(r, int(ptoks[b]), finished, lp)
                if not r.finished:
                    self.active[r.slot] = True
        return finished

    def _step_mixed(self, pre: Request, finished: List[Request]):
        """Mixed prefill+decode step: advance `pre`'s prompt by one chunk
        AND emit one token for every active slot, in one dispatch."""
        # batch same-bucket pending prompts into one mixed dispatch: with
        # staggered completions, one-request-at-a-time mixed steps
        # serialize ingestion (r4 sonnet trace: 318 real tokens per
        # 161 ms step); the batched-mixed program keeps decode cadence
        # AND batched-matmul prefill efficiency
        if (self.ecfg.prefill_batch > 1
                and hasattr(self.model, "prefill_mixed_batched")):
            cap = self._chunk_cap()
            pending = [r for r in self.slot_req.values()
                       if r.prefill_done < len(r.prompt)]
            by_bucket: Dict[int, List[Request]] = {}
            for r in pending:
                n = min(len(r.prompt) - r.prefill_done, cap)
                by_bucket.setdefault(self._bucket_for(n), []).append(r)
            if by_bucket:
                bucket, grp = max(by_bucket.items(),
                                  key=lambda kv: len(kv[1]))
                if len(grp) >= 2:
                    B = 1
                    while B * 2 <= min(len(grp), self.ecfg.prefill_batch):
                        B *= 2
                    return self._step_mixed_batched(grp[:B], bucket,
                                                    finished)
        n_left = len(pre.prompt) - pre.prefill_done
        n = min(n_left, self._chunk_cap())
        bucket = self._bucket_for(n)
        final = pre.prefill_done + n >= len(pre.prompt)
        tokens = np.zeros((bucket,), np.int32)
        tokens[:n] = pre.prompt[pre.prefill_done:pre.prefill_done + n]
        S = self.ecfg.max_num_seqs
        d_tokens = np.zeros((S,), np.int32)
        was_active = self.active.copy()
        for slot, req in self.slot_req.items():
            if was_active[slot]:
                d_tokens[slot] = req.output[-1]
        fn = self._prefill_mixed_fn(bucket, final)
        self.rng, k_ = jax.random.split(self.rng)
        (p_tok, lp_p, d_ids, lp_d, self.cache, self.samp_state) = fn(
            self.params, self.meta, self.cache, self.samp_state,
            jnp.asarray(tokens), jnp.int32(pre.slot),
            jnp.int32(pre.prefill_done), jnp.int32(n),
            jnp.asarray(d_tokens),
            jnp.asarray(self.positions.astype(np.int32)),
            jnp.asarray(was_active), k_)
        # harvest decode tokens (one per active slot)
        ids = np.asarray(d_ids)
        lps = tuple(np.asarray(a) for a in lp_d) if lp_d else None
        for slot in list(self.slot_req):
            req = self.slot_req[slot]
            if not was_active[slot] or req is pre:
                continue
            self.positions[slot] += 1
            lp = None
            if lps is not None and req.params.logprobs > 0:
                lp = (float(lps[0][slot]), lps[1][slot], lps[2][slot])
            self._emit(req, int(ids[slot]), finished, lp)
        # advance the prefill
        pre.prefill_done += n
        self.positions[pre.slot] = pre.prefill_done
        self._maybe_snapshot_prefix(pre)
        if final:
            lp = None
            if lp_p and pre.params.logprobs > 0:
                lp = (float(np.asarray(lp_p[0])[0]),
                      np.asarray(lp_p[1])[0], np.asarray(lp_p[2])[0])
            self._emit(pre, int(p_tok), finished, lp)
            if not pre.finished:
                self.active[pre.slot] = True
        return finished

    def _start_fn(self):
        """Slot (re)initialization fused into one dispatch: clear caches,
        seed the 70B meta GLA state, set per-slot sampling params."""
        if self._compiled_start is not None:
            return self._compiled_start

        def fn(cache, samp, meta, slot, temperature, top_k, top_p,
               rep_penalty, stop_ids):
            layers = []
            for i, lc in enumerate(cache["layers"]):
                lc = dict(lc)
                for key in lc:
                    zero = jnp.zeros_like(lc[key][slot])
                    if key == "state" and self.is_hymeta:
                        zero = meta["state"][i].astype(lc[key].dtype)
                    lc[key] = lc[key].at[slot].set(zero)
                layers.append(lc)
            samp = {
                "temperature": samp["temperature"].at[slot].set(temperature),
                "top_k": samp["top_k"].at[slot].set(top_k),
                "top_p": samp["top_p"].at[slot].set(top_p),
                "rep_penalty": samp["rep_penalty"].at[slot].set(rep_penalty),
                "seen": samp["seen"].at[slot].set(False),
                "stop_ids": samp["stop_ids"].at[slot].set(stop_ids),
            }
            return {**cache, "layers": layers}, samp

        self._compiled_start = jax.jit(fn, donate_argnums=(0, 1))
        return self._compiled_start

    def _decode_fn(self):
        """Multi-token decode: `decode_block` model steps + sampling fused
        into ONE dispatch, amortizing the host round-trip."""
        if self._compiled_decode is not None:
            return self._compiled_decode
        n_steps = self.ecfg.decode_block

        def one_step(params, meta, cache, samp, tokens, positions, active,
                     key):
            if self._local_decode is not None:
                logits, cache = self._local_decode(
                    params, meta, cache, tokens, positions, active)
            elif self.is_hymeta:
                logits, cache = self.model.decode(
                    self.cfg, params, meta, cache, tokens, positions, active)
            else:
                logits, cache = self.model.decode(
                    self.cfg, params, cache, tokens, positions, active)
            raw = logits.astype(jnp.float32)
            logits = sampler_lib.apply_repetition_penalty(
                raw, samp["seen"], samp["rep_penalty"])
            ids = sampler_lib.sample(
                logits, key, samp["temperature"], samp["top_k"],
                samp["top_p"])
            ids = jnp.where(active, ids, tokens)
            lp = ()
            if self.ecfg.logprobs_topk > 0:
                lp = sampler_lib.token_logprobs(
                    raw, ids, self.ecfg.logprobs_topk)
            samp = dict(samp)
            seen_rows = samp["seen"][jnp.arange(ids.shape[0]), ids]
            samp["seen"] = samp["seen"].at[
                jnp.arange(ids.shape[0]), ids].set(
                jnp.where(active, True, seen_rows))
            return ids, lp, cache, samp

        K = self.ecfg.logprobs_topk
        single_device = self._local_decode is None

        def fn(params, meta, cache, samp, tokens, positions, active, key):
            if single_device:
                # per-block preamble, hoisted above the fori_loop: INT4
                # tensors -> grouped-s4 layout (native int4 HBM reads);
                # no-op for bf16/w8a8 layouts
                from vllm_hymeta_tpu.models import common as _common
                params = _common.prepare_decode_params(params)
            S = tokens.shape[0]
            out0 = jnp.zeros((S, n_steps), jnp.int32)
            lp0 = ()
            if K > 0:
                lp0 = (jnp.zeros((S, n_steps), jnp.float32),
                       jnp.zeros((S, n_steps, K), jnp.int32),
                       jnp.zeros((S, n_steps, K), jnp.float32))

            def body(i, carry):
                tokens, positions, active, cache, samp, out, lps = carry
                ids, lp, cache, samp = one_step(
                    params, meta, cache, samp, tokens, positions, active,
                    jax.random.fold_in(key, i))
                out = out.at[:, i].set(ids)
                if K > 0:
                    lps = (lps[0].at[:, i].set(lp[0]),
                           lps[1].at[:, i].set(lp[1]),
                           lps[2].at[:, i].set(lp[2]))
                positions = positions + active.astype(jnp.int32)
                # on-device stop: the stopping token itself is emitted,
                # then the slot goes inactive for the rest of this block
                # AND any chained block (the host confirms at harvest)
                hit = jnp.any(samp["stop_ids"] == ids[:, None], axis=1)
                active = active & ~hit
                return (ids, positions, active, cache, samp, out, lps)

            (tokens, positions, active, cache, samp, out,
             lps) = jax.lax.fori_loop(
                0, n_steps, body,
                (tokens, positions, active, cache, samp, out0, lp0))
            return out, lps, cache, samp, active, positions

        self._compiled_decode = jax.jit(fn, donate_argnums=(2, 3))
        return self._compiled_decode

    # ---------------------------------------------------------- scheduling

    def _bucket_for(self, n: int) -> int:
        for b in self.ecfg.prefill_buckets:
            if n <= b:
                return b
        return self.ecfg.prefill_buckets[-1]

    def _chunk_cap(self) -> int:
        """Prefill chunk cap for this step: full-size when nothing is
        decoding, bounded while generations are in flight so their token
        stalls stay ~prefill_chunk_active/prefill_chunk of a full chunk."""
        cap = self.ecfg.prefill_chunk
        if self.ecfg.prefill_chunk_active > 0 and any(self.active):
            cap = min(cap, self.ecfg.prefill_chunk_active)
            # snap down to a compiled bucket so the capped step really is
            # cheaper (not a small n padded into a big bucket)
            fitting = [b for b in self.ecfg.prefill_buckets if b <= cap]
            cap = max(fitting) if fitting else min(self.ecfg.prefill_buckets)
        return cap

    def _start_request(self, req: Request):
        slot = self.free_slots.popleft()
        req.slot = slot
        self.slot_req[slot] = req
        self.positions[slot] = 0
        p = req.params
        fn = self._start_fn()
        stop_ids = [] if p.ignore_eos or self.cfg.eos_token_id is None \
            else [int(self.cfg.eos_token_id)]
        stop_ids += [int(t) for t in (p.stop_token_ids or [])]
        stop_ids = (stop_ids + [-1] * 4)[:4]   # device-masked subset; the
        # host enforces any beyond 4 (only chained-block compute is wasted)
        self.cache, self.samp_state = fn(
            self.cache, self.samp_state, self.meta, jnp.int32(slot),
            jnp.float32(p.temperature), jnp.int32(p.top_k),
            jnp.float32(p.top_p), jnp.float32(p.repetition_penalty),
            jnp.asarray(stop_ids, jnp.int32))
        hit = self._prefix_lookup(req.prompt)
        if hit is not None:
            key, snap = hit
            self._install_snapshot(slot, snap)
            req.prefill_done = len(key)
            self.positions[slot] = len(key)

    # --------------------------------------------------- prefix caching

    def _prefix_lookup(self, prompt: List[int]):
        """Longest cached prefix strictly shorter than the prompt."""
        if not self._prefix_cache:
            return None
        best = None
        pt = tuple(prompt)
        for key in self._prefix_cache:
            if len(key) < len(pt) and (best is None
                                       or len(key) > len(best)) \
                    and pt[:len(key)] == key:
                best = key
        if best is None:
            return None
        self._prefix_lru.remove(best)
        self._prefix_lru.append(best)
        return best, self._prefix_cache[best]

    def _maybe_snapshot_prefix(self, req: Request):
        """After a completed prefill chunk: snapshot the slot's per-layer
        state keyed by the prompt prefix processed so far."""
        if (self.ecfg.prefix_cache_size <= 0
                or req.prefill_done >= len(req.prompt)):
            return
        key = tuple(req.prompt[:req.prefill_done])
        if key in self._prefix_cache:
            return
        if self._compiled_snap_extract is None:
            self._compiled_snap_extract = jax.jit(
                lambda cache, slot: jax.tree.map(
                    lambda a: a[slot], cache["layers"]))
        snap = self._compiled_snap_extract(self.cache, jnp.int32(req.slot))
        while len(self._prefix_lru) >= self.ecfg.prefix_cache_size:
            old = self._prefix_lru.pop(0)
            del self._prefix_cache[old]
        self._prefix_cache[key] = snap
        self._prefix_lru.append(key)

    def _install_snapshot(self, slot: int, snap):
        if self._compiled_snap_install is None:
            def fn(cache, snap, slot):
                layers = jax.tree.map(
                    lambda a, b: a.at[slot].set(b), cache["layers"], snap)
                return {**cache, "layers": layers}
            self._compiled_snap_install = jax.jit(fn, donate_argnums=(0,))
        self.cache = self._compiled_snap_install(self.cache, snap,
                                                 jnp.int32(slot))

    def _finish(self, req: Request, reason: str):
        req.finished = True
        req.finish_reason = reason
        self.active[req.slot] = False
        self.free_slots.append(req.slot)
        del self.slot_req[req.slot]

    # ------------------------------------------------- decode pipelining

    def _dispatch_decode(self, tokens, positions, active=None):
        """Launch one decode block asynchronously; tokens/positions/active
        may be host arrays or device arrays from the previous block
        (chaining — eos-stopped slots stay masked on device)."""
        self.rng, k = jax.random.split(self.rng)
        fn = self._decode_fn()
        was_active = self.active.copy()
        if active is None:
            active = jnp.asarray(self.active)
        if isinstance(positions, np.ndarray):
            positions = jnp.asarray(positions.astype(np.int32))
        ids, lps, self.cache, self.samp_state, act_dev, pos_dev = fn(
            self.params, self.meta, self.cache, self.samp_state,
            jnp.asarray(tokens), positions, active, k)
        self._pending = (was_active, ids, lps, act_dev, pos_dev)

    def _can_speculate(self) -> bool:
        """True when the NEXT decode block can be dispatched before reading
        the in-flight one.  Requests stopping at eos are fine — the device
        masks their slot inactive inside the block (stop_on_eos), so a
        chained block cannot corrupt them; the host just wastes the tail of
        one block on a finished slot."""
        if self.waiting:
            return False
        B = self.ecfg.decode_block
        for req in self.slot_req.values():
            if req.prefill_done < len(req.prompt):
                return False
            if not self.active[req.slot]:
                return False
            if len(req.output) + 2 * B > req.params.max_tokens:
                return False
            if self.positions[req.slot] + 2 * B + 1 >= self.ecfg.max_model_len:
                return False
        return True

    def _harvest(self, was_active: np.ndarray, ids_dev, lps_dev,
                 finished: List[Request]):
        ids = np.asarray(ids_dev)  # [S, decode_block]; blocks until ready
        lps = tuple(np.asarray(a) for a in lps_dev) if lps_dev else None
        for slot in list(self.slot_req):
            req = self.slot_req[slot]
            if not was_active[slot]:
                continue
            for j in range(ids.shape[1]):
                self.positions[slot] += 1
                lp = None
                if lps is not None and req.params.logprobs > 0:
                    lp = (float(lps[0][slot, j]), lps[1][slot, j],
                          lps[2][slot, j])
                self._emit(req, int(ids[slot, j]), finished, lp)
                if req.finished:
                    break

    def step(self) -> List[Request]:
        """Run one engine step; returns requests finished during it."""
        finished = []

        # an in-flight decode block: chain the next one (device-side
        # tokens, no host read) when safe, THEN block on the old results —
        # the device never idles on the host round-trip
        if self._pending is not None:
            was_active, ids_dev, lps_dev, act_dev, pos_dev = self._pending
            self._pending = None
            if self._can_speculate():
                self._dispatch_decode(ids_dev[:, -1], pos_dev, act_dev)
            self._harvest(was_active, ids_dev, lps_dev, finished)
            return finished

        # admit new requests
        while self.waiting and self.free_slots:
            req = self.waiting.popleft()
            if len(req.prompt) > self.ecfg.max_model_len:
                req.finished = True
                req.finish_reason = "length_exceeded"
                finished.append(req)
                continue
            self._start_request(req)

        # pick a request with pending prefill work; alternate with decode
        # so in-flight generations aren't starved by long prompts
        # (chunked-prefill interleaving, the role of the reference's mixed
        # [prefills | decodes] batches, `meta_attention.py:612-639`)
        pending = [r for r in self.slot_req.values()
                   if r.prefill_done < len(r.prompt)]
        pre = pending[0] if pending else None

        # mixed batching: prefill chunk + one decode token per active
        # slot in ONE dispatch — no alternation, no decode stall
        # (single-device AND mesh: the mesh runs one chunk per data rank)
        if (pre is not None and self.ecfg.mixed_prefill_decode
                and any(self.active)
                and (self.mesh is None
                     or self._local_prefill_mixed_group is not None)):
            wait_n = self.ecfg.prefill_batch_wait
            if (wait_n > 1 and self.waiting
                    and len(pending) < wait_n):
                # throughput mode: let the decode block run while freed
                # slots accumulate into a full prefill batch
                pre = None
            elif self.mesh is not None:
                return self._step_mixed_mesh(pending, finished)
            else:
                return self._step_mixed(pre, finished)

        if pre is not None and self._last_was_prefill and any(self.active):
            pre = None
            self._last_was_prefill = False
        elif pre is not None:
            self._last_was_prefill = True

        # multi-request prefill: group same-bucket chunks into one step
        # (powers of two up to prefill_batch; single-device path)
        if (pre is not None and len(pending) >= 2
                and self.ecfg.prefill_batch > 1 and self.mesh is None):
            cap = self._chunk_cap()
            by_bucket: Dict[int, List[Request]] = {}
            for r in pending:
                n = min(len(r.prompt) - r.prefill_done, cap)
                by_bucket.setdefault(self._bucket_for(n), []).append(r)
            bucket, group = max(by_bucket.items(), key=lambda kv: len(kv[1]))
            if len(group) >= 2:
                B = 1
                while B * 2 <= min(len(group), self.ecfg.prefill_batch):
                    B *= 2
                group = group[:B]
                tokens = np.zeros((B, bucket), np.int32)
                slots = np.zeros((B,), np.int32)
                pos0 = np.zeros((B,), np.int32)
                nval = np.zeros((B,), np.int32)
                for b, r in enumerate(group):
                    n = min(len(r.prompt) - r.prefill_done, bucket)
                    tokens[b, :n] = r.prompt[
                        r.prefill_done:r.prefill_done + n]
                    slots[b] = r.slot
                    pos0[b] = r.prefill_done
                    nval[b] = n
                fn = self._prefill_batched_fn(bucket, B)
                self.rng, k = jax.random.split(self.rng)
                toks_dev, lp_dev, self.cache = fn(
                    self.params, self.meta, self.cache, self.samp_state,
                    jnp.asarray(tokens), jnp.asarray(slots),
                    jnp.asarray(pos0), jnp.asarray(nval), k)
                done_idx = []
                for b, r in enumerate(group):
                    r.prefill_done += int(nval[b])
                    self.positions[r.slot] = r.prefill_done
                    self._maybe_snapshot_prefix(r)
                    if r.prefill_done >= len(r.prompt):
                        done_idx.append((b, r))
                if done_idx:
                    toks = np.asarray(toks_dev)
                    lps = tuple(np.asarray(a) for a in lp_dev) \
                        if lp_dev else None
                    for b, r in done_idx:
                        lp = None
                        if lps is not None and r.params.logprobs > 0:
                            lp = (float(lps[0][b]), lps[1][b], lps[2][b])
                        self._emit(r, int(toks[b]), finished, lp)
                        if not r.finished:
                            self.active[r.slot] = True
                return finished

        # mesh path: group one pending request PER DATA RANK into a single
        # dp-grouped prefill step (each rank computes only its own chunk)
        if (pre is not None and self.mesh is not None
                and self.ecfg.prefill_batch > 1 and len(pending) >= 2):
            dp = int(self.mesh.shape["data"])
            n_local = self.ecfg.max_num_seqs // dp
            by_rank: Dict[int, Request] = {}
            for r in pending:
                by_rank.setdefault(r.slot // n_local, r)
            if dp > 1 and len(by_rank) >= 2:
                cap = self._chunk_cap()
                bucket = max(self._bucket_for(
                    min(len(r.prompt) - r.prefill_done, cap))
                    for r in by_rank.values())
                tokens = np.zeros((dp, bucket), np.int32)
                slots = np.zeros((dp,), np.int32)
                pos0 = np.zeros((dp,), np.int32)
                nval = np.zeros((dp,), np.int32)
                group = []
                for rk in range(dp):
                    r = by_rank.get(rk)
                    if r is None:
                        slots[rk] = rk * n_local   # dummy: n_valid=0 no-op
                        continue
                    n = min(len(r.prompt) - r.prefill_done, bucket)
                    tokens[rk, :n] = r.prompt[
                        r.prefill_done:r.prefill_done + n]
                    slots[rk] = r.slot
                    pos0[rk] = r.prefill_done
                    nval[rk] = n
                    group.append((rk, r))
                fn = self._prefill_group_fn(bucket)
                self.rng, k = jax.random.split(self.rng)
                toks_dev, lp_dev, self.cache = fn(
                    self.params, self.meta, self.cache, self.samp_state,
                    jnp.asarray(tokens), jnp.asarray(slots),
                    jnp.asarray(pos0), jnp.asarray(nval), k)
                toks = None
                lps = None
                for rk, r in group:
                    r.prefill_done += int(nval[rk])
                    self.positions[r.slot] = r.prefill_done
                    if r.prefill_done >= len(r.prompt):
                        if toks is None:
                            toks = np.asarray(toks_dev)
                            lps = tuple(np.asarray(a) for a in lp_dev) \
                                if lp_dev else None
                        lp = None
                        if lps is not None and r.params.logprobs > 0:
                            lp = (float(lps[0][rk]), lps[1][rk],
                                  lps[2][rk])
                        self._emit(r, int(toks[rk]), finished, lp)
                        if not r.finished:
                            self.active[r.slot] = True
                return finished

        if pre is not None:
            n_left = len(pre.prompt) - pre.prefill_done
            n = min(n_left, self._chunk_cap())
            bucket = self._bucket_for(n)
            toks = pre.prompt[pre.prefill_done:pre.prefill_done + n]
            tokens = np.zeros((bucket,), np.int32)
            tokens[:n] = toks
            fn = self._prefill_fn(bucket,
                                  final=(pre.prefill_done + n
                                         >= len(pre.prompt)))
            self.rng, k = jax.random.split(self.rng)
            tok_dev, lp_dev, self.cache = fn(
                self.params, self.meta, self.cache, self.samp_state,
                jnp.asarray(tokens), jnp.int32(pre.slot),
                jnp.int32(pre.prefill_done), jnp.int32(n), k)
            pre.prefill_done += n
            self.positions[pre.slot] = pre.prefill_done
            self._maybe_snapshot_prefix(pre)
            if pre.prefill_done >= len(pre.prompt):
                lp = None
                if lp_dev and pre.params.logprobs > 0:
                    lp = (float(np.asarray(lp_dev[0])[0]),
                          np.asarray(lp_dev[1])[0],
                          np.asarray(lp_dev[2])[0])
                self._emit(pre, int(tok_dev), finished, lp)
                if not pre.finished:
                    self.active[pre.slot] = True
            return finished

        # decode block for all active slots (decode_block tokens/dispatch);
        # results are harvested on the NEXT step so the block runs while
        # the host does its bookkeeping
        if not any(self.active):
            return finished
        S = self.ecfg.max_num_seqs
        tokens = np.zeros((S,), np.int32)
        for slot, req in self.slot_req.items():
            if self.active[slot]:
                tokens[slot] = req.output[-1]
        self._dispatch_decode(tokens, self.positions)
        return finished

    def _emit(self, req: Request, tok: int, finished: List[Request],
              lp=None):
        if req.t_first_token is None:
            req.t_first_token = time.time()
        req.output.append(tok)
        if lp is not None:
            chosen, top_ids, top_lps = lp
            req.logprobs.append(chosen)
            n = min(req.params.logprobs, len(top_ids))
            req.top_logprobs.append(
                {int(i): float(v)
                 for i, v in zip(top_ids[:n], top_lps[:n])})
        stop = False
        if (not req.params.ignore_eos) and tok == self.cfg.eos_token_id:
            stop, reason = True, "stop"
        elif req.params.stop_token_ids and tok in req.params.stop_token_ids:
            stop, reason = True, "stop"
        elif len(req.output) >= req.params.max_tokens:
            stop, reason = True, "length"
        elif self.positions[req.slot] + 1 >= self.ecfg.max_model_len:
            stop, reason = True, "length"
        if stop:
            self._finish(req, reason)
            finished.append(req)

    def cancel_request(self, req_id: int, reason: str = "stop"):
        """Finish a request early (stop-string hit, client disconnect).
        Safe between steps; an in-flight decode block's tokens for the
        slot are discarded at harvest.  Returns the request or None."""
        for req in list(self.waiting):
            if req.req_id == req_id:
                self.waiting.remove(req)
                req.finished = True
                req.finish_reason = reason
                return req
        for slot, req in list(self.slot_req.items()):
            if req.req_id == req_id:
                self._finish(req, reason)
                return req
        return None

    # ----------------------------------------------------------- generate

    def generate(self, prompts: List[List[int]],
                 params: Optional[SamplingParams] = None
                 ) -> List[Request]:
        ids = [self.add_request(p, params) for p in prompts]
        done: Dict[int, Request] = {}
        while self.has_work():
            for r in self.step():
                done[r.req_id] = r
        return [done[i] for i in ids]
