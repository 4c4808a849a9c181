"""Multi-device tests on the 8-virtual-CPU mesh: sharded prefill/decode
must match the single-device path (the distributed verification the
reference never had — SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vllm_hymeta_tpu import cache as cache_lib
from vllm_hymeta_tpu.models import gla_swa, hymeta
from vllm_hymeta_tpu.parallel import make_mesh, step
from tests.test_models import tiny_glaswa, tiny_hymeta, _cc


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) >= 8, "needs 8 virtual devices"
    return make_mesh(tp=2, dp=2, devices=jax.devices()[:4])


def _run_family(cfg, model, mesh, is_hymeta):
    params = model.init_params(cfg, jax.random.PRNGKey(0),
                               dtype=jnp.float32)
    meta = model.precompute_meta(cfg, params) if is_hymeta else None
    cc = _cc(cfg, S=4)
    T, G = 13, 3
    tokens = jax.random.randint(jax.random.PRNGKey(1), (T + G,), 0,
                                cfg.vocab_size)

    # ----- single-device golden
    full = model.forward_full(cfg, params, tokens[None])[0]

    # ----- sharded serving path: prefill slot 3 (owned by data rank 1)
    cache = model.init_cache(cfg, cc)
    if is_hymeta:
        for i, lc in enumerate(cache["layers"]):
            lc["state"] = lc["state"].at[3].set(
                meta["state"][i].astype(lc["state"].dtype))
    params_s, cache_s, meta_s = step.place_all(cfg, mesh, params, cache,
                                               meta)
    pre = step.build_prefill(cfg, mesh, params, cache, meta, 16)
    dec = step.build_decode(cfg, mesh, params, cache, meta)

    toks = jnp.zeros((16,), jnp.int32).at[:T].set(tokens[:T])
    args = (params_s, meta_s, cache_s, toks, jnp.int32(3), jnp.int32(0),
            jnp.int32(T))
    logits, cache_s = pre(*args)
    np.testing.assert_allclose(np.asarray(logits),
                               np.asarray(full[T - 1]),
                               atol=3e-3, rtol=1e-2)
    for t in range(G):
        tok = jnp.zeros((4,), jnp.int32).at[3].set(tokens[T + t])
        pos = jnp.zeros((4,), jnp.int32).at[3].set(T + t)
        act = jnp.zeros((4,), bool).at[3].set(True)
        dl, cache_s = dec(params_s, meta_s, cache_s, tok, pos, act)
        np.testing.assert_allclose(np.asarray(dl[3]),
                                   np.asarray(full[T + t]),
                                   atol=3e-3, rtol=1e-2)


class TestDistributed:
    def test_glaswa_tp2_dp2(self, mesh8):
        _run_family(tiny_glaswa(), gla_swa, mesh8, False)

    def test_hymeta_tp2_dp2(self, mesh8):
        _run_family(tiny_hymeta(), hymeta, mesh8, True)

    def test_hymeta_tp4(self):
        """Pure TP over 4 devices (KV heads = 2 requires tp<=2... use
        a 4-kv-head config)."""
        cfg = tiny_hymeta(num_key_value_heads=4)
        mesh = make_mesh(tp=4, dp=1, devices=jax.devices()[:4])
        _run_family(cfg, hymeta, mesh, True)


class TestDistributedEngine:
    def test_engine_with_mesh_matches_single(self):
        """Full Engine (continuous batching, fused projections, device
        sampling) over a (data=2, model=2) mesh vs single-device."""
        from vllm_hymeta_tpu.engine.engine import Engine, EngineConfig
        from vllm_hymeta_tpu.engine.sampler import SamplingParams
        import numpy as np
        cfg = tiny_hymeta()
        params = hymeta.init_params(cfg, jax.random.PRNGKey(0),
                                    dtype=jnp.float32)
        ecfg = EngineConfig(max_num_seqs=4, max_model_len=128,
                            prefill_chunk=16, prefill_buckets=(16,),
                            decode_block=4)
        prompt = list(np.random.RandomState(0).randint(0, 256, size=11))
        sp = SamplingParams(temperature=0.0, max_tokens=5, ignore_eos=True)

        eng1 = Engine(cfg, params, ecfg)
        [r1] = eng1.generate([prompt], sp)

        mesh = make_mesh(tp=2, dp=2, devices=jax.devices()[:4])
        eng2 = Engine(cfg, params, ecfg, mesh=mesh)
        [r2] = eng2.generate([prompt], sp)
        assert len(r2.output) == 5
        # near-tie argmax flips possible between the two numeric paths —
        # verify each mesh token is near-argmax of the single-device model
        from tests.test_engine import _assert_greedy_consistent
        _assert_greedy_consistent(cfg, hymeta, params, prompt, r2.output)

    def test_engine_mesh_quantized_w8a8(self):
        """Sharded serving with quantized fused weights (generic specs)."""
        from vllm_hymeta_tpu.engine.engine import Engine, EngineConfig
        from vllm_hymeta_tpu.engine.sampler import SamplingParams
        from vllm_hymeta_tpu.quant import quantize_params_w8a8
        import numpy as np
        cfg = tiny_glaswa()
        params = gla_swa.init_params(cfg, jax.random.PRNGKey(1),
                                     dtype=jnp.float32)
        qparams = quantize_params_w8a8(params)
        ecfg = EngineConfig(max_num_seqs=2, max_model_len=128,
                            prefill_chunk=16, prefill_buckets=(16,),
                            decode_block=4)
        mesh = make_mesh(tp=2, dp=1, devices=jax.devices()[:2])
        eng = Engine(cfg, qparams, ecfg, mesh=mesh)
        prompt = list(np.random.RandomState(1).randint(0, 256, size=9))
        sp = SamplingParams(temperature=0.0, max_tokens=4, ignore_eos=True)
        [r] = eng.generate([prompt], sp)
        assert len(r.output) == 4
        from tests.test_engine import _assert_greedy_consistent
        _assert_greedy_consistent(cfg, gla_swa, qparams, prompt, r.output,
                                  tol=1e-2)

    def test_engine_mesh_int4(self):
        """INT4 packed weights under tensor parallelism (per-shard
        repacking of row-parallel tensors)."""
        from vllm_hymeta_tpu.engine.engine import Engine, EngineConfig
        from vllm_hymeta_tpu.engine.sampler import SamplingParams
        from vllm_hymeta_tpu.quant import quantize_params_gptq
        import numpy as np
        cfg = tiny_glaswa(hidden_size=128, intermediate_size=256)
        params = gla_swa.init_params(cfg, jax.random.PRNGKey(2),
                                     dtype=jnp.float32)
        from vllm_hymeta_tpu.quant import attach_prefill_int8
        qparams = attach_prefill_int8(
            quantize_params_gptq(params, bits=4, group_size=32))
        ecfg = EngineConfig(max_num_seqs=2, max_model_len=128,
                            prefill_chunk=16, prefill_buckets=(16,),
                            decode_block=4)
        mesh = make_mesh(tp=2, dp=1, devices=jax.devices()[:2])
        eng = Engine(cfg, qparams, ecfg, mesh=mesh)
        prompt = list(np.random.RandomState(2).randint(0, 256, size=9))
        sp = SamplingParams(temperature=0.0, max_tokens=3, ignore_eos=True)
        [r] = eng.generate([prompt], sp)
        assert len(r.output) == 3
        from tests.test_engine import _assert_greedy_consistent
        _assert_greedy_consistent(cfg, gla_swa, qparams, prompt, r.output,
                                  tol=1e-2)


class TestPipelineParallel:
    def _cfg_params(self):
        from tests.test_models import tiny_glaswa
        from vllm_hymeta_tpu.models import gla_swa
        cfg = tiny_glaswa(num_hidden_layers=4, hidden_size=64,
                          num_attention_heads=4, num_key_value_heads=2)
        params = gla_swa.init_params(cfg, jax.random.PRNGKey(0),
                                     dtype=jnp.float32)
        return cfg, params

    @pytest.mark.parametrize("sp", [False, True])
    def test_pp_loss_matches_golden(self, sp):
        from vllm_hymeta_tpu.parallel import make_train_mesh
        from vllm_hymeta_tpu.parallel import pipeline
        from vllm_hymeta_tpu.parallel.pctx import ParallelCtx
        from vllm_hymeta_tpu import train
        import functools
        from jax.sharding import PartitionSpec as P

        cfg, params = self._cfg_params()
        mesh = make_train_mesh(pp=2, tp=2, dp=2)
        tokens = jax.random.randint(jax.random.PRNGKey(1), (4, 32), 0,
                                    cfg.vocab_size)
        golden = train.causal_lm_loss(cfg, params, tokens)

        stacked = pipeline.stack_pairs(cfg, params)
        specs = pipeline.stacked_specs(cfg, params, stacked)
        pctx = ParallelCtx(model_axis="model", data_axis="data", sp=sp)
        lossfn = jax.shard_map(
            functools.partial(pipeline.pp_loss, cfg, n_micro=2,
                              pctx=pctx),
            mesh=mesh, in_specs=(specs, P("data")),
            out_specs=P("data"), check_vma=False)
        loss = jnp.mean(jax.jit(lossfn)(stacked, tokens))
        np.testing.assert_allclose(np.asarray(loss), np.asarray(golden),
                                   rtol=2e-4, atol=2e-4)

    def test_pp_train_step_decreases_loss(self):
        from vllm_hymeta_tpu.parallel import make_train_mesh
        from vllm_hymeta_tpu.parallel import pipeline

        cfg, params = self._cfg_params()
        mesh = make_train_mesh(pp=2, tp=2, dp=2)
        stacked, specs, jstep, opt_init = pipeline.make_pp_train_step(
            cfg, mesh, params, n_micro=2, remat=True, sp=True)
        opt_state = opt_init(stacked)
        tokens = jax.random.randint(jax.random.PRNGKey(2), (4, 32), 0,
                                    cfg.vocab_size)
        losses = []
        for _ in range(3):
            stacked, opt_state, loss = jstep(stacked, opt_state, tokens)
            losses.append(float(loss))
        assert losses[-1] < losses[0], losses

    def test_stack_unstack_roundtrip(self):
        from vllm_hymeta_tpu.parallel import pipeline
        cfg, params = self._cfg_params()
        stacked = pipeline.stack_pairs(cfg, params)
        back = pipeline.unstack_pairs(cfg, stacked)
        flat_a = jax.tree.leaves(params)
        flat_b = jax.tree.leaves(back)
        assert len(flat_a) == len(flat_b)
        for a, b in zip(flat_a, flat_b):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestGroupedMeshPrefill:
    def test_dp_grouped_prefill_matches_single(self):
        """Two concurrent requests on a (data=2, model=2) mesh must go
        through the dp-grouped prefill (one chunk per rank in one step)
        and emit the same greedy tokens as single-device."""
        from vllm_hymeta_tpu.engine.engine import Engine, EngineConfig
        from vllm_hymeta_tpu.engine.sampler import SamplingParams
        import numpy as np
        cfg = tiny_glaswa()
        params = gla_swa.init_params(cfg, jax.random.PRNGKey(3),
                                     dtype=jnp.float32)
        ecfg = EngineConfig(max_num_seqs=4, max_model_len=128,
                            prefill_chunk=16, prefill_buckets=(16,),
                            decode_block=2)
        rs = np.random.RandomState(3)
        prompts = [list(rs.randint(0, 256, size=n)) for n in (11, 9)]
        sp = SamplingParams(temperature=0.0, max_tokens=4, ignore_eos=True)

        eng1 = Engine(cfg, params, ecfg)
        base = [r.output for r in eng1.generate(prompts, sp)]

        mesh = make_mesh(tp=2, dp=2, devices=jax.devices()[:4])
        eng2 = Engine(cfg, params, ecfg, mesh=mesh)
        grouped = []
        orig = eng2._prefill_group_fn

        def spy(bucket):
            grouped.append(bucket)
            return orig(bucket)
        eng2._prefill_group_fn = spy
        outs = [r.output for r in eng2.generate(prompts, sp)]
        assert grouped, "dp-grouped prefill was not used"
        # slots must have landed on different ranks
        assert base == outs, (base, outs)

    def test_grouped_prefill_hymeta_mesh(self):
        from vllm_hymeta_tpu.engine.engine import Engine, EngineConfig
        from vllm_hymeta_tpu.engine.sampler import SamplingParams
        import numpy as np
        cfg = tiny_hymeta()
        params = hymeta.init_params(cfg, jax.random.PRNGKey(4),
                                    dtype=jnp.float32)
        ecfg = EngineConfig(max_num_seqs=4, max_model_len=128,
                            prefill_chunk=16, prefill_buckets=(16,),
                            decode_block=2)
        rs = np.random.RandomState(4)
        prompts = [list(rs.randint(0, 256, size=n)) for n in (10, 8)]
        sp = SamplingParams(temperature=0.0, max_tokens=3, ignore_eos=True)
        eng1 = Engine(cfg, params, ecfg)
        base = [r.output for r in eng1.generate(prompts, sp)]
        mesh = make_mesh(tp=2, dp=2, devices=jax.devices()[:4])
        eng2 = Engine(cfg, params, ecfg, mesh=mesh)
        outs = [r.output for r in eng2.generate(prompts, sp)]
        assert base == outs, (base, outs)


class TestSplitPrefill:
    """Split-T prefill: one request's chunk token-sharded over the data
    ranks (VERDICT r3 item 6 — the single-long-prompt mesh path)."""

    def test_split_prefill_matches_full(self, mesh8):
        """Two chunks (the second rides ring context + a carried GLA
        state) through prefill_split must reproduce forward_full."""
        cfg = tiny_glaswa()
        params = gla_swa.init_params(cfg, jax.random.PRNGKey(5),
                                     dtype=jnp.float32)
        cc = _cc(cfg, S=4)
        T1, T2 = 16, 16
        T = T1 + T2
        tokens = jax.random.randint(jax.random.PRNGKey(6), (T,), 0,
                                    cfg.vocab_size)
        full = gla_swa.forward_full(cfg, params, tokens[None])[0]

        cache = gla_swa.init_cache(cfg, cc)
        params_s, cache_s, _ = step.place_all(cfg, mesh8, params, cache,
                                              None)
        pre = jax.jit(step.make_local_prefill_split(
            cfg, mesh8, params, cache, None), donate_argnums=(2,))
        # chunk 1: 16 tokens, slot 3 (data rank 1), 13 valid
        logits, cache_s = pre(params_s, None, cache_s, tokens[:T1],
                              jnp.int32(3), jnp.int32(0), jnp.int32(13))
        np.testing.assert_allclose(np.asarray(logits),
                                   np.asarray(full[12]),
                                   atol=3e-3, rtol=1e-2)
        # chunk 2: the next 16 tokens starting at position 13
        toks2 = tokens[13:13 + T2]
        logits, cache_s = pre(params_s, None, cache_s, toks2,
                              jnp.int32(3), jnp.int32(13),
                              jnp.int32(T2))
        np.testing.assert_allclose(np.asarray(logits),
                                   np.asarray(full[13 + T2 - 1]),
                                   atol=3e-3, rtol=1e-2)

    def test_engine_single_prompt_uses_split(self):
        """One long prompt on a (data=2, model=2) mesh must take the
        split-T prefill path and emit the same greedy tokens as the
        single-device engine."""
        from vllm_hymeta_tpu.engine.engine import Engine, EngineConfig
        from vllm_hymeta_tpu.engine.sampler import SamplingParams
        cfg = tiny_glaswa()
        params = gla_swa.init_params(cfg, jax.random.PRNGKey(7),
                                     dtype=jnp.float32)
        ecfg = EngineConfig(max_num_seqs=4, max_model_len=128,
                            prefill_chunk=16, prefill_buckets=(16,),
                            decode_block=2)
        rs = np.random.RandomState(7)
        prompt = list(rs.randint(0, 256, size=45))
        sp = SamplingParams(temperature=0.0, max_tokens=6,
                            ignore_eos=True)

        eng1 = Engine(cfg, params, ecfg)
        base = eng1.generate([prompt], sp)[0].output

        mesh = make_mesh(tp=2, dp=2, devices=jax.devices()[:4])
        eng2 = Engine(cfg, params, ecfg, mesh=mesh)
        assert eng2._local_prefill_split is not None
        used = []
        orig = eng2._prefill_fn

        def spy(bucket, final=True):
            used.append((bucket, final))
            return orig(bucket, final)
        eng2._prefill_fn = spy
        out = eng2.generate([prompt], sp)[0].output
        assert used, "single-request prefill path was not used"
        assert base == out, (base, out)

    def test_split_prefill_hymeta_matches_full(self, mesh8):
        """70B family: two split chunks (ring ctx + meta-seeded GLA state
        + a global layer) must reproduce forward_full."""
        cfg = tiny_hymeta()
        params = hymeta.init_params(cfg, jax.random.PRNGKey(8),
                                    dtype=jnp.float32)
        meta = hymeta.precompute_meta(cfg, params)
        cc = _cc(cfg, S=4)
        T1, T2 = 16, 16
        tokens = jax.random.randint(jax.random.PRNGKey(9), (T1 + T2,), 0,
                                    cfg.vocab_size)
        full = hymeta.forward_full(cfg, params, tokens[None])[0]

        cache = hymeta.init_cache(cfg, cc)
        for i, lc in enumerate(cache["layers"]):
            lc["state"] = lc["state"].at[3].set(
                meta["state"][i].astype(lc["state"].dtype))
        params_s, cache_s, meta_s = step.place_all(cfg, mesh8, params,
                                                   cache, meta)
        pre = jax.jit(step.make_local_prefill_split(
            cfg, mesh8, params, cache, meta), donate_argnums=(2,))
        logits, cache_s = pre(params_s, meta_s, cache_s, tokens[:T1],
                              jnp.int32(3), jnp.int32(0), jnp.int32(13))
        np.testing.assert_allclose(np.asarray(logits),
                                   np.asarray(full[12]),
                                   atol=3e-3, rtol=1e-2)
        toks2 = tokens[13:13 + T2]
        logits, cache_s = pre(params_s, meta_s, cache_s, toks2,
                              jnp.int32(3), jnp.int32(13), jnp.int32(T2))
        np.testing.assert_allclose(np.asarray(logits),
                                   np.asarray(full[13 + T2 - 1]),
                                   atol=3e-3, rtol=1e-2)

    def test_engine_non_divisible_bucket_falls_back(self):
        """A bucket that does not divide by dp must route to the
        replicated owner-masked prefill (not crash, not mis-shard) and
        still match the single-device engine (VERDICT r4 weak #6)."""
        from vllm_hymeta_tpu.engine.engine import Engine, EngineConfig
        from vllm_hymeta_tpu.engine.sampler import SamplingParams
        cfg = tiny_glaswa()
        params = gla_swa.init_params(cfg, jax.random.PRNGKey(11),
                                     dtype=jnp.float32)
        # bucket 18 with dp=4: 18 % 4 != 0 -> replicated fallback
        ecfg = EngineConfig(max_num_seqs=4, max_model_len=128,
                            prefill_chunk=18, prefill_buckets=(18,),
                            decode_block=2)
        rs = np.random.RandomState(11)
        prompt = list(rs.randint(0, 256, size=39))
        sp = SamplingParams(temperature=0.0, max_tokens=5,
                            ignore_eos=True)
        base = Engine(cfg, params, ecfg).generate([prompt], sp)[0].output
        mesh = make_mesh(tp=2, dp=4, devices=jax.devices()[:8])
        eng = Engine(cfg, params, ecfg, mesh=mesh)
        assert eng._local_prefill_split is not None
        out = eng.generate([prompt], sp)[0].output
        assert base == out, (base, out)


class TestMeshMixed:
    """Mesh mixed batching (VERDICT r4 item 3): prefill chunk(s) per data
    rank + the sharded decode batch in ONE shard_map dispatch must match
    the single-device alternating scheduler token-for-token (greedy)."""

    def _run(self, cfg, model, params, mesh, mixed: bool):
        from vllm_hymeta_tpu.engine.engine import Engine, EngineConfig
        from vllm_hymeta_tpu.engine.sampler import SamplingParams
        ecfg = EngineConfig(max_num_seqs=4, max_model_len=128,
                            prefill_chunk=16, prefill_buckets=(16,),
                            decode_block=2, mixed_prefill_decode=mixed)
        eng = Engine(cfg, params, ecfg, mesh=mesh)
        used_mixed = []
        if mesh is not None and mixed:
            orig = eng._prefill_mixed_group_fn

            def spy(bucket):
                used_mixed.append(bucket)
                return orig(bucket)
            eng._prefill_mixed_group_fn = spy
        sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)
        rs = np.random.RandomState(7)
        p0 = list(rs.randint(0, cfg.vocab_size, size=12))
        later = [list(rs.randint(0, cfg.vocab_size, size=n))
                 for n in (14, 30)]
        r0 = eng.add_request(p0, sp)
        while not any(eng.active):
            eng.step()
        rids = [eng.add_request(p, sp) for p in later]
        done = {}
        while eng.has_work():
            for r in eng.step():
                done[r.req_id] = r
        if mesh is not None and mixed:
            assert used_mixed, "mesh mixed step was not used"
        return [done[i].output for i in [r0] + rids]

    @pytest.mark.parametrize("family", ["glaswa", "hymeta"])
    def test_mesh_mixed_matches_mesh_alternating(self, family, mesh8):
        """Same mesh numeric path, mixed scheduler vs alternating — must
        be token-identical (isolates the scheduler change; mesh-vs-single
        numeric parity is covered by TestDistributedEngine)."""
        if family == "glaswa":
            cfg = tiny_glaswa()
            model = gla_swa
        else:
            cfg = tiny_hymeta()
            model = hymeta
        params = model.init_params(cfg, jax.random.PRNGKey(21),
                                   dtype=jnp.float32)
        a = self._run(cfg, model, params, mesh8, mixed=False)
        b = self._run(cfg, model, params, mesh8, mixed=True)
        assert a == b


class TestMeshPrefixCache:
    """The cross-request prefix cache must work under a mesh: second
    request sharing a prefix skips the cached chunks and still matches."""

    def test_prefix_cache_mesh_matches(self, mesh8):
        from vllm_hymeta_tpu.engine.engine import Engine, EngineConfig
        from vllm_hymeta_tpu.engine.sampler import SamplingParams
        cfg = tiny_glaswa()
        params = gla_swa.init_params(cfg, jax.random.PRNGKey(22),
                                     dtype=jnp.float32)
        rs = np.random.RandomState(9)
        prefix = list(rs.randint(0, cfg.vocab_size, size=32))
        tail_a = list(rs.randint(0, cfg.vocab_size, size=7))
        tail_b = list(rs.randint(0, cfg.vocab_size, size=5))
        sp = SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True)

        def run(cache_size):
            ecfg = EngineConfig(max_num_seqs=4, max_model_len=128,
                                prefill_chunk=16, prefill_buckets=(16,),
                                decode_block=2,
                                prefix_cache_size=cache_size)
            eng = Engine(cfg, params, ecfg, mesh=mesh8)
            [ra] = eng.generate([prefix + tail_a], sp)
            # second request: prefix chunks should come from the cache
            hit_before = len(eng._prefix_cache)
            [rb] = eng.generate([prefix + tail_b], sp)
            return ra.output, rb.output, hit_before

        oa1, ob1, _ = run(0)
        oa2, ob2, ncache = run(4)
        assert ncache > 0, "no prefix snapshots were taken"
        assert oa1 == oa2
        assert ob1 == ob2


class TestMoEEPA2A:
    """EP via ragged_all_to_all dispatch (ops/moe_gemm.moe_apply_ep_a2a)
    must match both the dense single-device reference (moe_block) and the
    replicated-psum EP path (moe_apply + psum) bit-for-meaningful-bits."""

    def _setup(self, E=8, h=64, inner=96, N=32, k=2, seed=0):
        keys = jax.random.split(jax.random.PRNGKey(seed), 5)
        p = {
            "gate": {"w": jax.random.normal(keys[0], (h, E),
                                            jnp.float32) * 0.1},
            "experts": {
                "gate_proj": jax.random.normal(keys[1], (E, h, inner),
                                               jnp.float32) * 0.05,
                "up_proj": jax.random.normal(keys[2], (E, h, inner),
                                             jnp.float32) * 0.05,
                "down_proj": jax.random.normal(keys[3], (E, inner, h),
                                               jnp.float32) * 0.05,
            },
        }
        x = jax.random.normal(keys[4], (N, h), jnp.float32)
        return p, x

    @pytest.mark.parametrize("k", [1, 2])
    def test_a2a_matches_dense_and_psum(self, k):
        from vllm_hymeta_tpu.models.layers import moe_block
        from vllm_hymeta_tpu.ops import moe_gemm
        from jax.sharding import PartitionSpec as P
        E, N, ep = 8, 32, 4
        p, x = self._setup(E=E, N=N, k=k)
        ref = moe_block(p, x, k, True)

        mesh = jax.sharding.Mesh(
            np.array(jax.devices()[:ep]).reshape(ep), ("model",))
        espec = {"gate": {"w": P()},
                 "experts": {"gate_proj": P("model"),
                             "up_proj": P("model"),
                             "down_proj": P("model")}}

        def local_a2a(p_l, x_l):
            return moe_gemm.moe_apply_ep_a2a(
                p_l, x_l, top_k=k, renormalize=True,
                axis_name="model", num_global_experts=E)

        got_a2a = jax.jit(jax.shard_map(
            local_a2a, mesh=mesh, in_specs=(espec, P("model")),
            out_specs=P("model"), check_vma=False))(p, x)

        def local_psum(p_l, x_l):
            e_local = p_l["experts"]["gate_proj"].shape[0]
            y = moe_gemm.moe_apply(
                p_l, x_l, top_k=k, renormalize=True,
                expert_offset=jax.lax.axis_index("model") * e_local,
                num_global_experts=E)
            return jax.lax.psum(y, "model")

        got_psum = jax.jit(jax.shard_map(
            local_psum, mesh=mesh, in_specs=(espec, P()),
            out_specs=P(), check_vma=False))(p, x)

        np.testing.assert_allclose(np.asarray(got_a2a), np.asarray(ref),
                                   atol=2e-5, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(got_a2a),
                                   np.asarray(got_psum),
                                   atol=2e-5, rtol=1e-4)

    def test_ffn_ep_a2a_matches_default(self, mesh8):
        """_ffn with ParallelCtx(ep_a2a=True) must match the psum path on
        a real MoE layer's params."""
        from vllm_hymeta_tpu.parallel.pctx import ParallelCtx
        from vllm_hymeta_tpu.parallel import sharding as shd
        from jax.sharding import PartitionSpec as P
        cfg = tiny_hymeta()
        params = hymeta.init_params(cfg, jax.random.PRNGKey(3),
                                    dtype=jnp.float32)
        moe_layers = [lp for lp in params["layers"] if "moe" in lp]
        lp = moe_layers[0]
        x = jax.random.normal(jax.random.PRNGKey(4), (16, cfg.hidden_size),
                              jnp.float32)
        lspec = shd.param_specs(cfg, {"layers": [lp]})["layers"][0]

        def run(ep_a2a):
            pctx = ParallelCtx(model_axis="model", ep_a2a=ep_a2a)

            def local(lp_l, x_l):
                return hymeta._ffn(cfg, lp_l, x_l, pctx=pctx)

            return jax.jit(jax.shard_map(
                local, mesh=mesh8, in_specs=(lspec, P()),
                out_specs=P(), check_vma=False))(lp, x)

        a = run(False)
        b = run(True)
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=2e-5, rtol=1e-4)
