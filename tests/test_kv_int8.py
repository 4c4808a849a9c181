"""INT8 KV-cache path (SURVEY.md N14: the TPU stand-in for the fp8 KV
path) and long-context ring-wraparound correctness."""

import jax
import jax.numpy as jnp
import numpy as np

from vllm_hymeta_tpu import cache as cache_lib
from vllm_hymeta_tpu.models import gla_swa
from tests.test_models import tiny_glaswa


def _cc_int8(cfg, S=2):
    return cache_lib.CacheConfig(max_num_seqs=S, max_model_len=256,
                                 kv_dtype="int8")


class TestInt8KV:
    def test_prefill_decode_close_to_bf16(self):
        cfg = tiny_glaswa()
        params = gla_swa.init_params(cfg, jax.random.PRNGKey(0),
                                     dtype=jnp.float32)
        T, G = 17, 4
        tokens = jax.random.randint(jax.random.PRNGKey(1), (T + G,), 0,
                                    cfg.vocab_size)
        full = gla_swa.forward_full(cfg, params, tokens[None])[0]

        cache = gla_swa.init_cache(cfg, _cc_int8(cfg))
        toks = jnp.zeros((32,), jnp.int32).at[:T].set(tokens[:T])
        logits, cache = gla_swa.prefill(cfg, params, cache, toks,
                                        jnp.int32(0), jnp.int32(0),
                                        jnp.int32(T))
        # int8 KV introduces ~1% noise; top-1 must broadly agree
        assert np.isfinite(np.asarray(logits)).all()
        corr = np.corrcoef(np.asarray(logits),
                           np.asarray(full[T - 1]))[0, 1]
        assert corr > 0.99

        for t in range(G):
            tok = jnp.array([tokens[T + t], 0], jnp.int32)
            pos = jnp.array([T + t, 0], jnp.int32)
            act = jnp.array([True, False])
            dl, cache = gla_swa.decode(cfg, params, cache, tok, pos, act)
            corr = np.corrcoef(np.asarray(dl[0]),
                               np.asarray(full[T + t]))[0, 1]
            assert corr > 0.99

    def test_int8_ring_roundtrip_decode(self):
        """write_decode_kv + kv_entry round-trips within int8 error."""
        S, Hkv, R, D = 2, 2, 16, 8
        cc = cache_lib.CacheConfig(max_num_seqs=S, max_model_len=64,
                                   kv_dtype="int8")
        lc = cache_lib.init_layer_kv(cc, Hkv, D, R - 1)
        k = jax.random.normal(jax.random.PRNGKey(0), (S, Hkv, D)) * 2
        v = jax.random.normal(jax.random.PRNGKey(1), (S, Hkv, D)) * 2
        lc = cache_lib.write_decode_kv(
            lc, k, v, jnp.array([3, 5]), jnp.array([True, True]))
        rk, rv = cache_lib.kv_entry(lc)
        got_k = np.asarray(rk)[np.arange(S), :, np.mod([3, 5], rk.shape[2])]
        np.testing.assert_allclose(got_k, np.asarray(k),
                                   atol=2 * 2 / 127 + 1e-3)


class TestPartialChunkRing:
    """Regression: a padded prefill chunk whose bucket exceeds the ring
    must still write its valid tokens (the overwrite-drop rule has to key
    off the last *valid* position, not the padded tail)."""

    def test_partial_chunk_bucket_exceeds_ring(self):
        # repro from the round-2 verdict (scaled to the 512-aligned ring):
        # previously wrote 0 of n_valid entries.
        Hkv, D, R, T, n_valid = 2, 8, 512, 1024, 300
        cc = cache_lib.CacheConfig(max_num_seqs=1, max_model_len=R)
        lc = cache_lib.init_layer_kv(cc, Hkv, D, R)
        k = jax.random.normal(jax.random.PRNGKey(0), (T, Hkv, D))
        v = jax.random.normal(jax.random.PRNGKey(1), (T, Hkv, D))
        positions = jnp.arange(T)          # engine pads with pos0+arange
        valid = jnp.arange(T) < n_valid
        lc = cache_lib.write_prefill_kv(lc, jnp.int32(0), k, v,
                                        positions, valid)
        got = np.asarray(lc["k"][0])       # [Hkv, R, D]
        want = np.swapaxes(np.asarray(k[:n_valid], np.float32), 0, 1)
        np.testing.assert_allclose(got[:, :n_valid].astype(np.float32),
                                   want.astype(np.float32), atol=1e-2)
        # nothing else written
        assert np.all(got[:, n_valid:] == 0)

    def test_valid_exceeds_ring_keeps_last_R(self):
        Hkv, D, R, T, n_valid = 1, 4, 512, 1024, 800
        cc = cache_lib.CacheConfig(max_num_seqs=1, max_model_len=R)
        lc = cache_lib.init_layer_kv(cc, Hkv, D, R)
        # values are position mod 200 (bf16-exact; 200 is coprime-ish with
        # R=512 so a ring-aliased position p-R carries a different value)
        vals = jnp.arange(T, dtype=jnp.float32) % 200
        k = vals[:, None, None].repeat(Hkv, 1).repeat(D, 2)
        lc = cache_lib.write_prefill_kv(lc, jnp.int32(0), k, k,
                                        jnp.arange(T),
                                        jnp.arange(T) < n_valid)
        got = np.asarray(lc["k"][0, 0, :, 0])   # ring values by index
        # the last R valid positions live at p mod R
        for p in range(n_valid - R, n_valid):
            assert got[p % R] == p % 200, (p, got[p % R])

    def test_engine_chunk_exceeds_ring_matches_small_chunk(self):
        """Engine-level: prefill_chunk > ring with a partial final chunk
        generates token-identically to a sub-ring chunk size (the shipped
        7B default is chunk 8192 > ring 4224 — this shape silently
        corrupted generations before the fix)."""
        from vllm_hymeta_tpu.engine.engine import Engine, EngineConfig
        from vllm_hymeta_tpu.engine.sampler import SamplingParams
        cfg = tiny_glaswa()                  # window_keys=9 -> ring 512
        params = gla_swa.init_params(cfg, jax.random.PRNGKey(5),
                                     dtype=jnp.float32)
        prompt = np.random.RandomState(0).randint(
            0, cfg.vocab_size, size=1324).tolist()  # final chunk n_valid=300
        sp = SamplingParams(max_tokens=8, temperature=0.0, ignore_eos=True)
        outs = []
        for chunk in (1024, 256):
            eng = Engine(cfg, params, EngineConfig(
                max_num_seqs=2, max_model_len=2048, prefill_chunk=chunk,
                prefill_buckets=(chunk,)))
            outs.append(eng.generate([prompt], sp)[0].output)
        assert outs[0] == outs[1], outs


class TestLongContext:
    def test_ring_wraparound_beyond_window(self):
        """Generate far past the window: decode attention must exactly
        match the golden full forward (windowed), proving ring overwrite
        semantics (= the HF cache roll, `hf_model/cache.py:103-111`)."""
        cfg = tiny_glaswa(sliding_window=4)  # window_keys=5, ring=128
        params = gla_swa.init_params(cfg, jax.random.PRNGKey(2),
                                     dtype=jnp.float32)
        T, G = 6, 12  # generate far beyond the window
        tokens = jax.random.randint(jax.random.PRNGKey(3), (T + G,), 0,
                                    cfg.vocab_size)
        full = gla_swa.forward_full(cfg, params, tokens[None])[0]
        cache = gla_swa.init_cache(
            cfg, cache_lib.CacheConfig(max_num_seqs=1, max_model_len=64))
        toks = jnp.zeros((16,), jnp.int32).at[:T].set(tokens[:T])
        _, cache = gla_swa.prefill(cfg, params, cache, toks, jnp.int32(0),
                                   jnp.int32(0), jnp.int32(T))
        for t in range(G):
            dl, cache = gla_swa.decode(
                cfg, params, cache, jnp.array([tokens[T + t]]),
                jnp.array([T + t]), jnp.array([True]))
            np.testing.assert_allclose(np.asarray(dl[0]),
                                       np.asarray(full[T + t]),
                                       atol=2e-3, rtol=1e-2)

    def test_small_ring_exact_window(self):
        """Ring sized exactly window_keys (no rounding slack) still
        correct across many wraparounds."""
        from vllm_hymeta_tpu.ops import swa
        Hq, Hkv, D, W = 2, 1, 8, 6
        R = 8
        key = jax.random.PRNGKey(4)
        T = 40
        ks = jax.random.split(key, 3)
        q = jax.random.normal(ks[0], (T, Hq, D))
        k = jax.random.normal(ks[1], (T, Hkv, D))
        v = jax.random.normal(ks[2], (T, Hkv, D))
        pos = jnp.arange(T)
        ring = {"k": jnp.zeros((1, Hkv, R, D)),
                "v": jnp.zeros((1, Hkv, R, D))}
        for t in range(T):
            ring = cache_lib.write_decode_kv(
                ring, k[t][None], v[t][None], jnp.array([t]),
                jnp.array([True]))
            out, _ = swa.swa_decode(q[t][None], ring["k"], ring["v"],
                                    jnp.array([t]), W)
            ref, _ = swa.flash_window_prefill_ref(
                q[t:t + 1], k[:t + 1], v[:t + 1], pos[t:t + 1],
                pos[:t + 1], W)
            np.testing.assert_allclose(np.asarray(out[0]),
                                       np.asarray(ref[0]), atol=1e-5)
