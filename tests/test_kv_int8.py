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
