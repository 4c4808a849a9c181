"""Kernel/op unit tests against independent oracles (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vllm_hymeta_tpu.ops import gla_chunk, naive, swa
from vllm_hymeta_tpu.ops import quant_matmul, moe_gemm
from vllm_hymeta_tpu import cache as cache_lib


def _rand(key, shape, scale=0.5):
    return jax.random.normal(key, shape, jnp.float32) * scale


class TestGLA:
    @pytest.mark.parametrize("T,chunk", [(1, 128), (16, 128), (130, 64),
                                         (256, 128), (333, 128)])
    def test_chunked_matches_scan(self, T, chunk):
        key = jax.random.PRNGKey(0)
        B, H, D = 2, 3, 64
        ks = jax.random.split(key, 5)
        q, k, v = (_rand(ks[i], (B, H, T, D)) for i in range(3))
        g = -jnp.abs(_rand(ks[3], (B, H, T, D))) * 0.4
        S0 = _rand(ks[4], (B, H, D, D), 0.2)
        o1, s1 = naive.gla_scan(q, k, v, g, initial_state=S0)
        o2, s2 = gla_chunk.gla_chunked(q, k, v, g, initial_state=S0,
                                       chunk=chunk)
        np.testing.assert_allclose(o1, o2, atol=2e-4, rtol=1e-3)
        np.testing.assert_allclose(s1, s2, atol=2e-4, rtol=1e-3)

    def test_quadratic_oracle(self):
        key = jax.random.PRNGKey(1)
        B, H, T, D = 1, 2, 48, 32
        ks = jax.random.split(key, 5)
        q, k, v = (_rand(ks[i], (B, H, T, D)) for i in range(3))
        g = -jnp.abs(_rand(ks[3], (B, H, T, D))) * 0.3
        S0 = _rand(ks[4], (B, H, D, D), 0.2)
        o1, s1 = naive.gla_scan(q, k, v, g, initial_state=S0)
        o2, s2 = naive.gla_quadratic(q, k, v, g, initial_state=S0)
        np.testing.assert_allclose(o1, o2, atol=1e-4, rtol=1e-3)
        np.testing.assert_allclose(s1, s2, atol=1e-4, rtol=1e-3)

    def test_strong_decay_stability(self):
        """70B worst case: g = log(0.05) everywhere must not overflow."""
        B, H, T, D = 1, 1, 256, 32
        key = jax.random.PRNGKey(2)
        ks = jax.random.split(key, 3)
        q, k, v = (_rand(ks[i], (B, H, T, D)) for i in range(3))
        g = jnp.full((B, H, T, D), jnp.log(0.05))
        o1, s1 = naive.gla_scan(q, k, v, g)
        o2, s2 = gla_chunk.gla_chunked(q, k, v, g)
        assert np.isfinite(np.asarray(o2)).all()
        np.testing.assert_allclose(o1, o2, atol=2e-4, rtol=1e-3)
        np.testing.assert_allclose(s1, s2, atol=2e-4, rtol=1e-3)

    def test_decode_step_matches_scan(self):
        key = jax.random.PRNGKey(3)
        B, H, T, D = 3, 2, 5, 16
        ks = jax.random.split(key, 4)
        q, k, v = (_rand(ks[i], (B, H, T, D)) for i in range(3))
        g = -jnp.abs(_rand(ks[3], (B, H, T, D))) * 0.3
        o_ref, S_ref = naive.gla_scan(q, k, v, g)
        S = jnp.zeros((B, H, D, D))
        for t in range(T):
            o_t, S = naive.gla_decode_step(
                q[:, :, t], k[:, :, t], v[:, :, t], g[:, :, t], S)
            np.testing.assert_allclose(o_t, o_ref[:, :, t], atol=1e-4,
                                       rtol=1e-3)
        np.testing.assert_allclose(S, S_ref, atol=1e-4, rtol=1e-3)


class TestGates:
    def test_hymeta_gate_forms_equivalent(self):
        """The serving form g=1-(1-lb)k equals the HF form
        lb+(1-lb)(1-k) (`modeling_hymeta.py:621-625` vs
        `hf_model/linear_attention.py:153-156`)."""
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (4, 8))
        lb = jax.nn.sigmoid(jax.random.normal(key, (4, 8))) * 0.3
        s = jax.nn.sigmoid(x)
        hf = lb + (1 - lb) * (1 - s)
        serving = 1 - (1 - lb) * s
        np.testing.assert_allclose(hf, serving, atol=1e-6)

    def test_hymeta_gates_consistency(self):
        key = jax.random.PRNGKey(1)
        ks = jax.random.split(key, 3)
        q = jax.random.normal(ks[0], (5, 2, 8))
        k = jax.random.normal(ks[1], (5, 2, 8))
        qp, kp, g = naive.hymeta_gates(q, k, None)
        # g = log(1 - k') must hold
        np.testing.assert_allclose(jnp.exp(g), 1 - kp, atol=1e-6)
        assert (np.asarray(kp) <= 0.95 + 1e-6).all()
        lb = jnp.full((2, 8), 0.2)
        qp, kp, g = naive.hymeta_gates(q, k, lb)
        np.testing.assert_allclose(jnp.exp(g), 1 - kp, atol=1e-6)
        # gate never decays below the lower bound
        assert (np.asarray(jnp.exp(g)) >= 0.2 - 1e-6).all()


class TestAttention:
    def test_window_ref_matches_naive_spec(self):
        """flash_window_prefill_ref vs naive.swa_attention (independent
        formulations of the naive spec)."""
        key = jax.random.PRNGKey(0)
        T, Hq, Hkv, D, W = 60, 4, 2, 16, 10
        ks = jax.random.split(key, 3)
        q = _rand(ks[0], (T, Hq, D))
        k = _rand(ks[1], (T, Hkv, D))
        v = _rand(ks[2], (T, Hkv, D))
        pos = jnp.arange(T)
        o1, l1 = swa.flash_window_prefill_ref(q, k, v, pos, pos, W)
        o2, l2 = naive.swa_attention(q[None], k[None], v[None], pos, pos,
                                     W, False)
        np.testing.assert_allclose(o1, o2[0], atol=1e-5, rtol=1e-4)
        np.testing.assert_allclose(l1, jnp.swapaxes(l2[0], 0, 1).T
                                   if False else l2[0], atol=1e-5)

    def test_metatoken_merge_equals_joint_softmax(self):
        """Two-pass LSE merge == single softmax over [meta ∥ window] keys
        (the defining property of `fa_kernel_metatoken.py:110-122`)."""
        key = jax.random.PRNGKey(1)
        T, M, Hq, Hkv, D, W = 40, 8, 2, 1, 16, 12
        ks = jax.random.split(key, 5)
        q = _rand(ks[0], (T, Hq, D))
        k = _rand(ks[1], (T, Hkv, D))
        v = _rand(ks[2], (T, Hkv, D))
        mk = _rand(ks[3], (M, Hkv, D))
        mv = _rand(ks[4], (M, Hkv, D))
        pos = jnp.arange(T)
        # two-pass
        o1, l1 = swa.flash_window_prefill_ref(q, k, v, pos, pos, W)
        o2, l2 = swa.flash_window_prefill_ref(
            q, mk, mv, pos, jnp.zeros((M,), jnp.int32), 0, mask_mode="all")
        merged, _ = swa.merge_two(
            jnp.swapaxes(o1, 0, 1).astype(jnp.float32), l1,
            jnp.swapaxes(o2, 0, 1).astype(jnp.float32), l2)
        merged = jnp.swapaxes(merged, 0, 1)
        # joint softmax oracle
        joint, _ = naive.metatoken_swa_attention(
            q[None], k[None], v[None], mk, mv, pos, pos, W)
        np.testing.assert_allclose(merged, joint[0], atol=1e-5, rtol=1e-4)

    def test_decode_matches_prefill_ref(self):
        """Ring-buffer decode == windowed attention over the full history."""
        key = jax.random.PRNGKey(2)
        Hq, Hkv, D, W, R = 4, 2, 16, 8, 16
        T = 30
        ks = jax.random.split(key, 3)
        q_all = _rand(ks[0], (T, Hq, D))
        k_all = _rand(ks[1], (T, Hkv, D))
        v_all = _rand(ks[2], (T, Hkv, D))
        ring_k = jnp.zeros((1, Hkv, R, D))
        ring_v = jnp.zeros((1, Hkv, R, D))
        pos = jnp.arange(T)
        for t in range(T):
            lc = {"k": ring_k, "v": ring_v}
            lc = cache_lib.write_decode_kv(
                lc, k_all[t][None], v_all[t][None],
                jnp.array([t]), jnp.array([True]))
            ring_k, ring_v = lc["k"], lc["v"]
            out, lse = swa.swa_decode(q_all[t][None], ring_k, ring_v,
                                      jnp.array([t]), W)
            ref, lref = swa.flash_window_prefill_ref(
                q_all[:t + 1], k_all[:t + 1], v_all[:t + 1],
                pos[:t + 1], pos[:t + 1], W)
            np.testing.assert_allclose(out[0], ref[t], atol=1e-5, rtol=1e-4)
            np.testing.assert_allclose(lse[0], lref[:, t], atol=1e-5)

    def test_prefill_kv_write_then_chunked_continuation(self):
        """Chunked prefill: second chunk attends ring context written by the
        first chunk, matching one-shot attention over both chunks."""
        key = jax.random.PRNGKey(3)
        Hq, Hkv, D, W = 2, 1, 16, 12
        T1, T2 = 20, 14
        R = 16  # >= W
        ks = jax.random.split(key, 3)
        q = _rand(ks[0], (T1 + T2, Hq, D))
        k = _rand(ks[1], (T1 + T2, Hkv, D))
        v = _rand(ks[2], (T1 + T2, Hkv, D))
        pos = jnp.arange(T1 + T2)
        lc = {"k": jnp.zeros((1, Hkv, R, D)), "v": jnp.zeros((1, Hkv, R, D))}
        lc = cache_lib.write_prefill_kv(
            lc, jnp.int32(0), k[:T1], v[:T1], pos[:T1],
            jnp.ones((T1,), bool))
        from vllm_hymeta_tpu.models.common import gather_ring_context
        ck, cv, cpos = gather_ring_context(lc, jnp.int32(0), jnp.int32(T1))
        k_all = jnp.concatenate([ck, k[T1:]], 0)
        v_all = jnp.concatenate([cv, v[T1:]], 0)
        kp = jnp.concatenate([cpos, pos[T1:]])
        o2, _ = swa.flash_window_prefill_ref(
            q[T1:], k_all, v_all, pos[T1:], kp, W, ctx_len=R)
        ref, _ = swa.flash_window_prefill_ref(q, k, v, pos, pos, W)
        np.testing.assert_allclose(o2, ref[T1:], atol=1e-5, rtol=1e-4)


class TestQuant:
    def test_groupwise_ref(self):
        key = jax.random.PRNGKey(0)
        K, N, g = 128, 64, 32
        w = jax.random.normal(key, (K, N))
        # fake-quantize
        wq = jnp.clip(jnp.round(w * 10), -8, 7).astype(jnp.int8)
        scales = jnp.full((K // g, N), 0.1)
        zeros = jnp.zeros((K // g, N))
        x = jax.random.normal(key, (4, K))
        y = quant_matmul.groupwise_dequant_matmul_ref(x, wq, scales, zeros)
        y_ref = x @ (wq.astype(jnp.float32) * 0.1)
        np.testing.assert_allclose(y, y_ref, atol=1e-3, rtol=1e-3)

    def test_w8a8_ref_close_to_fp(self):
        key = jax.random.PRNGKey(1)
        M, K, N = 8, 64, 32
        x = jax.random.normal(key, (M, K))
        w = jax.random.normal(jax.random.PRNGKey(2), (K, N)) * 0.1
        # symmetric per-channel weight quant
        ws = jnp.max(jnp.abs(w), axis=0) / 127.0
        qw = jnp.clip(jnp.round(w / ws), -127, 127).astype(jnp.int8)
        y = quant_matmul.w8a8_matmul_ref(x, qw, ws)
        np.testing.assert_allclose(y, x @ w, atol=0.05, rtol=0.05)

    def test_kv_int8_roundtrip(self):
        key = jax.random.PRNGKey(2)
        x = jax.random.normal(key, (3, 4, 16)) * 3
        q, s = cache_lib.quantize_kv(x)
        back = q.astype(jnp.float32) * s[..., None]
        np.testing.assert_allclose(back, x, atol=3 * 2 / 127)


class TestMoE:
    def test_grouped_matches_dense(self):
        from vllm_hymeta_tpu.models.layers import moe_block
        key = jax.random.PRNGKey(0)
        E, h, I, N = 4, 16, 32, 12
        ks = jax.random.split(key, 5)
        p = {
            "gate": {"w": _rand(ks[0], (h, E))},
            "experts": {
                "gate_proj": _rand(ks[1], (E, h, I)),
                "up_proj": _rand(ks[2], (E, h, I)),
                "down_proj": _rand(ks[3], (E, I, h)),
            },
        }
        x = _rand(ks[4], (N, h))
        y1 = moe_block(p, x, top_k=1, renormalize=True)
        y2 = moe_gemm.moe_apply(p, x, top_k=1, renormalize=True)
        np.testing.assert_allclose(y1, y2, atol=1e-4, rtol=1e-3)

    def test_renormalize_top1_weight_is_one(self):
        from vllm_hymeta_tpu.models.layers import moe_block
        key = jax.random.PRNGKey(1)
        E, h, I = 4, 8, 16
        ks = jax.random.split(key, 5)
        p = {
            "gate": {"w": _rand(ks[0], (h, E))},
            "experts": {
                "gate_proj": _rand(ks[1], (E, h, I)),
                "up_proj": _rand(ks[2], (E, h, I)),
                "down_proj": _rand(ks[3], (E, I, h)),
            },
        }
        x = _rand(ks[4], (6, h))
        y_renorm = moe_block(p, x, top_k=1, renormalize=True)
        y_raw = moe_block(p, x, top_k=1, renormalize=False)
        # renormalized top-1 output must differ (weight 1.0 vs prob<1)
        assert np.abs(np.asarray(y_renorm - y_raw)).max() > 1e-6


class TestNorms:
    def test_rms_norm_residual(self):
        key = jax.random.PRNGKey(0)
        x = _rand(key, (4, 16))
        r = _rand(jax.random.PRNGKey(1), (4, 16))
        w = jnp.ones((16,)) * 1.5
        out, new_r = naive.rms_norm_residual(x, r, w)
        np.testing.assert_allclose(new_r, x + r, atol=1e-6)
        np.testing.assert_allclose(out, naive.rms_norm(x + r, w), atol=1e-6)
