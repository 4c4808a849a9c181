"""On-hardware parity tests for the Pallas kernels.

The rest of the suite runs on virtual CPU devices where every dispatcher
falls back to its jnp reference — which is exactly how a TPU-only kernel
bug (e.g. an out-of-bounds reduction tile) can hide.  This module runs the
REAL kernels against the references on the chip.

Run with:  TESTS_ON_TPU=1 python -m pytest tests/test_tpu_kernels.py -q
(skipped automatically when no TPU backend is available / env not set).
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.skipif(
    os.environ.get("TESTS_ON_TPU") != "1"
    or jax.default_backend() not in ("tpu", "axon"),
    reason="needs TESTS_ON_TPU=1 and a TPU backend")


def _rms(a, b):
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    return float(np.sqrt(np.mean((a - b) ** 2)) /
                 (np.sqrt(np.mean(b ** 2)) + 1e-9))


# the 7B decode/prefill matmul shapes, including the non-dividing K=18944
W8A8_SHAPES = [(1, 3584, 4608), (1, 18944, 3584), (8, 3584, 37888 // 2),
               (1, 3584, 18944), (4096, 3584, 4608), (16, 4608, 3584)]


@pytest.mark.parametrize("M,K,N", W8A8_SHAPES)
def test_w8a8_matmul_matches_ref(M, K, N):
    from vllm_hymeta_tpu.ops import quant_matmul as qm
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (M, K), jnp.bfloat16)
    qw = jax.random.randint(key, (K, N), -127, 127, jnp.int8)
    ws = jnp.full((N,), 3e-4, jnp.float32)
    out = np.asarray(qm.w8a8_matmul(x, qw, ws))
    ref = np.asarray(qm.w8a8_matmul_ref(x, qw, ws))
    assert np.isfinite(out).all()
    assert _rms(out, ref) < 2e-2, _rms(out, ref)


@pytest.mark.parametrize("M,K,N", [(1, 3584, 4608), (16, 18944, 3584),
                                   (1, 3584, 18944)])
def test_int4_matmul_matches_ref(M, K, N):
    from vllm_hymeta_tpu.ops import quant_matmul as qm
    key = jax.random.PRNGKey(1)
    x = jax.random.normal(key, (M, K), jnp.bfloat16)
    qw = jax.random.randint(key, (K, N), -8, 8, jnp.int8)
    qw4 = qm.pack_int4(qw)
    G = K // 64
    sc = jnp.full((G, N), 2e-3, jnp.bfloat16)
    zr = jnp.zeros((G, N), jnp.bfloat16)
    out = np.asarray(qm.int4_matmul(x, qw4, sc, zr))
    ref = np.asarray(qm.int4_matmul_ref(x, qw4, sc, zr))
    assert np.isfinite(out).all()
    assert _rms(out, ref) < 2e-2, _rms(out, ref)


@pytest.mark.parametrize("M,K", [(4096, 3584), (4096, 37888), (33, 4608)])
def test_quantize_rows_matches_ref(M, K):
    from vllm_hymeta_tpu.ops import quant_matmul as qm
    key = jax.random.PRNGKey(5)
    x = jax.random.normal(key, (M, K), jnp.bfloat16) * 3.0
    q, s = qm.quantize_rows(x)
    qr, sr = qm.quantize_per_token(x)
    assert _rms(s, sr) < 1e-3
    assert np.mean(np.asarray(q) != np.asarray(qr)) < 1e-2  # round ties


def test_glu_quant_matches_ref():
    from vllm_hymeta_tpu.ops import quant_matmul as qm
    key = jax.random.PRNGKey(6)
    gu = jax.random.normal(key, (512, 37888), jnp.bfloat16) * 2.0
    q, s = qm.glu_quant(gu)
    qr, sr = qm.glu_quant_ref(gu)
    assert _rms(s, sr) < 1e-3
    deq = np.asarray(q, np.float32) * np.asarray(s)
    deqr = np.asarray(qr, np.float32) * np.asarray(sr)
    assert _rms(deq, deqr) < 1e-2


def test_gla_chunked_pallas_matches_ref():
    from vllm_hymeta_tpu.ops import gla_chunk
    from vllm_hymeta_tpu.ops.gla_chunk_pallas import gla_chunked_pallas
    key = jax.random.PRNGKey(2)
    B, H, T, D = 1, 4, 512, 128
    q = jax.random.normal(key, (B, H, T, D), jnp.bfloat16)
    k = jax.random.normal(jax.random.fold_in(key, 1), (B, H, T, D),
                          jnp.bfloat16)
    v = jax.random.normal(jax.random.fold_in(key, 2), (B, H, T, D),
                          jnp.bfloat16)
    g = -jnp.abs(jax.random.normal(jax.random.fold_in(key, 3),
                                   (B, H, T, D), jnp.float32)) * 0.1
    s0 = jax.random.normal(jax.random.fold_in(key, 4), (B, H, D, D),
                           jnp.float32) * 0.05
    o_p, s_p = gla_chunked_pallas(q, k, v, g, initial_state=s0)
    o_r, s_r = gla_chunk.gla_chunked_ref(q, k, v, g, initial_state=s0)
    assert _rms(o_p, o_r) < 2e-2, _rms(o_p, o_r)
    assert _rms(s_p, s_r) < 2e-2, _rms(s_p, s_r)


def test_flash_window_prefill_matches_ref():
    from vllm_hymeta_tpu.ops import swa
    key = jax.random.PRNGKey(3)
    Tq, Hq, Hkv, D, W = 512, 4, 2, 128, 128
    ctx = 256
    q = jax.random.normal(key, (Tq, Hq, D), jnp.bfloat16)
    k = jax.random.normal(jax.random.fold_in(key, 1), (ctx + Tq, Hkv, D),
                          jnp.bfloat16)
    v = jax.random.normal(jax.random.fold_in(key, 2), (ctx + Tq, Hkv, D),
                          jnp.bfloat16)
    q_pos = ctx + jnp.arange(Tq, dtype=jnp.int32)
    k_pos = jnp.arange(ctx + Tq, dtype=jnp.int32)
    out, lse = swa.flash_window_prefill(q, k, v, q_pos, k_pos, W,
                                        ctx_len=ctx)
    ref, lref = swa.flash_window_prefill_ref(q, k, v, q_pos, k_pos, W, ctx)
    assert _rms(out, ref) < 2e-2
    assert _rms(lse, lref) < 2e-2

    # causal (global-layer) mode
    out, lse = swa.flash_window_prefill(q, k, v, q_pos, k_pos, 0,
                                        ctx_len=ctx, mask_mode="causal")
    ref, lref = swa.flash_window_prefill_ref(q, k, v, q_pos, k_pos, 0,
                                             ctx, mask_mode="causal")
    assert _rms(out, ref) < 2e-2
    assert _rms(lse, lref) < 2e-2

    # first-chunk shape: invalid (unwritten) context + padded chunk tail
    n_valid = 300
    q_pos2 = jnp.where(jnp.arange(Tq) < n_valid,
                       jnp.arange(Tq, dtype=jnp.int32), swa.INVALID_POS)
    k_pos2 = jnp.concatenate(
        [jnp.full((ctx,), swa.INVALID_POS, jnp.int32), q_pos2])
    out, lse = swa.flash_window_prefill(q, k, v, q_pos2, k_pos2, W,
                                        ctx_len=ctx)
    ref, lref = swa.flash_window_prefill_ref(q, k, v, q_pos2, k_pos2, W, ctx)
    assert _rms(out[:n_valid], ref[:n_valid]) < 2e-2
    assert _rms(lse[:, :n_valid], lref[:, :n_valid]) < 2e-2


def test_fused_decode_attention_matches_ref():
    from vllm_hymeta_tpu.ops import swa
    from vllm_hymeta_tpu.ops.swa_decode_pallas import \
        fused_decode_attention_pallas
    key = jax.random.PRNGKey(4)
    S, Hq, Hkv, D, R = 4, 4, 2, 128, 2048
    W = 1024
    q = jax.random.normal(key, (S, Hq, D), jnp.bfloat16)
    rk = jax.random.normal(jax.random.fold_in(key, 1), (S, Hkv, R, D),
                           jnp.bfloat16)
    rv = jax.random.normal(jax.random.fold_in(key, 2), (S, Hkv, R, D),
                           jnp.bfloat16)
    positions = jnp.array([5, 900, 2047, 4000], jnp.int32)
    out = fused_decode_attention_pallas(q, rk, rv, positions, W)
    ref, _ = swa.swa_decode(q, rk, rv, positions, W)
    assert _rms(out, ref.astype(out.dtype)) < 2e-2

    # non-power-of-two ring (the 7B serving shape: 4097 -> 4224 = 33*128)
    from vllm_hymeta_tpu.ops.swa_decode_pallas import fused_decode_attention
    R2, W2 = 4224, 4097
    rk2 = jax.random.normal(jax.random.fold_in(key, 3), (S, Hkv, R2, D),
                            jnp.bfloat16)
    rv2 = jax.random.normal(jax.random.fold_in(key, 4), (S, Hkv, R2, D),
                            jnp.bfloat16)
    pos2 = jnp.array([3, 4223, 9000, 32000], jnp.int32)
    out2 = fused_decode_attention(q, rk2, rv2, pos2, W2)
    ref2, _ = swa.swa_decode(q, rk2, rv2, pos2, W2)
    assert _rms(out2, ref2.astype(out2.dtype)) < 2e-2


def test_fused_decode_attention_int8_ring():
    """INT8 ring entries with per-(head,position) scales dequantized
    in-kernel match the dequantize-then-attend reference."""
    from vllm_hymeta_tpu import cache as cache_lib
    from vllm_hymeta_tpu.ops import swa
    from vllm_hymeta_tpu.ops.swa_decode_pallas import fused_decode_attention
    key = jax.random.PRNGKey(11)
    S, Hq, Hkv, D, R, W = 4, 4, 2, 128, 2048, 1024
    q = jax.random.normal(key, (S, Hq, D), jnp.bfloat16)
    rk = jax.random.normal(jax.random.fold_in(key, 1), (S, Hkv, R, D),
                           jnp.bfloat16)
    rv = jax.random.normal(jax.random.fold_in(key, 2), (S, Hkv, R, D),
                           jnp.bfloat16)
    qk, ks = cache_lib.quantize_kv(rk)
    qv, vs = cache_lib.quantize_kv(rv)
    positions = jnp.array([5, 900, 2047, 4000], jnp.int32)
    out = fused_decode_attention(q, qk, qv, positions, W,
                                 k_scale=ks, v_scale=vs)
    dk = qk.astype(jnp.bfloat16) * ks[..., None].astype(jnp.bfloat16)
    dv = qv.astype(jnp.bfloat16) * vs[..., None].astype(jnp.bfloat16)
    ref, _ = swa.swa_decode(q, dk, dv, positions, W)
    assert _rms(out, ref.astype(out.dtype)) < 2e-2


def test_fused_decode_attention_int8_ring_with_meta():
    """INT8 ring + metatoken block folded into j==0 — the exact shape the
    hymeta decode path dispatches (models/hymeta.py decode with a
    quantized ring)."""
    from vllm_hymeta_tpu import cache as cache_lib
    from vllm_hymeta_tpu.ops import swa
    from vllm_hymeta_tpu.ops.swa_decode_pallas import fused_decode_attention
    key = jax.random.PRNGKey(12)
    S, Hq, Hkv, D, R, W, M = 4, 4, 2, 128, 2048, 1024, 128
    q = jax.random.normal(key, (S, Hq, D), jnp.bfloat16)
    rk = jax.random.normal(jax.random.fold_in(key, 1), (S, Hkv, R, D),
                           jnp.bfloat16)
    rv = jax.random.normal(jax.random.fold_in(key, 2), (S, Hkv, R, D),
                           jnp.bfloat16)
    mk = jax.random.normal(jax.random.fold_in(key, 3), (M, Hkv, D),
                           jnp.bfloat16)
    mv = jax.random.normal(jax.random.fold_in(key, 4), (M, Hkv, D),
                           jnp.bfloat16)
    qk, ks = cache_lib.quantize_kv(rk)
    qv, vs = cache_lib.quantize_kv(rv)
    positions = jnp.array([5, 900, 2047, 4000], jnp.int32)
    out = fused_decode_attention(q, qk, qv, positions, W,
                                 meta_k=mk, meta_v=mv,
                                 k_scale=ks, v_scale=vs)
    dk = qk.astype(jnp.bfloat16) * ks[..., None].astype(jnp.bfloat16)
    dv = qv.astype(jnp.bfloat16) * vs[..., None].astype(jnp.bfloat16)
    o1, l1 = swa.swa_decode(q, dk, dv, positions, W)
    o2, l2 = swa.meta_decode(q, mk, mv)
    ref, _ = swa.merge_two(o1, l1, o2, l2)
    assert _rms(out, ref.astype(out.dtype)) < 2e-2


# ---------------------------------------------------------------------------
# on-chip model consistency: serving path (real kernels) vs golden forward
# ---------------------------------------------------------------------------

def _logits_close(a, b, tol=3e-2):
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    denom = np.sqrt(np.mean(b ** 2)) + 1e-9
    return np.sqrt(np.mean((a - b) ** 2)) / denom < tol


def test_glaswa_serving_matches_full_on_tpu():
    """Native-width (D=128) GLAswa: prefill+decode with the Pallas kernels
    must track the golden full forward — the on-hardware analogue of
    tests/test_models.py (which runs on CPU reference ops)."""
    from vllm_hymeta_tpu import cache as cache_lib
    from vllm_hymeta_tpu.config import GLAswaConfig
    from vllm_hymeta_tpu.models import gla_swa
    cfg = GLAswaConfig(vocab_size=1024, hidden_size=512,
                       num_hidden_layers=4, num_attention_heads=4,
                       num_key_value_heads=2, intermediate_size=1024,
                       sliding_window=1023, max_position_embeddings=4096)
    assert cfg.head_dim == 128
    params = gla_swa.init_params(cfg, jax.random.PRNGKey(0),
                                 dtype=jnp.bfloat16)
    T, G = 700, 4
    tokens = jax.random.randint(jax.random.PRNGKey(1), (T + G,), 0,
                                cfg.vocab_size)
    full = gla_swa.forward_full(cfg, params, tokens[None])[0]

    cc = cache_lib.CacheConfig(max_num_seqs=2, max_model_len=2048)
    cache = gla_swa.init_cache(cfg, cc)
    pad = 768
    toks = jnp.zeros((pad,), jnp.int32).at[:T].set(tokens[:T])
    logits, cache = gla_swa.prefill(cfg, params, cache, toks,
                                    jnp.int32(0), jnp.int32(0),
                                    jnp.int32(T))
    assert _logits_close(logits, full[T - 1])
    for t in range(G):
        tok = jnp.array([tokens[T + t], 0], jnp.int32)
        pos = jnp.array([T + t, 0], jnp.int32)
        act = jnp.array([True, False])
        dl, cache = gla_swa.decode(cfg, params, cache, tok, pos, act)
        assert _logits_close(dl[0], full[T + t]), t


def test_hymeta_serving_matches_full_on_tpu():
    """Native-width Hymeta (metatokens + MoE + hybrid branches) on chip."""
    from vllm_hymeta_tpu import cache as cache_lib
    from vllm_hymeta_tpu.config import HymetaConfig
    from vllm_hymeta_tpu.models import hymeta
    cfg = HymetaConfig(vocab_size=1024, hidden_size=512,
                       num_hidden_layers=4, num_attention_heads=4,
                       num_key_value_heads=2, intermediate_size=1024,
                       sliding_window=1023, max_position_embeddings=4096,
                       num_meta_tokens=128, num_local_experts=4,
                       shared_intermediate_size=512,
                       full_attn_layers=[2], dense_mlp_layers=[0])
    assert cfg.head_dim == 128
    params = hymeta.init_params(cfg, jax.random.PRNGKey(0),
                                dtype=jnp.bfloat16)
    meta = hymeta.precompute_meta(cfg, params)
    T, G = 500, 3
    tokens = jax.random.randint(jax.random.PRNGKey(1), (T + G,), 0,
                                cfg.vocab_size)
    full = hymeta.forward_full(cfg, params, tokens[None])[0]

    cc = cache_lib.CacheConfig(max_num_seqs=2, max_model_len=2048)
    cache = hymeta.init_cache(cfg, cc)
    for i, lc in enumerate(cache["layers"]):
        cache["layers"][i]["state"] = lc["state"].at[:].set(
            meta["state"][i].astype(lc["state"].dtype))
    pad = 512
    toks = jnp.zeros((pad,), jnp.int32).at[:T].set(tokens[:T])
    logits, cache = hymeta.prefill(cfg, params, meta, cache, toks,
                                   jnp.int32(0), jnp.int32(0),
                                   jnp.int32(T))
    assert _logits_close(logits, full[T - 1])
    for t in range(G):
        tok = jnp.array([tokens[T + t], 0], jnp.int32)
        pos = jnp.array([T + t, 0], jnp.int32)
        act = jnp.array([True, False])
        dl, cache = hymeta.decode(cfg, params, meta, cache, tok, pos, act)
        assert _logits_close(dl[0], full[T + t]), t


def test_train_window_attention_matches_naive():
    """Differentiable splash training path: forward parity with the naive
    reference, with and without a metatoken block."""
    from vllm_hymeta_tpu.ops import naive, swa
    key = jax.random.PRNGKey(20)
    B, T, Hq, Hkv, D, M = 2, 512, 4, 2, 128, 128
    wk = 257  # window_keys
    q = jax.random.normal(key, (B, M + T, Hq, D), jnp.bfloat16)
    k = jax.random.normal(jax.random.fold_in(key, 1), (B, M + T, Hkv, D),
                          jnp.bfloat16)
    v = jax.random.normal(jax.random.fold_in(key, 2), (B, M + T, Hkv, D),
                          jnp.bfloat16)
    # metatoken rows are shared across the batch in real use (they come
    # from the weights) — the naive reference below relies on that
    q = q.at[:, :M].set(q[0, :M])
    k = k.at[:, :M].set(k[0, :M])
    v = v.at[:, :M].set(v[0, :M])
    pos = jnp.arange(M + T, dtype=jnp.int32)

    # plain windowed (gla_swa layer_forward shape)
    out = swa.train_window_attention(q, k, v, wk)
    ref, _ = naive.swa_attention(q, k, v, pos, pos, wk - 1, True)
    assert _rms(out, ref) < 2e-2, _rms(out, ref)

    # with metatoken column (hymeta forward_full shape)
    out2 = swa.train_window_attention(q, k, v, wk, num_meta=M)
    r_real, r_meta = naive.metatoken_swa_attention(
        q[:, M:], k[:, M:], v[:, M:], k[0, :M], v[0, :M],
        pos[M:], pos[M:], wk, False, meta_q=q[0, :M])
    ref2 = jnp.concatenate(
        [jnp.broadcast_to(r_meta[None], (B, M, Hq, D)), r_real], axis=1)
    assert _rms(out2, ref2.astype(jnp.float32)) < 2e-2, _rms(out2, ref2)

    # causal (window_keys == 0) mode for full-attn layers
    out3 = swa.train_window_attention(q, k, v, 0, num_meta=M)
    assert np.isfinite(np.asarray(out3)).all()


def test_train_window_attention_backward():
    """The splash custom-VJP gradients must track the naive autodiff
    gradients (this is the FA2-style training backward, SURVEY.md N7)."""
    from vllm_hymeta_tpu.ops import naive, swa
    key = jax.random.PRNGKey(21)
    B, T, Hq, Hkv, D = 1, 512, 2, 1, 128
    wk = 129
    q = jax.random.normal(key, (B, T, Hq, D), jnp.float32) * 0.5
    k = jax.random.normal(jax.random.fold_in(key, 1), (B, T, Hkv, D),
                          jnp.float32) * 0.5
    v = jax.random.normal(jax.random.fold_in(key, 2), (B, T, Hkv, D),
                          jnp.float32) * 0.5
    pos = jnp.arange(T, dtype=jnp.int32)
    w = jax.random.normal(jax.random.fold_in(key, 3), (D,), jnp.float32)

    def loss_flash(q, k, v):
        o = swa.train_window_attention(
            q.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
            v.astype(jnp.bfloat16), wk)
        return jnp.sum(o * w)

    def loss_naive(q, k, v):
        o, _ = naive.swa_attention(q, k, v, pos, pos, wk - 1, True)
        return jnp.sum(o * w)

    g_f = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_n = jax.grad(loss_naive, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_f, g_n, "qkv"):
        assert _rms(a, b) < 5e-2, (name, _rms(a, b))


@pytest.mark.parametrize("M,K,N,int8_act", [
    (1, 3584, 4608, True), (1, 18944, 3584, True), (1, 3584, 37888, True),
    (16, 3584, 3584, True), (1, 18944, 3584, False), (1, 3584, 4608, False),
])
def test_int4g_matvec_matches_ref(M, K, N, int8_act):
    """Grouped-s4 decode matvec (round 4): in-program packed->s4
    conversion + batched per-group dot vs the dequant reference."""
    from vllm_hymeta_tpu.ops import quant_matmul as qm
    key = jax.random.PRNGKey(3)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    g = 64
    G = K // g
    x = jax.random.normal(k1, (M, K), jnp.bfloat16)
    qw = jax.random.randint(k2, (K, N), -8, 8, jnp.int8)
    qw4 = qm.pack_int4(qw)
    sc = (jax.random.uniform(k3, (G, N), jnp.float32) * 2e-3 + 1e-3)
    zr = jax.random.randint(k4, (G, N), -8, 8, jnp.int32).astype(jnp.float32)

    @jax.jit
    def run(x, qw4, sc, zr):
        w4g = qm.qw4_to_grouped_s4(qw4, g)
        s3 = sc.astype(jnp.bfloat16).reshape(G, 1, N)
        z3 = zr.astype(jnp.bfloat16).reshape(G, 1, N)
        return qm.int4g_matvec(x, w4g, s3, z3, int8_act=int8_act)

    out = np.asarray(run(x, qw4, sc, zr))
    ref = np.asarray(qm.int4_matmul_ref(x, qw4, sc, zr))
    assert np.isfinite(out).all()
    tol = 2e-2 if int8_act else 8e-3
    assert _rms(out, ref) < tol, _rms(out, ref)


@pytest.mark.parametrize("M,K,N,int8_act", [
    (1, 3584, 4608, True), (1, 18944, 3584, True), (1, 3584, 37888, True),
    (16, 3584, 3584, True), (1, 18944, 3584, False),
])
def test_int4gp_matvec_matches_int4g(M, K, N, int8_act):
    """Sublane-nibble-packed decode matvec (round 5): the in-kernel
    pltpu.bitcast unpack must reproduce the grouped-s4 kernel (same
    activation-quant math, same epilogue) bit-for-bit on TPU — it reads
    the SAME nibbles from an int8-typed operand."""
    from vllm_hymeta_tpu.ops import quant_matmul as qm
    key = jax.random.PRNGKey(5)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    g = 64
    G = K // g
    x = jax.random.normal(k1, (M, K), jnp.bfloat16)
    qw = jax.random.randint(k2, (K, N), -8, 8, jnp.int8)
    qw4 = qm.pack_int4(qw)
    sc = (jax.random.uniform(k3, (G, N), jnp.float32) * 2e-3 + 1e-3)
    zr = jax.random.randint(k4, (G, N), -8, 8, jnp.int32).astype(jnp.float32)
    s3 = sc.astype(jnp.bfloat16).reshape(G, 1, N)
    z3 = zr.astype(jnp.bfloat16).reshape(G, 1, N)
    qw4p = qm.pack_int4_sublane(qw4, g)
    # layout round-trip
    np.testing.assert_array_equal(
        np.asarray(qm.unpack_int4_sublane(qw4p)),
        np.asarray(qm.unpack_int4(qw4)).reshape(G, g, N))

    @jax.jit
    def run_gp(x, qw4p):
        return qm.int4gp_matvec(x, qw4p, s3, z3, int8_act=int8_act)

    @jax.jit
    def run_g(x, qw4):
        w4g = qm.qw4_to_grouped_s4(qw4, g)
        return qm.int4g_matvec(x, w4g, s3, z3, int8_act=int8_act)

    out = np.asarray(run_gp(x, qw4p))
    want = np.asarray(run_g(x, qw4))
    np.testing.assert_array_equal(out, want)


def test_gla_chunked_pallas_gqa_matches_ref():
    """GQA mode (round 4): rep query heads share a KV head's k/v/g AND
    state — kernel output must equal the repeat-then-run reference."""
    from vllm_hymeta_tpu.ops import gla_chunk
    from vllm_hymeta_tpu.ops.gla_chunk_pallas import gla_chunked_pallas
    key = jax.random.PRNGKey(9)
    B, Hkv, rep, T, D = 1, 2, 7, 1024, 128
    Hq = Hkv * rep
    q = jax.random.normal(key, (B, Hq, T, D), jnp.bfloat16)
    k = jax.random.normal(jax.random.fold_in(key, 1), (B, Hkv, T, D),
                          jnp.bfloat16)
    v = jax.random.normal(jax.random.fold_in(key, 2), (B, Hkv, T, D),
                          jnp.bfloat16)
    g = -jnp.abs(jax.random.normal(jax.random.fold_in(key, 3),
                                   (B, Hkv, T, D), jnp.float32)) * 0.1
    s0 = jax.random.normal(jax.random.fold_in(key, 4), (B, Hkv, D, D),
                           jnp.float32) * 0.05
    o_p, s_p = gla_chunked_pallas(q, k, v, g, initial_state=s0)
    o_r, s_r = gla_chunk._gla_ref_gqa(q, k, v, g, s0, D ** -0.5)
    assert o_p.shape == (B, Hq, T, D) and s_p.shape == (B, Hkv, D, D)
    assert _rms(o_p, o_r) < 2e-2, _rms(o_p, o_r)
    assert _rms(s_p, s_r) < 2e-2, _rms(s_p, s_r)


def test_gla_decode_active_matches_ref():
    """N3 kernel: active-gated in-place state update must match the XLA
    composition; INACTIVE slots' state must be bit-identical (the
    aliased buffer is never touched) and their o rows zero."""
    import jax
    import jax.numpy as jnp
    from vllm_hymeta_tpu.ops import naive
    from vllm_hymeta_tpu.ops.gla_decode_pallas import gla_decode_active

    S, Hq, Hkv, D = 8, 8, 4, 128
    rs = np.random.RandomState(11)
    q = jnp.asarray(rs.randn(S, Hq, D), jnp.bfloat16)
    k = jnp.asarray(rs.randn(S, Hkv, D), jnp.bfloat16)
    v = jnp.asarray(rs.randn(S, Hkv, D), jnp.bfloat16)
    g = jnp.asarray(-np.abs(rs.randn(S, Hkv, D)) * 0.1, jnp.float32)
    state = jnp.asarray(rs.randn(S, Hkv, D, D), jnp.float32)
    for pattern in ([True] * 8, [True, False] * 4,
                    [False] * 7 + [True], [False] * 8):
        active = jnp.asarray(pattern)
        S_old = state.astype(jnp.float32)
        o_ref, S_ref = naive.gla_decode_step(q, k, v, g, S_old)
        S_ref = jnp.where(active[:, None, None, None], S_ref, S_old)
        o_ref = jnp.where(active[:, None, None], o_ref, 0.0)
        # state is donated on the TPU path: pass a fresh copy
        o, S_new = gla_decode_active(q, k, v, g, state + 0, active)
        assert _rms(np.asarray(o, np.float32),
                    np.asarray(o_ref, np.float32)) < 2e-2
        np.testing.assert_allclose(np.asarray(S_new), np.asarray(S_ref),
                                   rtol=2e-2, atol=2e-2)
        inact = ~np.asarray(active)
        if inact.any():
            np.testing.assert_array_equal(
                np.asarray(S_new)[inact], np.asarray(state)[inact])
            assert float(np.abs(np.asarray(o, np.float32)[inact]).max()) == 0.0


def test_rms_norm_pallas_matches_jnp():
    from vllm_hymeta_tpu.ops import naive, norms
    key = jax.random.PRNGKey(0)
    for T, H in [(8, 3584), (4096, 3584), (24, 512)]:
        x = jax.random.normal(key, (T, H), jnp.bfloat16)
        w = jax.random.normal(jax.random.PRNGKey(1), (H,),
                              jnp.bfloat16) * 0.1 + 1.0
        assert norms.fits(x, w)
        got = norms.rms_norm(x, w, 1e-6)
        # jnp twin (the CPU fallback body)
        xf = x.astype(jnp.float32)
        var = jnp.mean(xf * xf, axis=-1, keepdims=True)
        ref = (xf * jax.lax.rsqrt(var + 1e-6)
               * w.astype(jnp.float32)).astype(x.dtype)
        assert _rms(got, ref) < 2e-2, (T, H, _rms(got, ref))


def test_rms_norm_residual_pallas_matches_jnp():
    from vllm_hymeta_tpu.ops import norms
    key = jax.random.PRNGKey(2)
    T, H = 256, 3584
    x = jax.random.normal(key, (T, H), jnp.bfloat16)
    r = jax.random.normal(jax.random.PRNGKey(3), (T, H), jnp.bfloat16)
    w = jnp.ones((H,), jnp.bfloat16)
    out, new_r = norms.rms_norm_residual(x, r, w, 1e-6)
    rf = x.astype(jnp.float32) + r.astype(jnp.float32)
    var = jnp.mean(rf * rf, axis=-1, keepdims=True)
    ref = (rf * jax.lax.rsqrt(var + 1e-6)).astype(x.dtype)
    assert _rms(out, ref) < 2e-2
    assert _rms(new_r, rf.astype(x.dtype)) < 1e-3


def test_rms_norm_custom_vjp_matches_autodiff():
    from vllm_hymeta_tpu.ops import norms
    key = jax.random.PRNGKey(4)
    T, H = 64, 512
    x = jax.random.normal(key, (T, H), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(5), (H,),
                          jnp.float32) * 0.1 + 1.0

    def jnp_loss(x, w):
        xf = x.astype(jnp.float32)
        var = jnp.mean(xf * xf, axis=-1, keepdims=True)
        out = xf * jax.lax.rsqrt(var + 1e-6) * w
        return jnp.sum(jnp.sin(out))

    def pal_loss(x, w):
        return jnp.sum(jnp.sin(norms.rms_norm(x, w, 1e-6)))

    gx_ref, gw_ref = jax.grad(jnp_loss, argnums=(0, 1))(x, w)
    gx, gw = jax.grad(pal_loss, argnums=(0, 1))(x, w)
    assert _rms(gx, gx_ref) < 2e-2
    assert _rms(gw, gw_ref) < 2e-2


def test_ring_write_matches_scatter():
    """ops/ring_attention.ring_write vs the jnp mod-scatter, including
    wrap-around, unaligned pos0, n_valid tails, and slot indexing."""
    from vllm_hymeta_tpu.ops import ring_attention as ra
    key = jax.random.PRNGKey(0)
    S, Hkv, R, D, T = 3, 4, 2048, 128, 1024
    for slot, pos0, n_valid in [(0, 0, 1024), (1, 1024, 1024),
                                (2, 1536, 1024), (0, 4096 + 512, 1024),
                                (1, 777, 1000), (2, 2048, 512)]:
        cache_k = jax.random.normal(key, (S, Hkv, R, D), jnp.bfloat16)
        cache_v = jax.random.normal(jax.random.PRNGKey(1), (S, Hkv, R, D),
                                    jnp.bfloat16)
        k = jax.random.normal(jax.random.PRNGKey(2), (T, Hkv, D),
                              jnp.bfloat16)
        v = jax.random.normal(jax.random.PRNGKey(3), (T, Hkv, D),
                              jnp.bfloat16)
        assert ra.ring_write_supported(cache_k, k)
        gk, gv = ra.ring_write(cache_k, cache_v, k, v, slot, pos0, n_valid)
        positions = pos0 + np.arange(T)
        idx = positions % R
        ek = np.array(cache_k, np.float32)
        ev = np.array(cache_v, np.float32)
        for j in range(n_valid):
            ek[slot, :, idx[j]] = np.asarray(k[j])
            ev[slot, :, idx[j]] = np.asarray(v[j])
        np.testing.assert_array_equal(
            np.asarray(gk, np.float32), ek.astype(np.float32),
            err_msg=f"slot={slot} pos0={pos0} n_valid={n_valid} k")
        np.testing.assert_array_equal(
            np.asarray(gv, np.float32), ev.astype(np.float32),
            err_msg=f"slot={slot} pos0={pos0} n_valid={n_valid} v")


def test_ring_window_prefill_matches_gather_flash():
    """ring_window_prefill (in-place ring read, arithmetic masks) vs
    gather_ring_context + flash_window_prefill_ref across chunk
    boundaries incl. the first chunk (invalid ring entries) and a
    partial tail."""
    import os
    os.environ["RING_ATTN"] = "1"   # kernel is opt-in (see its docstring)
    from vllm_hymeta_tpu.ops import ring_attention as ra
    from vllm_hymeta_tpu.ops import swa
    S, Hq, Hkv, D = 2, 8, 2, 128
    Tq, R, W = 1024, 1536, 1025
    key = jax.random.PRNGKey(7)

    for slot, pos0, n_valid in [(0, 0, 1024), (1, 1024, 1024),
                                (0, 2048, 1024), (1, 3 * 1024, 700)]:
        ks = jax.random.split(jax.random.fold_in(key, pos0), 5)
        q = jax.random.normal(ks[0], (Tq, Hq, D), jnp.bfloat16)
        ck = jax.random.normal(ks[1], (Tq, Hkv, D), jnp.bfloat16)
        cv = jax.random.normal(ks[2], (Tq, Hkv, D), jnp.bfloat16)
        cache_k = jax.random.normal(ks[3], (S, Hkv, R, D), jnp.bfloat16)
        cache_v = jax.random.normal(ks[4], (S, Hkv, R, D), jnp.bfloat16)
        assert ra.ring_window_supported(q, cache_k, W)

        got, lse = ra.ring_window_prefill(
            q, cache_k, cache_v, ck, cv, slot, pos0, n_valid, W,
            need_lse=True)

        # oracle: ascending-position gather of the ring + ref attention
        k_pos_ctx = pos0 - R + np.arange(R)
        idx = k_pos_ctx % R
        gk = jnp.swapaxes(cache_k[slot], 0, 1)[idx]   # [R, Hkv, D]
        gv = jnp.swapaxes(cache_v[slot], 0, 1)[idx]
        k_pos_ctx = np.where(k_pos_ctx >= 0, k_pos_ctx, swa.INVALID_POS)
        positions = pos0 + np.arange(Tq)
        valid = np.arange(Tq) < n_valid
        qp = np.where(valid, positions, swa.INVALID_POS)
        kp_all = np.concatenate([k_pos_ctx, qp])
        k_all = jnp.concatenate([gk, ck], axis=0)
        v_all = jnp.concatenate([gv, cv], axis=0)
        ref, ref_lse = swa.flash_window_prefill_ref(
            q, k_all, v_all, jnp.asarray(qp), jnp.asarray(kp_all), W)

        gv_np = np.asarray(got, np.float32)[valid]
        rv_np = np.asarray(ref, np.float32)[valid]
        err = _rms(gv_np, rv_np)
        assert err < 3e-2, (slot, pos0, n_valid, err)
        lse_err = np.max(np.abs(np.asarray(lse).T[valid]
                                - np.asarray(ref_lse).T[valid]))
        assert lse_err < 1e-2, (slot, pos0, n_valid, lse_err)
