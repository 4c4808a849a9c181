"""Quantization pipeline tests: transforms, GPTQ pack/unpack round trip,
quantized model end-to-end sanity."""

import jax
import jax.numpy as jnp
import numpy as np

from vllm_hymeta_tpu.models import gla_swa
from vllm_hymeta_tpu.models.layers import linear
from vllm_hymeta_tpu.ops import quant_matmul
from vllm_hymeta_tpu.quant import (quantize_params_gptq,
                                   quantize_params_w8a8)
from vllm_hymeta_tpu.quant import gptq_reader
from tests.test_models import tiny_glaswa


class TestGPTQReader:
    def test_pack_convert_roundtrip(self):
        for bits in (4, 8):
            for zero_offset in (False, True):
                rs = np.random.RandomState(0)
                K, N, g = 128, 64, 32
                w = rs.randn(K, N).astype(np.float32)
                qw, qz, sc, gi = gptq_reader.pack_gptq_linear(
                    w, bits, g, zero_offset)
                dense = gptq_reader.dequant_reference(
                    qw, qz, sc, gi, bits, zero_offset)
                # quantization error bounded by scale/2 per element
                max_scale = np.abs(sc.astype(np.float32)).max()
                assert np.abs(dense - w).max() <= max_scale * 0.51 + 1e-4

                p = gptq_reader.convert_gptq_linear(qw, qz, sc, gi, bits,
                                                    zero_offset)
                x = rs.randn(5, K).astype(np.float32)
                y = quant_matmul.groupwise_dequant_matmul_ref(
                    jnp.asarray(x), jnp.asarray(p["qw"]),
                    jnp.asarray(p["scales"]), jnp.asarray(p["zeros"]))
                np.testing.assert_allclose(np.asarray(y), x @ dense,
                                           atol=2e-2, rtol=2e-2)


class TestTransforms:
    def test_w8a8_linear_close(self):
        key = jax.random.PRNGKey(0)
        p = {"w": jax.random.normal(key, (64, 32)) * 0.1}
        q = quantize_params_w8a8({"x_proj": {"q_proj": p}})
        qp = q["x_proj"]["q_proj"]
        assert "qw" in qp and qp["qw"].dtype == jnp.int8
        x = jax.random.normal(jax.random.PRNGKey(1), (4, 64))
        y = linear(qp, x)
        np.testing.assert_allclose(np.asarray(y), np.asarray(x @ p["w"]),
                                   atol=0.02, rtol=0.05)

    def test_gptq_rtn_linear_close(self):
        key = jax.random.PRNGKey(0)
        p = {"w": jax.random.normal(key, (128, 32)) * 0.1}
        q = quantize_params_gptq({"a": {"up_proj": p}}, bits=4,
                                 group_size=64)
        qp = q["a"]["up_proj"]
        assert qp["qw4"].dtype == jnp.int8  # packed, 2 weights/byte
        assert qp["qw4"].shape == (64, 32)
        x = jax.random.normal(jax.random.PRNGKey(1), (4, 128))
        y = linear(qp, x)
        # exact vs the dequantized weight; close-ish vs the original
        w_deq = quant_matmul.dequant_groupwise(
            quant_matmul.unpack_int4(qp["qw4"]),
            qp["scales"], qp["zeros"], dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(y), np.asarray(x @ w_deq),
                                   atol=1e-4, rtol=1e-4)
        assert np.abs(np.asarray(y - x @ p["w"])).max() < 0.5

    def test_dual_precision_shadow(self):
        """attach_prefill_int8: the INT8 shadow reproduces the dequantized
        int4 grid, and linear() routes by batch size (decode -> int4,
        prefill -> int8 shadow)."""
        from vllm_hymeta_tpu.quant import attach_prefill_int8
        key = jax.random.PRNGKey(0)
        p = {"w": jax.random.normal(key, (128, 32)) * 0.1}
        q = quantize_params_gptq({"a": {"up_proj": p}}, bits=4,
                                 group_size=64)
        q = attach_prefill_int8(q)
        qp = q["a"]["up_proj"]
        assert qp["qw8"].shape == (128, 32)
        w_deq = quant_matmul.dequant_groupwise(
            quant_matmul.unpack_int4(qp["qw4"]),
            qp["scales"], qp["zeros"], dtype=jnp.float32)
        w_shadow = qp["qw8"].astype(jnp.float32) * qp["w8_scale"]
        # requantization error <= half an int8 step of the channel max
        assert np.abs(np.asarray(w_deq - w_shadow)).max() <= \
            float(jnp.max(qp["w8_scale"])) * 0.51
        x = jax.random.normal(jax.random.PRNGKey(1), (4, 128),
                              jnp.bfloat16)
        xl = jnp.tile(x, (32, 1))          # 128 rows -> prefill path
        y_dec = linear(qp, x)
        y_pre = linear(qp, xl)[:4]
        np.testing.assert_allclose(np.asarray(y_dec, np.float32),
                                   np.asarray(y_pre, np.float32),
                                   atol=0.05, rtol=0.05)

    def test_int4_pack_roundtrip(self):
        key = jax.random.PRNGKey(7)
        qw = jax.random.randint(key, (32, 16), -8, 8, jnp.int8)
        packed = quant_matmul.pack_int4(qw)
        assert packed.shape == (16, 16)
        np.testing.assert_array_equal(
            np.asarray(quant_matmul.unpack_int4(packed)), np.asarray(qw))

    def test_int4_matmul_ref(self):
        key = jax.random.PRNGKey(8)
        K, N, g = 128, 32, 32
        w = jax.random.normal(key, (K, N)) * 0.1
        q = quantize_params_gptq({"a": {"up_proj": {"w": w}}},
                                 bits=4, group_size=g)
        qp = q["a"]["up_proj"]
        x = jax.random.normal(jax.random.PRNGKey(9), (5, K))
        y = quant_matmul.int4_matmul_ref(x, qp["qw4"], qp["scales"],
                                         qp["zeros"])
        assert np.abs(np.asarray(y - x @ w)).max() < 0.5

    def test_int4_sublane_pack_roundtrip_and_ref(self):
        """qw4p layout (round 5): sublane nibble pack round-trips and the
        CPU reference matvec matches the plain int4 reference."""
        key = jax.random.PRNGKey(17)
        K, N, g = 256, 64, 32
        G = K // g
        qw = jax.random.randint(key, (K, N), -8, 8, jnp.int8)
        qw4 = quant_matmul.pack_int4(qw)
        qw4p = quant_matmul.pack_int4_sublane(qw4, g)
        assert qw4p.shape == (G, g // 2, N)
        np.testing.assert_array_equal(
            np.asarray(quant_matmul.unpack_int4_sublane(qw4p)),
            np.asarray(qw).reshape(G, g, N))
        sc = jnp.full((G, N), 0.01, jnp.float32)
        zr = jnp.zeros((G, N), jnp.float32)
        x = jax.random.normal(jax.random.PRNGKey(18), (3, K), jnp.bfloat16)
        y = quant_matmul.int4gp_matvec(
            x, qw4p, sc.astype(jnp.bfloat16).reshape(G, 1, N),
            zr.astype(jnp.bfloat16).reshape(G, 1, N))
        ref = quant_matmul.int4_matmul_ref(x, qw4, sc, zr)
        assert np.abs(np.asarray(y, np.float32)
                      - np.asarray(ref, np.float32)).max() < 2e-2

    def test_fuse_attaches_qw4p_and_drops_shadowed_qw4(self):
        """fuse_params attaches qw4p to every packed-INT4 linear and
        drops qw4/scales/zeros when an INT8 prefill shadow exists."""
        from vllm_hymeta_tpu.models import common, gla_swa
        from vllm_hymeta_tpu.quant import attach_prefill_int8
        cfg = tiny_glaswa()
        params = gla_swa.init_params(cfg, jax.random.PRNGKey(0),
                                     dtype=jnp.float32)
        q = quantize_params_gptq(params, bits=4, group_size=32)
        q = attach_prefill_int8(q)
        fused = common.fuse_params(cfg, q, tp=1)
        mlp = fused["layers"][0]["mlp"]["gate_up_proj"]
        assert "qw4p" in mlp and "s4_scales" in mlp
        assert "qw4" not in mlp and "scales" not in mlp
        assert "qw8" in mlp

    def test_exclusions(self):
        cfg = tiny_glaswa()
        params = gla_swa.init_params(cfg, jax.random.PRNGKey(0),
                                     dtype=jnp.float32)
        q = quantize_params_w8a8(params)
        # lm_head / embed / norms untouched
        assert "w" in q["lm_head"]
        assert "w" in q["embed"]
        # gk_proj excluded (7B GPTQ pipeline excludes it)
        gla_layer = next(l for i, l in enumerate(q["layers"])
                         if not cfg.is_swa_layer(i))
        assert "w" in gla_layer["attn"]["gk_a"]
        assert "w" in gla_layer["attn"]["gk_b"]
        # projections quantized
        assert "qw" in gla_layer["attn"]["q_proj"]
        assert "qw" in gla_layer["mlp"]["down_proj"]

    def test_int8_lm_head_top1_agreement(self):
        """Optional int8 LM head: logits track the bf16 head closely and
        greedy top-1 agrees on the overwhelming majority of rows."""
        from vllm_hymeta_tpu.models.common import lm_head_gather
        from vllm_hymeta_tpu.parallel.pctx import NULL_CTX
        from vllm_hymeta_tpu.quant.transform import quantize_lm_head
        key = jax.random.PRNGKey(3)
        h, V, B = 128, 512, 64
        params = {"lm_head": {"w": jax.random.normal(key, (h, V)) * 0.05}}
        qparams = quantize_lm_head(params)
        assert "qw" in qparams["lm_head"]
        x = jax.random.normal(jax.random.fold_in(key, 1), (B, h),
                              jnp.bfloat16)
        ref = lm_head_gather(params["lm_head"], x, NULL_CTX)
        got = lm_head_gather(qparams["lm_head"], x, NULL_CTX)
        rms = float(jnp.sqrt(jnp.mean((ref - got) ** 2))
                    / (jnp.sqrt(jnp.mean(ref ** 2)) + 1e-9))
        assert rms < 3e-2
        agree = float(jnp.mean((jnp.argmax(ref, -1)
                                == jnp.argmax(got, -1)).astype(jnp.float32)))
        assert agree > 0.9

    def test_quantized_model_runs_and_tracks_bf16(self):
        cfg = tiny_glaswa()
        params = gla_swa.init_params(cfg, jax.random.PRNGKey(0),
                                     dtype=jnp.float32)
        qparams = quantize_params_w8a8(params)
        toks = jax.random.randint(jax.random.PRNGKey(1), (1, 12), 0, 256)
        lf = gla_swa.forward_full(cfg, params, toks)
        lq = gla_swa.forward_full(cfg, qparams, toks)
        assert np.isfinite(np.asarray(lq)).all()
        # same top-1 on a majority of positions (random tiny model is a
        # harsh test; quantization noise flips some near-ties)
        agree = (np.asarray(lf.argmax(-1)) == np.asarray(lq.argmax(-1)))
        assert agree.mean() >= 0.5


class TestFusedActQuant:
    def test_glu_quant_ref_matches_unfused_mlp(self):
        """The fused silu·mul→int8 path must track the unfused W8A8 GLU."""
        key = jax.random.PRNGKey(3)
        M, H, I = 96, 64, 128
        gu_w = jax.random.normal(key, (H, 2 * I), jnp.bfloat16) * 0.2
        down_w = jax.random.normal(jax.random.fold_in(key, 1),
                                   (I, H)) * 0.2
        x = jax.random.normal(jax.random.fold_in(key, 2), (M, H),
                              jnp.bfloat16)
        from vllm_hymeta_tpu.quant.transform import quantize_params_w8a8
        dp = quantize_params_w8a8({"l": {"down_proj": {"w": down_w}}}
                                  )["l"]["down_proj"]
        p = {"gate_up_proj": {"w": gu_w}, "down_proj": dp}
        from vllm_hymeta_tpu.models.layers import glu_mlp
        y = glu_mlp(p, x)                     # fused path (rows > 64)
        g, u = jnp.split(x @ gu_w, 2, axis=-1)
        a = jax.nn.silu(g) * u
        yref = quant_matmul.w8a8_matmul_ref(a, dp["qw"], dp["w_scale"])
        rms = float(jnp.sqrt(jnp.mean(
            (y.astype(jnp.float32) - yref.astype(jnp.float32)) ** 2)))
        ref = float(jnp.sqrt(jnp.mean(yref.astype(jnp.float32) ** 2)))
        assert rms / (ref + 1e-9) < 0.05

    def test_quantize_rows_equals_per_token(self):
        x = jax.random.normal(jax.random.PRNGKey(4), (33, 256),
                              jnp.bfloat16)
        q, s = quant_matmul.quantize_rows(x)
        qr, sr = quant_matmul.quantize_per_token(x)
        np.testing.assert_allclose(np.asarray(s), np.asarray(sr))
        np.testing.assert_array_equal(np.asarray(q), np.asarray(qr))
