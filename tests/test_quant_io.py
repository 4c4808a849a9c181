"""Quantized checkpoint I/O: save/load round trip; synthetic GPTQ
checkpoint ingestion end-to-end."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from vllm_hymeta_tpu.models import gla_swa
from vllm_hymeta_tpu.quant import quantize_params_w8a8
from vllm_hymeta_tpu.quant import gptq_reader
from vllm_hymeta_tpu.quant.io import (load_gptq_checkpoint, load_quantized,
                                      save_quantized)
from tests.test_models import tiny_glaswa


class TestQuantIO:
    def test_save_load_roundtrip(self, tmp_path):
        cfg = tiny_glaswa(num_hidden_layers=2)
        params = gla_swa.init_params(cfg, jax.random.PRNGKey(0),
                                     dtype=jnp.float32)
        q = quantize_params_w8a8(params)
        save_quantized(q, str(tmp_path))
        back = load_quantized(str(tmp_path))
        flat_a = jax.tree.leaves(q)
        flat_b = jax.tree.leaves(back)
        assert len(flat_a) == len(flat_b)
        # structural + numeric identity
        jax.tree.map(lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)), q, back)

    def test_gptq_checkpoint_ingestion(self, tmp_path):
        """Build a synthetic gptqmodel-style checkpoint (dense weights for
        most params + packed gptq tensors for one projection) and verify
        the loaded model uses the quantized weight."""
        from safetensors.numpy import save_file
        cfg = tiny_glaswa(num_hidden_layers=2)
        params = gla_swa.init_params(cfg, jax.random.PRNGKey(1),
                                     dtype=jnp.float32)

        # compose checkpoint: HF-style dense names
        tensors = {
            "model.embeddings.weight": np.asarray(params["embed"]["w"]),
            "model.norm.weight": np.asarray(params["final_norm"]["w"]),
            "lm_head.weight": np.ascontiguousarray(np.asarray(params["lm_head"]["w"]).T),
        }
        for i, lp in enumerate(params["layers"]):
            L = f"model.layers.{i}"
            tensors[f"{L}.attn_norm.weight"] = np.asarray(
                lp["attn_norm"]["w"])
            tensors[f"{L}.mlp_norm.weight"] = np.asarray(lp["mlp_norm"]["w"])
            for proj in ("gate_proj", "up_proj", "down_proj"):
                tensors[f"{L}.mlp.{proj}.weight"] = np.ascontiguousarray(np.asarray(
                    lp["mlp"][proj]["w"]).T)
            ap = lp["attn"]
            for proj in ("q_proj", "k_proj", "v_proj"):
                tensors[f"{L}.attn.{proj}.weight"] = np.ascontiguousarray(np.asarray(
                    ap[proj]["w"]).T)
                tensors[f"{L}.attn.{proj}.bias"] = np.asarray(ap[proj]["b"])
            tensors[f"{L}.attn.o_proj.weight"] = np.ascontiguousarray(np.asarray(
                ap["o_proj"]["w"]).T)
            if "gk_a" in ap:
                tensors[f"{L}.attn.gk_proj.0.weight"] = np.ascontiguousarray(np.asarray(
                    ap["gk_a"]["w"]).T)
                tensors[f"{L}.attn.gk_proj.1.weight"] = np.ascontiguousarray(np.asarray(
                    ap["gk_b"]["w"]).T)
                tensors[f"{L}.attn.gk_proj.1.bias"] = np.asarray(
                    ap["gk_b"]["b"])
                tensors[f"{L}.attn.g_norm.weight"] = np.asarray(
                    ap["g_norm"]["w"])

        # replace layer-0 q_proj with packed GPTQ (8-bit, group 32)
        w = np.asarray(params["layers"][0]["attn"]["q_proj"]["w"])
        qw, qz, sc, gi = gptq_reader.pack_gptq_linear(w, bits=8,
                                                      group_size=32)
        del tensors["model.layers.0.attn.q_proj.weight"]
        tensors["model.layers.0.attn.q_proj.qweight"] = qw
        tensors["model.layers.0.attn.q_proj.qzeros"] = qz
        tensors["model.layers.0.attn.q_proj.scales"] = \
            sc.astype(np.float32)
        tensors["model.layers.0.attn.q_proj.g_idx"] = gi

        ckpt = tmp_path / "ckpt"
        os.makedirs(ckpt)
        save_file(tensors, str(ckpt / "model.safetensors"))
        with open(ckpt / "config.json", "w") as f:
            json.dump({"model_type": "gla_swa",
                       **{k: getattr(cfg, k) for k in
                          ("vocab_size", "hidden_size",
                           "num_hidden_layers", "num_attention_heads",
                           "num_key_value_heads", "intermediate_size",
                           "sliding_window")},
                       "quantization_config": {"bits": 8, "sym": True}},
                      f)

        loaded = load_gptq_checkpoint(cfg, str(ckpt), dtype=jnp.float32)
        qp = loaded["layers"][0]["attn"]["q_proj"]
        assert "qw" in qp and "w" not in qp
        # dense layers loaded intact
        np.testing.assert_allclose(
            np.asarray(loaded["layers"][1]["attn"]["q_proj"]["w"]),
            np.asarray(params["layers"][1]["attn"]["q_proj"]["w"]),
            atol=1e-6)
        # model still runs and tracks the original
        toks = jax.random.randint(jax.random.PRNGKey(2), (1, 10), 0, 256)
        l0 = gla_swa.forward_full(cfg, params, toks)
        l1 = gla_swa.forward_full(cfg, loaded, toks)
        assert np.isfinite(np.asarray(l1)).all()
        corr = np.corrcoef(np.asarray(l0[0, -1]),
                           np.asarray(l1[0, -1]))[0, 1]
        assert corr > 0.99
