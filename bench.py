"""Benchmark harness — prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Protocol mirrors the reference's headline measurement
(`hf_7B_model/speed_7B.py:44-177` / BASELINE.md): latency to generate 128
new tokens after a long prompt, mean over runs after warmup.

Default config: the real 7B GLAswa architecture with GPTQ-INT4 weights
+ INT8 prefill shadow (the fastest serving scheme; BASELINE.json
config #1's quantized serving point) on one TPU chip, 32k prompt.  Baseline number:
7B HF bf16 on 1 GPU, 32k -> 128 tok = 2332 ms (speed_7B.py:205-208);
vs_baseline = baseline_ms / measured_ms (>1 means faster than reference).

Weights are randomly initialized (no public checkpoint ships with the
reference); latency is architecture- and kernel-bound, not value-bound.

Env overrides: BENCH_PROMPT (default 32768), BENCH_GEN (128),
BENCH_RUNS (3), BENCH_SCHEME (gptq4|w8a8|bf16; default gptq4 — the fastest scheme), BENCH_SMALL=1 for a
reduced-width smoke config, BENCH_INT8_HEAD (default 1: serve the LM
head int8 — saves ~0.7 ms/token of decode HBM traffic; top-1 parity
property-tested), BENCH_DECODE_BLOCK (default 64), BENCH_CHUNK (4096).
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(
                          os.path.abspath(__file__)), ".jax_cache"))

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_MS = {32768: 2332.0, 65536: 4680.0, 131072: 10512.0}


def build_params(cfg, scheme: str, fuse: bool = True):
    """Build (or load cached) quantized params.  Projection fusion runs on
    the HOST so the device only ever holds the fused tree — fused+unfused
    at once would double weight HBM (the engine's fuse_params is
    idempotent and passes the pre-fused tree through)."""
    from vllm_hymeta_tpu.models import common, get_model
    from vllm_hymeta_tpu.quant import (quantize_params_gptq,
                                       quantize_params_w8a8)
    from vllm_hymeta_tpu.quant.io import load_quantized, save_quantized

    cache_dir = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), ".bench_cache",
        f"{cfg.model_type}_{scheme}_{cfg.hidden_size}"
        f"_{cfg.num_hidden_layers}_{cfg.num_attention_heads}"
        f"_{cfg.num_key_value_heads}_{cfg.intermediate_size}"
        f"_{cfg.vocab_size}")
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        if os.path.exists(os.path.join(cache_dir, "quantized.safetensors")):
            params = load_quantized(cache_dir)
        else:
            params = get_model(cfg).init_params(cfg, jax.random.PRNGKey(0),
                                                dtype=jnp.bfloat16)
            if scheme == "w8a8":
                params = quantize_params_w8a8(params)
            elif scheme == "gptq4":
                from vllm_hymeta_tpu.quant import attach_prefill_int8
                params = quantize_params_gptq(params, bits=4, group_size=64)
                params = attach_prefill_int8(params)
            elif scheme == "gptq4cal":
                # calibration-based GPTQ (quant/gptq.py): Hessians from a
                # fixed token stream, layer-sequential compensation.  The
                # layer forwards/quantizer run on the accelerator (params
                # stream per layer); only the result is cached.
                from vllm_hymeta_tpu.quant import attach_prefill_int8
                from vllm_hymeta_tpu.quant.gptq import (
                    quantize_params_gptq_calibrated)
                import numpy as np
                rs = np.random.RandomState(12345)
                calib = rs.randint(0, cfg.vocab_size, size=(4, 1024))
                with jax.default_device(jax.devices()[0]):
                    params = quantize_params_gptq_calibrated(
                        cfg, params, calib, bits=4, group_size=64)
                params = jax.device_get(params)
                params = attach_prefill_int8(params)
            try:
                save_quantized(params, cache_dir)
            except Exception:
                pass
        if os.environ.get("BENCH_INT8_HEAD", "1") == "1":
            from vllm_hymeta_tpu.quant.transform import quantize_lm_head
            params = quantize_lm_head(params)
        if fuse:
            params = common.fuse_params(cfg, params, tp=1)
    return jax.device_put(params, jax.devices()[0])


def main():
    prompt_len = int(os.environ.get("BENCH_PROMPT", 32768))
    gen = int(os.environ.get("BENCH_GEN", 128))
    runs = int(os.environ.get("BENCH_RUNS", 3))
    scheme = os.environ.get("BENCH_SCHEME", "gptq4")
    small = os.environ.get("BENCH_SMALL") == "1"

    from vllm_hymeta_tpu.config import GLAswaConfig, HymetaConfig
    from vllm_hymeta_tpu.engine.engine import Engine, EngineConfig
    from vllm_hymeta_tpu.engine.sampler import SamplingParams

    model = os.environ.get("BENCH_MODEL", "7b")
    if small:
        cfg = GLAswaConfig(vocab_size=4096, hidden_size=512,
                           num_hidden_layers=4, num_attention_heads=8,
                           num_key_value_heads=4, intermediate_size=1024,
                           sliding_window=1024)
        prompt_len = min(prompt_len, 4096)
    elif model in ("70b", "hybrid"):
        # Hymeta-70B architecture (intra-layer hybrid + metatokens + MoE)
        # at real layer WIDTH; layer COUNT scaled to fit one chip's HBM
        # (BENCH_LAYERS, default 4 of 28 — per-layer cost is uniform, so
        # tokens/s/layer extrapolates).  Full 70B needs the multi-chip
        # mesh path (readme: TP4+EP in the reference, `readme.md:112-123`).
        layers = int(os.environ.get("BENCH_LAYERS", 4))
        cfg = HymetaConfig(num_hidden_layers=layers)
    else:
        cfg = GLAswaConfig()  # real 7B dims

    params = build_params(cfg, scheme)
    chunk = int(os.environ.get("BENCH_CHUNK", 4096))
    ecfg = EngineConfig(max_num_seqs=1,
                        max_model_len=prompt_len + gen + 64,
                        prefill_chunk=chunk,
                        prefill_buckets=(chunk,),
                        kv_dtype="bfloat16",
                        decode_block=int(os.environ.get("BENCH_DECODE_BLOCK",
                                                        64)))
    eng = Engine(cfg, params, ecfg)

    import numpy as np
    rs = np.random.RandomState(0)
    prompt = list(rs.randint(0, cfg.vocab_size, size=prompt_len))
    sp = SamplingParams(temperature=0.0, max_tokens=gen, ignore_eos=True)

    # warmup TWICE: the second request compiles the steady-state buffer
    # layouts (slot-restart fed by decode-output caches)
    eng.generate([prompt], sp)
    eng.generate([prompt], sp)

    times = []
    for _ in range(runs):
        t0 = time.perf_counter()
        [req] = eng.generate([prompt], sp)
        times.append((time.perf_counter() - t0) * 1000.0)
        assert len(req.output) == gen
    mean_ms = sum(times) / len(times)

    baseline = BASELINE_MS.get(prompt_len) if cfg.model_type == "gla_swa" \
        else None
    name = "7B" if cfg.model_type == "gla_swa" \
        else f"70Barch_L{cfg.num_hidden_layers}"
    result = {
        "metric": f"{name}_{scheme}_{prompt_len//1024}k_gen{gen}_latency",
        "value": round(mean_ms, 1),
        "unit": "ms",
        "vs_baseline": round(baseline / mean_ms, 3) if baseline else None,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
