"""Full latency table mirroring the reference's speed protocol.

The reference measures generation latency for 128 new tokens after 32k /
64k / 128k prompts, mean over N runs after warmup
(`/root/reference/hf_7B_model/speed_7B.py:44-177`, results at 200-219;
`bench/speed_vllm.py:107-148`).  This script produces the same table for
this engine on the local TPU chip, one scheme at a time.

Usage: python tools/speed_report.py [w8a8|gptq4|bf16 ...]
Env:   SPEED_PROMPTS (default "32768,65536,131072"), BENCH_RUNS (3),
       BENCH_GEN (128), BENCH_CHUNK (4096)
Output: one JSON line per (scheme, prompt_len) + a markdown table.
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import BASELINE_MS, build_params  # noqa: E402
from vllm_hymeta_tpu.config import GLAswaConfig  # noqa: E402
from vllm_hymeta_tpu.engine.engine import Engine, EngineConfig  # noqa: E402
from vllm_hymeta_tpu.engine.sampler import SamplingParams  # noqa: E402

# reference numbers for the closest same-bit-width 7B config (BASELINE.md)
REF_MS = {
    "bf16": {32768: 2332.0, 65536: 4680.0, 131072: 10512.0},   # HF bf16
    "w8a8": {32768: 2410.0, 65536: 4773.0, 131072: 10015.0},   # gptqmodel INT8
    "gptq4": {32768: 2349.0, 65536: 4691.0, 131072: 9506.0},   # bnb W4A16
}


def run_scheme(scheme: str, prompt_lens, gen: int, runs: int, chunk: int):
    cfg = GLAswaConfig()
    params = build_params(cfg, scheme)
    rows = []
    max_len = max(prompt_lens) + gen + 64
    ecfg = EngineConfig(max_num_seqs=1, max_model_len=max_len,
                        prefill_chunk=chunk, prefill_buckets=(chunk,),
                        kv_dtype="bfloat16",
                        decode_block=int(os.environ.get(
                            "BENCH_DECODE_BLOCK", 32)))
    eng = Engine(cfg, params, ecfg)
    rs = np.random.RandomState(0)
    sp = SamplingParams(temperature=0.0, max_tokens=gen, ignore_eos=True)
    for plen in prompt_lens:
        prompt = list(rs.randint(0, cfg.vocab_size, size=plen))
        eng.generate([prompt], sp)   # compile + steady-state warmup
        eng.generate([prompt], sp)
        times = []
        for _ in range(runs):
            t0 = time.perf_counter()
            [req] = eng.generate([prompt], sp)
            times.append((time.perf_counter() - t0) * 1000.0)
            assert len(req.output) == gen
        mean = sum(times) / len(times)
        std = (sum((t - mean) ** 2 for t in times) / len(times)) ** 0.5
        ref = REF_MS.get(scheme, {}).get(plen)
        row = {"scheme": scheme, "prompt_len": plen, "gen": gen,
               "latency_ms": round(mean, 1), "std_ms": round(std, 1),
               "ref_gpu_ms": ref,
               "vs_ref": round(ref / mean, 3) if ref else None,
               "vs_bf16_baseline": round(
                   BASELINE_MS[plen] / mean, 3) if plen in BASELINE_MS
               else None}
        print(json.dumps(row), flush=True)
        rows.append(row)
    return rows


def main():
    schemes = sys.argv[1:] or ["w8a8"]
    prompt_lens = [int(x) for x in os.environ.get(
        "SPEED_PROMPTS", "32768,65536,131072").split(",")]
    gen = int(os.environ.get("BENCH_GEN", 128))
    runs = int(os.environ.get("BENCH_RUNS", 3))
    chunk = int(os.environ.get("BENCH_CHUNK", 4096))
    all_rows = []
    for s in schemes:
        all_rows += run_scheme(s, prompt_lens, gen, runs, chunk)
    print("\n| scheme | prompt | latency (ms) | ref GPU (ms) | speedup |")
    print("|---|---|---|---|---|")
    for r in all_rows:
        print(f"| {r['scheme']} | {r['prompt_len'] // 1024}k "
              f"| {r['latency_ms']} ± {r['std_ms']} "
              f"| {r['ref_gpu_ms']} | {r['vs_ref']} |")


if __name__ == "__main__":
    main()
