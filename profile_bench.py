"""Dev profiling: time each engine step of the bench workload separately."""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(
                          os.path.abspath(__file__)), ".jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench import build_params
from vllm_hymeta_tpu.config import GLAswaConfig
from vllm_hymeta_tpu.engine.engine import Engine, EngineConfig
from vllm_hymeta_tpu.engine.sampler import SamplingParams


def main():
    prompt_len = int(os.environ.get("BENCH_PROMPT", 32768))
    gen = int(os.environ.get("BENCH_GEN", 128))
    scheme = os.environ.get("BENCH_SCHEME", "w8a8")
    cfg = GLAswaConfig()
    params = build_params(cfg, scheme)
    chunk = int(os.environ.get("BENCH_CHUNK", 4096))
    ecfg = EngineConfig(max_num_seqs=1,
                        max_model_len=prompt_len + gen + 64,
                        prefill_chunk=chunk,
                        prefill_buckets=(chunk,),
                        kv_dtype="bfloat16",
                        decode_block=16)
    eng = Engine(cfg, params, ecfg)
    rs = np.random.RandomState(0)
    prompt = list(rs.randint(0, cfg.vocab_size, size=prompt_len))
    sp = SamplingParams(temperature=0.0, max_tokens=gen, ignore_eos=True)

    t0 = time.perf_counter()
    eng.generate([prompt], sp)
    print(f"warmup1 {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    eng.generate([prompt], sp)
    print(f"warmup2 {time.perf_counter()-t0:.1f}s", flush=True)

    # timed run, per-step
    eng.add_request(prompt, sp)
    steps = []
    while eng.has_work():
        t0 = time.perf_counter()
        eng.step()
        jax.block_until_ready(eng.cache["layers"][0]["state"])
        steps.append(time.perf_counter() - t0)
    pre_steps = prompt_len // chunk
    pre = steps[:pre_steps]
    dec = steps[pre_steps:]
    print(f"total {sum(steps)*1e3:.0f}ms  prefill {sum(pre)*1e3:.0f}ms "
          f"({len(pre)} chunks, {np.mean(pre)*1e3:.1f}ms each)  "
          f"decode {sum(dec)*1e3:.0f}ms ({len(dec)} blocks, "
          f"{np.mean(dec)*1e3:.1f}ms each = "
          f"{np.mean(dec)*1e3/16:.2f}ms/tok)", flush=True)
    # prefill flops estimate
    nparams = 7.0e9
    pf = 2 * nparams * prompt_len
    print(f"prefill util vs 394 int8 TOPS: "
          f"{pf/sum(pre)/394e12*100:.0f}%  "
          f"decode bw vs 819GB/s int8 weights(7GB): "
          f"{7.0/ (np.mean(dec)/16) / 819:.2f}x", flush=True)


if __name__ == "__main__":
    main()
