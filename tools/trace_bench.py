"""Device-trace profiling of the bench workload.

Captures a jax.profiler trace around a few engine steps (prefill chunks
and decode blocks) and aggregates per-op DEVICE time from the perfetto
trace — immune to the axon tunnel's host-side timing noise.

Usage: python tools/trace_bench.py [out_dir]
Env:   BENCH_PROMPT/BENCH_SCHEME as bench.py; TRACE_TOP (default 25)
"""
import collections
import glob
import gzip
import json
import os
import re
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))

import jax
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import build_params
from vllm_hymeta_tpu.config import GLAswaConfig
from vllm_hymeta_tpu.engine.engine import Engine, EngineConfig
from vllm_hymeta_tpu.engine.sampler import SamplingParams


def aggregate(trace_dir: str, top: int = 25):
    path = sorted(glob.glob(
        os.path.join(trace_dir, "plugins/profile/*/*.trace.json.gz")))[-1]
    with gzip.open(path) as f:
        tr = json.load(f)
    ev = tr["traceEvents"]
    pids = {e["pid"]: e["args"].get("name") for e in ev
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    tpu_pids = {p for p, n in pids.items() if n and "TPU" in n}

    def key_of(e):
        ln = e.get("args", {}).get("long_name")
        if not ln:
            return e["name"]
        # "%fusion.123 = bf16[4096,3584]{...} fusion(...)" -> opname+shape
        m = re.match(r"%([\w.\-]+) = (\S+?)\{", ln)
        if not m:
            return e["name"]
        base = re.sub(r"\.\d+$", "", m.group(1))
        return f"{base} {m.group(2)}"

    durs = collections.Counter()
    bbytes = collections.Counter()
    counts = collections.Counter()
    total = 0.0
    for e in ev:
        if e.get("ph") != "X" or e.get("pid") not in tpu_pids:
            continue
        if e.get("tid") == 2:   # the jit-program lane double-counts ops
            continue
        k = key_of(e)
        d = e.get("dur", 0)
        durs[k] += d
        counts[k] += 1
        bbytes[k] += int(e.get("args", {}).get("bytes_accessed", 0))
        total += d
    print(f"\n=== device time total {total/1e3:.1f}ms "
          f"(top {top} ops) ===")
    for name, d in durs.most_common(top):
        gbs = bbytes[name] / 1e9 / (d / 1e6) if d else 0.0
        print(f"{d/1e3:9.2f}ms {counts[name]:5d}x {gbs:7.0f}GB/s  "
              f"{name[:110]}")
    return durs, total


def main():
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jaxtrace_bench"
    prompt_len = int(os.environ.get("BENCH_PROMPT", 32768))
    scheme = os.environ.get("BENCH_SCHEME", "w8a8")
    cfg = GLAswaConfig()
    params = build_params(cfg, scheme)
    chunk = int(os.environ.get("BENCH_CHUNK", 4096))
    ecfg = EngineConfig(max_num_seqs=1,
                        max_model_len=prompt_len + 128 + 64,
                        prefill_chunk=chunk,
                        prefill_buckets=(chunk,),
                        kv_dtype="bfloat16",
                        decode_block=int(os.environ.get("BENCH_DECODE_BLOCK", 32)))
    eng = Engine(cfg, params, ecfg)
    rs = np.random.RandomState(0)
    prompt = list(rs.randint(0, cfg.vocab_size, size=prompt_len))
    sp = SamplingParams(temperature=0.0,
                        max_tokens=4 * ecfg.decode_block,
                        ignore_eos=True)

    t0 = time.perf_counter()
    eng.generate([prompt], sp)
    print(f"warmup {time.perf_counter()-t0:.1f}s", flush=True)

    # throwaway capture: the first trace of a process tends to miss
    # already-compiled programs' events
    jax.profiler.start_trace(os.path.join(out_dir, "warm"))
    eng.generate([prompt[:chunk]], sp)
    jax.profiler.stop_trace()

    # traced run: 2 prefill chunks
    eng.add_request(prompt[:2 * chunk], sp)
    jax.profiler.start_trace(os.path.join(out_dir, "prefill"))
    eng.step()
    eng.step()
    np.asarray(eng.cache["layers"][0][
        next(iter(eng.cache["layers"][0]))])[:1]
    jax.profiler.stop_trace()

    # decode: dispatch + harvest one full block INSIDE the trace window
    # (a block dispatched before start_trace executes immediately on the
    # idle device, so its events would land outside the capture)
    eng.step()   # dispatch block 1
    eng.step()   # harvest block 1 -> device idle
    jax.profiler.start_trace(os.path.join(out_dir, "decode"))
    eng.step()   # dispatch block 2
    eng.step()   # harvest block 2 (blocks on its device-side tokens)
    jax.profiler.stop_trace()
    while eng.has_work():
        eng.step()

    top = int(os.environ.get("TRACE_TOP", 25))
    print("\n################ PREFILL (2 chunks of", chunk, ")")
    aggregate(os.path.join(out_dir, "prefill"), top)
    print("\n################ DECODE (1 block of", ecfg.decode_block, ")")
    aggregate(os.path.join(out_dir, "decode"), top)


if __name__ == "__main__":
    main()
