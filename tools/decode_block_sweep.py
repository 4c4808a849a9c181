"""decode_block latency/throughput trade curve (VERDICT r4 #7).

For decode_block in {1,4,8,16,32}: run a steady decode population of 8
generations (w8a8 by default, real 7B dims) and record every token's
arrival time at the HOST (the same boundary a server client observes —
tokens surface at harvest, so larger blocks quantize the cadence).
Reports inter-token latency p50/p99 per client and total generated
tokens/s.

Usage: python tools/decode_block_sweep.py
Env:   BENCH_SCHEME (w8a8), NUM_DECODES (8), BLOCKS ("1,4,8,16,32"),
       WINDOW_S (8), BENCH_SMALL=1 for a CPU smoke.
"""
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import build_params                              # noqa: E402
from vllm_hymeta_tpu.config import GLAswaConfig             # noqa: E402
from vllm_hymeta_tpu.engine.engine import Engine, EngineConfig  # noqa
from vllm_hymeta_tpu.engine.sampler import SamplingParams   # noqa: E402


def run_block(cfg, params, block: int, n_dec: int, window_s: float):
    ecfg = EngineConfig(
        max_num_seqs=n_dec,
        max_model_len=8192 + 512,
        prefill_chunk=4096,
        prefill_buckets=(512,),
        decode_block=block)
    eng = Engine(cfg, params, ecfg)
    rs = np.random.RandomState(0)
    sp = SamplingParams(temperature=0.0, max_tokens=100000,
                        ignore_eos=True)
    ids = [eng.add_request(
        list(rs.randint(0, cfg.vocab_size, size=256)), sp)
        for _ in range(n_dec)]
    while sum(eng.active) < n_dec:
        eng.step()
    for _ in range(30):                     # warm the block program
        eng.step()

    counts = {}
    for req in eng.slot_req.values():
        counts[req.req_id] = len(req.output)
    stamps = {rid: [] for rid in ids}
    t0 = time.perf_counter()
    total0 = sum(counts.values())
    while time.perf_counter() - t0 < window_s:
        eng.step()
        t = time.perf_counter()
        for req in eng.slot_req.values():
            n_new = len(req.output) - counts[req.req_id]
            if n_new > 0:
                stamps[req.req_id].extend([t] * n_new)
                counts[req.req_id] = len(req.output)
    elapsed = time.perf_counter() - t0
    total = sum(counts.values()) - total0

    gaps = []
    for ts in stamps.values():
        gaps += [b - a for a, b in zip(ts, ts[1:]) if b > a]
    gaps = np.asarray(sorted(gaps))
    p50 = float(np.percentile(gaps, 50) * 1e3) if len(gaps) else 0.0
    p99 = float(np.percentile(gaps, 99) * 1e3) if len(gaps) else 0.0
    return {
        "decode_block": block,
        "itl_p50_ms": round(p50, 2),
        "itl_p99_ms": round(p99, 2),
        "gen_tokens_per_s": round(total / elapsed, 1),
        "ms_per_token_per_seq": round(1e3 * elapsed * n_dec / max(total, 1),
                                      3),
    }


def main():
    scheme = os.environ.get("BENCH_SCHEME", "w8a8")
    n_dec = int(os.environ.get("NUM_DECODES", 8))
    blocks = [int(b) for b in
              os.environ.get("BLOCKS", "1,4,8,16,32").split(",")]
    window_s = float(os.environ.get("WINDOW_S", 8))
    if os.environ.get("BENCH_SMALL") == "1":
        cfg = GLAswaConfig(vocab_size=4096, hidden_size=512,
                           num_hidden_layers=4, num_attention_heads=8,
                           num_key_value_heads=4, intermediate_size=1024,
                           sliding_window=1024)
    else:
        cfg = GLAswaConfig()
    params = build_params(cfg, scheme)
    for b in blocks:
        r = run_block(cfg, params, b, n_dec, window_s)
        print(json.dumps({"metric": "decode_block_trade", "scheme": scheme,
                          **r}), flush=True)


if __name__ == "__main__":
    main()
