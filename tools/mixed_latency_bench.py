"""Inter-token latency of ACTIVE generations while a long prompt
prefills — the measurement behind VERDICT r3 item 4 (mixed batching).

Scenario: `NUM_DECODES` requests (default 8) are mid-generation when a
`PREFILL_LEN`-token prompt (default 131072) arrives.  Every emitted
token of the active requests is timestamped at harvest; the report
compares inter-token latency during the ingestion window against the
idle (no-prefill) baseline.

With mixed_prefill_decode=True the engine folds one decode step into
every prefill-chunk program, so the worst stall is one chunk; with
False it alternates decode blocks and (capped) prefill chunks — the
old 736 ms p99 prefill-step stall.

Usage: python tools/mixed_latency_bench.py
Env:   BENCH_SCHEME (w8a8), PREFILL_LEN (131072), NUM_DECODES (8),
       CHUNK_ACTIVE (1024), MIXED (1|0), BENCH_SMALL=1
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

from bench import build_params  # noqa: E402
from vllm_hymeta_tpu.config import GLAswaConfig  # noqa: E402
from vllm_hymeta_tpu.engine.engine import Engine, EngineConfig  # noqa: E402
from vllm_hymeta_tpu.engine.sampler import SamplingParams  # noqa: E402


def pctl(xs, q):
    xs = sorted(xs)
    return xs[min(len(xs) - 1, int(len(xs) * q))]


def main():
    scheme = os.environ.get("BENCH_SCHEME", "w8a8")
    prefill_len = int(os.environ.get("PREFILL_LEN", 131072))
    n_dec = int(os.environ.get("NUM_DECODES", 8))
    chunk_active = int(os.environ.get("CHUNK_ACTIVE", 1024))
    mixed = os.environ.get("MIXED", "1") == "1"
    small = os.environ.get("BENCH_SMALL") == "1"

    if small:
        cfg = GLAswaConfig(vocab_size=4096, hidden_size=512,
                           num_hidden_layers=4, num_attention_heads=8,
                           num_key_value_heads=4, intermediate_size=1024,
                           sliding_window=1024)
        prefill_len = min(prefill_len, 8192)
    else:
        cfg = GLAswaConfig()
    params = build_params(cfg, scheme)

    ecfg = EngineConfig(
        max_num_seqs=n_dec + 1,
        max_model_len=prefill_len + 4096,
        prefill_chunk=4096,
        prefill_buckets=(chunk_active, 4096) if chunk_active < 4096
        else (4096,),
        decode_block=8,
        prefill_chunk_active=chunk_active,
        mixed_prefill_decode=mixed)
    eng = Engine(cfg, params, ecfg)
    rs = np.random.RandomState(0)

    # start the decode population and let it reach steady state
    sp = SamplingParams(temperature=0.0, max_tokens=100000,
                        ignore_eos=True)
    dec_ids = [eng.add_request(
        list(rs.randint(0, cfg.vocab_size, size=256)), sp)
        for _ in range(n_dec)]
    while sum(eng.active) < n_dec:
        eng.step()

    # per-request (time, n_tokens) samples
    def snap(stamps):
        t = time.perf_counter()
        for slot, req in eng.slot_req.items():
            if req.req_id in counts:
                if len(req.output) > counts[req.req_id]:
                    for _ in range(len(req.output) - counts[req.req_id]):
                        stamps[req.req_id].append(t)
                    counts[req.req_id] = len(req.output)

    # warm the decode AND mixed-prefill programs (compiles) before any
    # timed window: ingest a short throwaway prompt while decoding
    for _ in range(24):
        eng.step()
    warm = eng.add_request(
        list(rs.randint(0, cfg.vocab_size, size=2 * chunk_active + 7)),
        SamplingParams(temperature=0.0, max_tokens=2, ignore_eos=True))
    while any(r.req_id == warm for r in eng.waiting) or any(
            r.req_id == warm for r in eng.slot_req.values()):
        eng.step()

    counts = {rid: 0 for rid in dec_ids}
    for req in eng.slot_req.values():
        if req.req_id in counts:
            counts[req.req_id] = len(req.output)

    # idle baseline: decode-only steady state
    idle_stamps = {rid: [] for rid in dec_ids}
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < 6.0:
        eng.step()
        snap(idle_stamps)

    # ingestion window: add the long prompt
    long_prompt = list(rs.randint(0, cfg.vocab_size, size=prefill_len))
    big = eng.add_request(long_prompt, SamplingParams(
        temperature=0.0, max_tokens=8, ignore_eos=True))
    busy_stamps = {rid: [] for rid in dec_ids}
    counts = {rid: len(eng.slot_req[next(
        s for s, r in eng.slot_req.items() if r.req_id == rid)].output)
        for rid in dec_ids}
    def big_prefilling():
        if any(r.req_id == big for r in eng.waiting):
            return True
        return any(r.req_id == big and r.prefill_done < len(r.prompt)
                   for r in eng.slot_req.values())

    while big_prefilling():
        eng.step()
        snap(busy_stamps)
    t_ingest = time.perf_counter()

    def inter(stamps):
        gaps = []
        for rid, ts in stamps.items():
            gaps += [b - a for a, b in zip(ts, ts[1:]) if b > a]
        return gaps

    gi = inter(idle_stamps)
    gb = inter(busy_stamps)
    idle_tok = sum(len(v) for v in idle_stamps.values())
    busy_tok = sum(len(v) for v in busy_stamps.values())
    busy_dur = t_ingest - min(min(v) for v in busy_stamps.values()
                              if v)
    out = {
        "metric": "mixed_load_intertoken_latency",
        "scheme": scheme, "mixed": mixed,
        "prefill_len": prefill_len, "num_decodes": n_dec,
        "chunk_active": chunk_active,
        # arrival-event gaps per request: the stall a client observes
        # between receiving anything (tokens inside one harvest burst
        # share a timestamp and don't count as gaps)
        "idle_p50_ms": round(pctl(gi, 0.50) * 1e3, 1),
        "idle_p99_ms": round(pctl(gi, 0.99) * 1e3, 1),
        "busy_p50_ms": round(pctl(gb, 0.50) * 1e3, 1),
        "busy_p99_ms": round(pctl(gb, 0.99) * 1e3, 1),
        "idle_decode_tok_s": round(idle_tok / 6.0, 1),
        "busy_decode_tok_s": round(busy_tok / max(busy_dur, 1e-9), 1),
        "ingest_s": round(busy_dur, 2),
        "busy_tokens": busy_tok,
    }
    print(json.dumps(out), flush=True)
    # drain
    for rid in dec_ids:
        eng.cancel_request(rid)
    while eng.has_work():
        eng.step()


if __name__ == "__main__":
    main()
