"""Split-T prefill accounting (VERDICT r4 item 9).

The r3 done-criterion — "mesh single-long-prompt prefill ~= single-chip
time x (1/dp + eps)" — needs a dp>1 wall-clock, and no TPU pod exists
here.  A CPU-mesh wall-clock is NOT honest evidence either: one XLA CPU
device already multithreads across every host core, so virtual devices
add zero compute (this box has 2 cores; a first cut of this tool showed
dp=2 "1.24x slower", which measures core contention, not sharding).

What transfers instead is the COMPILED COST MODEL: XLA's per-rank FLOP
count and the collective bytes it inserts.  Split-T's per-rank FLOPs
must be ~ full/dp (each rank computes T/dp tokens through every matmul)
plus an all-gather of the chunk's K/V (the only cross-rank term); the
replicated owner-masked path's per-rank FLOPs equal the full count.  On
real chips, time ~ max(FLOPs/rank / peak, bytes/ICI_bw), so FLOPs/rank
at 1/dp + a comm term that is <2% of the compute bytes IS the 1/dp + eps
criterion, stated in the units the hardware obeys.

Usage: python tools/splitT_bench.py   (prints one JSON line per config)
"""

import json
import os
import sys

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from vllm_hymeta_tpu.cache import CacheConfig
from vllm_hymeta_tpu.config import GLAswaConfig
from vllm_hymeta_tpu.models import gla_swa
from vllm_hymeta_tpu.parallel import step
from vllm_hymeta_tpu.parallel.mesh import make_mesh

T = 2048


def analyze(fn, args, donate=(2,)):
    lowered = jax.jit(fn, donate_argnums=donate).lower(*args)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    return ca


def main():
    cfg = GLAswaConfig(vocab_size=8192, hidden_size=1024,
                       num_hidden_layers=8, num_attention_heads=8,
                       num_key_value_heads=4, intermediate_size=2816,
                       sliding_window=1024)
    params = gla_swa.init_params(cfg, jax.random.PRNGKey(0),
                                 dtype=jnp.float32)
    cc = CacheConfig(max_num_seqs=4, max_model_len=4 * T)
    rs = np.random.RandomState(0)
    tokens = jnp.asarray(rs.randint(0, cfg.vocab_size, size=(T,)))
    s0, p0, nv = jnp.int32(0), jnp.int32(0), jnp.int32(T)

    # single-device golden FLOP count
    cache1 = gla_swa.init_cache(cfg, cc)

    def single(params, meta, cache, toks, slot, pos0, n_valid):
        return gla_swa.prefill(cfg, params, cache, toks, slot, pos0,
                               n_valid, need_logits=True)

    ca1 = analyze(single, (params, None, cache1, tokens, s0, p0, nv))
    f1 = ca1["flops"]
    print(json.dumps({"splitT_prefill": "dp=1 single device",
                      "chunk_tokens": T, "gflops": round(f1 / 1e9, 2),
                      "flops_per_rank_vs_single": 1.0}))

    for dp, kind in ((2, "replicated"), (2, "split"), (4, "split")):
        mesh = make_mesh(tp=1, dp=dp, devices=jax.devices()[:dp])
        cache = gla_swa.init_cache(cfg, cc)
        params_s, cache_s, _ = step.place_all(cfg, mesh, params, cache,
                                              None)
        mk = (step.make_local_prefill_split if kind == "split"
              else step.make_local_prefill)
        fn = mk(cfg, mesh, params, cache, None)
        ca = analyze(fn, (params_s, None, cache_s, tokens, s0, p0, nv))
        # cost_analysis reports the PER-DEVICE SPMD program (verified
        # against a hand-sharded matmul: a [4096/4 x 1024 x 1024] shard
        # reports exactly the per-device count)
        f = ca["flops"]
        print(json.dumps({
            "splitT_prefill": f"dp={dp} {kind}",
            "chunk_tokens": T,
            "gflops_per_rank": round(f / 1e9, 2),
            "flops_per_rank_vs_single": round(f / f1, 3),
            "ideal": 1.0 if kind == "replicated" else round(1.0 / dp, 3),
        }))


if __name__ == "__main__":
    main()
