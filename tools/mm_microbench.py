"""Micro-benchmark of prefill/decode matmul variants on the real chip.

Answers: which int8 matmul formulation gets closest to the v5e MXU
speed-of-light (394 int8 TOPS / 197 bf16 TFLOPS), and what decode-matvec
bandwidth each weight layout sustains (roofline: 819 GB/s HBM).

Usage:  python tools/mm_microbench.py [prefill|decode|all]
"""
import functools
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vllm_hymeta_tpu.ops import quant_matmul as qm


def timeit(fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def bench_prefill():
    key = jax.random.PRNGKey(0)
    # 7B shapes: h=3584, inter=18944(ish); qkv fused ~ 3584->4608; mlp 3584->37888
    shapes = [
        (4096, 3584, 4608),
        (4096, 3584, 37888 // 2),   # gate_up halves
        (4096, 18944, 3584),        # down proj
        (4096, 3584, 3584),
    ]
    for M, K, N in shapes:
        x = jax.random.normal(key, (M, K), jnp.bfloat16)
        w8 = jax.random.randint(key, (K, N), -127, 127, jnp.int8)
        ws = jnp.ones((N,), jnp.float32) * 0.01
        wbf = w8.astype(jnp.bfloat16) * 0.01
        flops = 2.0 * M * K * N

        t = timeit(jax.jit(lambda a, b: a @ b), x, wbf)
        print(f"[{M}x{K}x{N}] bf16xbf16 XLA:      {t*1e3:7.2f}ms "
              f"{flops/t/1e12:6.1f} TOPS")

        qx, xs = qm.quantize_per_token(x)
        dotfn = jax.jit(functools.partial(
            jax.lax.dot_general,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32))
        t = timeit(dotfn, qx, w8)
        print(f"[{M}x{K}x{N}] int8 dot (prequant): {t*1e3:7.2f}ms "
              f"{flops/t/1e12:6.1f} TOPS")

        t = timeit(jax.jit(qm.w8a8_matmul_ref), x, w8, ws)
        print(f"[{M}x{K}x{N}] w8a8_ref (XLA):      {t*1e3:7.2f}ms "
              f"{flops/t/1e12:6.1f} TOPS")

        for bm, bn, bk in [(256, 512, 512), (512, 512, 1024),
                           (256, 1024, 512), (512, 1024, 512),
                           (1024, 512, 512)]:
            if bk > K or bn > N or bm > M:
                continue
            try:
                t = timeit(jax.jit(functools.partial(
                    qm._w8a8_matmul_pallas, out_dtype=jnp.bfloat16,
                    bm=bm, bn=bn, bk=bk)), qx, xs, w8, ws)
                print(f"[{M}x{K}x{N}] w8a8 pallas {bm},{bn},{bk}: "
                      f"{t*1e3:7.2f}ms {flops/t/1e12:6.1f} TOPS")
            except Exception as e:
                print(f"[{M}x{K}x{N}] pallas {bm},{bn},{bk}: "
                      f"{type(e).__name__}")
        print()


def bench_decode():
    key = jax.random.PRNGKey(0)
    shapes = [
        (1, 3584, 4608),
        (8, 3584, 4608),
        (1, 3584, 18944),
        (1, 18944, 3584),
    ]
    for M, K, N in shapes:
        x = jax.random.normal(key, (M, K), jnp.bfloat16)
        w8 = jax.random.randint(key, (K, N), -127, 127, jnp.int8)
        ws = jnp.ones((N,), jnp.float32) * 0.01
        nbytes = K * N  # int8 weight read dominates
        t = timeit(jax.jit(qm.w8a8_matmul), x, w8, ws, iters=50)
        print(f"[{M}x{K}x{N}] w8a8 dispatch: {t*1e6:7.0f}us "
              f"{nbytes/t/1e9:6.0f} GB/s")

        qw = jax.random.randint(key, (K, N), -8, 8, jnp.int8)
        qw4 = qm.pack_int4(qw)
        sc = jnp.ones((K // 64, N), jnp.bfloat16)
        zr = jnp.zeros((K // 64, N), jnp.bfloat16)
        t = timeit(jax.jit(qm.int4_matmul), x, qw4, sc, zr, iters=50)
        print(f"[{M}x{K}x{N}] int4 dispatch: {t*1e6:7.0f}us "
              f"{(nbytes//2 + sc.size*4)/t/1e9:6.0f} GB/s-equiv")
        print()


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    print("devices:", jax.devices())
    if which in ("prefill", "all"):
        bench_prefill()
    if which in ("decode", "all"):
        bench_decode()
