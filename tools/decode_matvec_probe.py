"""Isolate the decode-step down_proj slice-copy problem (round-4 trace:
`slice-done s8[4736,3584]` x4 per layer-step = ~2.4ms/step of copied
weight bytes) and compare matvec variants inside a fori_loop, the way
the fused decode block runs.

Usage: python tools/decode_matvec_probe.py
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

K, N = 18944, 3584
STEPS = 32
M = 1


def bench(fn, *args, reps=5):
    fn(*args)[0].block_until_ready() if isinstance(fn(*args), tuple) else \
        jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def loop_of(body, n=STEPS):
    @jax.jit
    def run(x0, *ws):
        def step(i, x):
            y = body(x, *ws)
            # depend on EVERY output element so nothing is DCE'd
            return (x + jnp.sum(y.astype(jnp.float32)) * 1e-30).astype(
                x.dtype)
        return jax.lax.fori_loop(0, n, step, x0)
    return run


def main():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(M, K), jnp.bfloat16)
    qw = jnp.asarray(rng.randint(-127, 127, (K, N)), jnp.int8)
    ws = jnp.asarray(rng.rand(N), jnp.float32)

    t = bench(loop_of(lambda x, qw, ws: qm.w8a8_matmul(x, qw, ws)), x, qw, ws)
    print(f"current w8a8_matmul      : {t/STEPS*1e3:7.3f} ms/step "
          f"({K*N/ (t/STEPS)/1e9:6.0f} GB/s)")

    # variant: single-K-block pallas (grid over N only)
    def full_k(x, qw, ws):
        qx, xs = qm.quantize_per_token(x)
        qx = jnp.pad(qx, ((0, 31), (0, 0)))
        xs = jnp.pad(xs, ((0, 31), (0, 0)))
        return qm._w8a8_matmul_pallas(qx, xs, qw, ws, jnp.bfloat16,
                                      bm=32, bn=128, bk=K)[:M]
    for bn in (128, 256):
        f = functools.partial(
            lambda bn, x, qw, ws: (lambda qx_xs: qm._w8a8_matmul_pallas(
                jnp.pad(qx_xs[0], ((0, 31), (0, 0))),
                jnp.pad(qx_xs[1], ((0, 31), (0, 0))), qw, ws,
                jnp.bfloat16, bm=32, bn=bn, bk=K)[:M])(
                    qm.quantize_per_token(x)), bn)
        t = bench(loop_of(f), x, qw, ws)
        print(f"full-K pallas bn={bn:4d}   : {t/STEPS*1e3:7.3f} ms/step "
              f"({K*N/(t/STEPS)/1e9:6.0f} GB/s)")

    # variant: plain XLA int8 dot
    def xla_dot(x, qw, ws):
        qx, xs = qm.quantize_per_token(x)
        acc = jax.lax.dot_general(qx, qw, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        return (acc.astype(jnp.float32) * xs * ws).astype(jnp.bfloat16)
    t = bench(loop_of(xla_dot), x, qw, ws)
    print(f"plain XLA int8 dot       : {t/STEPS*1e3:7.3f} ms/step "
          f"({K*N/(t/STEPS)/1e9:6.0f} GB/s)")


if __name__ == "__main__":
    main()
