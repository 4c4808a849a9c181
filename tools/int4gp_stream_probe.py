"""Head-to-head device stream rate: native-s4 grouped matvec kernel
(int4g, conversion hoisted/excluded) vs the sublane-packed int8 kernel
(int4gp, in-kernel pltpu.bitcast).  Chained-loop harness over L distinct
weight sets (VMEM cannot cache; every step is a real HBM stream), host
readback (block_until_ready is async-weak over axon).

Usage: python tools/int4gp_stream_probe.py   (on the chip)
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from vllm_hymeta_tpu.ops import quant_matmul as qm

K, N, g = 3584, 18944 * 2, 64
G = K // g
M = 8
L = 8
STEPS = 128   # dilutes the hoisted 8-set conversion in the int4g run
              # to ~0.04 ms/step of pollution


def main():
    rs = np.random.RandomState(0)
    perk, bn = qm._pick_perk_bn(G, N, g)
    print(f"gate_up shape K={K} N={N} g={g}; perk={perk} bn={bn}")
    qw4s = [jnp.asarray(rs.randint(-128, 128, (K // 2, N), "int8"))
            for _ in range(L)]
    qw4ps = [jnp.asarray(np.asarray(qm.pack_int4_sublane(q, g)))
             for q in qw4s]
    s3 = jnp.ones((G, 1, N), jnp.bfloat16) * 0.01
    z3 = jnp.zeros((G, 1, N), jnp.bfloat16)
    xg = jnp.asarray(rs.randint(-127, 127, (G, M, g)).astype(np.int8))
    xs = jnp.ones((M, 1), jnp.float32)

    def loop(body, wsets, prepare=None):
        @jax.jit
        def run(xg, *ws):
            ops = [prepare(w) if prepare else w for w in ws]

            def step(i, carry):
                y = jax.lax.switch(
                    i % L, [lambda c, w=w: body(c, w) for w in ops],
                    carry)
                return carry + jnp.sum(y.astype(jnp.float32)) * 1e-9

            return jax.lax.fori_loop(0, STEPS, step, jnp.float32(0)) \
                + jnp.sum(xg)
        return lambda xg: run(xg, *wsets)

    def body_g(c, w4g):
        return qm._int4g_matvec_pallas(xg, w4g, s3, z3, xs, perk, bn,
                                       True, jnp.bfloat16)

    def body_gp(c, wpk):
        return qm._int4gp_matvec_pallas(xg, wpk, s3, z3, xs, perk, bn,
                                        True, jnp.bfloat16)

    variants = {
        "int4g native-s4": loop(body_g, qw4s,
                                prepare=lambda q: qm.qw4_to_grouped_s4(
                                    q, g)),
        "int4gp packed-i8": loop(body_gp, qw4ps),
    }
    phys = K * N / 2 + 2 * G * N * 4
    for name, fn in variants.items():
        np.asarray(fn(xg))
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            np.asarray(fn(xg))
            ts.append(time.perf_counter() - t0)
        t = min(ts) / STEPS
        print(f"{name:18s}: {t*1e3:7.3f} ms/step "
              f"({phys/t/1e9:6.0f} GB/s physical)")


if __name__ == "__main__":
    main()
