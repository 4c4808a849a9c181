"""Probe: can the per-decode-block packed->s4 conversion become a free
bitcast?  (VERDICT r4 weak #2: qw4_to_grouped_s4 re-runs every decode
block, ~0.35 ms/token amortized at block 64.)

Idea: store the weight host-side as int8 [G, g, N/2] with two adjacent
N-columns per byte; inside the decode program
`jax.lax.bitcast_convert_type(., jnp.int4)` yields s4 [G, g, N/2, 2]
with NO VPU unpack arithmetic.  Questions this probe answers on chip:
  1. does int8->int4 bitcast lower on this runtime, and which nibble
     order does it use?
  2. does reshape [G, g, N/2, 2] -> [G, g, N] of the bitcast result
     produce correct values (s4 minor-dim reshapes are known to
     miscompile in general)?
  3. wall cost of bitcast(+reshape) vs qw4_to_grouped_s4 at the real
     gate_up size.

Usage: python tools/s4_bitcast_probe.py   (on the chip)
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


def main():
    rs = np.random.RandomState(0)
    K, N, g = 3584, 18944 * 2, 64  # gate_up size
    G = K // g
    w8 = rs.randint(-8, 8, size=(K, N)).astype(np.int8)

    # reference s4 path (from the split-half packed int8 layout)
    qw4 = np.asarray(qm.pack_int4(jnp.asarray(w8)))

    @jax.jit
    def ref(qw4):
        return qm.qw4_to_grouped_s4(qw4, g).astype(jnp.int8)

    want = np.asarray(ref(jnp.asarray(qw4)))  # int8 [G, g, N]

    # candidate: nibble-pack along N on the host, bitcast in-jit
    u = (w8.astype(np.int16) & 0xF).astype(np.uint8).reshape(G, g, N // 2, 2)
    lo_first = (u[..., 0] | (u[..., 1] << 4)).astype(np.int8)
    hi_first = (u[..., 1] | (u[..., 0] << 4)).astype(np.int8)

    @jax.jit
    def cand4d(b):
        return jax.lax.bitcast_convert_type(b, jnp.int4).astype(jnp.int8)

    @jax.jit
    def cand3d(b):
        s4 = jax.lax.bitcast_convert_type(b, jnp.int4)
        return s4.reshape(G, g, N).astype(jnp.int8)

    for name, packed in (("lo_first", lo_first), ("hi_first", hi_first)):
        try:
            got = np.asarray(cand4d(jnp.asarray(packed)))
            ok = bool((got.reshape(G, g, N) == want).all())
            print(f"bitcast 4d {name}: lowers, match={ok}")
        except Exception as e:
            print(f"bitcast 4d {name}: FAILS: {type(e).__name__}: {e}")
            continue
        try:
            got3 = np.asarray(cand3d(jnp.asarray(packed)))
            print(f"bitcast 3d-reshape {name}: lowers, "
                  f"match={bool((got3 == want).all())}")
        except Exception as e:
            print(f"bitcast 3d-reshape {name}: FAILS: "
                  f"{type(e).__name__}: {e}")

    # timing: conversion cost per call, old vs new (output consumed by a
    # trivial reduce so the conversion cannot be elided; host readback
    # forces completion — block_until_ready is async-weak over axon)
    x = jnp.asarray(rs.randn(1, K).astype(np.float32), jnp.bfloat16)

    @jax.jit
    def old_mv(qw4, x):
        w4g = qm.qw4_to_grouped_s4(qw4, g)
        s3 = jnp.ones((G, 1, N), jnp.bfloat16)
        z3 = jnp.zeros((G, 1, N), jnp.bfloat16)
        return qm.int4g_matvec(x, w4g, s3, z3)

    @jax.jit
    def new_mv(b, x):
        w4g = jax.lax.bitcast_convert_type(b, jnp.int4).reshape(G, g, N)
        s3 = jnp.ones((G, 1, N), jnp.bfloat16)
        z3 = jnp.zeros((G, 1, N), jnp.bfloat16)
        return qm.int4g_matvec(x, w4g, s3, z3)

    qw4_d = jnp.asarray(qw4)
    b_d = jnp.asarray(lo_first)
    for name, fn, arg in (("old (unpack+astype)", old_mv, qw4_d),
                          ("new (bitcast)", new_mv, b_d)):
        try:
            np.asarray(fn(arg, x))  # compile
            t0 = time.perf_counter()
            reps = 20
            for _ in range(reps):
                out = fn(arg, x)
            np.asarray(out)
            dt = (time.perf_counter() - t0) / reps * 1e3
            print(f"{name}: {dt:.3f} ms/call (matvec incl. conversion)")
        except Exception as e:
            print(f"{name}: FAILS: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
