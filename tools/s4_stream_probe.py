"""Isolate the grouped-s4 decode matvec's limiter: DMA vs compute.

Variants over the same [G, g, N] s4 weight layout:
  int4g     — the production kernel (_int4g_matvec_pallas)
  dot-only  — batched int8 dot, no scale/zero epilogue
  noconv    — constant weights (tile streamed, never converted)
  full      — open-coded twin of the production kernel
  stream-i8 — int8 dot at the same PHYSICAL byte count

MEASUREMENT PITFALLS found building this (r4, v5e via axon) — they
invalidate naive wall-clock microbenches on this runtime:
  1. `jax.block_until_ready` is async-weak over the axon tunnel: it
     returns before device execution completes.  A 2.7 GB-of-HBM loop
     "ran" in 64 us (42 TB/s).  Force a HOST READBACK (np.asarray) of
     an output that depends on every iteration.
  2. A weight matrix that fits the 128 MB VMEM gets cached there across
     loop iterations — the stream measures VMEM, not HBM.  Cycle L
     distinct weight sets (lax.switch) with total bytes >> VMEM.
The authoritative component numbers therefore come from DEVICE TRACES
of the real decode step (tools/trace_bench.py, committed in SPEED.md):
the s4 gate_up stream runs at ~875 GB/s physical — at the HBM roofline
— and the remaining decode slack is inter-op glue + the per-block
packed->s4 conversion, not the s4 stream itself.

Usage: python tools/s4_stream_probe.py   (on the chip)
"""

import functools
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from vllm_hymeta_tpu.ops import quant_matmul as qm

# L DISTINCT weights cycled via lax.switch so neither loop-invariant
# hoisting nor VMEM residency can elide the HBM stream (a single 34 MB
# matrix gets VMEM-cached and "streams" at 17 TB/s; even a 272 MB one
# got elided through the chained-carry loop)
K, N, g = 18944, 3584 * 2, 64
L = 8
G = K // g
M = 1
STEPS = 32


def loop_of(body, prepare=None, n=STEPS):
    """Chained-loop timing over L distinct weight sets: iteration i runs
    the kernel on weights i % L via lax.switch, so every iteration
    issues a REAL HBM stream (L x weight bytes cycle, far beyond VMEM).
    `prepare` maps one weight set (packed etc.) to kernel operands, once
    per set, hoisted above the loop."""
    @jax.jit
    def run(xf, wsets):
        ops = [prepare(*w) if prepare is not None else w for w in wsets]
        def step(i, xf):
            y = jax.lax.switch(
                i % len(ops),
                [lambda x, w=w: body(x, *w) for w in ops],
                xf.astype(jnp.int8))
            return (xf + jnp.sum(y.astype(jnp.float32)) * 1e-8
                    ).astype(xf.dtype)
        return jax.lax.fori_loop(0, n, step, xf)
    return run


def bench(fn, *args, reps=5):
    # host readback, NOT block_until_ready — see module docstring #1
    np.asarray(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts) / STEPS


def report(name, t, scale_bytes=True):
    phys = K * N / 2  # weight bytes
    if scale_bytes:
        phys += 2 * G * N * 4  # group scale/zero stream rides along
    print(f"{name:14s}: {t*1e3:7.3f} ms/step  "
          f"({phys/t/1e9:6.0f} GB/s physical, "
          f"{K*N/t/1e9:6.0f} GB/s-of-int4)")


def make_variant(kind: str, perk: int, bn: int):
    k_steps = G // perk

    def kernel(x_ref, w_ref, s_ref, z_ref, o_ref, acc_ref):
        ik = pl.program_id(1)

        @pl.when(ik == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        xg = x_ref[:]
        if kind == "noconv":
            # tile still streamed (blockspec fetch) but never converted:
            # full - noconv = the s4->int8 convert cost
            w = jnp.ones((perk, g, bn), jnp.int8)
        else:
            w = w_ref[:].astype(jnp.int8)
        p = jax.lax.dot_general(
            xg, w, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.int32).astype(jnp.float32)
        if kind == "dot-only":
            acc_ref[:] += jnp.sum(p, axis=0)
        else:
            xsum = jnp.sum(xg.astype(jnp.int32), axis=2
                           ).astype(jnp.float32)
            s = s_ref[:, 0].astype(jnp.float32)
            z = z_ref[:, 0].astype(jnp.float32)
            y = (p - z[:, None, :] * xsum[:, :, None]) * s[:, None, :]
            acc_ref[:] += jnp.sum(y, axis=0)

        @pl.when(ik == k_steps - 1)
        def _():
            o_ref[:] = acc_ref[:]

    @jax.jit
    def run(xg, w4g, s3, z3):
        return pl.pallas_call(
            kernel,
            grid=(N // bn, k_steps),
            in_specs=[
                pl.BlockSpec((perk, M, g), lambda j, k: (k, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((perk, g, bn), lambda j, k: (k, 0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((perk, 1, bn), lambda j, k: (k, 0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((perk, 1, bn), lambda j, k: (k, 0, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((M, bn), lambda j, k: (0, j),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
            scratch_shapes=[pltpu.VMEM((M, bn), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary")),
        )(xg, w4g, s3, z3)

    return run


def main():
    rs = np.random.RandomState(0)
    perk, bn = qm._pick_perk_bn(G, N, g)
    print(f"G={G} g={g} N={N} L={L} perk={perk} bn={bn} "
          f"(tile {perk*g*bn//2/1e6:.2f} MB phys)")

    # s4 can't cross a jit boundary on this runtime (plugin layout bug —
    # see ops/quant_matmul.py): ship split-half packed int8 and convert
    # INSIDE the jit, exactly like prepare_decode_params
    def mk_set(seed):
        r = np.random.RandomState(seed)
        w8 = np.asarray(r.randint(-8, 8, (K, N)), np.int8)
        packed = jnp.asarray(((w8[K // 2:] & 0xF) << 4)
                             | (w8[:K // 2] & 0xF), jnp.int8)
        s3 = jnp.asarray(r.rand(G, 1, N), jnp.float32)
        z3 = jnp.zeros((G, 1, N), jnp.float32)
        return (packed, s3, z3)

    wsets = [mk_set(i) for i in range(L)]
    xg = jnp.asarray(rs.randint(-127, 127, (G, M, g)), jnp.bfloat16)

    def prep(pk, s, z):
        return qm.qw4_to_grouped_s4(pk, g), s, z

    t = bench(loop_of(
        lambda x, w, s, z: qm._int4g_matvec_pallas(
            x, w, s, z, perk, bn, True, jnp.bfloat16), prepare=prep),
        xg, wsets)
    report("int4g (prod)", t)

    for kind in ("dot-only", "noconv", "full"):
        t = bench(loop_of(make_variant(kind, perk, bn), prepare=prep),
                  xg, wsets)
        report(kind, t)

    # int8 stream ceiling at the same PHYSICAL byte count: [G, g/2, N]

    def kernel8(x_ref, w_ref, o_ref, acc_ref):
        ik = pl.program_id(1)

        @pl.when(ik == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)
        p = jax.lax.dot_general(
            x_ref[:], w_ref[:], (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.int32)
        acc_ref[:] += jnp.sum(p, axis=0).astype(jnp.float32)

        @pl.when(ik == G // perk - 1)
        def _():
            o_ref[:] = acc_ref[:]

    @jax.jit
    def run8(x, w):
        return pl.pallas_call(
            kernel8,
            grid=(N // bn, G // perk),
            in_specs=[pl.BlockSpec((perk, M, g // 2),
                                   lambda j, k: (k, 0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((perk, g // 2, bn),
                                   lambda j, k: (k, 0, j),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((M, bn), lambda j, k: (0, j),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
            scratch_shapes=[pltpu.VMEM((M, bn), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary")),
        )(x, w)

    wsets8 = [(jnp.asarray(np.random.RandomState(100 + i).randint(
        -127, 127, (G, g // 2, N)), jnp.int8),) for i in range(L)]
    t = bench(loop_of(lambda x, w: run8(x[:, :, :g // 2], w)),
              xg, wsets8)
    report("stream-i8", t, scale_bytes=False)


if __name__ == "__main__":
    main()
