"""Isolate the grouped-s4 decode matvec's limiter: DMA vs compute.

The committed trace has the s4 path at ~440 GB/s physical (~56% of the
measured 780 GB/s streaming peak).  Variants, all over the same
[G, g, N] s4 weight layout and timed as chained fori_loop steps like the
fused decode block:

  int4g        — the production kernel (_int4g_matvec_pallas)
  stream-s4    — same grid/blocks, kernel body reduced to a tile sum
                 (pure s4 DMA ceiling)
  stream-i8    — identical ELEMENT count int8 tile sum (DMA ceiling for
                 int8; same element count = 2x the physical bytes)
  dot-only     — the batched int8 dot without the scale/zero epilogue
  epilogue     — full kernel with conversion replaced by a constant
                 (isolates the s4->int8 convert cost)

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

K, N, g = 18944, 3584, 64
G = K // g
M = 1
STEPS = 32


def loop_of(body, prepare=None, n=STEPS):
    """Chained-loop timing.  The carry is the bf16 activation; each step
    requantizes it to int8 inside the loop — an int8 carry lets XLA
    prove the add-epsilon roundtrip is a no-op and HOIST the kernel out
    of the loop (first probe attempt measured 16 TB/s...)."""
    @jax.jit
    def run(xf, *ws):
        if prepare is not None:
            ws = prepare(*ws)   # hoisted above the loop (once per call)
        def step(i, xf):
            y = body(xf.astype(jnp.int8), *ws)
            return xf + jnp.sum(y.astype(jnp.float32)) * 1e-30
        return jax.lax.fori_loop(0, n, step, xf)
    return run


def bench(fn, *args, reps=5):
    jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts) / STEPS


def report(name, t):
    phys = K * N / 2  # bytes
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
    print(f"G={G} g={g} N={N} perk={perk} bn={bn} "
          f"(tile {perk*g*bn//2/1e6:.2f} MB phys)")
    # s4 can't cross a jit boundary on this runtime (plugin layout bug —
    # see ops/quant_matmul.py): ship split-half packed int8 and convert
    # INSIDE the jit, exactly like prepare_decode_params
    w8 = np.asarray(rs.randint(-8, 8, (K, N)), np.int8)
    packed = jnp.asarray(((w8[K // 2:] & 0xF) << 4)
                         | (w8[:K // 2] & 0xF), jnp.int8)
    s3 = jnp.asarray(rs.rand(G, 1, N), jnp.float32)
    z3 = jnp.zeros((G, 1, N), jnp.float32)
    xg = jnp.asarray(rs.randint(-127, 127, (G, M, g)), jnp.bfloat16)

    def prep(pk, s, z):
        return qm.qw4_to_grouped_s4(pk, g), s, z

    # production kernel (conversion hoisted above the chained loop, once
    # per call — the loop body streams the converted s4 array)
    t = bench(loop_of(
        lambda x, w, s, z: qm._int4g_matvec_pallas(
            x, w, s, z, perk, bn, True, jnp.bfloat16), prepare=prep),
        xg, packed, s3, z3)
    report("int4g (prod)", t)

    for kind in ("dot-only", "noconv", "full"):
        t = bench(loop_of(make_variant(kind, perk, bn), prepare=prep),
                  xg, packed, s3, z3)
        report(kind, t)

    # int8 stream ceiling at the same PHYSICAL byte count: [G, g/2, N]
    w8h = jnp.asarray(rs.randint(-127, 127, (G, g // 2, N)), jnp.int8)

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

    t = bench(loop_of(lambda x, w: run8(x[:, :, :g // 2], w)), xg, w8h)
    report("stream-i8", t)


if __name__ == "__main__":
    main()
