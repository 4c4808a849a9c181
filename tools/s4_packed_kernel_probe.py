"""Probe: grouped-int4 decode matvec reading PACKED int8 directly,
unpacking per-tile via an in-kernel bitcast (int8 -> s4 [.,2] -> int8)
— eliminating the per-decode-block qw4_to_grouped_s4 materialization
(~0.35 ms/token amortized, VERDICT r4 weak #2) if Mosaic lowers the
bitcast to the same hardware nibble-unpack a native s4 tile load uses.

Host layout: int8 [G, g, N/2], byte c = (col 2c+1 << 4) | col 2c
("lo_first" — matches jax.lax.bitcast_convert_type order, verified
on-chip by tools/s4_bitcast_probe.py).

Usage: python tools/s4_packed_kernel_probe.py   (on the chip)
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

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from vllm_hymeta_tpu.ops import quant_matmul as qm


def _kernel(x_ref, w_ref, s_ref, z_ref, xs_ref, o_ref, acc_ref, *,
            k_steps: int, bn: int):
    ik = pl.program_id(1)

    @pl.when(ik == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    xg = x_ref[:]                                  # int8 [perk, M, g]
    # pltpu.bitcast splits the SUBLANE dim: int8 [perk, g/2, bn] ->
    # s4 [perk, g, bn] (jax.lax.bitcast_convert_type's lane-dim split
    # does not lower in Mosaic: "Changing bitwidths not supported")
    w = pltpu.bitcast(w_ref[:], jnp.int4).astype(jnp.int8)
    p = jax.lax.dot_general(
        xg, w, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.int32).astype(jnp.float32)
    xsum = jnp.sum(xg.astype(jnp.int32), axis=2).astype(jnp.float32)
    s = s_ref[:, 0].astype(jnp.float32)
    z = z_ref[:, 0].astype(jnp.float32)
    y = (p - z[:, None, :] * xsum[:, :, None]) * s[:, None, :]
    acc_ref[:] += jnp.sum(y, axis=0)

    @pl.when(ik == k_steps - 1)
    def _():
        o_ref[:] = (acc_ref[:] * xs_ref[:].astype(jnp.float32)
                    ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("perk", "bn"))
def packed_matvec(xg, wpk, s3, z3, xscale, perk, bn):
    G, M, g = xg.shape
    N = wpk.shape[2]
    k_steps = G // perk
    return pl.pallas_call(
        functools.partial(_kernel, k_steps=k_steps, bn=bn),
        grid=(N // bn, k_steps),
        in_specs=[
            pl.BlockSpec((perk, M, g), lambda j, k: (k, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((perk, g // 2, bn), lambda j, k: (k, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((perk, 1, bn), lambda j, k: (k, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((perk, 1, bn), lambda j, k: (k, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((M, 1), lambda j, k: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((M, bn), lambda j, k: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((M, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * G * g,
            bytes_accessed=G * g * N // 2 + G * N * 4 + M * N * 2,
            transcendentals=0),
    )(xg, wpk, s3, z3, xscale)


def main():
    rs = np.random.RandomState(0)
    K, N, g = 3584, 18944 * 2, 64
    G = K // g
    M = 8
    w8 = rs.randint(-8, 8, size=(K, N)).astype(np.int8)
    qw4 = jnp.asarray(np.asarray(qm.pack_int4(jnp.asarray(w8))))
    w3 = w8.reshape(G, g, N)
    u = (w3.astype(np.int16) & 0xF).astype(np.uint8)
    # nibble-pack along the g (sublane) dim, both candidate orders
    wpk_lo = jnp.asarray((u[:, 0::2] | (u[:, 1::2] << 4)).astype(np.int8))
    wpk_hi = jnp.asarray((u[:, 1::2] | (u[:, 0::2] << 4)).astype(np.int8))

    s_np = rs.rand(G, 1, N).astype(np.float32) * 0.1
    z_np = rs.randint(-4, 4, size=(G, 1, N)).astype(np.float32)
    s3 = jnp.asarray(s_np, jnp.bfloat16)
    z3 = jnp.asarray(z_np, jnp.bfloat16)
    xg8 = jnp.asarray(
        rs.randint(-127, 127, size=(G, M, g)).astype(np.int8))
    xscale = jnp.ones((M, 1), jnp.float32)
    perk, bn = qm._pick_perk_bn(G, N, g)
    print(f"perk={perk} bn={bn}")

    # production: conversion + matvec (what one decode block pays today,
    # un-amortized) and matvec-only (converted s4 via same-jit reuse)
    @jax.jit
    def prod_conv_mv(qw4, xg8):
        w4g = qm.qw4_to_grouped_s4(qw4, g)
        return qm._int4g_matvec_pallas(xg8, w4g, s3, z3, xscale, perk,
                                       bn, True, jnp.bfloat16)

    @jax.jit
    def cand(wpk, xg8):
        return packed_matvec(xg8, wpk, s3, z3, xscale, perk, bn)

    want = np.asarray(prod_conv_mv(qw4, xg8))
    wpk = None
    for order, cand_w in (("lo_first", wpk_lo), ("hi_first", wpk_hi)):
        try:
            got = np.asarray(cand(cand_w, xg8))
        except Exception as e:
            print(f"packed kernel FAILS: {type(e).__name__}: "
                  f"{str(e)[:400]}")
            return
        ok = np.allclose(got, want, rtol=2e-2, atol=2e-2)
        print(f"{order}: match={ok}")
        if ok:
            wpk = cand_w
    if wpk is None:
        print("no order matches — dumping a corner")
        print("want", want[:2, :6])
        print("got ", got[:2, :6])
        return

    for name, fn, a in (("prod conv+mv", prod_conv_mv, qw4),
                        ("packed direct", cand, wpk)):
        np.asarray(fn(a, xg8))
        t0 = time.perf_counter()
        for _ in range(20):
            out = fn(a, xg8)
        np.asarray(out)
        print(f"{name}: {(time.perf_counter() - t0) / 20 * 1e3:.3f} ms/call")


if __name__ == "__main__":
    main()
