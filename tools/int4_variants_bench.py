"""Microbench of int4 decode-matvec dequant variants (device-trace timed).

Variants (same tiling, same dot structure as ops/quant_matmul._int4_kernel):
  repeat32  — fp32 dequant with jnp.repeat'd group params (original)
  bcast32   — fp32 dequant, [rows, g, bn] broadcast view (no repeats)
  magic16   — int16 magic-number bf16 unpack + 3D broadcast

Usage: python tools/int4_variants_bench.py
"""
import functools
import glob
import gzip
import json
import os
import sys
import collections

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from vllm_hymeta_tpu.ops import quant_matmul as qm
from vllm_hymeta_tpu.quant import quantize_params_gptq


def make_kernel(variant: str, g: int, k_steps: int):
    def kernel(x_ref, qw4_ref, sl_ref, zl_ref, sh_ref, zh_ref, o_ref,
               acc_ref):
        ik = pl.program_id(2)

        @pl.when(ik == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        packed = qw4_ref[:]
        bk, bn = packed.shape
        rows = bk // g
        u = (packed.astype(jnp.int32) + 128) & 0xFF

        if variant == "convonly":
            # NOT numerically correct — isolates the MXU+DMA floor by
            # replacing the whole dequant with one int8->bf16 convert
            w = packed.astype(jnp.bfloat16)
            acc_ref[:] += jax.lax.dot(x_ref[:, :bk], w,
                                      preferred_element_type=jnp.float32)
            acc_ref[:] += jax.lax.dot(x_ref[:, bk:], w,
                                      preferred_element_type=jnp.float32)

            @pl.when(ik == k_steps - 1)
            def _():
                o_ref[:] = acc_ref[:].astype(o_ref.dtype)
            return

        if variant == "int8dot":
            # NOT numerically correct — int8 MXU dot straight on the
            # packed bytes: the W4A8 design's compute floor (no unpack,
            # no dequant; epilogue scaling only)
            acc_ref[:] += jax.lax.dot(
                x_ref[:, :bk].astype(jnp.int8), packed,
                preferred_element_type=jnp.int32).astype(jnp.float32)
            acc_ref[:] += jax.lax.dot(
                x_ref[:, bk:].astype(jnp.int8), packed,
                preferred_element_type=jnp.int32).astype(jnp.float32)

            @pl.when(ik == k_steps - 1)
            def _():
                o_ref[:] = acc_ref[:].astype(o_ref.dtype)
            return

        if variant == "magic16":
            lo = jax.lax.bitcast_convert_type(
                (u & 0xF).astype(jnp.int16) | jnp.int16(0x4300),
                jnp.bfloat16)
            hi = jax.lax.bitcast_convert_type(
                (u >> 4).astype(jnp.int16) | jnp.int16(0x4300),
                jnp.bfloat16)

            def dq(m, s_ref2, z_ref2):
                s = s_ref2[:, 0].astype(jnp.bfloat16)
                zc = (z_ref2[:, 0].astype(jnp.float32)
                      + 136.0).astype(jnp.bfloat16)
                m3 = m.reshape(rows, g, bn)
                return ((m3 - zc[:, None, :]) * s[:, None, :]
                        ).reshape(bk, bn)
        else:
            lo = (u & 0xF).astype(jnp.float32) - 8.0
            hi = ((u >> 4)).astype(jnp.float32) - 8.0
            if variant == "repeat32":
                def dq(m, s_ref2, z_ref2):
                    s = jnp.repeat(s_ref2[:, 0].astype(jnp.float32), g, 0)
                    z = jnp.repeat(z_ref2[:, 0].astype(jnp.float32), g, 0)
                    return ((m - z) * s).astype(jnp.bfloat16)
            else:  # bcast32
                def dq(m, s_ref2, z_ref2):
                    s = s_ref2[:, 0].astype(jnp.float32)
                    z = z_ref2[:, 0].astype(jnp.float32)
                    m3 = m.reshape(rows, g, bn)
                    return ((m3 - z[:, None, :]) * s[:, None, :]
                            ).astype(jnp.bfloat16).reshape(bk, bn)

        w_lo = dq(lo, sl_ref, zl_ref)
        w_hi = dq(hi, sh_ref, zh_ref)
        acc_ref[:] += jax.lax.dot(x_ref[:, :bk], w_lo,
                                  preferred_element_type=jnp.float32)
        acc_ref[:] += jax.lax.dot(x_ref[:, bk:], w_hi,
                                  preferred_element_type=jnp.float32)

        @pl.when(ik == k_steps - 1)
        def _():
            o_ref[:] = acc_ref[:].astype(o_ref.dtype)
    return kernel


@functools.partial(jax.jit,
                   static_argnames=("variant", "bm", "bn", "bk"))
def run(x, qw4, scales, zeros, variant, bm, bn, bk):
    M, K = x.shape
    half = K // 2
    N = qw4.shape[1]
    G = scales.shape[0]
    g = K // G
    x2 = jnp.concatenate(
        [x[:, :half].reshape(M, half // bk, bk),
         x[:, half:].reshape(M, half // bk, bk)], axis=2
    ).reshape(M, 2 * half)
    k_steps = half // bk
    per = bk // g
    s3 = scales.reshape(G, 1, N)
    z3 = zeros.reshape(G, 1, N)
    sl = pl.BlockSpec((per, 1, bn), lambda i, j, k: (k, 0, j),
                      memory_space=pltpu.VMEM)
    sh = pl.BlockSpec((per, 1, bn), lambda i, j, k: (k_steps + k, 0, j),
                      memory_space=pltpu.VMEM)
    return pl.pallas_call(
        make_kernel(variant, g, k_steps),
        grid=(pl.cdiv(M, bm), pl.cdiv(N, bn), k_steps),
        in_specs=[
            pl.BlockSpec((bm, 2 * bk), lambda i, j, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda i, j, k: (k, j),
                         memory_space=pltpu.VMEM),
            sl, sl, sh, sh,
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), x.dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
    )(x2, qw4, s3, z3, s3, z3)


def device_ms(fn, n=20):
    o = fn(); _ = np.asarray(o[:1, :1])
    tag = f"/tmp/i4v_{np.random.randint(1 << 30)}"
    jax.profiler.start_trace(tag)
    for _i in range(n):
        o = fn()
    _ = np.asarray(o[:1, :1])
    jax.profiler.stop_trace()
    path = sorted(glob.glob(f"{tag}/plugins/profile/*/*.trace.json.gz"))[-1]
    tr = json.load(gzip.open(path))
    ev = tr["traceEvents"]
    pids = {e["pid"]: e["args"].get("name") for e in ev
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    tpu = {p for p, nn in pids.items() if nn and "TPU" in nn}
    tot = sum(e.get("dur", 0) for e in ev
              if e.get("ph") == "X" and e.get("pid") in tpu
              and e.get("tid") != 2)
    return tot / n / 1e3


def main():
    shapes = [("gate_up", 3584, 37888, 448, 4736),
              ("down", 18944, 3584, 2368, 896)]
    for name, K, N, bk, bn in shapes:
        key = jax.random.PRNGKey(0)
        w = jax.random.normal(key, (K, N), jnp.float32) * 0.02
        q = quantize_params_gptq(
            {"a": {"up_proj": {"w": w}}}, bits=4,
            group_size=64)["a"]["up_proj"]
        x = jax.random.normal(jax.random.PRNGKey(1), (8, K), jnp.bfloat16)
        qw4 = jax.device_put(q["qw4"])
        s = jax.device_put(q["scales"].astype(jnp.float32))
        z = jax.device_put(q["zeros"].astype(jnp.float32))
        ref = qm.int4_matmul_ref(x, qw4, s, z)
        gbs_target = K * N / 2
        for variant in ("repeat32", "bcast32", "magic16", "convonly",
                        "int8dot"):
            try:
                fn = lambda: run(x, qw4, s, z, variant, 32, bn, bk)
                out = fn()
                if variant in ("convonly", "int8dot"):
                    err = float("nan")   # timing-only variants
                else:
                    err = float(jnp.max(jnp.abs(
                        out.astype(jnp.float32) - ref.astype(jnp.float32))))
                ms = device_ms(fn)
                print(f"{name:8s} {variant:9s} {ms:7.3f} ms  "
                      f"{gbs_target / ms / 1e6:5.0f} GB/s  maxerr {err:.4f}",
                      flush=True)
            except Exception as e:
                print(f"{name:8s} {variant:9s} FAIL {str(e)[:120]}",
                      flush=True)


if __name__ == "__main__":
    main()
