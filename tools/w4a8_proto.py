"""Prototype: W4A8 group-dot decode matvec.

Feeds RAW packed int4 bytes to the int8 MXU (no per-weight dequant):
for each group g (64 rows), with A = packed & 0xF (lo nibbles) and P the
raw packed byte (= lo + 16*hi - 128):

  D1_g = dot(qx_lo_g, A_g)                 -> lo-half group dot
  D3_g = dot(qx_hi_g, P_g), D2_g = dot(qx_hi_g, A_g)
  hi_dot_g = (D3_g + 128*rowsum(qx_hi_g) - D2_g) >> 4   (exact)
  y += s_lo[g] * (D1_g - rowsum(qx_lo_g) * zq_lo[g])
     + s_hi[g] * (hi_dot_g - rowsum(qx_hi_g) * zq_hi[g])

Per-weight VPU work: ONE int8 mask (A); scaling runs on [M, bn] partials.
Activations are per-token int8 (W4A8) — same activation treatment as the
W8A8 scheme.

Usage: JAX_PLATFORMS=cpu python tools/w4a8_proto.py   # interpret-mode check
       python tools/w4a8_proto.py                     # TPU timing
"""
import functools
import glob
import gzip
import json
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from vllm_hymeta_tpu.ops import quant_matmul as qm
from vllm_hymeta_tpu.quant import quantize_params_gptq


def kernel(x_ref, xs_ref, qw4_ref, sl_ref, zl_ref, sh_ref, zh_ref,
           o_ref, acc_ref, *, g: int, k_steps: int):
    ik = pl.program_id(2)

    @pl.when(ik == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    packed = qw4_ref[:]                    # int8 [bk, bn]
    bk, bn = packed.shape
    per = bk // g
    A = (packed & 0xF).astype(jnp.int8)    # lo nibble (bit7 can't leak in)
    x = x_ref[:]                           # int8 [M, 2*bk]
    x_lo = x[:, :bk]
    x_hi = x[:, bk:]
    s_lo = sl_ref[:, 0].astype(jnp.float32)    # [per, bn]
    zq_lo = zl_ref[:, 0].astype(jnp.float32) + 8.0
    s_hi = sh_ref[:, 0].astype(jnp.float32)
    zq_hi = zh_ref[:, 0].astype(jnp.float32) + 8.0

    acc = acc_ref[:]
    for gi in range(per):
        sl_ = slice(gi * g, (gi + 1) * g)
        xl = x_lo[:, sl_]
        xh = x_hi[:, sl_]
        Ag = A[sl_]
        Pg = packed[sl_]
        d1 = jax.lax.dot(xl, Ag, preferred_element_type=jnp.int32)
        d2 = jax.lax.dot(xh, Ag, preferred_element_type=jnp.int32)
        d3 = jax.lax.dot(xh, Pg, preferred_element_type=jnp.int32)
        rs_lo = jnp.sum(xl.astype(jnp.int32), axis=1, keepdims=True)
        rs_hi = jnp.sum(xh.astype(jnp.int32), axis=1, keepdims=True)
        hi_dot = (d3 + 128 * rs_hi - d2) >> 4
        acc = acc + s_lo[gi] * (d1.astype(jnp.float32)
                                - rs_lo.astype(jnp.float32) * zq_lo[gi])
        acc = acc + s_hi[gi] * (hi_dot.astype(jnp.float32)
                                - rs_hi.astype(jnp.float32) * zq_hi[gi])
    acc_ref[:] = acc

    @pl.when(ik == k_steps - 1)
    def _():
        o_ref[:] = (acc_ref[:] * xs_ref[:].astype(jnp.float32)
                    ).astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("bm", "bn", "bk", "interpret"))
def w4a8_matvec(qx, xs, qw4, scales, zeros, bm, bn, bk, interpret=False):
    M, K = qx.shape
    half = K // 2
    N = qw4.shape[1]
    G = scales.shape[0]
    g = K // G
    x2 = jnp.concatenate(
        [qx[:, :half].reshape(M, half // bk, bk),
         qx[:, half:].reshape(M, half // bk, bk)], axis=2
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
        functools.partial(kernel, g=g, k_steps=k_steps),
        grid=(pl.cdiv(M, bm), pl.cdiv(N, bn), k_steps),
        in_specs=[
            pl.BlockSpec((bm, 2 * bk), lambda i, j, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, 1), lambda i, j, k: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda i, j, k: (k, j),
                         memory_space=pltpu.VMEM),
            sl, sl, sh, sh,
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(x2, xs, qw4, s3, z3, s3, z3)


def device_ms(fn, n=20):
    o = fn(); _ = np.asarray(o[:1, :1])
    tag = f"/tmp/w4a8_{np.random.randint(1 << 30)}"
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
    return sum(e.get("dur", 0) for e in ev
               if e.get("ph") == "X" and e.get("pid") in tpu
               and e.get("tid") != 2) / n / 1e3


def main():
    on_tpu = jax.default_backend() in ("tpu", "axon")
    shapes = [("gate_up", 3584, 37888), ("down", 18944, 3584),
              ("qkv", 3584, 4608), ("o", 3584, 3584)]
    for name, K, N in shapes:
        key = jax.random.PRNGKey(0)
        w = jax.random.normal(key, (K, N), jnp.float32) * 0.02
        q = quantize_params_gptq(
            {"a": {"up_proj": {"w": w}}}, bits=4,
            group_size=64)["a"]["up_proj"]
        xb = jax.random.normal(jax.random.PRNGKey(1), (8, K), jnp.bfloat16)
        qx, xs = qm.quantize_per_token(xb)
        ref = qm.int4_matmul_ref(
            (qx.astype(jnp.float32) * xs).astype(jnp.bfloat16),
            q["qw4"], q["scales"], q["zeros"])
        half = K // 2
        combos = []
        for bk in (512, 1024, 2048, 4736, 2368, 896, 1792, 448):
            if half % bk or bk % 64:
                continue
            for bn in (4736, 2048, 1024, 896, 512, 3584, 4608):
                if N % bn:
                    continue
                if bk * bn > 5 * 1024 * 1024:
                    continue
                combos.append((bk, bn))
                break
        for bk, bn in combos[:3]:
            try:
                fn = lambda: w4a8_matvec(qx, xs, q["qw4"],
                                         q["scales"].astype(jnp.float32),
                                         q["zeros"].astype(jnp.float32),
                                         32, bn, bk,
                                         interpret=not on_tpu)
                out = fn()
                err = float(jnp.max(jnp.abs(
                    out.astype(jnp.float32) - ref.astype(jnp.float32))))
                rel = err / float(jnp.max(jnp.abs(ref)) + 1e-9)
                if on_tpu:
                    ms = device_ms(fn)
                    gbs = K * N / 2 / ms / 1e6
                    print(f"{name:8s} bk={bk:5d} bn={bn:5d} {ms:7.3f} ms "
                          f"{gbs:5.0f} GB/s  maxerr {err:.4f} rel {rel:.4f}",
                          flush=True)
                else:
                    print(f"{name:8s} bk={bk:5d} bn={bn:5d} interpret "
                          f"maxerr {err:.4f} rel {rel:.4f}", flush=True)
            except Exception as e:
                print(f"{name:8s} bk={bk} bn={bn} FAIL {str(e)[:150]}",
                      flush=True)


if __name__ == "__main__":
    main()
