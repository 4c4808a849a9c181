"""Quantized matmul ops.

Replaces the reference's GPTQ / W8A8 CUDA kernels (SURVEY.md §2.8 N12):
  * groupwise weight-only INT4/INT8 (GPTQ layout: per-group scales+zeros,
    group_size 64 — `hf_7B_model/quant_7B.py:13-36`)
  * W8A8: INT8 weights with per-channel scale + dynamic per-token INT8
    activation quantization (`hf_model/quant_w8a8.py:90-138`)

Two tiers per op: a jnp reference (`*_ref`, always correct, used in tests
and as CPU fallback) and a Pallas TPU kernel used under jit on TPU.  The
dispatchers pick Pallas on TPU backends.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# decode-path activation precision for grouped-s4 INT4 linears:
# "int8" (W4A8, fastest) or "bf16" (W4A16, reference semantics)
_INT4_ACT_DEFAULT = os.environ.get("INT4_DECODE_ACT", "int8") != "bf16"


def _on_tpu() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


# ---------------------------------------------------------------------------
# group-wise weight-only dequant matmul (GPTQ INT4/INT8)
# ---------------------------------------------------------------------------

def dequant_groupwise(qw: jax.Array, scales: jax.Array, zeros: jax.Array,
                      dtype=jnp.bfloat16) -> jax.Array:
    """w[i, o] = (qw[i, o] - zeros[i//g, o]) * scales[i//g, o]."""
    K, N = qw.shape
    G = scales.shape[0]
    g = K // G
    qf = qw.astype(jnp.float32).reshape(G, g, N)
    w = (qf - zeros.astype(jnp.float32)[:, None, :]) \
        * scales.astype(jnp.float32)[:, None, :]
    return w.reshape(K, N).astype(dtype)


def groupwise_dequant_matmul_ref(x, qw, scales, zeros):
    w = dequant_groupwise(qw, scales, zeros, dtype=x.dtype)
    return jnp.dot(x, w, preferred_element_type=x.dtype)


def _gw_kernel(x_ref, qw_ref, s_ref, z_ref, o_ref, acc_ref, *, g: int,
               k_steps: int):
    """Grid (M/bm, N/bn, K/bk): dequantize a [bk, bn] weight tile in VMEM and
    feed the MXU; accumulate fp32 in scratch."""
    ik = pl.program_id(2)

    @pl.when(ik == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    qw = qw_ref[:].astype(jnp.float32)           # [bk, bn]
    bk = qw.shape[0]
    # per-row group index within this K-tile (bk is a multiple of g)
    s = s_ref[:].astype(jnp.float32)             # [bk//g, bn]
    z = z_ref[:].astype(jnp.float32)
    s_full = jnp.repeat(s, g, axis=0)
    z_full = jnp.repeat(z, g, axis=0)
    w = ((qw - z_full) * s_full).astype(jnp.bfloat16)
    acc_ref[:] += jnp.dot(x_ref[:], w, preferred_element_type=jnp.float32)

    @pl.when(ik == k_steps - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("bm", "bn", "bk"))
def groupwise_dequant_matmul_pallas(x, qw, scales, zeros,
                                    bm: int = 256, bn: int = 512,
                                    bk: int = 512):
    """Fused dequant+matmul: x [M, K] bf16 @ (qw [K, N] int8, group params)."""
    M, K = x.shape
    N = qw.shape[1]
    G = scales.shape[0]
    g = K // G
    orig_m = M
    if M % 8 != 0:  # pad rows to sublane multiple
        pad = 8 - M % 8
        x = jnp.pad(x, ((0, pad), (0, 0)))
        M += pad
    bm = min(bm, M)
    bn = min(bn, N)
    bk = min(bk, K)
    # K-tile must hold whole groups
    if bk % g != 0:
        bk = (bk // g) * g or g
    k_steps = pl.cdiv(K, bk)
    grid = (pl.cdiv(M, bm), pl.cdiv(N, bn), k_steps)
    out = pl.pallas_call(
        functools.partial(_gw_kernel, g=g, k_steps=k_steps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda i, j, k: (k, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk // g, bn), lambda i, j, k: (k, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk // g, bn), lambda i, j, k: (k, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), x.dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * K,
            bytes_accessed=M * K * 2 + K * N + M * N * 2,
            transcendentals=0),
    )(x, qw, scales, zeros)
    return out[:orig_m]


def groupwise_dequant_matmul(x, qw, scales, zeros):
    shape = x.shape
    x2 = x.reshape(-1, shape[-1])
    if _on_tpu():
        y = groupwise_dequant_matmul_pallas(x2, qw, scales, zeros)
    else:
        y = groupwise_dequant_matmul_ref(x2, qw, scales, zeros)
    return y.reshape(*shape[:-1], qw.shape[1])


# ---------------------------------------------------------------------------
# W8A8: dynamic per-token INT8 activations × per-channel INT8 weights
# ---------------------------------------------------------------------------

def quantize_per_token(x: jax.Array):
    """Symmetric per-token INT8: returns (q int8, scale fp32 [..., 1])."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, 1e-6) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127)
    return q.astype(jnp.int8), scale


def _quant_rows_kernel(x_ref, q_ref, s_ref):
    x = x_ref[:].astype(jnp.float32)
    amax = jnp.max(jnp.abs(x), axis=1, keepdims=True)
    scale = jnp.maximum(amax, 1e-6) / 127.0
    q_ref[:] = jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8)
    s_ref[:] = scale


@jax.jit
def _quantize_rows_pallas(x: jax.Array):
    """[M, K] bf16 -> (int8 [M, K], scale f32 [M, 1]) in ONE pass over HBM.
    XLA splits the row-amax reduction and the quantized write into separate
    sweeps of the activation (~3x the traffic); one kernel does both."""
    M, K = x.shape
    # VMEM budget per block ~ bm*K*(2 in + 2 double-buffer + 4 fp32 cast
    # + 1 out + abs/rounding temps) — stay well under the 16MB scoped limit
    bm = max(32, min(256, (11 * 1024 * 1024 // (K * 11)) // 32 * 32))
    padm = (-M) % bm
    if padm:
        x = jnp.pad(x, ((0, padm), (0, 0)))
    grid = ((M + padm) // bm,)
    q, s = pl.pallas_call(
        _quant_rows_kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((bm, K), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec((bm, K), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((M + padm, K), jnp.int8),
            jax.ShapeDtypeStruct((M + padm, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        cost_estimate=pl.CostEstimate(
            flops=4 * M * K, bytes_accessed=M * K * 3 + M * 4,
            transcendentals=0),
    )(x)
    return q[:M], s[:M]


def quantize_rows(x: jax.Array):
    """Production row-quant dispatcher (jnp reference: quantize_per_token)."""
    if _on_tpu() and x.ndim == 2 and x.shape[1] % 128 == 0 \
            and x.shape[1] * 2 * 32 <= 8 * 1024 * 1024:
        return _quantize_rows_pallas(x)
    return quantize_per_token(x)


def _glu_quant_kernel(gu_ref, q_ref, s_ref):
    gu = gu_ref[:].astype(jnp.float32)
    H = gu.shape[1] // 2
    a = jax.nn.silu(gu[:, :H]) * gu[:, H:]
    amax = jnp.max(jnp.abs(a), axis=1, keepdims=True)
    scale = jnp.maximum(amax, 1e-6) / 127.0
    q_ref[:] = jnp.clip(jnp.round(a / scale), -127, 127).astype(jnp.int8)
    s_ref[:] = scale


@jax.jit
def _glu_quant_pallas(gu: jax.Array):
    """Fused SwiGLU + per-token INT8 quant: gu [M, 2H] (gate ∥ up) ->
    (int8 [M, H], scale f32 [M, 1]).  Reads the gate_up activation once."""
    M, K2 = gu.shape
    H = K2 // 2
    # fp32 intermediates (g, u, a) triple the block footprint — budget the
    # bf16 block at ~2.5MB to stay inside the 16MB scoped-VMEM limit
    bm = max(32, min(128, (5 * 1024 * 1024 // (K2 * 2 * 2)) // 32 * 32))
    padm = (-M) % bm
    if padm:
        gu = jnp.pad(gu, ((0, padm), (0, 0)))
    grid = ((M + padm) // bm,)
    q, s = pl.pallas_call(
        _glu_quant_kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((bm, K2), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec((bm, H), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((M + padm, H), jnp.int8),
            jax.ShapeDtypeStruct((M + padm, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        cost_estimate=pl.CostEstimate(
            flops=8 * M * H, bytes_accessed=M * K2 * 2 + M * H,
            transcendentals=M * H),
    )(gu)
    return q[:M], s[:M]


def glu_quant_ref(gu: jax.Array):
    H = gu.shape[-1] // 2
    a = jax.nn.silu(gu[..., :H].astype(jnp.float32)) \
        * gu[..., H:].astype(jnp.float32)
    return quantize_per_token(a)


def glu_quant(gu: jax.Array):
    if _on_tpu() and gu.ndim == 2 and gu.shape[1] % 256 == 0 \
            and gu.shape[1] * 2 * 32 <= 8 * 1024 * 1024:
        return _glu_quant_pallas(gu)
    return glu_quant_ref(gu)


def w8a8_matmul_prequant(qx, x_scale, qw, w_scale, out_dtype=jnp.bfloat16):
    """Large-M W8A8 with activations already quantized: XLA's native int8
    dot runs at MXU peak; the fp32 rescale fuses into the epilogue."""
    acc = jax.lax.dot_general(
        qx, qw, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * x_scale * w_scale.astype(jnp.float32)
    return y.astype(out_dtype)


def w8a8_matmul_ref(x, qw, w_scale):
    qx, x_scale = quantize_per_token(x)
    # int8 x int8 -> int32 natively (no widening of the weight read)
    acc = jax.lax.dot_general(
        qx, qw, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * x_scale * w_scale.astype(jnp.float32)
    return y.astype(x.dtype)


def _w8a8_kernel(qx_ref, xs_ref, qw_ref, ws_ref, o_ref, acc_ref, *,
                 k_steps: int):
    ik = pl.program_id(2)

    @pl.when(ik == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jax.lax.dot(
        qx_ref[:], qw_ref[:], preferred_element_type=jnp.int32)

    @pl.when(ik == k_steps - 1)
    def _():
        y = acc_ref[:].astype(jnp.float32)
        y = y * xs_ref[:] * ws_ref[:].astype(jnp.float32)
        o_ref[:] = y.astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("out_dtype", "bm", "bn", "bk"))
def _w8a8_matmul_pallas(qx, x_scale, qw, w_scale, out_dtype,
                        bm: int = 256, bn: int = 512, bk: int = 512):
    M, K = qx.shape
    N = qw.shape[1]
    bm, bn, bk = min(bm, M), min(bn, N), min(bk, K)
    k_steps = pl.cdiv(K, bk)
    grid = (pl.cdiv(M, bm), pl.cdiv(N, bn), k_steps)
    return pl.pallas_call(
        functools.partial(_w8a8_kernel, k_steps=k_steps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, 1), lambda i, j, k: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda i, j, k: (k, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j, k: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * K,
            bytes_accessed=M * K + K * N + M * N * 2,
            transcendentals=0),
    )(qx, x_scale, qw, w_scale.reshape(1, -1))


def _full_k_bn(K: int, N: int, budget: int = 2_500_000) -> int:
    """bn for the full-K decode matvec: largest divisor of N (multiple of
    128) whose int8 weight tile K*bn fits the per-buffer VMEM budget.
    Round-4 chained-loop probe (tools/decode_matvec_probe.py): full-K
    blocks beat the old bk=4736 split 0.090 vs 0.105 ms/step on the
    down_proj shape — XLA's k-grid input slicing showed up as extra
    `slice-done s8[4736,3584]` copies in the device trace."""
    best = 0
    for bn in range(128, N + 1, 128):
        if N % bn == 0 and K * bn <= budget:
            best = bn
    return best


def _pick_tile(n: int, mult: int, lo: int, hi: int) -> int:
    """Largest divisor of n in [lo, hi] that is a multiple of mult (0 if
    none) — Mosaic requires block dims at sublane/lane multiples, and a
    non-dividing reduction tile would accumulate out-of-bounds garbage."""
    b = hi - hi % mult
    while b >= lo:
        if n % b == 0:
            return b
        b -= mult
    return 0


def w8a8_matmul(x, qw, w_scale, out_dtype=None):
    """out_dtype: result dtype (default x.dtype). The fp32 LM head passes
    float32 so the scale multiply and logits never round through bf16."""
    shape = x.shape
    out_dtype = jnp.dtype(out_dtype) if out_dtype is not None \
        else jnp.dtype(x.dtype)
    x2 = x.reshape(-1, shape[-1])
    if _on_tpu() and x2.shape[0] <= 64 \
            and x2.shape[1] % 32 == 0 and qw.shape[1] % 128 == 0:
        # decode matvec: weight-read bound — Pallas with few, large blocks
        # so DMA (not per-step overhead) dominates
        qx, x_scale = quantize_per_token(x2)
        M = qx.shape[0]
        orig_m = M
        if M % 32 != 0:  # int8 sublane multiple
            pad = 32 - M % 32
            qx = jnp.pad(qx, ((0, pad), (0, 0)))
            x_scale = jnp.pad(x_scale, ((0, pad), (0, 0)))
        K = qx.shape[1]
        N = qw.shape[1]
        # full-K single block when a [K, bn] tile fits VMEM (it does for
        # every 7B/70B shape): one K step, no XLA-side input slicing
        bn = _full_k_bn(K, N)
        if bn:
            bk = K
        elif K <= 4736:
            bk = K
            bn_cap = max(512, (6 * 1024 * 1024 // bk) // 128 * 128)
            bn = _pick_tile(N, 128, 512, min(2048, bn_cap)) or 512
        else:
            bk = _pick_tile(K, 32, 1024, 4736)
            if bk == 0:
                # no usable divisor: zero-pad qx's columns so the final
                # partial block is harmless (0 * garbage == 0)
                bk = 4096
                qx = jnp.pad(qx, ((0, 0), (0, (-K) % bk)))
            bn_cap = max(512, (6 * 1024 * 1024 // bk) // 128 * 128)
            bn = _pick_tile(N, 128, 512, min(2048, bn_cap)) or 512
        y = _w8a8_matmul_pallas(qx, x_scale, qw, w_scale,
                                out_dtype=out_dtype,
                                bm=32, bn=bn, bk=bk)[:orig_m]
    elif _on_tpu():
        # large M: XLA's native int8 dot runs at MXU peak (trace-verified
        # ~388 TOPS on the gate_up shape); quantize in one Pallas pass
        qx, x_scale = quantize_rows(x2)
        y = w8a8_matmul_prequant(qx, x_scale, qw, w_scale,
                                 out_dtype=out_dtype)
    else:
        y = w8a8_matmul_ref(x2, qw, w_scale).astype(out_dtype)
    return y.reshape(*shape[:-1], qw.shape[1])


# ---------------------------------------------------------------------------
# packed INT4 weight-only (GPTQ group-wise) — split-half packing
# ---------------------------------------------------------------------------
# Two int4 values share a byte: row k of the packed tensor holds (low
# nibble) original row k and (high nibble) original row k + K/2.  Both
# unpacked halves are contiguous K-ranges, so the matmul is just
#   y = x[:, :K/2] @ W_low + x[:, K/2:] @ W_high
# with no interleave or activation permutation — the kernel streams HALF
# the bytes of an int8 layout (SURVEY.md §7 hard part #4).

def pack_int4(qw: jax.Array) -> jax.Array:
    """qw int8 [K, N] with values in [-8, 7] -> packed int8 [K/2, N]
    (int8 bit-pattern storage: Mosaic handles int8 loads natively)."""
    K = qw.shape[0]
    assert K % 2 == 0
    u = qw.astype(jnp.int32) + 8
    lo = u[: K // 2, :]
    hi = u[K // 2:, :]
    both = lo | (hi << 4)                 # [0, 255]
    return (both - 128).astype(jnp.int8)  # store bit pattern as int8


def unpack_int4(packed: jax.Array) -> jax.Array:
    """Inverse of pack_int4 -> int8 [K, N]."""
    u = packed.astype(jnp.int32) + 128    # back to [0, 255]
    lo = (u & 0xF).astype(jnp.int8) - 8
    hi = ((u >> 4) & 0xF).astype(jnp.int8) - 8
    return jnp.concatenate([lo, hi], axis=0)


def repack_int4_rows(qw4: jax.Array, shards: int) -> jax.Array:
    """Re-pack so each of `shards` contiguous K-blocks is independently
    split-half packed — required before row-sharding a packed tensor
    (each rank's local slice must be a valid packed matrix)."""
    qw = unpack_int4(qw4)                 # [K, N]
    K = qw.shape[0]
    assert K % (2 * shards) == 0
    blocks = jnp.split(qw, shards, axis=0)
    return jnp.concatenate([pack_int4(b) for b in blocks], axis=0)


def int4_matmul_ref(x, qw4, scales, zeros):
    """x [M, K] @ packed int4 weights (group-wise scales/zeros over K)."""
    qw = unpack_int4(qw4)
    return groupwise_dequant_matmul_ref(x, qw, scales, zeros)


def _int4_kernel(x_ref, qw4_ref, sl_ref, zl_ref, sh_ref, zh_ref, o_ref,
                 acc_ref, *, g: int, k_steps: int, half_k: int):
    """Grid (M/bm, N/bn, Khalf/bk): each step processes bk rows of BOTH
    halves (packed together), accumulating two bf16 matmuls.

    Dequant math variants were microbenched on-device
    (tools/int4_variants_bench.py): fp32 with repeated group params wins
    over [rows, g, bn] broadcast views and over an int16 bf16
    magic-number unpack (16-bit shifts don't legalize in Mosaic, so that
    path pays int32<->int16 converts AND loses scale precision).
    """
    ik = pl.program_id(2)

    @pl.when(ik == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    packed = qw4_ref[:]                              # int8 [bk, bn]
    bk, bn = packed.shape
    u = (packed.astype(jnp.int32) + 128) & 0xFF      # original byte [0,255]
    lo = (u & 0xF).astype(jnp.float32) - 8.0
    hi = (u >> 4).astype(jnp.float32) - 8.0

    def dequant(m, s_ref2, z_ref2):
        s = jnp.repeat(s_ref2[:, 0].astype(jnp.float32), g, axis=0)
        z = jnp.repeat(z_ref2[:, 0].astype(jnp.float32), g, axis=0)
        return ((m - z) * s).astype(jnp.bfloat16)

    w_lo = dequant(lo, sl_ref, zl_ref)
    w_hi = dequant(hi, sh_ref, zh_ref)
    x_lo = x_ref[:, :bk]
    x_hi = x_ref[:, bk:]
    acc_ref[:] += jax.lax.dot(x_lo, w_lo,
                              preferred_element_type=jnp.float32)
    acc_ref[:] += jax.lax.dot(x_hi, w_hi,
                              preferred_element_type=jnp.float32)

    @pl.when(ik == k_steps - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("bm", "bn", "bk"))
def _int4_matmul_pallas(x, qw4, scales, zeros, bm: int, bn: int, bk: int):
    """x [M, K] bf16; qw4 [K/2, N] int8 bit pattern; scales/zeros [K/g, N]
    in their NATURAL layout (no per-call relayout — it used to run inside
    the decode loop every token).  Group params ride in as two refs each:
    the lo-half rows (block k) and the hi-half rows (block k_steps + k).

    The x block spec delivers both halves' columns for a K-half tile:
    x is passed tile-interleaved so one [bm, 2*bk] block covers
    [x_lo_tile | x_hi_tile]."""
    M, K = x.shape
    half = K // 2
    N = qw4.shape[1]
    G = scales.shape[0]
    g = K // G
    x2 = jnp.concatenate(
        [x[:, :half].reshape(M, half // bk, bk),
         x[:, half:].reshape(M, half // bk, bk)], axis=2
    ).reshape(M, 2 * half)                           # tile-interleaved
    k_steps = half // bk
    grid = (pl.cdiv(M, bm), pl.cdiv(N, bn), k_steps)
    per = bk // g                                    # group rows per step

    # group params as [G, 1, N]: Mosaic constrains only the LAST TWO block
    # dims (1 == full dim, bn % 128), so `per` group rows per step need no
    # sublane padding
    s3 = scales.reshape(G, 1, N)
    z3 = zeros.reshape(G, 1, N)

    def s_lo(i, j, k):
        return (k, 0, j)

    def s_hi(i, j, k):
        return (k_steps + k, 0, j)

    sspec_lo = pl.BlockSpec((per, 1, bn), s_lo, memory_space=pltpu.VMEM)
    sspec_hi = pl.BlockSpec((per, 1, bn), s_hi, memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_int4_kernel, g=g, k_steps=k_steps, half_k=half),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, 2 * bk), lambda i, j, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda i, j, k: (k, j),
                         memory_space=pltpu.VMEM),
            sspec_lo, sspec_lo, sspec_hi, sspec_hi,
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), x.dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * K,
            bytes_accessed=M * K * 2 + K * N // 2 + M * N * 2,
            transcendentals=0),
    )(x2, qw4, s3, z3, s3, z3)
    return out


def _pick_bk(half: int, g: int) -> int:
    for bk in (1024, 896, 768, 640, 512, 448, 384, 320, 256, 192, 128, 64):
        if bk % g == 0 and half % bk == 0:
            return bk
    return 0


def _divisors(n: int, mult: int, hi: int):
    return [d for d in range(mult, min(n, hi) + 1, mult) if n % d == 0]


@functools.lru_cache(maxsize=256)
def _pick_bk_bn_matvec(half: int, N: int, g: int):
    """Joint (bk, bn) for the weight-read-bound decode matvec: MINIMIZE the
    grid-step count (per-step fixed cost rivals the DMA time for thin
    blocks) subject to bk | half (mult of g), bn | N (mult of 128) and the
    packed-weight tile fitting double-buffered in scoped VMEM."""
    # the kernel expands a packed tile ~6x in VMEM (int32 unpack + fp32
    # lo/hi + bf16 dequant temporaries, double-buffered input): keep the
    # packed bytes small enough that the whole working set stays inside
    # the 16MB scoped limit
    budget = 2 * 1024 * 1024 + 256 * 1024
    best = None
    for bk in _divisors(half, g, 8192):
        for bn in _divisors(N, 128, 8192):
            if bk * bn > budget:
                continue
            steps = (half // bk) * (N // bn)
            key = (steps, -(bk * bn))
            if best is None or key < best[0]:
                best = (key, bk, bn)
    if best is None:
        return 0, 0
    return best[1], best[2]


# ---------------------------------------------------------------------------
# grouped-s4 decode matvec (native int4 storage, hardware unpack)
# ---------------------------------------------------------------------------
# Round-4 finding (tools/ probes, chained-loop timing on v5e): the MXU/
# memory system reads NATIVE s4 (jnp.int4) arrays at ~570 GB/s-of-int4,
# while any VPU bit-twiddling unpack caps the split-half packed kernel at
# ~330 GB/s — the s4 route is 1.8x faster and is the only path that gets
# INT4 decode meaningfully under the INT8 byte floor (VERDICT r3 item 2).
#
# Two constraints shape the design:
#   * s4 arrays cannot cross a jit boundary on this runtime (plugin layout
#     bug: device_put recurses on sub-byte layouts), so weights persist as
#     split-half packed int8 and `prepare_decode_params` converts to s4
#     INSIDE the decode program, once per decode block (hoisted above the
#     fori_loop; ~0.25 ms/step amortized at decode_block=32).
#   * s4 reshapes that change the minor dimension miscompile (verified),
#     so conversion only ever reshapes along major dims: [K, N] ->
#     [G, g, N].
#
# Kernel: grid (N/bn, G/perk); per step a [perk, g, bn] s4 tile is
# converted to int8 (hardware-assisted) and contracted per group with the
# activation tile via a batched int8 dot; GPTQ group scales/zeros apply in
# an fp32 epilogue using per-group activation sums:
#   y[n] = sum_g s[g,n] * (sum_{k in g} x[k] q[k,n]  -  z[g,n] * xs[g]).

def qw4_to_grouped_s4(qw4: jax.Array, group_size: int) -> jax.Array:
    """In-jit: split-half packed int8 [K/2, N] -> s4 [G, g, N]."""
    w8 = unpack_int4(qw4)                       # int8 [K, N]
    K, N = w8.shape
    G = K // group_size
    return w8.astype(jnp.int4).reshape(G, group_size, N)


def _int4g_kernel(x_ref, w_ref, s_ref, z_ref, xs_ref, o_ref, acc_ref, *,
                  k_steps: int, int8_act: bool):
    ik = pl.program_id(1)

    @pl.when(ik == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    xg = x_ref[:]                                # [perk, M, g]
    if int8_act:
        w = w_ref[:].astype(jnp.int8)            # [perk, g, bn]
        p = jax.lax.dot_general(
            xg, w, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.int32)    # [perk, M, bn]
        p = p.astype(jnp.float32)
        xsum = jnp.sum(xg.astype(jnp.int32), axis=2).astype(jnp.float32)
    else:
        w = w_ref[:].astype(jnp.bfloat16)
        p = jax.lax.dot_general(
            xg, w, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        xsum = jnp.sum(xg.astype(jnp.float32), axis=2)
    s = s_ref[:, 0].astype(jnp.float32)          # [perk, bn]
    z = z_ref[:, 0].astype(jnp.float32)
    y = (p - z[:, None, :] * xsum[:, :, None]) * s[:, None, :]
    acc_ref[:] += jnp.sum(y, axis=0)

    @pl.when(ik == k_steps - 1)
    def _():
        # per-row activation dequant scale applied in the epilogue and the
        # result emitted in bf16: keeps the f32 [M, N] accumulator (and
        # the post-kernel scale multiply) out of HBM — the round-4 trace
        # showed the f32 output slices as ~0.4 ms/token of copy-dones
        o_ref[:] = (acc_ref[:] * xs_ref[:].astype(jnp.float32)
                    ).astype(o_ref.dtype)


@functools.lru_cache(maxsize=256)
def _pick_perk_bn(G: int, N: int, g: int):
    """(perk, bn) minimizing grid steps with the s4 weight tile
    perk*g*bn/2 bytes within a ~2.2MB per-buffer budget (double-buffered
    plus scales stays inside scoped VMEM).  perk has no tiling constraint
    (only the last two block dims are constrained on TPU)."""
    budget = 2 * 2_200_000  # /2 below: s4 tile bytes = perk*g*bn/2
    best = None
    for perk in range(1, G + 1):
        if G % perk:
            continue
        for bn in range(128, N + 1, 128):
            if N % bn or perk * g * bn > budget:
                continue
            steps = (G // perk) * (N // bn)
            key = (steps, -(perk * g * bn))
            if best is None or key < best[0]:
                best = (key, perk, bn)
    if best is None:
        return 0, 0
    return best[1], best[2]


@functools.partial(jax.jit,
                   static_argnames=("perk", "bn", "int8_act", "out_dtype"))
def _int4g_matvec_pallas(xg, w4g, s3, z3, xscale, perk, bn, int8_act,
                         out_dtype):
    """xg [G, M, g] (int8 or bf16); w4g s4 [G, g, N]; s3/z3 [G, 1, N];
    xscale [M, 1] f32 per-row activation scale (ones for bf16 acts)."""
    G, M, g = xg.shape
    N = w4g.shape[2]
    k_steps = G // perk
    out = pl.pallas_call(
        functools.partial(_int4g_kernel, k_steps=k_steps,
                          int8_act=int8_act),
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
            pl.BlockSpec((M, 1), lambda j, k: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((M, bn), lambda j, k: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
        scratch_shapes=[pltpu.VMEM((M, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * G * g,
            bytes_accessed=G * g * N // 2 + G * N * 4 + M * N * 2,
            transcendentals=0),
    )(xg, w4g, s3, z3, xscale)
    return out


def int4g_matvec(x, w4g, s3, z3, int8_act: Optional[bool] = None):
    """Decode matvec against grouped-s4 weights (prepare_decode_params
    layout).  x [..., K] bf16 -> [..., N] bf16.

    int8_act=True quantizes activations per token (W4A8: fastest — the
    int8 batched group dot); False keeps bf16 activations (W4A16 exact,
    reference semantics `hf_7B_model/speed_7B.py:200-203`, ~25% slower).
    Default from env INT4_DECODE_ACT (int8|bf16)."""
    if int8_act is None:
        int8_act = _INT4_ACT_DEFAULT
    shape = x.shape
    x2 = x.reshape(-1, shape[-1])
    Mrows = x2.shape[0]
    G, g, N = w4g.shape
    M = max(8, _round_up_int(Mrows, 8))
    perk, bn = _pick_perk_bn(G, N, g)
    assert perk, (G, N, g)
    if int8_act:
        # amax over bf16 (max/abs are exact, conversion monotonic — same
        # scale as reducing the f32 upcast) so the f32 x never
        # materializes: with a shared f32 intermediate XLA pinned it to
        # VMEM with an async copy pair per call (~0.4 ms/token of pure
        # DMA latency across the 56 decode matvecs, r5 trace)
        amax = jnp.max(jnp.abs(x2), axis=-1,
                       keepdims=True).astype(jnp.float32)
        xscale = jnp.maximum(amax, 1e-6) / 127.0
        qx = jnp.clip(jnp.round(x2.astype(jnp.float32) / xscale),
                      -127, 127).astype(jnp.int8)
        qx = jnp.pad(qx, ((0, M - Mrows), (0, 0)))
        xg = qx.reshape(M, G, g).swapaxes(0, 1)
        xs = jnp.pad(xscale, ((0, M - Mrows), (0, 0)),
                     constant_values=1.0)
    else:
        xb = jnp.pad(x2.astype(jnp.bfloat16), ((0, M - Mrows), (0, 0)))
        xg = xb.reshape(M, G, g).swapaxes(0, 1)
        xs = jnp.ones((M, 1), jnp.float32)
    y = _int4g_matvec_pallas(xg, w4g, s3, z3, xs, perk, bn, int8_act,
                             jnp.bfloat16)[:Mrows]
    return y.reshape(*shape[:-1], N)


def _round_up_int(x: int, m: int) -> int:
    return (x + m - 1) // m * m


# ---------------------------------------------------------------------------
# grouped-INT4 decode matvec from SUBLANE-NIBBLE-PACKED int8 (round 5)
# ---------------------------------------------------------------------------
# The grouped-s4 kernel above needs an s4 [G, g, N] operand, and s4
# arrays cannot cross a jit boundary on this runtime — so every decode
# block re-materializes the conversion (~0.35 ms/token amortized at
# block 64, r4 trace; VERDICT r4 weak #2).  This variant stores the
# weight as ORDINARY int8 [G, g/2, N] with two adjacent g-rows per byte
# (low nibble = even row — the order pltpu.bitcast uses, verified on
# chip by tools/s4_packed_kernel_probe.py) and unpacks per-TILE inside
# the kernel via `pltpu.bitcast(tile, int4)`, which splits the sublane
# dim in-register: int8 [perk, g/2, bn] -> s4 [perk, g, bn].  Same HBM
# bytes as native s4, no conversion pass at all, and the int8 operand
# crosses jit boundaries freely.  On-chip: 1.64 ms/call vs the
# conversion+s4 path's 2.25 at the gate_up size (probe, 2026-08-22).
# (jax.lax.bitcast_convert_type, which splits the LANE dim, does not
# lower in Mosaic: "Changing bitwidths not supported".)

def pack_int4_sublane(qw4: jax.Array, group_size: int) -> jax.Array:
    """Host-side, once per load: split-half packed int8 [K/2, N] ->
    sublane-nibble-packed int8 [G, g/2, N] for int4gp_matvec.

    Must run on the PRE-`repack_int4_rows` tensor (unpack_int4 assumes
    the global split-half layout); the result row-shards along G
    directly, no per-shard repacking needed."""
    w8 = unpack_int4(qw4)                    # int8 [K, N]
    K, N = w8.shape
    G = K // group_size
    u = jax.lax.bitcast_convert_type(
        w8.reshape(G, group_size, N), jnp.uint8) & 0xF
    b = u[:, 0::2] | (u[:, 1::2] << 4)
    return jax.lax.bitcast_convert_type(b, jnp.int8)


def unpack_int4_sublane(qw4p: jax.Array) -> jax.Array:
    """Inverse (reference/CPU): int8 [G, g/2, N] -> int8 [G, g, N]."""
    u = jax.lax.bitcast_convert_type(qw4p, jnp.uint8)
    lo = (u & 0xF).astype(jnp.int8)
    hi = ((u >> 4) & 0xF).astype(jnp.int8)
    lo = jnp.where(lo >= 8, lo - 16, lo)
    hi = jnp.where(hi >= 8, hi - 16, hi)
    G, gh, N = qw4p.shape
    return jnp.stack([lo, hi], axis=2).reshape(G, 2 * gh, N)


def _int4gp_kernel(x_ref, w_ref, s_ref, z_ref, xs_ref, o_ref, acc_ref, *,
                   k_steps: int, int8_act: bool):
    ik = pl.program_id(1)

    @pl.when(ik == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    xg = x_ref[:]                                # [perk, M, g]
    w4 = pltpu.bitcast(w_ref[:], jnp.int4)       # [perk, g, bn]
    if int8_act:
        w = w4.astype(jnp.int8)
        p = jax.lax.dot_general(
            xg, w, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.int32)    # [perk, M, bn]
        p = p.astype(jnp.float32)
        xsum = jnp.sum(xg.astype(jnp.int32), axis=2).astype(jnp.float32)
    else:
        w = w4.astype(jnp.bfloat16)
        p = jax.lax.dot_general(
            xg, w, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        xsum = jnp.sum(xg.astype(jnp.float32), axis=2)
    s = s_ref[:, 0].astype(jnp.float32)          # [perk, bn]
    z = z_ref[:, 0].astype(jnp.float32)
    y = (p - z[:, None, :] * xsum[:, :, None]) * s[:, None, :]
    acc_ref[:] += jnp.sum(y, axis=0)

    @pl.when(ik == k_steps - 1)
    def _():
        o_ref[:] = (acc_ref[:] * xs_ref[:].astype(jnp.float32)
                    ).astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("perk", "bn", "int8_act", "out_dtype"))
def _int4gp_matvec_pallas(xg, qw4p, s3, z3, xscale, perk, bn, int8_act,
                          out_dtype):
    """xg [G, M, g] (int8 or bf16); qw4p int8 [G, g/2, N];
    s3/z3 [G, 1, N]; xscale [M, 1] f32 per-row activation scale."""
    G, M, g = xg.shape
    N = qw4p.shape[2]
    k_steps = G // perk
    out = pl.pallas_call(
        functools.partial(_int4gp_kernel, k_steps=k_steps,
                          int8_act=int8_act),
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
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
        scratch_shapes=[pltpu.VMEM((M, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * G * g,
            bytes_accessed=G * g * N // 2 + G * N * 4 + M * N * 2,
            transcendentals=0),
    )(xg, qw4p, s3, z3, xscale)
    return out


def int4gp_matvec_ref(x, qw4p, s3, z3):
    """jnp reference / CPU fallback: dequantize and matmul in f32."""
    G, gh, N = qw4p.shape
    g = 2 * gh
    w8 = unpack_int4_sublane(qw4p).astype(jnp.float32)
    w = (w8 - z3.astype(jnp.float32)) * s3.astype(jnp.float32)
    w = w.reshape(G * g, N)
    shape = x.shape
    x2 = x.reshape(-1, shape[-1]).astype(jnp.float32)
    y = jnp.dot(x2, w, preferred_element_type=jnp.float32)
    return y.astype(jnp.bfloat16).reshape(*shape[:-1], N)


def int4gp_matvec(x, qw4p, s3, z3, int8_act: Optional[bool] = None):
    """Decode matvec against sublane-nibble-packed grouped-INT4 weights
    (models.common.fuse_params "qw4p" layout).  x [..., K] bf16 ->
    [..., N] bf16.  Same activation-precision switch as int4g_matvec."""
    if not _on_tpu():
        return int4gp_matvec_ref(x, qw4p, s3, z3)
    if int8_act is None:
        int8_act = _INT4_ACT_DEFAULT
    shape = x.shape
    x2 = x.reshape(-1, shape[-1])
    Mrows = x2.shape[0]
    G, gh, N = qw4p.shape
    g = 2 * gh
    M = max(8, _round_up_int(Mrows, 8))
    perk, bn = _pick_perk_bn(G, N, g)
    assert perk, (G, N, g)
    if int8_act:
        amax = jnp.max(jnp.abs(x2), axis=-1,
                       keepdims=True).astype(jnp.float32)
        xscale = jnp.maximum(amax, 1e-6) / 127.0
        qx = jnp.clip(jnp.round(x2.astype(jnp.float32) / xscale),
                      -127, 127).astype(jnp.int8)
        qx = jnp.pad(qx, ((0, M - Mrows), (0, 0)))
        xg = qx.reshape(M, G, g).swapaxes(0, 1)
        xs = jnp.pad(xscale, ((0, M - Mrows), (0, 0)),
                     constant_values=1.0)
    else:
        xb = jnp.pad(x2.astype(jnp.bfloat16), ((0, M - Mrows), (0, 0)))
        xg = xb.reshape(M, G, g).swapaxes(0, 1)
        xs = jnp.ones((M, 1), jnp.float32)
    y = _int4gp_matvec_pallas(xg, qw4p, s3, z3, xs, perk, bn, int8_act,
                              jnp.bfloat16)[:Mrows]
    return y.reshape(*shape[:-1], N)


def int4_matmul(x, qw4, scales, zeros):
    shape = x.shape
    x2 = x.reshape(-1, shape[-1])
    K = x2.shape[-1]
    half = K // 2
    g = K // scales.shape[0]
    N = qw4.shape[1]
    M = x2.shape[0]
    if _on_tpu() and M <= 64:
        bk, bn = _pick_bk_bn_matvec(half, N, g)
        if not bk:
            bk = _pick_bk(half, g)
            bn = next((b for b in (1024, 512, 256, 128) if N % b == 0), 0)
    else:
        bk = _pick_bk(half, g) if _on_tpu() else 0
        bn = next((b for b in (1024, 512, 256, 128) if N % b == 0), 0)
    if bk and bn:
        orig_m = M
        if M % 8 != 0:
            pad = 8 - M % 8
            x2 = jnp.pad(x2, ((0, pad), (0, 0)))
            M += pad
        bm = 32 if orig_m <= 64 else min(512, M)
        y = _int4_matmul_pallas(x2, qw4, scales, zeros, bm=bm, bn=bn,
                                bk=bk)[:orig_m]
        return y.reshape(*shape[:-1], N)
    y = int4_matmul_ref(x2, qw4, scales, zeros)
    return y.reshape(*shape[:-1], N)
