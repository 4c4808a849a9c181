"""Fused RMSNorm Pallas kernels.

Round-5 trace finding: XLA lowers the jnp rms_norm (fp32 internal math)
by MATERIALIZING the f32 upcast of x ([4096,3584] f32 copy, ~680 GB/s)
and then reading it twice (variance multiply_reduce at ~303 GB/s +
normalize) — ~0.36 ms/layer/chunk, ~10 ms of a 224 ms prefill chunk.
The fused kernel reads x (bf16) once, keeps all fp32 math in registers,
and writes bf16 once: ~4x less HBM traffic, one dispatch.

Semantics match ops/naive.rms_norm / rms_norm_residual exactly (fp32
variance, rsqrt, fp32 weight multiply, cast back) — the fla RMSNorm
(prenorm=True) convention of `hf_7B_model/modeling_gla_swa.py:119`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _on_tpu() -> bool:
    return jax.default_backend() in ("tpu", "axon")


def _norm_kernel(x_ref, w_ref, o_ref, *, eps: float):
    xf = x_ref[:].astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    out = xf * jax.lax.rsqrt(var + eps) * w_ref[:].astype(jnp.float32)
    o_ref[:] = out.astype(o_ref.dtype)


def _norm_res_kernel(x_ref, r_ref, w_ref, o_ref, ro_ref, *, eps: float):
    rf = x_ref[:].astype(jnp.float32) + r_ref[:].astype(jnp.float32)
    ro_ref[:] = rf.astype(ro_ref.dtype)
    var = jnp.mean(rf * rf, axis=-1, keepdims=True)
    out = rf * jax.lax.rsqrt(var + eps) * w_ref[:].astype(jnp.float32)
    o_ref[:] = out.astype(o_ref.dtype)


def _pick_bt(T: int) -> int:
    for bt in (256, 128, 64, 32, 16, 8):
        if T % bt == 0:
            return bt
    return 0


@functools.partial(jax.jit, static_argnames=("eps", "bt"))
def _rms_norm_call(x2, w, eps, bt):
    T, H = x2.shape
    return pl.pallas_call(
        functools.partial(_norm_kernel, eps=eps),
        grid=(T // bt,),
        in_specs=[
            pl.BlockSpec((bt, H), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bt, H), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, H), x2.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        cost_estimate=pl.CostEstimate(
            flops=4 * T * H, bytes_accessed=4 * T * H, transcendentals=T),
    )(x2, w)


@functools.partial(jax.jit, static_argnames=("eps", "bt"))
def _rms_norm_res_call(x2, r2, w, eps, bt):
    T, H = x2.shape
    return pl.pallas_call(
        functools.partial(_norm_res_kernel, eps=eps),
        grid=(T // bt,),
        in_specs=[
            pl.BlockSpec((bt, H), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, H), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bt, H), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, H), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((T, H), x2.dtype),
                   jax.ShapeDtypeStruct((T, H), x2.dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        cost_estimate=pl.CostEstimate(
            flops=5 * T * H, bytes_accessed=8 * T * H, transcendentals=T),
    )(x2, r2, w)


def fits(x: jax.Array, weight: jax.Array) -> bool:
    """Kernel eligibility: 2-D-able rows with a lane-aligned hidden dim;
    small row counts are padded to a sublane multiple (decode S=1: the
    jnp fallback materialized+VMEM-pinned the shared f32 upcast —
    ~0.42 ms/token of copy latency, r5 trace).  The jnp path stays for
    CPU and odd hidden dims."""
    if not _on_tpu() or x.ndim < 2:
        return False
    H = x.shape[-1]
    return H % 128 == 0 and weight.shape == (H,)


def _pad_rows(T: int) -> int:
    Tp = max(8, (T + 7) // 8 * 8)
    while _pick_bt(Tp) == 0:
        Tp += 8
    return Tp


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def rms_norm(x: jax.Array, weight: jax.Array, eps: float = 1e-6):
    T = 1
    for d in x.shape[:-1]:
        T *= d
    x2 = x.reshape(T, x.shape[-1])
    Tp = _pad_rows(T)
    if Tp != T:
        x2 = jnp.pad(x2, ((0, Tp - T), (0, 0)))
    out = _rms_norm_call(x2, weight, float(eps), _pick_bt(Tp))
    return out[:T].reshape(x.shape)


def _rms_fwd(x, weight, eps):
    return rms_norm(x, weight, eps), (x, weight)


def _rms_bwd_math(x, weight, eps, g):
    """jnp backward (forward recomputed in fp32 — cheaper than saving the
    normalized activations)."""
    xf = x.astype(jnp.float32)
    gf = g.astype(jnp.float32)
    wf = weight.astype(jnp.float32)
    H = x.shape[-1]
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    n = jax.lax.rsqrt(var + eps)
    gw = gf * wf
    dx = n * gw - xf * (n ** 3) * jnp.mean(gw * xf, axis=-1, keepdims=True)
    dw = jnp.sum((gf * xf * n).reshape(-1, H), axis=0)
    return dx.astype(x.dtype), dw.astype(weight.dtype)


def _rms_bwd(eps, resids, g):
    x, weight = resids
    return _rms_bwd_math(x, weight, eps, g)


rms_norm.defvjp(_rms_fwd, _rms_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def rms_norm_residual(x: jax.Array, residual: jax.Array, weight: jax.Array,
                      eps: float = 1e-6):
    T = 1
    for d in x.shape[:-1]:
        T *= d
    x2 = x.reshape(T, x.shape[-1])
    r2 = residual.reshape(T, x.shape[-1])
    Tp = _pad_rows(T)
    if Tp != T:
        x2 = jnp.pad(x2, ((0, Tp - T), (0, 0)))
        r2 = jnp.pad(r2, ((0, Tp - T), (0, 0)))
    out, r = _rms_norm_res_call(x2, r2, weight, float(eps), _pick_bt(Tp))
    return out[:T].reshape(x.shape), r[:T].reshape(x.shape)


def _rms_res_fwd(x, residual, weight, eps):
    out, r = rms_norm_residual(x, residual, weight, eps)
    return (out, r), (r, weight)


def _rms_res_bwd(eps, resids, cts):
    r, weight = resids
    go, gr = cts
    dx, dw = _rms_bwd_math(r, weight, eps, go)
    dr_total = dx + gr.astype(dx.dtype)
    return dr_total, dr_total, dw


rms_norm_residual.defvjp(_rms_res_fwd, _rms_res_bwd)
