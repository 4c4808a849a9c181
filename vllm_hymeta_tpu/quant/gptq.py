"""Calibrated GPTQ quantizer (Hessian-based, layer-sequential).

The TPU-native equivalent of the reference's producer pipelines
(`hf_7B_model/quant_7B.py:13-36` gptqmodel QuantizeConfig(bits,
group_size=64); `hf_model/hymeta_gptq.py:8-35` module groups): a few
hundred calibration sequences run through the bf16 model layer by layer,
each quantizable Linear accumulates the input-outer-product Hessian
H = Σ x xᵀ, and weights are quantized column-by-column with the standard
GPTQ error-compensation recurrence

    q_k   = quant(w_k)
    err_k = (w_k - dq_k) / U[k, k]
    W[k+1:] -= U[k, k+1:]ᵀ · err_k        (U = upper Cholesky of H⁻¹)

so later columns absorb earlier columns' rounding error in the metric
induced by the calibration activations.  Everything is pure JAX: the
recurrence runs in `lax.fori_loop` blocks of one quantization group, the
block-to-rest update is a masked matmul (MXU), and the Cholesky/inverse
use `jnp.linalg` — no torch, no external dependency.

Output layout == quant/transform.quantize_params_gptq (runtime
"qw4"/"qw" + "scales" + centered "zeros"), so the serving kernels and
`pack_gptq_checkpoint` (the gptqmodel-format writer, round-tripped
through quant/gptq_reader in tests) consume it unchanged.
"""

from __future__ import annotations

import contextlib
import functools
from typing import Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import jax.scipy.linalg

from vllm_hymeta_tpu.quant.transform import (
    DEFAULT_EXCLUDE, _should_quantize, _walk, _get, _set)


# ---------------------------------------------------------------------------
# per-tensor GPTQ
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("bits", "group_size",
                                             "damp_frac"))
def gptq_quantize_tensor(w: jax.Array, H: jax.Array, bits: int = 4,
                         group_size: int = 64, damp_frac: float = 0.01):
    """Quantize one weight [K, N] against Hessian H [K, K] (= Σ x xᵀ over
    calibration activations x [*, K]).

    Returns (q uint levels fp32 [K, N], scales [K/g, N], zeros_q [K/g, N]
    uncentered) — asymmetric per-group min/max grid, the same grid
    `transform.quantize_params_gptq` uses, so RTN vs GPTQ differ only in
    rounding targets, never in representable values.
    """
    K, N = w.shape
    g = group_size
    G = K // g
    qmax = float(2 ** bits - 1)
    W = w.astype(jnp.float32)

    d = jnp.diagonal(H)
    dead = d <= 0
    H = H + jnp.diag(jnp.where(dead, 1.0 - d, 0.0))
    W = jnp.where(dead[:, None], 0.0, W)
    damp = damp_frac * jnp.mean(jnp.diagonal(H))
    H = H + damp * jnp.eye(K, dtype=jnp.float32)
    # U: upper Cholesky of H⁻¹ (H⁻¹ = Uᵀ U), the GPTQ update metric.
    # Computed WITHOUT jnp.linalg.inv: at K=18944 (down_proj) the TPU LU
    # block ("LuDecompositionBlock") exceeds scoped VMEM.  Flip-Cholesky
    # route instead: H = R Rᵀ with R UPPER (R = J·chol(J H J)·J for the
    # exchange matrix J, realized as [::-1] reversals), then U = R⁻¹ via
    # triangular solve — H⁻¹ = R⁻ᵀR⁻¹ = UᵀU.  Verified on chip at
    # K=18944: max residual of H·(UᵀU)·v vs v is 1.6e-3.
    Hf = H[::-1, ::-1]
    Lf = jnp.linalg.cholesky(Hf)
    R = Lf[::-1, ::-1]                                 # upper, H = R Rᵀ
    U = jax.scipy.linalg.solve_triangular(
        R, jnp.eye(K, dtype=jnp.float32), lower=False)  # upper [K, K]

    rows = jnp.arange(g, dtype=jnp.int32)
    krows = jnp.arange(K, dtype=jnp.int32)

    def block_step(b, carry):
        W, Q, S, Z = carry
        i1 = b * g
        Wb = jax.lax.dynamic_slice(W, (i1, 0), (g, N))          # [g, N]
        Ub = jax.lax.dynamic_slice(U, (i1, i1), (g, g))         # [g, g]
        # group grid from the CURRENT (error-compensated) block
        wmin = jnp.minimum(jnp.min(Wb, axis=0), 0.0)
        wmax = jnp.maximum(jnp.max(Wb, axis=0), 0.0)
        scale = jnp.maximum(wmax - wmin, 1e-8) / qmax           # [N]
        zero_q = jnp.round(-wmin / scale)                       # [N]

        def col_step(j, c):
            Wb, Q_b, E = c
            w_j = Wb[j]                                          # [N]
            q_j = jnp.clip(jnp.round(w_j / scale) + zero_q, 0.0, qmax)
            dq = (q_j - zero_q) * scale
            err = (w_j - dq) / Ub[j, j]
            upd = jnp.where(rows > j, Ub[j], 0.0)[:, None] * err[None]
            Wb = Wb - upd
            return (Wb, Q_b.at[j].set(q_j), E.at[j].set(err))

        Wb, Qb, E = jax.lax.fori_loop(
            0, g, col_step,
            (Wb, jnp.zeros((g, N), jnp.float32),
             jnp.zeros((g, N), jnp.float32)))
        # propagate the block's error to all later columns (one matmul);
        # U rows i1:i1+g are zero left of the diagonal, and rows < i2 are
        # masked so already-quantized columns stay fixed
        Urows = jax.lax.dynamic_slice(U, (i1, 0), (g, K))        # [g, K]
        upd = jnp.dot(Urows.T, E, preferred_element_type=jnp.float32)
        W = W - jnp.where((krows >= i1 + g)[:, None], upd, 0.0)
        W = jax.lax.dynamic_update_slice(W, Wb, (i1, 0))
        Q = jax.lax.dynamic_update_slice(Q, Qb, (i1, 0))
        S = jax.lax.dynamic_update_slice(S, scale[None], (b, 0))
        Z = jax.lax.dynamic_update_slice(Z, zero_q[None], (b, 0))
        return (W, Q, S, Z)

    _, Q, S, Z = jax.lax.fori_loop(
        0, G, block_step,
        (W, jnp.zeros((K, N), jnp.float32),
         jnp.zeros((G, N), jnp.float32), jnp.zeros((G, N), jnp.float32)))
    return Q, S, Z


def _to_runtime(Q, S, Z, bits: int) -> dict:
    """uint levels + uncentered zeros -> the runtime layout (centered int8
    or packed int4, like transform.quantize_params_gptq)."""
    mid = (2 ** bits) // 2
    qc = (Q - mid).astype(jnp.int8)
    out = {"scales": S, "zeros": Z - mid}
    if bits == 4:
        from vllm_hymeta_tpu.ops.quant_matmul import pack_int4
        out["qw4"] = pack_int4(qc)
    else:
        out["qw"] = qc
    return out


def dequant_runtime(p: dict) -> jax.Array:
    """Dequantize a runtime-layout linear back to fp32 [K, N]."""
    from vllm_hymeta_tpu.ops.quant_matmul import unpack_int4
    qc = unpack_int4(p["qw4"]) if "qw4" in p else p["qw"]
    K, N = qc.shape
    g = K // p["scales"].shape[0]
    qf = qc.astype(jnp.float32).reshape(K // g, g, N)
    return ((qf - p["zeros"][:, None, :]) * p["scales"][:, None, :]
            ).reshape(K, N)


# ---------------------------------------------------------------------------
# activation capture: Hessians per quantizable linear, one layer at a time
# ---------------------------------------------------------------------------

_CAPTURE: Optional[dict] = None


@contextlib.contextmanager
def _patched_linear():
    """Temporarily reroute every `linear` call site (the modules import the
    symbol by value) through a recorder that accumulates xᵀx keyed by the
    weight leaf's id at trace time."""
    from vllm_hymeta_tpu.models import layers as _layers
    from vllm_hymeta_tpu.models import common as _common
    from vllm_hymeta_tpu.models import gla_swa as _gla
    from vllm_hymeta_tpu.models import hymeta as _hy
    orig = _layers.linear

    def rec_linear(p: dict, x: jax.Array) -> jax.Array:
        cap = _CAPTURE
        if cap is not None:
            key = cap["ids"].get(id(p))
            if key is not None:
                xf = x.reshape(-1, x.shape[-1]).astype(jnp.float32)
                h = jnp.dot(xf.T, xf, preferred_element_type=jnp.float32)
                prev = cap["hess"].get(key)
                cap["hess"][key] = h if prev is None else prev + h
        return orig(p, x)

    mods = (_layers, _common, _gla, _hy)
    try:
        for m in mods:
            m.linear = rec_linear
        yield
    finally:
        for m in mods:
            m.linear = orig


def _quantizable_paths(layer_params: dict,
                       exclude: Tuple[str, ...]) -> List[Tuple[str, ...]]:
    """Paths (within ONE layer's param dict) of bf16 linears to quantize."""
    out = []
    for path, w in _walk(layer_params):
        if path[-1] == "w" and _should_quantize(("layers", "0") + path, w,
                                                exclude):
            out.append(path[:-1])
    return out


def layer_hessians(layer_fn: Callable[[dict, jax.Array], jax.Array],
                   lp: dict, x: jax.Array,
                   paths: List[Tuple[str, ...]]
                   ) -> Tuple[jax.Array, Dict[Tuple[str, ...], jax.Array]]:
    """Run one layer forward capturing H = Σ x xᵀ for each quantizable
    linear.  Returns (layer output, {path: H}).  Traced under jit — the
    Hessians come back as real outputs of the jitted program."""
    global _CAPTURE
    ids = {id(_get(lp, p)): p for p in paths}
    _CAPTURE = {"ids": ids, "hess": {}}
    try:
        with _patched_linear():
            y = layer_fn(lp, x)
        hess = _CAPTURE["hess"]
    finally:
        _CAPTURE = None
    missing = [p for p in paths if p not in hess]
    if missing:
        raise RuntimeError(f"calibration never reached linears: {missing}")
    return y, hess


# ---------------------------------------------------------------------------
# layer-sequential driver
# ---------------------------------------------------------------------------

def quantize_params_gptq_calibrated(
        cfg, params: dict, calib_tokens,
        bits: int = 4, group_size: int = 64,
        exclude: Tuple[str, ...] = DEFAULT_EXCLUDE,
        damp_frac: float = 0.01) -> dict:
    """Calibration-driven GPTQ over a full model (both families).

    calib_tokens: int32 [B, T] calibration batch.  Layers are processed
    sequentially: capture Hessians with a jitted forward (reused across
    same-shaped layers), quantize each linear with
    `gptq_quantize_tensor`, then PROPAGATE activations through the
    quantized layer (standard GPTQ: later layers calibrate against the
    quantization the earlier ones actually deploy).

    Returns a new param tree in the runtime GPTQ layout (same structure
    as transform.quantize_params_gptq).  lm_head/gk/norm/embed exclusions
    mirror the reference pipelines (`hf_7B_model/quant_7B.py:15`).
    """
    import copy
    from vllm_hymeta_tpu.config import HymetaConfig
    from vllm_hymeta_tpu.models import common
    from vllm_hymeta_tpu.parallel.pctx import NULL_CTX

    calib_tokens = jnp.asarray(calib_tokens, jnp.int32)
    B, T = calib_tokens.shape
    is_hymeta = isinstance(cfg, HymetaConfig)

    if is_hymeta:
        from vllm_hymeta_tpu.models import hymeta as fam
        from vllm_hymeta_tpu.models.layers import embed
        M = cfg.num_meta_tokens
        lbs = fam.lower_bound_table(cfg, params)
        emb = embed(params["embed"], calib_tokens)
        meta = jnp.broadcast_to(
            params["meta_tokens"].astype(emb.dtype)[None],
            (B, M, emb.shape[-1]))
        x = jnp.concatenate([meta, emb], axis=1)
        positions = jnp.arange(M + T, dtype=jnp.int32)

        def make_layer_fn(i):
            return lambda lp, xx: fam.layer_forward(
                cfg, lp, xx, positions, i, lbs)

        def kind_of(i):   # layer_window / lower-bound / ffn kind vary per
            return ("hy", i)   # layer: trace each (offline cost only)
    else:
        from vllm_hymeta_tpu.models import gla_swa as fam
        x = common.embed_vp(params["embed"], calib_tokens, NULL_CTX)
        positions = jnp.arange(T, dtype=jnp.int32)[None].repeat(B, 0)

        def make_layer_fn(i):
            return lambda lp, xx: fam.layer_forward(
                cfg, lp, xx, positions, cfg.is_swa_layer(i))

        def kind_of(i):
            return ("swa" if cfg.is_swa_layer(i) else "gla",)

    out = copy.copy(params)
    out["layers"] = []
    cap_jit: Dict[tuple, Callable] = {}
    prop_jit: Dict[tuple, Callable] = {}
    for i, lp in enumerate(params["layers"]):
        paths = [p for p in _quantizable_paths(lp, exclude)
                 if _get(lp, p)["w"].shape[0] % group_size == 0]
        layer_fn = make_layer_fn(i)
        kind = kind_of(i) + (tuple(paths),)
        if kind not in cap_jit:
            # one trace per layer kind; the capture recorder runs at trace
            # time, later same-shaped layers hit the jit cache with their
            # own param values bound positionally
            cap_jit[kind] = jax.jit(
                lambda lp_, x_, fn_=layer_fn, ps_=tuple(paths):
                layer_hessians(fn_, lp_, x_, list(ps_)))
            prop_jit[kind] = jax.jit(
                lambda lp_, x_, fn_=layer_fn: fn_(lp_, x_))
        _, hess = cap_jit[kind](lp, x)

        lq = copy.deepcopy(jax.tree.map(lambda a: a, lp))
        for p in paths:
            w = _get(lp, p)["w"]
            Q, S, Z = gptq_quantize_tensor(
                w, hess[p], bits=bits, group_size=group_size,
                damp_frac=damp_frac)
            node = _to_runtime(Q, S, Z, bits)
            parent = _get(lq, p)
            del parent["w"]
            parent.update(node)
        # propagate through the QUANTIZED layer (runtime dispatch dequants)
        x = prop_jit[kind](lq, x)
        out["layers"].append(lq)
    return out


# ---------------------------------------------------------------------------
# gptqmodel-format writer (producer side of quant/gptq_reader)
# ---------------------------------------------------------------------------

def pack_gptq_checkpoint_linear(p: dict, bits: int) -> dict:
    """Runtime GPTQ layout -> gptqmodel v2 packed tensors
    {"qweight" int32 [K*bits/32, N], "qzeros" int32 [G, N*bits/32],
    "scales" fp16 [G, N], "g_idx" int32 [K]} (zero_offset=False
    convention — round-trips exactly through
    gptq_reader.convert_gptq_linear)."""
    import numpy as np
    from vllm_hymeta_tpu.ops.quant_matmul import unpack_int4
    qc = np.asarray(unpack_int4(p["qw4"]) if "qw4" in p else p["qw"],
                    dtype=np.int32)
    K, N = qc.shape
    G = p["scales"].shape[0]
    mid = (2 ** bits) // 2
    q = (qc + mid).astype(np.uint32)                    # uint levels
    z = (np.asarray(p["zeros"], np.float32) + mid).astype(np.uint32)
    per = 32 // bits
    qweight = np.zeros((K // per, N), np.uint32)
    for j in range(per):
        qweight |= q[j::per] << (bits * j)
    qzeros = np.zeros((G, N // per), np.uint32)
    for j in range(per):
        qzeros |= z[:, j::per] << (bits * j)
    return {
        "qweight": qweight.astype(np.int32),
        "qzeros": qzeros.astype(np.int32),
        "scales": np.asarray(p["scales"], np.float16),
        "g_idx": (np.arange(K, dtype=np.int32) // (K // G)),
    }
