"""Sliding-window softmax attention for TPU.

Replaces the reference's flash-attn CUDA kernels (SURVEY.md §2.8 N4/N5/N6):
  * `flash_window_prefill` — Pallas flash-attention over a position-ordered
    key tensor [context ∥ chunk] with causal sliding-window masking and LSE
    output.  For windowed layers the kernel only visits the key blocks
    inside each query block's window (relative block indexing), so the cost
    is O(T · W) not O(T²).
  * decode (seqlen-1) paths are plain jnp over the ring buffer — HBM-bound
    gathers + small matmuls that XLA handles well.

Mask semantics follow the reference spec exactly
(`attention/fa_kernel_metatoken.py:377-410`): a query at position p attends
key position s iff 0 <= p - s < window_keys (window_keys == W for the 70B
naive convention, W+1 for the 7B FA2 convention), or unconditionally for
`mask_mode="all"` (the metatoken pass).  Invalid (padded) keys carry
negative positions.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.experimental.pallas.ops.tpu.splash_attention import (
    splash_attention_kernel as _splash_kernel_lib,
    splash_attention_mask as _splash_mask_lib)

INVALID_POS = -(2 ** 30)
NEG_INF = -1e30


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _flash_kernel(qpos_ref, kpos_ref, q_ref, k_ref, v_ref,
                  o_ref, lse_ref, m_ref, l_ref, acc_ref, *,
                  mask_mode: str, window_keys: int, scale: float,
                  nkb: int, rep: int):
    """Block shapes: q/o [1, rep, Bq, D] (one KV-head group, all `rep`
    query heads — GQA folded into the tile so each K/V block is fetched
    once per group, not once per query head), k/v [1, Bk, D]."""
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    Bq = q_ref.shape[2]
    D = q_ref.shape[3]
    # scale folded into q: touches rep*Bq*D elements once instead of
    # rep*Bq*Bk scores every step
    q = (q_ref[0].reshape(rep * Bq, D) * jnp.bfloat16(scale))
    k = k_ref[0]                           # [Bk, D]
    v = v_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)  # [rep*Bq, Bk]

    qp = qpos_ref[0]                       # [Bq] int32
    kp = kpos_ref[0]                       # [Bk]
    Bk = kp.shape[0]
    valid = (kp >= 0)[None, :]
    if mask_mode == "all":
        mask = jnp.broadcast_to(valid, (Bq, Bk))
    else:
        d = qp[:, None] - kp[None, :]
        mask = (d >= 0) & valid
        if mask_mode == "window":
            mask = mask & (d < window_keys)
    # broadcast over the folded head dim without materializing a tile
    s = jnp.where(mask[None], s.reshape(rep, Bq, Bk),
                  NEG_INF).reshape(rep * Bq, Bk)

    m_prev = m_ref[:]                      # [rep*Bq, 1]
    m_cur = jnp.max(s, axis=1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)                 # [rep*Bq, Bk]
    l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=1, keepdims=True)
    acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot(
        p.astype(v.dtype), v, preferred_element_type=jnp.float32)
    m_ref[:] = m_new

    @pl.when(j == nkb - 1)
    def _():
        l = jnp.maximum(l_ref[:], 1e-37)
        o_ref[0] = (acc_ref[:] / l).reshape(
            rep, Bq, D).astype(o_ref.dtype)
        lse_ref[0] = (m_ref[:] + jnp.log(l)).reshape(rep, 1, Bq)


@functools.partial(
    jax.jit,
    static_argnames=("mask_mode", "window_keys", "scale", "blk",
                     "off_blocks", "wb_blocks"))
def _flash_call(q, k, v, q_pos, k_pos, mask_mode, window_keys, scale,
                blk, off_blocks, wb_blocks):
    """q: [Hq, Tq_p, D]; k/v: [Hkv, Tk_p, D]; positions int32 [1, T*].

    Windowed contract: key index (off_blocks*blk + r) holds the same
    timeline position as query row r (both may be masked/invalid).
    Grid is (Hkv, Tq/bq, nkb) with the GQA group folded into the q tile;
    q blocks (bq = 2*blk) are larger than kv blocks (blk) — grid-step
    latency, not DMA, is this kernel's bound, so fewer/fatter steps win.
    """
    Hq, Tq, D = q.shape
    Hkv, Tk, _ = k.shape
    rep = Hq // Hkv
    bq = 2 * blk if Tq % (2 * blk) == 0 else blk
    rq = bq // blk
    nq = Tq // bq
    qg = q.reshape(Hkv, rep, Tq, D)
    if mask_mode == "window":
        nkb = wb_blocks + rq

        def k_index(g, i, j):
            return (g, i * rq + off_blocks - wb_blocks + j, 0)

        def kp_index(g, i, j):
            return (0, i * rq + off_blocks - wb_blocks + j)
    else:
        nkb = Tk // blk

        def k_index(g, i, j):
            return (g, j, 0)

        def kp_index(g, i, j):
            return (0, j)

    kernel = functools.partial(
        _flash_kernel, mask_mode=mask_mode, window_keys=window_keys,
        scale=scale, nkb=nkb, rep=rep)
    kv_bytes = (min(nkb * blk, Tk)) * D * 2
    out, lse = pl.pallas_call(
        kernel,
        grid=(Hkv, nq, nkb),
        in_specs=[
            pl.BlockSpec((1, bq), lambda g, i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, blk), kp_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rep, bq, D), lambda g, i, j: (g, 0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, blk, D), k_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, blk, D), k_index, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, rep, bq, D), lambda g, i, j: (g, 0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rep, 1, bq), lambda g, i, j: (g, 0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Hkv, rep, Tq, D), q.dtype),
            jax.ShapeDtypeStruct((Hkv, rep, 1, Tq), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((rep * bq, 1), jnp.float32),
            pltpu.VMEM((rep * bq, 1), jnp.float32),
            pltpu.VMEM((rep * bq, D), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=4 * Hq * Tq * nkb * blk * D,
            bytes_accessed=Hq * Tq * D * 4 + Hkv * nq * kv_bytes,
            transcendentals=2 * Hq * Tq * nkb * blk),
    )(q_pos, k_pos, qg, k, v)
    return out.reshape(Hq, Tq, D), lse.reshape(Hq, Tq)


@functools.lru_cache(maxsize=128)
def _make_splash(tq: int, tk_p: int, window_keys: int, off: int, rep: int,
                 bq: int, bkv: int, need_lse: bool):
    """Block-sparse splash-attention kernel (JAX library) for a prefill
    chunk whose q row r sits at key index off + r.  window_keys == 0 means
    causal-only (global layers).  The mask is static; key validity (unwritten
    ring entries, padded chunk tail) rides in as dynamic kv segment ids."""
    win = None if window_keys == 0 else window_keys - 1
    mask = _splash_mask_lib.MultiHeadMask(
        [_splash_mask_lib.LocalMask((tq, tk_p), window_size=(win, 0),
                                    offset=off)
         for _ in range(rep)])
    # kernels are lru_cached and may be (re)used across jit traces: build
    # the mask-info arrays eagerly so no tracer from the first trace is
    # captured in the cached kernel object
    with jax.ensure_compile_time_eval():
        return _splash_kernel_lib.make_splash_mqa_single_device(
            mask,
            block_sizes=_splash_kernel_lib.BlockSizes(
                block_q=bq, block_kv=bkv, block_kv_compute=bkv),
            save_residuals=need_lse)


def _splash_prefill(q, k, v, k_pos, window_keys: int, ctx_len: int,
                    scale: float, need_lse: bool):
    """q [Tq, Hq, D], k/v [ctx_len+Tq, Hkv, D] -> (out [Tq, Hq, D],
    lse [Hq, Tq] fp32 | None)."""
    Tq, Hq, D = q.shape
    Tk, Hkv, _ = k.shape
    rep = Hq // Hkv
    bq = min(512, Tq)
    bkv = 512
    tk_p = _round_up(Tk, bkv)
    kern = _make_splash(Tq, tk_p, window_keys, ctx_len, rep, bq, bkv,
                        need_lse)
    qg = (jnp.swapaxes(q, 0, 1).reshape(Hkv, rep, Tq, D)
          * jnp.bfloat16(scale))
    kh = jnp.pad(jnp.swapaxes(k, 0, 1), ((0, 0), (0, tk_p - Tk), (0, 0)))
    vh = jnp.pad(jnp.swapaxes(v, 0, 1), ((0, 0), (0, tk_p - Tk), (0, 0)))
    kseg = jnp.pad((k_pos >= 0).astype(jnp.int32), (0, tk_p - Tk))
    seg = _splash_kernel_lib.SegmentIds(
        q=jnp.ones((Tq,), jnp.int32), kv=kseg)
    res = jax.vmap(kern, in_axes=(0, 0, 0, None))(qg, kh, vh, seg)
    if need_lse:
        out, (lse,) = res
        return (jnp.swapaxes(out.reshape(Hq, Tq, D), 0, 1),
                lse.reshape(Hq, Tq).astype(jnp.float32))
    return jnp.swapaxes(res.reshape(Hq, Tq, D), 0, 1), None


def splash_prefill_batched(q, k, v, k_pos, window_keys: int, ctx_len: int,
                           scale: Optional[float] = None,
                           need_lse: bool = False,
                           mask_mode: Optional[str] = None):
    """Batched windowed-chunk attention for multi-request prefill steps:
    q [B, Tq, Hq, D], k/v [B, ctx_len+Tq, Hkv, D], k_pos [B, Tk] ->
    out [B, Tq, Hq, D] (+ lse [B, Hq, Tq] when need_lse).  Same static
    mask for every request (the relative [ctx ∥ chunk] alignment is
    position-independent); per-request key validity rides in the segment
    ids.  mask_mode "causal" forces global layers (window_keys == 0)."""
    B, Tq, Hq, D = q.shape
    Tk, Hkv = k.shape[1], k.shape[2]
    rep = Hq // Hkv
    if scale is None:
        scale = D ** -0.5
    if mask_mode is None:
        mask_mode = "window" if window_keys > 0 else "causal"
    win = window_keys if mask_mode == "window" else 0
    if jax.default_backend() not in ("tpu", "axon") or D != 128 \
            or Tq % min(512, Tq) or Tq % 128:
        q_pos = jnp.where(k_pos[:, ctx_len:] >= 0,
                          k_pos[:, ctx_len:], INVALID_POS)

        def ref(qb, kb, vb, qp, kp):
            return flash_window_prefill_ref(qb, kb, vb, qp, kp,
                                            win, ctx_len, scale, mask_mode)
        out, lse = jax.vmap(ref)(q, k, v, q_pos, k_pos)
        return (out, lse) if need_lse else out
    bq = min(512, Tq)
    bkv = 512
    tk_p = _round_up(Tk, bkv)
    kern = _make_splash(Tq, tk_p, win, ctx_len, rep, bq, bkv,
                        need_lse)
    qg = (jnp.swapaxes(q, 1, 2).reshape(B, Hkv, rep, Tq, D)
          * jnp.bfloat16(scale))
    kh = jnp.pad(jnp.swapaxes(k, 1, 2),
                 ((0, 0), (0, 0), (0, tk_p - Tk), (0, 0)))
    vh = jnp.pad(jnp.swapaxes(v, 1, 2),
                 ((0, 0), (0, 0), (0, tk_p - Tk), (0, 0)))
    kseg = jnp.pad((k_pos >= 0).astype(jnp.int32), ((0, 0), (0, tk_p - Tk)))

    def per_req(qg_b, kh_b, vh_b, kseg_b):
        seg = _splash_kernel_lib.SegmentIds(
            q=jnp.ones((Tq,), jnp.int32), kv=kseg_b)
        return jax.vmap(kern, in_axes=(0, 0, 0, None))(qg_b, kh_b, vh_b,
                                                       seg)

    res = jax.vmap(per_req)(qg, kh, vh, kseg)     # [B, Hkv, rep, Tq, D]
    if need_lse:
        out, (lse,) = res
        return (jnp.swapaxes(out.reshape(B, Hq, Tq, D), 1, 2),
                lse.reshape(B, Hq, Tq).astype(jnp.float32))
    return jnp.swapaxes(res.reshape(B, Hq, Tq, D), 1, 2)


def flash_window_prefill(
    q: jax.Array,       # [Tq, Hq, D] chunk queries
    k: jax.Array,       # [Tk, Hkv, D] keys: [ctx_len context ∥ Tq chunk]
    v: jax.Array,
    q_pos: jax.Array,   # [Tq] int32 timeline positions
    k_pos: jax.Array,   # [Tk] int32 (negative for invalid entries)
    window_keys: int,   # 0 => global causal
    ctx_len: int = 0,   # static: #context keys preceding the chunk in k
    scale: Optional[float] = None,
    mask_mode: Optional[str] = None,  # override: "window"|"causal"|"all"
    blk: int = 256,
    need_lse: bool = True,
) -> Tuple[jax.Array, jax.Array]:
    """Returns (out [Tq, Hq, D] in q.dtype, lse [Hq, Tq] fp32).

    Windowed mode requires keys contiguous in position with chunk key i
    (index ctx_len+i) at the same position as query i; context keys hold
    the window preceding the chunk.  "causal"/"all" modes visit every key
    block (use for global layers and the metatoken pass).
    """
    Tq, Hq, D = q.shape
    Tk, Hkv, _ = k.shape
    if scale is None:
        scale = D ** -0.5
    if mask_mode is None:
        mask_mode = "window" if window_keys > 0 else "causal"

    if jax.default_backend() not in ("tpu", "axon"):
        # Pallas TPU kernels can't lower on CPU; use the jnp reference
        return flash_window_prefill_ref(q, k, v, q_pos, k_pos, window_keys,
                                        ctx_len, scale, mask_mode)

    if mask_mode == "all" and Tk <= 512:
        # metatoken pass: 128-key dense attention — XLA einsum is at
        # roofline here (SURVEY.md N6) and the flash kernel's fp32 score
        # tile would waste scoped VMEM at large Tq
        return flash_window_prefill_ref(q, k, v, q_pos, k_pos, window_keys,
                                        ctx_len, scale, mask_mode)

    if (mask_mode in ("window", "causal") and D == 128
            and Tq % 128 == 0 and Tq % min(512, Tq) == 0
            and Tk == ctx_len + Tq):
        # block-sparse splash path: the static mask skips out-of-window
        # blocks AND the per-element mask work on interior blocks, which
        # the hand-rolled kernel below pays on every step (trace: 2.3ms
        # vs 5.9ms per 28-head 4k-chunk call on v5e)
        out, lse = _splash_prefill(
            q, k, v, k_pos,
            window_keys if mask_mode == "window" else 0,
            ctx_len, scale, need_lse)
        if lse is None:
            lse = jnp.zeros((Hq, Tq), jnp.float32)
        return out, lse

    blk = min(blk, _round_up(max(Tq, 128), 128))
    tq_p = _round_up(Tq, blk)

    qh = jnp.swapaxes(q, 0, 1)  # [Hq, Tq, D]
    kh = jnp.swapaxes(k, 0, 1)
    vh = jnp.swapaxes(v, 0, 1)
    qh = jnp.pad(qh, ((0, 0), (0, tq_p - Tq), (0, 0)))
    qp = jnp.pad(q_pos.astype(jnp.int32), (0, tq_p - Tq),
                 constant_values=INVALID_POS)[None]

    if mask_mode == "window":
        assert k.shape[0] == ctx_len + Tq, (
            "windowed mode expects keys = [ctx ∥ chunk]")
        wb = _round_up(window_keys, blk)
        # left-pad so (left + ctx_len) is a block multiple >= wb
        left = wb + (-ctx_len) % blk
        off = left + ctx_len
        tk_p = off + tq_p
        kh = jnp.pad(kh, ((0, 0), (left, tk_p - left - Tk), (0, 0)))
        vh = jnp.pad(vh, ((0, 0), (left, tk_p - left - Tk), (0, 0)))
        kp = jnp.pad(k_pos.astype(jnp.int32), (left, tk_p - left - Tk),
                     constant_values=INVALID_POS)[None]
        out, lse = _flash_call(qh, kh, vh, qp, kp, mask_mode, window_keys,
                               scale, blk, off // blk, wb // blk)
    else:
        tk_p = _round_up(Tk, blk)
        kh = jnp.pad(kh, ((0, 0), (0, tk_p - Tk), (0, 0)))
        vh = jnp.pad(vh, ((0, 0), (0, tk_p - Tk), (0, 0)))
        kp = jnp.pad(k_pos.astype(jnp.int32), (0, tk_p - Tk),
                     constant_values=INVALID_POS)[None]
        out, lse = _flash_call(qh, kh, vh, qp, kp, mask_mode, window_keys,
                               scale, blk, 0, 0)
    return jnp.swapaxes(out, 0, 1)[:Tq], lse[:, :Tq]


# ---------------------------------------------------------------------------
# jnp reference / decode paths
# ---------------------------------------------------------------------------

def flash_window_prefill_ref(q, k, v, q_pos, k_pos, window_keys,
                             ctx_len: int = 0, scale=None, mask_mode=None):
    """Naive jnp twin of flash_window_prefill (same semantics; test oracle)."""
    Tq, Hq, D = q.shape
    Hkv = k.shape[1]
    if scale is None:
        scale = D ** -0.5
    if mask_mode is None:
        mask_mode = "window" if window_keys > 0 else "causal"
    rep = Hq // Hkv
    kk = jnp.repeat(k, rep, axis=1)
    vv = jnp.repeat(v, rep, axis=1)
    logits = jnp.einsum("qhd,khd->hqk", q.astype(jnp.float32),
                        kk.astype(jnp.float32)) * scale
    valid = (k_pos >= 0)[None, :]
    if mask_mode == "all":
        mask = jnp.broadcast_to(valid, (Tq, k.shape[0]))
    else:
        d = q_pos[:, None] - k_pos[None, :]
        mask = (d >= 0) & valid
        if mask_mode == "window":
            mask = mask & (d < window_keys)
    logits = jnp.where(mask[None], logits, NEG_INF)
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    l = jnp.maximum(jnp.sum(p, axis=-1, keepdims=True), 1e-37)
    out = jnp.einsum("hqk,khd->qhd", p / l, vv.astype(jnp.float32))
    lse = (m + jnp.log(l))[..., 0]
    return out.astype(q.dtype), lse


def swa_decode(
    q: jax.Array,        # [S, Hq, D] one new token per slot
    ring_k: jax.Array,   # [S, Hkv, R, D]
    ring_v: jax.Array,
    positions: jax.Array,  # [S] int32 position of the new token
    window_keys: int,      # 0 => global (ring must hold the whole context)
    scale: Optional[float] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Decode attention over per-slot ring buffers; returns
    (out [S,Hq,D] fp32, lse [S,Hq] fp32).

    Ring entry j of a slot at current position p holds key position
    p - ((p - j) mod R) — the newest position congruent to j mod R, given
    the current token was already written at p mod R.  Entries whose
    derived position is < 0 or outside the window are masked.
    """
    S, Hq, D = q.shape
    Hkv, R = ring_k.shape[1], ring_k.shape[2]
    if scale is None:
        scale = D ** -0.5
    rep = Hq // Hkv

    j = jnp.arange(R, dtype=jnp.int32)[None, :]          # [1, R]
    p = positions.astype(jnp.int32)[:, None]             # [S, 1]
    k_pos = p - jnp.mod(p - j, R)                        # [S, R]
    d = p - k_pos
    mask = k_pos >= 0
    if window_keys > 0:
        mask = mask & (d < window_keys)

    qg = q.reshape(S, Hkv, rep, D)
    logits = jnp.einsum("sgrd,sgkd->sgrk", qg.astype(jnp.float32),
                        ring_k.astype(jnp.float32)) * scale  # [S,Hkv,rep,R]
    logits = jnp.where(mask[:, None, None, :], logits, NEG_INF)
    m = jnp.max(logits, axis=-1, keepdims=True)
    pexp = jnp.exp(logits - m)
    l = jnp.maximum(jnp.sum(pexp, axis=-1, keepdims=True), 1e-37)
    out = jnp.einsum("sgrk,sgkd->sgrd", pexp / l,
                     ring_v.astype(jnp.float32))
    out = out.reshape(S, Hq, D)
    lse = (m + jnp.log(l))[..., 0].reshape(S, Hq)
    return out, lse


def meta_decode(
    q: jax.Array,       # [S, Hq, D]
    meta_k: jax.Array,  # [M, Hkv, D]
    meta_v: jax.Array,
    scale: Optional[float] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Non-causal attention of decode queries vs the cached metatokens
    (pass 2 of `fa_kernel_metatoken.py:174-188`); returns (out fp32, lse)."""
    S, Hq, D = q.shape
    Hkv = meta_k.shape[1]
    if scale is None:
        scale = D ** -0.5
    rep = Hq // Hkv
    qg = q.reshape(S, Hkv, rep, D)
    logits = jnp.einsum("sgrd,mgd->sgrm", qg.astype(jnp.float32),
                        meta_k.astype(jnp.float32)) * scale
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    l = jnp.maximum(jnp.sum(p, axis=-1, keepdims=True), 1e-37)
    out = jnp.einsum("sgrm,mgd->sgrd", p / l,
                     meta_v.astype(jnp.float32)).reshape(S, Hq, D)
    lse = (m + jnp.log(l))[..., 0].reshape(S, Hq)
    return out, lse


def merge_two(out1, lse1, out2, lse2):
    """LSE merge (`fa_kernel_metatoken.py:110-122`) for [.., H, D] outs with
    lse [.., H]: log-sum-exp-consistent combination of two passes."""
    new_lse = lse1 - jax.nn.log_sigmoid(lse1 - lse2)
    w2 = jax.nn.sigmoid(lse2 - lse1)[..., None]
    return out1 - w2 * (out1 - out2), new_lse


# ---------------------------------------------------------------------------
# training-path flash attention (differentiable; splash fwd + bwd kernels)
# ---------------------------------------------------------------------------

class _MetaColumnMask(_splash_mask_lib.Mask):
    """Static mask allowing every query to attend keys j < num_meta — the
    metatoken block of a [meta ∥ tokens] sequence.  OR-composed with
    LocalMask this yields the full metatoken-attention semantics in ONE
    differentiable kernel (no LSE merge): real queries see window + all
    metas, meta queries see all metas non-causally and no real keys."""

    def __init__(self, shape, num_meta: int):
        self._shape = tuple(shape)
        self.num_meta = int(num_meta)

    @property
    def shape(self):
        return self._shape

    def __getitem__(self, idx):
        import numpy as onp
        q_slice, kv_slice = idx
        q_idx = onp.arange(*q_slice.indices(self._shape[0]))
        kv_idx = onp.arange(*kv_slice.indices(self._shape[1]))
        return onp.broadcast_to(kv_idx[None, :] < self.num_meta,
                                (len(q_idx), len(kv_idx))).copy()

    def __eq__(self, other):
        return (isinstance(other, _MetaColumnMask)
                and self._shape == other._shape
                and self.num_meta == other.num_meta)

    def __hash__(self):
        return hash((type(self), self._shape, self.num_meta))


@functools.lru_cache(maxsize=64)
def _make_splash_train(t_total: int, window_keys: int, num_meta: int,
                       rep: int, bq: int, bkv: int):
    """Differentiable splash kernel over a [meta ∥ tokens] (or plain)
    sequence: windowed-causal OR meta-column mask.  The library kernel
    carries flash dq/dkv backward passes (O(T·W) memory) — the TPU
    replacement for the reference's FA2 training backward
    (`hf_model/fa_kernel_metatoken.py:118-183`, SURVEY.md N7)."""
    shape = (t_total, t_total)
    win = None if window_keys == 0 else window_keys - 1
    mask = _splash_mask_lib.LocalMask(shape, window_size=(win, 0), offset=0)
    if num_meta > 0:
        mask = mask | _MetaColumnMask(shape, num_meta)
    mhm = _splash_mask_lib.MultiHeadMask([mask for _ in range(rep)])
    with jax.ensure_compile_time_eval():
        return _splash_kernel_lib.make_splash_mqa_single_device(
            mhm,
            block_sizes=_splash_kernel_lib.BlockSizes(
                block_q=bq, block_kv=bkv, block_kv_compute=bkv,
                block_q_dkv=bq, block_kv_dkv=bkv, block_kv_dkv_compute=bkv,
                block_q_dq=bq, block_kv_dq=bkv,
                use_fused_bwd_kernel=False))


def can_flash_train(t_total: int, head_dim: int) -> bool:
    """True when the differentiable splash path supports this shape."""
    return (jax.default_backend() in ("tpu", "axon")
            and head_dim == 128 and t_total >= 512)


def train_window_attention(q, k, v, window_keys: int, num_meta: int = 0,
                           scale: Optional[float] = None):
    """Differentiable windowed (+ optional metatoken-block) attention for
    the training/golden forward: q/k/v [B, T, H*, D] over the already-
    concatenated [meta ∥ tokens] sequence; returns out [B, T, Hq, D] fp32.

    Flash forward AND backward (splash library custom VJP) — activation
    memory O(T·W), replacing the O(T²) naive logits of the jnp reference
    path for long-context training (VERDICT r2 item 9)."""
    B, T, Hq, D = q.shape
    Hkv = k.shape[2]
    rep = Hq // Hkv
    if scale is None:
        scale = D ** -0.5
    bq = min(512, _round_up(T, 128))
    bkv = min(512, _round_up(T, 128))
    t_pad = _round_up(T, max(bq, bkv))
    kern = _make_splash_train(t_pad, window_keys, num_meta, rep, bq, bkv)

    qg = (jnp.swapaxes(q, 1, 2).reshape(B, Hkv, rep, T, D)
          * jnp.bfloat16(scale))
    qg = jnp.pad(qg, ((0, 0), (0, 0), (0, 0), (0, t_pad - T), (0, 0)))
    kh = jnp.pad(jnp.swapaxes(k, 1, 2),
                 ((0, 0), (0, 0), (0, t_pad - T), (0, 0)))
    vh = jnp.pad(jnp.swapaxes(v, 1, 2),
                 ((0, 0), (0, 0), (0, t_pad - T), (0, 0)))
    kseg = jnp.pad(jnp.ones((T,), jnp.int32), (0, t_pad - T))
    seg = _splash_kernel_lib.SegmentIds(q=jnp.ones((t_pad,), jnp.int32),
                                        kv=kseg)

    def per_batch(qb, kb, vb):
        return jax.vmap(kern, in_axes=(0, 0, 0, None))(qb, kb, vb, seg)

    out = jax.vmap(per_batch)(qg, kh, vh)      # [B, Hkv, rep, t_pad, D]
    out = jnp.swapaxes(out.reshape(B, Hq, t_pad, D), 1, 2)
    return out[:, :T].astype(jnp.float32)
