"""Zero-copy ring-buffer attention kernels for chunked prefill.

Round-5 trace findings on the 7B 32k bench (chunk 4096, ring R=4608):
  * the generic mod-index ring WRITE (`cache.write_prefill_kv`'s
    `.at[:, idx, :].set`) lowers to a 58 GB/s scatter fusion —
    ~6 ms/chunk across 14 windowed layers x {k, v};
  * the ring READ for attention (`gather_ring_context` mod-gather +
    concat + pad + transpose feeding splash) adds ~5 ms/chunk;
  * the splash kernel itself runs at ~61% of its MXU bound, much of it
    segment-id mask work and mask-info machinery.

Both kernels exploit the ring invariant (position p at ring index
p mod R, R a multiple of the 512 block): a contiguous position range
maps to at most two contiguous ring runs, and because the live chunk
span T satisfies T <= R - 512, every ALIGNED ring block holds at most
ONE live segment.  So block-index arithmetic over scalar-prefetched
(slot, pos0) replaces gathers entirely — the kernels index the FULL
slot cache [S, Hkv, R, D] in place — and per-element masks are pure
iota arithmetic: no k_pos arrays, no segment ids, no concat/pad/slice
traffic.

  * `ring_write`: the chunk's k/v DMA'd straight into the slot's ring
    blocks (input_output_aliases, one block DMA each).
  * `ring_window_prefill`: flash attention of chunk queries against
    [ring context ∥ chunk] read IN PLACE.  Per q block i the kv step
    sequence is {nctx-i in-window ring blocks} ++ {chunk blocks 0..i}
    — a CONSTANT step count (the sliding-window property), with full
    interior tiles skipping mask evaluation.

Same mask semantics as flash_window_prefill mask_mode="window"
(`attention/fa_kernel_metatoken.py:377-410`); the gather+splash path
remains as fallback and test oracle (tests/test_tpu_kernels.py).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
BLK = 512


def _on_tpu() -> bool:
    return jax.default_backend() in ("tpu", "axon")


# ---------------------------------------------------------------------------
# ring write
# ---------------------------------------------------------------------------

def _ring_write_kernel(s_ref, kc0_ref, kc1_ref, vc0_ref, vc1_ref,
                       rk_in, rv_in, ok_ref, ov_ref, *, R: int,
                       T_pad: int):
    """One (head, block) step: ring block b = (pos0//BLK + i) mod nR of
    slot s gets the chunk rows whose positions land in it; other rows
    keep their old values (aliased output).  The live chunk segment
    within an aligned block is contiguous: row j holds chunk offset
    effA + j with effA = A - R if A > R - BLK else A, where
    A = (b*BLK - pos0) mod R; offsets outside [0, n_valid) are dead.

    Dynamic sublane loads don't lower, so the two ALIGNED chunk blocks
    covering [start, start+BLK) arrive via block-index arithmetic and a
    dynamic `pltpu.roll` aligns them in-register."""
    i = pl.program_id(1)
    pos0 = s_ref[1]
    n_valid = s_ref[2]
    blk0 = (pos0 // BLK + i) % (R // BLK)
    A = jnp.mod(blk0 * BLK - pos0, R)
    effA = jnp.where(A > R - BLK, A - R, A)
    j = jax.lax.broadcasted_iota(jnp.int32, (BLK, 1), 0)
    off = effA + j
    live = (off >= 0) & (off < n_valid)
    # chunk padded with BLK leading zeros: padded row = off + BLK
    start = jnp.clip(effA + BLK, 0, T_pad - BLK)
    shift = jnp.mod(start, BLK)
    kcat = jnp.concatenate([kc0_ref[0], kc1_ref[0]], axis=0)  # [2BLK, D]
    vcat = jnp.concatenate([vc0_ref[0], vc1_ref[0]], axis=0)
    # Mosaic's dynamic rotate is 32-bit only: widen around the roll
    ks = pltpu.roll(kcat.astype(jnp.float32), -shift, 0)[:BLK]
    vs = pltpu.roll(vcat.astype(jnp.float32), -shift, 0)[:BLK]
    ks = ks.astype(kcat.dtype)
    vs = vs.astype(vcat.dtype)
    # old data must come from the aliased INPUT blocks (reading an
    # output ref before its first write is undefined)
    ok_ref[0, 0] = jnp.where(live, ks, rk_in[0, 0])
    ov_ref[0, 0] = jnp.where(live, vs, rv_in[0, 0])


@jax.jit
def _ring_write_call(cache_k, cache_v, k, v, slot, pos0, n_valid):
    S, Hkv, R, D = cache_k.shape
    T = k.shape[0]
    T_pad = T + 2 * BLK
    kh = jnp.pad(jnp.swapaxes(k, 0, 1), ((0, 0), (BLK, BLK), (0, 0)))
    vh = jnp.pad(jnp.swapaxes(v, 0, 1), ((0, 0), (BLK, BLK), (0, 0)))
    nblk = T // BLK + 1
    nR = R // BLK
    nC = T_pad // BLK
    scalars = jnp.stack([jnp.asarray(slot, jnp.int32),
                         jnp.asarray(pos0, jnp.int32),
                         jnp.asarray(n_valid, jnp.int32)])

    def ring_idx(h, i, s):
        return (s[0], h, (s[1] // BLK + i) % nR, 0)

    def _start_blk(i, s):
        A = jnp.mod(((s[1] // BLK + i) % nR) * BLK - s[1], R)
        effA = jnp.where(A > R - BLK, A - R, A)
        start = jnp.clip(effA + BLK, 0, T_pad - BLK)
        return jnp.clip(start // BLK, 0, nC - 2)

    def chunk_idx0(h, i, s):
        return (h, _start_blk(i, s), 0)

    def chunk_idx1(h, i, s):
        return (h, _start_blk(i, s) + 1, 0)

    out_k, out_v = pl.pallas_call(
        functools.partial(_ring_write_kernel, R=R, T_pad=T_pad),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(Hkv, nblk),
            in_specs=[
                pl.BlockSpec((1, BLK, D), chunk_idx0),
                pl.BlockSpec((1, BLK, D), chunk_idx1),
                pl.BlockSpec((1, BLK, D), chunk_idx0),
                pl.BlockSpec((1, BLK, D), chunk_idx1),
                pl.BlockSpec((1, 1, BLK, D), ring_idx),
                pl.BlockSpec((1, 1, BLK, D), ring_idx),
            ],
            out_specs=[
                pl.BlockSpec((1, 1, BLK, D), ring_idx),
                pl.BlockSpec((1, 1, BLK, D), ring_idx),
            ],
        ),
        out_shape=[jax.ShapeDtypeStruct(cache_k.shape, cache_k.dtype),
                   jax.ShapeDtypeStruct(cache_v.shape, cache_v.dtype)],
        input_output_aliases={5: 0, 6: 1},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(scalars, kh, kh, vh, vh, cache_k, cache_v)
    return out_k, out_v


def ring_write_supported(cache_k, k) -> bool:
    S, Hkv, R, D = cache_k.shape
    T = k.shape[0]
    return (_on_tpu() and R % BLK == 0 and T % BLK == 0
            and R >= T + BLK and D % 128 == 0
            and cache_k.dtype == k.dtype)


def ring_write(cache_k, cache_v, k, v, slot, pos0, n_valid):
    """Write chunk k/v [T, Hkv, D] at positions pos0..pos0+T-1 (rows
    >= n_valid skipped) into slot `slot` of the ring caches
    [S, Hkv, R, D], in place (aliased)."""
    return _ring_write_call(cache_k, cache_v, k, v, slot, pos0, n_valid)


# ---------------------------------------------------------------------------
# ring-window flash attention
# ---------------------------------------------------------------------------

def _rw_flash_kernel(s_ref, q_ref, rk_ref, rv_ref, ck_ref, cv_ref,
                     o_ref, lse_ref, m_ref, l_ref, acc_ref, *,
                     R: int, W: int, bq: int, rq: int, nkb: int,
                     nR: int, rep: int, need_lse: bool):
    i = pl.program_id(1)
    j = pl.program_id(2)
    pos0 = s_ref[1]
    n_valid = s_ref[2]

    @pl.when(j == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    D = q_ref.shape[3]
    q = q_ref[0]                              # [rep, bq, D]
    qpos0 = pos0 + i * bq
    nctx = jnp.minimum(nkb - rq * (i + 1), nR)
    is_ctx = j < nctx

    # key positions for this step, from pure arithmetic.  Vector mods
    # would be VPU-emulated divisions (~2 ms/call, r5 microbench) — one
    # SCALAR mod anchors the block, the per-element remainder is a
    # subtract plus one wrap adjust (g spans BLK <= R: single wrap).
    end_blk = (pos0 - 1) // BLK
    rblk = jnp.mod(end_blk - (nctx - 1) + j, nR)
    g0 = rblk * BLK
    a0 = jnp.mod(pos0 - 1 - g0, R)            # scalar
    ge = jax.lax.broadcasted_iota(jnp.int32, (1, BLK), 1)
    m_e = a0 - ge
    m_e = jnp.where(m_e < 0, m_e + R, m_e)
    kpos_ring = pos0 - 1 - m_e
    # chunk kpos uses the UNCLAMPED step offset: slack steps yield
    # future positions -> fully masked (the index map clamps the fetch)
    kpos_chunk = (pos0 + (j - nctx) * BLK
                  + jax.lax.broadcasted_iota(jnp.int32, (1, BLK), 1))
    kpos = jnp.where(is_ctx, kpos_ring, kpos_chunk)
    k = jnp.where(is_ctx, rk_ref[0, 0], ck_ref[0])
    v = jnp.where(is_ctx, rv_ref[0, 0], cv_ref[0])

    qp = qpos0 + jax.lax.broadcasted_iota(jnp.int32, (bq, 1), 0)
    d = qp - kpos                             # [bq, BLK]
    # validity: a real position (>= 0) below the chunk's valid end
    valid_key = (kpos >= 0) & (kpos < pos0 + n_valid)
    mask = (d >= 0) & (d < W) & valid_key

    # all math in [rep, bq, *] — reshapes to [rep*bq, *] would retile
    # sublanes physically on every step (r5 microbench: ~1.5 ms/call)
    s = jax.lax.dot_general(
        q, k, (((2,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)   # [rep, bq, BLK]
    s = jnp.where(mask[None], s, NEG_INF)

    m_prev = m_ref[:]                          # [rep, bq]
    m_cur = jnp.max(s, axis=2)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new[..., None])
    l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=2)
    acc_ref[:] = acc_ref[:] * alpha[..., None] + jax.lax.dot_general(
        p.astype(v.dtype), v, (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)    # [rep, bq, D]
    m_ref[:] = m_new

    @pl.when(j == nkb - 1)
    def _():
        l = jnp.maximum(l_ref[:], 1e-37)
        o_ref[0] = (acc_ref[:] / l[..., None]).astype(o_ref.dtype)
        if need_lse:
            lse_ref[0] = jnp.swapaxes(
                (m_ref[:] + jnp.log(l))[:, None, :], 1, 1)


@functools.partial(jax.jit, static_argnames=("W", "need_lse"))
def _rw_flash_call(q, cache_k, cache_v, ck, cv, slot, pos0, n_valid, W,
                   need_lse):
    """q [Hkv, rep, Tq, D] pre-scaled; cache [S, Hkv, R, D]; chunk k/v
    [Hkv, Tq, D].  Returns (out [Hkv, rep, Tq, D],
    lse [Hkv, rep, 1, Tq])."""
    Hkv, rep, Tq, D = q.shape
    R = cache_k.shape[2]
    nR = R // BLK
    import os as _os
    bq = int(_os.environ.get('RING_BQ', 2 * BLK)) \
        if Tq % (2 * BLK) == 0 else BLK
    rq = bq // BLK
    nq = Tq // bq
    # per q block i: nctx_i = min(nkb - rq(i+1), nR) ring steps (the
    # in-window context blocks, valid for ANY pos0 alignment: a span of
    # W - i*bq positions straddles at most that many distinct aligned
    # blocks, and nR distinct blocks always suffice — a revisited ring
    # block would double-count its keys) then rq*(i+1) chunk steps plus
    # slack; slack chunk steps carry future positions and mask dead.
    nkb = W // BLK + 2 + rq
    nkb_chunk = Tq // BLK
    scalars = jnp.stack([jnp.asarray(slot, jnp.int32),
                         jnp.asarray(pos0, jnp.int32),
                         jnp.asarray(n_valid, jnp.int32)])

    def ring_idx(h, i, j, s):
        nctx = jnp.minimum(nkb - rq * (i + 1), nR)
        end_blk = (s[1] - 1) // BLK
        jj = jnp.minimum(j, nctx - 1)        # freeze during chunk steps
        return (s[0], h, jnp.mod(end_blk - (nctx - 1) + jj, nR), 0)

    def chunk_idx(h, i, j, s):
        nctx = jnp.minimum(nkb - rq * (i + 1), nR)
        jj = jnp.clip(j - nctx, 0, nkb_chunk - 1)
        return (h, jj, 0)

    kernel = functools.partial(
        _rw_flash_kernel, R=R, W=W, bq=bq, rq=rq, nkb=nkb, nR=nR,
        rep=rep, need_lse=need_lse)
    out, lse = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(Hkv, nq, nkb),
            in_specs=[
                pl.BlockSpec((1, rep, bq, D),
                             lambda h, i, j, s: (h, 0, i, 0)),
                pl.BlockSpec((1, 1, BLK, D), ring_idx),
                pl.BlockSpec((1, 1, BLK, D), ring_idx),
                pl.BlockSpec((1, BLK, D), chunk_idx),
                pl.BlockSpec((1, BLK, D), chunk_idx),
            ],
            out_specs=[
                pl.BlockSpec((1, rep, bq, D),
                             lambda h, i, j, s: (h, 0, i, 0)),
                pl.BlockSpec((1, rep, 1, bq),
                             lambda h, i, j, s: (h, 0, 0, i)),
            ],
            scratch_shapes=[
                pltpu.VMEM((rep, bq), jnp.float32),
                pltpu.VMEM((rep, bq), jnp.float32),
                pltpu.VMEM((rep, bq, D), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((Hkv, rep, Tq, D), q.dtype),
            jax.ShapeDtypeStruct((Hkv, rep, 1, Tq), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=4 * Hkv * rep * Tq * nkb * BLK * D,
            bytes_accessed=Hkv * (rep * Tq * D * 4
                                  + nq * nkb * BLK * D * 2 * 2),
            transcendentals=2 * Hkv * rep * Tq * nkb * BLK),
    )(scalars, q, cache_k, cache_v, ck, cv)
    return out, lse


def ring_window_supported(q_tHD, cache_k, window_keys: int) -> bool:
    """Eligibility: block-aligned bf16 shapes, windowed layer, window
    covering the whole chunk minus one block (the constant-step schedule
    assumes every earlier chunk block is in-window).

    DEFAULT OFF (RING_ATTN=1 opts in): on v5e the kernel measures
    3.1 ms vs gather+splash's 2.45 ms on the 7B bench shape — its
    serial QK->mask/exp->PV chain does not overlap VPU and MXU as well
    as the library splash kernel, outweighing the gather it saves.
    Kept for the zero-copy design + oracle tests; the ring WRITE kernel
    (strictly better than the scatter) stays on."""
    import os
    if os.environ.get("RING_ATTN") != "1":
        return False
    T, H, D = q_tHD.shape
    S, Hkv, R, D2 = cache_k.shape
    bq = 2 * BLK if T % (2 * BLK) == 0 else BLK
    rq = bq // BLK
    nq = T // bq
    nkb = window_keys // BLK + 2 + rq
    return (_on_tpu() and window_keys > 0 and D == 128 and D2 == 128
            and T % BLK == 0 and R % BLK == 0 and R >= window_keys
            and R >= T + BLK
            and window_keys + BLK > T
            and nkb - rq * nq >= 1          # every q block keeps >=1 ctx step
            and cache_k.dtype == jnp.bfloat16 and H % Hkv == 0)


def ring_window_prefill(q, cache_k, cache_v, ck, cv, slot, pos0, n_valid,
                        window_keys: int,
                        scale: Optional[float] = None,
                        need_lse: bool = False,
                        ) -> Tuple[jax.Array, Optional[jax.Array]]:
    """Flash window attention of chunk queries q [T, Hq, D] against slot
    `slot`'s ring context (read in place from [S, Hkv, R, D], PRE-chunk-
    write state) plus the chunk's own keys ck/cv [T, Hkv, D].

    Equivalent to gather_ring_context + flash_window_prefill
    (mask_mode="window"); returns (out [T, Hq, D], lse [Hq, T] | None)."""
    T, Hq, D = q.shape
    Hkv = cache_k.shape[1]
    rep = Hq // Hkv
    if scale is None:
        scale = D ** -0.5
    qg = (jnp.swapaxes(q, 0, 1).reshape(Hkv, rep, T, D)
          * jnp.asarray(scale, q.dtype))
    ckh = jnp.swapaxes(ck, 0, 1)
    cvh = jnp.swapaxes(cv, 0, 1)
    out, lse = _rw_flash_call(qg, cache_k, cache_v, ckh, cvh, slot, pos0,
                              n_valid, int(window_keys), bool(need_lse))
    out = jnp.swapaxes(out.reshape(Hq, T, D), 0, 1)
    if not need_lse:
        return out, None
    return out, lse.reshape(Hq, T)
