"""Active-slot GLA decode kernel (SURVEY.md N3): per-slot in-place state
update whose HBM traffic is proportional to the ACTIVE slot count.

The reference's hottest decode kernel updates each slot's [Dk, Dv] state
in place, gated on slot_idx (`vllm_hymeta/models/my_fused_recurrent.py:
59-80`, slot_idx == -1 rows skipped).  The XLA composition
(`ops/naive.py:gla_decode_step` + masked `jnp.where`) reads AND rewrites
every slot's state every step, active or not — at 70B-arch dims and
S = 16 that is ~0.5 GB/step of state traffic mostly for idle slots
(VERDICT r3 items "missing 4" / "weak 5").

Design: grid over the slot batch with the COMPACTED active slot ids
scalar-prefetched; the state array stays in HBM (memory_space ANY) and is
input-output ALIASED, so a slot's state is only touched when its grid
step issues the manual DMA:

  step j:  i = ids[j];  when i >= 0:
      DMA state[i] HBM->VMEM;  S' = e^g ⊙ S + kᵀv;  o[i] = (q·scale) @ S'
      DMA S' VMEM->HBM (state[i])

Inactive slots cost one no-op grid step (no DMA, no compute, no write),
so decode state traffic is 2 · n_active · Hkv·Dk·Dv bytes instead of
2 · S · Hkv·Dk·Dv.  Output rows for inactive slots are zeroed (the same
contract as the masked XLA path).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vllm_hymeta_tpu.ops import naive


def _kernel(ids_ref, q_ref, k_ref, v_ref, g_ref, state_ref,
            o_ref, ostate_ref, scratch, sem_in, sem_out, *,
            scale: float, rep: int):
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    i = ids_ref[j]

    @pl.when(i >= 0)
    def _():
        dma_in = pltpu.make_async_copy(state_ref.at[i], scratch, sem_in)
        dma_in.start()
        dma_in.wait()
        S_old = scratch[:].astype(jnp.float32)          # [Hkv, Dk, Dv]
        gi = g_ref[i].astype(jnp.float32)               # [Hkv, Dk]
        ki = k_ref[i].astype(jnp.float32)
        vi = v_ref[i].astype(jnp.float32)               # [Hkv, Dv]
        S = jnp.exp(gi)[..., None] * S_old + ki[..., None] * vi[..., None, :]
        scratch[:] = S.astype(scratch.dtype)
        qi = q_ref[i].astype(jnp.float32) * scale       # [Hq, Dk]
        Hkv, Dk = gi.shape
        qg = qi.reshape(Hkv, rep, Dk)
        o = jax.lax.dot_general(
            qg, S, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)         # [Hkv, rep, Dv]
        o_ref[i] = o.reshape(Hkv * rep, -1).astype(o_ref.dtype)
        dma_out = pltpu.make_async_copy(scratch, ostate_ref.at[i], sem_out)
        dma_out.start()
        dma_out.wait()


@functools.partial(jax.jit, static_argnames=("scale",), donate_argnums=(4,))
def _gla_decode_pallas(q, k, v, g, state, ids, scale: float):
    S_, Hq, Dk = q.shape
    Hkv = k.shape[1]
    Dv = v.shape[-1]
    rep = Hq // Hkv
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(S_,),
        in_specs=[
            pl.BlockSpec(q.shape, lambda j, ids: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(k.shape, lambda j, ids: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(v.shape, lambda j, ids: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(g.shape, lambda j, ids: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=[
            pl.BlockSpec((S_, Hq, Dv), lambda j, ids: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((Hkv, Dk, Dv), state.dtype),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    return pl.pallas_call(
        functools.partial(_kernel, scale=scale, rep=rep),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((S_, Hq, Dv), v.dtype),
            jax.ShapeDtypeStruct(state.shape, state.dtype),
        ],
        # input indices count the scalar-prefetch operand: ids=0, q=1 ...
        # state=5; aliased onto output 1 so untouched slots stay in place
        input_output_aliases={5: 1},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(ids, q, k, v, g, state)


def gla_decode_active(
    q: jax.Array,       # [S, Hq, Dk]
    k: jax.Array,       # [S, Hkv, Dk]
    v: jax.Array,       # [S, Hkv, Dv]
    g: jax.Array,       # [S, Hkv, Dk] log-space gates (fp32)
    state: jax.Array,   # [S, Hkv, Dk, Dv] stored state (donated on TPU)
    active: jax.Array,  # [S] bool
    scale: Optional[float] = None,
) -> Tuple[jax.Array, jax.Array]:
    """One decode token for the slot batch; returns (o [S, Hq, Dv] with
    zeros on inactive rows, updated state in the STORED dtype).  TPU:
    active-gated DMA kernel (traffic ∝ active); elsewhere: the XLA
    composition with masked writes."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    if (jax.default_backend() in ("tpu", "axon")
            and q.shape[-1] % 128 == 0 and v.shape[-1] % 128 == 0):
        S_ = q.shape[0]
        order = jnp.argsort(jnp.where(active, 0, 1),
                            stable=True).astype(jnp.int32)
        n = jnp.sum(active.astype(jnp.int32))
        ids = jnp.where(jnp.arange(S_, dtype=jnp.int32) < n, order, -1)
        return _gla_decode_pallas(q, k, v, g, state, ids, float(scale))
    S_old = state.astype(jnp.float32)
    o, S_new = naive.gla_decode_step(q, k, v, g, S_old, scale=scale)
    S_new = jnp.where(active[:, None, None, None], S_new, S_old)
    o = jnp.where(active[:, None, None], o, 0.0)
    return o, S_new.astype(state.dtype)
