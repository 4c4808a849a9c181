"""Microbenchmark: SWA prefill attention kernels on the bench shape.

Compares the in-repo flash_window_prefill Pallas kernel against JAX's
splash-attention (LocalMask sliding window, GQA via vmap over kv-head
groups) — numerics checked against flash_window_prefill_ref.

Usage: python tools/swa_microbench.py
"""
import functools
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.pallas.ops.tpu.splash_attention import (
    splash_attention_kernel as sk, splash_attention_mask as sm)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from vllm_hymeta_tpu.ops import swa  # noqa: E402

Tq, CTX, W, Hq, Hkv, D = 4096, 4097, 4097, 28, 4, 128
REP = Hq // Hkv


def make_inputs(key):
    ks = jax.random.split(key, 3)
    q = jax.random.normal(ks[0], (Tq, Hq, D), jnp.bfloat16)
    k = jax.random.normal(ks[1], (CTX + Tq, Hkv, D), jnp.bfloat16)
    v = jax.random.normal(ks[2], (CTX + Tq, Hkv, D), jnp.bfloat16)
    pos0 = CTX + 7
    q_pos = pos0 + jnp.arange(Tq, dtype=jnp.int32)
    k_pos = jnp.concatenate([pos0 - CTX + jnp.arange(CTX, dtype=jnp.int32),
                             q_pos])
    return q, k, v, q_pos, k_pos


def timed(fn, *args, n=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3, out


def splash_make(block_q=512, block_kv=512):
    Tk = CTX + Tq
    tk_p = (Tk + block_kv - 1) // block_kv * block_kv
    mask = sm.MultiHeadMask(
        [sm.LocalMask((Tq, tk_p), window_size=(W - 1, 0), offset=CTX)
         for _ in range(REP)])
    kern = sk.make_splash_mqa_single_device(
        mask, block_sizes=sk.BlockSizes(
            block_q=block_q, block_kv=block_kv,
            block_kv_compute=block_kv),
        save_residuals=False)

    @jax.jit
    def fn(q, k, v):
        # q [Tq, Hq, D] -> [Hkv, REP, Tq, D]; k/v -> [Hkv, Tk_p, D]
        qg = jnp.swapaxes(q, 0, 1).reshape(Hkv, REP, Tq, D) * (D ** -0.5)
        kh = jnp.swapaxes(k, 0, 1)
        vh = jnp.swapaxes(v, 0, 1)
        kh = jnp.pad(kh, ((0, 0), (0, tk_p - Tk), (0, 0)))
        vh = jnp.pad(vh, ((0, 0), (0, tk_p - Tk), (0, 0)))
        out = jax.vmap(kern)(qg.astype(jnp.bfloat16), kh, vh)
        return jnp.swapaxes(out.reshape(Hq, Tq, D), 0, 1)
    return fn


def main():
    q, k, v, q_pos, k_pos = make_inputs(jax.random.PRNGKey(0))

    flash = jax.jit(functools.partial(
        swa.flash_window_prefill, window_keys=W, ctx_len=CTX))
    t_flash, (o1, _) = timed(lambda: flash(q, k, v, q_pos, k_pos))
    print(f"flash_window_prefill: {t_flash:8.2f} ms")

    ref_out, _ = swa.flash_window_prefill_ref(
        q[:64], k, v, q_pos[:64], k_pos, W)

    for bq, bkv in ((512, 512), (1024, 512), (512, 1024), (2048, 512),
                    (1024, 1024)):
        try:
            fn = splash_make(bq, bkv)
            t, o2 = timed(lambda: fn(q, k, v))
            err = float(jnp.max(jnp.abs(
                o2[:64].astype(jnp.float32) - ref_out.astype(jnp.float32))))
            err1 = float(jnp.max(jnp.abs(
                o2[:64].astype(jnp.float32) - o1[:64].astype(jnp.float32))))
            print(f"splash bq={bq} bkv={bkv}: {t:8.2f} ms   "
                  f"max|err vs ref|={err:.4f} vs flash={err1:.4f}")
        except Exception as e:
            print(f"splash bq={bq} bkv={bkv}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}")


if __name__ == "__main__":
    main()
