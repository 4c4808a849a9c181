"""Static-shape slot caches — the TPU replacement for vLLM's paged KV
allocator + the reference's ConstantSizeCache slot caches (SURVEY.md §7).

Design (from the survey's key insight): every per-request state is constant
shape, so a fixed pool of `max_num_seqs` slots holds
  * sliding-window KV as a per-slot ring buffer [S, Hkv, R, D]
    (position p lives at ring index p mod R; R >= window_keys) — replaces
    block tables + paging (`attention/meta_attention.py:411-608`) entirely,
  * the GLA matrix state [S, H, Dk, Dv]
    (replaces `models/hymeta_cache.py` / `model_for_7B/gla_cache.py`),
with request→slot assignment handled host-side by the scheduler
(clear-on-new-prefill semantics per `modeling_hymeta.py:1202-1227`).

The 70B metatoken caches (`meta_linear_cache`, `meta_fattn_cache`,
`hymeta_cache.py:26-40`) are input-independent and precomputed at load time
(models/hymeta.py:precompute_meta) — they live with the params, not here.

All arrays are preallocated device buffers, donated through the jitted step
functions so updates are in-place.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


@dataclasses.dataclass
class CacheConfig:
    max_num_seqs: int = 8
    max_model_len: int = 32768
    kv_dtype: str = "bfloat16"      # "bfloat16" | "int8" (int8: scale per entry)
    state_dtype: str = "float32"    # GLA state precision


def ring_len(window_keys: int, max_model_len: int) -> int:
    """Ring capacity for a layer: window (rounded for tiling) or the full
    context for global-attention layers (window_keys == 0).

    Windowed rings round up to 512 so the prefill context length is a
    multiple of the splash kernel's kv block — a block-aligned LocalMask
    offset measures ~10% faster than a fractional one (4224 -> 4608 on
    the 7B: 2.50 -> 2.26 ms per 28-head 4k-chunk call on v5e)."""
    if window_keys == 0:
        return _round_up(max_model_len, 128)
    # short-context serving: a ring can never hold more than the model
    # length, so don't pay window-sized rings (64 sonnet slots at the 7B's
    # 4k window would be 4 GB of ring for 764-token requests)
    return _round_up(min(window_keys, max_model_len), 512)


def init_layer_kv(cc: CacheConfig, n_kv_heads: int, head_dim: int,
                  window_keys: int) -> dict:
    R = ring_len(window_keys, cc.max_model_len)
    S = cc.max_num_seqs
    shape = (S, n_kv_heads, R, head_dim)
    if cc.kv_dtype == "int8":
        return {
            "k": jnp.zeros(shape, jnp.int8),
            "v": jnp.zeros(shape, jnp.int8),
            "k_scale": jnp.zeros((S, n_kv_heads, R), jnp.float32),
            "v_scale": jnp.zeros((S, n_kv_heads, R), jnp.float32),
        }
    return {
        "k": jnp.zeros(shape, jnp.bfloat16),
        "v": jnp.zeros(shape, jnp.bfloat16),
    }


def init_layer_state(cc: CacheConfig, n_heads: int, head_dim: int) -> dict:
    dt = jnp.float32 if cc.state_dtype == "float32" else jnp.bfloat16
    return {"state": jnp.zeros((cc.max_num_seqs, n_heads, head_dim, head_dim), dt)}


def kv_entry(layer_cache: dict, dequant: bool = True):
    """Read (k, v) from a layer cache, dequantizing int8 entries."""
    k, v = layer_cache["k"], layer_cache["v"]
    if k.dtype == jnp.int8 and dequant:
        k = k.astype(jnp.bfloat16) * layer_cache["k_scale"][..., None].astype(jnp.bfloat16)
        v = v.astype(jnp.bfloat16) * layer_cache["v_scale"][..., None].astype(jnp.bfloat16)
    return k, v


def quantize_kv(x: jax.Array):
    """Per-(head, position) symmetric INT8 quantization of KV entries —
    the TPU stand-in for the fp8 KV path (`meta_attention.py:760-812`,
    SURVEY.md N14). x: [..., D] bf16 -> (int8, scale[...])."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    scale = jnp.maximum(amax, 1e-6) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale[..., None]),
                 -127, 127).astype(jnp.int8)
    return q, scale


def write_prefill_kv(layer_cache: dict, slot: jax.Array,
                     k: jax.Array, v: jax.Array,
                     positions: jax.Array, valid: jax.Array,
                     enable=True) -> dict:
    """Scatter a prefill chunk's keys into the ring of one slot.

    k/v: [T, Hkv, D]; positions [T]; valid [T] bool.  Ring layout
    [S, Hkv, R, D], index = position mod R.  When T > R only the last R
    valid positions are written (earlier ones fall out of every window).
    `enable=False` (a traced bool) turns all writes into no-ops — used by
    non-owner data-parallel ranks.
    """
    S, Hkv, R, D = layer_cache["k"].shape
    T = k.shape[0]
    if enable is True and layer_cache["k"].dtype != jnp.int8:
        # zero-copy fast path: chunk positions are contiguous
        # (pos0 + arange, every caller's contract), so the aliased Pallas
        # block writer replaces the 58 GB/s mod-scatter (r5 trace)
        from vllm_hymeta_tpu.ops import ring_attention as _ra
        if _ra.ring_write_supported(layer_cache["k"], k):
            nv = jnp.sum(valid.astype(jnp.int32))
            ck, cv = _ra.ring_write(
                layer_cache["k"], layer_cache["v"], k, v, slot,
                positions[0], nv)
            return {**layer_cache, "k": ck, "v": cv}
    idx = jnp.mod(positions, R)
    if T > R:
        # Drop tokens that a later token in this same chunk would overwrite.
        # The chunk may be padded (valid=False tail with garbage positions),
        # so anchor on the last *valid* position, not positions[-1]
        # (using the padded tail dropped every write for partially-filled
        # buckets — corrupting any prompt whose final chunk had
        # R < n_valid < T valid tokens).
        last_valid_pos = jnp.max(jnp.where(valid, positions, -1))
        keep = valid & (positions >= last_valid_pos - (R - 1))
    else:
        keep = valid
    keep = keep & enable
    # route dropped writes to a scratch row (index R) then slice off
    idx = jnp.where(keep, idx, R)

    out = dict(layer_cache)
    kq, vq = k, v
    if layer_cache["k"].dtype == jnp.int8:
        kq, ks = quantize_kv(k)
        vq, vs = quantize_kv(v)
        ks_r = layer_cache["k_scale"][slot]  # [Hkv, R]
        vs_r = layer_cache["v_scale"][slot]
        ks_r = jnp.pad(ks_r, ((0, 0), (0, 1)))
        vs_r = jnp.pad(vs_r, ((0, 0), (0, 1)))
        ks_r = ks_r.at[:, idx].set(jnp.swapaxes(ks, 0, 1))[:, :R]
        vs_r = vs_r.at[:, idx].set(jnp.swapaxes(vs, 0, 1))[:, :R]
        out["k_scale"] = layer_cache["k_scale"].at[slot].set(ks_r)
        out["v_scale"] = layer_cache["v_scale"].at[slot].set(vs_r)
        kq = kq.astype(jnp.int8)
        vq = vq.astype(jnp.int8)

    for name, val in (("k", kq), ("v", vq)):
        ring = layer_cache[name][slot]                    # [Hkv, R, D]
        ring = jnp.pad(ring, ((0, 0), (0, 1), (0, 0)))    # scratch row at R
        ring = ring.at[:, idx, :].set(
            jnp.swapaxes(val, 0, 1).astype(ring.dtype))[:, :R]
        out[name] = layer_cache[name].at[slot].set(ring)
    return out


def write_decode_kv(layer_cache: dict, k: jax.Array, v: jax.Array,
                    positions: jax.Array, active: jax.Array) -> dict:
    """Write one token per slot at positions%R; inactive slots unchanged.

    k/v: [S, Hkv, D]; positions/active: [S].
    """
    S, Hkv, R, D = layer_cache["k"].shape
    idx = jnp.mod(positions, R)                            # [S]
    s_ar = jnp.arange(S)
    out = dict(layer_cache)
    kq, vq = k, v
    if layer_cache["k"].dtype == jnp.int8:
        kq, ks = quantize_kv(k)
        vq, vs = quantize_kv(v)
        for nm, sc in (("k_scale", ks), ("v_scale", vs)):
            old = layer_cache[nm][s_ar, :, idx]            # [S, Hkv]
            new = jnp.where(active[:, None], sc, old)
            out[nm] = layer_cache[nm].at[s_ar, :, idx].set(new)
    for name, val in (("k", kq), ("v", vq)):
        old = layer_cache[name][s_ar, :, idx]              # [S, Hkv, D]
        new = jnp.where(active[:, None, None],
                        val.astype(old.dtype), old)
        out[name] = layer_cache[name].at[s_ar, :, idx].set(new)
    return out


def clear_slot(cache: dict, slot: int) -> dict:
    """Zero a slot's state across layers (new-request semantics,
    `modeling_hymeta.py:1202-1227`). Host-side (between steps)."""
    layers = []
    for lc in cache["layers"]:
        lc = dict(lc)
        for key in lc:
            lc[key] = lc[key].at[slot].set(jnp.zeros_like(lc[key][slot]))
        layers.append(lc)
    return {**cache, "layers": layers}
