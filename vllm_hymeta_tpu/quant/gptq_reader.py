"""GPTQ checkpoint reader: gptqmodel/AutoGPTQ packed layout -> runtime
groupwise layout (ops/quant_matmul).

Checkpoint tensors per quantized Linear (gptqmodel, as produced by the
reference pipelines `hf_7B_model/quant_7B.py:13-36` with
QuantizeConfig(bits=8, group_size=64) and `hf_model/hymeta_gptq.py`):
  <name>.qweight : int32 [K*bits/32, N]   (values packed along K)
  <name>.qzeros  : int32 [K/g, N*bits/32] (zeros packed along N)
  <name>.scales  : fp16  [K/g, N]
  <name>.g_idx   : int32 [K]              (row -> group map)

Dequantization convention (AutoGPTQ lineage):
  w[k, n] = scales[g, n] * (unpack(qweight)[k, n] - (unpack(qzeros)[g, n] + 1))
with the +1 zero offset applied at pack time; gptqmodel >= 1.x writes
zeros WITHOUT the offset (`sym=True` checkpoints store the midpoint).  The
`zero_offset` flag selects; v2-format checkpoints (meta.quantizer
gptqmodel) default to no offset.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def unpack_rows(packed: np.ndarray, bits: int, rows: int) -> np.ndarray:
    """Unpack int32 [rows*bits/32, N] -> uint [rows, N] (packed along axis0)."""
    per = 32 // bits
    mask = (1 << bits) - 1
    out = np.empty((packed.shape[0] * per, packed.shape[1]), np.int32)
    p = packed.astype(np.uint32)
    for j in range(per):
        out[j::per] = ((p >> (bits * j)) & mask).astype(np.int32)
    return out[:rows]


def unpack_cols(packed: np.ndarray, bits: int, cols: int) -> np.ndarray:
    """Unpack int32 [G, cols*bits/32] -> uint [G, cols] (packed along axis1)."""
    per = 32 // bits
    mask = (1 << bits) - 1
    out = np.empty((packed.shape[0], packed.shape[1] * per), np.int32)
    p = packed.astype(np.uint32)
    for j in range(per):
        out[:, j::per] = ((p >> (bits * j)) & mask).astype(np.int32)
    return out[:, :cols]


def convert_gptq_linear(qweight: np.ndarray, qzeros: np.ndarray,
                        scales: np.ndarray, g_idx: Optional[np.ndarray],
                        bits: int, zero_offset: bool = False) -> dict:
    """Return the runtime layout {"qw" int8 [K,N], "scales" [K/g,N],
    "zeros" [K/g,N]} with zero-centered integer weights.

    desc_act (act-order) checkpoints carry a permuted g_idx: row k
    belongs to group g_idx[k], groups non-contiguous.  The runtime
    kernels want contiguous groups, so rows are PERMUTED into group
    order (stable sort of g_idx — gptqmodel's own kernels do the same)
    and the inverse is recorded as "act_perm": the Linear gathers its
    input activations by act_perm before the matmul, making
    x[act_perm] @ W[perm] == x @ W exactly.
    """
    per = 32 // bits
    K = qweight.shape[0] * per
    N = qweight.shape[1]
    G = scales.shape[0]
    perm = None
    if g_idx is not None:
        gi = np.asarray(g_idx)
        expected = np.arange(K) // (K // G)
        if not np.array_equal(gi, expected):
            counts = np.bincount(gi, minlength=G)
            if gi.min() < 0 or gi.max() >= G or counts.max() != K // G \
                    or counts.min() != K // G:
                raise NotImplementedError(
                    f"irregular g_idx (group sizes {counts.min()}.."
                    f"{counts.max()}, expect {K // G}) unsupported")
            perm = np.argsort(gi, kind="stable").astype(np.int32)
    q = unpack_rows(qweight, bits, K)                     # [K, N] unsigned
    z = unpack_cols(qzeros, bits, N)                      # [G, N]
    if zero_offset:
        z = z + 1
    mid = 1 << (bits - 1)
    if perm is not None:
        q = q[perm]
    out = {
        "qw": (q - mid).astype(np.int8),
        "scales": scales.astype(np.float32),
        "zeros": (z - mid).astype(np.float32),
    }
    if perm is not None:
        out["act_perm"] = perm
    return out


def dequant_reference(qweight, qzeros, scales, g_idx, bits,
                      zero_offset=False) -> np.ndarray:
    """Independent dense dequantization for tests."""
    per = 32 // bits
    K = qweight.shape[0] * per
    N = qweight.shape[1]
    q = unpack_rows(qweight, bits, K).astype(np.float32)
    z = unpack_cols(qzeros, bits, N).astype(np.float32)
    if zero_offset:
        z = z + 1
    G = scales.shape[0]
    gi = np.asarray(g_idx) if g_idx is not None else np.arange(K) // (K // G)
    return scales.astype(np.float32)[gi] * (q - z[gi])


def pack_gptq_linear_desc_act(w: np.ndarray, bits: int, group_size: int,
                              seed: int = 0, zero_offset: bool = False):
    """Pack a dense weight as a synthetic desc_act (act-order) GPTQ
    checkpoint: rows stay in original order but group membership is a
    permutation (g_idx non-contiguous), exactly the layout gptqmodel
    writes with desc_act=True.  Test/benchmark helper."""
    K, N = w.shape
    g = group_size
    G = K // g
    rng = np.random.RandomState(seed)
    g_idx = rng.permutation(np.repeat(np.arange(G), g)).astype(np.int32)
    qmax = (1 << bits) - 1
    wf = w.astype(np.float32)
    scales = np.empty((G, N), np.float32)
    zeros = np.empty((G, N), np.float32)
    q = np.empty((K, N), np.uint32)
    for grp in range(G):
        rows = np.where(g_idx == grp)[0]
        wg = wf[rows]
        wmin, wmax = wg.min(0), wg.max(0)
        scales[grp] = np.maximum(wmax - wmin, 1e-8) / qmax
        zeros[grp] = np.clip(np.round(-wmin / scales[grp]), 0, qmax)
        q[rows] = np.clip(np.round(wg / scales[grp]) + zeros[grp],
                          0, qmax).astype(np.uint32)
    per = 32 // bits
    qweight = np.zeros((K // per, N), np.uint32)
    for j in range(per):
        qweight |= q[j::per] << (bits * j)
    zz = zeros.astype(np.uint32)
    if zero_offset:
        zz = zz - 1
    qzeros = np.zeros((G, N // per), np.uint32)
    for j in range(per):
        qzeros |= zz[:, j::per] << (bits * j)
    return (qweight.astype(np.int32), qzeros.astype(np.int32),
            scales.astype(np.float16), g_idx)


def pack_gptq_linear(w: np.ndarray, bits: int, group_size: int,
                     zero_offset: bool = False):
    """Pack a dense fp weight into the GPTQ checkpoint layout (RTN scales)
    — used to build synthetic checkpoints for tests and benchmarks."""
    K, N = w.shape
    g = group_size
    G = K // g
    qmax = (1 << bits) - 1
    wf = w.reshape(G, g, N).astype(np.float32)
    wmin, wmax = wf.min(1), wf.max(1)
    scales = np.maximum(wmax - wmin, 1e-8) / qmax
    zeros = np.clip(np.round(-wmin / scales), 0, qmax)
    q = np.clip(np.round(wf / scales[:, None]) + zeros[:, None], 0, qmax)
    q = q.reshape(K, N).astype(np.uint32)

    per = 32 // bits
    qweight = np.zeros((K // per, N), np.uint32)
    for j in range(per):
        qweight |= q[j::per] << (bits * j)
    zz = zeros.astype(np.uint32)
    if zero_offset:
        zz = zz - 1
    qzeros = np.zeros((G, N // per), np.uint32)
    for j in range(per):
        qzeros |= zz[:, j::per] << (bits * j)
    g_idx = (np.arange(K) // g).astype(np.int32)
    return (qweight.astype(np.int32), qzeros.astype(np.int32),
            scales.astype(np.float16), g_idx)
