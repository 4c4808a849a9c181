"""Calibrated GPTQ (quant/gptq.py): the Hessian-compensated quantizer
must beat round-to-nearest on the calibration metric, produce the exact
runtime layout, and round-trip through the gptqmodel-format packer and
quant/gptq_reader (producer ⇄ consumer)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vllm_hymeta_tpu.quant import gptq as gptq_lib
from vllm_hymeta_tpu.quant import transform
from vllm_hymeta_tpu.quant.gptq_reader import convert_gptq_linear

from tests.test_models import tiny_glaswa, tiny_hymeta


def _corr_acts(key, T, K):
    """Correlated calibration activations (a random low-pass mix) — the
    regime where GPTQ's error compensation matters; iid inputs make H
    nearly diagonal and GPTQ collapses to RTN."""
    k1, k2 = jax.random.split(key)
    base = jax.random.normal(k1, (T, K // 4))
    mix = jax.random.normal(k2, (K // 4, K)) / np.sqrt(K // 4)
    return base @ mix + 0.1 * jax.random.normal(key, (T, K))


def _rtn(w, bits, g):
    K, N = w.shape
    qmax = 2.0 ** bits - 1
    wf = w.astype(jnp.float32).reshape(K // g, g, N)
    wmin = jnp.minimum(jnp.min(wf, axis=1), 0.0)
    wmax = jnp.maximum(jnp.max(wf, axis=1), 0.0)
    scale = jnp.maximum(wmax - wmin, 1e-8) / qmax
    zero = jnp.round(-wmin / scale)
    q = jnp.clip(jnp.round(wf / scale[:, None, :]) + zero[:, None, :],
                 0, qmax)
    dq = (q - zero[:, None, :]) * scale[:, None, :]
    return dq.reshape(K, N)


@pytest.mark.parametrize("bits,g", [(4, 32), (8, 64)])
def test_gptq_beats_rtn_on_calibration_metric(bits, g):
    key = jax.random.PRNGKey(0)
    K, N, T = 128, 96, 2048
    w = jax.random.normal(key, (K, N)) * 0.05
    X = _corr_acts(jax.random.PRNGKey(1), T, K)
    H = X.T @ X

    Q, S, Z = gptq_lib.gptq_quantize_tensor(w, H, bits=bits, group_size=g)
    dq_gptq = ((Q - Z[:, None] if False else Q.reshape(K // g, g, N)
                - Z[:, None, :]) * S[:, None, :]).reshape(K, N)
    dq_rtn = _rtn(w, bits, g)

    # the metric GPTQ optimizes: output error over calibration inputs
    err_gptq = float(jnp.mean((X @ (w - dq_gptq)) ** 2))
    err_rtn = float(jnp.mean((X @ (w - dq_rtn)) ** 2))
    assert err_gptq < err_rtn * 0.9, (err_gptq, err_rtn)

    # quantized levels live on the uint grid
    assert float(jnp.min(Q)) >= 0 and float(jnp.max(Q)) <= 2 ** bits - 1
    assert np.allclose(np.asarray(Q), np.round(np.asarray(Q)))


def test_gptq_iid_close_to_rtn():
    """With iid activations H ≈ c·I and compensation ≈ no-op: GPTQ must
    not be (much) worse than RTN in plain weight MSE."""
    key = jax.random.PRNGKey(2)
    K, N, g = 64, 48, 16
    w = jax.random.normal(key, (K, N)) * 0.05
    X = jax.random.normal(jax.random.PRNGKey(3), (4096, K))
    Q, S, Z = gptq_lib.gptq_quantize_tensor(w, X.T @ X, bits=4,
                                            group_size=g)
    dq = ((Q.reshape(K // g, g, N) - Z[:, None, :]) * S[:, None, :]
          ).reshape(K, N)
    mse_gptq = float(jnp.mean((w - dq) ** 2))
    mse_rtn = float(jnp.mean((w - _rtn(w, 4, g)) ** 2))
    assert mse_gptq < mse_rtn * 1.3


@pytest.mark.parametrize("bits", [4, 8])
def test_pack_roundtrip_through_reader(bits):
    """producer (pack_gptq_checkpoint_linear) ⇄ consumer (gptq_reader)
    must be exact: same centered int weights, scales, zeros."""
    key = jax.random.PRNGKey(4)
    K, N, g = 64, 64, 16
    w = jax.random.normal(key, (K, N)) * 0.05
    X = _corr_acts(jax.random.PRNGKey(5), 512, K)
    Q, S, Z = gptq_lib.gptq_quantize_tensor(w, X.T @ X, bits=bits,
                                            group_size=g)
    node = gptq_lib._to_runtime(Q, S, Z, bits)
    packed = gptq_lib.pack_gptq_checkpoint_linear(node, bits)
    back = convert_gptq_linear(packed["qweight"], packed["qzeros"],
                               packed["scales"], packed["g_idx"],
                               bits, zero_offset=False)
    from vllm_hymeta_tpu.ops.quant_matmul import unpack_int4
    qc = np.asarray(unpack_int4(node["qw4"]) if bits == 4 else node["qw"])
    np.testing.assert_array_equal(back["qw"], qc)
    np.testing.assert_allclose(back["scales"], np.asarray(S),
                               rtol=1e-3)  # fp16 storage
    np.testing.assert_array_equal(back["zeros"],
                                  np.asarray(node["zeros"]))


@pytest.mark.parametrize("family", ["glaswa", "hymeta"])
def test_calibrated_model_beats_rtn(family):
    """End-to-end: calibrate a tiny model on a token stream; the
    calibrated tree must (a) carry the exact runtime layout, (b) yield
    logits closer to bf16 than the RTN tree on held-out tokens."""
    if family == "glaswa":
        cfg = tiny_glaswa()
        from vllm_hymeta_tpu.models import gla_swa as fam
        params = fam.init_params(cfg, jax.random.PRNGKey(0))
        fwd = lambda p, t: fam.forward_full(cfg, p, t)
    else:
        cfg = tiny_hymeta()
        from vllm_hymeta_tpu.models import hymeta as fam
        params = fam.init_params(cfg, jax.random.PRNGKey(0))
        fwd = lambda p, t: fam.forward_full(cfg, p, t)

    rng = np.random.RandomState(0)
    calib = jnp.asarray(rng.randint(0, cfg.vocab_size, (4, 64)))
    heldout = jnp.asarray(rng.randint(0, cfg.vocab_size, (2, 64)))

    qcal = gptq_lib.quantize_params_gptq_calibrated(
        cfg, params, calib, bits=4, group_size=16)
    qrtn = transform.quantize_params_gptq(params, bits=4, group_size=16)

    # layout identical to the RTN transform's
    def leaves(t):
        return {"/".join(map(str, p)): v.shape
                for p, v in gptq_lib._walk(t)}
    assert leaves(qcal).keys() == leaves(qrtn).keys()

    ref = fwd(params, heldout)
    lcal = fwd(qcal, heldout)
    lrtn = fwd(qrtn, heldout)
    e_cal = float(jnp.mean((lcal - ref) ** 2))
    e_rtn = float(jnp.mean((lrtn - ref) ** 2))
    assert e_cal < e_rtn, (e_cal, e_rtn)
