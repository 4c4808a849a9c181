"""Training-capability tests: gradients flow through both golden forwards
(incl. metatoken attention + chunked GLA) and loss decreases under SGD."""

import jax
import jax.numpy as jnp
import numpy as np

from vllm_hymeta_tpu.train import causal_lm_loss, loss_and_grad, sgd_step
from vllm_hymeta_tpu.models import gla_swa, hymeta
from tests.test_models import tiny_glaswa, tiny_hymeta


class TestTraining:
    def test_grads_finite_glaswa(self):
        cfg = tiny_glaswa(num_hidden_layers=2)
        params = gla_swa.init_params(cfg, jax.random.PRNGKey(0),
                                     dtype=jnp.float32)
        toks = jax.random.randint(jax.random.PRNGKey(1), (2, 16), 0, 256)
        loss, grads = loss_and_grad(cfg, params, toks)
        assert np.isfinite(float(loss))
        leaves = jax.tree.leaves(grads)
        assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
        # at least one nonzero grad per layer
        g0 = grads["layers"][0]["attn"]["q_proj"]["w"]
        assert float(jnp.abs(g0).max()) > 0

    def test_grads_finite_hymeta(self):
        cfg = tiny_hymeta(num_hidden_layers=2, full_attn_layers=[1],
                          dense_mlp_layers=[0])
        params = hymeta.init_params(cfg, jax.random.PRNGKey(0),
                                    dtype=jnp.float32)
        toks = jax.random.randint(jax.random.PRNGKey(1), (1, 12), 0, 256)
        loss, grads = loss_and_grad(cfg, params, toks)
        assert np.isfinite(float(loss))
        # metatokens and lower bounds are trainable
        assert float(jnp.abs(grads["meta_tokens"]).max()) > 0
        assert float(jnp.abs(grads["lower_bounds"]).max()) > 0

    def test_loss_decreases(self):
        cfg = tiny_glaswa(num_hidden_layers=2)
        params = gla_swa.init_params(cfg, jax.random.PRNGKey(2),
                                     dtype=jnp.float32)
        toks = jax.random.randint(jax.random.PRNGKey(3), (2, 16), 0, 256)
        step = jax.jit(lambda p: loss_and_grad(cfg, p, toks))
        l0, g = step(params)
        for _ in range(5):
            params = sgd_step(params, g, lr=0.5)
            l1, g = step(params)
        assert float(l1) < float(l0)

    def test_loss_mask(self):
        cfg = tiny_glaswa(num_hidden_layers=2)
        params = gla_swa.init_params(cfg, jax.random.PRNGKey(4),
                                     dtype=jnp.float32)
        toks = jax.random.randint(jax.random.PRNGKey(5), (1, 10), 0, 256)
        full = causal_lm_loss(cfg, params, toks)
        mask = jnp.ones((1, 10)).at[:, :5].set(0.0)
        partial = causal_lm_loss(cfg, params, toks, loss_mask=mask)
        assert not np.isclose(float(full), float(partial))

    def test_remat_grads_match(self):
        """Per-layer checkpointing must not change loss or gradients."""
        cfg = tiny_glaswa(num_hidden_layers=2)
        params = gla_swa.init_params(cfg, jax.random.PRNGKey(6),
                                     dtype=jnp.float32)
        toks = jax.random.randint(jax.random.PRNGKey(7), (2, 12), 0, 256)
        l0, g0 = loss_and_grad(cfg, params, toks, remat=False)
        l1, g1 = loss_and_grad(cfg, params, toks, remat=True)
        assert np.isclose(float(l0), float(l1), rtol=1e-6)
        for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-5, atol=2e-6)

    def test_optax_train_step(self):
        from vllm_hymeta_tpu.train import make_train_step
        cfg = tiny_glaswa(num_hidden_layers=2)
        params = gla_swa.init_params(cfg, jax.random.PRNGKey(8),
                                     dtype=jnp.float32)
        toks = jax.random.randint(jax.random.PRNGKey(9), (2, 16), 0, 256)
        import optax
        step, init = make_train_step(cfg, optax.adamw(3e-3), remat=True)
        opt_state = init(params)
        params, opt_state, l0 = step(params, opt_state, toks)
        losses = [float(l0)]
        for _ in range(6):
            params, opt_state, loss = step(params, opt_state, toks)
            losses.append(float(loss))
        assert losses[-1] < losses[0]
