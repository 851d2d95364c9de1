"""Pallas kernels: interpret-mode parity vs the XLA compositions."""

import jax.numpy as jnp
import numpy as np


def test_cost_volume_pallas_matches_xla():
    from fisr_tpu.kernels.cost_volume_pallas import cost_volume_pallas
    from fisr_tpu.ops.cost_volume import cost_volume

    rng = np.random.default_rng(0)
    c1 = jnp.asarray(rng.normal(size=(2, 16, 24, 8)).astype(np.float32))
    c2 = jnp.asarray(rng.normal(size=(2, 16, 24, 8)).astype(np.float32))
    for d in (2, 4):
        want = np.asarray(cost_volume(c1, c2, d))
        got = np.asarray(cost_volume_pallas(c1, c2, d, interpret=True))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_cost_volume_pallas_gradient_matches_xla():
    """The kernel's custom VJP (XLA backward) must match differentiating the
    XLA composition — this is what PWC training on TPU runs through."""
    import jax

    from fisr_tpu.kernels.cost_volume_pallas import cost_volume_pallas
    from fisr_tpu.ops.cost_volume import cost_volume

    rng = np.random.default_rng(3)
    c1 = jnp.asarray(rng.normal(size=(1, 8, 12, 4)).astype(np.float32))
    c2 = jnp.asarray(rng.normal(size=(1, 8, 12, 4)).astype(np.float32))

    def loss_pallas(a, b):
        return jnp.sum(cost_volume_pallas(a, b, 2, True) ** 2)

    def loss_xla(a, b):
        return jnp.sum(cost_volume(a, b, 2) ** 2)

    g1 = jax.grad(loss_pallas, argnums=(0, 1))(c1, c2)
    g2 = jax.grad(loss_xla, argnums=(0, 1))(c1, c2)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)
