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
