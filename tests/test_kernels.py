"""Pallas kernels: interpret-mode parity vs the XLA compositions."""

import jax
import jax.numpy as jnp
import numpy as np

from fisr_tpu.kernels.res_block_pallas import res_block_fused
from fisr_tpu.ops.conv import F32, init_res_block, res_block


def test_res_block_fused_matches_xla():
    p = init_res_block(jax.random.PRNGKey(0), 64)
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 64, 128, 64), jnp.float32)
    want = np.asarray(res_block(p, x, F32))
    got = np.asarray(res_block_fused(
        x, p["conv0"]["w"], p["conv0"]["b"], p["conv1"]["w"], p["conv1"]["b"],
        th=32, tw=64, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_res_block_fused_edge_tiles():
    """Single-tile and edge-tile cases: conv SAME zero-padding semantics at
    frame borders must match exactly (the apron-masking logic)."""
    p = init_res_block(jax.random.PRNGKey(2), 64)
    x = jax.random.uniform(jax.random.PRNGKey(3), (1, 16, 32, 64), jnp.float32)
    want = np.asarray(res_block(p, x, F32))
    got = np.asarray(res_block_fused(
        x, p["conv0"]["w"], p["conv0"]["b"], p["conv1"]["w"], p["conv1"]["b"],
        th=16, tw=32, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


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
