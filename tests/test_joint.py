"""Joint end-to-end fine-tuning: gradients through flow -> warp -> FISRnet."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from fisr_tpu.models import fisrnet, pwcnet
from fisr_tpu.train.joint import create_joint_state, make_joint_train_step

H = W = 64
B = 2


def _batch(seed=0):
    rng = np.random.default_rng(seed)
    return {
        "frames": jnp.asarray(
            rng.uniform(0, 255, (B, 3, H, W, 3)), jnp.float32),
        "target": jnp.asarray(
            rng.uniform(0, 1, (B, 2 * H, 2 * W, 9)), jnp.float32),
    }


@pytest.fixture(scope="module")
def params():
    return (fisrnet.init_params(jax.random.PRNGKey(0)),
            pwcnet.init_params(jax.random.PRNGKey(1)))


def _leaf_delta(a, b):
    return max(float(jnp.max(jnp.abs(x - y)))
               for x, y in zip(jax.tree_util.tree_leaves(a),
                               jax.tree_util.tree_leaves(b)))


def test_joint_step_updates_both_models_and_descends(params):
    fisr0, pwc0 = params
    step = make_joint_train_step(optax.adam(1e-4), optax.adam(1e-5),
                                 donate=False)
    state = create_joint_state(fisr0, pwc0, optax.adam(1e-4),
                               optax.adam(1e-5))
    batch = _batch()
    losses = []
    for _ in range(4):
        state, metrics = step(state, batch)
        losses.append(float(metrics["joint_loss"]))
    # gradients reached BOTH trees (the reference's 3-session split makes
    # the pwc update impossible — this asserts the new capability)
    assert _leaf_delta(state.fisr_params, fisr0) > 0
    assert _leaf_delta(state.pwc_params, pwc0) > 0
    # optimizing the one batch it sees
    assert losses[-1] < losses[0]
    assert np.isfinite(losses).all()
    assert np.isfinite(float(metrics["joint_PSNR"]))


def test_frozen_pwc_mode(params):
    fisr0, pwc0 = params
    step = make_joint_train_step(optax.adam(1e-4), None, donate=False)
    state = create_joint_state(fisr0, pwc0, optax.adam(1e-4), None)
    state, metrics = step(state, _batch(1))
    assert _leaf_delta(state.fisr_params, fisr0) > 0
    assert _leaf_delta(state.pwc_params, pwc0) == 0
    assert state.pwc_opt is None
    assert np.isfinite(float(metrics["joint_loss"]))
