"""Joint end-to-end fine-tuning: gradients through flow -> warp -> FISRnet."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from fisr_tpu.models import fisrnet, pwcnet
from fisr_tpu.train.joint import create_joint_state, make_joint_train_step

# Full-width joint steps are heavyweight (56-380 s on a loaded CPU host);
# the fast lane keeps subsystem coverage via the narrow-model smoke below.
slow = pytest.mark.slow

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


def test_joint_step_narrow_model_smoke():
    """Fast-lane coverage of the joint grad path (one backward program
    through flow -> warp -> FISRnet): narrow ch=8 FISRnet + pyr_lvls=4
    PWC-Net run the identical autodiff structure at millisecond runtimes.
    Full-width descent/equality stays in the slow tests below."""
    cfg = pwcnet.PWCNetConfig(pyr_lvls=4, flow_pred_lvl=2, search_range=2,
                              cost_volume_impl="xla")
    fisr0 = fisrnet.init_params(jax.random.PRNGKey(0), ch=8)
    pwc0 = pwcnet.init_params(jax.random.PRNGKey(1), cfg)
    step = make_joint_train_step(optax.adam(1e-3), optax.adam(1e-4), cfg=cfg,
                                 donate=False)
    state = create_joint_state(fisr0, pwc0, optax.adam(1e-3),
                               optax.adam(1e-4))
    rng = np.random.default_rng(5)
    batch = {
        "frames": jnp.asarray(rng.uniform(0, 255, (1, 3, 32, 32, 3)),
                              jnp.float32),
        "target": jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 9)),
                              jnp.float32),
    }
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["joint_loss"]))
    # gradients reached BOTH trees through the fused program
    assert _leaf_delta(state.fisr_params, fisr0) > 0
    assert _leaf_delta(state.pwc_params, pwc0) > 0


@slow
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


@slow
def test_joint_step_fast_mode_upscale1(params):
    """upscale=1 (the fast serving mode) must train too: fine-tuning WITH
    flow at native resolution specializes a checkpoint to --flow_scale 1
    serving (scripts/finetune_joint_synth.py --flow_scale 1)."""
    fisr0, pwc0 = params
    step = make_joint_train_step(optax.adam(1e-4), optax.adam(1e-5),
                                 upscale=1, donate=False)
    state = create_joint_state(fisr0, pwc0, optax.adam(1e-4),
                               optax.adam(1e-5))
    batch = _batch(3)
    losses = []
    for _ in range(3):
        state, metrics = step(state, batch)
        losses.append(float(metrics["joint_loss"]))
    assert _leaf_delta(state.pwc_params, pwc0) > 0
    assert losses[-1] < losses[0] and np.isfinite(losses).all()


@slow
def test_joint_step_data_parallel_matches_local(params):
    """DP over the virtual mesh: replicated params + batch sharded on
    'data' must produce the same update as the local step (GSPMD inserts
    the gradient psum — same contract as trainer.make_train_step,
    test_distributed)."""
    import numpy as np

    from fisr_tpu.core.mesh import make_mesh, replicated, shard_batch

    fisr0, pwc0 = params
    step = make_joint_train_step(optax.adam(1e-4), optax.adam(1e-5),
                                 donate=False)
    batch = _batch(3)

    state_l = create_joint_state(fisr0, pwc0, optax.adam(1e-4),
                                 optax.adam(1e-5))
    state_l, m_l = step(state_l, batch)

    mesh = make_mesh((2, 1))
    state_s = create_joint_state(fisr0, pwc0, optax.adam(1e-4),
                                 optax.adam(1e-5))
    state_s = jax.device_put(state_s, replicated(mesh))
    state_s, m_s = step(state_s, shard_batch(batch, mesh))

    np.testing.assert_allclose(float(m_s["joint_loss"]),
                               float(m_l["joint_loss"]), rtol=1e-5)
    # Adam's FIRST step is +-lr elementwise, so a near-zero gradient whose
    # sign flips under psum reassociation shows up as exactly 2*lr on that
    # element. Bound every element by 2*lr and the mean by a tiny value
    # (i.e. at most a handful of sign-flipped zeros, everything else equal).
    for a, b in zip(jax.tree_util.tree_leaves(state_s.fisr_params),
                    jax.tree_util.tree_leaves(state_l.fisr_params)):
        d = np.abs(np.asarray(a, np.float64) - np.asarray(b, np.float64))
        assert d.max() <= 2 * 1e-4 + 1e-6          # at worst a flipped zero
        flips = d > 1e-5
        assert flips.mean() <= 0.02                 # sign flips are rare
        assert d[~flips].max(initial=0.0) <= 1e-5   # everything else equal


@slow
def test_frozen_pwc_mode(params):
    fisr0, pwc0 = params
    step = make_joint_train_step(optax.adam(1e-4), None, donate=False)
    state = create_joint_state(fisr0, pwc0, optax.adam(1e-4), None)
    state, metrics = step(state, _batch(1))
    assert _leaf_delta(state.fisr_params, fisr0) > 0
    assert _leaf_delta(state.pwc_params, pwc0) == 0
    assert state.pwc_opt is None
    assert np.isfinite(float(metrics["joint_loss"]))
