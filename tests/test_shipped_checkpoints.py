"""Shipped-checkpoint compatibility guard.

Every PWC-Net tree committed under checkpoint_dir/ must load AND run
through the CURRENT `pwcnet.apply`. This is the regression a convention
change can silently create: round 5's released-weight parity fixes
changed the deconv kernel layout to TF-native [k, k, out, in]
(transpose_kernel semantics) and the in-loop warp sign
(models/pwcnet.py:81-110, :295-305) — trees trained before that change
crash on the upfeat deconv shape ([4,4,529,2] vs [4,4,2,529]) or, worse,
run with silently-wrong deconv/warp semantics. Any future apply() change
that invalidates the shipped trees must either migrate them or fail here.

The committed trees were retrained under the round-5 convention
(scripts/train_pwc_synth.py + scripts/finetune_joint_synth.py receipts in
PERF.md).
"""

import os

import jax
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SHIPPED = [d for d in ("pwcnet", "pwcnet_joint", "pwcnet_joint_fast")
           if os.path.isdir(os.path.join(REPO, "checkpoint_dir", d))]


@pytest.mark.parametrize("name", SHIPPED)
def test_shipped_pwc_tree_runs_through_current_apply(name):
    import jax.numpy as jnp

    from fisr_tpu.models import pwcnet
    from fisr_tpu.train.checkpoint import CheckpointManager

    mgr = CheckpointManager(os.path.join(REPO, "checkpoint_dir", name),
                            best_mode="min")
    step = mgr.best_step()
    assert step is not None, f"{name}: no checkpoint step found"
    tree = mgr.restore(step)
    params = tree["params"] if isinstance(tree, dict) and "params" in tree \
        else tree

    # shapes must match a fresh init of the CURRENT model exactly
    want = pwcnet.init_params(jax.random.PRNGKey(0))
    got_shapes = jax.tree_util.tree_map(lambda a: jnp.shape(a), params)
    want_shapes = jax.tree_util.tree_map(lambda a: jnp.shape(a), want)
    assert got_shapes == want_shapes, (
        f"{name} step {step}: param shapes diverge from the current model "
        f"— the tree predates an apply() convention change; retrain or "
        f"migrate it")

    # and the tree must actually run (smallest legal geometry: 64x64)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(size=(1, 64, 64, 3)), jnp.float32)
    flow, _pyr = pwcnet.apply(params, img, img)
    flow = np.asarray(flow, np.float32)
    assert flow.shape == (1, 64, 64, 2)
    assert np.isfinite(flow).all(), f"{name}: non-finite flow output"
