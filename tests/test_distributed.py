"""Data-parallel training on the virtual 8-device mesh: sharded == local."""

import jax
import jax.numpy as jnp
import numpy as np

from fisr_tpu.core.mesh import data_sharding, make_mesh, replicated, shard_batch
from fisr_tpu.data.synth import synthetic_store
from fisr_tpu.train import schedule
from fisr_tpu.train.trainer import adam_with_schedule, create_state, make_train_step
import pytest


@pytest.mark.slow
def test_dp_train_step_matches_single_device():
    store = synthetic_store(n_samples=10, h=32, w=32, seed=0, val_size=2)
    opt = adam_with_schedule(schedule.no_decay(1e-4))
    step = make_train_step(opt, donate=False)

    batch = next(store.batches(batch_size=8, epoch_seed=0))
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    # local run
    state0 = create_state(jax.random.PRNGKey(0), opt)
    _, metrics_local = step(state0, batch)

    # DP run: batch sharded over 8 devices, params replicated
    mesh = make_mesh((8, 1))
    state1 = create_state(jax.random.PRNGKey(0), opt)
    state1 = jax.device_put(state1, replicated(mesh))
    sharded_batch = shard_batch(batch, mesh)
    new_state, metrics_dp = step(state1, sharded_batch)

    np.testing.assert_allclose(
        float(metrics_local["total_loss"]), float(metrics_dp["total_loss"]),
        rtol=1e-4,
    )
    # updated params must remain finite and replicated-consistent
    leaf = jax.tree_util.tree_leaves(new_state.params)[0]
    assert np.isfinite(np.asarray(leaf)).all()


def test_shard_batch_layout():
    mesh = make_mesh((8, 1))
    batch = {"data": np.zeros((8, 4, 4, 3), np.float32)}
    sb = shard_batch(batch, mesh)
    shard_shapes = [s.data.shape for s in sb["data"].addressable_shards]
    assert all(s == (1, 4, 4, 3) for s in shard_shapes)
    assert len(shard_shapes) == 8


@pytest.mark.slow
def test_spatial_plus_data_sharded_train_step_matches_local():
    """Full train step with the batch sharded over BOTH mesh axes (batch
    over 'data', image width over 'spatial') — GSPMD partitions the convs
    with automatic halo exchange; loss must match the unsharded step."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    store = synthetic_store(n_samples=6, h=32, w=64, seed=0, val_size=2)
    opt = adam_with_schedule(schedule.no_decay(1e-4))
    step = make_train_step(opt, donate=False)

    batch = next(store.batches(batch_size=4, epoch_seed=0))
    jbatch = {k: jnp.asarray(v) for k, v in batch.items()}

    state0 = create_state(jax.random.PRNGKey(0), opt)
    _, m_local = step(state0, jbatch)

    mesh = make_mesh((2, 4))

    def sharding(ndim):
        spec = ("data", None, "spatial", None)[:ndim]
        return NamedSharding(mesh, P(*spec))

    sbatch = {k: jax.device_put(v, sharding(v.ndim)) for k, v in batch.items()}
    state1 = create_state(jax.random.PRNGKey(0), opt)
    state1 = jax.device_put(state1, replicated(mesh))
    _, m_sharded = step(state1, sbatch)

    np.testing.assert_allclose(float(m_local["total_loss"]),
                               float(m_sharded["total_loss"]), rtol=1e-4)


@pytest.mark.slow
def test_pwc_dp_train_step_matches_single_device():
    """PWC-Net DP over the mesh 'data' axis == local step — the TPU-native
    replacement for the reference's ONLY multi-device mechanism (PWC tower
    training with host gradient averaging, model_pwcnet.py:254-339)."""
    import optax

    from fisr_tpu.data.flow_dataset import FlowDataset
    from fisr_tpu.models import pwcnet
    from fisr_tpu.train.pwc_trainer import create_pwc_state, make_pwc_train_step

    # shallow pyramid keeps the double (local + sharded) fwd+bwd compile
    # tractable on the virtual mesh; DP semantics don't depend on depth
    cfg = pwcnet.PWCNetConfig(pyr_lvls=4, flow_pred_lvl=2)
    ds = FlowDataset.synthetic(n=10, h=32, w=32, seed=0)
    opt = optax.adam(1e-4)
    step = make_pwc_train_step(opt, cfg, donate=False)
    batch = next(ds.batches(batch_size=8, epoch_seed=0))
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    state0 = create_pwc_state(jax.random.PRNGKey(0), opt, cfg)
    _, m_local = step(state0, batch)

    mesh = make_mesh((8, 1))
    state1 = create_pwc_state(jax.random.PRNGKey(0), opt, cfg)
    state1 = jax.device_put(state1, replicated(mesh))
    sb = shard_batch(batch, mesh)
    new_state, m_dp = step(state1, sb)

    np.testing.assert_allclose(float(m_local["loss"]), float(m_dp["loss"]),
                               rtol=1e-4)
    leaf = jax.tree_util.tree_leaves(new_state.params)[0]
    assert np.isfinite(np.asarray(leaf)).all()
