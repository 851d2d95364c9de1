"""LR-schedule parity vs tf.train.piecewise_constant's own evaluation.

Fixtures from scripts/capture_schedule_oracle.py: the reference's
stair_decay construction (FISRnet.py:232-240) and the PWC multisteps
ladder (model_base.py:307-334), sampled at EVERY step across the
boundaries. Pins the boundary semantics — TF keeps the left value AT a
boundary step and switches at step > boundary; this capture caught our
`>=` off-by-one.
"""

import json
import os

import numpy as np
import pytest

import jax.numpy as jnp

FIX = os.path.join(os.path.dirname(__file__), "fixtures", "tf_oracle")

needs_fixture = pytest.mark.skipif(
    not os.path.exists(os.path.join(FIX, "schedule_manifest.json")),
    reason="schedule oracle fixtures not captured")


@pytest.fixture(scope="module")
def oracle():
    with open(os.path.join(FIX, "schedule_manifest.json")) as f:
        man = json.load(f)
    z = np.load(os.path.join(FIX, "schedule.npz"))
    return man, z


@needs_fixture
def test_stair_decay_matches_tf_at_every_step(oracle):
    from fisr_tpu.train import schedule

    man, z = oracle
    bounds = [p * man["train_iter"] for p in man["stair_points"]]
    sched = schedule.stair_decay(man["init_lr"], bounds, man["factor"])
    steps = jnp.arange(man["n_steps"])
    ours = np.asarray(jnp.stack([sched(s) for s in steps]), np.float64)
    np.testing.assert_allclose(ours, z["stair_lr"], rtol=1e-6)
    # the boundary steps themselves hold the LEFT value
    for b in bounds:
        assert ours[b] == ours[b - 1] and ours[b + 1] != ours[b]


@needs_fixture
def test_multisteps_matches_tf_at_every_step(oracle):
    from fisr_tpu.train import schedule

    man, z = oracle
    sched = schedule.multisteps(man["ms_values"], man["ms_bounds"])
    steps = jnp.arange(man["n_steps"])
    ours = np.asarray(jnp.stack([sched(s) for s in steps]), np.float64)
    np.testing.assert_allclose(ours, z["ms_lr"], rtol=1e-6)
