"""FISRnet / PWC-Net: shapes, parameter-count parity, basic behavior."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fisr_tpu.models import fisrnet, pwcnet
from fisr_tpu.ops.conv import F32, Policy


@pytest.fixture(scope="module")
def fisr_params():
    return fisrnet.init_params(jax.random.PRNGKey(0))


def test_fisrnet_param_count(fisr_params):
    # Survey §2 / BASELINE.md: ~48.3M total, ~16.1M per level, separate
    # weights (computed from FISRnet.py:73-173 + ops.py conv shapes).
    total = fisrnet.param_count(fisr_params)
    assert total == 48_316_251, total
    lvl1 = sum(x.size for x in jax.tree_util.tree_leaves(fisr_params["level_1"]))
    assert lvl1 == 16_101_961, lvl1


@pytest.mark.slow
def test_fisrnet_output_shapes(fisr_params):
    x = jnp.zeros((2, 64, 96, 29), jnp.float32)
    p1, p2, p3 = fisrnet.apply(fisr_params, x)
    assert p1.shape == (2, 32, 48, 9)   # x1/4 input, x2 head
    assert p2.shape == (2, 64, 96, 9)   # x1/2 input, x2 head
    assert p3.shape == (2, 128, 192, 9)  # full-res input, x2 head


def test_fisrnet_jit_and_finite(fisr_params):
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 32, 32, 29))
    f = jax.jit(lambda p, v: fisrnet.apply(p, v)[2])
    out = f(fisr_params, x)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.slow
def test_fisrnet_bf16_policy_close_to_f32(fisr_params):
    x = jax.random.uniform(jax.random.PRNGKey(2), (1, 32, 32, 29))
    f32 = np.asarray(fisrnet.apply(fisr_params, x, policy=F32)[2])
    bf16 = np.asarray(
        fisrnet.apply(fisr_params, x, policy=Policy(jnp.bfloat16))[2]
    ).astype(np.float32)
    # bf16 activations through a 3-level random-init cascade drift, but the
    # relative RMS error must stay small (policy wiring, not numerics zoo)
    rel_rms = np.sqrt(np.mean((f32 - bf16) ** 2)) / (np.sqrt(np.mean(f32**2)) + 1e-8)
    assert rel_rms < 0.10, rel_rms


def test_fisrnet_batched_windows_equal_sequential(fisr_params):
    """Folding sliding windows into the batch axis is math-identical to the
    reference's 3 weight-shared graph replicas (FISRnet.py:281-306)."""
    rng = np.random.default_rng(0)
    wins = rng.uniform(size=(3, 1, 32, 32, 29)).astype(np.float32)
    batched = np.asarray(fisrnet.apply(fisr_params, jnp.concatenate(list(wins), 0))[2])
    for i in range(3):
        solo = np.asarray(fisrnet.apply(fisr_params, wins[i])[2])
        # float-only noise: conv reduction order differs batched vs solo,
        # amplified through the 3-level cascade
        np.testing.assert_allclose(batched[i : i + 1], solo, rtol=5e-3, atol=2e-3)


@pytest.fixture(scope="module")
def pwc_params():
    return pwcnet.init_params(jax.random.PRNGKey(0))


@pytest.mark.slow
def test_pwcnet_shapes_and_pyramid(pwc_params):
    cfg = pwcnet.PWCNetConfig()
    x1 = jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 64, 3))
    x2 = jax.random.uniform(jax.random.PRNGKey(2), (1, 64, 64, 3))
    flow, pyr = pwcnet.apply(pwc_params, x1, x2, cfg)
    assert flow.shape == (1, 64, 64, 2)
    # pyramid levels 6..2: spatial sizes 1,2,4,8,16
    sizes = [p.shape[1] for p in pyr]
    assert sizes == [1, 2, 4, 8, 16]
    assert np.isfinite(np.asarray(flow)).all()


def test_pwcnet_param_count_matches_lg_6_2(pwc_params):
    """Reference option comments (model_pwcnet.py:84-87): base 4,705,064;
    dense connections 9,374,274; residual context +2,069,000. lg-6-2 uses
    dense + res; res ctx nets at levels 6..3 add a context net per level
    whose first conv width follows the dense upfeat channels."""
    n = sum(x.size for x in jax.tree_util.tree_leaves(pwc_params))
    base_dense = 9_374_274
    assert n > base_dense  # dense + residual-context must exceed dense-only
    assert n < 16_000_000  # and stay in the documented ballpark
    # feature pyramid alone (shared siamese) — independent of cx options
    feat = sum(x.size for x in jax.tree_util.tree_leaves(pwc_params["feat"]))
    want_feat = 0
    c_prev = 3
    for c in [16, 32, 64, 96, 128, 196]:
        want_feat += 9 * c_prev * c + c + 2 * (9 * c * c + c)
        c_prev = c
    assert feat == want_feat


def test_pwcnet_identity_pair_small_flow(pwc_params):
    """Same image in both slots -> cost volume peaks at zero shift; a random
    net won't emit exactly zero, but must stay finite and bounded."""
    x = jax.random.uniform(jax.random.PRNGKey(3), (1, 64, 64, 3))
    flow, _ = pwcnet.apply(pwc_params, x, x)
    assert np.isfinite(np.asarray(flow)).all()


@pytest.mark.slow
def test_head_tail_conv_equals_naive_composition():
    # head_tail_conv is an exact packed rewrite of relu -> d2s -> conv3x3
    # (the head tail, reference FISRnet.py:99-101); only float association
    # may differ.
    from fisr_tpu.ops.conv import conv2d, depth_to_space, head_tail_conv, init_conv

    rng = np.random.default_rng(0)
    for co in (6, 3):
        p = init_conv(jax.random.PRNGKey(co), 3, 16, co)
        m = jnp.asarray(rng.normal(size=(2, 9, 11, 64)), jnp.float32)
        naive = conv2d(p, depth_to_space(jax.nn.relu(m), 2), F32)
        fast = head_tail_conv(p, m, F32)
        assert fast.shape == naive.shape == (2, 18, 22, co)
        np.testing.assert_allclose(np.asarray(fast), np.asarray(naive),
                                   rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_level_batch_invariance_f32(fisr_params):
    # The merged-head-conv0 and packed head-tail rewrites must keep the
    # model batch-invariant: a batch-2 apply equals two batch-1 applies
    # up to float-association noise in f32.
    x = jnp.asarray(np.random.default_rng(5).uniform(size=(2, 32, 48, 29)),
                    jnp.float32)
    batched = fisrnet.apply(fisr_params, x)[2]          # paired path
    singles = jnp.concatenate([
        fisrnet.apply(fisr_params, x[i : i + 1])[2]     # direct path
        for i in range(2)
    ], axis=0)
    # f32 reassociation noise through 45 convs x 3 chained levels: tiny
    # absolute error on O(10) outputs, relative only meaningful off zero
    np.testing.assert_allclose(np.asarray(batched), np.asarray(singles),
                               rtol=1e-3, atol=2e-3)


def test_pwc_tiling_grid_rules():
    """Auto-tiling thresholds measured on v5e (models/pwcnet.py)."""
    from fisr_tpu.models.pwcnet import _estimator_grid, _feature_grid

    assert _estimator_grid(528, 960) == (4, 4)       # x2-video level 2
    assert _estimator_grid(264, 480) is None         # level 3: tiling loses
    assert _estimator_grid(24, 40) is None           # training crops
    assert _feature_grid(2112, 3840) == (8, 8)       # x2-video level-1 input
    assert _feature_grid(1056, 1920) is None         # level 2+: wash
    g = _estimator_grid(528, 962)                    # 962 = 2*13*37
    assert g is None or 962 % g[1] == 0              # never a non-divisor


def test_pwc_estimator_tiled_interior_exact(pwc_params):
    """halo_map'd estimator (dense concats) == full-frame in patch cores."""
    from fisr_tpu.infer.halo import halo_map
    from fisr_tpu.models.pwcnet import (PWCNetConfig, _estimate,
                                        _estimator_channels)

    cfg = PWCNetConfig()
    od = _estimator_channels(cfg, 2)
    x = jax.random.normal(jax.random.PRNGKey(30), (1, 32, 48, od), jnp.float32)
    p = pwc_params["flow"]["level_2"]
    full_up, full_fl = pwcnet._estimate(p, x, cfg, F32)
    t_up, t_fl = halo_map(lambda t: _estimate(p, t, cfg, F32), x,
                          (2, 2), 6, (32, 48))
    np.testing.assert_array_equal(np.asarray(t_fl)[:, 6:-6, 6:-6],
                                  np.asarray(full_fl)[:, 6:-6, 6:-6])
    np.testing.assert_array_equal(np.asarray(t_up)[:, 6:-6, 6:-6],
                                  np.asarray(full_up)[:, 6:-6, 6:-6])


def test_pwc_feature_block_tiled_interior_exact(pwc_params):
    """The stride-2 feature block under halo_map: even patch + even halo
    keep the stride grid aligned -> interior bit-exact vs full-frame."""
    from fisr_tpu.infer.halo import halo_map
    from fisr_tpu.models.pwcnet import PWCNetConfig, _leaky
    from fisr_tpu.ops.conv import conv2d

    cfg = PWCNetConfig()
    lp = pwc_params["feat"]["level_1"]

    def block(t):
        t = _leaky(conv2d(lp["a"], t, F32, stride=2))
        t = _leaky(conv2d(lp["aa"], t, F32))
        return _leaky(conv2d(lp["b"], t, F32))

    x = jax.random.normal(jax.random.PRNGKey(31), (1, 64, 96, 3), jnp.float32)
    full = block(x)
    tiled = halo_map(block, x, (2, 2), 6, (64, 96))
    assert tiled.shape == full.shape
    np.testing.assert_array_equal(np.asarray(tiled)[:, 3:-3, 3:-3],
                                  np.asarray(full)[:, 3:-3, 3:-3])


def test_pwc_apply_pyramids_matches_apply(pwc_params):
    """apply == extract twice + apply_pyramids (the bidirectional-reuse
    surface used by the video pipeline)."""
    cfg = pwcnet.PWCNetConfig()
    x1 = jax.random.uniform(jax.random.PRNGKey(32), (1, 64, 64, 3), jnp.float32)
    x2 = jax.random.uniform(jax.random.PRNGKey(33), (1, 64, 64, 3), jnp.float32)
    want, _ = pwcnet.apply(pwc_params, x1, x2, cfg, F32)
    c1 = pwcnet.extract_features(pwc_params, x1, cfg, F32)
    c2 = pwcnet.extract_features(pwc_params, x2, cfg, F32)
    got, _ = pwcnet.apply_pyramids(pwc_params, c1, c2, cfg, F32)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
