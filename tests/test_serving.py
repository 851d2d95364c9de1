"""Frame-parallel serving: sharded window batch == single-device result."""

import jax
import jax.numpy as jnp
import numpy as np

from fisr_tpu.core.mesh import make_mesh
from fisr_tpu.infer.device import make_device_runner
from fisr_tpu.infer.serving import make_frame_parallel_runner
from fisr_tpu.models import fisrnet
import pytest

# Full-width equality tests are heavyweight (50-105 s each on a loaded
# CPU host); the fast lane keeps subsystem coverage via the narrow-model
# smoke at the bottom.
slow = pytest.mark.slow


@slow
def test_frame_parallel_matches_local():
    params = fisrnet.init_params(jax.random.PRNGKey(0))
    mesh = make_mesh((8, 1))
    runner = make_frame_parallel_runner(mesh, mode="full")
    rng = np.random.default_rng(0)
    windows = jnp.asarray(rng.uniform(size=(8, 32, 32, 29)).astype(np.float32))
    got = np.asarray(runner(params, windows), np.float32)
    assert got.shape == (8, 64, 64, 9)

    local = make_device_runner("full")
    want = np.asarray(local(params, windows), np.float32)
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=2e-3)


@slow
def test_frame_parallel_video_step_matches_local():
    """The fused flow->warp->FISRnet step with the window batch sharded over
    the mesh must equal the unsharded step (zero-traffic throughput mode)."""
    from fisr_tpu.infer.serving import make_frame_parallel_video_step
    from fisr_tpu.infer.video import make_fused_video_step
    from fisr_tpu.models import pwcnet

    fisr_params = fisrnet.init_params(jax.random.PRNGKey(1))
    pwc_params = pwcnet.init_params(jax.random.PRNGKey(2))
    rng = np.random.default_rng(3)
    frames = jnp.asarray(
        rng.uniform(0, 255, size=(8, 3, 64, 64, 3)).astype(np.float32))

    mesh = make_mesh((8, 1))
    sharded = make_frame_parallel_video_step(mesh)
    got = np.asarray(sharded(fisr_params, pwc_params, frames), np.float32)
    assert got.shape == (8, 128, 128, 9)

    local = make_fused_video_step()
    want = np.asarray(local(fisr_params, pwc_params, frames), np.float32)
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=2e-3)


@slow
def test_frame_parallel_stream_step_matches_monolithic():
    """Pair-cached frame-parallel streaming (shared pair over ppermute, carry
    threaded between rounds) == per-window monolithic step, two rounds."""
    from fisr_tpu.infer.serving import make_frame_parallel_stream_step
    from fisr_tpu.infer.video import make_fused_video_step, make_pair_fn
    from fisr_tpu.models import pwcnet

    fisr_params = fisrnet.init_params(jax.random.PRNGKey(1))
    pwc_params = pwcnet.init_params(jax.random.PRNGKey(2))
    rng = np.random.default_rng(4)
    # 2 rounds x 8 consecutive windows -> 18 frames; window k = (k, k+1, k+2)
    seq = jnp.asarray(
        rng.uniform(0, 255, size=(18, 64, 64, 3)).astype(np.float32))
    windows = jnp.stack([seq[k:k + 3] for k in range(16)])  # [16, 3, h, w, 3]

    mesh = make_mesh((8, 1))
    stream = make_frame_parallel_stream_step(mesh)
    carry = make_pair_fn()(pwc_params, seq[None, 0], seq[None, 1])
    preds = []
    for r in range(2):
        pred, carry = stream(fisr_params, pwc_params, windows[8 * r:8 * r + 8],
                             carry)
        preds.append(np.asarray(pred, np.float32))
    got = np.concatenate(preds)
    assert got.shape == (16, 128, 128, 9)

    local = make_fused_video_step()
    want = np.asarray(local(fisr_params, pwc_params, windows), np.float32)
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=2e-3)
    # the threaded carry after round 2 must be pair (16, 17)
    want_pair = make_pair_fn()(pwc_params, seq[None, 16], seq[None, 17])
    np.testing.assert_allclose(np.asarray(carry[0], np.float32),
                               np.asarray(want_pair[0], np.float32),
                               rtol=5e-3, atol=2e-3)


@slow
def test_frame_parallel_stream_step_multiple_windows_per_chip():
    """B=2 windows per chip in one round (N=16 over 8 chips): window 2i's
    first pair crosses chips (ppermute), window 2i+1's comes from its
    on-chip left neighbor — both paths must equal the monolithic step."""
    from fisr_tpu.infer.serving import make_frame_parallel_stream_step
    from fisr_tpu.infer.video import make_fused_video_step, make_pair_fn
    from fisr_tpu.models import pwcnet

    fisr_params = fisrnet.init_params(jax.random.PRNGKey(1))
    pwc_params = pwcnet.init_params(jax.random.PRNGKey(2))
    rng = np.random.default_rng(6)
    seq = jnp.asarray(
        rng.uniform(0, 255, size=(18, 64, 64, 3)).astype(np.float32))
    windows = jnp.stack([seq[k:k + 3] for k in range(16)])  # [16, 3, h, w, 3]

    mesh = make_mesh((8, 1))
    stream = make_frame_parallel_stream_step(mesh)
    carry = make_pair_fn()(pwc_params, seq[None, 0], seq[None, 1])
    pred, carry = stream(fisr_params, pwc_params, windows, carry)
    got = np.asarray(pred, np.float32)
    assert got.shape == (16, 128, 128, 9)

    local = make_fused_video_step()
    want = np.asarray(local(fisr_params, pwc_params, windows), np.float32)
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=2e-3)
    # carry = the globally-last window's new pair = pair (16, 17)
    want_pair = make_pair_fn()(pwc_params, seq[None, 16], seq[None, 17])
    np.testing.assert_allclose(np.asarray(carry[0], np.float32),
                               np.asarray(want_pair[0], np.float32),
                               rtol=5e-3, atol=2e-3)


def test_stream_step_narrow_model_smoke():
    """Fast-lane coverage of the pair-cached ppermute stream (the per-commit
    gate must touch every subsystem): a narrow (ch=8) FISRnet + shallow
    (pyr_lvls=4) PWC-Net run the IDENTICAL shard_map program structure —
    ppermute pair sharing, axis_index first-chip select, carry threading —
    at millisecond runtimes (apply paths read widths from param shapes).
    Full-width equality stays in the slow tests above."""
    from fisr_tpu.infer.serving import make_frame_parallel_stream_step
    from fisr_tpu.infer.video import make_pair_fn
    from fisr_tpu.models import pwcnet

    cfg = pwcnet.PWCNetConfig(pyr_lvls=4, flow_pred_lvl=2)
    fisr_params = fisrnet.init_params(jax.random.PRNGKey(0), ch=8)
    pwc_params = pwcnet.init_params(jax.random.PRNGKey(7), cfg)
    mesh = make_mesh((8, 1))
    rng = np.random.default_rng(3)
    seq = jnp.asarray(rng.uniform(0, 255, size=(10, 32, 32, 3)), jnp.float32)
    windows = jnp.stack([seq[k:k + 3] for k in range(8)])
    pair_fn = make_pair_fn(cfg)
    stream = make_frame_parallel_stream_step(mesh, cfg=cfg)
    carry0 = pair_fn(pwc_params, seq[None, 0], seq[None, 1])
    pred, carry = stream(fisr_params, pwc_params, windows, carry0)
    assert pred.shape == (8, 64, 64, 9)
    assert np.isfinite(np.asarray(pred)).all()
    # the returned carry must be the globally-last window's NEW pair
    want = pair_fn(pwc_params, seq[None, 8], seq[None, 9])
    np.testing.assert_allclose(np.asarray(carry[0], np.float32),
                               np.asarray(want[0], np.float32),
                               rtol=5e-3, atol=2e-3)


@slow
def test_frame_parallel_stream_ragged_final_round():
    """Ragged final round (VERDICT r4 item 6): 5 valid windows padded to an
    8-device round; pred[:5] equals the monolithic step and the carry is the
    5th window's new pair EXACTLY — so a stream whose window count doesn't
    divide the mesh (the reference's video phase handles arbitrary N-2
    windows, FISRnet.py:937-1084) threads on bit-consistently."""
    from fisr_tpu.infer.serving import (make_frame_parallel_stream_step,
                                        pad_stream_round)
    from fisr_tpu.infer.video import make_fused_video_step, make_pair_fn
    from fisr_tpu.models import pwcnet

    fisr_params = fisrnet.init_params(jax.random.PRNGKey(1))
    pwc_params = pwcnet.init_params(jax.random.PRNGKey(2))
    rng = np.random.default_rng(7)
    # 5 windows = 7 frames; window k = (k, k+1, k+2)
    seq = jnp.asarray(
        rng.uniform(0, 255, size=(7, 64, 64, 3)).astype(np.float32))
    windows = jnp.stack([seq[k:k + 3] for k in range(5)])

    mesh = make_mesh((8, 1))
    stream = make_frame_parallel_stream_step(mesh, ragged=True)
    padded, n_valid = pad_stream_round(windows, 8)
    assert padded.shape[0] == 8 and n_valid == 5
    carry0 = make_pair_fn()(pwc_params, seq[None, 0], seq[None, 1])
    pred, carry = stream(fisr_params, pwc_params, padded, carry0,
                         jnp.asarray(n_valid))
    got = np.asarray(pred, np.float32)[:n_valid]

    local = make_fused_video_step()
    want = np.asarray(local(fisr_params, pwc_params, windows), np.float32)
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=2e-3)
    # carry = window 4's NEW pair = pair (5, 6), not a padded window's
    want_pair = make_pair_fn()(pwc_params, seq[None, 5], seq[None, 6])
    np.testing.assert_allclose(np.asarray(carry[0], np.float32),
                               np.asarray(want_pair[0], np.float32),
                               rtol=5e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(carry[1], np.float32),
                               np.asarray(want_pair[1], np.float32),
                               rtol=5e-3, atol=2e-3)

    # a full ragged-mode round (n_valid == N) matches the plain step's carry
    seq2 = jnp.asarray(
        rng.uniform(0, 255, size=(10, 64, 64, 3)).astype(np.float32))
    windows2 = jnp.stack([seq2[k:k + 3] for k in range(8)])
    carry1 = make_pair_fn()(pwc_params, seq2[None, 0], seq2[None, 1])
    pred2, carry2 = stream(fisr_params, pwc_params, windows2, carry1,
                           jnp.asarray(8))
    want_pair2 = make_pair_fn()(pwc_params, seq2[None, 8], seq2[None, 9])
    np.testing.assert_allclose(np.asarray(carry2[0], np.float32),
                               np.asarray(want_pair2[0], np.float32),
                               rtol=5e-3, atol=2e-3)
