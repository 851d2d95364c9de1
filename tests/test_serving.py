"""Frame-parallel serving: sharded window batch == single-device result."""

import jax
import jax.numpy as jnp
import numpy as np

from fisr_tpu.core.mesh import make_mesh
from fisr_tpu.infer.device import make_device_runner
from fisr_tpu.infer.serving import make_frame_parallel_runner
from fisr_tpu.models import fisrnet


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
