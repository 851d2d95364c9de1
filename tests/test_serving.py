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
