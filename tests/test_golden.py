"""Cross-round numeric regression fixtures.

Seeded params + seeded inputs must keep producing the same statistics
(within float noise). Any op change that alters the forward math — resize
semantics, conv padding, window assembly, pyramid wiring — trips these.
Values were recorded on the CPU backend (f32) at round 1.
"""

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from fisr_tpu.models import fisrnet, pwcnet

GOLDEN = {
    "fisr_p3_mean": -8.428850173950195,
    "fisr_p3_std": 44.83644485473633,
    "fisr_p1_mean": -0.12063111364841461,
    "fisr_p2_mean": -1.1426401138305664,
    # pwc values re-recorded round 5: the tf_oracle capture exposed two
    # parity bugs (warp convention, deconv transpose semantics) whose fixes
    # change the forward math; the new numbers are pinned against the
    # reference's own graph by tests/test_tf_oracle.py
    "pwc_flow_mean": -0.7604550719261169,
    "pwc_flow_std": 1.0680906772613525,
    # BIT-EXACT f32 CPU output slices (recorded round 3): unlike the
    # statistics above, these catch compensating-error changes — e.g. a
    # sign-symmetric perturbation that leaves mean/std intact. Recorded
    # under the suite's exact env (JAX_PLATFORMS=cpu + 8 virtual devices —
    # thread/device config changes XLA CPU reduction splits at the 1e-4
    # level, so regeneration must use tests/conftest.py's flags); verified
    # deterministic in-process and across processes there.
    "fisr_p3_slice": [-13.040554, -102.99095, 6.8660936, -28.51501,
                      -50.736557, -48.204803, -5.244507, -30.506393,
                      -9.579147, -105.48127, -2.5797863, -32.999092,
                      -31.08945, -87.408806, -9.607002, -0.07026243,
                      -52.423664, -36.64991, 18.1445, -4.74817,
                      -44.23657, -95.621544, 3.2375612, 8.053518],
    "fisr_p1_slice": [0.044161066, 0.0629617, 0.3382005, 0.24491823,
                      1.40632, -0.33657444, -0.7033371, -0.77859485,
                      -0.082738, -1.1199441, 2.6228442, -0.37336063],
    "pwc_flow_slice": [-2.1835575, -2.23715, -1.9427069, -2.37289,
                       -1.7018564, -2.5086303, -1.869556, -2.5174923,
                       -1.5883987, -2.6557326, -1.3072416, -2.7939727],
}


def test_fisrnet_forward_golden():
    fp = fisrnet.init_params(jax.random.PRNGKey(42))
    x = jax.random.uniform(jax.random.PRNGKey(7), (1, 32, 32, 29), jnp.float32)
    p1, p2, p3 = fisrnet.apply(fp, x)
    np.testing.assert_allclose(float(jnp.mean(p3)), GOLDEN["fisr_p3_mean"], rtol=1e-4)
    np.testing.assert_allclose(float(jnp.std(p3)), GOLDEN["fisr_p3_std"], rtol=1e-4)
    np.testing.assert_allclose(float(jnp.mean(p1)), GOLDEN["fisr_p1_mean"], rtol=1e-3)
    np.testing.assert_allclose(float(jnp.mean(p2)), GOLDEN["fisr_p2_mean"], rtol=1e-3)
    np.testing.assert_array_equal(
        np.asarray(p3)[0, 5:7, 9:12, :4].ravel(),
        np.array(GOLDEN["fisr_p3_slice"], np.float32))
    np.testing.assert_array_equal(
        np.asarray(p1)[0, 3:5, 2:4, :3].ravel(),
        np.array(GOLDEN["fisr_p1_slice"], np.float32))


@pytest.mark.slow
def test_pwcnet_forward_golden():
    cfg = pwcnet.PWCNetConfig(pyr_lvls=4, flow_pred_lvl=2, search_range=2,
                              cost_volume_impl="xla")
    pp = pwcnet.init_params(jax.random.PRNGKey(43), cfg)
    a = jax.random.uniform(jax.random.PRNGKey(8), (1, 32, 32, 3))
    b = jax.random.uniform(jax.random.PRNGKey(9), (1, 32, 32, 3))
    flow, _ = pwcnet.apply(pp, a, b, cfg)
    np.testing.assert_allclose(float(jnp.mean(flow)), GOLDEN["pwc_flow_mean"], rtol=1e-4)
    np.testing.assert_allclose(float(jnp.std(flow)), GOLDEN["pwc_flow_std"], rtol=1e-4)
    np.testing.assert_array_equal(
        np.asarray(flow)[0, 4:6, 6:9, :].ravel(),
        np.array(GOLDEN["pwc_flow_slice"], np.float32))
