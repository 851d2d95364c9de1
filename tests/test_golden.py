"""Cross-round numeric regression fixtures.

Seeded params + seeded inputs must keep producing the same statistics
(within float noise). Any op change that alters the forward math — resize
semantics, conv padding, window assembly, pyramid wiring — trips these.
Values were recorded on the CPU backend (f32) at round 1.
"""

import jax
import jax.numpy as jnp
import numpy as np

from fisr_tpu.models import fisrnet, pwcnet

GOLDEN = {
    "fisr_p3_mean": -8.428850173950195,
    "fisr_p3_std": 44.83644485473633,
    "fisr_p1_mean": -0.12063111364841461,
    "fisr_p2_mean": -1.1426401138305664,
    "pwc_flow_mean": -0.7857347726821899,
    "pwc_flow_std": 1.1403286457061768,
}


def test_fisrnet_forward_golden():
    fp = fisrnet.init_params(jax.random.PRNGKey(42))
    x = jax.random.uniform(jax.random.PRNGKey(7), (1, 32, 32, 29), jnp.float32)
    p1, p2, p3 = fisrnet.apply(fp, x)
    np.testing.assert_allclose(float(jnp.mean(p3)), GOLDEN["fisr_p3_mean"], rtol=1e-4)
    np.testing.assert_allclose(float(jnp.std(p3)), GOLDEN["fisr_p3_std"], rtol=1e-4)
    np.testing.assert_allclose(float(jnp.mean(p1)), GOLDEN["fisr_p1_mean"], rtol=1e-3)
    np.testing.assert_allclose(float(jnp.mean(p2)), GOLDEN["fisr_p2_mean"], rtol=1e-3)


def test_pwcnet_forward_golden():
    cfg = pwcnet.PWCNetConfig(pyr_lvls=4, flow_pred_lvl=2, search_range=2,
                              cost_volume_impl="xla")
    pp = pwcnet.init_params(jax.random.PRNGKey(43), cfg)
    a = jax.random.uniform(jax.random.PRNGKey(8), (1, 32, 32, 3))
    b = jax.random.uniform(jax.random.PRNGKey(9), (1, 32, 32, 3))
    flow, _ = pwcnet.apply(pp, a, b, cfg)
    np.testing.assert_allclose(float(jnp.mean(flow)), GOLDEN["pwc_flow_mean"], rtol=1e-4)
    np.testing.assert_allclose(float(jnp.std(flow)), GOLDEN["pwc_flow_std"], rtol=1e-4)
