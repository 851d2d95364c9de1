"""TF checkpoint name-map converter: round trips + structure match."""

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from fisr_tpu.convert import tf_import
from fisr_tpu.models import fisrnet, pwcnet


def _tree_paths(tree, prefix=()):
    out = []
    for k, v in tree.items():
        if isinstance(v, dict):
            out += _tree_paths(v, prefix + (k,))
        else:
            out.append(prefix + (k,))
    return out


def test_fisrnet_map_covers_exactly_the_param_tree():
    params = fisrnet.init_params(jax.random.PRNGKey(0))
    mapped = set(tf_import.fisrnet_name_map().values())
    ours = set(_tree_paths(params))
    assert mapped == ours, (sorted(ours - mapped)[:3], sorted(mapped - ours)[:3])


def test_pwcnet_map_covers_exactly_the_param_tree():
    params = pwcnet.init_params(jax.random.PRNGKey(0))
    mapped = set(tf_import.pwcnet_name_map().values())
    ours = set(_tree_paths(params))
    assert mapped == ours, (sorted(ours - mapped)[:3], sorted(mapped - ours)[:3])


@pytest.mark.slow
def test_fisrnet_roundtrip():
    params = fisrnet.init_params(jax.random.PRNGKey(1))
    tf_vars = tf_import.export_fisrnet(params)
    assert len(tf_vars) == len(jax.tree_util.tree_leaves(params))
    back = tf_import.convert_fisrnet(tf_vars)
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), b)
    # converted tree actually runs
    out = fisrnet.apply(jax.tree_util.tree_map(jnp.asarray, back),
                        jnp.zeros((1, 32, 32, 29)))
    assert out[2].shape == (1, 64, 64, 9)


def test_pwcnet_roundtrip_deconv_layout():
    params = pwcnet.init_params(jax.random.PRNGKey(2))
    tf_vars = tf_import.export_pwcnet(params)
    # deconv kernels live in TF's [k, k, OUT, IN] layout on BOTH sides now
    # (pure rename; _deconv consumes it via transpose_kernel=True) — the
    # up_feat6 kernel's distinct in/out sizes pin the orientation
    w_ours = np.asarray(params["up"]["level_6"]["feat"]["w"])
    assert w_ours.shape[2] == 2 and w_ours.shape[3] > 2  # [4, 4, OUT=2, IN]
    w_tf = tf_vars["pwcnet/upsample/up_feat6/kernel"]
    np.testing.assert_array_equal(w_tf, w_ours)
    back = tf_import.convert_pwcnet(tf_vars)
    np.testing.assert_array_equal(back["up"]["level_6"]["feat"]["w"], w_ours)


def test_missing_variable_raises():
    params = fisrnet.init_params(jax.random.PRNGKey(3))
    tf_vars = tf_import.export_fisrnet(params)
    tf_vars.pop("FISRnet/level_1/enc/level_0/conv/0/w")
    try:
        tf_import.convert_fisrnet(tf_vars)
        assert False, "should raise"
    except KeyError as e:
        assert "missing" in str(e)


def test_convert_cli_npz_to_orbax(tmp_path):
    from fisr_tpu.convert.cli import main as conv_main
    from fisr_tpu.train.checkpoint import CheckpointManager

    params = fisrnet.init_params(jax.random.PRNGKey(5))
    tf_vars = {k + ":0": v for k, v in tf_import.export_fisrnet(params).items()}
    npz = str(tmp_path / "w.npz")
    np.savez(npz, **tf_vars)

    out = str(tmp_path / "ck")
    conv_main(["--model", "fisrnet", "--npz", npz, "--out", out,
               "--step", "122000"])
    mgr = CheckpointManager(out)
    assert mgr.latest_step() == 122000
    tree = mgr.restore()
    back = tree["params"]
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
