"""Halo tiling utilities (infer/halo.py), the mid-pipeline stale-halo shrink
(models/fisrnet.apply_level), and the per-level tiered runner
(infer/device.staged_apply).

Load-bearing invariants:
* halo_map(f, x, grid, halo, ref) == f(x) BIT-EXACTLY on every pixel further
  than `halo` from the frame border, for any conv segment f with receptive
  radius <= halo;
* halo_exchange reconstructs overlapping patchification exactly (it is the
  single-host twin of the ppermute exchange in infer/sharded.py);
* apply(final_stale_halo=k) == apply() bitwise on all retained pixels — the
  shrink only drops ring cells the pipeline suffix never reads.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fisr_tpu.infer.device import run_level_tiled, staged_apply, tiled_apply
from fisr_tpu.infer.halo import halo_exchange, halo_map, patchify, unpatchify
from fisr_tpu.models import fisrnet
from fisr_tpu.ops.conv import (F32, dec_level, enc_level, init_conv,
                               init_res_block)


def _enc_params(rng, cin, c):
    return {"conv_in": init_conv(rng, 3, cin, c),
            "res0": init_res_block(rng, c), "res1": init_res_block(rng, c)}


def _dec_params(rng, cin, c):
    return {"resize": init_conv(rng, 3, cin, c),
            "conv_in": init_conv(rng, 3, 2 * c, c),
            "res0": init_res_block(rng, c), "res1": init_res_block(rng, c)}


def test_halo_map_enc_interior_exact():
    p = _enc_params(jax.random.PRNGKey(0), 8, 16)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 96, 8), jnp.float32)
    full_pool, full_skip = enc_level(p, x, F32)
    h = 6  # enc receptive radius 5, rounded even for the maxpool grid
    t_pool, t_skip = halo_map(lambda t: enc_level(p, t, F32), x,
                              (2, 2), h, (64, 96))
    np.testing.assert_array_equal(
        np.asarray(t_skip)[:, h:-h, h:-h], np.asarray(full_skip)[:, h:-h, h:-h])
    hp = h // 2
    np.testing.assert_array_equal(
        np.asarray(t_pool)[:, hp:-hp, hp:-hp],
        np.asarray(full_pool)[:, hp:-hp, hp:-hp])


def test_halo_map_dec_two_scale_inputs_interior_exact():
    """dec stage consumes (x at 1/2 ref scale, skip at ref scale)."""
    p = _dec_params(jax.random.PRNGKey(2), 24, 12)
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 32, 48, 24), jnp.float32)
    skip = jax.random.normal(jax.random.PRNGKey(4), (1, 64, 96, 12), jnp.float32)
    full = dec_level(p, x, skip, (64, 96), F32)

    def f(t):
        xx, ss = t
        return dec_level(p, xx, ss, (xx.shape[1] * 2, xx.shape[2] * 2), F32)

    h = 8  # x2 upsample 2 + resize conv 1 + conv_in 1 + two res blocks 4
    tiled = halo_map(f, (x, skip), (2, 2), h, (64, 96))
    np.testing.assert_array_equal(
        np.asarray(tiled)[:, h:-h, h:-h], np.asarray(full)[:, h:-h, h:-h])


def test_halo_map_heads_upscaling_output_interior_exact():
    params = fisrnet.init_params(jax.random.PRNGKey(5))
    lv = params["level_1"]
    n = jax.random.normal(jax.random.PRNGKey(6), (1, 64, 96, 64), jnp.float32)
    full = fisrnet.apply_heads(lv, n, 2, F32)
    h = 6
    tiled = halo_map(lambda t: fisrnet.apply_heads(lv, t, 2, F32),
                     n, (2, 2), h, (64, 96))
    assert tiled.shape == full.shape == (1, 128, 192, 9)
    m = 2 * h
    np.testing.assert_array_equal(
        np.asarray(tiled)[:, m:-m, m:-m], np.asarray(full)[:, m:-m, m:-m])


def test_halo_map_rejects_bad_geometry():
    x = jnp.zeros((1, 64, 96, 4))
    with pytest.raises(ValueError):
        halo_map(lambda t: t, x, (3, 2), 4, (64, 96))  # 3 doesn't divide 64


def test_halo_exchange_reconstructs_overlapping_slices():
    """halo_exchange(cores) must equal re-slicing the zero-padded canvas
    with overlap — pure data movement, exact, corners included."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 24, 36, 5)), jnp.float32)
    grid, halo = (3, 2), 4
    cores = patchify(x, grid)
    got = np.asarray(halo_exchange(cores, grid, 2, halo))
    xp = np.pad(np.asarray(x), ((0, 0), (halo, halo), (halo, halo), (0, 0)))
    sh, sw = 24 // 3, 36 // 2
    k = 0
    for i in range(3):
        for j in range(2):
            want = xp[:, i * sh : (i + 1) * sh + 2 * halo,
                      j * sw : (j + 1) * sw + 2 * halo]
            np.testing.assert_array_equal(got[k * 2 : (k + 1) * 2], want)
            k += 1


def test_patchify_roundtrip():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(3, 16, 24, 7)), jnp.float32)
    y = unpatchify(patchify(x, (2, 3)), (2, 3), 3)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x))


def test_up_conv2x_interior_matches_composition():
    """Folded subpixel upsample-conv == upsample2x + conv3x3 everywhere but
    the documented 1-px top/left and 2-px bottom/right border."""
    from fisr_tpu.ops.conv import conv2d, init_conv, up_conv2x
    from fisr_tpu.ops.resize import upsample2x_bilinear

    p = init_conv(jax.random.PRNGKey(20), 3, 8, 12)
    x = jax.random.normal(jax.random.PRNGKey(21), (2, 16, 24, 8), jnp.float32)
    want = np.asarray(conv2d(p, upsample2x_bilinear(x), F32))
    got = np.asarray(up_conv2x(p, x, F32))
    np.testing.assert_allclose(got[:, 1:-2, 1:-2], want[:, 1:-2, 1:-2],
                               rtol=1e-5, atol=1e-5)


def test_stale_halo_shrink_is_bit_exact():
    """apply(final_stale_halo=32) must reproduce the plain apply bitwise on
    every retained pixel — the shrink removes only ring cells whose values
    never reach the retained output (tail receptive radius argument,
    models/fisrnet.apply_level)."""
    params = fisrnet.init_params(jax.random.PRNGKey(13))
    x = jax.random.uniform(jax.random.PRNGKey(14), (1, 160, 160, 29), jnp.float32)
    full = np.asarray(fisrnet.apply(params, x, 2, F32)[2])
    shr = np.asarray(fisrnet.apply(params, x, 2, F32, final_stale_halo=32)[2])
    np.testing.assert_array_equal(shr[:, 16:-16, 16:-16],
                                  full[:, 64:-64, 64:-64])


@pytest.mark.slow
def test_tiled_apply_shrink_matches_host_padded_tiling():
    """device.tiled_apply (in-jit stale-halo shrink + level-3 fast upsample)
    must equal the host-staged padded TiledRunner, which carries the full
    ring through the exact composition. Contractive weights (0.15x glorot)
    keep fp-reassociation noise from the folded upconv kernel from being
    amplified by the random U-Net, so the tolerance stays tight enough to
    catch any structural leak of the fast-path border deviation."""
    from fisr_tpu.infer.tiled import TiledRunner

    params = fisrnet.init_params(jax.random.PRNGKey(15))
    params = jax.tree_util.tree_map(lambda t: t * 0.15, params)
    rng = np.random.default_rng(16)
    inp = rng.uniform(size=(1, 128, 128, 29)).astype(np.float32)
    want = TiledRunner(params, grid=(2, 2), boundary=32, mode="padded")(inp)
    got = np.asarray(tiled_apply(params, jnp.asarray(inp), (2, 2), 32, 2, F32))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_run_level_tiled_grid_1x1_is_exact():
    params = fisrnet.init_params(jax.random.PRNGKey(7))
    x = jax.random.uniform(jax.random.PRNGKey(8), (1, 64, 96, 29), jnp.float32)
    ref = fisrnet.apply_level(params["level_1"], x, 2, F32)
    out = run_level_tiled(params["level_1"], x, (1, 1), 8, 2, F32)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


@pytest.mark.slow
def test_run_level_tiled_close_to_full_frame():
    """Tiled level vs full-frame: agreement within the halo-truncation noise
    of the reference tiling scheme itself. Contractive weights (trained nets
    are contractive in this sense) keep the seam/edge truncation bands
    narrow; at raw glorot scale the random U-Net amplifies and the
    legitimate truncation would smear across this small frame."""
    params = fisrnet.init_params(jax.random.PRNGKey(9))
    params = jax.tree_util.tree_map(lambda t: t * 0.15, params)
    x = jax.random.uniform(jax.random.PRNGKey(10), (1, 128, 192, 38), jnp.float32)
    ref = np.asarray(fisrnet.apply_level(params["level_3"], x, 2, F32))
    out = np.asarray(run_level_tiled(params["level_3"], x, (2, 2), 32, 2, F32))
    assert out.shape == ref.shape
    m = 32
    np.testing.assert_allclose(out[:, m:-m, m:-m], ref[:, m:-m, m:-m],
                               rtol=1e-3, atol=1e-3)


def test_staged_apply_shapes_and_full_frame_levels_exact():
    params = fisrnet.init_params(jax.random.PRNGKey(9))
    img = jax.random.uniform(jax.random.PRNGKey(10), (1, 128, 256, 29), jnp.float32)
    plans = {"level_1": (1, 1), "level_2": (1, 1), "level_3": (2, 2)}
    ref = fisrnet.apply(params, img, 2, F32)
    out = staged_apply(params, img, plans, 32, 2, F32)
    for o, r in zip(out, ref):
        assert o.shape == r.shape
        assert np.isfinite(np.asarray(o)).all()
    # levels 1/2 run full-frame -> bitwise equal to the reference stack
    np.testing.assert_array_equal(np.asarray(out[0]), np.asarray(ref[0]))
    np.testing.assert_array_equal(np.asarray(out[1]), np.asarray(ref[1]))
