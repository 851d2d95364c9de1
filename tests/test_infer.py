"""Tiled + halo-sharded inference: parity against the reference tiling logic
and against each other, on the 8-virtual-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fisr_tpu.core.mesh import make_mesh
from fisr_tpu.infer.sharded import make_sharded_runner
from fisr_tpu.infer.tiled import TiledRunner, get_hw_boundary, trim_patch_boundary
from fisr_tpu.models import fisrnet


@pytest.fixture(scope="module")
def params():
    return fisrnet.init_params(jax.random.PRNGKey(0))


def ref_tiled_loop(params, inp, grid, boundary, sf=2):
    """Direct port of the reference's sequential per-patch loop
    (FISRnet.py:846-880) as ground truth for the exact mode."""
    b, h, w, _ = inp.shape
    s_h, s_w = h // grid[0], w // grid[1]
    out = np.zeros((b, h * sf, w * sf, 9), np.float32)
    for p in range(grid[0] * grid[1]):
        p_h, p_w = p // grid[1], p % grid[1]
        hl, hh, wl, wh, _, _ = get_hw_boundary(boundary, h, w, p_h, s_h, p_w, s_w)
        pred = np.asarray(fisrnet.apply(params, jnp.asarray(inp[:, hl:hh, wl:wh]))[2],
                          np.float32)
        pred = trim_patch_boundary(pred, boundary, h, w, p_h, s_h, p_w, s_w, sf)
        out[:, p_h * s_h * sf : (p_h + 1) * s_h * sf,
            p_w * s_w * sf : (p_w + 1) * s_w * sf] = pred
    return out


def test_halo_math_exact_port():
    # 2x2 grid on 128x128: every patch is a frame corner -> one-sided halos
    for p_h in range(2):
        for p_w in range(2):
            hl, hh, wl, wh, ah, aw = get_hw_boundary(32, 128, 128, p_h, 64, p_w, 64)
            assert ah == 32 and aw == 32
            assert hh - hl == 96 and wh - wl == 96
    # 1x1 grid: no halo anywhere
    assert get_hw_boundary(32, 64, 64, 0, 64, 0, 64) == (0, 64, 0, 64, 0, 0)
    # interior patch of a 4x4 grid gets two-sided halos
    _, _, _, _, ah, aw = get_hw_boundary(8, 256, 256, 1, 64, 2, 64)
    assert ah == 16 and aw == 16


@pytest.mark.slow
def test_tiled_exact_matches_reference_loop(params):
    # patch sizes must stay multiples of 32 (3 maxpools at the 1/4-scale
    # level), same constraint the reference enforces by cropping
    rng = np.random.default_rng(0)
    inp = rng.uniform(size=(1, 128, 128, 29)).astype(np.float32)
    runner = TiledRunner(params, grid=(2, 2), boundary=32)
    got = runner(inp)
    want = ref_tiled_loop(params, inp, (2, 2), 32)
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=6e-3)


def test_tiled_rejects_boundary_larger_than_patch(params):
    """An interior patch whose low halo clips at the frame edge would
    break the equal-crop grouping (concat shape mismatch) — the guard
    must fail clearly up front."""
    inp = np.zeros((1, 128, 128, 29), np.float32)
    runner = TiledRunner(params, grid=(4, 4), boundary=64)
    with pytest.raises(ValueError, match="boundary"):
        runner(inp)
    # grid (1,1): no interior patches, any boundary is safe (clips at edges)
    TiledRunner(params, grid=(1, 1), boundary=64)(
        np.zeros((1, 32, 32, 29), np.float32))


def test_tiled_single_patch_equals_direct_apply(params):
    rng = np.random.default_rng(1)
    inp = rng.uniform(size=(1, 32, 32, 29)).astype(np.float32)
    runner = TiledRunner(params, grid=(1, 1), boundary=32)
    got = runner(inp)
    want = np.asarray(fisrnet.apply(params, jnp.asarray(inp))[2], np.float32)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_sharded_matches_padded_tiling(params):
    """The ppermute halo exchange must be math-identical to single-device
    zero-padded tiling with a (1, N) grid."""
    n = 8
    mesh = make_mesh((1, n))
    rng = np.random.default_rng(2)
    # width 8*32 = 256 -> 32 columns per device, halo 32 (keeps every local
    # extended strip a multiple of 32)
    inp = rng.uniform(size=(1, 32, 256, 29)).astype(np.float32)
    sharded = make_sharded_runner(mesh, boundary=32)
    got = np.asarray(sharded(params, jnp.asarray(inp)), np.float32)

    runner = TiledRunner(params, grid=(1, n), boundary=32, mode="padded")
    want = runner(inp)
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=6e-3)
    assert got.shape == (1, 64, 512, 9)


@pytest.mark.slow
def test_tiled_exact_interior_patches(params):
    """Grids beyond the reference's 2x2: interior patches carry two-sided
    halos, producing multiple shape groups (corner/edge/interior)."""
    rng = np.random.default_rng(5)
    inp = rng.uniform(size=(1, 128, 256, 29)).astype(np.float32)
    runner = TiledRunner(params, grid=(2, 4), boundary=32)
    got = runner(inp)
    want = ref_tiled_loop(params, inp, (2, 4), 32)
    # conv reduction-order noise through the 3-level cascade (batched vs
    # per-patch): a handful of elements land just past the tighter tolerance
    np.testing.assert_allclose(got, want, rtol=1e-2, atol=5e-3)


def test_best_grid_rules():
    """Largest grid <= target with 32-multiple patches; non-32 frames get an
    actionable error instead of 'max() arg is an empty sequence'."""
    from fisr_tpu.infer.device import best_grid

    assert best_grid(1024, 1920) == (4, 6)
    assert best_grid(1056, 1920) == (3, 6)  # 1056 = 32*33 admits no (4,x)
    assert best_grid(32, 32) == (1, 1)
    with pytest.raises(ValueError, match="32-multiples"):
        best_grid(1080, 1920)


@pytest.mark.slow
def test_tiled_apply_padded_equals_manual_pad(params):
    """tiled_apply_padded == edge-pad -> tiled_apply -> crop (construction
    equality pins the wiring the video window stage rides through
    resolve_fisr_plan), and pads (0,0) short-circuits to tiled_apply."""
    from fisr_tpu.infer.device import tiled_apply, tiled_apply_padded
    from fisr_tpu.ops.conv import F32

    rng = np.random.default_rng(7)
    # 96 rows admit only gh in {1,3}; a 32-row pad unlocks (2, 3)
    inp = jnp.asarray(rng.uniform(size=(1, 96, 96, 29)).astype(np.float32))
    got = np.asarray(tiled_apply_padded(params, inp, (2, 3), (32, 0),
                                        32, 2, F32))
    xp = jnp.pad(inp, ((0, 0), (0, 32), (0, 0), (0, 0)), mode="edge")
    want = np.asarray(tiled_apply(params, xp, (2, 3), 32, 2, F32))[:, :192]
    assert got.shape == (1, 192, 192, 9)
    np.testing.assert_array_equal(got, want)

    same = np.asarray(tiled_apply_padded(params, inp, (3, 3), (0, 0),
                                         32, 2, F32))
    ref = np.asarray(tiled_apply(params, inp, (3, 3), 32, 2, F32))
    np.testing.assert_array_equal(same, ref)


@pytest.mark.slow
def test_tiled_apply_padded_deviation_vs_unpadded(params):
    """The padded plan's deviation CLASS vs a pad-free tiling of the same
    frame: (2,3)+32-row pad vs (1,3) differ only through halo truncation /
    the zero ring at the changed seams — NOT through a structural break
    (trim misalignment, wrong crop). At this 96-px frame the model's
    receptive field (~500 px at output scale) dwarfs the frame, so the
    band covers everything and the rms ratio is measured at ~0.10 with
    contractive (x0.15) weights — the pin is that a structural bug (e.g.
    cropping the wrong rows after the pad) would blow it to O(1), while
    the mechanism's bit-exactness is pinned separately by
    test_tiled_apply_padded_equals_manual_pad and the trained-weights
    quality number lives in PARITY.md §7 (36.8 dB at 1080p, shrinking
    with convergence)."""
    from fisr_tpu.infer.device import tiled_apply, tiled_apply_padded
    from fisr_tpu.ops.conv import F32

    cparams = jax.tree_util.tree_map(lambda t: t * 0.15, params)
    rng = np.random.default_rng(8)
    inp = jnp.asarray(rng.uniform(size=(1, 96, 96, 29)).astype(np.float32))
    padded = np.asarray(tiled_apply_padded(cparams, inp, (2, 3), (32, 0),
                                           32, 2, F32))
    unpadded = np.asarray(tiled_apply(cparams, inp, (1, 3), 32, 2, F32))
    assert padded.shape == unpadded.shape == (1, 192, 192, 9)

    def rms(a):
        return float(np.sqrt(np.mean(np.square(a))))

    ratio = rms(padded - unpadded) / rms(unpadded)
    # measured 0.096 on CPU f32; structural break = O(1)
    assert ratio < 0.35, ratio
