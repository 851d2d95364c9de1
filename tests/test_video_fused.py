"""Fused single-program video step == the staged flow->warp->FISRnet path."""

import jax
import jax.numpy as jnp
import numpy as np

from fisr_tpu.infer.video import make_flow_fn, make_fused_video_step, make_warp_fn
from fisr_tpu.models import fisrnet, pwcnet
import pytest

CFG = pwcnet.PWCNetConfig(pyr_lvls=4, flow_pred_lvl=2, search_range=2,
                          cost_volume_impl="xla")


@pytest.mark.slow
def test_fused_step_matches_staged_pipeline():
    fisr_params = fisrnet.init_params(jax.random.PRNGKey(0))
    pwc_params = pwcnet.init_params(jax.random.PRNGKey(1), CFG)
    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.uniform(0, 255, size=(1, 3, 32, 32, 3)).astype(np.float32))

    fused = make_fused_video_step(CFG)
    out = np.asarray(fused(fisr_params, pwc_params, frames))
    assert out.shape == (1, 64, 64, 9)
    assert np.isfinite(out).all()
    assert out.min() >= 0.0 and out.max() <= 1.0

    # staged: flow -> warp -> manual input assembly -> fisrnet
    flow_fn = make_flow_fn(CFG)
    warp_fn = make_warp_fn()
    f0, f1, f2 = frames[:, 0], frames[:, 1], frames[:, 2]
    fl01 = flow_fn(pwc_params, f0, f1)
    fl12 = flow_fn(pwc_params, f1, f2)
    wp01 = warp_fn(f0, f1, fl01)
    wp12 = warp_fn(f1, f2, fl12)
    img = jnp.clip(jnp.concatenate([f0, f1, f2], -1) / 255.0, 0, 1)
    fl = jnp.clip(jnp.concatenate([fl01[:, 0], fl01[:, 1], fl12[:, 0], fl12[:, 1]], -1)
                  / 192.0, -1, 1)
    wp = jnp.clip(jnp.concatenate([wp01[:, 0], wp01[:, 1], wp12[:, 0], wp12[:, 1]], -1)
                  / 255.0, 0, 1)
    inp = jnp.concatenate([img, fl, wp], axis=-1)
    want = np.clip(np.asarray(fisrnet.apply(fisr_params, inp)[2], np.float32), 0, 1)
    np.testing.assert_allclose(out, want, rtol=5e-3, atol=2e-3)


def test_flow_fn_shapes_and_direction():
    pwc_params = pwcnet.init_params(jax.random.PRNGKey(2), CFG)
    flow_fn = make_flow_fn(CFG)
    rng = np.random.default_rng(1)
    y1 = jnp.asarray(rng.uniform(0, 255, size=(1, 24, 40, 3)).astype(np.float32))
    y2 = jnp.asarray(rng.uniform(0, 255, size=(1, 24, 40, 3)).astype(np.float32))
    flows = flow_fn(pwc_params, y1, y2)
    assert flows.shape == (1, 2, 24, 40, 2)
    assert np.isfinite(np.asarray(flows)).all()


@pytest.mark.slow
def test_pair_cached_window_matches_fused_step():
    """make_pair_fn + make_fisr_window_fn (the streaming loop's pair-cached
    decomposition) == the monolithic make_fused_video_step on the same
    window; the shared pair of adjacent windows is literally the same array."""
    from fisr_tpu.infer.video import make_fisr_window_fn, make_pair_fn

    fisr_params = fisrnet.init_params(jax.random.PRNGKey(0))
    pwc_params = pwcnet.init_params(jax.random.PRNGKey(1), CFG)
    rng = np.random.default_rng(7)
    frames = jnp.asarray(rng.uniform(0, 255, size=(1, 4, 32, 32, 3)).astype(np.float32))

    fused = make_fused_video_step(CFG)
    pair_fn = make_pair_fn(CFG)
    window_fn = make_fisr_window_fn()

    pairs = [pair_fn(pwc_params, frames[:, i], frames[:, i + 1])
             for i in range(3)]
    for fr in range(2):
        want = np.asarray(fused(fisr_params, pwc_params,
                                frames[:, fr : fr + 3]))
        got = np.asarray(window_fn(fisr_params, frames[:, fr : fr + 3],
                                   pairs[fr], pairs[fr + 1]))
        # same math, different jit program boundaries: XLA fuses each program
        # differently, and the last-ulp f32 drift in the pair stage amplifies
        # through the 48M-param FISRnet (measured max |diff| 1.7e-4 on 0.5%
        # of pixels) — atol 1e-3 still pins structural equivalence while the
        # sibling pipeline test pins the u8 output contract at +-1 count
        np.testing.assert_allclose(got, want, atol=1e-3)


@pytest.mark.slow
def test_pipeline_pair_cached_loop_matches_per_window(tmp_path):
    """run_video_pipeline(fused=True) over 4 frames (2 windows, 1 shared
    pair) writes the same pixels as naive per-window fused steps."""
    from fisr_tpu.data.png_io import read_png
    from fisr_tpu.data.synth import write_synthetic_video_folder
    from fisr_tpu.infer.video import run_video_pipeline

    folder = write_synthetic_video_folder(str(tmp_path / "vid"), n_frames=4,
                                          h=32, w=32)
    fisr_params = fisrnet.init_params(jax.random.PRNGKey(0))
    pwc_params = pwcnet.init_params(jax.random.PRNGKey(1))
    outs = run_video_pipeline(fisr_params, pwc_params, folder, fused=True,
                              verbose=False)
    assert len(outs) == 6  # 2 windows x 3 output frames

    import glob, os

    frames = np.stack([read_png(p) for p in sorted(
        glob.glob(os.path.join(folder, "*.png"))) if "FISR_frames" not in p])
    frames = jnp.asarray(frames[None].astype(np.float32))
    step = make_fused_video_step()
    for fr in range(2):
        want = np.uint8(np.asarray(
            step(fisr_params, pwc_params, frames[:, fr : fr + 3])[0]) * 255)
        want_split = want.reshape(32 * 2, 32 * 2, 3, 3).transpose(2, 0, 1, 3)
        # overlapping windows both write index 2*fr+2 (window fr's 3rd output
        # = window fr+1's 1st, predicted from DIFFERENT inputs); the pipeline
        # keeps the last writer — so window 0 only owns files 0 and 1
        owned = range(3) if fr == 1 else range(2)
        for s in owned:
            got = read_png(os.path.join(
                folder, "FISR_frames", f"pred_YUV_{fr * 2 + s}.png"))
            # different jit programs may fuse differently -> last-ulp f32
            # shifts can flip a knife-edge u8 rounding; allow +-1 count
            diff = np.abs(got.astype(np.int16) -
                          want_split[s].astype(np.int16))
            assert diff.max() <= 1, (fr, s, diff.max())


@pytest.mark.slow
def test_flow_scale_fast_mode(tmp_path):
    """--flow_scale 1 (explicit fast mode) threads through the pipeline:
    the flow stage runs at native resolution instead of the reference's
    x2-upscale trick, so the flows (and the frames conditioned on them)
    differ from parity mode, while shapes and units stay identical."""
    from fisr_tpu.infer.video import make_pair_fn

    pwc_params = pwcnet.init_params(jax.random.PRNGKey(1))
    rng = np.random.default_rng(5)
    y1 = jnp.asarray(rng.uniform(0, 255, size=(1, 32, 32, 3)), jnp.float32)
    y2 = jnp.asarray(rng.uniform(0, 255, size=(1, 32, 32, 3)), jnp.float32)

    f_parity, w_parity = make_pair_fn(upscale=2)(pwc_params, y1, y2)
    f_fast, w_fast = make_pair_fn(upscale=1)(pwc_params, y1, y2)
    assert f_fast.shape == f_parity.shape == (1, 2, 32, 32, 2)
    assert w_fast.shape == w_parity.shape == (1, 2, 32, 32, 3)
    # both are finite, native-resolution pixel-unit flows — but computed at
    # different scales, so they must not be numerically identical
    assert np.isfinite(np.asarray(f_fast, np.float32)).all()
    assert not np.allclose(np.asarray(f_fast, np.float32),
                           np.asarray(f_parity, np.float32), atol=1e-3)


def test_fused_cli_video_phase(tmp_path):
    from fisr_tpu.cli.main import main as cli_main
    from fisr_tpu.data.synth import write_synthetic_video_folder
    import glob, os

    folder = write_synthetic_video_folder(str(tmp_path / "vid"), n_frames=3,
                                          h=32, w=32)
    cli_main([
        "--phase", "FISR_for_video", "--fused", "--compute_dtype", "float32",
        "--frame_folder_path", folder, "--FISR_input_size", "32", "32",
        "--frame_num", "3",
        "--checkpoint_dir", str(tmp_path / "ck"),
        "--log_dir", str(tmp_path / "log"),
        "--text_dir", str(tmp_path / "txt"),
        "--test_img_dir", str(tmp_path / "imgs"),
    ])
    outs = glob.glob(os.path.join(folder, "FISR_frames", "pred_[0-9]*.png"))
    assert len(outs) == 3
