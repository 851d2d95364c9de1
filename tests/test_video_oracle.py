"""End-to-end video-pipeline parity vs the reference's OWN run.

Fixtures captured by scripts/capture_video_oracle.py: the reference's
flow -> .flo -> warp -> .mat -> FISRnet -> PNG chain executed VERBATIM
(FISR_for_video_pwcnet_predict_from_img_test.py:84-147,
FISR_for_video_warp_img_with_flo.py:97-151, FISRnet.py:937-1084) on
deterministic weights. These pin the GLUE between the individually-pinned
stages — YUV<->RGB chains, the x2-upscale flow trick, bidirectional pair
ordering, the 29-channel window assembly with its /96/2 + /255 + clips,
the get_HW_boundary/trim_patch_boundary stitch loop, and the on-disk
.flo/.mat contracts (written/read by the reference's own functions in the
capture).

Two chains are captured: the true e2e chain (the reference's own tiny
predicted flows), and an amplified-flow chain (same verbatim warp+FISR
stages on flows scaled to ~6 px) so that sign/axis-convention bugs in our
warp/assembly glue cannot hide inside a near-identity warp.
"""

import os
import tempfile

import numpy as np
import pytest

import jax
import jax.numpy as jnp

FIX = os.path.join(os.path.dirname(__file__), "fixtures", "tf_oracle")

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(FIX, "video_manifest.json")),
    reason="video oracle fixtures not captured")

FLOW_NORM = 96.0 * 2.0  # FISRnet.py:1016


@pytest.fixture(scope="module")
def oracle():
    import json

    with open(os.path.join(FIX, "video_manifest.json")) as f:
        man = json.load(f)
    z = np.load(os.path.join(FIX, "video_pipeline.npz"))
    return man, z


@pytest.fixture(scope="module")
def params(oracle):
    """Converter-mapped deterministic weights, digest-checked against the
    capture (drift must fail loudly, not as a numeric mismatch)."""
    from fisr_tpu.convert.oracle import deterministic_tf_vars, tf_vars_digest
    from fisr_tpu.convert.tf_import import (convert_fisrnet, convert_pwcnet,
                                            export_fisrnet, export_pwcnet)
    from fisr_tpu.models import fisrnet, pwcnet

    man, _ = oracle
    pwc_shapes = {n: a.shape for n, a in export_pwcnet(
        pwcnet.init_params(jax.random.PRNGKey(0))).items()}
    fisr_shapes = {n: a.shape for n, a in export_fisrnet(
        fisrnet.init_params(jax.random.PRNGKey(0))).items()}
    pwc_vars = deterministic_tf_vars(pwc_shapes)
    fisr_vars = deterministic_tf_vars(fisr_shapes)
    assert tf_vars_digest(pwc_vars) == man["pwc_weights_digest"]
    assert tf_vars_digest(fisr_vars) == man["fisr_weights_digest"]
    return convert_fisrnet(fisr_vars), convert_pwcnet(pwc_vars)


def test_flo_reader_reads_reference_written_bytes(oracle):
    """Our 5-dim .flo reader on the file the reference's OWN write_flow
    produced during the capture (FISR_for_video_pwcnet_predict_from_img_
    test.py:57-81): bit-exact."""
    from fisr_tpu.data.flo import read_flo_5dim

    _, z = oracle
    got = read_flo_5dim(os.path.join(FIX, "video_ref.flo"))
    np.testing.assert_array_equal(got, z["flows"])


def test_warp_stage_matches_reference(oracle):
    """make_warp_fn vs the reference's verbatim warp stage (YUV2RGB ->
    cv2.remap at flow*0.5 -> RGB2YUV, read back through its own .mat
    reader), on ~6 px flows. cv2 quantizes sample coordinates to 1/32 px
    (INTER_BITS=5), so the bound is gradient/32: measured max 0.485 /
    mean 0.067 on [0,255] values; bounds ~3x above."""
    from fisr_tpu.infer.video import make_warp_fn

    _, z = oracle
    frames = z["frames"].astype(np.float32)
    warps = np.asarray(make_warp_fn()(
        jnp.asarray(frames[:-1]), jnp.asarray(frames[1:]),
        jnp.asarray(z["flows_amp"])))
    ref = z["warps_amp_norm"] * 255.0
    d = np.abs(warps - ref)
    assert d.max() < 1.5, d.max()
    assert d.mean() < 0.25, d.mean()


def test_window_assembly_fullframe_matches_reference(params, oracle):
    """THE assembly pin: our 29-channel window assembly + full-frame
    FISRnet vs the reference's verbatim composition + patch/stitch loop
    (amplified chain; at this size the reference's 32 px halo covers the
    full extent, so patched == full-frame to f32 noise). Measured diff
    4.6e-7; bound ~20x above."""
    from fisr_tpu.infer.video import make_fisr_window_fn

    fisr_params, _ = params
    _, z = oracle
    frames = z["frames"].astype(np.float32)
    fn = make_fisr_window_fn(fisr_grid=None)
    for fr in range(2):
        pred = np.asarray(fn(
            fisr_params, jnp.asarray(frames[None, fr:fr + 3]),
            (jnp.asarray(z["flows_amp"][fr:fr + 1]),
             jnp.asarray(z["warps_amp_norm"][fr:fr + 1] * 255.0)),
            (jnp.asarray(z["flows_amp"][fr + 1:fr + 2]),
             jnp.asarray(z["warps_amp_norm"][fr + 1:fr + 2] * 255.0))))[0]
        np.testing.assert_allclose(pred, z["stitched_amp"][fr],
                                   atol=1e-5, rtol=0,
                                   err_msg=f"window {fr}")


def test_tiled_runner_exact_matches_reference_stitch(params, oracle):
    """TiledRunner mode='exact' (the staged path's engine, an exact port
    of get_HW_boundary/trim_patch_boundary) vs the reference's OWN patch
    loop run: measured 2.4e-8; bound ~40x above. This is the direct pin of
    the halo/stitch math against the other implementation's output."""
    from fisr_tpu.infer.tiled import TiledRunner
    from fisr_tpu.ops.conv import F32

    fisr_params, _ = params
    _, z = oracle
    frames = z["frames"].astype(np.float32)
    h, w = frames.shape[1], frames.shape[2]
    runner = TiledRunner(fisr_params, grid=(1, 2), boundary=32, policy=F32,
                         mode="exact")
    flows, warps = z["flows_amp"], z["warps_amp_norm"]
    for fr in range(2):
        img = frames[fr:fr + 3].transpose(1, 2, 0, 3).reshape(h, w, 9)
        img = np.clip(img / 255.0, 0, 1)[None]
        fl = np.concatenate([flows[fr], flows[fr + 1]], 0)
        fl = fl.transpose(1, 2, 0, 3).reshape(h, w, 8)
        fl = np.clip(fl / FLOW_NORM, -1, 1)[None]
        wp = np.concatenate([warps[fr], warps[fr + 1]], 0)
        wp = wp.transpose(1, 2, 0, 3).reshape(h, w, 12)
        wp = np.clip(wp, 0, 1)[None]
        inp = np.concatenate([img, fl, wp], 3).astype(np.float32)
        pred = np.clip(np.asarray(runner(inp))[0], 0, 1)
        np.testing.assert_allclose(pred, z["stitched_amp"][fr],
                                   atol=1e-6, rtol=0,
                                   err_msg=f"window {fr}")


def test_injit_tiling_deviation_is_bounded(params, oracle):
    """The in-jit padded tiling (the opt-in throughput mode) vs the
    reference stitch: its outer-edge halo fill is a documented deviation
    (PARITY.md 'fused-grid tiling'); measured max 1.33e-2 at the frame
    edges, 1.6e-4 at the interior seam. This bounds the trade so a
    regression (e.g. a halo-exchange bug) fails loudly."""
    from fisr_tpu.infer.video import make_fisr_window_fn

    fisr_params, _ = params
    _, z = oracle
    frames = z["frames"].astype(np.float32)
    fn = make_fisr_window_fn(fisr_grid=(1, 2))
    pred = np.asarray(fn(
        fisr_params, jnp.asarray(frames[None, 0:3]),
        (jnp.asarray(z["flows_amp"][0:1]),
         jnp.asarray(z["warps_amp_norm"][0:1] * 255.0)),
        (jnp.asarray(z["flows_amp"][1:2]),
         jnp.asarray(z["warps_amp_norm"][1:2] * 255.0))))[0]
    d = np.abs(pred - z["stitched_amp"][0])
    assert d.max() < 0.05, d.max()
    # interior (>=48 px from every output edge) stays tight
    assert d[48:-48, 48:-48].max() < 2e-3, d[48:-48, 48:-48].max()


def test_pad_case_flow_matches_reference(params, oracle):
    """The /255 + zero-pad-to-64 + crop-back glue (adapt_x /
    postproc_y_hat_test, model_pwcnet.py:371-409,449-463) on a
    non-64-multiple pair, vs the reference's predict_from_img_pairs run:
    same math both sides, measured 2e-8; bound ~50x above."""
    from fisr_tpu.models import pwcnet

    _, pwc_params = params
    _, z = oracle
    x1 = z["pad_img1"][None].astype(np.float32) / 255.0
    x2 = z["pad_img2"][None].astype(np.float32) / 255.0
    h, w = x1.shape[1], x1.shape[2]
    ph, pw = (-h) % 64, (-w) % 64
    pad = ((0, 0), (0, ph), (0, pw), (0, 0))
    cfg = pwcnet.PWCNetConfig(cost_volume_impl="xla")
    pred, _ = jax.jit(lambda p, a, b: pwcnet.apply(p, a, b, cfg))(
        pwc_params, jnp.pad(jnp.asarray(x1), pad),
        jnp.pad(jnp.asarray(x2), pad))
    np.testing.assert_allclose(np.asarray(pred)[0, :h, :w], z["pad_flow"],
                               atol=1e-6, rtol=0)


@pytest.mark.slow
def test_flow_stage_glue(params, oracle):
    """Our full flow stage (YUV->RGB, x2-upscale trick, bidirectional
    batch, downscale + /2) vs the reference's verbatim stage. Both sides
    use different interpolators by design (we: TF1-legacy bilinear on
    device; reference: skimage-resize [cv2 in the capture] + uint8
    quantization), so the bound is loose — but a convention bug
    (fwd/bwd swap, (u,v) vs (dy,dx), missing /2) would produce
    O(2x max|flow|) error, far above it. Measured: max diff 4.1e-3 on
    flows of |max| 4.3e-2 (~10%, interpolator noise)."""
    from fisr_tpu.infer.video import make_flow_fn

    _, pwc_params = params
    _, z = oracle
    frames = z["frames"].astype(np.float32)
    flows = np.asarray(make_flow_fn(upscale=2)(
        pwc_params, jnp.asarray(frames[:-1]), jnp.asarray(frames[1:])))
    ref = z["flows"]
    d = np.abs(flows - ref)
    peak = np.abs(ref).max()
    assert d.max() < 0.012, d.max()
    assert d.max() < 0.35 * peak, (d.max(), peak)


@pytest.mark.slow
def test_full_staged_pipeline_matches_reference_frames(params, oracle):
    """The TRUE e2e pin: run_video_pipeline (staged, each side computing
    its OWN flows) vs the reference chain's final PNG frames. Measured:
    max 1 u8 count, 99.99% bit-exact."""
    from fisr_tpu.data.png_io import write_png
    from fisr_tpu.infer.video import run_video_pipeline

    fisr_params, pwc_params = params
    _, z = oracle
    with tempfile.TemporaryDirectory() as td:
        for i, fr in enumerate(z["frames"]):
            write_png(fr, os.path.join(td, f"fr_{i:05d}.png"))
        run_video_pipeline(fisr_params, pwc_params, td, grid=(1, 2),
                           boundary=32, verbose=False)
        from PIL import Image

        ours = np.stack([
            np.array(Image.open(os.path.join(td, "FISR_frames",
                                             f"pred_YUV_{i}.png")))
            for i in range(len(z["final_yuv"]))])
    d = np.abs(ours.astype(np.int32) - z["final_yuv"].astype(np.int32))
    assert d.max() <= 1, d.max()
    assert (d == 0).mean() > 0.995, (d == 0).mean()
