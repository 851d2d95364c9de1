"""FISR_for_video: joint 2x frame-rate + 2x resolution upscaling of a frame
folder — flow computation, middle-frame warping, and FISRnet inference.

The reference runs this as three sequential TF sessions handing off through
files on disk (main.py:207-235): PWC-Net -> custom .flo -> cv2 warping ->
.mat -> FISRnet. Here all three stages are jitted JAX on one device; the
file hand-offs remain available for parity/debugging (`write_artifacts`),
but the fused path never leaves HBM between stages.

Stage parity notes:
* flow (FISR_for_video_pwcnet_predict_from_img_test.py:84-147): frames are
  YUV->RGB converted, upscaled x2 before flow (better prediction), flow
  predicted bidirectionally per adjacent pair, downscaled back and halved.
  The reference resizes on the host with skimage; we use the TF1-legacy
  bilinear on device (no shipped PWC checkpoint exists to calibrate against,
  so the interpolator choice is documented rather than replicated).
* warp (FISR_for_video_warp_img_with_flo.py:97-151): the temporal middle
  frame is synthesized by sampling each neighbor at +0.5x its flow with
  bilinear/replicate (cv2.remap parity == ops/warp.dense_image_warp), in
  RGB, then converted back to YUV.
* FISRnet stage == the `test` phase tiling (FISRnet.py:937-1084), windows
  over N-2 positions, outputs saved as both RGB and YUV PNGs with
  zero-padded 2x-frame-rate numbering.
"""

from __future__ import annotations

import math
import os
import time
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fisr_tpu.data import flo as flo_io
from fisr_tpu.data import matio
from fisr_tpu.data.png_io import list_pngs, read_png
# 4K output frames are written through the native threaded libpng encoder
# (C++, native/loader.cc) — falls back to PIL transparently when the .so
# isn't built. The write side dominates host time for the video phase.
from fisr_tpu.native.bindings import encode_png as write_png
from fisr_tpu.infer.tiled import TiledRunner
from fisr_tpu.models import pwcnet
from fisr_tpu.ops.color import rgb2yuv_matlab, yuv2rgb_matlab, yuv2rgb_matlab_u8
from fisr_tpu.ops.conv import F32, Policy
from fisr_tpu.ops.resize import resize_tf1, upsample2x_bilinear
from fisr_tpu.ops.warp import dense_image_warp

__all__ = ["make_flow_fn", "make_warp_fn", "make_fused_video_step",
           "run_video_pipeline"]


def _pad_to(x: jnp.ndarray, mult: int) -> Tuple[jnp.ndarray, Tuple[int, int]]:
    """Zero-pad H,W up to multiples of `mult` (adapt_x parity,
    model_pwcnet.py:371-409)."""
    h, w = x.shape[1], x.shape[2]
    ph = (-h) % mult
    pw = (-w) % mult
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
    return x, (h, w)


def make_flow_fn(cfg: pwcnet.PWCNetConfig = pwcnet.PWCNetConfig(),
                 policy: Policy = F32, upscale: int = 2):
    """Jitted bidirectional flow for a YUV frame pair.

    fn(pwc_params, yuv1, yuv2 [B,h,w,3] in [0,255]) ->
    flows [B, 2, h, w, 2] (fwd, bwd) in input-resolution pixel units.
    """

    def fn(params, yuv1, yuv2):
        rgb = [yuv2rgb_matlab(y) / 255.0 for y in (yuv1, yuv2)]
        h, w = rgb[0].shape[1], rgb[0].shape[2]
        if upscale == 2:
            rgb = [upsample2x_bilinear(r) for r in rgb]
        elif upscale != 1:
            rgb = [resize_tf1(r, (h * upscale, w * upscale), "bilinear") for r in rgb]
        pair0, (hh, ww) = _pad_to(rgb[0], 2**cfg.pyr_lvls)
        pair1, _ = _pad_to(rgb[1], 2**cfg.pyr_lvls)
        # siamese pyramids are direction-independent: extract once, run the
        # top-down estimation twice (saves ~2x21 ms per pair at video scale)
        c1 = pwcnet.extract_features(params, pair0, cfg, policy)
        c2 = pwcnet.extract_features(params, pair1, cfg, policy)
        fwd, _ = pwcnet.apply_pyramids(params, c1, c2, cfg, policy)
        bwd, _ = pwcnet.apply_pyramids(params, c2, c1, cfg, policy)
        flows = jnp.stack([fwd[:, :hh, :ww], bwd[:, :hh, :ww]], axis=1)
        # back to input resolution: spatial /upscale and magnitude /upscale
        flows = resize_tf1(flows, (h, w), "bilinear") / float(upscale)
        return flows

    return jax.jit(fn)


def make_warp_fn():
    """Jitted middle-frame synthesis for a YUV pair + bidirectional flow.

    fn(yuv1, yuv2 [B,h,w,3] in [0,255], flows [B,2,h,w,2]) ->
    warped YUV [B, 2, h, w, 3] in [0,255] (parity: warp script :112-128).
    """

    def fn(yuv1, yuv2, flows):
        rgb1 = yuv2rgb_matlab(yuv1)
        rgb2 = yuv2rgb_matlab(yuv2)
        mid1 = dense_image_warp(rgb2, flows[:, 0] * 0.5)  # frame2 pulled back
        mid2 = dense_image_warp(rgb1, flows[:, 1] * 0.5)  # frame1 pulled fwd
        return jnp.stack([rgb2yuv_matlab(mid1), rgb2yuv_matlab(mid2)], axis=1)

    return jax.jit(fn)


def make_fused_video_step(cfg: pwcnet.PWCNetConfig = pwcnet.PWCNetConfig(),
                          policy: Policy = F32, upscale: int = 2, sf: int = 2,
                          fisr_grid=None):
    """ONE jitted program for a full FISR window: bidirectional PWC flow for
    both frame pairs -> +0.5-flow middle-frame warps -> full-frame FISRnet.

    The reference runs these as three separate TF sessions writing .flo/.mat
    files between them (main.py:211-217); here the frame window never leaves
    HBM. fn(fisr_params, pwc_params, frames [B, 3, h, w, 3] YUV in [0, 255])
    -> [B, h*sf, w*sf, 9] YUV in [0, 1] ([fr1, SR, fr2]).

    h, w must be multiples of 32 (FISRnet) — the pipeline pads internally
    for PWC's 64-multiple requirement. fisr_grid (e.g. (4, 4) or 'auto')
    routes the FISRnet stage through in-jit padded tiling, which on v5e is
    substantially faster than full-frame at 2K (see PERF.md).
    """
    from fisr_tpu.models import fisrnet

    flow_fn_core = make_flow_fn(cfg, policy, upscale)
    warp_fn = make_warp_fn()

    def step(fisr_params, pwc_params, frames):
        b, _, h, w, _ = frames.shape
        f0, f1, f2 = frames[:, 0], frames[:, 1], frames[:, 2]
        flows01 = flow_fn_core(pwc_params, f0, f1)  # [B, 2, h, w, 2]
        flows12 = flow_fn_core(pwc_params, f1, f2)
        warps01 = warp_fn(f0, f1, flows01)  # [B, 2, h, w, 3] YUV [0,255]
        warps12 = warp_fn(f1, f2, flows12)

        img = jnp.concatenate([f0, f1, f2], axis=-1) / 255.0
        img = jnp.clip(img, 0.0, 1.0)
        flow_norm = 96.0 * 2.0  # FISRnet.py:1016
        fl = jnp.concatenate(
            [flows01[:, 0], flows01[:, 1], flows12[:, 0], flows12[:, 1]], -1
        ) / flow_norm
        fl = jnp.clip(fl, -1.0, 1.0)
        wp = jnp.concatenate(
            [warps01[:, 0], warps01[:, 1], warps12[:, 0], warps12[:, 1]], -1
        ) / 255.0
        wp = jnp.clip(wp, 0.0, 1.0)
        inp = jnp.concatenate([img, fl, wp], axis=-1)  # [B, h, w, 29]
        if fisr_grid is not None:
            from fisr_tpu.infer.device import best_grid, tiled_apply

            grid = (best_grid(h, w) if fisr_grid == "auto" else fisr_grid)
            pred = tiled_apply(fisr_params, inp, grid, 32, sf, policy)
        else:
            pred = fisrnet.apply(fisr_params, inp, sf, policy)[2]
        return jnp.clip(pred.astype(jnp.float32), 0.0, 1.0)

    return jax.jit(step)


def run_video_pipeline(
    fisr_params,
    pwc_params,
    frame_folder: str,
    out_folder: Optional[str] = None,
    grid: Tuple[int, int] = (2, 2),
    boundary: int = 32,
    policy: Policy = F32,
    write_artifacts: bool = False,
    frame_num: Optional[int] = None,
    verbose: bool = True,
    fused: bool = False,
):
    """Full FISR_for_video over a folder of YUV PNGs.

    Returns list of output PNG paths. If write_artifacts, also writes the
    reference-format .flo / .mat intermediates into the frame folder.
    fused=True runs each window through the single-program
    flow->warp->FISRnet step (full-frame, no tiling) instead of the staged
    path — the production device-resident mode.
    """
    paths = list_pngs(frame_folder)
    if frame_num is not None:
        paths = paths[:frame_num]
    n = len(paths)
    if n < 3:
        raise ValueError("need at least 3 frames")
    out_folder = out_folder or os.path.join(frame_folder, "FISR_frames")
    os.makedirs(out_folder, exist_ok=True)

    frames = np.stack([read_png(p) for p in paths]).astype(np.float32)  # YUV u8

    if fused:
        h0, w0 = frames.shape[1], frames.shape[2]
        h = h0 - h0 % 32
        w = w0 - w0 % 32
        step = make_fused_video_step(policy=policy)
        digits = math.ceil(math.log10(2 * (n - 1)))
        out_paths = []

        # Pipelined streaming: window k+1's upload and compute are dispatched
        # (async) BEFORE window k's prediction is pulled to the host, so the
        # device works on k+1 while the host drains k through the (slow)
        # transfer link; PNG encoding runs on worker threads. Output values
        # and order are identical to the synchronous loop.
        from concurrent.futures import ThreadPoolExecutor

        def emit(fr, pred_dev):
            pred_u8 = np.uint8(np.asarray(pred_dev[0]) * 255)
            for s in range(3):
                idx = str(fr * 2 + s).zfill(digits)
                rgb = yuv2rgb_matlab_u8(pred_u8[:, :, 3 * s : 3 * s + 3])
                p_rgb = os.path.join(out_folder, f"pred_{idx}.png")
                yuv = pred_u8[:, :, 3 * s : 3 * s + 3]
                p_yuv = os.path.join(out_folder, f"pred_YUV_{idx}.png")
                yield (rgb, p_rgb), (yuv, p_yuv)

        with ThreadPoolExecutor(max_workers=4) as pool:
            writes = []
            pending = None
            for fr in range(n - 2):
                window = jax.device_put(frames[None, fr : fr + 3, :h, :w])
                pred_dev = step(fisr_params, pwc_params, window)
                if pending is not None:
                    for (rgb, p_rgb), (yuv, p_yuv) in emit(*pending):
                        writes.append(pool.submit(write_png, rgb, p_rgb))
                        writes.append(pool.submit(write_png, yuv, p_yuv))
                        out_paths.append(p_rgb)
                    if verbose:
                        print(f"<FISR fused> window [{pending[0] + 1}/{n - 2}]",
                              flush=True)
                pending = (fr, pred_dev)
            for (rgb, p_rgb), (yuv, p_yuv) in emit(*pending):
                writes.append(pool.submit(write_png, rgb, p_rgb))
                writes.append(pool.submit(write_png, yuv, p_yuv))
                out_paths.append(p_rgb)
            if verbose:
                print(f"<FISR fused> window [{n - 2}/{n - 2}]", flush=True)
            for fut in writes:
                fut.result()
        return out_paths

    # stage 1+2: flows + warped middle frames for each adjacent pair
    flow_fn = make_flow_fn(policy=policy)
    warp_fn = make_warp_fn()
    flows, warps = [], []
    for i in range(n - 1):
        y1 = jnp.asarray(frames[i : i + 1])
        y2 = jnp.asarray(frames[i + 1 : i + 2])
        fl = flow_fn(pwc_params, y1, y2)
        wp = warp_fn(y1, y2, fl)
        flows.append(np.asarray(fl[0], np.float32))
        warps.append(np.asarray(wp[0], np.float32))
        if verbose:
            print(f"flow+warp pair [{i + 1}/{n - 1}]", flush=True)
    flows = np.stack(flows)  # [n-1, 2, h, w, 2]
    warps = np.stack(warps)  # [n-1, 2, h, w, 3] YUV [0,255]

    if write_artifacts:
        scene = os.path.basename(os.path.normpath(frame_folder))
        flo_path = os.path.join(frame_folder, f"{scene}_test_ss1_fr{n}.flo")
        mat_path = os.path.join(frame_folder, f"{scene}_ss1_fr{n}_warp.mat")
        flo_io.write_flo_5dim(flows, flo_path)
        matio.write_warp_mat(warps, mat_path)

    # stage 3: per-window 29-ch inputs -> tiled FISRnet (FISRnet.py:963-975)
    runner = TiledRunner(fisr_params, grid=grid, boundary=boundary,
                         policy=policy, mode="exact")
    h0, w0 = frames.shape[1], frames.shape[2]
    h = h0 - h0 % (32 * grid[0])
    w = w0 - w0 % (32 * grid[1])
    flow_norm = 96.0 * 2.0  # FISRnet.py:1016 — constant, independent of size

    flow_win = np.concatenate([flows[: n - 2], flows[1 : n - 1]], axis=1)
    warp_win = np.concatenate([warps[: n - 2], warps[1 : n - 1]], axis=1)
    digits = math.ceil(math.log10(2 * (n - 1)))
    out_paths = []
    t0 = time.time()
    for fr in range(n - 2):
        img = frames[fr : fr + 3, :h, :w].transpose(1, 2, 0, 3).reshape(h, w, 9)
        img = np.clip(img / 255.0, 0, 1)[None]
        fl = flow_win[fr][:, :h, :w].transpose(1, 2, 0, 3).reshape(h, w, 8)
        fl = np.clip(fl / flow_norm, -1, 1)[None]
        wp = warp_win[fr][:, :h, :w].transpose(1, 2, 0, 3).reshape(h, w, 12)
        wp = np.clip(wp / 255.0, 0, 1)[None]
        inp = np.concatenate([img, fl, wp], axis=3).astype(np.float32)

        pred = np.clip(runner(inp)[0], 0, 1)
        pred_u8 = np.uint8(pred * 255)
        for s in range(3):
            idx = str(fr * 2 + s).zfill(digits)
            rgb = yuv2rgb_matlab_u8(pred_u8[:, :, 3 * s : 3 * s + 3])
            p_rgb = os.path.join(out_folder, f"pred_{idx}.png")
            write_png(rgb, p_rgb)
            p_yuv = os.path.join(out_folder, f"pred_YUV_{idx}.png")
            write_png(pred_u8[:, :, 3 * s : 3 * s + 3], p_yuv)
            out_paths.append(p_rgb)
        if verbose:
            print(f"<FISR> window [{fr + 1}/{n - 2}] "
                  f"({(time.time() - t0) / 60:.2f} min)", flush=True)
    return out_paths
