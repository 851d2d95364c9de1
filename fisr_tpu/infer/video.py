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

__all__ = ["make_flow_fn", "make_warp_fn", "make_pair_fn",
           "make_fisr_window_fn", "make_fused_video_step",
           "resolve_fisr_grid", "resolve_fisr_plan", "run_video_pipeline"]


def _pad_to(x: jnp.ndarray, mult: int) -> Tuple[jnp.ndarray, Tuple[int, int]]:
    """Zero-pad H,W up to multiples of `mult` (adapt_x parity,
    model_pwcnet.py:371-409)."""
    h, w = x.shape[1], x.shape[2]
    ph = (-h) % mult
    pw = (-w) % mult
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
    return x, (h, w)


def _flow_core(params, yuv1, yuv2, cfg: pwcnet.PWCNetConfig, policy: Policy,
               upscale: int):
    """Bidirectional flow for a YUV pair (traceable core of make_flow_fn)."""
    rgb = [yuv2rgb_matlab(y) / 255.0 for y in (yuv1, yuv2)]
    h, w = rgb[0].shape[1], rgb[0].shape[2]
    if upscale == 2:
        rgb = [upsample2x_bilinear(r) for r in rgb]
    elif upscale != 1:
        rgb = [resize_tf1(r, (h * upscale, w * upscale), "bilinear") for r in rgb]
    pair0, (hh, ww) = _pad_to(rgb[0], 2**cfg.pyr_lvls)
    pair1, _ = _pad_to(rgb[1], 2**cfg.pyr_lvls)
    # Both directions in ONE batch-2B pass: the siamese pyramid is extracted
    # once over the stacked pair, and the (c2, c1) pyramid for the backward
    # direction is just the batch halves swapped — so the whole top-down
    # estimation runs as a single program with doubled batch instead of two
    # sequential batch-B passes (measured v5e, video parity scale: 308 ->
    # 252 ms, scripts/profile_flow_batched.py; coarse levels were
    # underfilled at batch 1 and the program overhead halves).
    b = pair0.shape[0]
    both = jnp.concatenate([pair0, pair1], axis=0)  # [2B, H, W, 3]
    c = pwcnet.extract_features(params, both, cfg, policy)
    c_rev = [None] + [jnp.concatenate([t[b:], t[:b]], axis=0) for t in c[1:]]
    flows2, _ = pwcnet.apply_pyramids(params, c, c_rev, cfg, policy)
    fwd, bwd = flows2[:b], flows2[b:]
    flows = jnp.stack([fwd[:, :hh, :ww], bwd[:, :hh, :ww]], axis=1)
    # back to input resolution: spatial /upscale and magnitude /upscale
    return resize_tf1(flows, (h, w), "bilinear") / float(upscale)


def make_flow_fn(cfg: pwcnet.PWCNetConfig = pwcnet.PWCNetConfig(),
                 policy: Policy = F32, upscale: int = 2):
    """Jitted bidirectional flow for a YUV frame pair.

    fn(pwc_params, yuv1, yuv2 [B,h,w,3] in [0,255]) ->
    flows [B, 2, h, w, 2] (fwd, bwd) in input-resolution pixel units.
    """
    return jax.jit(lambda params, yuv1, yuv2:
                   _flow_core(params, yuv1, yuv2, cfg, policy, upscale))


def _warp_core(yuv1, yuv2, flows):
    """Middle-frame synthesis (traceable core of make_warp_fn)."""
    rgb1 = yuv2rgb_matlab(yuv1)
    rgb2 = yuv2rgb_matlab(yuv2)
    mid1 = dense_image_warp(rgb2, flows[:, 0] * 0.5)  # frame2 pulled back
    mid2 = dense_image_warp(rgb1, flows[:, 1] * 0.5)  # frame1 pulled fwd
    return jnp.stack([rgb2yuv_matlab(mid1), rgb2yuv_matlab(mid2)], axis=1)


def make_warp_fn():
    """Jitted middle-frame synthesis for a YUV pair + bidirectional flow.

    fn(yuv1, yuv2 [B,h,w,3] in [0,255], flows [B,2,h,w,2]) ->
    warped YUV [B, 2, h, w, 3] in [0,255] (parity: warp script :112-128).
    """
    return jax.jit(_warp_core)


def make_pair_fn(cfg: pwcnet.PWCNetConfig = pwcnet.PWCNetConfig(),
                 policy: Policy = F32, upscale: int = 2):
    """ONE jitted program for everything an adjacent frame pair contributes:
    bidirectional flow + the two +0.5-flow middle-frame warps.

    fn(pwc_params, yuv1, yuv2 [B,h,w,3] in [0,255]) ->
    (flows [B,2,h,w,2], warps [B,2,h,w,3] YUV in [0,255]).

    Consecutive FISR windows share a pair — window k reads pairs (k,k+1) and
    (k+1,k+2), window k+1 reads (k+1,k+2) and (k+2,k+3) — so the streaming
    loop computes each pair ONCE through this program and feeds two windows
    (the reference's staged pipeline has the same sharing: it precomputes all
    n-1 pairs, FISR_for_video_pwcnet_predict_from_img_test.py:84-147, then
    assembles n-2 windows). The monolithic `make_fused_video_step` recomputes
    the shared pair and is kept for single-window serving and as the
    equivalence oracle.
    """

    def fn(params, yuv1, yuv2):
        flows = _flow_core(params, yuv1, yuv2, cfg, policy, upscale)
        return flows, _warp_core(yuv1, yuv2, flows)

    return jax.jit(fn)


def resolve_fisr_plan(fisr_grid, h: int, w: int, policy: Policy):
    """Resolve a fisr_grid spec to a concrete ((gh, gw), (pad_h, pad_w)).

    'auto'  -> padded_grid heuristic (v5e-measured (4,6) target; pads up
               to 10% of an axis when that unlocks the target grid —
               e.g. 1056 rows -> (4,6) with 96 pad rows, measured -9.2%
               vs the unpadded (3,6), see device.tiled_apply_padded);
    'tuned' -> this device's measured winner from the autotune cache
               (cli/tune.py), falling back to the heuristic if this frame
               size was never tuned here;
    tuple   -> passed through, pad 0. Resolution happens at trace time.
    """
    from fisr_tpu.infer.device import padded_grid

    if fisr_grid == "auto":
        return padded_grid(h, w)
    if fisr_grid == "tuned":
        from fisr_tpu.infer.autotune import TuneCache

        plan = TuneCache().best_plan(h, w, np.dtype(policy.compute_dtype).name)
        return plan or padded_grid(h, w)
    return tuple(fisr_grid), (0, 0)


def resolve_fisr_grid(fisr_grid, h: int, w: int, policy: Policy):
    """Back-compat: like `resolve_fisr_plan` but restricted to PAD-FREE
    plans — 'auto' maps to the best_grid heuristic, 'tuned' to the cache's
    best pad-free entry. The returned grid always divides (h, w)."""
    from fisr_tpu.infer.device import best_grid

    if fisr_grid == "auto":
        return best_grid(h, w)
    if fisr_grid == "tuned":
        from fisr_tpu.infer.autotune import TuneCache

        return (TuneCache().best(h, w, np.dtype(policy.compute_dtype).name)
                or best_grid(h, w))
    return tuple(fisr_grid)


def _fisr_window_core(fisr_params, f0, f1, f2, flows01, warps01, flows12,
                      warps12, policy: Policy, sf: int, fisr_grid,
                      clip_output: bool = True):
    """29-ch input assembly + FISRnet stage for one window (traceable).

    clip_output=False returns the raw (pre-[0,1]-clip) prediction — the
    joint fine-tuning loss (train/joint.py) needs unsaturated gradients;
    serving paths keep the clipped form.
    """
    from fisr_tpu.models import fisrnet

    h, w = f0.shape[1], f0.shape[2]
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
        from fisr_tpu.infer.device import tiled_apply_padded

        grid, pads = resolve_fisr_plan(fisr_grid, h, w, policy)
        pred = tiled_apply_padded(fisr_params, inp, grid, pads, 32, sf, policy)
    else:
        pred = fisrnet.apply(fisr_params, inp, sf, policy)[2]
    pred = pred.astype(jnp.float32)
    return jnp.clip(pred, 0.0, 1.0) if clip_output else pred


def make_fisr_window_fn(policy: Policy = F32, sf: int = 2, fisr_grid=None):
    """Jitted window stage for the pair-cached streaming loop.

    fn(fisr_params, frames [B,3,h,w,3] YUV in [0,255],
       (flows01, warps01), (flows12, warps12))  ->  [B, h*sf, w*sf, 9] in
    [0,1] — exactly `make_fused_video_step`'s output when the pair inputs
    come from `make_pair_fn` on the window's two adjacent pairs (pinned in
    tests/test_video_fused.py).
    """

    def fn(fisr_params, frames, pair01, pair12):
        f0, f1, f2 = frames[:, 0], frames[:, 1], frames[:, 2]
        return _fisr_window_core(fisr_params, f0, f1, f2, pair01[0], pair01[1],
                                 pair12[0], pair12[1], policy, sf, fisr_grid)

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

    This single-program form recomputes the pair shared with the previous
    window; the streaming loop in `run_video_pipeline` uses `make_pair_fn`
    + `make_fisr_window_fn` instead, which computes each pair once
    (steady-state saves one full bidirectional PWC pass per window). Use
    this form for isolated windows and frame-parallel serving
    (infer/serving.py), where windows land on different chips and sharing
    would create inter-chip dependencies.
    """

    def step(fisr_params, pwc_params, frames):
        f0, f1, f2 = frames[:, 0], frames[:, 1], frames[:, 2]
        # Two _flow_core calls, each internally batch-2B over its two
        # directions. Folding BOTH pairs into one batch-4B call was measured
        # NEGATIVE at parity scale (monolithic window 870 -> 896 ms — batch
        # 4 at the x2-upscaled 2112x3840 extent trips the same large-extent
        # collapse as the tiling crossovers; PERF.md round-3 scoreboard), so
        # the 2B-per-pair form stays.
        flows01 = _flow_core(pwc_params, f0, f1, cfg, policy, upscale)
        flows12 = _flow_core(pwc_params, f1, f2, cfg, policy, upscale)
        warps01 = _warp_core(f0, f1, flows01)  # [B, 2, h, w, 3] YUV [0,255]
        warps12 = _warp_core(f1, f2, flows12)
        return _fisr_window_core(fisr_params, f0, f1, f2, flows01, warps01,
                                 flows12, warps12, policy, sf, fisr_grid)

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
    flow_upscale: int = 2,
    fisr_grid=None,
):
    """Full FISR_for_video over a folder of YUV PNGs.

    Returns list of output PNG paths. If write_artifacts, also writes the
    reference-format .flo / .mat intermediates into the frame folder.
    fused=True runs each window through the single-program
    flow->warp->FISRnet step (full-frame, no tiling) instead of the staged
    path — the production device-resident mode.

    fisr_grid picks the fused window stage's FISRnet tiling plan ('auto' =
    measured heuristic incl. edge-padded grids, 'tuned' = autotune cache,
    tuple = explicit, None = full-frame); the staged path keeps `grid`
    (the reference's --test_patch semantics). Default None = full-frame,
    matching the reference's video phase (FISRnet.py:937-1084 runs whole
    frames, no patching); tiling is an opt-in throughput mode whose
    deviation vs full-frame is measured at the 36.8 dB / 0.9957 SSIM class
    at 1080p (PARITY.md "fused-grid tiling", PARITY_fused_grid.json —
    receptive-field truncation at the 32 px halo, worst at patch seams).

    flow_upscale=2 is reference parity — the flow stage upscales each frame
    pair x2 before PWC-Net and scales the flow back down (the reference's
    better-prediction trick, FISR_for_video_pwcnet_predict_from_img_test.py:
    116-141). flow_upscale=1 is the explicit FAST mode: flow at native
    resolution, ~1.5x pipeline throughput at 2K (PERF.md), with a measured
    flow-quality trade recorded in PARITY.md — opt-in only, parity mode keeps
    the reference trick.
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
        # Pair-cached streaming: adjacent windows share a frame pair, so each
        # pair's bidirectional flow + warps run ONCE (make_pair_fn) and feed
        # two windows — the reference's staged pipeline has the same sharing
        # (it precomputes all n-1 pairs); the naive per-window fused step
        # recomputes it (one extra full PWC pass per window, the pipeline's
        # most expensive stage). Frames also upload once each, not 3x.
        pair_fn = make_pair_fn(policy=policy, upscale=flow_upscale)
        # fisr_grid routes the window's FISRnet stage through in-jit tiling
        # (resolve_fisr_plan: 'auto'/'tuned'/explicit; None = full-frame) —
        # at 2K the (4,6)-target plan beats full-frame on v5e (PERF.md)
        window_fn = make_fisr_window_fn(policy=policy, fisr_grid=fisr_grid)
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
            d0 = jax.device_put(frames[None, 0, :h, :w])
            d1 = jax.device_put(frames[None, 1, :h, :w])
            prev_pair = pair_fn(pwc_params, d0, d1)
            for fr in range(n - 2):
                d2 = jax.device_put(frames[None, fr + 2, :h, :w])
                new_pair = pair_fn(pwc_params, d1, d2)
                window = jnp.stack([d0, d1, d2], axis=1)
                pred_dev = window_fn(fisr_params, window, prev_pair, new_pair)
                d0, d1, prev_pair = d1, d2, new_pair
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
    flow_fn = make_flow_fn(policy=policy, upscale=flow_upscale)
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
