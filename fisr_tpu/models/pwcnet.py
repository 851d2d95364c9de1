"""PWC-Net optical flow (pyramid / warping / cost volume), pure JAX.

Architecture parity with the vendored tfoptflow model in its `pwcnet-lg-6-2`
configuration — 6 pyramid levels, flow predicted at level 2, dense estimator
connections + residual context refinement, search range 4 — the exact config
FISR uses for flow precomputation
(FISR_tfoptflow/FISR_for_video_pwcnet_predict_from_img_test.py:96-106).

Components (reference: model_pwcnet.py):
* feature pyramid  — shared-weight siamese, 6 x (stride-2 conv + 2 convs),
  channels 16/32/64/96/128/196, leaky-relu 0.1 (:1012-1101);
* warping layer    — dense bilinear backward warp of image-2 features by the
  upsampled flow scaled by 20/2^lvl (:1106-1178, :1560);
* cost volume      — 81-shift local correlation + leaky-relu (:1226-1277);
* flow estimator   — 5 convs (128/128/96/64/32) with DenseNet concats, conv
  -> 2ch flow (:1282-1448);
* context network  — 7 dilated convs (dilations 1/2/4/8/16/1/1), residual
  flow refinement (:1453-1520);
* top-down loop    — level 6 from raw correlation, levels 5..2 warp+corr+
  estimate, learned 4x4/2 transpose-conv upsampling of flow and features,
  final bilinear x4 upsample with 4x magnitude rescale (:1525-1593).

Params are a nested-dict pytree; NHWC bf16-ready like FISRnet.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from fisr_tpu.ops.conv import F32, Policy, conv2d, init_conv
from fisr_tpu.ops.cost_volume import cost_volume
from fisr_tpu.ops.resize import resize_tf1
from fisr_tpu.ops.warp import dense_image_warp

Params = Dict[str, Any]

PYR_CHANNELS = [None, 16, 32, 64, 96, 128, 196]  # 1-based
EST_CHANNELS = [128, 128, 96, 64, 32]
CTX_SPEC = [(128, 1), (128, 2), (128, 4), (96, 8), (64, 16), (32, 1), (2, 1)]

__all__ = ["PWCNetConfig", "init_params", "apply", "extract_features"]


class PWCNetConfig:
    """pwcnet-lg-6-2 defaults (model_pwcnet.py:33-198 option dicts).

    cost_volume_impl: 'auto' picks the Pallas correlation kernel on TPU
    (6x faster and ~100x faster to compile than the XLA loop at video
    resolutions) and the XLA loop elsewhere; 'xla'/'pallas' force.
    """

    def __init__(self, pyr_lvls: int = 6, flow_pred_lvl: int = 2,
                 search_range: int = 4, use_dense_cx: bool = True,
                 use_res_cx: bool = True, cost_volume_impl: str = "auto"):
        self.pyr_lvls = pyr_lvls
        self.flow_pred_lvl = flow_pred_lvl
        self.search_range = search_range
        self.use_dense_cx = use_dense_cx
        self.use_res_cx = use_res_cx
        self.cost_volume_impl = cost_volume_impl

    def cost_volume_fn(self):
        impl = self.cost_volume_impl
        if impl == "auto":
            impl = "pallas" if jax.default_backend() == "tpu" else "xla"
        if impl == "pallas":
            from fisr_tpu.kernels.cost_volume_pallas import cost_volume_pallas

            return lambda a, b: cost_volume_pallas(a, b, self.search_range)
        return lambda a, b: cost_volume(a, b, self.search_range)


def _leaky(x):
    return jax.nn.leaky_relu(x, 0.1)


def _init_deconv(rng, c_in: int, c_out: int = 2) -> Params:
    # kernel kept in TF's native conv2d_transpose layout [k, k, OUT, IN] so
    # the checkpoint converter is a pure rename (no layout fix-up)
    w = jax.nn.initializers.glorot_normal(in_axis=(0, 1, 3), out_axis=2)(
        rng, (4, 4, c_out, c_in), jnp.float32
    )
    return {"w": w, "b": jnp.zeros((c_out,), jnp.float32)}


def _deconv(p: Params, x: jnp.ndarray, policy: Policy) -> jnp.ndarray:
    """4x4 stride-2 SAME transpose conv (learned x2 upsample,
    model_pwcnet.py:1180-1221).

    `transpose_kernel=True` + the TF-native [k, k, out, in] kernel layout
    is the EXACT semantics of tf.nn.conv2d_transpose (gradient-of-conv:
    spatially mirrored taps + swapped channel axes) — verified bit-equal
    against the reference's own graph in tests/test_tf_oracle.py. The
    previous form (no kernel transpose) was a different, self-consistent
    operator: fine for our own training, wrong for released TF weights."""
    out = jax.lax.conv_transpose(
        policy.cast(x), p["w"].astype(policy.compute_dtype),
        strides=(2, 2), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        transpose_kernel=True,
    )
    return out + p["b"].astype(policy.compute_dtype)


def _estimator_channels(cfg: PWCNetConfig, lvl: int) -> int:
    """Input channel count of the estimator at `lvl` (corr [+ c1, flow, feat])."""
    od = (2 * cfg.search_range + 1) ** 2
    if lvl < cfg.pyr_lvls:
        od += PYR_CHANNELS[lvl] + 2 + 2
    return od


def _upfeat_channels(cfg: PWCNetConfig, lvl: int) -> int:
    od = _estimator_channels(cfg, lvl)
    return od + sum(EST_CHANNELS) if cfg.use_dense_cx else EST_CHANNELS[-1]


def init_params(rng, cfg: PWCNetConfig = PWCNetConfig()) -> Params:
    keys = iter(jax.random.split(rng, 256))
    feat = {}
    c_prev = 3
    for lvl in range(1, cfg.pyr_lvls + 1):
        c = PYR_CHANNELS[lvl]
        feat[f"level_{lvl}"] = {
            "a": init_conv(next(keys), 3, c_prev, c),
            "aa": init_conv(next(keys), 3, c, c),
            "b": init_conv(next(keys), 3, c, c),
        }
        c_prev = c

    flow, ctx, up = {}, {}, {}
    for lvl in range(cfg.pyr_lvls, cfg.flow_pred_lvl - 1, -1):
        od = _estimator_channels(cfg, lvl)
        lv = {}
        c_in = od
        for i, c in enumerate(EST_CHANNELS):
            lv[f"conv{i}"] = init_conv(next(keys), 3, c_in, c)
            c_in = c_in + c if cfg.use_dense_cx else c
        lv["pred"] = init_conv(next(keys), 3, c_in, 2)
        flow[f"level_{lvl}"] = lv

        if cfg.use_res_cx or lvl == cfg.flow_pred_lvl:
            cx = {}
            cx_in = _upfeat_channels(cfg, lvl)
            for i, (c, _dil) in enumerate(CTX_SPEC):
                cx[f"dc{i+1}"] = init_conv(next(keys), 3, cx_in, c)
                cx_in = c
            ctx[f"level_{lvl}"] = cx

        if lvl != cfg.flow_pred_lvl:
            up[f"level_{lvl}"] = {
                "flow": _init_deconv(next(keys), 2),
                "feat": _init_deconv(next(keys), _upfeat_channels(cfg, lvl)),
            }

    return {"feat": feat, "flow": flow, "ctx": ctx, "up": up}


def _feature_grid(h: int, w: int):
    """Patch grid for a pyramid level at huge extents, else None.

    The C=3/16 full-res feature convs run at ~3 TFLOP/s full-frame on v5e
    (lane-starved AND extent-collapsed); as a patch batch of ~264x480 tiles
    the same level runs 2.4x faster (2112x3840: 14.7 -> 6.2 ms at (8,8)).
    Below ~4M px tiling is a wash or a loss — measured at 1056x1920 and
    528x960. Patches must stay even for the stride-2 conv grid."""
    if h * w < 4_000_000:
        return None

    def pick(n, target):
        # first (largest) exact divisor keeping patches >= target and even;
        # 1 = leave the axis unsplit
        for g in (8, 6, 4, 3, 2):
            if n % g == 0 and n // g >= target and n // g % 2 == 0:
                return g
        return 1
    gh, gw = pick(h, 256), pick(w, 448)
    return None if gh * gw == 1 else (gh, gw)


def extract_features(p: Params, x: jnp.ndarray, cfg: PWCNetConfig,
                     policy: Policy = F32):
    """Siamese pyramid for one image: x [B, H, W, 3] -> list of levels 1..L."""
    out = [None]
    n = policy.cast(x)
    for lvl in range(1, cfg.pyr_lvls + 1):
        lp = p["feat"][f"level_{lvl}"]

        def block(t, lp=lp):
            t = _leaky(conv2d(lp["a"], t, policy, stride=2))
            t = _leaky(conv2d(lp["aa"], t, policy))
            return _leaky(conv2d(lp["b"], t, policy))

        grid = _feature_grid(n.shape[1], n.shape[2])
        if grid is None:
            n = block(n)
        else:
            # halo 6 >= the block's receptive radius (5 input px), even so
            # the stride-2 grid stays aligned; patch interiors are bit-exact
            from fisr_tpu.infer.halo import halo_map

            n = halo_map(block, n, grid, 6, (n.shape[1], n.shape[2]))
        out.append(n)
    return out


def _estimate(p: Params, x: jnp.ndarray, cfg: PWCNetConfig, policy: Policy):
    """Flow estimator with optional DenseNet concats; returns (upfeat, flow)."""
    for i in range(len(EST_CHANNELS)):
        act = _leaky(conv2d(p[f"conv{i}"], x, policy))
        x = jnp.concatenate([act, x], axis=-1) if cfg.use_dense_cx else act
    return x, conv2d(p["pred"], x, policy)


def _estimator_grid(h: int, w: int):
    """Patch grid for the estimator at large spatial extents, else None.

    XLA's throughput on the estimator's fat dense-concat convs collapses at
    large extents (measured v5e, 528x960 input: 50 ms full-frame vs 34 ms as
    a (4,4) patch batch with a 6-px halo; small extents LOSE from tiling —
    264x480: 15.4 vs 19.6). Tile only above ~500k px, aiming for ~132x240
    patches. The context net (r=32 dilations) and coarser levels stay
    full-frame: measured slower tiled.
    """
    if h * w < 500_000:
        return None

    def pick(n, lo):
        for g in (4, 3, 2):
            if n % g == 0 and n // g >= lo:
                return g
        return 1
    gh, gw = pick(h, 120), pick(w, 224)
    return None if gh * gw == 1 else (gh, gw)


def _estimate_tiled(p: Params, x: jnp.ndarray, cfg: PWCNetConfig, policy: Policy):
    """_estimate, patch-tiled via halo_map when the extent is collapse-prone.

    halo 6 = the estimator's receptive radius (6 3x3 convs), so patch
    interiors are bit-exact vs full-frame; only a <=6-px frame-border band
    differs (zero ring vs conv-SAME ring — the same class as every tiled
    inference path here, PARITY.md)."""
    grid = _estimator_grid(x.shape[1], x.shape[2])
    if grid is None:
        return _estimate(p, x, cfg, policy)
    from fisr_tpu.infer.halo import halo_map

    return halo_map(lambda t: _estimate(p, t, cfg, policy), x, grid, 6,
                    (x.shape[1], x.shape[2]))


def _refine(p: Params, feat: jnp.ndarray, flow: jnp.ndarray, cfg: PWCNetConfig,
            policy: Policy) -> jnp.ndarray:
    x = feat
    for i, (_c, dil) in enumerate(CTX_SPEC):
        x = conv2d(p[f"dc{i+1}"], x, policy, dilation=dil)
        if i < len(CTX_SPEC) - 1:
            x = _leaky(x)
    return flow + x


def apply(params: Params, img1: jnp.ndarray, img2: jnp.ndarray,
          cfg: PWCNetConfig = PWCNetConfig(), policy: Policy = F32):
    """Predict flow img1 -> img2.

    img1/img2: [B, H, W, 3] in [0, 1], H and W multiples of 2**pyr_lvls
    (callers pad — parity with adapt_x, model_pwcnet.py:371-409).
    Returns (flow_pred [B, H, W, 2] in full-res pixel units, flow_pyramid).

    Bidirectional callers should extract the two feature pyramids ONCE and
    call `apply_pyramids` for each direction — the siamese pyramid is the
    same either way, and at video scale it costs ~21 ms per image.
    """
    c1 = extract_features(params, img1, cfg, policy)
    c2 = extract_features(params, img2, cfg, policy)
    return apply_pyramids(params, c1, c2, cfg, policy)


def apply_pyramids(params: Params, c1, c2,
                   cfg: PWCNetConfig = PWCNetConfig(), policy: Policy = F32):
    """Flow from precomputed feature pyramids (extract_features outputs)."""
    cv = cfg.cost_volume_fn()
    flow_pyr = []
    up_flow = up_feat = None
    for lvl in range(cfg.pyr_lvls, cfg.flow_pred_lvl - 1, -1):
        if lvl == cfg.pyr_lvls:
            corr = _leaky(cv(c1[lvl], c2[lvl]))
            x = corr
        else:
            scaler = jnp.asarray(20.0 / 2**lvl, policy.compute_dtype)
            # tfoptflow quirk, required for released-weight parity: the
            # upstream core_warp is tf.contrib.image.dense_image_warp, which
            # SUBTRACTS the flow and reads it (dy, dx) — while the estimator
            # is supervised in (u, v). The trained network learns whatever
            # field makes ITS OWN warp consistent, so we must reproduce the
            # exact quirk: our warp ADDS (u, v), hence pass -flip(flow).
            # Pinned against the reference's verbatim nn() graph in
            # tests/test_tf_oracle.py::test_pwc_forward_matches_reference.
            warped = dense_image_warp(c2[lvl],
                                      -jnp.flip(up_flow, -1) * scaler)
            corr = _leaky(cv(c1[lvl], warped))
            x = jnp.concatenate([corr, c1[lvl], up_flow, up_feat], axis=-1)

        upfeat, flow = _estimate_tiled(params["flow"][f"level_{lvl}"], x, cfg,
                                       policy)

        if lvl != cfg.flow_pred_lvl:
            if cfg.use_res_cx:
                flow = _refine(params["ctx"][f"level_{lvl}"], upfeat, flow, cfg, policy)
            flow_pyr.append(flow)
            up_flow = _deconv(params["up"][f"level_{lvl}"]["flow"], flow, policy)
            up_feat = _deconv(params["up"][f"level_{lvl}"]["feat"], upfeat, policy)
        else:
            flow = _refine(params["ctx"][f"level_{lvl}"], upfeat, flow, cfg, policy)
            flow_pyr.append(flow)
            scaler = 2**cfg.flow_pred_lvl
            h, w = flow.shape[1] * scaler, flow.shape[2] * scaler
            flow_pred = resize_tf1(flow.astype(jnp.float32), (h, w), "bilinear") * scaler

    return flow_pred, flow_pyr
