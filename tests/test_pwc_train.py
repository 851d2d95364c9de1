"""PWC-Net training: loss behavior, train step convergence, augmentation."""

import jax
import jax.numpy as jnp
import numpy as np

from fisr_tpu.data.augment import AugmentOptions, augment_pair
from fisr_tpu.models import pwcnet
from fisr_tpu.train import schedule
from fisr_tpu.train.pwc_loss import epe, pwcnet_loss
from fisr_tpu.train.pwc_trainer import (create_pwc_state, make_pwc_eval_step,
                                        make_pwc_train_step)
from fisr_tpu.train.trainer import adam_with_schedule
import pytest

CFG = pwcnet.PWCNetConfig(pyr_lvls=4, flow_pred_lvl=2, search_range=2,
                          cost_volume_impl="xla")


def test_pwcnet_loss_zero_for_perfect_prediction():
    rng = np.random.default_rng(0)
    y = rng.normal(size=(1, 32, 32, 2)).astype(np.float32) * 4
    # pyramid that equals the downscaled gt in LEVEL-pixel units (values
    # scaled by the spatial ratio — the reference's x2^flow_pred_lvl
    # output conversion, model_pwcnet.py:1586-1590) -> zero loss
    from fisr_tpu.ops.resize import resize_tf1

    pyr = [np.asarray(resize_tf1(y, (32 // 2**l, 32 // 2**l), "bilinear")) / 2**l
           for l in (4, 3, 2)]
    loss = float(pwcnet_loss(y, pyr, None, alphas=(0.02, 0.01, 0.005)))
    assert loss < 1e-3
    wrong = [p + 1.0 for p in pyr]
    assert float(pwcnet_loss(y, wrong, None, alphas=(0.02, 0.01, 0.005))) > loss


def test_loss_units_match_output_conversion():
    """The unit contract that broke round-2 training: the loss supervises
    level-l flow in LEVEL-pixel units (gt values scaled by 2^-l), so the
    model's final `resize * 2**flow_pred_lvl` conversion
    (model_pwcnet.py:1586-1590 parity) recovers full-res pixel flow. A
    perfectly supervised level-2 flow must round-trip to the original gt."""
    from fisr_tpu.ops.resize import resize_tf1
    from fisr_tpu.train.pwc_loss import _level_gt

    y = np.full((1, 32, 32, 2), 4.0, np.float32)  # constant 4-px flow
    gt_l2 = np.asarray(_level_gt(jnp.asarray(y), (8, 8)))
    np.testing.assert_allclose(gt_l2, 1.0, rtol=1e-6)  # 4 px / 2^2
    back = np.asarray(resize_tf1(jnp.asarray(gt_l2), (32, 32), "bilinear")) * 4
    np.testing.assert_allclose(back, y, rtol=1e-6)


def test_epe():
    a = np.zeros((1, 4, 4, 2), np.float32)
    b = np.zeros((1, 4, 4, 2), np.float32)
    b[..., 0] = 3.0
    b[..., 1] = 4.0
    assert abs(float(epe(a, b)) - 5.0) < 1e-6


def test_pwc_train_step_decreases_loss():
    opt = adam_with_schedule(schedule.no_decay(1e-4))
    state = create_pwc_state(jax.random.PRNGKey(0), opt, CFG)
    step = make_pwc_train_step(opt, CFG, gamma=0.0)
    rng = np.random.default_rng(1)
    batch = {
        "x": jnp.asarray(rng.uniform(size=(2, 2, 64, 64, 3)).astype(np.float32)),
        "y": jnp.asarray(rng.normal(size=(2, 64, 64, 2)).astype(np.float32)),
    }
    first = None
    for _ in range(6):
        state, m = step(state, batch)
        if first is None:
            first = float(m["loss"])
    assert float(m["loss"]) < first

    ev = make_pwc_eval_step(CFG)
    out = ev(state.params, batch)
    assert np.isfinite(float(out["epe"]))


def test_augment_flow_consistency():
    rng_img = np.random.default_rng(0)
    x = rng_img.uniform(size=(2, 16, 20, 3)).astype(np.float32)
    y = rng_img.normal(size=(16, 20, 2)).astype(np.float32)

    # force a horizontal flip only
    opts = AugmentOptions(fliplr=1.1, flipud=-1.0, translate_prob=-1.0, scale_prob=-1.0)
    xa, ya = augment_pair(x, y, opts, np.random.default_rng(0))
    np.testing.assert_allclose(xa, x[:, :, ::-1])
    np.testing.assert_allclose(ya[..., 0], -y[:, ::-1, 0])
    np.testing.assert_allclose(ya[..., 1], y[:, ::-1, 1])

    # force a vertical flip only
    opts = AugmentOptions(fliplr=-1.0, flipud=1.1, translate_prob=-1.0, scale_prob=-1.0)
    xa, ya = augment_pair(x, y, opts, np.random.default_rng(0))
    np.testing.assert_allclose(ya[..., 1], -y[::-1, :, 1])

    # translation adds to flow
    opts = AugmentOptions(fliplr=-1.0, flipud=-1.0, translate_prob=1.1,
                          translate_frac=0.3, scale_prob=-1.0)
    rng = np.random.default_rng(3)
    xa, ya = augment_pair(x, y, opts, rng)
    shift = ya - y
    assert np.allclose(shift, shift[0, 0])  # uniform offset


@pytest.mark.slow
def test_pwc_fit_end_to_end(tmp_path):
    from fisr_tpu.data.flow_dataset import FlowDataset
    from fisr_tpu.train.pwc_trainer import pwc_fit
    from fisr_tpu.train import schedule

    ds = FlowDataset.synthetic(n=6, h=32, w=32, val_split=0.34)
    state = pwc_fit(ds, str(tmp_path / "ck"), steps=4, batch_size=2,
                    val_every=4, display_every=2, cfg=CFG,
                    schedule_fn=schedule.no_decay(1e-4),
                    log_dir=str(tmp_path / "tb"))
    assert int(state.step) == 4
    import glob
    assert glob.glob(str(tmp_path / "ck" / "step_*"))
    # TB observability: scalar + flow-panel image events were written
    # (logger.py:132-177 parity); PNG image payloads start with \x89PNG
    events = glob.glob(str(tmp_path / "tb" / "events.out.tfevents.*"))
    assert events
    blob = open(events[0], "rb").read()
    assert b"train/loss" in blob and b"val/EPE" in blob
    assert b"val/flow_panel" in blob and b"\x89PNG" in blob


def test_threaded_batches_match_serial():
    """num_workers>0 (the tf.data-feeder analog, dataset_base.py:1032-1083)
    must yield the exact same batch stream as the serial path — augmentation
    RNG draws happen on submit order either way."""
    from fisr_tpu.data.augment import AugmentOptions
    from fisr_tpu.data.flow_dataset import FlowDataset

    def make():
        return FlowDataset.synthetic_textured(
            n=10, h=40, w=40, seed=5, crop_hw=(32, 32),
            aug=AugmentOptions(), val_split=0.2)

    serial = list(make().batches(2, train=True, epoch_seed=1))
    threaded = list(make().batches(2, train=True, epoch_seed=1, num_workers=3))
    assert len(serial) == len(threaded) == 4
    for s, t in zip(serial, threaded):
        np.testing.assert_array_equal(s["x"], t["x"])
        np.testing.assert_array_equal(s["y"], t["y"])


def test_synthetic_textured_corpus():
    """The matching-learnable corpus: GT flow is the exact shift (warp
    identity holds on the interior) and textures carry multi-scale energy."""
    import jax.numpy as jnp

    from fisr_tpu.data.flow_dataset import FlowDataset
    from fisr_tpu.ops.warp import dense_image_warp

    ds = FlowDataset.synthetic_textured(n=4, h=64, w=64, seed=3, max_shift=4)
    assert ds.pairs.shape == (4, 2, 64, 64, 3) and ds.pairs.dtype == np.uint8
    x = ds.pairs.astype(np.float32) / 255.0
    # uniform flow per sample, within range
    assert np.all(ds.flows == ds.flows[:, :1, :1])
    assert np.abs(ds.flows).max() <= 4.0
    # img1(q) == img2(q + f): backward-warp img2 by the GT flow -> img1
    # (tolerance = uint8 quantization + double bilinear interpolation)
    warped = np.asarray(dense_image_warp(jnp.asarray(x[:, 1]),
                                         jnp.asarray(ds.flows)))
    err = np.abs(warped[:, 6:-6, 6:-6] - x[:, 0, 6:-6, 6:-6]).max()
    assert err < 0.08, err
    # dense local structure (the sinusoid corpus fails this at fine scales)
    assert x[:, 0].std() > 0.1
    grad = np.abs(np.diff(x[:, 0], axis=2)).mean()
    assert grad > 0.005, grad


def test_flow_panel_composer():
    """flow_panel/flow_panels: tile layout, dtype, shared flow normalization
    (visualize.plot_img_pairs_w_flows parity, visualize.py:18+)."""
    from fisr_tpu.utils.flow_viz import flow_panel, flow_panels, flow_to_img

    rng = np.random.default_rng(0)
    h, w, pad = 12, 16, 2
    img1 = rng.uniform(size=(h, w, 3))
    img2 = rng.uniform(size=(h, w, 3))
    flow = rng.normal(size=(h, w, 2)).astype(np.float32)
    gt = rng.normal(size=(h, w, 2)).astype(np.float32)

    row = flow_panel(img1, img2, flow)  # 3 tiles
    assert row.dtype == np.uint8 and row.shape == (h, 3 * w + 2 * pad, 3)
    # tile 0 is img1, tile 2 is the color-wheel rendering at flow's own max
    np.testing.assert_array_equal(row[:, :w], (img1 * 255).astype(np.uint8))
    mag_max = float(np.max(np.sqrt(np.sum(flow.astype(np.float64) ** 2, -1))))
    np.testing.assert_array_equal(row[:, 2 * (w + pad):],
                                  flow_to_img(flow, flow_mag_max=mag_max))

    full = flow_panel(img1, img2, flow, warped=img2, flow_gt=gt)  # 5 tiles
    assert full.shape == (h, 5 * w + 4 * pad, 3)
    # pred and gt share one normalization: gt tile uses the joint max
    joint = max(mag_max, float(np.max(np.sqrt(np.sum(gt.astype(np.float64) ** 2, -1)))))
    np.testing.assert_array_equal(full[:, 4 * (w + pad):],
                                  flow_to_img(gt, flow_mag_max=joint))

    batch = flow_panels(np.stack([np.stack([img1, img2])] * 3),
                        np.stack([flow] * 3), flow_gts=np.stack([gt] * 3))
    assert batch.shape == (3 * h + 2 * pad, 4 * w + 3 * pad, 3)


def test_augment_scale_flow_consistency():
    # Constant-flow pair: x2 is x1 shifted by f. After scale augmentation
    # (reference augment.py:113-122) the warp identity must still hold:
    # x2'(q) = x1'(q - ratio*f) on the interior.
    from fisr_tpu.data.augment import scale_keep_size

    h, w, f = 40, 48, (4, 2)  # flow (u=4 right, v=2 down)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    smooth = np.sin(xx / 7.0) + np.cos(yy / 5.0)
    x1 = np.stack([smooth] * 3, -1)
    x2 = np.stack([np.sin((xx - f[0]) / 7.0) + np.cos((yy - f[1]) / 5.0)] * 3, -1)
    y = np.zeros((h, w, 2)) + np.array(f, np.float64)

    opts = AugmentOptions(fliplr=-1.0, flipud=-1.0, translate_prob=-1.0,
                          scale_prob=1.1, scale_frac=0.05)
    rng = np.random.default_rng(7)
    xa, ya = augment_pair(np.stack([x1, x2]), y, opts, rng)

    # flow vectors scaled by the drawn ratio, uniformly
    ratios = ya[..., 0] / f[0]
    assert np.allclose(ratios[8:-8, 8:-8], ratios[10, 10])
    ratio = float(ratios[10, 10])
    assert 0.95 <= ratio <= 1.05 and ratio != 1.0

    # warp identity on the interior (bilinear tolerance)
    u = ya[10, 10, 0]
    v = ya[10, 10, 1]
    iu, iv = int(round(u)), int(round(v))
    interior = np.s_[12:-12, 12:-12]
    pred = np.roll(np.roll(xa[0], iv, axis=0), iu, axis=1)
    assert np.abs(pred[interior] - xa[1][interior]).mean() < 0.05


def test_scale_keep_size_shapes_and_identity():
    from fisr_tpu.data.augment import scale_keep_size

    img = np.random.default_rng(0).uniform(size=(32, 40, 3))
    for ratio in (0.95, 1.0, 1.05):
        out = scale_keep_size(img, ratio)
        assert out.shape == img.shape
    np.testing.assert_allclose(scale_keep_size(img, 1.0), img, atol=1e-12)
    # 2D arrays work too (single-channel path)
    assert scale_keep_size(img[..., 0], 0.97).shape == (32, 40)


def test_pwc_eval_report_schema(tmp_path):
    # model_pwcnet.py:817-885 parity: per-sample rows with
    # ID/EPE/Duration/Avg_Flow_Mag/Max_Flow_Mag + saved .flo/.png preds.
    import json

    from fisr_tpu.data.flow_dataset import FlowDataset
    from fisr_tpu.models import pwcnet
    from fisr_tpu.train.pwc_trainer import pwc_eval_report

    cfg = pwcnet.PWCNetConfig(pyr_lvls=3, flow_pred_lvl=2, search_range=2,
                              cost_volume_impl="xla")
    params = pwcnet.init_params(jax.random.PRNGKey(0), cfg)
    ds = FlowDataset.synthetic(n=5, h=32, w=32)
    report_path = str(tmp_path / "report.jsonl")
    preds_dir = str(tmp_path / "preds")
    avg_epe, avg_dur, rows = pwc_eval_report(
        params, ds, batch_size=1, cfg=cfg, save_preds_dir=preds_dir,
        report_path=report_path)

    assert len(rows) == ds.val_size
    for r in rows:
        assert set(r) == {"ID", "EPE", "Duration", "Avg_Flow_Mag",
                          "Max_Flow_Mag"}
        assert r["EPE"] >= 0 and r["Max_Flow_Mag"] >= r["Avg_Flow_Mag"]
    assert avg_epe == sum(r["EPE"] for r in rows) / len(rows)
    # JSONL round-trips
    loaded = [json.loads(line) for line in open(report_path)]
    assert loaded == rows
    # predictions written as .flo + viz png
    import os
    flos = [f for f in os.listdir(preds_dir) if f.endswith(".flo")]
    pngs = [f for f in os.listdir(preds_dir) if f.endswith(".png")]
    assert len(flos) == len(pngs) == len(rows)
    from fisr_tpu.data.flo import read_flo
    pred = read_flo(os.path.join(preds_dir, flos[0]))
    assert pred.shape == (32, 32, 2)
