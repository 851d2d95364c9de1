"""CLI driver: `python -m fisr_tpu.cli.main --phase {train,test,FISR_for_video}`.

Flag-compatible rebuild of the reference driver (main.py:23-106), with its
known flag bugs fixed: grid/size options are proper `int int` pairs instead
of `type=tuple` (which split CLI strings into characters, main.py:89-102).

Phases (main.py:123-236 dispatch parity):
  train          — fit on the .mat/.flo corpus, then auto-run test
  test           — 4K benchmark eval from precomputed .flo/.mat inputs
  FISR_for_video — flow -> warp -> FISRnet over a folder of YUV PNGs
"""

from __future__ import annotations

import argparse
import os

__all__ = ["parse_args", "main"]


def parse_args(argv=None):
    desc = "FISR-TPU: joint VFI+SR with a multi-scale temporal loss (TPU-native)"
    p = argparse.ArgumentParser(description=desc)
    p.add_argument("--net_type", type=str, default="FISRnet", choices=["FISRnet"])
    p.add_argument("--phase", type=str, default="FISR_for_video",
                   choices=["train", "test", "FISR_for_video"])
    p.add_argument("--scale_factor", type=int, default=2)
    p.add_argument("--ssim_impl", type=str, default="gaussian",
                   choices=["gaussian", "pil"],
                   help="test-phase SSIM scorer: standard Gaussian SSIM, or "
                        "'pil' = the reference's SSIM_PIL tile algorithm "
                        "(FISRnet.py:890-891) for digit-level comparability")
    p.add_argument("--compute_dtype", type=str, default="bfloat16",
                   choices=["bfloat16", "float32"],
                   help="activation dtype (params always f32)")
    p.add_argument("--jax_cache_dir", type=str, default=None,
                   help="enable JAX's persistent compilation cache at this "
                        "directory — cross-process reuse of compiled "
                        "programs (measured 2.4x faster second-process "
                        "startup through the axon relay; full hit rate on "
                        "local TPU hosts)")
    p.add_argument("--eval_engine", type=str, default="exact",
                   choices=["exact", "fast"],
                   help="test-phase inference engine: 'exact' reproduces the "
                        "reference patch tiling bit-for-bit (host-staged); "
                        "'fast' runs the fully-jitted device path (in-jit "
                        "tiling + stale-halo shrink + fast upsample) — "
                        "padded-class quality, production throughput")

    # directories / data
    p.add_argument("--train_data_path", type=str,
                   default="./data/train/LR_LFR/LR_Surfing_SlamDunk_5seq.mat")
    p.add_argument("--train_flow_data_path", type=str,
                   default="./data/train/flow/LR_Surfing_SlamDunk_5seq_ss1.flo")
    p.add_argument("--train_flow_ss2_data_path", type=str,
                   default="./data/train/flow/LR_Surfing_SlamDunk_5seq_ss2.flo")
    p.add_argument("--train_warped_data_path", type=str,
                   default="./data/train/warped/LR_Surfing_SlamDunk_5seq_ss1_warp.mat")
    p.add_argument("--train_wapred_ss2_data_path", type=str,
                   default="./data/train/warped/LR_Surfing_SlamDunk_5seq_ss2_warp.mat")
    p.add_argument("--train_label_path", type=str,
                   default="./data/train/HR_HFR/HR_Surfing_SlamDunk_5seq.mat")
    p.add_argument("--test_data_path", type=str, default="./data/test/LR_LFR")
    p.add_argument("--test_flow_data_path", type=str,
                   default="./data/test/flow/LR_Surfing_SlamDunk_test_ss1.flo")
    p.add_argument("--test_warped_data_path", type=str,
                   default="./data/test/warped/LR_Surfing_SlamDunk_test_ss1_warp.mat")
    p.add_argument("--test_label_path", type=str, default="./data/test/HR_HFR")
    p.add_argument("--test_img_dir", type=str, default="./test_img_dir")
    p.add_argument("--text_dir", type=str, default="./text_dir")
    p.add_argument("--checkpoint_dir", type=str, default="./checkpoint_dir")
    p.add_argument("--log_dir", type=str, default="./logdir")

    # training hyperparameters (main.py:64-77)
    p.add_argument("--exp_num", type=int, default=1)
    p.add_argument("--epoch", type=int, default=100)
    p.add_argument("--freq_display", type=int, default=100)
    p.add_argument("--step_timeout_s", type=float, default=0.0,
                   help="extension (no reference analog): arm the "
                        "utils.watchdog heartbeat — exit 86 if no train/val "
                        "step completes within this window, so a supervisor "
                        "(python -m fisr_tpu.utils.supervisor) restarts and "
                        "training resumes from the last checkpoint. 0 = off. "
                        "Size it past first-compile (10-70 s on the relay).")
    p.add_argument("--init_lr", type=float, default=1e-4)
    p.add_argument("--lr_type", type=str, default="stair_decay",
                   choices=["linear_decay", "stair_decay", "no_decay"])
    p.add_argument("--lr_stair_decay_points", type=int, nargs="+", default=[80, 90])
    p.add_argument("--lr_decreasing_factor", type=float, default=0.1)
    p.add_argument("--lr_linear_decay_point", type=int, default=50)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--val_batch_size", type=int, default=2)
    p.add_argument("--val_data_size", type=int, default=320)

    # loss lambdas (main.py:80-85)
    p.add_argument("--recn_lambda", type=float, default=1.0)
    p.add_argument("--tm1_lambda", type=float, default=1.0)
    p.add_argument("--tm2_lambda", type=float, default=0.1)
    p.add_argument("--tmm_lambda", type=float, default=1.0)
    p.add_argument("--td_lambda", type=float, default=0.1)
    p.add_argument("--ss2_lambda", type=float, default=1.0)

    # test settings (fixed: int pairs, not type=tuple)
    p.add_argument("--test_patch", type=int, nargs=2, default=[2, 2])
    p.add_argument("--test_input_size", type=int, nargs=2, default=[1080, 1920])

    # FISR_for_video settings
    p.add_argument("--frame_folder_path", type=str, default="./FISR_test_folder/scene1")
    p.add_argument("--video_out_dir", type=str, default=None,
                   help="where FISR_for_video writes output frames "
                        "(default: <frame_folder>/FISR_frames, the "
                        "reference layout — use this when the frame folder "
                        "is read-only)")
    p.add_argument("--FISR_input_size", type=int, nargs=2, default=[1080, 1920])
    p.add_argument("--frame_num", type=int, default=5)
    p.add_argument("--FISR_test_patch", type=int, nargs=2, default=[2, 2])
    p.add_argument("--fisr_tf_ckpt", type=str, default=None,
                   help="TF1 TensorBundle checkpoint PREFIX for FISRnet "
                        "(e.g. .../FISRnet-122000): ONE-COMMAND parity path "
                        "— read + convert + run, no separate convert step. "
                        "Takes precedence over the experiment checkpoint "
                        "dir. See PARITY.md 'Real-weight parity runbook'.")
    p.add_argument("--pwc_tf_ckpt", type=str, default=None,
                   help="TF1 TensorBundle checkpoint PREFIX for PWC-Net "
                        "(e.g. .../pwcnet.ckpt-595000): read + convert + "
                        "run for the video phase's flow stage. Takes "
                        "precedence over --pwc_ckpt.")
    p.add_argument("--pwc_ckpt", type=str, default=None,
                   help="PWC-Net checkpoint directory for the video phase's "
                        "flow stage (a CheckpointManager dir — what "
                        "`fisr_tpu.convert.cli --model pwcnet` or "
                        "`train.pwc_trainer.pwc_fit` writes). Default: "
                        "<checkpoint_dir>/pwcnet if it holds a checkpoint; "
                        "otherwise fresh random init with a loud warning "
                        "(the reference restores its flow ckpt at "
                        "model_base.py:115-191, wired from main.py:211)")
    p.add_argument("--flow_scale", type=int, default=2, choices=[1, 2],
                   help="video-phase flow-stage input scale. 2 = reference "
                        "parity (x2-upscale each pair before PWC-Net, scale "
                        "the flow back — FISR_for_video_pwcnet_predict_from_"
                        "img_test.py:116-141). 1 = explicit FAST mode: flow "
                        "at native resolution (~1.5x pipeline throughput at "
                        "2K; quality trade quantified in PARITY.md)")
    p.add_argument("--fused", action="store_true",
                   help="run the video phase as one fused on-device program "
                        "per window (no .flo/.mat round-trip)")
    p.add_argument("--fisr_grid", type=str, default="full",
                   help="fused window stage FISRnet tiling: 'full' "
                        "(default: no tiling — reference video-phase "
                        "parity), 'auto' (measured heuristic incl. "
                        "edge-padded grids; faster, 36.8 dB-class "
                        "deviation vs full-frame at 1080p, PARITY.md), "
                        "'tuned' (autotune cache, cli.tune), or 'GH,GW'")

    args = p.parse_args(argv)
    for d in (args.checkpoint_dir, args.text_dir, args.log_dir, args.test_img_dir):
        os.makedirs(d, exist_ok=True)
    if args.jax_cache_dir:
        import jax

        jax.config.update("jax_compilation_cache_dir", args.jax_cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return args


def _policy(args):
    import jax.numpy as jnp

    from fisr_tpu.ops.conv import Policy

    return Policy(jnp.bfloat16 if args.compute_dtype == "bfloat16" else jnp.float32)


def _model_dir(args) -> str:
    return f"FISRnet_exp{args.exp_num}"


def _load_params(args):
    """Restore FISRnet params: --fisr_tf_ckpt (direct TF1-bundle import),
    else the experiment checkpoint, else fresh init."""
    import jax

    from fisr_tpu.models import fisrnet
    from fisr_tpu.train.checkpoint import CheckpointManager

    if getattr(args, "fisr_tf_ckpt", None):
        from fisr_tpu.convert.tf_import import load_tf_checkpoint

        params = load_tf_checkpoint(args.fisr_tf_ckpt, "fisrnet")
        print(f" [*] imported TF1 FISRnet checkpoint {args.fisr_tf_ckpt}")
        return params
    ckpt = os.path.join(args.checkpoint_dir, _model_dir(args))
    mgr = CheckpointManager(ckpt)
    if mgr.latest_step() is not None:
        tree = mgr.restore()
        params = tree["params"] if isinstance(tree, dict) and "params" in tree else tree
        print(f" [*] restored checkpoint step {mgr.latest_step()}")
        return params
    print(" [!] no checkpoint found — using fresh init")
    return fisrnet.init_params(jax.random.PRNGKey(0))


def _load_pwc_params(args):
    """Restore PWC-Net params for the video phase's flow stage.

    Looks at --pwc_ckpt, else <checkpoint_dir>/pwcnet. Picks the ledger's
    best step (min val EPE) when metrics were recorded, else the latest.
    Falls back to fresh init with a loud warning — a random flow stage
    makes the video phase's interpolation quality meaningless.
    """
    import jax

    from fisr_tpu.models import pwcnet
    from fisr_tpu.train.checkpoint import CheckpointManager

    if getattr(args, "pwc_tf_ckpt", None):
        from fisr_tpu.convert.tf_import import load_tf_checkpoint

        params = load_tf_checkpoint(args.pwc_tf_ckpt, "pwcnet")
        print(f" [*] imported TF1 PWC-Net checkpoint {args.pwc_tf_ckpt}")
        return params
    path = args.pwc_ckpt or os.path.join(args.checkpoint_dir, "pwcnet")
    if os.path.isdir(path):
        mgr = CheckpointManager(path, best_mode="min")
        if mgr.latest_step() is not None:
            step = mgr.best_step()
            tree = mgr.restore(step)
            params = tree["params"] if isinstance(tree, dict) and "params" in tree else tree
            print(f" [*] restored PWC-Net checkpoint step {step} from {path}")
            return params
    if args.pwc_ckpt:
        raise FileNotFoundError(f"--pwc_ckpt {args.pwc_ckpt}: no checkpoint found")
    print(" [!] WARNING: no PWC-Net checkpoint at "
          f"{path} — flow stage runs on RANDOM weights; interpolated frames "
          "will be conditioned on noise flows. Convert the released "
          "pwcnet.ckpt-595000 via fisr_tpu.convert.cli or train one with "
          "train.pwc_trainer.pwc_fit, then pass --pwc_ckpt.")
    return pwcnet.init_params(jax.random.PRNGKey(1))


def run_train(args):
    from fisr_tpu.data.dataset import TrainStore
    from fisr_tpu.train.loop import fit
    from fisr_tpu.train.losses import LossWeights

    # arg dump parity (main.py:131-134)
    with open(os.path.join(args.text_dir, f"exp_{args.exp_num}.txt"), "a") as log:
        log.write("----- Model parameters -----\n")
        for k, v in vars(args).items():
            log.write(f"{k} : {v}\n")

    from fisr_tpu.models import fisrnet
    from fisr_tpu.utils.summary import print_params
    import jax as _jax

    print_params(fisrnet.init_params(_jax.random.PRNGKey(0)), name="FISRnet")

    store = TrainStore.from_files(
        args.train_data_path, args.train_label_path, args.train_flow_data_path,
        args.train_flow_ss2_data_path, args.train_warped_data_path,
        args.train_wapred_ss2_data_path, val_size=args.val_data_size,
    )
    weights = LossWeights(recn=args.recn_lambda, tm1=args.tm1_lambda,
                          tm2=args.tm2_lambda, tmm=args.tmm_lambda,
                          td=args.td_lambda, ss2=args.ss2_lambda)
    fit(store,
        ckpt_dir=os.path.join(args.checkpoint_dir, _model_dir(args)),
        log_dir=os.path.join(args.log_dir, _model_dir(args)),
        epochs=args.epoch, batch_size=args.batch_size,
        val_batch_size=args.val_batch_size, init_lr=args.init_lr,
        lr_type=args.lr_type, lr_stair_decay_points=args.lr_stair_decay_points,
        lr_decreasing_factor=args.lr_decreasing_factor,
        lr_linear_decay_point=args.lr_linear_decay_point,
        loss_weights=weights, freq_display=args.freq_display,
        policy=_policy(args),
        step_timeout_s=args.step_timeout_s or None)


def run_test(args):
    from fisr_tpu.infer.evaluate import evaluate_test_set

    params = _load_params(args)
    if args.eval_engine == "fast":
        from fisr_tpu.infer.device import FastTiledRunner

        runner = FastTiledRunner(params, grid=tuple(args.test_patch),
                                 boundary=32, sf=args.scale_factor,
                                 policy=_policy(args))
    else:
        from fisr_tpu.infer.tiled import TiledRunner

        runner = TiledRunner(params, grid=tuple(args.test_patch), boundary=32,
                             sf=args.scale_factor, policy=_policy(args))
    return evaluate_test_set(
        runner, args.test_data_path, args.test_label_path,
        args.test_flow_data_path, args.test_warped_data_path,
        out_dir=os.path.join(args.test_img_dir, _model_dir(args)),
        input_size=tuple(args.test_input_size),
        ssim_impl=args.ssim_impl,
    )


def _parse_fisr_grid(s: str):
    """'full' -> None (untiled), 'auto'/'tuned' pass through, else 'GH,GW'
    (one grammar shared with cli/serve.py via cli/_common.py)."""
    from fisr_tpu.cli._common import parse_grid

    return parse_grid(s)


def run_video(args):
    from fisr_tpu.infer.video import run_video_pipeline

    params = _load_params(args)
    pwc_params = _load_pwc_params(args)
    return run_video_pipeline(
        params, pwc_params, args.frame_folder_path,
        out_folder=args.video_out_dir,
        grid=tuple(args.FISR_test_patch), policy=_policy(args),
        write_artifacts=not args.fused, frame_num=args.frame_num,
        fused=args.fused, flow_upscale=args.flow_scale,
        fisr_grid=_parse_fisr_grid(args.fisr_grid),
    )


def main(argv=None):
    args = parse_args(argv)
    print(f"Model: {args.net_type}, phase: {args.phase}, exp: {args.exp_num}")
    result = None
    if args.phase == "train":
        run_train(args)
        print("[*] Training finished! Testing starts")
        result = run_test(args)
    elif args.phase == "test":
        result = run_test(args)
    else:
        result = run_video(args)
    print(f"[*] {args.phase} finished!")
    return result


if __name__ == "__main__":
    main()
