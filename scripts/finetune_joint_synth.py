"""Joint end-to-end fine-tune receipt: flow + FISRnet trained as ONE program.

Starts from the synthetic checkpoints (FISRnet exp99 + pwcnet_synth), then
fine-tunes against final window quality THROUGH the flow stage — the thing
the reference's three-session video path cannot do. Prints held-out window
PSNR before/after (and per-eval deltas), optionally with the flow model
frozen for ablation.

Run on the real TPU:
  env PYTHONPATH=/root/repo:/root/.axon_site python scripts/finetune_joint_synth.py
"""

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--hw", type=int, default=96)
    ap.add_argument("--n_train", type=int, default=256)
    ap.add_argument("--n_val", type=int, default=32)
    ap.add_argument("--fisr_lr", type=float, default=5e-5)
    ap.add_argument("--pwc_lr", type=float, default=1e-6)
    ap.add_argument("--cosine", action="store_true",
                    help="cosine-decay both lrs to 0 over --steps (use for "
                         "longer multi-epoch schedules)")
    ap.add_argument("--flow_scale", type=int, default=2, choices=(1, 2),
                    help="2 = reference-parity x2-upscaled flow; 1 = the "
                         "fast serving mode — fine-tuning WITH flow_scale 1 "
                         "specializes the checkpoint to it")
    ap.add_argument("--freeze_pwc", action="store_true")
    ap.add_argument("--eval_every", type=int, default=50)
    ap.add_argument("--fisr_ckpt", default="checkpoint_dir/FISRnet_exp99")
    ap.add_argument("--pwc_ckpt", default="checkpoint_dir/pwcnet")
    ap.add_argument("--save_dir", default=None,
                    help="save the fine-tuned trees as <save_dir>/FISRnet_joint"
                         " and <save_dir>/pwcnet_joint")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from fisr_tpu.data.synth import synthetic_video_windows
    from fisr_tpu.infer.video import make_fused_video_step
    from fisr_tpu.models import fisrnet, pwcnet
    from fisr_tpu.ops.conv import Policy
    from fisr_tpu.ops.metrics import psnr_image
    from fisr_tpu.train.checkpoint import CheckpointManager
    from fisr_tpu.train.joint import create_joint_state, make_joint_train_step

    def load(path, init_fn, key, best=False):
        mgr = CheckpointManager(path, best_mode="min") if best else \
            CheckpointManager(path)
        if mgr.latest_step() is not None:
            tree = mgr.restore(mgr.best_step() if best else None)
            print(f" [*] restored {path}")
            return tree["params"] if isinstance(tree, dict) and "params" in tree else tree
        print(f" [!] no ckpt at {path}; fresh init")
        return init_fn(jax.random.PRNGKey(key))

    fisr0 = load(args.fisr_ckpt, fisrnet.init_params, 0)
    pwc0 = load(args.pwc_ckpt, pwcnet.init_params, 1, best=True)

    policy = Policy(jnp.bfloat16)
    # device-resident windows (~420 MB at the defaults): per-step host
    # uploads through the relay would dominate the step time
    fr_tr, tg_tr = synthetic_video_windows(args.n_train, args.hw, args.hw, 0)
    fr_va, tg_va = synthetic_video_windows(args.n_val, args.hw, args.hw, 999)
    fr_tr = jnp.asarray(fr_tr)
    tg_tr = jnp.asarray(tg_tr)
    fr_va = jnp.asarray(fr_va)
    tg_va = jnp.asarray(tg_va)

    fwd = make_fused_video_step(policy=policy, upscale=args.flow_scale)

    def val_psnr(fisr_params, pwc_params):
        vals = []
        for i in range(0, args.n_val, args.batch):
            pred = fwd(fisr_params, pwc_params,
                       fr_va[i : i + args.batch])
            vals.append(np.asarray(psnr_image(pred,
                                              tg_va[i : i + args.batch])))
        return float(np.mean(np.concatenate(vals)))

    def sched(lr):
        if not args.cosine:
            return lr
        return optax.cosine_decay_schedule(lr, args.steps)

    fisr_opt = optax.adam(sched(args.fisr_lr))
    pwc_opt = None if args.freeze_pwc else optax.adam(sched(args.pwc_lr))
    step = make_joint_train_step(fisr_opt, pwc_opt, policy=policy,
                                 upscale=args.flow_scale)
    state = create_joint_state(fisr0, pwc0, fisr_opt, pwc_opt)

    p0 = val_psnr(state.fisr_params, state.pwc_params)
    print(f"step     0  val window PSNR {p0:7.3f} dB"
          f"  (pwc {'frozen' if args.freeze_pwc else 'trained'})")

    rng = np.random.default_rng(0)
    t0 = time.time()
    for s in range(1, args.steps + 1):
        idx = jnp.asarray(rng.choice(args.n_train, args.batch, replace=False))
        batch = {"frames": jnp.take(fr_tr, idx, axis=0),
                 "target": jnp.take(tg_tr, idx, axis=0)}
        state, metrics = step(state, batch)
        if s % args.eval_every == 0 or s == args.steps:
            p = val_psnr(state.fisr_params, state.pwc_params)
            print(f"step {s:5d}  val window PSNR {p:7.3f} dB  "
                  f"(train loss {float(metrics['joint_loss']):.5f}, "
                  f"{(time.time()-t0)/s:.2f} s/step)")
    print(f"delta: {p - p0:+.3f} dB over {args.steps} joint steps")
    if args.save_dir:
        import os

        sfx = "_fast" if args.flow_scale == 1 else ""
        for name, params, metric in (
                (f"FISRnet_joint{sfx}", state.fisr_params, p),
                (f"pwcnet_joint{sfx}", state.pwc_params, None)):
            mgr = CheckpointManager(os.path.join(args.save_dir, name))
            mgr.save(args.steps, {"params": params}, metric=metric)
        print(f" [*] saved fine-tuned checkpoints under {args.save_dir}")


if __name__ == "__main__":
    main()
