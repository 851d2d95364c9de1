"""Reference-scale training contract receipt (round-4 VERDICT item 5).

Runs the reference's FULL training schedule shape (/root/reference/main.py:
33-37, 64-77, README.md:26-33) end to end on real TPU hardware:

  * 10,086 samples, the last 320 held out as validation (FISRnet.py:213-225)
  * batch 8  ->  1,220 steps/epoch, 100 epochs = 122,000 steps
    (the shipped checkpoint is FISRnet-122000 — same arithmetic)
  * Adam 1e-4, stair decay x0.1 at epoch boundaries [80, 90]
  * per-epoch latest checkpoint (Saver max_to_keep=1 parity) PLUS a best-k
    ledger ranked by val PSNR (the BestCheckpointSaver analog)
  * a deliberate mid-epoch interruption + resume: at epoch 50, batch 600
    the script checkpoints, discards ALL live state, restores, re-derives
    (epoch, batch) from the step (train/checkpoint.derive_epoch_batch =
    FISRnet.py:596-606) and ASSERTS (50, 600) before continuing the same
    epoch permutation at batch 600.

Corpus: the reference's 10,086-sample corpus was never released, so the run
uses the synthetic moving-scene corpus in the exact on-disk tensor layout.
10,086 distinct samples would need ~59 GB f32 in HBM; instead a 4,096-sample
base bank lives device-resident in COMPACT dtypes (uint8 images/warps — the
reference's own data originates from uint8 video frames — bfloat16 flows,
~6.9 GB) and sample i is a deterministic flow-consistent view of
bank[i % 4096]: code i//4096 in {identity, hflip (negate flow-u), vflip
(negate flow-v)} applied in-jit. Every step's gather+dequant+augment runs on
device; the host only feeds index arrays (relay-safe: train/loop.fit's
streaming path would be ~100x upload-bound through the 40 MB/s relay).

Run (behind the axon relay):
  env PYTHONPATH=/root/repo:$PYTHONPATH \\
      python scripts/train_fisr_reference_schedule.py --out_json PERF_ref_schedule.json
"""

import argparse
import json
import os
import time

import numpy as np

N_TOTAL = 10086
VAL_SIZE = 320
BATCH = 8
EPOCHS = 100
DECAY_EPOCHS = (80, 90)
BANK = 4096
INTERRUPT = (50, 600)  # (epoch, batch) of the simulated crash


def build_bank(n: int, hw: int, chunk: int = 512):
    """Host-side: synth corpus in compact dtypes (uint8 images, bf16 flows).

    Returns dict of numpy arrays in the merged [N, H, W, S*C] layout of
    data/dataset.TrainStore (uint8 arrays carry 0..255; flows carry the
    /h/2-normalized values in float16 — bf16 has no numpy dtype; cast to
    bfloat16 on device)."""
    from fisr_tpu.data.dataset import _merge
    from fisr_tpu.data.synth import synthetic_arrays

    out = None
    for lo in range(0, n, chunk):
        m = min(chunk, n - lo)
        a = synthetic_arrays(m, hw, hw, seed=1000 + lo)
        part = {
            "data": np.uint8(np.clip(np.round(_merge(a["lr"])), 0, 255)),
            "label": np.uint8(np.clip(np.round(_merge(a["hr"])), 0, 255)),
            "warp": np.uint8(np.clip(np.round(_merge(a["warp"])), 0, 255)),
            "warp_ss2": np.uint8(np.clip(np.round(_merge(a["warp_ss2"])), 0, 255)),
            "flow": np.float16(_merge(a["flow"]) / hw / 2.0),
            "flow_ss2": np.float16(_merge(a["flow_ss2"]) / hw / 2.0),
        }
        if out is None:
            out = {k: np.empty((n,) + v.shape[1:], v.dtype)
                   for k, v in part.items()}
        for k, v in part.items():
            out[k][lo : lo + m] = v
        print(f"  bank {lo + m}/{n}", flush=True)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=EPOCHS)
    ap.add_argument("--hw", type=int, default=96)
    ap.add_argument("--bank", type=int, default=BANK)
    ap.add_argument("--n_total", type=int, default=N_TOTAL)
    ap.add_argument("--val_size", type=int, default=VAL_SIZE)
    ap.add_argument("--batch", type=int, default=BATCH)
    ap.add_argument("--ckpt_dir", type=str,
                    default="checkpoint_dir/FISRnet_exp_refsched")
    ap.add_argument("--out_json", type=str, default="PERF_ref_schedule.json")
    ap.add_argument("--resume", action="store_true",
                    help="continue from the latest checkpoint in --ckpt_dir")
    ap.add_argument("--interrupt", type=str, default="50,600",
                    help="'EPOCH,BATCH' of the simulated crash+resume "
                         "assertion ('none' disables)")
    ap.add_argument("--step_timeout_s", type=float, default=300.0,
                    help="watchdog: abort (exit 86) if no fenced step/val "
                         "completes within this window, so a supervisor "
                         "restarts with --resume (0 disables). Added after "
                         "a relay RPC wedged this run silently for 49 min.")
    args = ap.parse_args()
    global INTERRUPT
    if args.interrupt == "none":
        INTERRUPT = None
    else:
        INTERRUPT = tuple(int(v) for v in args.interrupt.split(","))

    import jax
    import jax.numpy as jnp

    from fisr_tpu.train import schedule
    from fisr_tpu.train.checkpoint import CheckpointManager, derive_epoch_batch
    from fisr_tpu.train.trainer import (TrainState, adam_with_schedule,
                                        create_state, make_train_step,
                                        make_val_step)
    from fisr_tpu.ops.conv import Policy

    n_train = args.n_total - args.val_size
    iters = n_train // args.batch
    nb = args.bank
    assert args.n_total <= 3 * nb, "3 aug codes cover at most 3*bank samples"
    print(f"[refsched] {args.n_total} samples ({n_train} train / "
          f"{args.val_size} val), batch {args.batch} -> {iters} steps/epoch, "
          f"{args.epochs} epochs = {iters * args.epochs} steps", flush=True)

    print("[refsched] building compact bank on host ...", flush=True)
    t0 = time.time()
    bank_np = build_bank(nb, args.hw)
    print(f"[refsched] bank built in {time.time()-t0:.0f} s; uploading "
          f"{sum(v.nbytes for v in bank_np.values())/2**30:.2f} GiB", flush=True)
    t0 = time.time()
    bank = {k: jnp.asarray(v) for k, v in bank_np.items()}
    for k in ("flow", "flow_ss2"):
        bank[k] = bank[k].astype(jnp.bfloat16)
    float(jnp.sum(bank["label"][0, :2, :2, 0]).astype(jnp.float32))  # fence
    del bank_np
    print(f"[refsched] uploaded in {time.time()-t0:.0f} s", flush=True)

    # flow-u channels are even merged indices, flow-v odd (seq-major merge)
    def flow_signs(nc, comp):
        s = np.ones(nc, np.float32)
        s[comp::2] = -1.0
        return jnp.asarray(s)

    su = {k: flow_signs(bank[k].shape[-1], 0) for k in ("flow", "flow_ss2")}
    sv = {k: flow_signs(bank[k].shape[-1], 1) for k in ("flow", "flow_ss2")}

    def gather(bank, idx):
        """idx [B] global sample ids -> dequantized, augmented f32 batch.

        `bank` rides as an ARGUMENT (already device-committed, zero
        transfer): a closure capture would bake the 6.9 GB bank into the
        lowering as constants and duplicate it in HBM."""
        b = idx % nb
        code = (idx // nb)[:, None, None, None]
        out = {}
        for k in ("data", "label", "warp", "warp_ss2", "flow", "flow_ss2"):
            x = jnp.take(bank[k], b, axis=0)
            if x.dtype == jnp.uint8:
                x = x.astype(jnp.float32) / 255.0
                xh, xv = x[:, :, ::-1, :], x[:, ::-1, :, :]
            else:
                x = x.astype(jnp.float32)
                xh = x[:, :, ::-1, :] * su[k]
                xv = x[:, ::-1, :, :] * sv[k]
            out[k] = jnp.where(code == 1, xh, jnp.where(code == 2, xv, x))
        return out

    policy = Policy(jnp.bfloat16)
    boundaries = [e * iters for e in DECAY_EPOCHS]
    opt = adam_with_schedule(schedule.stair_decay(1e-4, boundaries, 0.1))
    step = make_train_step(opt, policy=policy, donate=True)
    val_step = make_val_step(policy=policy)
    import functools

    _gather_jit = jax.jit(gather)
    gather_j = functools.partial(_gather_jit, bank)

    def make_fresh_state():
        return create_state(jax.random.PRNGKey(0), opt)

    mgr_latest = CheckpointManager(args.ckpt_dir, max_to_keep=1)
    mgr_best = CheckpointManager(os.path.join(args.ckpt_dir, "best"),
                                 max_to_keep=3, best_mode="max")

    state = make_fresh_state()
    start_epoch, start_batch = 0, 0
    if args.resume and mgr_latest.latest_step() is not None:
        tree = mgr_latest.restore(item={"params": state.params,
                                        "opt_state": state.opt_state,
                                        "step": state.step})
        state = TrainState(tree["params"], tree["opt_state"], tree["step"])
        start_epoch, start_batch = derive_epoch_batch(int(state.step), iters)
        print(f"[refsched] resumed step {int(state.step)} -> epoch "
              f"{start_epoch}, batch {start_batch}", flush=True)

    val_ids = np.arange(n_train, args.n_total)

    def run_val(params, vb=32):
        ps = []
        for i in range(0, args.val_size, vb):
            batch = gather_j(jnp.asarray(val_ids[i : i + vb]))
            ps.append(float(val_step(params, {"data": batch["data"],
                                              "flow": batch["flow"],
                                              "warp": batch["warp"],
                                              "label": batch["label"]}
                                     )["val_PSNR"]))
        return float(np.mean(ps))

    curve = []
    interrupt_verified = False
    if args.resume and os.path.exists(args.out_json):
        # Session-level resume (the driver restarted us): keep the receipt's
        # earlier epochs and the interrupt-verification flag instead of
        # clobbering them with a fresh curve.
        with open(args.out_json) as f:
            prev = json.load(f)
        curve = [c for c in prev.get("curve", []) if c["epoch"] < start_epoch]
        interrupt_verified = prev.get("interrupt_resume", {}).get(
            "verified", False)
        print(f"[refsched] carried over {len(curve)} epochs of curve from "
              f"{args.out_json}", flush=True)
    # Only disarm the simulated crash if the run already passed that point.
    interrupted_once = interrupt_verified or (
        args.resume and (start_epoch, start_batch) >= (INTERRUPT or (0, 0)))
    from fisr_tpu.utils.watchdog import Heartbeat

    # Beats land only on FENCED readbacks (every 200 steps ≈ 25 s, val,
    # epoch save) — a wedged relay stops those first. 300 s default covers
    # the slowest legitimate gap (first-epoch compile ≈ 70 s) with margin.
    hb = (Heartbeat(args.step_timeout_s, name="refsched").start()
          if args.step_timeout_s > 0 else None)
    t_run = time.time()
    step_times = []
    ep = start_epoch
    # finally: an escaping exception must disarm the watchdog, or the
    # armed monitor exit-86s a no-longer-hung process and the supervisor
    # restarts a deterministic failure (ADVICE r4).
    try:
        while ep < args.epochs:
            rng = np.random.default_rng(12345 + ep)  # epoch-seeded permutation
            perm = rng.permutation(n_train)
            first = start_batch if ep == start_epoch else 0
            loss = None
            t_ep = time.time()
            for s in range(first, iters):
                idx = jnp.asarray(perm[s * args.batch : (s + 1) * args.batch])
                t1 = time.time()
                state, metrics = step(state, gather_j(idx))
                loss = metrics["total_loss"]
                if s % 200 == 100:
                    # fence once in a while for an honest step-time sample
                    lv = float(loss)
                    if hb is not None:
                        hb.beat()
                    step_times.append(time.time() - t1)
                    print(f"  epoch {ep:3d} step {s:4d}/{iters} "
                          f"loss {lv:.4f}", flush=True)
                if (INTERRUPT and not interrupted_once
                        and (ep, s + 1) == INTERRUPT):
                    # ---- simulated crash + resume (the receipt's assertion) ----
                    gstep = int(jax.device_get(state.step))
                    assert gstep == ep * iters + s + 1, (gstep, ep, s)
                    mgr_latest.save(gstep, {"params": state.params,
                                            "opt_state": state.opt_state,
                                            "step": state.step})
                    print(f"[refsched] INTERRUPT at step {gstep}: discarding "
                          "live state, restoring from checkpoint", flush=True)
                    fresh = make_fresh_state()
                    tree = mgr_latest.restore(item={"params": fresh.params,
                                                    "opt_state": fresh.opt_state,
                                                    "step": fresh.step})
                    state = TrainState(tree["params"], tree["opt_state"],
                                       tree["step"])
                    re_e, re_b = derive_epoch_batch(int(state.step), iters)
                    assert (re_e, re_b) == INTERRUPT, (
                        f"mid-epoch resume derivation broken: {(re_e, re_b)} "
                        f"!= {INTERRUPT}")
                    print(f"[refsched] RESUME OK: step {int(state.step)} -> "
                          f"epoch {re_e}, batch {re_b} (mid-epoch, same "
                          "permutation continues)", flush=True)
                    interrupted_once = True
                    interrupt_verified = True
            val_psnr = run_val(state.params)
            gstep = int(jax.device_get(state.step))
            mgr_latest.save(gstep, {"params": state.params,
                                    "opt_state": state.opt_state,
                                    "step": state.step})
            mgr_best.save(gstep, {"params": state.params}, metric=val_psnr)
            if hb is not None:
                hb.beat()
            curve.append({"epoch": ep, "step": gstep, "loss": float(loss),
                          "val_psnr": val_psnr,
                          "wall_s": round(time.time() - t_run, 1)})
            print(f"epoch {ep + 1:3d}/{args.epochs}  val_PSNR {val_psnr:7.3f} dB"
                  f"  loss {float(loss):.4f}  epoch_wall {time.time()-t_ep:.0f} s",
                  flush=True)
            with open(args.out_json, "w") as f:
                json.dump({"schedule": {"n_total": args.n_total,
                                        "val_size": args.val_size,
                                        "batch": args.batch, "iters": iters,
                                        "epochs": args.epochs,
                                        "stair_decay_epochs": list(DECAY_EPOCHS),
                                        "bank": nb},
                           "interrupt_resume": {
                               "at": list(INTERRUPT) if INTERRUPT else None,
                               "verified": interrupt_verified},
                           "curve": curve,
                           "best_ledger": mgr_best._read_ledger()["entries"]},
                          f, indent=1)
            ep += 1
    finally:
        if hb is not None:
            hb.stop()
    print(f"[refsched] done: {iters * args.epochs} steps, "
          f"final val_PSNR {curve[-1]['val_psnr']:.3f} dB, "
          f"total wall {(time.time()-t_run)/60:.1f} min", flush=True)


if __name__ == "__main__":
    main()
