"""On-hardware PWC-Net training convergence demo (real TPU, bf16 policy).

The tfoptflow stack's training path (model_pwcnet.py:587-788) rebuilt as a
jitted step: multiscale pyramid loss + Adam, bf16 activations / f32 params
(no loss scaling). Trains on the synthetic flow corpus (translating-scene
pairs with true-motion labels) and reports train loss + val EPE, the
reference's checkpoint-ranking metric.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from fisr_tpu.data.flow_dataset import FlowDataset
from fisr_tpu.models import pwcnet
from fisr_tpu.ops.conv import Policy
from fisr_tpu.train.pwc_trainer import (create_pwc_state, make_pwc_eval_step,
                                        make_pwc_train_step)


def main(steps: int = 300, batch: int = 8):
    cfg = pwcnet.PWCNetConfig()
    policy = Policy(jnp.bfloat16)
    ds = FlowDataset.synthetic(n=96, h=128, w=128, seed=0)
    opt = optax.adam(1e-4)
    state = create_pwc_state(jax.random.PRNGKey(0), opt, cfg)
    train_step = make_pwc_train_step(opt, cfg, policy)
    eval_step = make_pwc_eval_step(cfg, policy)

    def val_epe(state):
        es = []
        for b in ds.batches(batch_size=4, train=False, epoch_seed=0):
            es.append(float(np.mean(eval_step(state.params, b)["epe"])))
        return float(np.mean(es))

    print(f"initial val EPE: {val_epe(state):.3f} px", flush=True)
    it = 0
    t0 = time.time()
    losses = []
    while it < steps:
        for b in ds.batches(batch_size=batch, train=True, epoch_seed=it):
            state, m = train_step(state, b)
            losses.append(m["loss"])
            it += 1
            if it % 50 == 0:
                loss = float(np.mean([float(x) for x in losses[-50:]]))
                print(f"step {it:4d}  loss {loss:9.4f}  "
                      f"val EPE {val_epe(state):6.3f} px  "
                      f"({(time.time()-t0)/it*1e3:.0f} ms/step incl host I/O)",
                      flush=True)
            if it >= steps:
                break


if __name__ == "__main__":
    main()
