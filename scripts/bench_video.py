"""Fused video pipeline benchmark (real TPU): one XLA program per window.

Measures ms/window for a 2K 1056x1920 YUV window -> three 4K frames, in the
reference-parity mode (x2-upscaled flow, FISR_for_video semantics) and the
fast mode (native-res flow). New-4K-frames/s counts 2 per window (adjacent
windows overlap by one output frame). Compare to the reference's three
TF sessions + .flo/.mat disk round-trips (main.py:211-217).
"""
import time

import jax
import jax.numpy as jnp

from fisr_tpu.infer.video import make_fused_video_step
from fisr_tpu.models import fisrnet, pwcnet
from fisr_tpu.ops.conv import Policy


def main():
    policy = Policy(jnp.bfloat16)
    cfg = pwcnet.PWCNetConfig()
    fisr_params = fisrnet.init_params(jax.random.PRNGKey(0))
    pwc_params = pwcnet.init_params(jax.random.PRNGKey(1), cfg)
    h, w = 1056, 1920
    frames = jax.random.uniform(jax.random.PRNGKey(2), (1, 3, h, w, 3),
                                jnp.float32) * 255.0

    for name, upscale in (("x2-flow (reference parity)", 2),
                          ("fast (native-res flow)", 1)):
        step = make_fused_video_step(cfg, policy, upscale=upscale,
                                     fisr_grid="auto")
        out = step(fisr_params, pwc_params, frames)
        float(jnp.mean(out))  # compile + sync (axon-safe)
        n = 8
        t0 = time.perf_counter()
        for _ in range(n):
            out = step(fisr_params, pwc_params, frames)
        float(jnp.mean(out))
        dt = (time.perf_counter() - t0) / n
        print(f"{name:28s} {dt*1e3:7.1f} ms/window  "
              f"{2.0/dt:5.2f} new 4K frames/s", flush=True)


if __name__ == "__main__":
    main()
