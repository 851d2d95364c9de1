"""Probe: split-conv rewrite of the PWC estimator's DenseNet concats.

The estimator at each level runs 5 convs whose inputs are growing channel
concats (117 -> 245 -> 373 -> 469 -> 533 at level 2); each concat rewrites
the accumulated tensor. conv(concat(parts)) == sum(conv(part_j, w_j)), so
the intermediate concats need never materialize — only the final 565-ch
upfeat (3 consumers: pred, ctx, up-deconv) is built once.

Counter-pressure: each split conv writes its partial output per part
unless XLA fuses the adds into conv epilogues. Measured here in isolation
at level-2 x2-video geometry and in the full bidirectional apply.

Run on the real TPU.
"""

import time

import jax
import jax.numpy as jnp

from fisr_tpu.models import pwcnet
from fisr_tpu.models.pwcnet import EST_CHANNELS, _estimate, _leaky
from fisr_tpu.ops.conv import Policy

POL = Policy(jnp.bfloat16)
CFG = pwcnet.PWCNetConfig()


def timeit(f, *args, n=10, reps=5, warm=2):
    fn = jax.jit(f)
    for _ in range(warm):
        out = fn(*args)
    float(jnp.mean(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        float(jnp.mean(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
        ts.append((time.perf_counter() - t0) / n * 1e3)
    return sorted(ts)[reps // 2]


def conv_parts(p, parts, policy, dilation=1):
    """conv2d(p, concat(parts, -1)) as a sum of per-part convs."""
    w = p["w"]
    dn = ("NHWC", "HWIO", "NHWC")
    o = 0
    acc = None
    for part in parts:
        k = part.shape[-1]
        ws = w[:, :, o : o + k].astype(policy.compute_dtype)
        o += k
        y = jax.lax.conv_general_dilated(
            part, ws, (1, 1), "SAME", rhs_dilation=(dilation, dilation),
            dimension_numbers=dn, preferred_element_type=policy.compute_dtype)
        acc = y if acc is None else acc + y
    return acc + p["b"].astype(policy.compute_dtype)


def estimate_split(p, x, policy):
    """_estimate with dense concats never materialized until the end.

    Part order matters: _estimate concatenates [act, x] (newest FIRST), so
    the weight slices follow [act_{i-1}, ..., act_0, x0]."""
    parts = [x]
    for i in range(len(EST_CHANNELS)):
        act = _leaky(conv_parts(p[f"conv{i}"], parts, policy))
        parts = [act] + parts
    flow = conv_parts(p["pred"], parts, policy)
    return jnp.concatenate(parts, axis=-1), flow


def main():
    rng = jax.random.PRNGKey(0)
    params = pwcnet.init_params(rng, CFG)
    params = jax.tree_util.tree_map(lambda t: t.astype(jnp.bfloat16), params)
    p2 = params["flow"]["level_2"]

    # level-2 x2-video geometry, one direction: 2112x3840 / 4 = 528x960
    h, w = 528, 960
    od = 81 + 32 + 2 + 2
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, h, w, od), jnp.bfloat16)

    ref_up, ref_flow = jax.jit(lambda p, v: _estimate(p, v, CFG, POL))(p2, x)
    got_up, got_flow = jax.jit(lambda p, v: estimate_split(p, v, POL))(p2, x)
    dev = float(jnp.max(jnp.abs(got_flow.astype(jnp.float32)
                                - ref_flow.astype(jnp.float32))))
    scale = float(jnp.max(jnp.abs(ref_flow.astype(jnp.float32))))
    print(f"flow max dev {dev:.4g} (scale {scale:.4g}); "
          f"upfeat equal: {bool(jnp.all(got_up == ref_up))}", flush=True)

    a = timeit(lambda p, v: _estimate(p, v, CFG, POL)[1], p2, x)
    print(f"A  _estimate (dense concats), full-frame   {a:7.1f} ms", flush=True)
    b = timeit(lambda p, v: estimate_split(p, v, POL)[1], p2, x)
    print(f"B  estimate_split, full-frame               {b:7.1f} ms", flush=True)

    # tiled comparison at the production grid
    from fisr_tpu.infer.halo import halo_map

    grid = (4, 4)
    a2 = timeit(lambda p, v: halo_map(
        lambda t: _estimate(p, t, CFG, POL)[1], v, grid, 6, (h, w)), p2, x)
    print(f"A2 _estimate tiled {grid}                   {a2:7.1f} ms", flush=True)
    b2 = timeit(lambda p, v: halo_map(
        lambda t: estimate_split(p, t, POL)[1], v, grid, 6, (h, w)), p2, x)
    print(f"B2 estimate_split tiled {grid}              {b2:7.1f} ms", flush=True)

    # both outputs (upfeat + flow) — what the model actually consumes
    a3 = timeit(lambda p, v: _estimate(p, v, CFG, POL), p2, x)
    b3 = timeit(lambda p, v: estimate_split(p, v, POL), p2, x)
    print(f"A3/B3 with upfeat: {a3:7.1f} vs {b3:7.1f} ms", flush=True)


if __name__ == "__main__":
    main()
