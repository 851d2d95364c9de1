"""Production serving: frame/window-parallel multi-chip inference.

Two complementary ways to scale FISR inference over a mesh:
* `infer/sharded.py` — ONE frame split spatially across chips (halo
  exchange over ICI): minimizes latency for a single frame;
* this module — many windows split across chips over the 'data' axis:
  maximizes throughput for video streams (windows are independent, so
  scaling is linear with zero inter-chip traffic).

`make_frame_parallel_runner` returns a jitted fn whose input
[N, h, w, 29] window batch is sharded over the mesh; each chip runs the
(in-jit tiled) FISRnet on its shard and the output canvas materializes
sharded the same way. Works identically for the fused flow->warp->FISRnet
step (`make_frame_parallel_video_step`).
"""

from __future__ import annotations

from typing import Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from fisr_tpu.core.mesh import DATA_AXIS
from fisr_tpu.infer.device import make_device_runner
from fisr_tpu.ops.conv import F32, Policy

__all__ = ["make_frame_parallel_runner", "make_frame_parallel_video_step"]


def make_frame_parallel_runner(mesh: Mesh, mode: str = "tiled",
                               grid: Tuple[int, int] = (2, 2),
                               boundary: int = 32, sf: int = 2,
                               policy: Policy = F32, axis: str = DATA_AXIS):
    """fn(params, windows [N, h, w, 29]) -> [N, h*sf, w*sf, 9], N % mesh
    size == 0; params replicated, batch sharded."""
    base = make_device_runner(mode, grid=grid, boundary=boundary, sf=sf,
                              policy=policy)
    batch_sh = NamedSharding(mesh, P(axis, None, None, None))
    return jax.jit(
        lambda params, x: base(params, x),
        in_shardings=(NamedSharding(mesh, P()), batch_sh),
        out_shardings=batch_sh,
    )


def make_frame_parallel_video_step(mesh: Mesh, axis: str = DATA_AXIS,
                                   policy: Policy = F32, **kw):
    """Fused flow->warp->FISRnet step with the window batch sharded over the
    mesh: fn(fisr_params, pwc_params, frames [N, 3, h, w, 3])."""
    from fisr_tpu.infer.video import make_fused_video_step

    step = make_fused_video_step(policy=policy, **kw)
    batch_sh = NamedSharding(mesh, P(axis, None, None, None, None))
    out_sh = NamedSharding(mesh, P(axis, None, None, None))
    rep = NamedSharding(mesh, P())
    return jax.jit(
        lambda fp, pp, frames: step(fp, pp, frames),
        in_shardings=(rep, rep, batch_sh),
        out_shardings=out_sh,
    )
