"""Fused residual-block Pallas kernel: x + conv3x3(relu(conv3x3(relu(x)))).

The res block (ops.py:39-44) is FISRnet's hot op — 24 of the 45 convs per
level run inside res blocks, all 3x3 with equal in/out channels. XLA executes
them as two separate conv calls with an HBM round-trip of the intermediate
and (for C=64) a half-empty MXU N dimension. This kernel:

* tiles the image into (TH x TW) output blocks, each program DMA-ing its
  input tile + 2-px halo from a pre-padded HBM buffer (no pipeline-block
  overlap games — the pad is one cheap XLA op outside);
* computes BOTH convs as single [M, 9C] x [9C, C] MXU matmuls (im2col built
  in VMEM by static shifted slices), keeping the intermediate activation
  entirely in VMEM — zero HBM traffic between the convs;
* adds bias, relu, and the residual in-register, writing only the final
  block to HBM.

Weights are passed pre-reshaped as [9C, C] (tap-major, HWIO flattened).

STATUS — correct but not yet faster than XLA. Measured on v5e (2K frame,
C=64, bf16): 49 ms serial-DMA, 45 ms with the double-buffered prefetch now
in place, vs XLA's two-conv composition at 20 ms (XLA reaches ~30 TFLOP/s at
favorable tile geometry, close to the ~38 TFLOP/s ceiling that N=64 MXU lane
padding imposes on any schedule). Double-buffering only bought 8%, so the
bottleneck is in-kernel: the 9-slice im2col concat relayouts. Next step
(PERF.md): restructure the conv as 3 row-grouped [M, 192] matmuls or find a
layout where the taps are free. The model path uses the XLA composition
until this wins.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["res_block_fused"]


def _kernel(x_hbm, w0_ref, b0_ref, w1_ref, b1_ref, out_ref, xs, sem,
            *, th, tw, c, hgt, wid):
    b = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    gi = pl.num_programs(1)
    gj = pl.num_programs(2)

    # Mosaic slice rules for the (8, 128)-tiled layout: the W slice must be
    # 8-aligned (input pre-padded 2 left / 6 right, tw % 8 == 0) and the lane
    # (channel) dim can only be sliced at full 128 granularity — so the
    # input is channel-padded to a 128 multiple outside and sliced back to
    # the logical C as a value op after the load.
    #
    # Double-buffered prefetch: program k waits on slot k%2 and starts the
    # DMA for tile k+1 into slot (k+1)%2 — the scratch and semaphores persist
    # across grid steps, so the next tile streams in behind the compute.
    k = (b * gi + i) * gj + j
    total = pl.num_programs(0) * gi * gj
    slot = jax.lax.rem(k, 2)
    nxt = jax.lax.rem(k + 1, 2)

    def tile_dma(kk, s):
        bb = kk // (gi * gj)
        ii = jax.lax.rem(kk // gj, gi)
        jj = jax.lax.rem(kk, gj)
        return pltpu.make_async_copy(
            x_hbm.at[bb, pl.ds(ii * th, th + 4), pl.ds(jj * tw, tw + 8), :],
            xs.at[s], sem.at[s],
        )

    @pl.when(k == 0)
    def _():
        tile_dma(k, slot).start()

    @pl.when(k + 1 < total)
    def _():
        tile_dma(k + 1, nxt).start()

    tile_dma(k, slot).wait()

    x = xs[slot][:, : tw + 4, :c]  # (TH+4, TW+4, C) bf16
    xr = jnp.maximum(x, 0.0)

    # conv0 over the (TH+2, TW+2) region that conv1 needs (1-px halo kept)
    a0 = jnp.concatenate(
        [xr[dy : dy + th + 2, dx : dx + tw + 2, :].reshape((th + 2) * (tw + 2), c)
         for dy in range(3) for dx in range(3)],
        axis=1,
    )
    h = jnp.dot(a0, w0_ref[...], preferred_element_type=jnp.float32)
    h = h + b0_ref[...].astype(jnp.float32)
    h = jnp.maximum(h, 0.0).astype(x.dtype).reshape(th + 2, tw + 2, c)

    # conv1's SAME padding must see ZEROS outside the true image, but real
    # conv0 outputs outside the tile: zero the apron rows/cols whose original
    # coordinates (tile origin - 1 + offset) fall outside [0, H) x [0, W)
    row0 = i * th - 1
    col0 = j * tw - 1
    rows = row0 + jax.lax.broadcasted_iota(jnp.int32, (th + 2, tw + 2, 1), 0)
    cols = col0 + jax.lax.broadcasted_iota(jnp.int32, (th + 2, tw + 2, 1), 1)
    inside = (rows >= 0) & (rows < hgt) & (cols >= 0) & (cols < wid)
    h = jnp.where(inside, h, jnp.zeros_like(h))

    a1 = jnp.concatenate(
        [h[dy : dy + th, dx : dx + tw, :].reshape(th * tw, c)
         for dy in range(3) for dx in range(3)],
        axis=1,
    )
    y = jnp.dot(a1, w1_ref[...], preferred_element_type=jnp.float32)
    y = y + b1_ref[...].astype(jnp.float32)

    res = x[2 : 2 + th, 2 : 2 + tw, :].astype(jnp.float32)
    out_ref[0] = (res + y.reshape(th, tw, c)).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("th", "tw", "interpret"))
def res_block_fused(x: jnp.ndarray, w0: jnp.ndarray, b0: jnp.ndarray,
                    w1: jnp.ndarray, b1: jnp.ndarray,
                    th: int = 32, tw: int = 64, interpret: bool = False) -> jnp.ndarray:
    """x: [B, H, W, C]; w*: [3, 3, C, C] (HWIO); b*: [C].

    H % th == 0 and W % tw == 0 required (callers pick tile sizes that
    divide FISR's 32-multiple shapes). Returns x.dtype [B, H, W, C].
    """
    bsz, hgt, wid, c = x.shape
    assert hgt % th == 0 and wid % tw == 0, (x.shape, th, tw)
    assert tw % 8 == 0, tw
    dtype = x.dtype
    c_pad = (-c) % 128
    xp = jnp.pad(x, ((0, 0), (2, 2), (2, 6), (0, c_pad)))
    w0f = w0.reshape(9 * c, c).astype(dtype)
    w1f = w1.reshape(9 * c, c).astype(dtype)

    grid = (bsz, hgt // th, wid // tw)
    kernel = functools.partial(_kernel, th=th, tw=tw, c=c, hgt=hgt, wid=wid)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((bsz, hgt, wid, c), dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # x stays in HBM, DMA'd
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, th, tw, c), lambda b, i, j: (b, i, j, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, th + 4, tw + 8, c + c_pad), dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(xp, w0f, b0, w1f, b1)
