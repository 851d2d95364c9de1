"""Halo tiling toolkit: full-frame conv segments at patch-friendly geometry.

Motivation (PERF.md): XLA's conv throughput on v5e collapses at large
spatial extents (a full-frame 1024x1920 C=64 conv runs at ~8-13 TFLOP/s vs
~30+ when the same pixels are presented as a batch of ~256x480 patches).
`halo_map(f, x, grid, halo, ref_hw)` runs a conv segment `f` patch-batched
with `halo` px of REAL neighbor values around each patch: wherever
`f`'s receptive radius <= halo, the result is BIT-EXACT equal to `f` on the
whole frame (pinned in tests/test_staged.py), with only a <= halo-wide
zero-ring approximation at the true frame border (the same class as
`infer/tiled.py`'s `padded` mode).

Consumers: the PWC-Net large-extent stages (models/pwcnet.py auto-tiles its
L2 estimator and L1 feature block through halo_map), and FISRnet's device
runners use `patchify`/`unpatchify` directly. `halo_exchange` is the
single-host twin of the multi-chip ppermute exchange (infer/sharded.py) and
the patchify primitive here: building patches as reshape + strip exchange
costs ~8 XLA ops for ANY grid, where gh*gw overlapping slices made (8,8)
compiles pathological.

(The per-U-Net-stage halo-exchange pipeline this module was first built for
measured SLOWER than carried-halo whole-window tiling — the exchange copies
eat the halo compute they save; see PERF.md's round-2 negative results. The
primitives survive because the PWC single-segment uses win.)
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp

__all__ = ["halo_map", "halo_exchange", "patchify", "unpatchify"]


def patchify(x: jnp.ndarray, grid: Tuple[int, int]) -> jnp.ndarray:
    """[B, H, W, C] -> [gh*gw*B, H/gh, W/gw, C] patch cores (row-major
    patch order, batch minor — same layout halo_map uses)."""
    gh, gw = grid
    b, h, w, c = x.shape
    t = x.reshape(b, gh, h // gh, gw, w // gw, c)
    return jnp.transpose(t, (1, 3, 0, 2, 4, 5)).reshape(
        gh * gw * b, h // gh, w // gw, c)


def unpatchify(y: jnp.ndarray, grid: Tuple[int, int], b: int) -> jnp.ndarray:
    """Inverse of patchify: [gh*gw*B, sh, sw, C] -> [B, gh*sh, gw*sw, C]."""
    gh, gw = grid
    _, sh, sw, c = y.shape
    t = y.reshape(gh, gw, b, sh, sw, c)
    return jnp.transpose(t, (2, 0, 3, 1, 4, 5)).reshape(
        b, gh * sh, gw * sw, c)


def halo_exchange(cores: jnp.ndarray, grid: Tuple[int, int], b: int,
                  halo: int) -> jnp.ndarray:
    """Grow each patch core by `halo` px of TRUE neighbor-core values.

    cores: [gh*gw*B, sh, sw, C] in patchify order. Returns
    [gh*gw*B, sh+2h, sw+2h, C]; canvas borders are zero-filled (the multi-
    chip analog moves the same strips with ppermute, infer/sharded.py).
    Equivalent to unpatchify -> zero-pad -> re-slice with overlap, but stays
    in patch layout so XLA moves only edge strips plus one output write —
    no 6D stitch/split transposes between stages.
    """
    gh, gw = grid
    n, sh, sw, c = cores.shape
    if halo == 0:
        return cores
    t = cores.reshape(gh, gw, b, sh, sw, c)
    # vertical neighbors (with corner data flowing via the horizontal pass)
    zrow = jnp.zeros((1, gw, b, halo, sw, c), cores.dtype)
    top = jnp.concatenate([zrow, t[:-1, :, :, sh - halo:]], axis=0)
    bot = jnp.concatenate([t[1:, :, :, :halo], zrow], axis=0)
    t2 = jnp.concatenate([top, t, bot], axis=3)  # [gh, gw, b, sh+2h, sw, c]
    zcol = jnp.zeros((gh, 1, b, sh + 2 * halo, halo, c), cores.dtype)
    left = jnp.concatenate([zcol, t2[:, :-1, :, :, sw - halo:]], axis=1)
    right = jnp.concatenate([t2[:, 1:, :, :, :halo], zcol], axis=1)
    t3 = jnp.concatenate([left, t2, right], axis=4)
    return t3.reshape(n, sh + 2 * halo, sw + 2 * halo, c)


def _scaled(v: int, num: int, den: int, what: str) -> int:
    out = v * num
    if out % den:
        raise ValueError(f"{what}: {v} * {num}/{den} is not integral")
    return out // den


def halo_map(
    f: Callable,
    inputs,
    grid: Tuple[int, int],
    halo: int,
    ref_hw: Tuple[int, int],
):
    """Run stage `f` patch-batched over full-frame tensors with real halos.

    f:      maps a pytree of patch batches [gh*gw*B, ph_i, pw_i, C_i] to a
            pytree of patch outputs [gh*gw*B, ph_o, pw_o, C_o]. Must be
            shift-invariant (convs/pools/resizes) with receptive radius
            <= `halo` (in ref-scale pixels).
    inputs: pytree of full-frame [B, H_i, W_i, C_i]; every H_i/W_i must be
            `ref_hw` scaled by a per-tensor rational factor (e.g. skip at
            1x, pooled at 1/2x).
    grid:   (gh, gw) patch grid; must divide ref_hw and keep every scaled
            patch/halo integral.
    halo:   overlap width in ref-scale pixels.
    ref_hw: the stage's reference resolution (usually its finest input).

    Returns f's outputs reassembled to full frames [B, H_o, W_o, C_o].
    """
    gh, gw = grid
    rh, rw = ref_hw
    if rh % gh or rw % gw:
        raise ValueError(f"grid {grid} does not divide ref {ref_hw}")
    sh, sw = rh // gh, rw // gw

    leaves, treedef = jax.tree_util.tree_flatten(inputs)
    b = leaves[0].shape[0]

    def to_patches(x):
        _, h, w, _ = x.shape
        hh = _scaled(halo, h, rh, "halo h")
        hw = _scaled(halo, w, rw, "halo w")
        if hh != hw:
            raise ValueError(f"anisotropic scaled halo {hh}x{hw} unsupported")
        # reshape-patchify + strip exchange instead of gh*gw overlapping
        # slices: ~8 ops regardless of grid size (a (8,8) grid's 64 big
        # slice+concat ops made XLA compiles pathological)
        return halo_exchange(patchify(x, grid), grid, b, hh)

    patch_in = jax.tree_util.tree_unflatten(treedef, [to_patches(l) for l in leaves])
    out = f(patch_in)

    def stitch(y):
        _, ph, pw, c = y.shape
        # infer the output scale from the patch shape: ph = (sh + 2*halo)*s
        num_h, den_h = ph, sh + 2 * halo
        psh = _scaled(sh, num_h, den_h, "out patch h")
        hh = _scaled(halo, num_h, den_h, "out halo h")
        num_w, den_w = pw, sw + 2 * halo
        psw = _scaled(sw, num_w, den_w, "out patch w")
        hw = _scaled(halo, num_w, den_w, "out halo w")
        core = y[:, hh : hh + psh, hw : hw + psw, :]
        core = core.reshape(gh, gw, b, psh, psw, c)
        core = jnp.transpose(core, (2, 0, 3, 1, 4, 5))
        return core.reshape(b, gh * psh, gw * psw, c)

    return jax.tree_util.tree_map(stitch, out)
