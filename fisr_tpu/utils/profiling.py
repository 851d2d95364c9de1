"""Tracing / profiling hooks.

The reference's only timing instrumentation is ad-hoc `time.time()` around
sess.run calls (FISRnet.py:870-873,934-935; model_pwcnet.py:670-680). This
module formalizes it for the TPU stack:

* `trace(name)`           — wall-clock scope timer that (correctly) syncs
                            outstanding device work before reading the clock;
* `device_trace(logdir)`  — jax.profiler trace capture (XPlane, viewable in
                            TensorBoard / xprof) around a scope;
* `StepTimer`             — steps/sec + EMA for train loops (samples/sec,
                            sec/step, ETA — model_pwcnet.py:670-680 parity);
* `device_memory_stats()` — live HBM usage per device when the backend
                            exposes it.

NOTE on the axon relay: `block_until_ready` can return before remote
execution finishes, so `trace`/`StepTimer.sync` force a tiny scalar
readback when given an array — the only reliable fence there.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp

__all__ = ["trace", "device_trace", "StepTimer", "device_memory_stats",
           "sync", "assert_fits_hbm"]


def assert_fits_hbm(fn_or_compiled, args=(), what: str = "program",
                    limit_bytes: Optional[int] = None,
                    margin: float = 0.94) -> Optional[dict]:
    """Pre-flight HBM guardrail: raise an ACTIONABLE RuntimeError if the
    compiled memory footprint of `fn_or_compiled` exceeds `margin` of the
    device's HBM, instead of letting the first real request die in a
    mid-serving allocator abort.

    Pass an already-compiled executable (jit_fn.lower(*args).compile() —
    reuse it for execution, AOT compiles are NOT inserted into the jit
    cache) or a jitted fn + args to compile here (AOT, no execution).

    The limit comes from `limit_bytes`, else the device's reported
    `bytes_limit` (memory_stats). Returns {"need", "limit", ...} when the
    check ran, None when the backend exposes neither a memory analysis nor
    a byte limit (the check is then a no-op — better to serve than to
    refuse on missing introspection).

    Replaces the reference's fixed `test_patch=(2,2)` guesswork
    (/root/reference/main.py:89-92) failure mode: there, a too-large frame
    simply OOMs inside sess.run.
    """
    # Compile OUTSIDE the try: a genuine trace/compile error must propagate
    # here (where the caller's context is) rather than be swallowed and
    # resurface later at execution (ADVICE r4). Only the memory-analysis
    # INTROSPECTION may no-op when a backend doesn't expose it.
    compiled = (fn_or_compiled if hasattr(fn_or_compiled, "memory_analysis")
                else fn_or_compiled.lower(*args).compile())
    try:
        ma = compiled.memory_analysis()
        need = int(ma.temp_size_in_bytes + ma.argument_size_in_bytes
                   + ma.output_size_in_bytes + ma.generated_code_size_in_bytes)
    except Exception:
        return None
    limit = limit_bytes
    if limit is None:
        try:
            stats = jax.devices()[0].memory_stats() or {}
            limit = stats.get("bytes_limit")
        except Exception:
            limit = None
    if not limit:
        return None
    budget = int(limit * margin)
    info = {"what": what, "need_bytes": need, "limit_bytes": int(limit),
            "budget_bytes": budget}
    if need > budget:
        gib = 1024 ** 3
        raise RuntimeError(
            f"{what} needs ~{need / gib:.2f} GiB HBM but the device budget "
            f"is {budget / gib:.2f} GiB ({margin:.0%} of "
            f"{limit / gib:.2f} GiB). Options: reduce the frame geometry; "
            f"use a finer tiling plan (--fisr_grid 'GH,GW' or run "
            f"`python -m fisr_tpu.cli.tune` and pass --fisr_grid tuned); "
            f"or shard the frame spatially over more chips "
            f"(infer/sharded.make_sharded_runner).")
    return info


def sync(x=None) -> None:
    """Fence: make sure outstanding device work is done."""
    if x is not None:
        leaf = jax.tree_util.tree_leaves(x)
        if leaf:
            float(jnp.mean(leaf[0].astype(jnp.float32)))
            return
    for d in jax.devices():
        try:
            d.synchronize_all_activity()  # not on all backends
        except AttributeError:
            pass


@contextlib.contextmanager
def trace(name: str, result_holder: Optional[dict] = None, sync_on=None,
          verbose: bool = True):
    t0 = time.perf_counter()
    yield
    sync(sync_on)
    dt = time.perf_counter() - t0
    if result_holder is not None:
        result_holder[name] = dt
    if verbose:
        print(f"[trace] {name}: {dt * 1e3:.2f} ms", flush=True)


@contextlib.contextmanager
def device_trace(logdir: str):
    """Capture a jax.profiler device trace into `logdir`."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Throughput bookkeeping for training loops."""

    def __init__(self, batch_size: int, ema: float = 0.95):
        self.batch_size = batch_size
        self.ema = ema
        self._avg = None
        self._last = None

    def tick(self) -> None:
        now = time.perf_counter()
        if self._last is not None:
            dt = now - self._last
            self._avg = dt if self._avg is None else (
                self.ema * self._avg + (1 - self.ema) * dt)
        self._last = now

    @property
    def sec_per_step(self) -> float:
        return self._avg or float("nan")

    @property
    def samples_per_sec(self) -> float:
        return self.batch_size / self._avg if self._avg else float("nan")

    def eta_str(self, steps_left: int) -> str:
        if not self._avg:
            return "?"
        s = int(steps_left * self._avg)
        return f"{s // 3600:02d}:{s % 3600 // 60:02d}:{s % 60:02d}"


def device_memory_stats() -> Dict[str, dict]:
    out = {}
    for d in jax.devices():
        try:
            stats = d.memory_stats()
        except Exception:
            stats = None
        if stats:
            out[str(d)] = {
                "bytes_in_use": stats.get("bytes_in_use"),
                "peak_bytes_in_use": stats.get("peak_bytes_in_use"),
                "bytes_limit": stats.get("bytes_limit"),
            }
    return out
