"""HTTP serving daemon: the pair-cached video pipeline behind a socket.

SERVING.md describes the deployment modes; this module makes them runnable
as a long-lived process (stdlib-only: ThreadingHTTPServer + PIL for PNG).
The reference has no serving story at all — its video phase is three
offline TF sessions round-tripping .flo/.mat files through disk
(main.py:207-235); here the model stays resident and frames stream
through HBM.

Endpoints (see `protocol` framing below):

  GET  /healthz                  -> {"status": "ok", ...}
  GET  /v1/info                  -> model/config summary
  GET  /metrics                  -> Prometheus text format (counters)
  POST /v1/window                -> 3 frames in, 3 frames out (one isolated
                                    FISR window via the monolithic fused
                                    step — flow+warp+FISRnet, ONE program)
  POST /v1/stream/<id>/frame     -> 1 frame in; 202 while priming (first two
                                    frames), then 3 frames out per frame.
                                    Pair-cached: each adjacent pair's
                                    bidirectional flow+warp is computed once
                                    and feeds two windows (the steady-state
                                    form PERF.md measured at 1.58x the
                                    monolithic window).
  DELETE /v1/stream/<id>         -> drop stream state

Frame payloads are `application/x-fisr-frames`: u32 count, then per frame
u32 length + PNG bytes (little-endian). Frames are YUV-as-PNG by default
(the pipeline's native space, like the reference's inputs); pass
`?colorspace=rgb` to convert at the edge. Outputs per window are
[interp1, SR, interp2] at 2x resolution ([fr1, SR, fr2] — FISRnet.py:95-108
channel order).

Single-chip serving serializes device calls behind a lock; for multi-chip
throughput inside ONE process, `MultiChipService` pins one `FISRService`
per local device and routes each stream to a fixed chip (crc32 of the
stream id) so different streams run concurrently on different chips —
the serving-topology analog of the reference's one-process-per-GPU
deployment, with no load balancer needed.

Hardening: `make_server(auth_token=...)` requires `Authorization: Bearer`
on every endpoint except /healthz (load-balancer probes stay open), and
`max_request_bytes` rejects oversized posts with 413 before reading the
body off the socket.
"""

from __future__ import annotations

import hmac
import io
import itertools
import json
import struct
import threading
import zlib
from collections import OrderedDict
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import List, Optional

import numpy as np

__all__ = ["pack_frames", "unpack_frames", "FISRService", "MultiChipService",
           "make_server"]

CONTENT_TYPE = "application/x-fisr-frames"


# --------------------------------------------------------------------------
# protocol
# --------------------------------------------------------------------------

def pack_frames(frames: List[np.ndarray]) -> bytes:
    """[H,W,3] u8 arrays -> framed PNG payload (u32 count, (u32 len, png)*)."""
    from PIL import Image

    out = [struct.pack("<I", len(frames))]
    for f in frames:
        buf = io.BytesIO()
        Image.fromarray(np.asarray(f, np.uint8)).save(buf, format="PNG")
        png = buf.getvalue()
        out.append(struct.pack("<I", len(png)))
        out.append(png)
    return b"".join(out)


def unpack_frames(payload: bytes) -> List[np.ndarray]:
    from PIL import Image

    if len(payload) < 4:
        raise ValueError("truncated frame payload")
    (count,) = struct.unpack_from("<I", payload, 0)
    off, frames = 4, []
    for _ in range(count):
        if off + 4 > len(payload):
            raise ValueError("truncated frame payload")
        (n,) = struct.unpack_from("<I", payload, off)
        off += 4
        if off + n > len(payload):
            raise ValueError("truncated frame payload")
        img = Image.open(io.BytesIO(payload[off : off + n]))
        frames.append(np.asarray(img.convert("RGB"), np.uint8))
        off += n
    return frames


# --------------------------------------------------------------------------
# service: device-facing state
# --------------------------------------------------------------------------

class _StreamState:
    """Device-resident carry for one stream: last two frames + last pair."""

    __slots__ = ("prev2", "prev1", "pair")

    def __init__(self):
        self.prev2 = None   # frame k-2 [1,h,w,3] device
        self.prev1 = None   # frame k-1
        self.pair = None    # (flows, warps) of (k-2, k-1)


class FISRService:
    """Owns params + compiled programs + stream state; thread-safe."""

    def __init__(self, fisr_params, pwc_params, height: int, width: int,
                 policy=None, fisr_grid=None, upscale: int = 2, sf: int = 2,
                 warmup: bool = True, max_streams: int = 64, device=None):
        import jax
        import jax.numpy as jnp

        from fisr_tpu.infer.video import (make_fisr_window_fn,
                                          make_fused_video_step, make_pair_fn)
        from fisr_tpu.ops.conv import F32

        if height % 32 or width % 32:
            raise ValueError(f"frame {height}x{width} must be 32-multiples")
        self.h, self.w, self.sf = height, width, sf
        self.policy = policy or F32
        # Pinning params to a device commits every downstream computation to
        # it (jit follows committed operands), which is what lets
        # MultiChipService run one service per chip in one process.
        self.device = device
        if device is not None:
            fisr_params = jax.device_put(fisr_params, device)
            pwc_params = jax.device_put(pwc_params, device)
        self.fisr_params = fisr_params
        self.pwc_params = pwc_params
        self.fisr_grid = fisr_grid
        self._window_step = make_fused_video_step(
            policy=self.policy, upscale=upscale, sf=sf, fisr_grid=fisr_grid)
        self._pair_fn = make_pair_fn(policy=self.policy, upscale=upscale)
        self._win_fn = make_fisr_window_fn(
            policy=self.policy, sf=sf, fisr_grid=fisr_grid)
        # LRU-capped: each stream pins ~3 frames + 1 pair in HBM, so an
        # unbounded client population would leak device memory
        self._streams: "OrderedDict[str, _StreamState]" = OrderedDict()
        self.max_streams = max_streams
        self._lock = threading.Lock()       # device calls + stream state
        self.stats = {"windows": 0, "stream_frames": 0, "pair_programs": 0}
        # device-side u8 quantizer (see _window_out_to_u8)
        self._quant = jax.jit(lambda p: jnp.clip(
            jnp.rint(p.astype(jnp.float32) * 255.0), 0.0, 255.0
        ).astype(jnp.uint8))
        if warmup:
            z = jnp.zeros((1, 3, height, width, 3), jnp.float32)
            if device is not None:
                z = jax.device_put(z, device)
            # pre-flight HBM guardrail on the AOT-compiled program (reused
            # below — AOT compiles don't land in the jit cache): an
            # over-budget geometry raises an actionable error here instead
            # of an allocator abort on the first real request
            from fisr_tpu.utils.profiling import assert_fits_hbm

            self._window_step = self._window_step.lower(
                fisr_params, pwc_params, z).compile()
            assert_fits_hbm(
                self._window_step,
                what=f"fused {height}x{width} serving window program")
            pred = self._window_step(fisr_params, pwc_params, z)
            self._window_out_to_u8(pred)   # warms the quantizer too
            zf = z[:, 0]
            pair = self._pair_fn(pwc_params, zf, zf)
            np.asarray(self._win_fn(fisr_params, z, pair, pair))

    # ---- helpers ----

    def _to_device(self, frame_u8: np.ndarray):
        import jax
        import jax.numpy as jnp

        if frame_u8.shape[:2] != (self.h, self.w):
            raise ValueError(
                f"frame is {frame_u8.shape[0]}x{frame_u8.shape[1]}, server "
                f"compiled for {self.h}x{self.w}")
        # ship u8 over the host link (4x fewer bytes through the ~40 MB/s
        # relay than a host-side float32 cast would move), cast on device
        x = jnp.asarray(np.ascontiguousarray(frame_u8))[None]  # [1,h,w,3] u8
        if self.device is not None:
            x = jax.device_put(x, self.device)
        return x.astype(jnp.float32)  # on-device convert, [0,255]

    def _window_out_to_u8(self, pred) -> List[np.ndarray]:
        """[1, H, W, 9] in [0,1] -> 3 u8 frames [interp1, SR, interp2].

        Quantizes ON DEVICE and pulls u8: the float32 output of a 2K
        window is ~4x the bytes of its u8 form through the relay."""
        out = np.asarray(self._quant(pred))[0]
        return [out[..., 0:3], out[..., 3:6], out[..., 6:9]]

    # ---- endpoints ----

    def info(self) -> dict:
        import jax

        dev = self.device if self.device is not None else jax.devices()[0]
        return {
            "model": "FISRnet",
            "frame": [self.h, self.w],
            "scale_factor": self.sf,
            "dtype": np.dtype(self.policy.compute_dtype).name,
            "fisr_grid": (list(self.fisr_grid)
                          if isinstance(self.fisr_grid, tuple)
                          else self.fisr_grid),
            "device": getattr(dev, "device_kind", dev.platform),
            "streams": len(self._streams),
            "stats": dict(self.stats),
        }

    def window(self, frames: List[np.ndarray]) -> List[np.ndarray]:
        """Isolated 3-frame window -> 3 output frames (monolithic program)."""
        import jax.numpy as jnp

        if len(frames) != 3:
            raise ValueError(f"window needs exactly 3 frames, got {len(frames)}")
        with self._lock:
            stack = jnp.stack([self._to_device(f)[0] for f in frames])[None]
            pred = self._window_step(self.fisr_params, self.pwc_params, stack)
            out = self._window_out_to_u8(pred)
            self.stats["windows"] += 1
        return out

    def stream_frame(self, stream_id: str, frame: np.ndarray
                     ) -> Optional[List[np.ndarray]]:
        """Feed one frame to a stream; returns a window output once primed.

        Pair-cached: frame k triggers ONE pair program for (k-1, k) and one
        window program over (k-2, k-1, k) reusing the cached (k-2, k-1)
        pair — the steady-state streaming form (run_video_pipeline's loop,
        PERF.md pair-cached streaming).
        """
        import jax.numpy as jnp

        with self._lock:
            st = self._streams.get(stream_id)
            if st is None:
                st = self._streams[stream_id] = _StreamState()
                while len(self._streams) > self.max_streams:
                    self._streams.popitem(last=False)   # evict LRU
            else:
                self._streams.move_to_end(stream_id)
            dev = self._to_device(frame)
            self.stats["stream_frames"] += 1
            if st.prev1 is None:
                st.prev1 = dev
                return None
            pair_new = self._pair_fn(self.pwc_params, st.prev1, dev)
            self.stats["pair_programs"] += 1
            out = None
            if st.pair is not None:
                stack = jnp.stack([st.prev2[0], st.prev1[0], dev[0]])[None]
                pred = self._win_fn(self.fisr_params, stack, st.pair, pair_new)
                out = self._window_out_to_u8(pred)
                self.stats["windows"] += 1
            st.prev2, st.prev1, st.pair = st.prev1, dev, pair_new
        return out

    def drop_stream(self, stream_id: str) -> bool:
        with self._lock:
            return self._streams.pop(stream_id, None) is not None

    def metrics_text(self) -> str:
        """Prometheus text exposition of the service counters."""
        lines = []
        for k, v in sorted(self.stats.items()):
            name = f"fisr_{k}_total"
            lines.append(f"# TYPE {name} counter")
            lines.append(f"{name} {v}")
        lines.append("# TYPE fisr_active_streams gauge")
        lines.append(f"fisr_active_streams {len(self._streams)}")
        return "\n".join(lines) + "\n"


class MultiChipService:
    """One `FISRService` per local device, behind the same endpoint surface.

    Routing: each stream id is pinned to a fixed chip (crc32(id) % n) so its
    device-resident carry (last two frames + cached pair) never migrates;
    isolated /v1/window requests round-robin. Each sub-service has its own
    device lock, so requests for different chips run concurrently — the
    in-process form of "one daemon per chip behind a load balancer"
    (SERVING.md), with no balancer and one port. The reference's multi-GPU
    story is training-only (FISR_tfoptflow/multi_gpus.py); it has no
    multi-device serving at all.
    """

    def __init__(self, fisr_params, pwc_params, height: int, width: int,
                 devices=None, **kw):
        import jax

        devices = list(devices) if devices is not None else jax.local_devices()
        if not devices:
            raise ValueError("no devices to serve on")
        self.devices = devices
        # per-chip services compile CONCURRENTLY: each __init__ runs its
        # own AOT compile + warmup (10-70 s first compile); serial startup
        # would multiply that by the chip count. jax compilation is
        # thread-safe; per-service jit objects don't share caches anyway.
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=len(devices)) as pool:
            self.services = list(pool.map(
                lambda d: FISRService(fisr_params, pwc_params, height, width,
                                      device=d, **kw), devices))
        self._rr = itertools.count()    # itertools.count is GIL-atomic

    def _for_stream(self, stream_id: str) -> FISRService:
        return self.services[zlib.crc32(stream_id.encode()) %
                             len(self.services)]

    def window(self, frames: List[np.ndarray]) -> List[np.ndarray]:
        return self.services[next(self._rr) % len(self.services)].window(frames)

    def stream_frame(self, stream_id: str, frame: np.ndarray
                     ) -> Optional[List[np.ndarray]]:
        return self._for_stream(stream_id).stream_frame(stream_id, frame)

    def drop_stream(self, stream_id: str) -> bool:
        return self._for_stream(stream_id).drop_stream(stream_id)

    def info(self) -> dict:
        base = self.services[0].info()
        base["chips"] = len(self.services)
        base["streams"] = sum(len(s._streams) for s in self.services)
        base["stats"] = {k: sum(s.stats[k] for s in self.services)
                         for k in self.services[0].stats}
        return base

    def metrics_text(self) -> str:
        """Prometheus text: aggregate counters + per-chip labeled series."""
        keys = sorted(self.services[0].stats)
        lines = []
        for k in keys:
            name = f"fisr_{k}_total"
            lines.append(f"# TYPE {name} counter")
            for i, s in enumerate(self.services):
                lines.append(f'{name}{{chip="{i}"}} {s.stats[k]}')
        lines.append("# TYPE fisr_active_streams gauge")
        for i, s in enumerate(self.services):
            lines.append(f'fisr_active_streams{{chip="{i}"}} '
                         f"{len(s._streams)}")
        return "\n".join(lines) + "\n"


# --------------------------------------------------------------------------
# HTTP layer
# --------------------------------------------------------------------------

def _yuv_from(frames: List[np.ndarray], colorspace: str) -> List[np.ndarray]:
    if colorspace == "yuv":
        return frames
    from fisr_tpu.ops.color import rgb2yuv_matlab

    # rgb2yuv_matlab is [0,255] -> [0,255] (MATLAB constants)
    return [np.asarray(np.clip(np.rint(
        np.asarray(rgb2yuv_matlab(f.astype(np.float32)))), 0, 255),
        np.uint8) for f in frames]


def _yuv_to(frames: List[np.ndarray], colorspace: str) -> List[np.ndarray]:
    if colorspace == "yuv":
        return frames
    from fisr_tpu.ops.color import yuv2rgb_matlab_u8

    return [yuv2rgb_matlab_u8(f) for f in frames]


def make_server(service, host: str = "127.0.0.1", port: int = 8417,
                auth_token: Optional[str] = None,
                max_request_bytes: int = 192 * 1024 * 1024
                ) -> ThreadingHTTPServer:
    """Build (not start) the HTTP server; call .serve_forever() to run.

    `service` is a `FISRService` or `MultiChipService` (same surface).
    With `auth_token` set, every endpoint except /healthz requires
    `Authorization: Bearer <token>` (constant-time compare); /healthz stays
    open so load-balancer probes need no secret. `max_request_bytes` bounds
    POST bodies — oversized requests get 413 before the body is read.
    """

    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def log_message(self, fmt, *args):  # quiet by default
            pass

        def _authorized(self) -> bool:
            if auth_token is None:
                return True
            got = self.headers.get("Authorization", "")
            # compare bytes: compare_digest raises TypeError on non-ASCII
            # str input, which an unauthenticated client controls
            return (got.startswith("Bearer ")
                    and hmac.compare_digest(got[7:].encode("utf-8", "replace"),
                                            auth_token.encode()))

        def _deny(self) -> bool:
            """401 unless authorized; returns True when the request ends."""
            if self._authorized():
                return False
            body = json.dumps({"error": "unauthorized"}).encode()
            self.send_response(401)
            self.send_header("WWW-Authenticate", "Bearer")
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
            # a denied POST's body was never read off the socket; keeping
            # the keep-alive connection would parse it as the next request
            self.close_connection = True
            return True

        def _json(self, code: int, obj: dict):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _frames(self, frames: List[np.ndarray]):
            body = pack_frames(frames)
            self.send_response(200)
            self.send_header("Content-Type", CONTENT_TYPE)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _colorspace(self) -> str:
            q = self.path.split("?", 1)
            if len(q) == 2 and "colorspace=rgb" in q[1]:
                return "rgb"
            return "yuv"

        def _route(self) -> str:
            return self.path.split("?", 1)[0].rstrip("/")

        def do_GET(self):
            path = self._route()
            if path == "/healthz":
                self._json(200, {"status": "ok"})
            elif self._deny():
                return
            elif path == "/v1/info":
                self._json(200, service.info())
            elif path == "/metrics":
                body = service.metrics_text().encode()
                self.send_response(200)
                self.send_header("Content-Type",
                                 "text/plain; version=0.0.4")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            else:
                self._json(404, {"error": f"unknown path {path}"})

        def do_POST(self):
            if self._deny():
                return
            path = self._route()
            cs = self._colorspace()
            try:
                n = int(self.headers.get("Content-Length", "0"))
                if n > max_request_bytes:
                    # refuse before reading the body off the socket
                    self._json(413, {"error": f"request body {n} bytes "
                                     f"exceeds limit {max_request_bytes}"})
                    self.close_connection = True
                    return
                frames = _yuv_from(unpack_frames(self.rfile.read(n)), cs)
                if path == "/v1/window":
                    self._frames(_yuv_to(service.window(frames), cs))
                    return
                parts = path.split("/")
                if (len(parts) == 5 and parts[1] == "v1"
                        and parts[2] == "stream" and parts[4] == "frame"):
                    if len(frames) != 1:
                        raise ValueError("stream frame posts take 1 frame")
                    out = service.stream_frame(parts[3], frames[0])
                    if out is None:
                        self._json(202, {"status": "priming"})
                    else:
                        self._frames(_yuv_to(out, cs))
                    return
                self._json(404, {"error": f"unknown path {path}"})
            except ValueError as e:
                self._json(400, {"error": str(e)})
            except Exception as e:  # pragma: no cover - defensive
                self._json(500, {"error": f"{type(e).__name__}: {e}"})

        def do_DELETE(self):
            if self._deny():
                return
            path = self._route()
            parts = path.split("/")
            if len(parts) == 4 and parts[1] == "v1" and parts[2] == "stream":
                gone = service.drop_stream(parts[3])
                self._json(200 if gone else 404,
                           {"dropped": gone, "stream": parts[3]})
            else:
                self._json(404, {"error": f"unknown path {path}"})

    return ThreadingHTTPServer((host, port), Handler)
