"""Run the FISR serving daemon.

    python -m fisr_tpu.cli.serve --height 1024 --width 1920 \
        --checkpoint_dir ./checkpoint_dir --exp_num 1 --port 8417

Loads the FISRnet checkpoint (same resolution rules as the CLI test/video
phases) and the PWC-Net flow checkpoint (--pwc_ckpt or
<checkpoint_dir>/pwcnet), compiles the fused window + pair-cached stream
programs for the fixed frame size, warms them up, then serves HTTP
(infer/daemon.py: /healthz, /v1/info, /v1/window, /v1/stream/<id>/frame).
"""

from __future__ import annotations

import argparse


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=8417)
    p.add_argument("--height", type=int, required=True,
                   help="frame height (32-multiple; e.g. 1024)")
    p.add_argument("--width", type=int, required=True,
                   help="frame width (32-multiple; e.g. 1920)")
    p.add_argument("--checkpoint_dir", default="./checkpoint_dir")
    p.add_argument("--exp_num", type=int, default=1)
    p.add_argument("--pwc_ckpt", type=str, default=None)
    p.add_argument("--dtype", default="bfloat16",
                   choices=["bfloat16", "float32"])
    p.add_argument("--fisr_grid", default="auto",
                   help="'auto' (heuristic — serving's throughput default; "
                        "deviation vs full-frame measured at the 36.8 dB "
                        "class at 1080p, PARITY.md), 'tuned' (autotune "
                        "cache), 'full' (no tiling, exact parity), or "
                        "'GH,GW'")
    p.add_argument("--flow_scale", type=int, default=2, choices=(1, 2),
                   help="2 = reference-parity x2-upscaled flow; 1 = fast "
                        "mode (~1.5x throughput, see PARITY.md; pair with a "
                        "--flow_scale 1 joint-fine-tuned checkpoint)")
    p.add_argument("--multichip", action="store_true",
                   help="one service per local device in this process; "
                        "streams pin to a chip, windows round-robin")
    p.add_argument("--auth_token", type=str, default=None,
                   help="require 'Authorization: Bearer <token>' on every "
                        "endpoint except /healthz")
    p.add_argument("--max_request_bytes", type=int,
                   default=192 * 1024 * 1024,
                   help="reject larger POST bodies with 413")
    return p


from fisr_tpu.cli._common import parse_grid as _parse_grid  # shared grammar


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)

    import jax
    import jax.numpy as jnp

    from fisr_tpu.cli.main import _load_params, _load_pwc_params
    from fisr_tpu.infer.daemon import (FISRService, MultiChipService,
                                       make_server)
    from fisr_tpu.ops.conv import Policy

    policy = Policy(jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32)
    fisr_params = _load_params(args)
    pwc_params = _load_pwc_params(args)
    if args.dtype == "bfloat16":
        cast = lambda t: t.astype(jnp.bfloat16)  # noqa: E731 — cast once at load
        fisr_params = jax.tree_util.tree_map(cast, fisr_params)

    cls = MultiChipService if args.multichip else FISRService
    n = len(jax.local_devices()) if args.multichip else 1
    print(f" [*] compiling for {args.height}x{args.width} "
          f"({args.dtype}, grid={args.fisr_grid}, {n} chip(s)) ...")
    service = cls(fisr_params, pwc_params, args.height, args.width,
                  policy=policy, fisr_grid=_parse_grid(args.fisr_grid),
                  upscale=args.flow_scale)
    server = make_server(service, args.host, args.port,
                         auth_token=args.auth_token,
                         max_request_bytes=args.max_request_bytes)
    print(f" [*] serving on http://{args.host}:{args.port} "
          f"(/healthz, /v1/info, /v1/window, /v1/stream/<id>/frame)")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        server.shutdown()


if __name__ == "__main__":
    main()
