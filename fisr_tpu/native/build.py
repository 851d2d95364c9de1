"""On-demand g++ build of the native loader (cached .so next to the source)."""

from __future__ import annotations

import os
import subprocess
import threading

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "loader.cc")
_SO = os.path.join(_HERE, "libfisr_native.so")
_LOCK = threading.Lock()


def build(force: bool = False) -> str | None:
    """Compile loader.cc -> libfisr_native.so; returns the path or None if
    the toolchain/libpng is unavailable (callers fall back to numpy/PIL)."""
    with _LOCK:
        if not force and os.path.exists(_SO) and (
            os.path.getmtime(_SO) >= os.path.getmtime(_SRC)
        ):
            return _SO
        cmd = [
            "g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
            _SRC, "-lpng", "-lz", "-o", _SO + ".tmp",
        ]
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=240)
        except (subprocess.SubprocessError, FileNotFoundError):
            return None
        os.replace(_SO + ".tmp", _SO)
        return _SO
