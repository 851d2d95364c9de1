"""Shared CLI argument grammar helpers (imported by cli/main.py, cli/serve.py).

Kept in one place so the two drivers' --fisr_grid grammars cannot drift
(round-3 advisor finding: the parser was duplicated verbatim).
"""

from __future__ import annotations

from typing import Optional, Tuple, Union

GridSpec = Union[None, str, Tuple[int, int]]


def parse_grid(s: str) -> GridSpec:
    """--fisr_grid grammar: 'full' -> None (untiled full-frame apply),
    'auto'/'tuned' pass through as mode strings (resolved at trace time by
    infer/video.resolve_fisr_plan), anything else is 'GH,GW'."""
    if s == "full":
        return None
    if s in ("auto", "tuned"):
        return s
    gh, gw = (int(v) for v in s.split(","))
    return (gh, gw)
