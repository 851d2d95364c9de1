"""Model summaries (the reference's `show_all_variables`, utils.py:18-20,
which used slim's model analyzer)."""

from __future__ import annotations

import jax
import numpy as np

__all__ = ["print_params", "param_table"]


def param_table(params, max_depth: int = 2):
    """[(path, n_params, n_bytes)] aggregated to `max_depth` key levels."""
    rows = {}
    flat, _ = jax.tree_util.tree_flatten_with_path(params)
    for path, leaf in flat:
        keys = [getattr(k, "key", str(k)) for k in path][:max_depth]
        key = "/".join(str(k) for k in keys)
        n = int(np.prod(leaf.shape)) if leaf.shape else 1
        nb = n * leaf.dtype.itemsize
        cur = rows.get(key, (0, 0))
        rows[key] = (cur[0] + n, cur[1] + nb)
    return sorted(rows.items())


def print_params(params, max_depth: int = 2, name: str = "model") -> int:
    rows = param_table(params, max_depth)
    total = sum(n for _, (n, _) in rows)
    total_b = sum(b for _, (_, b) in rows)
    width = max((len(k) for k, _ in rows), default=10) + 2
    print(f"--- {name} variables ---")
    for key, (n, nb) in rows:
        print(f"  {key:<{width}} {n:>12,}  ({nb / 1e6:7.2f} MB)")
    print(f"  {'TOTAL':<{width}} {total:>12,}  ({total_b / 1e6:7.2f} MB)")
    return total
