"""Autotuner: candidate enumeration, on-device sweep, cache persistence."""

import json

import jax
import jax.numpy as jnp
import pytest

from fisr_tpu.infer.autotune import TuneCache, candidate_grids, sweep
from fisr_tpu.models import fisrnet
from fisr_tpu.ops.conv import Policy


def test_candidate_grids_respect_32_multiples():
    # 96/32 = 3 patches of 32: only grids 1 and 3 keep 32-multiples
    assert candidate_grids(96, 96) == [(1, 1), (1, 3), (3, 1), (3, 3)]
    # 1024/32 = 32, 1920/32 = 60, capped at (6, 8)
    got = candidate_grids(1024, 1920)
    assert (4, 6) in got and (1, 1) in got
    assert all(1024 % (32 * gh) == 0 and 1920 % (32 * gw) == 0
               for gh, gw in got)
    with pytest.raises(ValueError):
        candidate_grids(100, 96)


@pytest.fixture(scope="module")
def params():
    return fisrnet.init_params(jax.random.PRNGKey(0))


def test_sweep_orders_results_and_tags_modes(params):
    res = sweep(params, 96, 96, policy=Policy(jnp.float32), reps=1,
                grids=[(1, 1), (3, 3)])
    assert [r["mode"] for r in sorted(res, key=lambda r: r["grid"])] == \
        ["full", "tiled"]
    assert res == sorted(res, key=lambda r: r["sec"])


def test_tune_cache_roundtrip(tmp_path, params):
    path = str(tmp_path / "autotune.json")
    cache = TuneCache(path)
    grid = cache.tune(params, 96, 96, policy=Policy(jnp.float32), reps=1)
    assert 96 % (32 * grid[0]) == 0 and 96 % (32 * grid[1]) == 0

    # a fresh cache object reloads the persisted measurement
    fresh = TuneCache(path)
    assert fresh.best(96, 96, "float32") == grid
    # untuned keys fall back to None (callers use the best_grid heuristic)
    assert fresh.best(128, 128, "float32") is None
    assert fresh.best(96, 96, "bfloat16") is None

    # file is valid json keyed by device kind
    data = json.loads(open(path).read())
    (key,) = data.keys()
    assert "96x96" in key and "float32" in key


def test_tune_cli_end_to_end(tmp_path, capsys):
    import json as _json

    from fisr_tpu.cli import tune as tune_cli

    path = str(tmp_path / "cache.json")
    tune_cli.main(["--height", "96", "--width", "96", "--dtype", "float32",
                   "--reps", "1", "--cache", path])
    out = capsys.readouterr().out.strip().splitlines()
    rec = _json.loads(out[-1])
    assert rec["frame"] == [96, 96] and rec["cache"] == path
    gh, gw = rec["best_grid"]
    assert 96 % (32 * gh) == 0 and 96 % (32 * gw) == 0
    assert json.load(open(path))  # persisted


def test_resolve_fisr_grid(tmp_path, params, monkeypatch):
    from fisr_tpu.infer import autotune
    from fisr_tpu.infer.device import best_grid
    from fisr_tpu.infer.video import resolve_fisr_grid
    from fisr_tpu.ops.conv import F32

    # explicit tuple/list pass through; 'auto' -> heuristic
    assert resolve_fisr_grid((2, 3), 96, 96, F32) == (2, 3)
    assert resolve_fisr_grid([2, 3], 96, 96, F32) == (2, 3)
    assert resolve_fisr_grid("auto", 96, 96, F32) == best_grid(96, 96)

    # 'tuned' with an empty cache falls back to the heuristic
    path = str(tmp_path / "cache.json")
    monkeypatch.setattr(autotune, "DEFAULT_CACHE_PATH", path)
    assert resolve_fisr_grid("tuned", 96, 96, F32) == best_grid(96, 96)

    # 'tuned' prefers this device's measured winner once tuned
    cache = autotune.TuneCache(path)
    grid = cache.tune(params, 96, 96, policy=F32, reps=1,
                      )
    assert resolve_fisr_grid("tuned", 96, 96, F32) == grid
