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


@pytest.mark.slow
def test_sweep_orders_results_and_tags_modes(params):
    res = sweep(params, 96, 96, policy=Policy(jnp.float32), reps=1,
                grids=[(1, 1), (3, 3)])
    assert [r["mode"] for r in sorted(res, key=lambda r: r["grid"])] == \
        ["full", "tiled"]
    assert res == sorted(res, key=lambda r: r["sec"])


@pytest.mark.slow
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


@pytest.mark.slow
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


@pytest.mark.slow
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


def test_shipped_cache_fallback_and_local_wins(tmp_path):
    """Shipped per-device-kind plans (fisr_tpu/infer/autotune_shipped.json)
    serve when the user cache has no entry; a local tune for the same key
    always wins; tune() never writes shipped entries into the user cache."""
    from fisr_tpu.infer.autotune import TuneCache

    kind = TuneCache._device_kind()
    key = f"{kind}|1056x1920|bfloat16|b32"
    shipped = str(tmp_path / "shipped.json")
    local = str(tmp_path / "autotune.json")
    with open(shipped, "w") as f:
        json.dump({key: {"results": [
            {"grid": [4, 6], "pad": [96, 0], "sec": 0.21, "mode": "padded"},
            {"grid": [3, 6], "pad": [0, 0], "sec": 0.23, "mode": "tiled"},
        ], "reps": 3}}, f)

    cache = TuneCache(local, shipped_path=shipped)
    assert cache.best_plan(1056, 1920) == ((4, 6), (96, 0))
    assert cache.best(1056, 1920) == (3, 6)  # best PAD-FREE entry

    # a local measurement for the same key overrides the shipped one
    with open(local, "w") as f:
        json.dump({key: {"results": [
            {"grid": [2, 4], "pad": [0, 0], "sec": 0.19, "mode": "tiled"},
        ], "reps": 3}}, f)
    cache = TuneCache(local, shipped_path=shipped)
    assert cache.best_plan(1056, 1920) == ((2, 4), (0, 0))

    # no shipped file -> plain local behavior (and no crash)
    cache = TuneCache(local, shipped_path=str(tmp_path / "missing.json"))
    assert cache.best(1056, 1920) == (2, 4)
