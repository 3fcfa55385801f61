"""Utility coverage: metrics logger, plotting smoke, profiling timer."""

import json
import logging

import numpy as np

from msgwam_tpu.utils.metrics import MetricsLogger
from msgwam_tpu.utils.profiling import StepTimer


def test_metrics_logger_cadence_and_jsonl(tmp_path, caplog):
    path = tmp_path / "metrics.jsonl"
    logger = MetricsLogger(100, every=25, jsonl_path=str(path))
    with caplog.at_level(logging.INFO, logger="msgwam_tpu"):
        for step in range(1, 101):
            logger.record(step, max_u=1.5 * step)
    logger.close()
    lines = [json.loads(l) for l in path.read_text().splitlines()]
    assert [l["step"] for l in lines] == [25, 50, 75, 100]
    assert lines[-1]["progress"] == 1.0
    assert lines[0]["max_u"] == 1.5 * 25
    assert all("steps_per_sec" in l for l in lines)


def test_step_timer():
    t = StepTimer()
    for _ in range(3):
        t.start()
        t.stop()
    assert len(t.times) == 3
    assert t.best <= t.mean


def test_plotting_smoke(tmp_path):
    import matplotlib
    matplotlib.use("Agg")
    from msgwam_tpu.plotting import plot_wave_action_panels, plot_wind_evolution

    t = np.linspace(0, 86400, 20)
    z = np.linspace(500, 99500, 100)
    wa = np.random.rand(20, 100)
    tend = np.random.randn(20, 100) * 1e-3
    fig, ax = plot_wave_action_panels(
        t, z, wa, tend, show=False, save_path=tmp_path / "p.png"
    )
    assert (tmp_path / "p.png").exists()
    fig2, ax2 = plot_wind_evolution(
        t, z, np.random.randn(20, 100), show=False,
        save_path=tmp_path / "w.png",
    )
    assert (tmp_path / "w.png").exists()


def test_persistent_compile_cache(tmp_path, monkeypatch):
    import jax
    from msgwam_tpu.utils.xla import enable_persistent_compile_cache

    prev = jax.config.jax_compilation_cache_dir
    prev_min = jax.config.jax_persistent_cache_min_compile_time_secs
    try:
        # explicit path wins and the directory is created
        d = tmp_path / "xla-cache"
        assert enable_persistent_compile_cache(str(d)) == str(d)
        assert d.is_dir()
        assert jax.config.jax_compilation_cache_dir == str(d)
        # env var disables...
        monkeypatch.setenv("MSGWAM_COMPILE_CACHE", "off")
        assert enable_persistent_compile_cache() is None
        # ...but an explicit path argument beats the env kill-switch
        # (the documented resolution order, ADVICE r3)
        assert enable_persistent_compile_cache(str(d)) == str(d)
        # env var supplies the path
        d2 = tmp_path / "other"
        monkeypatch.setenv("MSGWAM_COMPILE_CACHE", str(d2))
        assert enable_persistent_compile_cache() == str(d2)
        assert d2.is_dir()
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          prev_min)


def test_resolve_champion_ladder():
    """The measured champion ladder is library-owned (VERDICT r3 #3):
    resolve_champion returns the per-size kernel settings, apply_champion
    resolves only the -1 auto sentinels and honors explicit values."""
    from msgwam_tpu.config import ModelConfig
    from msgwam_tpu.ops.rhs_pallas import apply_champion, resolve_champion

    # resident regime: W=24, no tier-2; streaming regime: W=16 + W2=96
    small = resolve_champion(100_000)
    assert (small["window_cells"], small["window_cells2"]) == (24, 0)
    big = resolve_champion(1_000_000)
    assert (big["window_cells"], big["window_cells2"]) == (16, 96)
    # sorted multi-launch streaming runs: narrower second tier (round-5
    # W-sweep: boundary re-sorts keep the layout coherent, W2=48 wins)
    srt = resolve_champion(1_000_000, sorted_multi_launch=True)
    assert (srt["window_cells"], srt["window_cells2"]) == (16, 48)
    # the resident regime ignores the flag (no streaming launch sort)
    srt_small = resolve_champion(100_000, sorted_multi_launch=True)
    assert (srt_small["window_cells"], srt_small["window_cells2"]) == (24, 0)
    # tile height mirrors _auto_tile_rows, incl. the lifecycle derate
    assert big["tile_rows"] == 192
    assert resolve_champion(1_000_000, lifecycle=True)["tile_rows"] == 128
    assert resolve_champion(10_000_000)["tile_rows"] == 256

    # the ModelConfig defaults are the auto sentinels
    cfg = ModelConfig()
    assert cfg.window_cells == -1 and cfg.window_cells2 == -1
    r = apply_champion(cfg, 1_000_000)
    assert (r.window_cells, r.window_cells2) == (16, 96)
    r = apply_champion(cfg, 100_000)
    assert (r.window_cells, r.window_cells2) == (24, 0)
    # explicit settings win over the ladder; nothing-auto returns cfg as-is
    e = cfg.replace(window_cells=32, window_cells2=0)
    assert apply_champion(e, 1_000_000) is e
    half = apply_champion(cfg.replace(window_cells=32), 1_000_000)
    assert (half.window_cells, half.window_cells2) == (32, 96)

    # the scan-path resolver maps the sentinels to its floor (W=16, no W2)
    from msgwam_tpu.ops.rhs_pallas import resolve_window_cells

    assert resolve_window_cells(cfg, 128) == (16, 0)
