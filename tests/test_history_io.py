"""Streaming history writer (native C++ via ctypes + Python fallback)."""

import numpy as np
import pytest

from msgwam_tpu.utils.history_io import HistoryWriter, read_history, _load_native


@pytest.mark.parametrize("native", [None, False])
def test_roundtrip(tmp_path, native):
    if native is None and _load_native() is None:
        pytest.skip("native writer not built")
    p = tmp_path / "hist.msgw"
    rng = np.random.default_rng(0)
    recs = [rng.random((3, 64)).astype(np.float32) for _ in range(40)]
    w = HistoryWriter(p, (3, 64), np.float32, max_queue=4, native=native)
    for r in recs:
        w.push(r)
    assert w.close() == 40
    back = read_history(p)
    assert back.shape == (40, 3, 64)
    np.testing.assert_array_equal(back, np.stack(recs))


def test_record_size_validation(tmp_path):
    w = HistoryWriter(tmp_path / "h.msgw", (4,), np.float64, native=False)
    with pytest.raises(ValueError):
        w.push(np.zeros(5))
    w.push(np.zeros(4))
    assert w.close() == 1


def test_streaming_simulation_history(tmp_path):
    """End to end: stream mean-wind profiles from a chunked run, read back,
    and match the in-memory history."""
    import jax
    import jax.numpy as jnp
    import msgwam_tpu as mt

    cfg = mt.REFERENCE_RUN_CONFIG
    gc = mt.GridConfig()
    centers = gc.centers()
    uu = np.asarray(mt.velocities_sine_homogeneous(jnp.asarray(centers), cfg))
    bg = mt.make_background(gc, cfg, uu, np.zeros_like(uu))
    rays, statics = mt.wave_packet_ic(gc, cfg, bg, n_ray=30)
    state = mt.State(rays, mt.MeanState(jnp.asarray(uu), jnp.zeros(100)))

    chunk = mt.RunConfig(dt=120.0, n_steps=10, save_every=10)
    sim = jax.jit(lambda s, st: mt.simulate(s, st, bg, cfg, chunk))
    p = tmp_path / "u.msgw"
    in_memory = []
    with HistoryWriter(p, (100,), np.float64) as w:
        for _ in range(4):
            state, statics, _ = sim(state, statics)
            u = np.asarray(state.mean.u)
            w.push(u)
            in_memory.append(u)
    back = read_history(p)
    np.testing.assert_array_equal(back, np.stack(in_memory))


@pytest.mark.parametrize("native", [None, False])
def test_state_history_roundtrip(tmp_path, native):
    """Full-state snapshots (all ray fields + mask + dens_prop + winds)
    round-trip through StateHistoryWriter (VERDICT r1 item 10)."""
    from msgwam_tpu.utils.history_io import (
        StateHistoryWriter, read_state_history,
    )

    if native is None and _load_native() is None:
        pytest.skip("native writer not built")
    import jax
    import jax.numpy as jnp
    import msgwam_tpu as mt

    cfg = mt.REFERENCE_RUN_CONFIG
    gc = mt.GridConfig()
    centers = gc.centers()
    uu = np.asarray(mt.velocities_sine_homogeneous(jnp.asarray(centers), cfg))
    bg = mt.make_background(gc, cfg, uu, np.zeros_like(uu))
    rays, statics = mt.wave_packet_ic(gc, cfg, bg, n_ray=24)
    state = mt.State(rays, mt.MeanState(jnp.asarray(uu), jnp.zeros(100)))

    chunk = mt.RunConfig(dt=120.0, n_steps=5, save_every=5)
    sim = jax.jit(lambda s, st: mt.simulate(s, st, bg, cfg, chunk))
    p = tmp_path / "state.msgw"
    frames = []
    with StateHistoryWriter(p, capacity=24, n_cell=100, dtype=np.float64,
                            native=native) as w:
        for _ in range(3):
            state, statics, (hs, ha, hp) = sim(state, statics)
            w.push_frame(jax.tree.map(lambda x: x[0], hs.rays),
                         np.asarray(ha[0]), np.asarray(hp[0]),
                         jax.tree.map(lambda x: x[0], hs.mean))
            # np.asarray(jax_cpu_array) is a zero-copy VIEW whose buffer is
            # recycled once the jax array dies — copy before keeping
            copy = lambda x: np.array(x, copy=True)
            frames.append((jax.tree.map(copy, hs.rays),
                           copy(ha[0]), copy(hp[0]), copy(hs.mean.u[0])))
    back = read_state_history(p)
    assert back["dens"].shape == (3, 24)
    assert back["u"].shape == (3, 100)
    for t, (hr, act, prop, u) in enumerate(frames):
        np.testing.assert_array_equal(back["dens"][t], hr.dens[0])
        np.testing.assert_array_equal(back["r"][t], hr.r[0])
        np.testing.assert_array_equal(back["m"][t], hr.m[0])
        np.testing.assert_array_equal(back["dens_prop"][t], prop)
        np.testing.assert_array_equal(back["active"][t], act)
        np.testing.assert_array_equal(back["u"][t], u)


def test_cli_streams_full_state(tmp_path):
    """CLI --stream-history leaves a readable full-state on-disk history
    whose frames match the diagnostics cadence."""
    from msgwam_tpu.cli import run_experiment
    from msgwam_tpu.utils.history_io import read_state_history

    spec = {
        "model": {"saturate_online": False, "hprop": False, "u0": 4.0,
                  "phi0": 0.0, "kappa": 1.0, "rr0": 40000.0},
        "grid": {"n_face": 101, "z_max": 100e3},
        "run": {"dt": 120.0, "n_steps": 20, "save_every": 5},
        "source": {"kind": "wave_packet", "n_ray": 24},
        "background": "sine",
        "dtype": "float64",
    }
    out = run_experiment(spec, str(tmp_path / "out"), make_plot=False,
                         log_every=10, stream_history=True)
    back = read_state_history(tmp_path / "out" / "state_history.msgw")
    assert back["dens"].shape == (4, 24)   # 20 steps / save_every 5
    assert back["u"].shape == (4, 100)
    assert np.all(np.isfinite(back["dens"]))
    d = np.load(tmp_path / "out" / "diagnostics.npz")
    assert d["wave_action"].shape[0] == 4
    assert np.all(np.isfinite(d["u"]))
