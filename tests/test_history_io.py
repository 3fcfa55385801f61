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
