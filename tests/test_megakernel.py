"""VMEM-resident megakernel (ops/step_pallas.py) vs the scan path: same
trajectories at f32 tolerance, same history framing, guard rails."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import msgwam_tpu as mt
from msgwam_tpu.ops.step_pallas import simulate_resident


def _setup(n=900, pad_to=1024):
    cfg = mt.REFERENCE_RUN_CONFIG.replace(
        saturate_online=True, dtype="float32",
        projection_backend="mxu", interp_backend="mxu",
    )
    gc = mt.GridConfig()
    centers = gc.centers()
    uu = np.asarray(
        mt.velocities_sine_homogeneous(jnp.asarray(centers, jnp.float32), cfg)
    ).astype(np.float32)
    bg = mt.make_background(gc, cfg, uu, np.zeros_like(uu), dtype=jnp.float32)
    rays, statics = mt.gaussian_spectrum_source(cfg, bg, n, dtype=jnp.float32)
    rays, statics = mt.pad_rays(rays, statics, pad_to)
    state = mt.State(
        rays, mt.MeanState(jnp.asarray(uu), jnp.zeros_like(jnp.asarray(uu)))
    )
    return cfg, bg, state, statics


def _rel(a, b):
    a, b = np.asarray(a), np.asarray(b)
    return np.max(np.abs(a - b)) / (np.max(np.abs(a)) + 1e-30)


def test_megakernel_matches_scan_path():
    cfg, bg, state, statics = _setup()
    run = mt.RunConfig(dt=120.0, n_steps=9, save_every=3)

    a, _, ha = mt.simulate(state, statics, bg, cfg, run)
    b, sb, hb = simulate_resident(state, statics, bg, cfg, run)

    assert _rel(a.rays.dens, b.rays.dens) < 3e-5
    assert _rel(a.rays.r, b.rays.r) < 3e-5
    assert _rel(a.rays.m, b.rays.m) < 3e-5
    assert _rel(a.mean.u, b.mean.u) < 3e-5
    # frozen fields pass through untouched
    np.testing.assert_array_equal(np.asarray(a.rays.k), np.asarray(b.rays.k))
    # history frames match the scan path's default observable framing
    ha_state, ha_act, _ = ha
    hb_state, hb_act, _ = hb
    assert hb_state.rays.dens.shape == ha_state.rays.dens.shape
    np.testing.assert_array_equal(np.asarray(ha_act), np.asarray(hb_act))
    for t in range(3):
        assert _rel(ha_state.mean.u[t], hb_state.mean.u[t]) < 3e-5
        assert _rel(ha_state.rays.r[t], hb_state.rays.r[t]) < 3e-5


def test_megakernel_include_t0_and_jit():
    cfg, bg, state, statics = _setup(n=300, pad_to=512)
    run = mt.RunConfig(dt=120.0, n_steps=4, save_every=2)
    f = jax.jit(lambda s, st: simulate_resident(
        s, st, bg, cfg, run, include_t0=True))
    final, _, hist = f(state, statics)
    hist_state, _, _ = hist
    assert hist_state.rays.r.shape[0] == 3  # t0 + 2 save points
    np.testing.assert_allclose(
        np.asarray(hist_state.rays.r[0]), np.asarray(state.rays.r))


def test_megakernel_offline_saturation_matches_scan_path():
    """The reference's default mode — offline direct saturation with FD
    rates across the step (incl. quirk 2) — runs as a 4th in-kernel grid
    phase and matches the scan path, for both faithful_offline_rates
    settings; dens_prop carries the pre-saturation density."""
    cfg, bg, state, statics = _setup()
    # amplify so the cap actually clamps within the short run
    state = state._replace(
        rays=state.rays._replace(dens=state.rays.dens * 50.0))
    run = mt.RunConfig(dt=120.0, n_steps=9, save_every=3)
    for faithful_rates in (True, False):
        c = cfg.replace(saturate_online=False,
                        faithful_offline_rates=faithful_rates)
        a, _, ha = mt.simulate(state, statics, bg, c, run)
        b, _, hb = simulate_resident(state, statics, bg, c, run)
        assert _rel(a.rays.dens, b.rays.dens) < 3e-5, faithful_rates
        assert _rel(a.rays.r, b.rays.r) < 3e-5
        assert _rel(a.mean.u, b.mean.u) < 3e-5
        # dens_prop (pre-saturation) matches the scan path's aux channel
        _, _, prop_a = ha
        _, _, prop_b = hb
        assert _rel(prop_a, prop_b) < 3e-5

    # the in-kernel clamp actually fires: an effectively-uncapped run
    # (kappa huge) ends with different densities
    c = cfg.replace(saturate_online=False)
    b, _, _ = simulate_resident(state, statics, bg, c, run)
    b_nocap, _, _ = simulate_resident(
        state, statics, bg, c.replace(kappa=1e9), run)
    assert np.any(np.asarray(b.rays.dens) != np.asarray(b_nocap.rays.dens))


def test_megakernel_guard_rails():
    cfg, bg, state, statics = _setup(n=300, pad_to=512)
    run = mt.RunConfig(dt=120.0, n_steps=4, save_every=2)
    with pytest.raises(ValueError, match="hprop"):
        simulate_resident(state, statics, bg,
                          cfg.replace(hprop=True), run)
    with pytest.raises(ValueError, match="culling"):
        simulate_resident(state, statics, bg,
                          cfg.replace(cull=True), run)
    with pytest.raises(ValueError, match="VMEM-resident"):
        rays, st2 = mt.pad_rays(state.rays, statics, 262144)
        simulate_resident(mt.State(rays, state.mean), st2, bg, cfg, run)
