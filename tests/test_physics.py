"""Physics-scenario tests: critical-level refraction against closed-form
solutions, and transient prescribed backgrounds."""

import numpy as np
import jax
import jax.numpy as jnp

import msgwam_tpu as mt
from msgwam_tpu.models.backgrounds import tidal_shear


def test_constant_shear_refraction_closed_form():
    """With hprop off and a constant shear du/dz = S, dm/dt = -k S exactly
    (lib/libprop.py:519-520), so m(t) = m0 - k S t to integrator accuracy —
    the mechanism that drives rays to critical levels."""
    cfg = mt.REFERENCE_RUN_CONFIG.replace(
        saturate_online=True, prognostic_mean=False
    )
    gc = mt.GridConfig()
    centers = gc.centers()
    S = 2e-3  # 2 m/s per km
    uu = S * centers
    bg = mt.make_background(gc, cfg, uu, np.zeros_like(uu))
    rays, statics = mt.wave_packet_ic(gc, cfg, bg, n_ray=8,
                                      rr_min=20e3, rr_max=30e3)
    state = mt.State(rays, mt.MeanState(jnp.asarray(uu), jnp.zeros(100)))
    n, dt = 100, 60.0
    run = mt.RunConfig(dt=dt, n_steps=n, save_every=n)
    sf, _, _ = jax.jit(lambda s, st: mt.simulate(s, st, bg, cfg, run))(state, statics)
    expect_m = np.asarray(rays.m) - np.asarray(rays.k) * S * n * dt
    np.testing.assert_allclose(np.asarray(sf.rays.m), expect_m, rtol=1e-8)
    # winds frozen in non-prognostic mode
    np.testing.assert_array_equal(np.asarray(sf.mean.u), uu)


def test_rays_stall_below_critical_level():
    """cg_r -> 0 as |m| grows: under strong constant shear, rays decelerate
    and |m| increases monotonically (critical-level approach)."""
    cfg = mt.REFERENCE_RUN_CONFIG.replace(
        saturate_online=True, prognostic_mean=False
    )
    gc = mt.GridConfig()
    centers = gc.centers()
    S = 5e-3
    uu = S * centers
    bg = mt.make_background(gc, cfg, uu, np.zeros_like(uu))
    rays, statics = mt.wave_packet_ic(gc, cfg, bg, n_ray=4,
                                      rr_min=10e3, rr_max=12e3)
    state = mt.State(rays, mt.MeanState(jnp.asarray(uu), jnp.zeros(100)))
    run = mt.RunConfig(dt=120.0, n_steps=500, save_every=50)
    sf, _, hist = jax.jit(lambda s, st: mt.simulate(s, st, bg, cfg, run))(state, statics)
    hist_state = hist[0]
    m_hist = np.asarray(hist_state.rays.m)      # (10, 4)
    assert np.all(np.diff(np.abs(m_hist), axis=0) > 0)       # |m| grows
    from msgwam_tpu.ops.dispersion import cg_r
    cgr_start = np.asarray(cg_r(rays.k, rays.l, rays.m, rays.phi, cfg.bvf))
    cgr_end = np.asarray(cg_r(sf.rays.k, sf.rays.l, sf.rays.m, sf.rays.phi, cfg.bvf))
    assert np.all(cgr_end < 0.2 * cgr_start)                 # stalling


def test_transient_prescribed_background():
    """wind_fn overwrites the mean wind each step; the wind follows the
    prescription exactly and rays refract in the time-dependent shear."""
    cfg = mt.REFERENCE_RUN_CONFIG.replace(
        saturate_online=True, prognostic_mean=False, u0=20.0, rr0=30e3,
    )
    gc = mt.GridConfig()
    centers = jnp.asarray(gc.centers())
    bg = mt.make_background(gc, cfg, np.zeros(100), np.zeros(100))
    rays, statics = mt.wave_packet_ic(gc, cfg, bg, n_ray=8)
    u0 = tidal_shear(centers, 0.0, cfg)
    state = mt.State(rays, mt.MeanState(u0, jnp.zeros(100)))

    wind_fn = lambda t: (tidal_shear(centers, t, cfg), jnp.zeros(100))
    dt, n = 120.0, 40
    run = mt.RunConfig(dt=dt, n_steps=n, save_every=n)
    sf, _, _ = jax.jit(
        lambda s, st: mt.simulate(s, st, bg, cfg, run, wind_fn=wind_fn)
    )(state, statics)
    # final wind equals the prescription at the last step's start time
    expect = np.asarray(tidal_shear(centers, (n - 1) * dt, cfg))
    np.testing.assert_allclose(np.asarray(sf.mean.u), expect, rtol=1e-12)
    # and rays responded (m changed)
    assert not np.allclose(np.asarray(sf.rays.m), np.asarray(rays.m))


def test_fixed_background_freezes_wind_but_rays_move():
    cfg = mt.REFERENCE_RUN_CONFIG.replace(prognostic_mean=False)
    gc = mt.GridConfig()
    centers = gc.centers()
    uu = np.asarray(mt.velocities_sine_homogeneous(jnp.asarray(centers), cfg))
    bg = mt.make_background(gc, cfg, uu, np.zeros_like(uu))
    rays, statics = mt.wave_packet_ic(gc, cfg, bg, n_ray=16)
    state = mt.State(rays, mt.MeanState(jnp.asarray(uu), jnp.zeros(100)))
    run = mt.RunConfig(dt=120.0, n_steps=50, save_every=50)
    sf, _, _ = jax.jit(lambda s, st: mt.simulate(s, st, bg, cfg, run))(state, statics)
    np.testing.assert_array_equal(np.asarray(sf.mean.u), uu)
    assert not np.allclose(np.asarray(sf.rays.r), np.asarray(rays.r))
