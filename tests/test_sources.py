"""Ray lifecycle: culling criteria, relaunch slot reuse, spectrum sources
(BASELINE configs 3-4; no reference counterpart)."""

import numpy as np
import jax
import jax.numpy as jnp

import msgwam_tpu as mt


def _setup():
    cfg = mt.REFERENCE_RUN_CONFIG.replace(cull=True, m_max=2 * np.pi / 500.0)
    gc = mt.GridConfig()
    centers = gc.centers()
    uu = np.zeros(gc.n_cell)
    bg = mt.make_background(gc, cfg, uu, uu)
    rays, statics = mt.wave_packet_ic(gc, cfg, bg, n_ray=16)
    state = mt.State(rays, mt.MeanState(jnp.asarray(uu), jnp.asarray(uu)))
    return cfg, gc, bg, state, statics


def test_cull_criteria():
    cfg, gc, bg, state, statics = _setup()
    rays = state.rays
    # ray 0: above the domain; ray 1: below; ray 2: critical-level m; ray 3: NaN
    r = np.asarray(rays.r).copy()
    m = np.asarray(rays.m).copy()
    dens = np.asarray(rays.dens).copy()
    r[0] = 200e3
    r[1] = -50e3
    m[2] = -2 * np.pi / 100.0  # |m| > m_max
    dens[3] = np.nan
    rays = rays._replace(r=jnp.asarray(r), m=jnp.asarray(m), dens=jnp.asarray(dens))
    state = mt.State(rays, state.mean)
    with jax.debug_nans(False):  # this test injects NaN on purpose
        _, statics2 = mt.cull(state, statics, bg, cfg)
    active = np.asarray(statics2.active)
    assert not active[0] and not active[1] and not active[2] and not active[3]
    assert np.all(active[4:])


def test_relaunch_fills_only_inactive():
    cfg, gc, bg, state, statics = _setup()
    source = mt.gaussian_spectrum_source(cfg, bg, 16)
    dead = np.zeros(16, bool)
    dead[[2, 5]] = True
    statics = statics._replace(active=jnp.asarray(~dead))
    state2, statics2 = mt.relaunch(state, statics, source)
    assert np.all(np.asarray(statics2.active))
    np.testing.assert_array_equal(
        np.asarray(state2.rays.r)[~dead], np.asarray(state.rays.r)[~dead]
    )
    np.testing.assert_array_equal(
        np.asarray(state2.rays.r)[dead], np.asarray(source[0].r)[dead]
    )
    np.testing.assert_array_equal(
        np.asarray(state2.rays.dens)[dead], np.asarray(source[0].dens)[dead]
    )


def test_cull_relaunch_simulation_stays_full():
    """With culling + relaunch on, the buffer refills every step and the run
    stays finite under a strong shear that drives rays critical."""
    cfg, gc, bg, state, statics = _setup()
    cfg = cfg.replace(relaunch=True, m_max=2 * np.pi / 2000.0)
    centers = gc.centers()
    uu = 40.0 * np.tanh((centers - 30e3) / 1e4)  # strong jet -> critical levels
    bg = mt.make_background(gc, cfg, uu, np.zeros_like(uu))
    source = mt.gaussian_spectrum_source(cfg, bg, 16)
    state = mt.State(state.rays, mt.MeanState(jnp.asarray(uu), jnp.zeros(100)))
    run = mt.RunConfig(dt=120.0, n_steps=300, save_every=300)
    sf, stf, _ = jax.jit(
        lambda s, st: mt.simulate(s, st, bg, cfg, run, source=source)
    )(state, statics)
    assert np.all(np.asarray(stf.active))
    for leaf in sf.rays:
        assert np.all(np.isfinite(np.asarray(leaf)))


def test_stochastic_source_draws():
    cfg, gc, bg, state, statics = _setup()
    k1, k2 = jax.random.split(jax.random.key(0))
    s1 = mt.gaussian_spectrum_source(cfg, bg, 64, key=k1)
    s2 = mt.gaussian_spectrum_source(cfg, bg, 64, key=k2)
    assert not np.allclose(np.asarray(s1[0].m), np.asarray(s2[0].m))
    assert np.all(np.asarray(s1[0].m) < 0)
    assert np.all(np.isfinite(np.asarray(s1[0].dens)))


def test_relaunch_every_interval():
    """The relaunch_every > 1 path (lax.cond) matches every-step relaunch
    in steady state and runs finite."""
    cfg, gc, bg, state, statics = _setup()
    cfg = cfg.replace(relaunch=True, m_max=2 * np.pi / 2000.0)
    centers = gc.centers()
    uu = 40.0 * np.tanh((centers - 30e3) / 1e4)
    bg = mt.make_background(gc, cfg, uu, np.zeros_like(uu))
    source = mt.gaussian_spectrum_source(cfg, bg, 16)
    state = mt.State(state.rays, mt.MeanState(jnp.asarray(uu), jnp.zeros(100)))
    run = mt.RunConfig(dt=120.0, n_steps=60, save_every=60)
    sf, stf, _ = jax.jit(
        lambda s, st: mt.simulate(s, st, bg, cfg, run, source=source,
                                  relaunch_every=10)
    )(state, statics)
    assert np.all(np.isfinite(np.asarray(sf.rays.dens)))
    # slots refill at most 10 steps after culling; at the end of a
    # 60-step run (a relaunch multiple) everything is active again
    assert np.all(np.asarray(stf.active))


def test_stochastic_source_z_jitter():
    """Keyed draws jitter launch heights within half a launch-layer
    thickness (dead-variable fix, round 2); deterministic draws don't."""
    cfg, gc, bg, state, statics = _setup()
    det = mt.gaussian_spectrum_source(cfg, bg, 64, z_launch=3000.0,
                                      dz_launch=1000.0)
    sto = mt.gaussian_spectrum_source(cfg, bg, 64, z_launch=3000.0,
                                      dz_launch=1000.0,
                                      key=jax.random.key(7))
    r_det = np.asarray(det[0].r)
    r_sto = np.asarray(sto[0].r)
    assert np.all(r_det == 3000.0)
    assert np.std(r_sto) > 0
    assert np.all(np.abs(r_sto - 3000.0) <= 500.0)


def test_keyed_source_per_relaunch_variation():
    """A callable source draws a fresh template per relaunch: two different
    source_keys give different-but-valid final ensembles (VERDICT item 6)."""
    cfg, gc, bg, state, statics = _setup()
    cfg = cfg.replace(relaunch=True, m_max=2 * np.pi / 2000.0)
    centers = gc.centers()
    uu = 40.0 * np.tanh((centers - 30e3) / 1e4)
    bg = mt.make_background(gc, cfg, uu, np.zeros_like(uu))
    source_fn = lambda key: mt.gaussian_spectrum_source(cfg, bg, 16, key=key)
    state = mt.State(state.rays, mt.MeanState(jnp.asarray(uu), jnp.zeros(100)))
    run = mt.RunConfig(dt=120.0, n_steps=200, save_every=200)
    sim = jax.jit(lambda s, st, key: mt.simulate(
        s, st, bg, cfg, run, source=source_fn, source_key=key))
    sa, sta, _ = sim(state, statics, jax.random.key(1))
    sb, stb, _ = sim(state, statics, jax.random.key(2))
    for sf, stf in [(sa, sta), (sb, stb)]:
        assert np.all(np.asarray(stf.active))
        for leaf in sf.rays:
            assert np.all(np.isfinite(np.asarray(leaf)))
    # different keys inject different spectra -> different ensembles
    assert not np.allclose(np.asarray(sa.rays.m), np.asarray(sb.rays.m))


def test_callable_source_requires_key():
    cfg, gc, bg, state, statics = _setup()
    cfg = cfg.replace(relaunch=True)
    source_fn = lambda key: mt.gaussian_spectrum_source(cfg, bg, 16, key=key)
    run = mt.RunConfig(dt=120.0, n_steps=2, save_every=2)
    import pytest
    with pytest.raises(ValueError, match="source_key"):
        mt.simulate(state, statics, bg, cfg, run, source=source_fn)
