"""Integrator correctness: RK3 order of convergence, physics invariants
over full simulations."""

import numpy as np
import jax
import jax.numpy as jnp

import msgwam_tpu as mt
import pytest

from msgwam_tpu.models.integrate import INTEGRATORS, williamson_rk3


@pytest.mark.parametrize("name,expect_order", [
    ("rk3", 3), ("rk4", 4), ("euler", 1),
])
def test_integrator_order(name, expect_order):
    """Each integrator converges at its nominal order on y' = -y."""
    T = 1.0
    integ = INTEGRATORS[name]
    errs = []
    for n in (16, 32, 64):
        dt = T / n
        y = jnp.asarray(1.0)
        for _ in range(n):
            y = integ(lambda v: -v, y, dt)
        errs.append(abs(float(y) - np.exp(-T)))
    order1 = np.log2(errs[0] / errs[1])
    order2 = np.log2(errs[1] / errs[2])
    assert expect_order - 0.35 < order1 < expect_order + 0.35, (errs, order1)
    assert expect_order - 0.35 < order2 < expect_order + 0.35, (errs, order2)


def test_rk4_integrator_full_model():
    """The alternative integrator drives the coupled model and stays close
    to RK3 at the same step size."""
    cfg, gc, bg, state, statics = _default_setup()
    run = mt.RunConfig(dt=120.0, n_steps=50, save_every=50)
    a, _, _ = jax.jit(lambda s, st: mt.simulate(s, st, bg, cfg, run))(state, statics)
    cfg4 = cfg.replace(integrator="rk4")
    b, _, _ = jax.jit(lambda s, st: mt.simulate(s, st, bg, cfg4, run))(state, statics)
    np.testing.assert_allclose(
        np.asarray(a.rays.r), np.asarray(b.rays.r), rtol=1e-5
    )


def _default_setup(n_ray=60, coupled=True):
    cfg = mt.REFERENCE_RUN_CONFIG
    gc = mt.GridConfig()
    centers = gc.centers()
    uu = np.asarray(mt.velocities_sine_homogeneous(jnp.asarray(centers), cfg))
    vv = np.zeros_like(uu)
    if not coupled:
        uu = np.zeros_like(uu)
    bg = mt.make_background(gc, cfg, uu, vv)
    rays, statics = mt.wave_packet_ic(gc, cfg, bg, n_ray=n_ray)
    state = mt.State(rays, mt.MeanState(jnp.asarray(uu), jnp.asarray(vv)))
    return cfg, gc, bg, state, statics


def test_phase_space_area_conserved():
    """dr * dm per ray is invariant (ddmm = dm/dr * ddrr, lib/libprop.py:645);
    with height-independent cg_r both extents are individually constant."""
    cfg, gc, bg, state, statics = _default_setup()
    area0 = np.asarray(state.rays.dr * state.rays.dm)
    run = mt.RunConfig(dt=120.0, n_steps=200, save_every=200)
    sf, _, _ = jax.jit(lambda s, st: mt.simulate(s, st, bg, cfg, run))(state, statics)
    area = np.asarray(sf.rays.dr * sf.rays.dm)
    np.testing.assert_allclose(area, area0, rtol=1e-12)


def test_wave_action_conserved_without_saturation():
    """Pure propagation (no breaking, rays interior): total wave action
    sum(dens * dk dl dm * dr) is conserved — the reference's only runtime
    diagnostic (raytracer.py:194-240), promoted to a hard test."""
    cfg, gc, bg, state, statics = _default_setup()
    cfg = cfg.replace(kappa=1e9)  # cap unreachable -> no saturation ever
    run = mt.RunConfig(dt=120.0, n_steps=300, save_every=300)
    sf, _, _ = jax.jit(lambda s, st: mt.simulate(s, st, bg, cfg, run))(state, statics)
    def total(rays):
        return float(jnp.sum(
            rays.dens * statics.dkk * statics.dll * rays.dm * rays.dr
        ))
    a0, a1 = total(state.rays), total(sf.rays)
    # rays must still be interior for this to be exact
    assert np.all(np.asarray(sf.rays.r) < bg.faces[-1])
    np.testing.assert_allclose(a1, a0, rtol=1e-10)


def test_saturation_never_increases_density():
    cfg, gc, bg, state, statics = _default_setup()
    run = mt.RunConfig(dt=120.0, n_steps=50, save_every=1)
    _, _, hist = jax.jit(lambda s, st: mt.simulate(s, st, bg, cfg, run))(state, statics)
    hist_state, hist_active, dens_prop = hist
    # offline saturation only ever clamps downward or keeps the value
    assert np.all(np.asarray(hist_state.rays.dens) <= np.asarray(dens_prop) * (1 + 1e-12))


def test_history_decimation_consistent():
    cfg, gc, bg, state, statics = _default_setup()
    run1 = mt.RunConfig(dt=120.0, n_steps=40, save_every=1)
    run2 = mt.RunConfig(dt=120.0, n_steps=40, save_every=10)
    sf1, _, h1 = jax.jit(lambda s, st: mt.simulate(s, st, bg, cfg, run1))(state, statics)
    sf2, _, h2 = jax.jit(lambda s, st: mt.simulate(s, st, bg, cfg, run2))(state, statics)
    np.testing.assert_allclose(np.asarray(sf1.mean.u), np.asarray(sf2.mean.u), rtol=0)
    # decimated history rows equal the dense history at matching steps
    np.testing.assert_allclose(
        np.asarray(h2[0].mean.u), np.asarray(h1[0].mean.u[9::10]), rtol=0
    )


def test_frozen_inactive_rays():
    """Inactive slots must not move, and activating culling must not change
    active-ray physics when nothing meets the cull criteria."""
    cfg, gc, bg, state, statics = _default_setup()
    rays2, statics2 = mt.pad_rays(state.rays, statics, 96)
    state2 = mt.State(rays2, state.mean)
    run = mt.RunConfig(dt=120.0, n_steps=30, save_every=30)
    sf2, _, _ = jax.jit(lambda s, st: mt.simulate(s, st, bg, cfg, run))(state2, statics2)
    # padded slots frozen exactly
    np.testing.assert_array_equal(np.asarray(sf2.rays.r[60:]), np.asarray(rays2.r[60:]))
    sf1, _, _ = jax.jit(lambda s, st: mt.simulate(s, st, bg, cfg, run))(state, statics)
    np.testing.assert_array_equal(np.asarray(sf2.rays.dens[:60]), np.asarray(sf1.rays.dens))
    np.testing.assert_array_equal(np.asarray(sf2.mean.u), np.asarray(sf1.mean.u))


def test_max_span_guard_raises():
    """simulate refuses an xla-backend run whose ray volumes are wider than
    the configured projection span (silent flux truncation, ADVICE r1)."""
    import pytest

    cfg = mt.REFERENCE_RUN_CONFIG  # max_span=4, xla backend
    gc = mt.GridConfig()           # dz = 1000 m
    uu = np.zeros(gc.n_cell)
    bg = mt.make_background(gc, cfg, uu, uu)
    rays, statics = mt.wave_packet_ic(gc, cfg, bg, n_ray=8)
    rays = rays._replace(dr=jnp.full_like(rays.dr, 8000.0))  # spans 9 cells
    state = mt.State(rays, mt.MeanState(jnp.asarray(uu), jnp.asarray(uu)))
    run = mt.RunConfig(dt=120.0, n_steps=2, save_every=2)
    with pytest.raises(ValueError, match="max_span"):
        mt.simulate(state, statics, bg, cfg, run)
    # raising the span (or using the dense backend) clears the guard
    mt.simulate(state, statics, bg, cfg.replace(max_span=10), run)
    mt.simulate(state, statics, bg,
                cfg.replace(projection_backend="mxu"), run)


def test_dtype_discipline_raises():
    """A state whose dtype disagrees with cfg.dtype is rejected instead of
    running silently with mixed semantics (VERDICT r1 weak #7)."""
    import pytest

    cfg = mt.REFERENCE_RUN_CONFIG  # dtype="float64"
    gc = mt.GridConfig()
    uu = np.zeros(gc.n_cell)
    bg = mt.make_background(gc, cfg, uu, uu)
    rays, statics = mt.wave_packet_ic(gc, cfg, bg, n_ray=8)
    state = mt.State(rays, mt.MeanState(jnp.asarray(uu), jnp.asarray(uu)))
    state32 = jax.tree.map(
        lambda x: x.astype(jnp.float32) if x.dtype == jnp.float64 else x,
        state,
    )
    run = mt.RunConfig(dt=120.0, n_steps=2, save_every=2)
    with pytest.raises(TypeError, match="dtype"):
        mt.simulate(state32, statics, bg, cfg, run)
    # and a consistent f32 setup passes the check
    bg32 = jax.tree.map(lambda x: x.astype(jnp.float32), bg)
    statics32 = jax.tree.map(
        lambda x: x.astype(jnp.float32) if x.dtype == jnp.float64 else x,
        statics,
    )
    mt.simulate(state32, statics32, bg32, cfg.replace(dtype="float32"), run)
