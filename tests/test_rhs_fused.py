"""The fused-RHS pallas kernel (interpret mode on CPU) against the XLA
path: identical physics at float32 tolerance, including through RK3 steps
and inactive-slot masking."""

import numpy as np
import jax
import jax.numpy as jnp

import msgwam_tpu as mt


def _setup(n=1500, pad_to=2048):
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
        rays,
        mt.MeanState(jnp.asarray(uu), jnp.zeros_like(jnp.asarray(uu))),
    )
    return cfg, bg, state, statics


def _rel(a, b):
    a, b = np.asarray(a), np.asarray(b)
    return np.max(np.abs(a - b)) / (np.max(np.abs(a)) + 1e-30)


import pytest


@pytest.mark.parametrize("w_cells", [0, 16])
def test_fused_rhs_matches_xla(w_cells):
    """Both fused-kernel flavours: the plain full-width kernel
    (window_cells=0) and the adaptive-window default (16)."""
    from msgwam_tpu.models.rhs import rhs

    cfg, bg, state, statics = _setup()
    a = rhs(120.0, state, statics, bg, cfg)
    b = rhs(120.0, state, statics, bg,
            cfg.replace(rhs_backend="pallas", window_cells=w_cells))
    assert _rel(a.rays.dens, b.rays.dens) < 2e-5
    assert _rel(a.rays.r, b.rays.r) < 2e-5
    assert _rel(a.rays.m, b.rays.m) < 2e-5
    assert _rel(a.mean.u, b.mean.u) < 2e-5
    for f in ("lam", "phi", "dr", "k", "l", "dm"):
        assert np.all(np.asarray(getattr(b.rays, f)) == 0), f


def test_fused_step_trajectory():
    cfg, bg, state, statics = _setup(n=500, pad_to=1024)
    run = mt.RunConfig(dt=120.0, n_steps=5, save_every=5)
    a, _, _ = jax.jit(
        lambda s, st: mt.simulate(s, st, bg, cfg, run)
    )(state, statics)
    # window_cells=0: the plain fused kernel drives the whole step (the
    # windowed flavour's step path is covered by test_windowed.py)
    cfgp = cfg.replace(rhs_backend="pallas", window_cells=0)
    b, _, _ = jax.jit(
        lambda s, st: mt.simulate(s, st, bg, cfgp, run)
    )(state, statics)
    assert _rel(a.rays.r, b.rays.r) < 1e-4
    assert _rel(a.rays.m, b.rays.m) < 1e-4
    assert _rel(a.mean.u, b.mean.u) < 1e-4
    # padded slots stayed frozen in both
    np.testing.assert_array_equal(
        np.asarray(b.rays.r[500:]), np.asarray(state.rays.r[500:])
    )


def test_fused_rhs_gradients_match_xla():
    """The pallas backend is differentiable (custom_vjp backward reuses the
    XLA path): gradients through a 3-step coupled simulate match the
    XLA-backend gradients at f32 tolerance."""
    cfg, bg, state, statics = _setup(n=500, pad_to=1024)
    run = mt.RunConfig(dt=120.0, n_steps=3, save_every=3)

    def loss_for(backend_cfg):
        def loss(scale):
            s = state._replace(
                rays=state.rays._replace(dens=state.rays.dens * scale)
            )
            final, _, _ = mt.simulate(s, statics, bg, backend_cfg, run)
            return jnp.sum((final.mean.u - state.mean.u) ** 2)
        return loss

    g_xla = jax.grad(loss_for(cfg))(1.0)
    g_pal = jax.grad(loss_for(cfg.replace(rhs_backend="pallas")))(1.0)
    assert np.isfinite(float(g_pal)) and float(g_pal) != 0.0
    np.testing.assert_allclose(float(g_pal), float(g_xla), rtol=5e-4)
