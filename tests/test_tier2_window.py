"""Second window tier (``window_cells2``): exactness and branch coverage.

The span study (tools/span_study.py) showed per-block spans go bimodal
after ~1000 steps: coherent blocks stay under ~16-24 cells while the
dispersive fast-tail blocks mix to 80-100.  ``window_cells2`` inserts a
wide second window between the W=16 fast path and the exact full-width
fallback.  These tests decohere a buffer so that blocks land in the
(W, W2] band — verified via ``window_fallback_stats`` at both widths, so
the tier-2 branch is provably the one executing — and require agreement
with the XLA scan path and with the tier-less kernel."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import msgwam_tpu as mt
from msgwam_tpu.diagnostics import window_fallback_stats
from msgwam_tpu.ops.step_pallas import simulate_resident
from msgwam_tpu.ops.step_pallas_stream import simulate_streaming

N = 2000
W2 = 64


@pytest.fixture(scope="module")
def setup():
    cfg = mt.REFERENCE_RUN_CONFIG.replace(
        saturate_online=True, dtype="float32",
        projection_backend="mxu", interp_backend="mxu")
    gc = mt.GridConfig()
    centers = gc.centers()
    uu = np.asarray(mt.velocities_sine_homogeneous(
        jnp.asarray(centers, jnp.float32), cfg)).astype(np.float32)
    bg = mt.make_background(gc, cfg, uu, np.zeros_like(uu),
                            dtype=jnp.float32)
    rays, statics = mt.gaussian_spectrum_source(cfg, bg, N,
                                                dtype=jnp.float32)
    # decohere: spread launch heights over ~40 cells, so every block's
    # span lands strictly between W=16 and W2=64
    rng = np.random.default_rng(0)
    rays = rays._replace(r=jnp.asarray(
        np.asarray(rays.r) + rng.uniform(0, 38e3, N).astype(np.float32)))
    state = mt.State(rays, mt.MeanState(jnp.asarray(uu),
                                        jnp.zeros_like(jnp.asarray(uu))))
    run = mt.RunConfig(dt=120.0, n_steps=6, save_every=6)
    return cfg, bg, state, statics, run


def _rel(a, b):
    a, b = np.asarray(a), np.asarray(b)
    return np.max(np.abs(a - b)) / (np.max(np.abs(a)) + 1e-30)


def test_blocks_actually_land_in_the_tier_band(setup):
    cfg, bg, state, statics, run = setup
    wcfg = cfg.replace(rhs_backend="pallas")
    s16 = window_fallback_stats(run.dt, state, statics, bg,
                                wcfg.replace(window_cells=16))
    s64 = window_fallback_stats(run.dt, state, statics, bg,
                                wcfg.replace(window_cells=W2))
    assert float(s16.fallback_rate) > 0.99   # W=16 always falls back here
    assert float(s64.fallback_rate) == 0.0   # ...and W2=64 always fits


@pytest.mark.parametrize("driver", [simulate_resident, simulate_streaming],
                         ids=["resident", "streaming"])
def test_tier2_matches_scan_and_tierless(setup, driver):
    cfg, bg, state, statics, run = setup
    if driver is simulate_resident:
        rays, statics_p = mt.pad_rays(state.rays, statics, 2048)
        state_l, statics_l = mt.State(rays, state.mean), statics_p
    else:
        state_l, statics_l = state, statics
    ref, _, _ = jax.jit(lambda s, st: mt.simulate(
        s, st, bg, cfg, run, validate=False))(state_l, statics_l)
    f0, _, _ = driver(state_l, statics_l, bg, cfg, run)
    f2, _, _ = driver(state_l, statics_l, bg,
                      cfg.replace(window_cells2=W2), run)
    # tier-2 vs tier-less megakernel: identical math, different widths
    for name, a, b in (("dens", f0.rays.dens, f2.rays.dens),
                       ("r", f0.rays.r, f2.rays.r),
                       ("m", f0.rays.m, f2.rays.m),
                       ("u", f0.mean.u, f2.mean.u)):
        assert _rel(a, b) < 2e-6, name
    # tier-2 vs the XLA scan path: ground truth
    for name, a, b in (("dens", ref.rays.dens, f2.rays.dens),
                       ("r", ref.rays.r, f2.rays.r),
                       ("m", ref.rays.m, f2.rays.m),
                       ("u", ref.mean.u, f2.mean.u)):
        assert _rel(a, b) < 3e-5, name


def test_tier2_scan_kernel_matches_xla(setup):
    """The adaptive-window scan kernel (rhs_backend='pallas') honors the
    same window_cells2 ladder."""
    cfg, bg, state, statics, run = setup
    pcfg = cfg.replace(rhs_backend="pallas", window_cells=16,
                       window_cells2=W2)
    xcfg = cfg.replace(rhs_backend="xla", window_cells=0)
    fp, _, _ = jax.jit(lambda s, st: mt.simulate(
        s, st, bg, pcfg, run, validate=False))(state, statics)
    fx, _, _ = jax.jit(lambda s, st: mt.simulate(
        s, st, bg, xcfg, run, validate=False))(state, statics)
    for name, a, b in (("dens", fx.rays.dens, fp.rays.dens),
                       ("r", fx.rays.r, fp.rays.r),
                       ("m", fx.rays.m, fp.rays.m),
                       ("u", fx.mean.u, fp.mean.u)):
        assert _rel(a, b) < 3e-5, name


def test_tier2_noop_when_not_wider(setup):
    """window_cells2 <= window_cells silently disables the tier (the
    ladder must be strictly widening)."""
    cfg, bg, state, statics, run = setup
    f0, _, _ = simulate_streaming(state, statics, bg, cfg, run)
    f1, _, _ = simulate_streaming(state, statics, bg,
                                  cfg.replace(window_cells2=16), run)
    assert _rel(f0.rays.dens, f1.rays.dens) == 0.0
    assert _rel(f0.mean.u, f1.mean.u) == 0.0
