"""Height-windowed fused kernel (ops/rhs_pallas_windowed.py) and the
``sort_every`` slot-identity machinery in ``simulate``.

The windowed kernel must be *exactly* as correct as the full fused kernel in
both regimes: windows engaged (sorted, narrow blocks) and fallback (spread
rays exceed the window).  Sorting must be invisible in the results: history
frames, relaunch, and the final state keep original slot order.
"""

import numpy as np
import jax
import jax.numpy as jnp

import msgwam_tpu as mt
from msgwam_tpu.models.rhs import rhs


def _setup(n=12000, pad_to=16384, spread=None, sort=False):
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
    if spread is not None:
        r = np.linspace(spread[0], spread[1], n).astype(np.float32)
        rng = np.random.default_rng(0)
        rng.shuffle(r)
        rays = rays._replace(r=jnp.asarray(r))
    rays, statics = mt.pad_rays(rays, statics, pad_to)
    if sort:
        order = jnp.argsort(jnp.where(statics.active, rays.r, jnp.inf))
        rays = jax.tree.map(lambda x: x[order], rays)
        statics = jax.tree.map(lambda x: x[order], statics)
    state = mt.State(
        rays, mt.MeanState(jnp.asarray(uu), jnp.zeros_like(jnp.asarray(uu)))
    )
    return cfg, bg, state, statics


def _rel(a, b):
    a, b = np.asarray(a), np.asarray(b)
    return np.max(np.abs(a - b)) / (np.max(np.abs(a)) + 1e-30)


def _assert_matches(a, b, tol):
    assert _rel(a.rays.dens, b.rays.dens) < tol
    assert _rel(a.rays.r, b.rays.r) < tol
    assert _rel(a.rays.m, b.rays.m) < tol
    assert _rel(a.mean.u, b.mean.u) < tol
    for f in ("lam", "phi", "dr", "k", "l", "dm"):
        assert np.all(np.asarray(getattr(b.rays, f)) == 0), f


def test_windowed_engaged_matches_xla():
    """Sorted rays over a 2-20 km band, 2 blocks: per-block windows engage
    inside the kernel and the result matches the XLA path."""
    cfg, bg, state, statics = _setup(spread=(2e3, 20e3), sort=True)
    cfgw = cfg.replace(rhs_backend="pallas", window_cells=32)

    a = rhs(120.0, state, statics, bg, cfg)
    b = rhs(120.0, state, statics, bg, cfgw)
    _assert_matches(a, b, 2e-5)


def test_windowed_fallback_exact():
    """Rays scattered over the whole grid blow every block's window: the
    in-kernel per-block fallback runs the full-width path, so the result
    still matches the XLA path exactly — never a silent truncation."""
    cfg, bg, state, statics = _setup(spread=(2e3, 95e3), sort=False)
    cfgw = cfg.replace(rhs_backend="pallas", window_cells=32)

    a = rhs(120.0, state, statics, bg, cfg)
    b = rhs(120.0, state, statics, bg, cfgw)
    _assert_matches(a, b, 2e-5)


def test_windowed_mixed_blocks_exact():
    """One narrow-band block + one full-spread block in the same state:
    windowed and fallback branches run side by side within one call."""
    cfg, bg, state, statics = _setup(n=16384, pad_to=16384,
                                     spread=(2e3, 95e3), sort=False)
    r = np.asarray(state.rays.r).copy()
    r[:8192] = np.linspace(3e3, 6e3, 8192)   # block 0: narrow
    state = state._replace(rays=state.rays._replace(r=jnp.asarray(r)))
    cfgw = cfg.replace(rhs_backend="pallas", window_cells=32)

    a = rhs(120.0, state, statics, bg, cfg)
    b = rhs(120.0, state, statics, bg, cfgw)
    _assert_matches(a, b, 2e-5)


def test_sort_every_transparent():
    """simulate(sort_every=N) returns history frames and final state in the
    original slot order: equal (up to reduction-order float noise) to the
    unsorted run, including with culling + relaunch exercising slot reuse."""
    cfg = mt.REFERENCE_RUN_CONFIG.replace(
        saturate_online=True, cull=True, relaunch=True, m_max=2 * np.pi / 300.0
    )
    gc = mt.GridConfig()
    centers = gc.centers()
    uu = np.asarray(mt.velocities_sine_homogeneous(jnp.asarray(centers), cfg))
    bg = mt.make_background(gc, cfg, uu, np.zeros_like(uu))
    rays, statics = mt.gaussian_spectrum_source(cfg, bg, 64)
    rays, statics = mt.pad_rays(rays, statics, 96)
    state = mt.State(rays, mt.MeanState(jnp.asarray(uu), jnp.zeros(100)))
    template = (rays, statics)
    run = mt.RunConfig(dt=120.0, n_steps=12, save_every=4)

    fa, sa, ha = mt.simulate(state, statics, bg, cfg, run, source=template)
    fb, sb, hb = mt.simulate(
        state, statics, bg, cfg, run, source=template, sort_every=3
    )

    for xa, xb in zip(jax.tree.leaves(ha), jax.tree.leaves(hb)):
        np.testing.assert_allclose(
            np.asarray(xa, dtype=np.float64),
            np.asarray(xb, dtype=np.float64), rtol=1e-9, atol=1e-18,
        )
    np.testing.assert_allclose(
        np.asarray(fa.rays.r), np.asarray(fb.rays.r), rtol=1e-9
    )
    np.testing.assert_array_equal(np.asarray(sa.active), np.asarray(sb.active))


def test_windowed_kernel_under_shard_map():
    """The adaptive-window pallas RHS composes with the sharded path: an
    8-device ('rays',) mesh run matches single-device at f32 tolerance
    (per-shard kernels + one psum at the flux transpose)."""
    from msgwam_tpu.parallel.sharding import make_mesh, sharded_simulate

    cfg, bg, state, statics = _setup(n=16384, pad_to=16384,
                                     spread=(2e3, 20e3), sort=True)
    cfgw = cfg.replace(rhs_backend="pallas", window_cells=32)
    run = mt.RunConfig(dt=120.0, n_steps=2, save_every=2)

    a, _, _ = mt.simulate(state, statics, bg, cfgw, run)
    mesh = make_mesh(8)
    b, _, _ = sharded_simulate(mesh, state, statics, bg, cfgw, run)
    assert _rel(a.rays.r, b.rays.r) < 2e-5
    assert _rel(a.mean.u, b.mean.u) < 2e-5


def test_stage_fused_step_trajectory_and_grad():
    """cfg.window_cells>0 + pallas routes whole RK3 steps through the
    stage-fused kernel: multi-step trajectories match the XLA path, and
    gradients (custom VJP through the generic path) match too."""
    cfg, bg, state, statics = _setup(n=4000, pad_to=8192,
                                     spread=(2e3, 12e3), sort=True)
    cfgw = cfg.replace(rhs_backend="pallas", window_cells=32)
    run = mt.RunConfig(dt=120.0, n_steps=4, save_every=4)

    a, _, _ = jax.jit(lambda s, st: mt.simulate(s, st, bg, cfg, run))(state, statics)
    b, _, _ = jax.jit(lambda s, st: mt.simulate(s, st, bg, cfgw, run))(state, statics)
    assert _rel(a.rays.dens, b.rays.dens) < 5e-5
    assert _rel(a.rays.r, b.rays.r) < 5e-5
    assert _rel(a.rays.m, b.rays.m) < 5e-5
    assert _rel(a.mean.u, b.mean.u) < 5e-5

    def loss_for(c):
        def loss(scale):
            s = state._replace(
                rays=state.rays._replace(dens=state.rays.dens * scale))
            final, _, _ = mt.simulate(s, statics, bg, c, run)
            return jnp.sum((final.mean.u - state.mean.u) ** 2)
        return loss

    g_xla = jax.grad(loss_for(cfg))(1.0)
    g_fused = jax.grad(loss_for(cfgw))(1.0)
    assert np.isfinite(float(g_fused)) and float(g_fused) != 0.0
    np.testing.assert_allclose(float(g_fused), float(g_xla), rtol=5e-4)


def test_window_fallback_stats_diagnostic():
    """The XLA mirror of the kernels' in-kernel window arithmetic: 0
    fallbacks for a coherent (sorted, narrow-band) buffer, all-fallback for
    a shuffled full-grid buffer, and sorting a decohered buffer restores
    full window coverage."""
    from msgwam_tpu.diagnostics import window_fallback_stats

    # coherent: 2-20 km sorted -> every block spans well under W=32 cells
    cfg, bg, state, statics = _setup(spread=(2e3, 20e3), sort=True)
    cfgw = cfg.replace(rhs_backend="pallas", window_cells=32)
    s = window_fallback_stats(120.0, state, statics, bg, cfgw)
    assert int(s.n_fallback) == 0
    assert float(s.fallback_rate) == 0.0

    # decohered: shuffled over the whole grid -> every block falls back
    cfg, bg, state, statics = _setup(n=16384, pad_to=16384,
                                     spread=(2e3, 95e3), sort=False)
    s = window_fallback_stats(120.0, state, statics, bg, cfgw)
    assert int(s.n_fallback) == int(s.n_blocks) > 0
    assert float(s.fallback_rate) == 1.0

    # ... and height-sorting the same buffer restores windows once W covers
    # the per-block sorted span (16384 rays over 93 cells -> ~47 cells per
    # 8192-ray block: sorting alone cannot help W=32, but W=64 engages)
    order = jnp.argsort(jnp.where(statics.active, state.rays.r, jnp.inf))
    rays = jax.tree.map(lambda x: x[order], state.rays)
    st = jax.tree.map(lambda x: x[order], statics)
    sorted_state = state._replace(rays=rays)
    s = window_fallback_stats(120.0, sorted_state, st, bg, cfgw)
    assert int(s.n_fallback) == int(s.n_blocks)  # W=32 < 47-cell block span
    s = window_fallback_stats(
        120.0, sorted_state, st, bg, cfgw.replace(window_cells=64))
    assert int(s.n_fallback) == 0


def test_window_coherence_long_horizon_measured():
    """Coherence stress (VERDICT r2): evolve a launch-ordered spectrum for
    12 simulated hours with coupled mean flow + online saturation and track
    the would-be fallback rate of the adaptive-window kernels along the
    trajectory.  Measured behavior (also benchmarks/RESULTS.md): the rate
    starts at exactly 0 and *degrades* as dispersion spreads each block's
    heights (the m-spectrum gives each block the full cg_r range, so spans
    grow ~ Δcg_r·t) — by ~1000 bench steps roughly half the blocks run
    full-width.  The kernels stay exact throughout (per-block fallback);
    this diagnostic is what makes the silent perf loss visible, and one
    height re-sort restores full window coverage (recovery path)."""
    from msgwam_tpu.diagnostics import window_fallback_stats

    cfg, bg, state, statics = _setup(n=32768, pad_to=32768)
    cfgw = cfg.replace(rhs_backend="pallas",
                       window_cells=16)  # the scan-path auto floor
    # fresh launch-ordered buffer: fully windowed
    s0 = window_fallback_stats(120.0, state, statics, bg, cfgw)
    assert float(s0.fallback_rate) == 0.0

    # evolve through the fast mxu scan path (same physics; the diagnostic
    # only needs the state trajectory, not the kernel itself)
    run = mt.RunConfig(dt=120.0, n_steps=120, save_every=120)
    sim = jax.jit(lambda s, st: mt.simulate(s, st, bg, cfg, run))

    rates = []
    for _ in range(3):  # 3 x 120 steps = 12 h
        state, statics, _ = sim(state, statics)
        s = window_fallback_stats(120.0, state, statics, bg, cfgw)
        rates.append(float(s.fallback_rate))

    # dispersion decoheres the buffer: the diagnostic sees the degradation
    assert rates[-1] > 0.0, rates

    # recovery path: a height sort restores windows for every block whose
    # sorted span fits W.  Measured on this trajectory: the dense launch
    # blocks recover at small W, but the *sparse fast tail* (including
    # never-culled out-of-domain rays, reference quirk 4) spans ~70 cells
    # even sorted, so full coverage here needs W=64 — sorted-block locality
    # is a density property, which is why the kernels fall back per block
    # instead of assuming sorting fixes everything.
    order = jnp.argsort(jnp.where(statics.active, state.rays.r, jnp.inf))
    rays = jax.tree.map(lambda x: x[order], state.rays)
    st = jax.tree.map(lambda x: x[order], statics)
    s = window_fallback_stats(
        120.0, state._replace(rays=rays), st, bg,
        cfgw.replace(window_cells=64))
    assert int(s.n_fallback) == 0
