"""VMEM-resident megakernel (ops/step_pallas.py) vs the scan path: same
trajectories at f32 tolerance, same history framing, guard rails."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import msgwam_tpu as mt
from msgwam_tpu.ops.step_pallas import simulate_resident


def _setup(n=900, pad_to=1024, amp=None):
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
    kw = {} if amp is None else {"amplitude_alpha": amp}
    rays, statics = mt.gaussian_spectrum_source(cfg, bg, n, dtype=jnp.float32,
                                                **kw)
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
    # cull/relaunch now route to the streaming lifecycle kernel
    # (tests/test_lifecycle_kernel.py); its own guards apply
    with pytest.raises(ValueError, match="source template"):
        simulate_resident(state, statics, bg,
                          cfg.replace(relaunch=True), run)
    with pytest.raises(ValueError, match="saturate_online"):
        simulate_resident(
            state, statics, bg,
            cfg.replace(cull=True, saturate_online=False), run)


def _to_f64(tree):
    return jax.tree.map(
        lambda x: x.astype(jnp.float64)
        if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating) else x, tree)


def test_megakernel_deposit_accuracy_vs_f64_oracle():
    """Deposit-accuracy proof for the megakernel's Kahan-compensated
    in-kernel flux accumulation (VERDICT r2): one prognostic step at a
    multi-tile size, and the wind increment — with phi0=0 a *pure* flux
    observable (Coriolis and pressure-gradient terms vanish,
    lib/libprop.py:523-539) — stays within 1e-6 relative of the float64
    oracle through the parity-grade xla backends."""
    n = 4096  # 32 rows -> 4 tiles: the accumulator combines 4 partials
    cfg, bg, state, statics = _setup(n=n, pad_to=n)
    run = mt.RunConfig(dt=120.0, n_steps=1, save_every=1)
    b, _, _ = simulate_resident(state, statics, bg, cfg, run)
    du32 = np.asarray(b.mean.u, np.float64) - np.asarray(state.mean.u,
                                                         np.float64)

    cfg64 = cfg.replace(dtype="float64", projection_backend="xla",
                        interp_backend="gather", rhs_backend="xla",
                        window_cells=0)
    gc = mt.GridConfig()
    uu64 = np.asarray(state.mean.u, np.float64)
    bg64 = mt.make_background(gc, cfg64, uu64, np.zeros_like(uu64))
    a, _, _ = mt.simulate(_to_f64(state), _to_f64(statics), bg64, cfg64, run)
    du64 = np.asarray(a.mean.u) - uu64

    err = np.max(np.abs(du32 - du64)) / np.max(np.abs(du64))
    assert err < 1e-6, err


@pytest.mark.slow
def test_megakernel_deposit_accuracy_at_capacity():
    """Same f64-oracle comparison at the full 131,072-ray VMEM capacity
    (16 Kahan-combined 64-row tiles — the exact configuration of the
    metric of record)."""
    n = 131072
    cfg, bg, state, statics = _setup(n=n, pad_to=n)
    run = mt.RunConfig(dt=120.0, n_steps=1, save_every=1)
    b, _, _ = simulate_resident(state, statics, bg, cfg, run)
    du32 = np.asarray(b.mean.u, np.float64) - np.asarray(state.mean.u,
                                                         np.float64)

    cfg64 = cfg.replace(dtype="float64", projection_backend="xla",
                        interp_backend="gather", rhs_backend="xla",
                        window_cells=0)
    gc = mt.GridConfig()
    uu64 = np.asarray(state.mean.u, np.float64)
    bg64 = mt.make_background(gc, cfg64, uu64, np.zeros_like(uu64))
    a, _, _ = mt.simulate(_to_f64(state), _to_f64(statics), bg64, cfg64, run)
    du64 = np.asarray(a.mean.u) - uu64

    err = np.max(np.abs(du32 - du64)) / np.max(np.abs(du64))
    assert err < 1e-6, err


@pytest.mark.slow
def test_megakernel_long_horizon_matches_scan_path():
    """>=100-step trajectory consistency (VERDICT r2).  The coupled system
    amplifies f32 rounding (measured: a 1e-7 relative kick to the initial
    density spreads to ~1e-3 in r and ~8e-3 in u over 100 steps), so a
    fixed tight tolerance would test chaos, not the kernel.  Instead the
    scan path's own sensitivity to a 1e-7 perturbation *calibrates* the
    bound: the megakernel must stay within 3x the scan path's intrinsic
    f32 spread on every field."""
    cfg, bg, state, statics = _setup(n=1000, pad_to=1024)
    run = mt.RunConfig(dt=120.0, n_steps=100, save_every=100)
    a, _, _ = mt.simulate(state, statics, bg, cfg, run)
    b, _, _ = simulate_resident(state, statics, bg, cfg, run)
    # intrinsic sensitivity of the trajectory itself
    sp = state._replace(
        rays=state.rays._replace(dens=state.rays.dens * (1.0 + 1e-7)))
    c, _, _ = mt.simulate(sp, statics, bg, cfg, run)
    for field in ("dens", "r", "m"):
        diff = _rel(getattr(a.rays, field), getattr(b.rays, field))
        spread = _rel(getattr(a.rays, field), getattr(c.rays, field))
        assert diff < 3.0 * max(spread, 1e-6), (field, diff, spread)
    diff = _rel(a.mean.u, b.mean.u)
    spread = _rel(a.mean.u, c.mean.u)
    assert diff < 3.0 * max(spread, 1e-6), ("u", diff, spread)


def test_megakernel_rejects_f64_state():
    """The kernel computes in f32; an f64 parity-config state must raise,
    not silently down-cast (ADVICE r2)."""
    cfg, bg, state, statics = _setup(n=300, pad_to=512)
    run = mt.RunConfig(dt=120.0, n_steps=2, save_every=2)
    with pytest.raises(TypeError, match="float32"):
        simulate_resident(_to_f64(state), _to_f64(statics), bg,
                          cfg.replace(dtype="float64"), run)


# --- HBM-streaming variant (ops/step_pallas_stream.py) --------------------

def test_streaming_matches_scan_path_online():
    """The streaming megakernel (any-size variant of simulate_resident)
    matches the scan path at f32 tolerance, including history framing and
    the double-buffered DMA pipeline crossing stage boundaries."""
    from msgwam_tpu.ops.step_pallas_stream import simulate_streaming

    cfg, bg, state, statics = _setup(n=24576, pad_to=24576)
    run = mt.RunConfig(dt=120.0, n_steps=4, save_every=2)
    a, _, ha = mt.simulate(state, statics, bg, cfg, run)
    b, _, hb = simulate_streaming(state, statics, bg, cfg, run)
    assert _rel(a.rays.dens, b.rays.dens) < 3e-5
    assert _rel(a.rays.r, b.rays.r) < 3e-5
    assert _rel(a.rays.m, b.rays.m) < 3e-5
    assert _rel(a.mean.u, b.mean.u) < 3e-5
    ha_s, ha_a, _ = ha
    hb_s, hb_a, _ = hb
    assert hb_s.rays.dens.shape == ha_s.rays.dens.shape
    np.testing.assert_array_equal(np.asarray(ha_a), np.asarray(hb_a))
    assert _rel(ha_s.mean.u[0], hb_s.mean.u[0]) < 3e-5


def test_streaming_tile_rows_invariance():
    """The streamed-tile height is a pure scheduling knob: tile_rows=128
    (the measured 1e6 champion, auto-selected there) must reproduce the
    default-tile run to f32 accumulation tolerance — per-tile window
    bounds and flux partial-sum grouping change with the merge
    granularity, but every deposit path stays exact."""
    from msgwam_tpu.ops.step_pallas_stream import simulate_streaming

    cfg, bg, state, statics = _setup(n=24576, pad_to=24576)
    run = mt.RunConfig(dt=120.0, n_steps=2, save_every=2)
    a, _, _ = simulate_streaming(state, statics, bg, cfg, run, tile_rows=64)
    b, _, _ = simulate_streaming(state, statics, bg, cfg, run, tile_rows=128)
    assert _rel(a.rays.dens, b.rays.dens) < 1e-5
    assert _rel(a.rays.r, b.rays.r) < 1e-5
    assert _rel(a.mean.u, b.mean.u) < 1e-5


def test_streaming_offline_saturation_and_dens_prop():
    """Offline direct saturation (the reference default, quirk 2 included)
    as the streaming kernel's 4th grid phase: saturated trajectory and the
    pre-saturation dens_prop channel both match the scan path."""
    from msgwam_tpu.ops.step_pallas_stream import simulate_streaming

    cfg, bg, state, statics = _setup(n=24576, pad_to=24576)
    state = state._replace(
        rays=state.rays._replace(dens=state.rays.dens * 50.0))
    c = cfg.replace(saturate_online=False)
    run = mt.RunConfig(dt=120.0, n_steps=4, save_every=2)
    a, _, ha = mt.simulate(state, statics, bg, c, run)
    b, _, hb = simulate_streaming(state, statics, bg, c, run)
    assert _rel(a.rays.dens, b.rays.dens) < 3e-5
    assert _rel(a.mean.u, b.mean.u) < 3e-5
    assert _rel(ha[2], hb[2]) < 3e-5    # dens_prop
    # the clamp actually fired in this configuration
    assert np.any(np.asarray(a.rays.dens) != np.asarray(state.rays.dens))


def test_resident_dispatches_to_streaming_above_capacity():
    """simulate_resident transparently runs any ray count: above the
    131,072-ray VMEM capacity it routes to the streaming kernel with the
    same contract (VERDICT r2 'missing' #1)."""
    from msgwam_tpu.ops import step_pallas_stream as sps

    cfg, bg, state, statics = _setup(n=1000, pad_to=1024)
    run = mt.RunConfig(dt=120.0, n_steps=2, save_every=2)
    calls = []
    orig = sps.simulate_streaming

    def spy(*args, **kw):
        calls.append(1)
        return orig(*args, **kw)

    sps.simulate_streaming = spy
    try:
        rays, st2 = mt.pad_rays(state.rays, statics, 262144)
        big = mt.State(rays, state.mean)
        out, _, hist = simulate_resident(big, st2, bg, cfg, run)
        assert calls, "expected dispatch to the streaming kernel"
        assert out.rays.dens.shape[0] == 262144
        # small states still use the resident kernel
        calls.clear()
        simulate_resident(state, statics, bg, cfg, run)
        assert not calls
    finally:
        sps.simulate_streaming = orig


def test_simulate_resident_is_differentiable():
    """jax.grad through a whole resident run (VERDICT r2 'missing' #2):
    the custom_vjp backward differentiates the scan path, so gradients
    match the XLA path's."""
    cfg, bg, state, statics = _setup(n=300, pad_to=512)
    run = mt.RunConfig(dt=120.0, n_steps=3, save_every=3)
    xla_cfg = cfg.replace(rhs_backend="xla", window_cells=0)

    def loss_for(sim):
        def loss(scale):
            s = state._replace(
                rays=state.rays._replace(dens=state.rays.dens * scale))
            final, _, _ = sim(s)
            return jnp.sum((final.mean.u - state.mean.u) ** 2)
        return loss

    g_mega = jax.grad(loss_for(
        lambda s: simulate_resident(s, statics, bg, cfg, run)))(1.0)
    g_xla = jax.grad(loss_for(
        lambda s: mt.simulate(s, statics, bg, xla_cfg, run)))(1.0)
    assert np.isfinite(float(g_mega)) and float(g_mega) != 0.0
    np.testing.assert_allclose(float(g_mega), float(g_xla), rtol=5e-4)


def test_streaming_ensemble_matches_per_member_runs():
    """One-launch ensemble (BASELINE config 5 in a single pallas_call):
    each member of the partitioned tile range must evolve exactly as its
    own single-member streaming run — independent winds, shared flux
    accumulator correctly reset at member boundaries.  Members span TWO
    tiles each (n=10000 -> m_pad=16384), so the mid-member accumulation
    path (m_first/m_last on different tiles) is exercised, matching the
    production shape (8 members x 16 tiles)."""
    from msgwam_tpu.ops.step_pallas_stream import (
        simulate_streaming, simulate_streaming_ensemble)
    from msgwam_tpu.parallel import stack_ensemble

    E = 2
    members = []
    for e in range(E):
        cfg, bg, state, statics = _setup(n=10000, pad_to=10240,
                                         amp=0.003 * (1 + 0.2 * e))
        members.append((state, statics))
    bstates, bstatics = stack_ensemble(members)
    run = mt.RunConfig(dt=120.0, n_steps=4, save_every=2)

    fin, _, mh = simulate_streaming_ensemble(bstates, bstatics, bg, cfg, run)
    assert mh.u.shape == (2, E, members[0][0].mean.u.shape[0])
    for e in range(E):
        s1, st1 = members[e]
        f1, _, _ = simulate_streaming(s1, st1, bg, cfg, run)
        assert _rel(f1.rays.dens, fin.rays.dens[e]) < 1e-5
        assert _rel(f1.rays.r, fin.rays.r[e]) < 1e-5
        assert _rel(f1.rays.m, fin.rays.m[e]) < 1e-5
        assert _rel(f1.mean.u, fin.mean.u[e]) < 1e-5


def test_streaming_ensemble_rejects_missing_sources_and_offline():
    from msgwam_tpu.ops.step_pallas_stream import simulate_streaming_ensemble
    from msgwam_tpu.parallel import stack_ensemble

    cfg, bg, state, statics = _setup(n=500, pad_to=512)
    bstates, bstatics = stack_ensemble([(state, statics)] * 2)
    run = mt.RunConfig(dt=120.0, n_steps=2, save_every=2)
    with pytest.raises(ValueError, match="source templates"):
        simulate_streaming_ensemble(
            bstates, bstatics, bg, cfg.replace(cull=True, relaunch=True),
            run)
    with pytest.raises(ValueError, match="online"):
        simulate_streaming_ensemble(
            bstates, bstatics, bg, cfg.replace(saturate_online=False), run)


def test_streaming_ensemble_lifecycle_matches_per_member():
    """In-kernel cull + relaunch inside a one-launch ensemble: the
    lifecycle machinery is per-ray, so partitioning the tile range among
    members must leave every member's cull events and relaunched slots
    identical to its own single-member streaming run."""
    from msgwam_tpu.ops.step_pallas_stream import (
        simulate_streaming, simulate_streaming_ensemble)
    from msgwam_tpu.parallel import stack_ensemble

    E = 2
    members = []
    for e in range(E):
        cfg, bg, state, statics = _setup(n=10000, pad_to=10240,
                                         amp=0.003 * (1 + 0.2 * e))
        members.append((state, statics))
    cfg = cfg.replace(cull=True, relaunch=True, m_max=np.pi / 1500.0)
    bstates, bstatics = stack_ensemble(members)
    bsources = (bstates.rays, bstatics)
    run = mt.RunConfig(dt=120.0, n_steps=6, save_every=3)

    # the configuration must produce real cull events (else the lifecycle
    # branch is dead code in this test): check with a cull-only run
    _, st_cull, _ = simulate_streaming(
        members[0][0], members[0][1], bg,
        cfg.replace(relaunch=False), run)
    assert np.asarray(st_cull.active).sum() < 10000

    fin, stf, mh = simulate_streaming_ensemble(
        bstates, bstatics, bg, cfg, run, sources=bsources)
    for e in range(E):
        s1, st1 = members[e]
        f1, st1f, _ = simulate_streaming(
            s1, st1, bg, cfg, run, source=(s1.rays, st1))
        a1 = np.asarray(st1f.active)
        assert (np.asarray(stf.active)[e] == a1).all()
        assert _rel(f1.rays.dens, fin.rays.dens[e]) < 1e-5
        assert _rel(f1.rays.r, fin.rays.r[e]) < 1e-5
        assert _rel(f1.rays.m, fin.rays.m[e]) < 1e-5
        assert _rel(f1.mean.u, fin.mean.u[e]) < 1e-5


def test_streaming_ensemble_is_differentiable():
    """jax.grad through a one-launch ensemble: the custom_vjp backward
    differentiates the vmapped scan path, so gradients match it."""
    from msgwam_tpu.ops.step_pallas_stream import simulate_streaming_ensemble
    from msgwam_tpu.parallel import stack_ensemble

    cfg, bg, state, statics = _setup(n=300, pad_to=512)
    bstates, bstatics = stack_ensemble([(state, statics)] * 2)
    run = mt.RunConfig(dt=120.0, n_steps=3, save_every=3)
    xla_cfg = cfg.replace(rhs_backend="xla", window_cells=0)

    def loss_for(sim):
        def loss(scale):
            s = bstates._replace(
                rays=bstates.rays._replace(dens=bstates.rays.dens * scale))
            final, _, _ = sim(s)
            return jnp.sum((final.mean.u - bstates.mean.u) ** 2)
        return loss

    g_ens = jax.grad(loss_for(lambda s: simulate_streaming_ensemble(
        s, bstatics, bg, cfg, run)))(1.0)

    def xla_sim(s):
        fin, _ = jax.vmap(lambda ms, mst: mt.simulate(
            ms, mst, bg, xla_cfg, run, validate=False)[:2])(s, bstatics)
        return fin, None, None

    g_xla = jax.grad(loss_for(xla_sim))(1.0)
    assert np.isfinite(float(g_ens)) and float(g_ens) != 0.0
    np.testing.assert_allclose(float(g_ens), float(g_xla), rtol=5e-4)


def test_streaming_ensemble_prescribed_wind_matches_per_member():
    """A member-shared prescribed transient wind (tidal shear) + full
    lifecycle inside a one-launch ensemble: the per-step wind table is
    broadcast to every member's wind block in-kernel, so each member
    must match its own single-member streaming run with the same
    wind_fn."""
    from msgwam_tpu.models.backgrounds import tidal_shear
    from msgwam_tpu.ops.step_pallas_stream import (
        simulate_streaming, simulate_streaming_ensemble)
    from msgwam_tpu.parallel import stack_ensemble

    E = 2
    members = []
    for e in range(E):
        cfg, bg, state, statics = _setup(n=10000, pad_to=10240,
                                         amp=0.003 * (1 + 0.2 * e))
        members.append((state, statics))
    cfg = cfg.replace(cull=True, relaunch=True, m_max=np.pi / 1500.0,
                      prognostic_mean=False)
    gc = mt.GridConfig()
    cj = jnp.asarray(gc.centers(), jnp.float32)
    wf = lambda t: (tidal_shear(cj, t, cfg), jnp.zeros_like(cj))
    bstates, bstatics = stack_ensemble(members)
    bsources = (bstates.rays, bstatics)
    run = mt.RunConfig(dt=120.0, n_steps=6, save_every=3)

    fin, stf, mh = simulate_streaming_ensemble(
        bstates, bstatics, bg, cfg, run, sources=bsources, wind_fn=wf)
    for e in range(E):
        s1, st1 = members[e]
        f1, st1f, _ = simulate_streaming(
            s1, st1, bg, cfg, run, source=(s1.rays, st1), wind_fn=wf)
        assert (np.asarray(stf.active)[e] == np.asarray(st1f.active)).all()
        assert _rel(f1.rays.dens, fin.rays.dens[e]) < 1e-5
        assert _rel(f1.rays.m, fin.rays.m[e]) < 1e-5
        assert _rel(f1.mean.u, fin.mean.u[e]) < 1e-5

def test_streaming_ensemble_one_tile_per_member():
    """Adversarial shape for the batched stage boundaries: each member's
    slab is exactly ONE tile (tpm=1), so the member index changes at
    every tile and the stage's first/last tiles carry ALL members' table
    builds and flux->wind updates.  Every member must still evolve as its
    own single-member streaming run (ops/step_pallas_stream.py's
    member-axis stage tables / accumulator)."""
    from msgwam_tpu.ops.step_pallas_stream import (
        simulate_streaming, simulate_streaming_ensemble)
    from msgwam_tpu.parallel import stack_ensemble

    E = 3
    members = []
    for e in range(E):
        cfg, bg, state, statics = _setup(n=8000, pad_to=8192,
                                         amp=0.003 * (1 + 0.3 * e))
        members.append((state, statics))
    bstates, bstatics = stack_ensemble(members)
    run = mt.RunConfig(dt=120.0, n_steps=4, save_every=4)

    fin, _, mh = simulate_streaming_ensemble(bstates, bstatics, bg, cfg, run)
    assert mh.u.shape == (1, E, members[0][0].mean.u.shape[0])
    for e in range(E):
        s1, st1 = members[e]
        f1, _, _ = simulate_streaming(s1, st1, bg, cfg, run)
        assert _rel(f1.rays.dens, fin.rays.dens[e]) < 1e-5
        assert _rel(f1.rays.r, fin.rays.r[e]) < 1e-5
        assert _rel(f1.rays.m, fin.rays.m[e]) < 1e-5
        assert _rel(f1.mean.u, fin.mean.u[e]) < 1e-5


def _shuffle_rays(state, statics, seed=0):
    """Apply one fixed permutation to every per-ray array so a boundary
    height-sort is a nontrivial permutation (fresh source ICs come out
    height-ordered, which would make the sort a near-identity)."""
    n = state.rays.r.shape[0]
    perm = np.random.default_rng(seed).permutation(n)
    rays = jax.tree.map(lambda x: x[perm], state.rays)
    statics = jax.tree.map(lambda x: x[perm], statics)
    return state._replace(rays=rays), statics, perm


def test_streaming_launch_sort_preserves_slot_identity():
    """The launch-boundary height re-sort (VERDICT r3 #1) is a pure
    scheduling optimization: a multi-launch run with launch_sort=True must
    return the final state AND every history frame in the caller's
    original slot order, matching the unsorted run to f32 flux-reduction
    tolerance (the sort only changes deposit order within a stage)."""
    from msgwam_tpu.ops.step_pallas_stream import simulate_streaming

    cfg, bg, state, statics = _setup(n=24576, pad_to=24576)
    state, statics, _ = _shuffle_rays(state, statics)
    run = mt.RunConfig(dt=120.0, n_steps=4, save_every=2)
    a, _, ha = simulate_streaming(state, statics, bg, cfg, run,
                                  launch_sort=False)
    b, _, hb = simulate_streaming(state, statics, bg, cfg, run,
                                  launch_sort=True)
    assert _rel(a.rays.dens, b.rays.dens) < 1e-5
    assert _rel(a.rays.r, b.rays.r) < 1e-5
    assert _rel(a.rays.m, b.rays.m) < 1e-5
    assert _rel(a.mean.u, b.mean.u) < 1e-5
    # frozen fields pass through bit-identical (never permuted on return)
    np.testing.assert_array_equal(np.asarray(a.rays.k), np.asarray(b.rays.k))
    np.testing.assert_array_equal(np.asarray(state.rays.k),
                                  np.asarray(b.rays.k))
    # every history frame is in original slot order too
    ha_s, _, ha_p = ha
    hb_s, _, hb_p = hb
    for t in range(2):
        assert _rel(ha_s.rays.r[t], hb_s.rays.r[t]) < 1e-5
        assert _rel(ha_s.rays.dens[t], hb_s.rays.dens[t]) < 1e-5
        assert _rel(ha_s.mean.u[t], hb_s.mean.u[t]) < 1e-5
        assert _rel(ha_p[t], hb_p[t]) < 1e-5


def test_streaming_final_perm_and_internal_layout():
    """return_final_perm exposes the sorted kernel's INTERNAL buffer
    layout (VERDICT r4 #5): the perm is a true permutation of the padded
    buffer, applying it via diagnostics.internal_ray_layout reconstructs
    a state whose live rays are ordered by height AT THE LAST BOUNDARY
    SORT, and unpermuting recovers the returned slot order exactly."""
    from msgwam_tpu.diagnostics import internal_ray_layout
    from msgwam_tpu.ops.step_pallas_stream import simulate_streaming

    cfg, bg, state, statics = _setup(n=24576, pad_to=24576)
    state, statics, _ = _shuffle_rays(state, statics)
    # single launch => the only boundary sort happens at step 0, so the
    # internal order must be the sort of the INITIAL heights
    run = mt.RunConfig(dt=120.0, n_steps=4, save_every=4)
    fin, stf, _, perm = simulate_streaming(
        state, statics, bg, cfg, run, launch_sort=True,
        return_final_perm=True)
    perm = np.asarray(perm)
    n_pad = perm.shape[0]
    assert n_pad >= state.rays.r.shape[0]
    np.testing.assert_array_equal(np.sort(perm), np.arange(n_pad))

    ist, istat = internal_ray_layout(fin, stf, jnp.asarray(perm))
    act = np.asarray(istat.active)
    # live rays sit in one front block (inactive/pad keys sort to +inf)
    n_live = int(act.sum())
    assert act[:n_live].all() and not act[n_live:].any()
    # internal order == initial-height order of the live rays
    r0 = np.asarray(state.rays.r)
    r0_internal = r0[perm[:n_live]]
    assert (np.diff(r0_internal) >= 0).all()
    # gather consistency: internal fields are the returned fields permuted
    np.testing.assert_array_equal(
        np.asarray(ist.rays.dens)[:n_live],
        np.asarray(fin.rays.dens)[perm[:n_live]])
    # perm=arange when the sort is off
    _, _, _, perm_off = simulate_streaming(
        state, statics, bg, cfg, run, launch_sort=False,
        return_final_perm=True)
    np.testing.assert_array_equal(np.asarray(perm_off), np.arange(n_pad))


def test_streaming_launch_sort_with_lifecycle():
    """launch_sort composes with the in-kernel lifecycle: the relaunch
    template and activity slabs ride the same multi-operand sort, so cull
    events, relaunched slots, and the returned activity mask must match
    the unsorted run exactly (short horizon: no borderline ULP culls)."""
    from msgwam_tpu.ops.step_pallas_stream import simulate_streaming

    cfg, bg, state, statics = _setup(n=2000, pad_to=2000, amp=0.003)
    # launch low so critical-level culls fire within 6 steps (the proven
    # configuration of tests/test_lifecycle_kernel.py)
    rays, statics = mt.gaussian_spectrum_source(
        cfg, bg, 2000, z_launch=2000.0, dz_launch=500.0,
        amplitude_alpha=0.003, dtype=jnp.float32)
    state = mt.State(rays, state.mean)
    cfg = cfg.replace(cull=True, relaunch=True, m_max=np.pi / 1500.0)
    state, statics, _ = _shuffle_rays(state, statics)
    # the template must stay slot-aligned with the (shuffled) state
    source = (state.rays, statics)
    run = mt.RunConfig(dt=120.0, n_steps=6, save_every=3)
    a, sa, _ = simulate_streaming(state, statics, bg, cfg, run,
                                  launch_sort=False, source=source)
    b, sb, _ = simulate_streaming(state, statics, bg, cfg, run,
                                  launch_sort=True, source=source)
    # lifecycle events actually fired: with relaunch the mask refills, so
    # prove it by height divergence from a no-lifecycle scan run on the
    # same ICs (a relaunch resets a slot to the launch height — an O(km)
    # discrete change, far above the f32 path tolerance; dens is the wrong
    # probe: it only changes when saturation clamps)
    nl, _, _ = mt.simulate(state, statics, bg,
                           cfg.replace(cull=False, relaunch=False), run)
    assert _rel(nl.rays.r, a.rays.r) > 1e-3, \
        "test must exercise real cull/relaunch events"
    assert (np.asarray(sa.active) == np.asarray(sb.active)).all()
    assert _rel(a.rays.dens, b.rays.dens) < 1e-5
    assert _rel(a.rays.r, b.rays.r) < 1e-5
    assert _rel(a.rays.m, b.rays.m) < 1e-5
    assert _rel(a.mean.u, b.mean.u) < 1e-5


def test_megakernel_observe_reduces_history():
    """observe= reduces each history frame on device (the history-memory
    escape hatch): the observation equals the same function of the default
    full-frame history, and include_t0 prepends the initial observation."""
    cfg, bg, state, statics = _setup()
    run = mt.RunConfig(dt=120.0, n_steps=9, save_every=3)
    obs = lambda s, st, aux: s.mean.u

    _, _, h_full = simulate_resident(state, statics, bg, cfg, run)
    _, _, h_obs = simulate_resident(state, statics, bg, cfg, run,
                                    observe=obs)
    np.testing.assert_array_equal(np.asarray(h_obs),
                                  np.asarray(h_full[0].mean.u))

    _, _, h_obs0 = simulate_resident(state, statics, bg, cfg, run,
                                     include_t0=True, observe=obs)
    assert h_obs0.shape[0] == h_obs.shape[0] + 1
    np.testing.assert_array_equal(np.asarray(h_obs0[0]),
                                  np.asarray(state.mean.u))
    np.testing.assert_array_equal(np.asarray(h_obs0[1:]), np.asarray(h_obs))


def test_streaming_observe_reduces_history():
    """The streaming driver's observe= matches the same reduction of its
    default full-frame history, in both launch-sort modes (frames leave
    the kernel in original slot order either way)."""
    from msgwam_tpu.ops.step_pallas_stream import simulate_streaming

    cfg, bg, state, statics = _setup()
    run = mt.RunConfig(dt=120.0, n_steps=4, save_every=2)
    obs = lambda s, st, aux: (s.mean.u,
                              jnp.sum(aux.dens_prop * st.active),
                              jnp.max(s.rays.r * st.active))

    for sort in (False, True):
        _, _, h_full = simulate_streaming(state, statics, bg, cfg, run,
                                          launch_sort=sort)
        _, _, (hu, hp, hr) = simulate_streaming(state, statics, bg, cfg,
                                                run, launch_sort=sort,
                                                observe=obs)
        h_state, h_act, h_prop = h_full
        np.testing.assert_array_equal(np.asarray(hu),
                                      np.asarray(h_state.mean.u))
        for t in range(2):
            np.testing.assert_allclose(
                float(hp[t]),
                float(jnp.sum(h_prop[t] * h_act[t])), rtol=1e-6)
            np.testing.assert_allclose(
                float(hr[t]),
                float(jnp.max(h_state.rays.r[t] * h_act[t])), rtol=1e-6)


def test_streaming_ensemble_per_member_wind():
    """A SEQUENCE of per-member wind_fns (VERDICT r3 #8): each member
    reads its own rows of the stacked (S, 2E, c_pad) wind table in-kernel
    and must match its own single-member streaming run with that
    wind_fn — genuinely stochastic-background ensembles."""
    from msgwam_tpu.models.backgrounds import tidal_shear
    from msgwam_tpu.ops.step_pallas_stream import (
        simulate_streaming, simulate_streaming_ensemble)
    from msgwam_tpu.parallel import stack_ensemble

    E = 2
    members = []
    for e in range(E):
        cfg, bg, state, statics = _setup(n=10000, pad_to=10240,
                                         amp=0.003 * (1 + 0.2 * e))
        members.append((state, statics))
    cfg = cfg.replace(prognostic_mean=False)
    gc = mt.GridConfig()
    cj = jnp.asarray(gc.centers(), jnp.float32)
    # distinct per-member tides: different periods AND amplitudes so a
    # broadcast bug cannot cancel
    wfs = [
        (lambda t, s=1.0 + 0.5 * e: (s * tidal_shear(cj, t, cfg,
                                                     period=43200.0 / s),
                                     jnp.zeros_like(cj)))
        for e in range(E)
    ]
    bstates, bstatics = stack_ensemble(members)
    run = mt.RunConfig(dt=120.0, n_steps=4, save_every=2)

    fin, _, mh = simulate_streaming_ensemble(
        bstates, bstatics, bg, cfg, run, wind_fn=wfs)
    for e in range(E):
        s1, st1 = members[e]
        f1, _, _ = simulate_streaming(s1, st1, bg, cfg, run,
                                      wind_fn=wfs[e])
        assert _rel(f1.rays.dens, fin.rays.dens[e]) < 1e-5
        assert _rel(f1.rays.r, fin.rays.r[e]) < 1e-5
        assert _rel(f1.rays.m, fin.rays.m[e]) < 1e-5
        assert _rel(f1.mean.u, fin.mean.u[e]) < 1e-5

    # the member winds really differ (guard against a broadcast bug
    # making this test vacuous)
    assert _rel(fin.mean.u[0], fin.mean.u[1]) > 1e-3

    # wrong-length sequence is a clear error
    with pytest.raises(ValueError, match="per-member wind_fn"):
        simulate_streaming_ensemble(bstates, bstatics, bg, cfg, run,
                                    wind_fn=wfs + wfs)


def test_streaming_ensemble_per_member_wind_grad():
    """jax.grad through a per-member-wind one-launch ensemble: the
    backward tabulates each member's wind and matches the vmapped scan
    path with the same per-member winds."""
    from msgwam_tpu.models.backgrounds import tidal_shear
    from msgwam_tpu.ops.step_pallas_stream import simulate_streaming_ensemble
    from msgwam_tpu.parallel import stack_ensemble

    cfg, bg, state, statics = _setup(n=300, pad_to=512)
    cfg = cfg.replace(prognostic_mean=False)
    bstates, bstatics = stack_ensemble([(state, statics)] * 2)
    run = mt.RunConfig(dt=120.0, n_steps=3, save_every=3)
    gc = mt.GridConfig()
    cj = jnp.asarray(gc.centers(), jnp.float32)
    wfs = [lambda t: (tidal_shear(cj, t, cfg), jnp.zeros_like(cj)),
           lambda t: (2.0 * tidal_shear(cj, t, cfg), jnp.zeros_like(cj))]
    xla_cfg = cfg.replace(rhs_backend="xla", window_cells=0)

    def loss_for(sim):
        def loss(scale):
            s = bstates._replace(
                rays=bstates.rays._replace(dens=bstates.rays.dens * scale))
            final = sim(s)
            return jnp.sum(final.rays.dens ** 2)
        return loss

    g_ens = jax.grad(loss_for(lambda s: simulate_streaming_ensemble(
        s, bstatics, bg, cfg, run, wind_fn=wfs)[0]))(1.0)

    def xla_sim(s):
        f0, _ = mt.simulate(jax.tree.map(lambda x: x[0], s),
                            jax.tree.map(lambda x: x[0], bstatics),
                            bg, xla_cfg, run, wind_fn=wfs[0],
                            validate=False)[:2], None
        f0 = f0[0]
        f1 = mt.simulate(jax.tree.map(lambda x: x[1], s),
                         jax.tree.map(lambda x: x[1], bstatics),
                         bg, xla_cfg, run, wind_fn=wfs[1],
                         validate=False)[0]
        return jax.tree.map(lambda a, b: jnp.stack([a, b]), f0, f1)

    g_xla = jax.grad(loss_for(xla_sim))(1.0)
    assert np.isfinite(float(g_ens)) and float(g_ens) != 0.0
    np.testing.assert_allclose(float(g_ens), float(g_xla), rtol=5e-4)
