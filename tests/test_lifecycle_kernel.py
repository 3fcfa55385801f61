"""In-kernel lifecycle (cull / relaunch / prescribed wind) in the
HBM-streaming megakernel vs the scan path.

The streaming kernel runs the per-step lifecycle at the stage-3 boundary
of each in-kernel RK3 step (``ops/step_pallas_stream.py::_post_stage``),
matching the scan body's step → cull → relaunch ordering
(``models/integrate.py:378-398``) and the reference driver's per-step
structure (``raytracer.py:157-191``).  These tests drive both paths on
identical inputs and require identical activity masks and f32-round-off
state agreement — with enough steps and an aggressive ``m_max`` that
culls actually fire.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import msgwam_tpu as mt
from msgwam_tpu.models.backgrounds import tidal_shear
from msgwam_tpu.ops.step_pallas import simulate_resident

N_RAY = 2000
N_STEPS = 6


@pytest.fixture(scope="module")
def setup():
    base = mt.REFERENCE_RUN_CONFIG.replace(
        saturate_online=True, dtype="float32",
        projection_backend="mxu", interp_backend="mxu",
        prognostic_mean=False)
    gc = mt.GridConfig()
    centers = gc.centers()
    uu = np.asarray(mt.velocities_sine_homogeneous(
        jnp.asarray(centers, jnp.float32), base)).astype(np.float32)
    vv = np.zeros_like(uu)
    bg = mt.make_background(gc, base, uu, vv, dtype=jnp.float32)

    def mk():
        return mt.gaussian_spectrum_source(
            base, bg, N_RAY, z_launch=2000.0, dz_launch=500.0,
            amplitude_alpha=0.003, dtype=jnp.float32)

    rays, statics = mk()
    state = mt.State(rays, mt.MeanState(jnp.asarray(uu), jnp.asarray(vv)))
    run = mt.RunConfig(dt=120.0, n_steps=N_STEPS, save_every=N_STEPS)
    return base, bg, state, statics, mk, run, centers


def _close(a, b, tol):
    a, b = np.asarray(a), np.asarray(b)
    assert np.abs(a - b).max() <= tol * max(1e-30, np.abs(a).max())


def test_cull_only_matches_scan(setup):
    base, bg, state, statics, mk, run, _ = setup
    # m_max low enough that critical-level culls fire within N_STEPS
    cfg = base.replace(cull=True, relaunch=False, m_max=np.pi / 1500.0)
    fin_s, stat_s, _ = mt.simulate(state, statics, bg, cfg, run)
    fin_k, stat_k, _ = simulate_resident(state, statics, bg, cfg, run)
    a_s, a_k = np.asarray(stat_s.active), np.asarray(stat_k.active)
    assert a_s.sum() < N_RAY, "test must exercise real cull events"
    assert (a_s == a_k).all()
    _close(fin_s.rays.dens, fin_k.rays.dens, 1e-5)
    _close(fin_s.rays.r, fin_k.rays.r, 1e-5)
    _close(fin_s.rays.m, fin_k.rays.m, 1e-5)


def test_relaunch_tidal_matches_scan(setup):
    base, bg, state, statics, mk, run, centers = setup
    cfg = base.replace(cull=True, relaunch=True, m_max=np.pi / 1500.0)
    source = mk()
    cj = jnp.asarray(centers, jnp.float32)
    wf = lambda t: (tidal_shear(cj, t, cfg), jnp.zeros_like(cj))
    fin_s, stat_s, hist_s = mt.simulate(
        state, statics, bg, cfg, run, source=source, wind_fn=wf)
    fin_k, stat_k, hist_k = simulate_resident(
        state, statics, bg, cfg, run, source=source, wind_fn=wf)
    assert (np.asarray(stat_s.active) == np.asarray(stat_k.active)).all()
    _close(fin_s.rays.dens, fin_k.rays.dens, 1e-5)
    _close(fin_s.rays.r, fin_k.rays.r, 1e-5)
    _close(fin_s.rays.m, fin_k.rays.m, 1e-5)
    _close(fin_s.mean.u, fin_k.mean.u, 1e-5)
    # history framing: final frame's activity mask and dens_prop channel
    st_s, act_s, pp_s = hist_s
    st_k, act_k, pp_k = hist_k
    assert (np.asarray(act_s[-1]) == np.asarray(act_k[-1])).all()
    _close(pp_s[-1], pp_k[-1], 1e-5)
    _close(st_s.rays.r[-1], st_k.rays.r[-1], 1e-5)


def test_keyed_source_matches_scan(setup):
    """Keyed (stochastic per-relaunch) sources in the streaming megakernel
    (VERDICT r4 #6): at save_every=1 the per-launch refresh cadence and
    key-split sequence equal the scan path's per-step draws, so both
    engines must produce the same trajectory — including with the
    launch-boundary sort on (template slabs permuted into the internal
    layout).  Different keys must produce different trajectories (the
    stochastic draw is live, not frozen at t=0)."""
    from msgwam_tpu.ops.step_pallas_stream import simulate_streaming

    base, bg, state, statics, mk, run, _ = setup
    cfg = base.replace(cull=True, relaunch=True, m_max=np.pi / 1500.0)
    rays0, statics0 = mk()

    def src_fn(key):
        # stochastic launch amplitude: varies dens only (frozen per-ray
        # fields must match the running state — guarded)
        f = jax.random.uniform(key, (), jnp.float32, 0.5, 1.5)
        return rays0._replace(dens=rays0.dens * f), statics0

    key = jax.random.PRNGKey(7)
    run1 = mt.RunConfig(dt=120.0, n_steps=N_STEPS, save_every=1)
    fin_s, stat_s, _ = mt.simulate(state, statics, bg, cfg, run1,
                                   source=src_fn, source_key=key)
    fin_k, stat_k, _ = simulate_streaming(state, statics, bg, cfg, run1,
                                          source=src_fn, source_key=key)
    a_s = np.asarray(stat_s.active)
    assert a_s.sum() == N_RAY, "relaunch must refill culled slots"
    assert (a_s == np.asarray(stat_k.active)).all()
    _close(fin_s.rays.dens, fin_k.rays.dens, 1e-5)
    _close(fin_s.rays.r, fin_k.rays.r, 1e-5)
    _close(fin_s.rays.m, fin_k.rays.m, 1e-5)
    _close(fin_s.mean.u, fin_k.mean.u, 1e-5)
    # launch-sorted kernel: same trajectory (slabs ride the sort)
    fin_o, stat_o, _ = simulate_streaming(state, statics, bg, cfg, run1,
                                          source=src_fn, source_key=key,
                                          launch_sort=True)
    assert (a_s == np.asarray(stat_o.active)).all()
    _close(fin_k.rays.dens, fin_o.rays.dens, 1e-5)
    _close(fin_k.rays.r, fin_o.rays.r, 1e-5)
    # a different key gives a different trajectory: successive relaunch
    # waves carry live stochastic draws
    fin_b, _, _ = simulate_streaming(state, statics, bg, cfg, run1,
                                     source=src_fn,
                                     source_key=jax.random.PRNGKey(8))
    d = np.abs(np.asarray(fin_b.rays.dens) - np.asarray(fin_k.rays.dens))
    assert d.max() > 1e-3 * np.abs(np.asarray(fin_k.rays.dens)).max()


def test_template_frozen_field_mismatch_raises(setup):
    base, bg, state, statics, mk, run, _ = setup
    cfg = base.replace(cull=True, relaunch=True)
    src_rays, src_statics = mk()
    bad = (src_rays._replace(k=src_rays.k * 1.5), src_statics)
    with pytest.raises(ValueError, match="frozen"):
        simulate_resident(state, statics, bg, cfg, run, source=bad)


def test_lifecycle_requires_online_saturation(setup):
    base, bg, state, statics, mk, run, _ = setup
    cfg = base.replace(cull=True, relaunch=True, saturate_online=False)
    with pytest.raises(ValueError, match="online"):
        simulate_resident(state, statics, bg, cfg, run, source=mk())


def test_prescribed_wind_with_prognostic_mean_matches_scan(setup):
    """Imposed wind + prognostic mean compose: both paths overwrite the
    mean from wind_fn(t) at each step top (models/integrate.py:370-377 /
    the kernel's st==0 overwrite) and then let the RK3 stages evolve it
    prognostically within the step."""
    base, bg, state, statics, mk, run, centers = setup
    cfg = base.replace(cull=True, relaunch=False, m_max=np.pi / 1500.0,
                       prognostic_mean=True)
    cj = jnp.asarray(centers, jnp.float32)
    wf = lambda t: (tidal_shear(cj, t, cfg), jnp.zeros_like(cj))
    fin_s, stat_s, _ = mt.simulate(state, statics, bg, cfg, run, wind_fn=wf)
    fin_k, stat_k, _ = simulate_resident(state, statics, bg, cfg, run,
                                         wind_fn=wf)
    assert (np.asarray(stat_s.active) == np.asarray(stat_k.active)).all()
    _close(fin_s.rays.dens, fin_k.rays.dens, 1e-5)
    _close(fin_s.rays.r, fin_k.rays.r, 1e-5)
    _close(fin_s.rays.m, fin_k.rays.m, 1e-5)
    _close(fin_s.mean.u, fin_k.mean.u, 1e-5)


@pytest.mark.slow
def test_lifecycle_long_horizon_matches_scan():
    """100-step trajectory consistency with the full lifecycle on
    (cull + relaunch + transient tidal wind) — the long-horizon analogue
    of test_megakernel.py's calibrated-bound check.  Discrete lifecycle
    events make fixed tight tolerances meaningless (a ULP flip on a
    borderline cull relaunches a whole ray), so the scan path's own
    sensitivity to a 1e-7 density perturbation calibrates the bound for
    both the fields and the activity-mask disagreement count."""
    base = mt.REFERENCE_RUN_CONFIG.replace(
        saturate_online=True, dtype="float32",
        projection_backend="mxu", interp_backend="mxu",
        prognostic_mean=False, cull=True, relaunch=True,
        m_max=np.pi / 1500.0)
    gc = mt.GridConfig()
    centers = gc.centers()
    uu = np.asarray(mt.velocities_sine_homogeneous(
        jnp.asarray(centers, jnp.float32), base)).astype(np.float32)
    vv = np.zeros_like(uu)
    bg = mt.make_background(gc, base, uu, vv, dtype=jnp.float32)
    rays, statics = mt.gaussian_spectrum_source(
        base, bg, N_RAY, z_launch=2000.0, dz_launch=500.0,
        amplitude_alpha=0.003, dtype=jnp.float32)
    state = mt.State(rays, mt.MeanState(jnp.asarray(uu), jnp.asarray(vv)))
    run = mt.RunConfig(dt=120.0, n_steps=100, save_every=100)
    source = (rays, statics)
    cj = jnp.asarray(centers, jnp.float32)
    wf = lambda t: (tidal_shear(cj, t, base), jnp.zeros_like(cj))

    a, act_a, _ = mt.simulate(state, statics, bg, base, run,
                              source=source, wind_fn=wf)
    b, act_b, _ = simulate_resident(state, statics, bg, base, run,
                                    source=source, wind_fn=wf)
    sp = state._replace(
        rays=state.rays._replace(dens=state.rays.dens * (1.0 + 1e-7)))
    c, act_c, _ = mt.simulate(sp, statics, bg, base, run,
                              source=source, wind_fn=wf)

    def rel(x, y):
        x, y = np.asarray(x), np.asarray(y)
        return np.abs(x - y).max() / max(np.abs(x).max(), 1e-30)

    mask_ab = (np.asarray(act_a.active) != np.asarray(act_b.active)).sum()
    mask_ac = (np.asarray(act_a.active) != np.asarray(act_c.active)).sum()
    assert mask_ab <= 3 * max(mask_ac, 2), (mask_ab, mask_ac)
    # compare only slots both paths agree are active (disagreeing slots
    # hold a relaunched vs evolved ray — a discrete, calibrated event)
    both = np.asarray(act_a.active) & np.asarray(act_b.active)
    for field in ("dens", "r", "m"):
        xa = np.where(both, np.asarray(getattr(a.rays, field)), 0.0)
        xb = np.where(both, np.asarray(getattr(b.rays, field)), 0.0)
        diff = rel(xa, xb)
        spread = rel(getattr(a.rays, field), getattr(c.rays, field))
        assert diff < 3.0 * max(spread, 1e-6), (field, diff, spread)
    diff = rel(a.mean.u, b.mean.u)
    spread = rel(a.mean.u, c.mean.u)
    assert diff < 3.0 * max(spread, 1e-6), ("u", diff, spread)

def test_scalar_wind_fn_matches_scan(setup):
    """The scan body broadcasts scalar wind_fn returns to the full mean
    column (models/integrate.py:374-375); the streaming kernel's
    host-built wind table must accept the same contract (a scalar return
    used to crash table construction with IndexError)."""
    base, bg, state, statics, mk, run, centers = setup
    cfg = base.replace(prognostic_mean=False)
    wf_scalar = lambda t: (0.5 + 0.0 * t, jnp.float32(0.0))
    wf_full = lambda t: (jnp.full(centers.shape[0], 0.5, jnp.float32)
                         + 0.0 * t,
                         jnp.zeros(centers.shape[0], jnp.float32))
    from msgwam_tpu.ops.step_pallas_stream import simulate_streaming

    f_sc, _, _ = simulate_streaming(state, statics, bg, cfg, run,
                                    wind_fn=wf_scalar)
    f_fu, _, _ = simulate_streaming(state, statics, bg, cfg, run,
                                    wind_fn=wf_full)
    fin_scan, _ = mt.simulate(state, statics, bg, cfg, run,
                              wind_fn=wf_scalar)[:2]
    _close(f_sc.rays.dens, f_fu.rays.dens, 0.0)     # identical tables
    _close(f_sc.rays.m, fin_scan.rays.m, 2e-5)
    _close(f_sc.mean.u, fin_scan.mean.u, 2e-5)
