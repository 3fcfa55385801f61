"""End-to-end parity fuzz over the physics CONFIG space.

The function-level fuzz (test_api.py) checks individual ops on random
*states*; this file checks the full jitted driver (`mt.simulate`) against
the actual NumPy reference driver loop (raytracer.py:157-191) at random
*configurations* — latitude, stratification, saturation constant and mode,
horizontal propagation, wind profile, grid geometry, and time step — the
axes the default experiment never moves.  Fixed seeds/parameters keep it
deterministic.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import msgwam_tpu as mt

# Each case moves several config axes at once; together they cover both
# saturation modes, hprop on/off, all three homogeneous wind profiles,
# boussinesq on/off, and a spread of (phi0, bvf, kappa, dt, grid).
CASES = [
    # alpha > 1 launches the packet ABOVE the static-instability threshold
    # so the saturation clamp binds from step one (at alpha=0.01 a 25-step
    # run never saturates and kappa would be untested).  Verified teeth:
    # a 1% kappa perturbation moves case-0 dens by ~1e-3 rel.  In the
    # offline case the clamp also binds (1/3 of rays) but the reference's
    # quirk-2 offline rate (height rate divided by 1, not dt) extrapolates
    # clamped rays ~a scale height up, crashing their dens to ~1e-13 of
    # max — matching THAT discontinuous behavior at 1e-7 is the parity
    # statement there, not kappa sensitivity.
    dict(id="gauss-online-equator-ish", profile="gauss", online=True,
         hprop=False, boussinesq=False, phi0=-0.2, bvf=0.012, kappa=1.2,
         dt=90.0, n_ray=48, n_grid=81, z_max=80e3, u0=10.0, rr0=30e3,
         sig_rr=8e3, alpha=1.5, n_steps=25),
    dict(id="tanh-offline-midlat-hprop", profile="tanh", online=False,
         hprop=True, boussinesq=False, phi0=np.deg2rad(-45), bvf=0.015,
         kappa=0.8, dt=60.0, n_ray=72, n_grid=121, z_max=120e3, u0=30.0,
         rr0=40e3, sig_rr=12e3, alpha=1.2, n_steps=25),
    dict(id="sine-online-north-hprop", profile="sine", online=True,
         hprop=True, boussinesq=False, phi0=np.deg2rad(30), bvf=0.009,
         kappa=1.0, dt=150.0, n_ray=60, n_grid=101, z_max=100e3, u0=6.0,
         rr0=40e3, sig_rr=10e3, alpha=0.01, n_steps=25),
    dict(id="gauss-offline-boussinesq", profile="gauss", online=False,
         hprop=False, boussinesq=True, phi0=0.0, bvf=0.02, kappa=1.4,
         dt=240.0, n_ray=40, n_grid=101, z_max=100e3, u0=4.0, rr0=50e3,
         sig_rr=15e3, alpha=0.01, n_steps=20),
]

PROFILE_REF = {"gauss": "velocities_gauss_homogeneous",
               "tanh": "velocities_tanh_homogeneous",
               "sine": "velocities_sine_homogeneous"}
PROFILE_ENG = {"gauss": mt.velocities_gauss_homogeneous,
               "tanh": mt.velocities_tanh_homogeneous,
               "sine": mt.velocities_sine_homogeneous}


def _reference_drive(lprop, c):
    """The reference driver (raytracer.py:32-191) at configuration ``c``.

    Restores ``HPROP_GLOBAL`` even when the drive raises, so one failing
    case cannot leak horizontal propagation into every later test that
    shares the session-scoped ``reference_libprop`` fixture (the other
    globals — grid, model_config, statics — are re-set by every consumer).
    """
    try:
        return _reference_drive_inner(lprop, c)
    finally:
        lprop.HPROP_GLOBAL = False


def _reference_drive_inner(lprop, c):
    lprop.HPROP_GLOBAL = bool(c["hprop"])
    lprop.set_model_setup(
        bvf=c["bvf"], rhs=lprop.rhs_default, boussinesq=c["boussinesq"],
        sig_rr=c["sig_rr"], u0=c["u0"], rr0=c["rr0"], rr1=40000,
        phi0=c["phi0"], kappa=c["kappa"], saturate_online=c["online"],
    )
    grid = np.linspace(0.0, c["z_max"], c["n_grid"])
    grids = 0.5 * (grid[:-1] + grid[1:])
    lprop.grid, lprop.grids = grid, grids
    uu = getattr(lprop, PROFILE_REF[c["profile"]])(grids)
    vv = np.zeros_like(uu)
    lprop.set_hydrostatics()
    lprop.set_pressure_gradient(uu, vv)

    n = c["n_ray"]
    dkk = np.ones(n) * 1e-4
    dll = np.ones(n) * 1e-4
    edges = np.linspace(0.0, 15000.0, n + 1)
    rr = 0.5 * (edges[:-1] + edges[1:])
    drr = np.full(n, edges[1] - edges[0])
    area = 5e-5 * drr
    dmm = area / drr
    lprop.set_statics(dll=dll, dkk=dkk, rr_mm_area=area)

    kk = np.ones(n) * 2 * np.pi / 50e3
    ll = np.zeros(n)
    mm = np.ones(n) * -2 * np.pi / 5e3
    f0 = 2 * lprop.ROT_EARTH * np.sin(c["phi0"])
    rhobar_ray = np.interp(rr, grids, lprop.rhobar)
    omh = lprop.omega(kk, ll, mm, c["phi0"])
    amplitude = (c["alpha"]**2 * rhobar_ray / 2 * omh / mm**2
                 / (omh**2 - f0**2) * c["bvf"]**2)
    dens = (amplitude * np.exp(-((rr - rr.mean()) ** 2) / 2 / 2000**2)
            / 1e-4 / 1e-4 / dmm)

    cur = [dens, np.zeros(n), np.full(n, c["phi0"]), rr, drr,
           kk, ll, mm, dmm, uu.copy(), vv.copy()]
    for _ in range(c["n_steps"]):
        out = lprop.RK3(c["dt"], np.array(cur, dtype=object))
        new = list(out)
        if not c["online"]:
            new[0] = lprop.saturation(
                c["dt"], out[0], cur[3], (out[3] - cur[3]) / 1,
                cur[4], (out[4] - cur[4]) / c["dt"],
                out[5], out[6], cur[7], (out[7] - cur[7]) / c["dt"],
                direct=True,
            )
        cur = new
    return cur, grids, uu, vv


def _engine_drive(c):
    cfg = mt.REFERENCE_RUN_CONFIG.replace(
        bvf=c["bvf"], phi0=float(c["phi0"]), kappa=c["kappa"],
        boussinesq=c["boussinesq"], saturate_online=c["online"],
        hprop=c["hprop"], u0=c["u0"], rr0=c["rr0"], sig_rr=c["sig_rr"],
    )
    gc = mt.GridConfig(n_face=c["n_grid"], z_max=c["z_max"])
    centers = gc.centers()
    uu = np.asarray(PROFILE_ENG[c["profile"]](jnp.asarray(centers), cfg))
    vv = np.zeros_like(uu)
    bg = mt.make_background(gc, cfg, uu, vv)
    rays, statics = mt.wave_packet_ic(gc, cfg, bg, n_ray=c["n_ray"],
                                      alpha=c["alpha"])
    state = mt.State(rays, mt.MeanState(jnp.asarray(uu), jnp.asarray(vv)))
    run = mt.RunConfig(dt=c["dt"], n_steps=c["n_steps"],
                       save_every=c["n_steps"])
    sf, stf, _ = jax.jit(
        lambda s, st: mt.simulate(s, st, bg, cfg, run))(state, statics)
    return sf


@pytest.mark.parametrize("c", CASES, ids=[c["id"] for c in CASES])
def test_config_space_parity(reference_libprop, c):
    ref, grids, uu, vv = _reference_drive(reference_libprop, c)
    sf = _engine_drive(c)
    scale = {i: np.max(np.abs(np.asarray(ref[i], float))) + 1e-300
             for i in (0, 3, 7, 9, 10)}
    for i, field in ((0, sf.rays.dens), (3, sf.rays.r), (7, sf.rays.m),
                     (9, sf.mean.u), (10, sf.mean.v)):
        err = np.max(np.abs(np.asarray(field) - np.asarray(ref[i], float)))
        rel = err / scale[i]
        # v can be roundoff-scale; compare it absolutely against u's scale
        if i == 10 and scale[10] < 1e-10 * scale[9]:
            assert err < 1e-10 * scale[9], (c["id"], i, err)
        else:
            assert rel < 1e-7, (c["id"], i, rel, err)
