"""The libprop-mirror shim: reference experiment scripts run unchanged
against msgwam_tpu.api and produce the reference's numbers."""

import numpy as np
import pytest

import msgwam_tpu.api as shim


@pytest.fixture(autouse=True)
def fresh_shim_state():
    """Reset the shim's mutable module state around each test."""
    saved = (dict(shim.model_config), dict(shim.statics), shim.HPROP_GLOBAL,
             shim.grid, shim.grids, shim.rhobar, shim.pressure_gradient)
    yield
    (mc, st, shim.HPROP_GLOBAL, shim.grid, shim.grids, shim.rhobar,
     shim.pressure_gradient) = saved
    shim.model_config.clear(); shim.model_config.update(mc)
    shim.statics.clear(); shim.statics.update(st)


def _driver_setup(lprop, nray=60):
    """Run the reference driver's setup block against a libprop-like module."""
    NN, phi0 = 0.01, 0.0
    lprop.HPROP_GLOBAL = False
    lprop.set_model_setup(
        bvf=NN, rhs=lprop.rhs_default, boussinesq=False, sig_rr=10000,
        u0=4, rr0=40000, rr1=40000, phi0=phi0, kappa=1.0,
        saturate_online=False,
    )
    grid = np.linspace(0, 100e3, 101)
    grids = 0.5 * (grid[:-1] + grid[1:])
    lprop.grid, lprop.grids = grid, grids
    k_abs = 2 * np.pi / 50e3
    kk = np.ones(nray) * k_abs
    ll = np.zeros(nray)
    mm = np.ones(nray) * -2 * np.pi / 5e3
    edges = np.linspace(0, 15000, nray + 1)
    rr = 0.5 * (edges[:-1] + edges[1:])
    drr = np.full(nray, edges[1] - edges[0])
    area = 5e-5 * drr
    dmm = area / drr
    uu = lprop.velocities_sine_homogeneous(grids)
    vv = np.zeros_like(uu)
    lprop.set_hydrostatics()
    lprop.set_pressure_gradient(uu, vv)
    dkk = np.ones(nray) * 1e-4
    dll = np.ones(nray) * 1e-4
    lprop.set_statics(dll=dll, dkk=dkk, rr_mm_area=area)
    rhobar_ray = np.interp(rr, grids, lprop.rhobar)
    omh = lprop.omega(kk, ll, mm, phi0)
    dens = (
        0.01**2 * rhobar_ray / 2 * omh / mm**2 / omh**2 * NN**2
        * np.exp(-((rr - rr.mean()) ** 2) / 2 / 2000**2)
    ) / 1e-4 / 1e-4 / dmm
    state = np.array([dens, np.zeros(nray), np.full(nray, phi0), rr, drr,
                      kk, ll, mm, dmm, uu, vv], dtype=object)
    return state, grid, grids


def test_shim_defaults_match_reference_defaults():
    """Import-time defaults per lib/libprop.py:703-726 (checked against the
    documented values, not the live module, which other tests mutate)."""
    expect = dict(u0=80, phi0=np.deg2rad(-60), sig_phi=np.deg2rad(3),
                  rr0=30000, rr1=40000, sig_rr=10000, drr=1, bvf=0.01,
                  geostrophy=True, boussinesq=False, hh=8500, rhobar0=1.2,
                  kappa=0.95, saturate_online=True)
    for key, val in expect.items():
        assert shim.model_config[key] == val, key
    assert shim.statics == {"int_dll": 1, "int_dkk": 1, "rr_mm_area": 0}


def test_rk3_through_shim_matches_reference(reference_libprop):
    state_s, grid, grids = _driver_setup(shim)
    state_r, _, _ = _driver_setup(reference_libprop)
    out_s = state_s
    out_r = state_r
    for _ in range(5):
        out_s = shim.RK3(120.0, out_s)
        out_r = reference_libprop.RK3(120.0, out_r)
    for i in range(11):
        np.testing.assert_allclose(
            np.asarray(out_s[i], dtype=float), np.asarray(out_r[i], dtype=float),
            rtol=1e-10, atol=1e-14, err_msg=f"state field {i}",
        )


def test_saturation_through_shim(reference_libprop):
    state_s, grid, grids = _driver_setup(shim)
    _driver_setup(reference_libprop)
    out_s = shim.RK3(120.0, state_s)
    rr_prev, drr_prev, mm_prev = state_s[3], state_s[4], state_s[7]
    args = (120.0, out_s[0], rr_prev, (out_s[3] - rr_prev) / 1,
            drr_prev, (out_s[4] - drr_prev) / 120.0,
            out_s[5], out_s[6], mm_prev, (out_s[7] - mm_prev) / 120.0)
    np.testing.assert_allclose(
        shim.saturation(*args, direct=True),
        reference_libprop.saturation(*args, direct=True),
        rtol=1e-11,
    )


def test_custom_rhs_extension_point():
    """model_config['rhs'] dependency injection (lib/libprop.py:691) keeps
    working with a user-supplied RHS: RK3 falls back to generic object-array
    stage arithmetic."""
    calls = []

    def my_rhs(dt, var):
        calls.append(dt)
        return np.array([np.zeros_like(np.asarray(v, dtype=float)) for v in var],
                        dtype=object)

    shim.set_model_setup(rhs=my_rhs)
    var = np.array([np.ones(4), np.zeros(4)], dtype=object)
    out = shim.RK3(60.0, var)
    assert len(calls) == 3
    np.testing.assert_array_equal(np.asarray(out[0], dtype=float), np.ones(4))


def test_wave_projection_and_physics_functions(reference_libprop):
    _driver_setup(shim)
    _driver_setup(reference_libprop)
    rng = np.random.default_rng(7)
    n = 40
    kk = rng.uniform(1e-5, 1e-3, n)
    ll = rng.uniform(-1e-3, 1e-3, n)
    mm = rng.uniform(-1e-2, -1e-4, n)
    phi = np.full(n, 0.2)
    rr = rng.uniform(0, 100e3, n)
    lam = np.zeros(n)
    uu = reference_libprop.velocities_sine_homogeneous(shim.grids)
    vv = np.zeros_like(uu)

    np.testing.assert_allclose(
        shim.omega(kk, ll, mm, phi), reference_libprop.omega(kk, ll, mm, phi),
        rtol=1e-13)
    np.testing.assert_allclose(
        shim.cg_rr(kk, ll, mm, lam, phi, rr),
        reference_libprop.cg_rr(kk, ll, mm, lam, phi, rr), rtol=1e-13)
    np.testing.assert_allclose(
        shim.dm_dt(kk, ll, mm, lam, phi, rr, uu, vv),
        reference_libprop.dm_dt(kk, ll, mm, lam, phi, rr, uu, vv),
        rtol=1e-12, atol=1e-22)
    np.testing.assert_allclose(
        shim.gradients(lam, phi, rr, uu, vv),
        reference_libprop.gradients(lam, phi, rr, uu, vv), rtol=1e-12,
        atol=1e-18)

    # hprop on: all horizontal terms active
    shim.HPROP_GLOBAL = True
    reference_libprop.HPROP_GLOBAL = True
    for fn in ("cg_lambda", "cg_phi"):
        np.testing.assert_allclose(
            getattr(shim, fn)(kk, ll, mm, lam, phi, rr, uu, vv),
            getattr(reference_libprop, fn)(kk, ll, mm, lam, phi, rr, uu, vv),
            rtol=1e-12, err_msg=fn)
    for fn in ("dk_dt", "dl_dt"):
        np.testing.assert_allclose(
            getattr(shim, fn)(kk, ll, mm, lam, phi, rr, uu, vv),
            getattr(reference_libprop, fn)(kk, ll, mm, lam, phi, rr, uu, vv),
            rtol=1e-11, atol=1e-24, err_msg=fn)
    reference_libprop.HPROP_GLOBAL = False

    dens = np.abs(rng.normal(size=n)) * 1e9
    dr = rng.uniform(100, 2000, n)
    dmm = np.abs(rng.normal(size=n)) * 1e-4
    for var in range(5):
        np.testing.assert_allclose(
            shim.wave_projection(dens, lam, phi, rr - dr / 2, rr + dr / 2,
                                 kk, ll, mm - dmm / 2, mm + dmm / 2,
                                 np.full(n, 1e-4), np.full(n, 1e-4), dmm,
                                 shim.grids, var=var),
            reference_libprop.wave_projection(
                dens, lam, phi, rr - dr / 2, rr + dr / 2,
                kk, ll, mm - dmm / 2, mm + dmm / 2,
                np.full(n, 1e-4), np.full(n, 1e-4), dmm,
                shim.grids, var=var),
            rtol=1e-11, atol=1e-20, err_msg=f"var={var}")


def test_rhs_default_fuzz_hprop_on(reference_libprop):
    """Full rhs_default assembly vs the reference on random states with
    horizontal propagation ON (spherical metric terms, df2/dphi, cg_lambda/
    cg_phi advection — the paths the default driver never runs)."""
    _driver_setup(shim)
    _driver_setup(reference_libprop)
    shim.HPROP_GLOBAL = True
    reference_libprop.HPROP_GLOBAL = True
    shim.set_model_setup(saturate_online=False)
    reference_libprop.set_model_setup(saturate_online=False)
    rng = np.random.default_rng(11)
    n = 60  # matches the per-ray statics arrays from _driver_setup
    for trial in range(3):
        var = np.array([
            np.abs(rng.normal(size=n)) * 1e9,          # dens
            rng.uniform(-0.1, 0.1, n),                  # lam
            rng.uniform(-1.2, 1.2, n),                  # phi
            rng.uniform(1e3, 99e3, n),                  # rr
            rng.uniform(100, 1500, n),                  # drr
            rng.uniform(1e-5, 1e-3, n),                 # kk
            rng.uniform(-1e-3, 1e-3, n),                # ll
            rng.uniform(-1e-2, -1e-4, n),               # mm
            np.abs(rng.normal(size=n)) * 1e-4,          # dmm
            rng.normal(size=100) * 10,                  # uu
            rng.normal(size=100) * 5,                   # vv
        ], dtype=object)
        ours = shim.rhs_default(120.0, var)
        ref = reference_libprop.rhs_default(120.0, var)
        for i in range(11):
            np.testing.assert_allclose(
                np.asarray(ours[i], dtype=float), np.asarray(ref[i], dtype=float),
                rtol=1e-10, atol=1e-25, err_msg=f"trial {trial} field {i}",
            )
    reference_libprop.HPROP_GLOBAL = False


def test_rk3_trajectory_hprop_on(reference_libprop):
    """Multi-step RK3 parity with horizontal propagation on at mid-latitude
    (all four position/wavenumber tendencies active)."""
    state_s, grid, grids = _driver_setup(shim)
    state_r, _, _ = _driver_setup(reference_libprop)
    for mod in (shim, reference_libprop):
        mod.HPROP_GLOBAL = True
        mod.set_model_setup(phi0=np.deg2rad(-45))
        mod.set_hydrostatics()
    # non-equatorial latitude so Coriolis terms are active
    state_s[2] = state_s[2] + np.deg2rad(-45)
    state_r[2] = state_r[2] + np.deg2rad(-45)
    out_s, out_r = state_s, state_r
    for _ in range(5):
        out_s = shim.RK3(120.0, out_s)
        out_r = reference_libprop.RK3(120.0, out_r)
    for i in range(11):
        np.testing.assert_allclose(
            np.asarray(out_s[i], dtype=float), np.asarray(out_r[i], dtype=float),
            rtol=1e-9, atol=1e-20, err_msg=f"state field {i}",
        )
    reference_libprop.HPROP_GLOBAL = False


def test_rhs_default_returns_full_shapes(reference_libprop):
    """Every field of the shim's rhs_default is a full-length array even
    when structurally zero (reference API contract)."""
    state_s, grid, grids = _driver_setup(shim)
    out = shim.rhs_default(120.0, state_s)
    for i in range(9):
        assert np.shape(out[i]) == (60,), i
    assert np.shape(out[9]) == (100,) and np.shape(out[10]) == (100,)


def test_velocities_tanh_3d_matches_reference(reference_libprop):
    """The 3-D tanh jet incl. its (4,3)+shape broadcast quirk
    (lib/libprop.py:224-250)."""
    _driver_setup(shim)
    _driver_setup(reference_libprop)
    for mod in (shim, reference_libprop):
        mod.set_model_setup(u0=50.0, phi0=np.deg2rad(-60),
                            sig_phi=np.deg2rad(3), rr0=30000, sig_rr=10000)
    rng = np.random.default_rng(5)
    lam = rng.uniform(-1, 1, 25)
    phi = rng.uniform(-1.2, -0.9, 25)
    rr = rng.uniform(0, 80e3, 25)
    ours = shim.velocities_tanh(lam, phi, rr)
    ref = reference_libprop.velocities_tanh(lam, phi, rr)
    assert ours.shape == ref.shape == (4, 3, 25)
    np.testing.assert_allclose(ours, ref, rtol=1e-12, atol=1e-15)
