"""Saturation vs the reference and the corrected-units mode
(``lib/libprop.py:561-615``)."""

import numpy as np
import pytest

from msgwam_tpu.ops.saturation import (
    saturate_direct,
    saturation_cap,
    saturation_tendency,
)

BVF, KAPPA, PHI0, DT = 0.01, 1.0, 0.3, 120.0


def _setup(rng, n=200):
    centers = 500.0 + 1000.0 * np.arange(100)
    rhobar = 1.2 * np.exp(-centers / 8500.0)
    dens = np.abs(rng.normal(size=n)) * 1e10
    r = rng.uniform(0, 100e3, n)
    r_rate = rng.normal(size=n) * 0.5
    dr = rng.uniform(100, 1000, n)
    dr_rate = rng.normal(size=n) * 1e-3
    k = rng.uniform(1e-5, 1e-3, n)
    l = rng.uniform(-1e-3, 1e-3, n)
    m = rng.uniform(-1e-2, -1e-4, n)
    m_rate = rng.normal(size=n) * 1e-8
    dkk = np.full(n, 1e-4)
    dll = np.full(n, 1e-4)
    area = np.abs(rng.normal(size=n)) * 1e-2
    return (dens, r, r_rate, dr, dr_rate, k, l, m, m_rate,
            dkk, dll, area, centers, rhobar)


def test_direct_matches_reference(rng, reference_libprop):
    lprop = reference_libprop
    (dens, r, r_rate, dr, dr_rate, k, l, m, m_rate,
     dkk, dll, area, centers, rhobar) = _setup(rng)
    lprop.set_model_setup(bvf=BVF, kappa=KAPPA, phi0=PHI0)
    lprop.set_statics(dkk=dkk, dll=dll, rr_mm_area=area)
    lprop.grids = centers
    lprop.rhobar = rhobar
    expect = lprop.saturation(DT, dens, r, r_rate, dr, dr_rate, k, l, m, m_rate,
                              direct=True)
    got = saturate_direct(DT, dens, r, r_rate, dr, dr_rate, k, l, m, m_rate,
                          dkk, dll, area, centers, rhobar, BVF, KAPPA, PHI0)
    np.testing.assert_allclose(np.asarray(got), expect, rtol=1e-12)


def test_tendency_matches_reference(rng, reference_libprop):
    lprop = reference_libprop
    (dens, r, r_rate, dr, dr_rate, k, l, m, m_rate,
     dkk, dll, area, centers, rhobar) = _setup(rng)
    lprop.set_model_setup(bvf=BVF, kappa=KAPPA, phi0=PHI0)
    lprop.set_statics(dkk=dkk, dll=dll, rr_mm_area=area)
    lprop.grids = centers
    lprop.rhobar = rhobar
    expect = lprop.saturation(DT, dens, r, r_rate, dr, dr_rate, k, l, m, m_rate,
                              direct=False)
    got = saturation_tendency(DT, dens, r, r_rate, dr, dr_rate, k, l, m, m_rate,
                              dkk, dll, area, centers, rhobar, BVF, KAPPA, PHI0)
    np.testing.assert_allclose(np.asarray(got), expect, rtol=1e-12)


def test_corrected_mode_respects_cap(rng):
    """With faithful=False the clamped *integrated* action never exceeds the
    threshold (the reference's faithful mode violates this by the
    phase-volume factor — SURVEY.md quirk 1)."""
    (dens, r, r_rate, dr, dr_rate, k, l, m, m_rate,
     dkk, dll, area, centers, rhobar) = _setup(rng)
    cap, pv = saturation_cap(DT, r, r_rate, dr, dr_rate, k, l, m, m_rate,
                             dkk, dll, area, centers, rhobar, BVF, KAPPA, PHI0)
    got = np.asarray(saturate_direct(
        DT, dens, r, r_rate, dr, dr_rate, k, l, m, m_rate,
        dkk, dll, area, centers, rhobar, BVF, KAPPA, PHI0, faithful=False,
    ))
    assert np.all(got * np.asarray(pv) <= np.asarray(cap) * (1 + 1e-12))


def test_inactive_rays_untouched(rng):
    (dens, r, r_rate, dr, dr_rate, k, l, m, m_rate,
     dkk, dll, area, centers, rhobar) = _setup(rng)
    active = rng.random(len(dens)) > 0.5
    got = np.asarray(saturate_direct(
        DT, dens, r, r_rate, dr, dr_rate, k, l, m, m_rate,
        dkk, dll, area, centers, rhobar, BVF, KAPPA, PHI0, active=active,
    ))
    np.testing.assert_array_equal(got[~active], dens[~active])
    tend = np.asarray(saturation_tendency(
        DT, dens, r, r_rate, dr, dr_rate, k, l, m, m_rate,
        dkk, dll, area, centers, rhobar, BVF, KAPPA, PHI0, active=active,
    ))
    assert np.all(tend[~active] == 0)
