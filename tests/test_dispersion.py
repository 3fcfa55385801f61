"""Dispersion relation, group velocities, refraction tendencies: formula
checks and physics invariants (``lib/libprop.py:369-520``)."""

import numpy as np
import jax.numpy as jnp

from msgwam_tpu.constants import ROT_EARTH
from msgwam_tpu.ops.dispersion import (
    cg_r,
    group_velocities,
    omega,
    wavenumber_tendencies,
)

BVF = 0.01


def _random_waves(rng, n=200):
    k = rng.uniform(-1e-3, 1e-3, n)
    l = rng.uniform(-1e-3, 1e-3, n)
    m = rng.uniform(-1e-2, -1e-4, n)
    phi = rng.uniform(-1.4, 1.4, n)
    return k, l, m, phi


def test_omega_formula(rng):
    k, l, m, phi = _random_waves(rng)
    om = np.asarray(omega(k, l, m, phi, BVF))
    f = 2 * ROT_EARTH * np.sin(phi)
    expect = np.sqrt((BVF**2 * (k**2 + l**2) + f**2 * m**2) / (k**2 + l**2 + m**2))
    np.testing.assert_allclose(om, expect, rtol=1e-14)


def test_omega_bounds(rng):
    """|f| <= omega_hat <= N for internal gravity waves."""
    k, l, m, phi = _random_waves(rng)
    om = np.asarray(omega(k, l, m, phi, BVF))
    f = np.abs(2 * ROT_EARTH * np.sin(phi))
    assert np.all(om <= BVF * (1 + 1e-12))
    assert np.all(om >= f * (1 - 1e-12))


def test_cg_r_sign_and_formula(rng):
    """cg_r = -m(omega^2 - f^2)/(omega |k|^2): upward (positive) for m < 0."""
    k, l, m, phi = _random_waves(rng)
    cgr = np.asarray(cg_r(k, l, m, phi, BVF))
    om = np.asarray(omega(k, l, m, phi, BVF))
    f = 2 * ROT_EARTH * np.sin(phi)
    expect = -m * (om**2 - f**2) / om / (k**2 + l**2 + m**2)
    np.testing.assert_allclose(cgr, expect, rtol=1e-13)
    assert np.all(cgr >= 0)  # m < 0 everywhere in _random_waves


def test_hprop_gating(rng):
    """With hprop off the horizontal components and dk/dl are exactly zero
    (lib/libprop.py:404-407,467-471,493-499); dm stays active."""
    k, l, m, phi = _random_waves(rng)
    z = np.zeros_like(k)
    u = rng.normal(size=k.shape)
    du = rng.normal(size=k.shape)
    cgl, cgp, _ = group_velocities(k, l, m, phi, u, u, BVF, hprop=False)
    assert np.all(np.asarray(cgl) == 0) and np.all(np.asarray(cgp) == 0)
    dk, dl, dm = wavenumber_tendencies(
        k, l, m, phi, z, u, u, du, du, BVF, hprop=False
    )
    assert np.all(np.asarray(dk) == 0) and np.all(np.asarray(dl) == 0)
    np.testing.assert_allclose(np.asarray(dm), -(k * du + l * du), rtol=1e-13)


def test_group_velocity_consistency_with_dispersion(rng):
    """cg = d(omega_abs)/d(k): check cg_r against a numerical derivative of
    the intrinsic frequency (horizontal wind zero, so omega_abs = omega)."""
    k, l, m, phi = _random_waves(rng)
    eps = 1e-9
    dom_dm = (
        np.asarray(omega(k, l, m + eps, phi, BVF))
        - np.asarray(omega(k, l, m - eps, phi, BVF))
    ) / (2 * eps)
    cgr = np.asarray(cg_r(k, l, m, phi, BVF))
    np.testing.assert_allclose(cgr, dom_dm, rtol=1e-4, atol=1e-10)
