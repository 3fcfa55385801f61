"""Analytic background wind profiles.

Pure functions of height (and config), mirroring the reference profile
library (``lib/libprop.py:224-325``).  The reference driver only ever uses
``velocities_sine_homogeneous`` (``raytracer.py:93``); the others are kept
for full API parity.  ``tidal_shear`` is a build-side addition (transient
background for BASELINE config 4 — critical-level filtering under a
time-dependent shear).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config import ModelConfig


def velocities_tanh(lam, phi, rr, cfg: ModelConfig):
    """3-D jet: Gaussian in φ, tanh in r (``lib/libprop.py:224-250``).

    Like the reference, returns a ``(4, 3) + shape`` array with the zonal
    wind broadcast into slot [0] (reference quirk: ``return_array[0] = uu``
    fills all three velocity components, ``lib/libprop.py:247-250``).
    """
    lam = jnp.asarray(lam)
    envelope = (
        jnp.exp(-((phi - cfg.phi0) ** 2) / 2.0 / cfg.sig_phi**2)
        * (jnp.tanh((rr - cfg.rr0) / cfg.sig_rr) + 1.0)
        * 0.5
    )
    uu = cfg.u0 * envelope
    out = jnp.zeros((4, 3) + lam.shape, dtype=jnp.result_type(uu))
    return out.at[0].set(uu)


def velocities_tanh_homogeneous(rr, cfg: ModelConfig):
    """Horizontally homogeneous tanh jet (``lib/libprop.py:253-273``)."""
    return cfg.u0 * 0.5 * (jnp.tanh((rr - cfg.rr0) / cfg.sig_rr) + 1.0)


def velocities_gauss_homogeneous(rr, cfg: ModelConfig):
    """Horizontally homogeneous Gaussian jet (``lib/libprop.py:276-303``).

    The reference zeroes heights satisfying *both* ``rr <= rr0 - 3σ`` and
    ``rr >= rr0 + 3σ`` — an impossible conjunction, so the mask never fires
    (reference quirk, kept as written).
    """
    uu = cfg.u0 * jnp.exp(-((rr - cfg.rr0) ** 2) / 2.0 / cfg.sig_rr**2)
    dead = (rr <= cfg.rr0 - 3 * cfg.sig_rr) & (rr >= cfg.rr0 + 3 * cfg.sig_rr)
    return jnp.where(dead, 0.0, uu)


def velocities_sine_homogeneous(rr, cfg: ModelConfig):
    """tanh-enveloped sine jet (``lib/libprop.py:306-325``) — the profile
    the reference driver actually runs (``raytracer.py:93``)."""
    envelope = 0.5 * (jnp.tanh((rr - cfg.rr0) / cfg.sig_rr) + 1.0)
    return cfg.u0 * envelope * jnp.sin(rr / cfg.sig_rr * 2.0 * jnp.pi)


def tidal_shear(rr, t, cfg: ModelConfig, period: float = 43200.0,
                lambda_z: float = 30e3):
    """Transient, downward-phase-propagating tidal wind U(z, t)
    (build-side; no reference counterpart).  A monochromatic tide of the
    given period and vertical wavelength, enveloped by the config jet
    amplitude — sweeps critical levels through the domain so rays are
    absorbed and must be relaunched (BASELINE config 4)."""
    phase = 2.0 * jnp.pi * (rr / lambda_z + t / period)
    envelope = 0.5 * (jnp.tanh((rr - cfg.rr0) / cfg.sig_rr) + 1.0)
    return cfg.u0 * envelope * jnp.sin(phase)
