"""Dispersion relation, group velocities, and wavenumber (refraction)
tendencies — fused into single elementwise XLA kernels over the ray batch.

Physics per the reference:

* intrinsic frequency ω̂            ``lib/libprop.py:369-383``
* group velocities cg_λ, cg_φ, cg_r ``lib/libprop.py:386-448``
* refraction dk/dt, dl/dt, dm/dt    ``lib/libprop.py:451-520``

Differences from the reference by design:

* Winds and shears arrive *pre-gathered* at ray positions (one interpolation
  per RHS evaluation instead of the reference's repeated ``np.interp`` calls
  inside ``gradients``/``cg_*``); everything here is pure elementwise math
  that XLA fuses into one kernel.
* ``HPROP_GLOBAL`` (``lib/libprop.py:5,404,428,467,493``) is a *static*
  config bool, resolved at trace time — zero branches in the compiled code.
* Everything below is written for ``vmap``/``shard_map`` over the ray axis.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..constants import RAD_EARTH, ROT_EARTH


def omega(k, l, m, phi, bvf):
    """Intrinsic frequency ω̂ = sqrt((N²k_h² + f²m²)/|k|²)
    (``lib/libprop.py:369-383``)."""
    ff = 2.0 * ROT_EARTH * jnp.sin(phi)
    kh2 = k * k + l * l
    k2 = kh2 + m * m
    return jnp.sqrt((bvf * bvf * kh2 + ff * ff * m * m) / k2)


def cg_r(k, l, m, phi, bvf):
    """Vertical group velocity cg_r = −m(ω̂²−f²)/(ω̂|k|²)
    (``lib/libprop.py:434-448``).

    Note: the reference signature also takes λ and r but never uses them —
    cg_r has no height dependence in this model, which is why the reference's
    "edge" group velocities at r±dr/2 (``lib/libprop.py:635-636``) are
    identical and ray-volume stretching is exactly zero.
    """
    ff = 2.0 * ROT_EARTH * jnp.sin(phi)
    k2 = k * k + l * l + m * m
    om = omega(k, l, m, phi, bvf)
    return -m * (om * om - ff * ff) / om / k2


def group_velocities(k, l, m, phi, u_ray, v_ray, bvf, hprop: bool):
    """All three group-velocity components in one fused evaluation.

    Returns ``(cg_lam, cg_phi, cg_rr)``.  With ``hprop=False`` the horizontal
    components are exactly zero (``lib/libprop.py:404-407,428-431``).
    """
    ff = 2.0 * ROT_EARTH * jnp.sin(phi)
    k2 = k * k + l * l + m * m
    om = omega(k, l, m, phi, bvf)
    cgr = -m * (om * om - ff * ff) / om / k2
    if hprop:
        horiz = (bvf * bvf - om * om) / (om * k2)
        cglam = k * horiz + u_ray
        cgphi = l * horiz + v_ray
    else:
        cglam = jnp.zeros_like(k)
        cgphi = jnp.zeros_like(k)
    return cglam, cgphi, cgr


def wavenumber_tendencies(
    k, l, m, phi, r,
    u_ray, v_ray, du_dr, dv_dr,
    bvf,
    hprop: bool,
    du_dlam=None, dv_dlam=None, du_dphi=None, dv_dphi=None,
):
    """Refraction tendencies (dk/dt, dl/dt, dm/dt)
    (``lib/libprop.py:451-520``), fused with the group velocities.

    The reference's 1-D background has zero horizontal wind gradients
    (``lib/libprop.py:360-364``); pass the ``d*_dlam`` / ``d*_dphi`` terms
    for a future 3-D background.
    """
    cglam, cgphi, cgr = group_velocities(k, l, m, phi, u_ray, v_ray, bvf, hprop)
    radius = RAD_EARTH + r

    # dm/dt is active regardless of hprop (lib/libprop.py:519-520)
    dm = (k * cglam + l * cgphi) / radius - (k * du_dr + l * dv_dr)

    if not hprop:
        zero = jnp.zeros_like(k)
        return zero, zero, dm

    om = omega(k, l, m, phi, bvf)
    k2 = k * k + l * l + m * m
    tanphi = jnp.tan(phi)

    if du_dlam is None:
        grad_lam = jnp.zeros_like(k)
    else:
        grad_lam = (k * du_dlam + l * dv_dlam) / radius / jnp.cos(phi)
    if du_dphi is None:
        grad_phi = jnp.zeros_like(k)
    else:
        grad_phi = (k * du_dphi + l * dv_dphi) / radius

    dk = k / radius * (tanphi * cgphi - cgr) - grad_lam

    # df²/dφ = 8 Ω² sin φ cos φ (lib/libprop.py:491)
    df2_dphi = 8.0 * ROT_EARTH * ROT_EARTH * jnp.sin(phi) * jnp.cos(phi)
    dl = (
        -(l * cgr + k * tanphi * cglam + m * m / (2.0 * om * k2) * df2_dphi)
        / radius
        - grad_phi
    )
    return dk, dl, dm
