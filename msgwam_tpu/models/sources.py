"""Ray sources: initial conditions, launch spectra, culling, relaunch.

The reference builds its initial wave packet inline in the driver
(``raytracer.py:67-117``) and has **no** ray lifecycle at all — out-of-domain
rays are masked in the projection (``lib/libprop.py:129-135``) but propagate
forever.  Here fixed-capacity masked buffers make ray death (critical-level
absorption, domain exit) a mask flip and relaunch a slot reuse — all static
shapes for XLA (BASELINE configs 3-4).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import GridConfig, ModelConfig
from ..state import Background, RayState, RayStatics, State, coriolis
from ..ops.dispersion import omega
from ..ops.interp import grid_interp


def wave_packet_ic(
    grid_cfg: GridConfig,
    cfg: ModelConfig,
    bg: Background,
    n_ray: int = 60,
    rr_min: float = 0.0,
    rr_max: float = 15000.0,
    wavelength_h: float = 50e3,
    direction_deg: float = 90.0,
    lambda_z: float = 5e3,
    alpha: float = 0.01,
    envelope_sigma: float = 2000.0,
    dtype=jnp.float64,
) -> Tuple[RayState, RayStatics]:
    """The reference driver's initial condition (``raytracer.py:67-117``):
    a vertically stacked wave packet of ``n_ray`` contiguous ray volumes
    with amplitude a fraction ``alpha²`` of the static-instability threshold
    under a Gaussian envelope.

    Built entirely with host NumPy (not jnp): init runs once, and NumPy's
    linspace/interp/exp reproduce the reference bit-for-bit, which is what
    makes the full-run float64 parity test bitwise (device ULP differences
    here would seed chaotic divergence through the saturation clamps).
    """
    import numpy as np

    from ..constants import ROT_EARTH

    k_abs = 2.0 * math.pi / wavelength_h
    direction = math.radians(direction_deg)
    ones = np.ones((n_ray,))

    k = ones * k_abs * math.sin(direction)
    l = ones * k_abs * math.cos(direction)
    m = ones * (-2.0 * math.pi / lambda_z)
    lam = np.zeros((n_ray,))
    phi = ones * cfg.phi0

    edges = np.linspace(rr_min, rr_max, n_ray + 1)
    r = 0.5 * (edges[:-1] + edges[1:])
    dr = ones * (edges[1] - edges[0])
    rr_mm_area = 5e-5 * dr                       # raytracer.py:91
    dm = rr_mm_area / dr
    dkk = ones * 1e-4                            # raytracer.py:102-103
    dll = ones * 1e-4

    # wave-action density (raytracer.py:112-117), NumPy mirror of the
    # reference expressions: f = 2Ω sin φ; ω̂ per lib/libprop.py:369-383
    f0 = 2.0 * ROT_EARTH * np.sin(cfg.phi0)
    rhobar_ray = np.interp(r, np.asarray(bg.centers, np.float64),
                           np.asarray(bg.rhobar, np.float64))
    omh = np.sqrt(
        (cfg.bvf**2 * (k**2 + l**2) + f0**2 * m**2) / (k**2 + l**2 + m**2)
    )
    amplitude = (
        alpha**2 * rhobar_ray / 2.0 * omh / m**2 / (omh**2 - f0**2)
        * cfg.bvf**2
    )
    profile = np.exp(-((r - r.mean()) ** 2) / 2.0 / envelope_sigma**2)
    dens = amplitude * profile / dkk / dll / dm

    j = lambda x: jnp.asarray(x, dtype=dtype)
    rays = RayState(dens=j(dens), lam=j(lam), phi=j(phi), r=j(r), dr=j(dr),
                    k=j(k), l=j(l), m=j(m), dm=j(dm))
    statics = RayStatics(
        dkk=j(dkk), dll=j(dll), rr_mm_area=j(rr_mm_area),
        active=jnp.ones((n_ray,), dtype=bool),
    )
    return rays, statics


def gaussian_spectrum_source(
    cfg: ModelConfig,
    bg: Background,
    n_ray: int,
    z_launch: float = 1000.0,
    dz_launch: float = 1000.0,
    m_center: float = -2.0 * math.pi / 5e3,
    m_sigma: float = 2.0 * math.pi / 20e3,
    m_halfwidth: float = 3.0,
    wavelength_h: float = 50e3,
    amplitude_alpha: float = 0.01,
    key: Optional[jax.Array] = None,
    dtype=jnp.float64,
) -> Tuple[RayState, RayStatics]:
    """Gaussian source spectrum (BASELINE configs 1-4): ``n_ray`` ray
    volumes launched near ``z_launch``, vertical wavenumbers spread over a
    Gaussian spectrum around ``m_center``, wave-action density following the
    spectral envelope at a fraction ``amplitude_alpha²`` of saturation.

    Deterministic (linspaced m) by default; pass ``key`` for a stochastic
    draw (ensemble members, BASELINE config 5).
    """
    ones = jnp.ones((n_ray,), dtype=dtype)
    k_abs = 2.0 * math.pi / wavelength_h
    if key is None:
        mm = jnp.linspace(
            m_center - m_halfwidth * m_sigma,
            m_center + m_halfwidth * m_sigma,
            n_ray,
            dtype=dtype,
        )
        amp_jitter = 1.0
        z_off = 0.0
    else:
        k1, k2, k3 = jax.random.split(key, 3)
        mm = m_center + m_sigma * jax.random.truncated_normal(
            k1, -m_halfwidth, m_halfwidth, (n_ray,), dtype
        )
        amp_jitter = jnp.exp(
            0.3 * jax.random.normal(k2, (n_ray,), dtype)
        )
        # randomized launch heights: uniform within half a launch-layer
        # thickness, so stochastic ensembles (and keyed per-relaunch
        # sources) inject decorrelated, non-overlapping-in-z ray volumes
        z_off = dz_launch * (
            jax.random.uniform(k3, (n_ray,), dtype) - 0.5
        )
    # keep m strictly negative (upward group propagation)
    mm = jnp.minimum(mm, -k_abs)

    r = ones * z_launch + z_off
    dr = ones * dz_launch
    rr_mm_area = 5e-5 * dr                       # same area scale as the packet IC
    dm = rr_mm_area / dr
    k = ones * k_abs
    l = jnp.zeros((n_ray,), dtype=dtype)
    dkk = ones * 1e-4
    dll = ones * 1e-4

    f0 = coriolis(jnp.asarray(cfg.phi0, dtype))
    rhobar_ray = grid_interp(r, bg.centers, bg.rhobar)
    omh = omega(k, l, mm, cfg.phi0, cfg.bvf)
    spectrum = jnp.exp(-((mm - m_center) ** 2) / 2.0 / m_sigma**2)
    amplitude = (
        amplitude_alpha**2 * rhobar_ray / 2.0 * omh / mm**2
        / (omh**2 - f0**2) * cfg.bvf**2
    )
    dens = amplitude * spectrum * amp_jitter / dkk / dll / dm

    rays = RayState(dens=dens, lam=jnp.zeros_like(r), phi=ones * cfg.phi0,
                    r=r, dr=dr, k=k, l=l, m=mm, dm=dm)
    statics = RayStatics(
        dkk=dkk, dll=dll, rr_mm_area=rr_mm_area,
        active=jnp.ones((n_ray,), dtype=bool),
    )
    return rays, statics


def cull(state: State, statics: RayStatics, bg: Background, cfg: ModelConfig):
    """Deactivate dead rays (mask flip; state untouched, tendencies are
    masked to zero in the RHS).  Criteria:

    * fully out of the vertical domain (the reference merely skips these in
      the projection forever, ``lib/libprop.py:129-135``);
    * critical-level absorption: ``|m| > cfg.m_max`` (as a ray approaches a
      critical level, m grows without bound and cg_r → 0);
    * non-finite state (defensive).
    """
    rays = state.rays
    r_low = rays.r - 0.5 * rays.dr
    r_up = rays.r + 0.5 * rays.dr
    out = (r_low >= bg.faces[-1]) | (r_up <= bg.faces[0])
    critical = jnp.abs(rays.m) > cfg.m_max
    finite = (
        jnp.isfinite(rays.dens) & jnp.isfinite(rays.r) & jnp.isfinite(rays.m)
    )
    active = statics.active & ~out & ~critical & finite
    return state, statics._replace(active=active)


def relaunch(
    state: State,
    statics: RayStatics,
    source: Tuple[RayState, RayStatics],
):
    """Refill inactive slots from a source template (slot reuse — the
    build-side capability BASELINE config 4 requires; no reference
    counterpart).  Active rays are untouched."""
    src_rays, src_statics = source
    act = statics.active

    def pick(live, fresh):
        return jnp.where(act, live, fresh)

    rays = RayState(*(pick(a, b) for a, b in zip(state.rays, src_rays)))
    statics = RayStatics(
        dkk=pick(statics.dkk, src_statics.dkk),
        dll=pick(statics.dll, src_statics.dll),
        rr_mm_area=pick(statics.rr_mm_area, src_statics.rr_mm_area),
        active=act | src_statics.active,
    )
    return State(rays, state.mean), statics
