"""Projection-based scientific observables.

Mirrors the reference driver's diagnostics block (``raytracer.py:194-240``):
wave action and wave-action flux projected per timestep, and the wave-action
tendency as the negative flux divergence — but jit-batched (vmap) over the
time axis instead of a Python loop per frame.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .config import ModelConfig
from .state import Background
from .ops.dispersion import cg_r
from .ops.projection import project_backend


class WaveActionDiagnostics(NamedTuple):
    wave_action: jax.Array     # (n_t, n_face - 1)     on the face grid cells
    flux: jax.Array            # (n_t, n_cell - 1)     on the center-grid cells
    tendency: jax.Array        # (n_t, n_cell)         −∂flux/∂z, zero-padded


def _project_frame(dens, phi, r, dr, k, l, m, dm, dkk, dll, active,
                   grid, bvf, max_span, with_flux: bool, backend: str = "xla"):
    phase_vol = jnp.abs(dkk * dll * dm)
    vals = dens
    if with_flux:
        vals = cg_r(k, l, m, phi, bvf) * dens
    return project_backend(backend)(
        vals, r - 0.5 * dr, r + 0.5 * dr, phase_vol, active, grid, max_span
    )[0]


def wave_action_history(
    history_rays,
    history_active,
    statics,
    bg: Background,
    cfg: ModelConfig,
) -> WaveActionDiagnostics:
    """Compute the reference's conservation diagnostics over a stacked
    history (leading time axis on every ray field).

    * wave action (var=2) projected onto the *face* grid
      (``raytracer.py:210-223``),
    * wave-action flux (var=1) onto the *center* grid
      (``raytracer.py:225-231``),
    * tendency = −Δflux/Δz, zero at the profile edges
      (``raytracer.py:234-237``).
    """
    def frame(rays, active):
        wa = _project_frame(
            rays.dens, rays.phi, rays.r, rays.dr, rays.k, rays.l,
            rays.m, rays.dm, statics.dkk, statics.dll, active,
            bg.faces, cfg.bvf, cfg.max_span, with_flux=False,
            backend=cfg.projection_backend,
        )
        fl = _project_frame(
            rays.dens, rays.phi, rays.r, rays.dr, rays.k, rays.l,
            rays.m, rays.dm, statics.dkk, statics.dll, active,
            bg.centers, cfg.bvf, cfg.max_span, with_flux=True,
            backend=cfg.projection_backend,
        )
        return wa, fl

    wa, flux = jax.vmap(frame)(history_rays, history_active)
    dz = bg.faces[1] - bg.faces[0]
    interior = -(flux[:, 1:] - flux[:, :-1]) / dz
    pad = jnp.zeros((flux.shape[0], 1), dtype=flux.dtype)
    tendency = jnp.concatenate([pad, interior, pad], axis=1)
    return WaveActionDiagnostics(wave_action=wa, flux=flux, tendency=tendency)


def pseudo_momentum_flux(rays, statics, bg: Background, cfg: ModelConfig):
    """Pseudo-momentum flux profile (u, v components) on the center grid —
    the wave→mean-flow observable (``lib/libprop.py:96,146-163``)."""
    phase_vol = jnp.abs(statics.dkk * statics.dll * rays.dm)
    cgr = cg_r(rays.k, rays.l, rays.m, rays.phi, cfg.bvf)
    vals = jnp.stack([cgr * rays.k * rays.dens, cgr * rays.l * rays.dens])
    return project_backend(cfg.projection_backend)(
        vals, rays.r - 0.5 * rays.dr, rays.r + 0.5 * rays.dr,
        phase_vol, statics.active, bg.centers, cfg.max_span,
    )
