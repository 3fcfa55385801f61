"""Frame-for-frame parity of the reference driver's diagnostics block
(raytracer.py:194-240) — every wave-action and flux frame over a 100-step
run, including the t=0 history frame and the quirk-3 index typo
(raytracer.py:221)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import msgwam_tpu as mt
from msgwam_tpu.diagnostics import reference_window_diagnostics

from test_parity import (  # noqa: F401  (fixtures)
    ALPHA, DT, NGRID, NN, NRAY, PHI0, GRID_MAX,
    engine_setup, reference_setup, _reference_run,
)


def _reference_history(lprop, grids, uu, vv, n_steps):
    """Like _reference_run but recording every frame (raytracer.py:124-188):
    frame 0 is the initial condition, frames 1..n are post-step states with
    offline saturation applied to dens."""
    frames = [_reference_run(lprop, grids, uu, vv, 0)]
    cur = list(frames[0])
    for _ in range(n_steps):
        out = lprop.RK3(DT, np.array(cur, dtype=object))
        dens_sat = lprop.saturation(
            DT, out[0], cur[3], (out[3] - cur[3]) / 1,
            cur[4], (out[4] - cur[4]) / DT,
            out[5], out[6], cur[7], (out[7] - cur[7]) / DT, direct=True,
        )
        cur = list(out)
        cur[0] = dens_sat
        frames.append([np.array(x, copy=True) for x in cur])
    return frames


def _reference_diagnostics(lprop, grid, grids, frames, quirk3=True):
    """The driver's diagnostics block, verbatim semantics
    (raytracer.py:198-240): window nproj=[0, len(time)-5], per-frame var=2
    and var=1 projections, the never-filled rows, and the rr_up index typo
    in the last wave-action frame."""
    n_frames = len(frames)
    nproj1 = n_frames - 4
    dkk = np.ones(NRAY) * 1e-4
    dll = np.ones(NRAY) * 1e-4

    wa = np.zeros((nproj1, len(grids)))
    for nt in range(0, nproj1 - 2):
        f = frames[nt]
        wa[nt] = lprop.wave_projection(
            f[0], f[1], f[2], f[3] - 0.5 * f[4], f[3] + 0.5 * f[4],
            f[5], f[6], f[7] - 0.5 * f[8], f[7] + 0.5 * f[8],
            dkk, dll, f[8], grid, var=2,
        )
    last = frames[nproj1 - 1]
    up_src = frames[0] if quirk3 else last  # raytracer.py:221
    wa[-1] = lprop.wave_projection(
        last[0], last[1], last[2], last[3] - 0.5 * last[4],
        up_src[3] + 0.5 * up_src[4],
        last[5], last[6], last[7] - 0.5 * last[8], last[7] + 0.5 * last[8],
        dkk, dll, last[8], grid, var=2,
    )

    flux = np.zeros((nproj1 - 1, len(grids) - 1))
    for nt in range(0, nproj1 - 2):
        f = frames[nt]
        flux[nt] = lprop.wave_projection(
            f[0], f[1], f[2], f[3] - 0.5 * f[4], f[3] + 0.5 * f[4],
            f[5], f[6], f[7] - 0.5 * f[8], f[7] + 0.5 * f[8],
            dkk, dll, f[8], grids, var=1,
        )
    dz = grid[1] - grid[0]
    tendency = np.zeros((nproj1 - 1, len(grids)))
    tendency[:, 1:-1] = -np.diff(flux, axis=-1) / dz
    return wa, flux, tendency


@pytest.mark.parametrize("quirk3", [True, False])
def test_reference_window_diagnostics_all_frames(
    reference_setup, engine_setup, quirk3
):
    lprop, grid, grids, uu, vv = reference_setup
    cfg, gc, bg, state, statics = engine_setup
    cfg = cfg.replace(faithful_diag_index=quirk3)
    N = 100

    frames = _reference_history(lprop, grids, uu, vv, N)
    wa_ref, flux_ref, tend_ref = _reference_diagnostics(
        lprop, grid, grids, frames, quirk3=quirk3
    )

    run = mt.RunConfig(dt=DT, n_steps=N, save_every=1)
    _, stf, hist = jax.jit(
        lambda s, st: mt.simulate(s, st, bg, cfg, run, include_t0=True)
    )(state, statics)
    hist_state, hist_active, _ = hist
    assert hist_state.rays.dens.shape[0] == N + 1  # t=0 frame included

    diag = reference_window_diagnostics(
        hist_state.rays, hist_active, stf, bg, cfg
    )

    scale = np.max(np.abs(wa_ref))
    np.testing.assert_allclose(
        np.asarray(diag.wave_action), wa_ref, rtol=0, atol=1e-8 * scale
    )
    fscale = np.max(np.abs(flux_ref))
    np.testing.assert_allclose(
        np.asarray(diag.flux), flux_ref, rtol=0, atol=1e-8 * fscale
    )
    tscale = np.max(np.abs(tend_ref))
    np.testing.assert_allclose(
        np.asarray(diag.tendency), tend_ref, rtol=0, atol=1e-8 * tscale
    )
    # the quirk changes the answer, so the flag is load-bearing: with the
    # typo the last frame reads rr_up from t=0, which the packet has long
    # left behind (all-zero row); corrected indexing projects a real frame
    if quirk3:
        assert not np.any(wa_ref[-1])
    else:
        assert np.any(wa_ref[-1] != 0)


def test_include_t0_frame_is_initial_state(engine_setup):
    cfg, gc, bg, state, statics = engine_setup
    run = mt.RunConfig(dt=DT, n_steps=10, save_every=5)
    _, _, hist = jax.jit(
        lambda s, st: mt.simulate(s, st, bg, cfg, run, include_t0=True)
    )(state, statics)
    hist_state, hist_active, dens_prop = hist
    assert hist_state.rays.dens.shape[0] == 3  # t0 + 2 saved frames
    np.testing.assert_array_equal(
        np.asarray(hist_state.rays.dens[0]), np.asarray(state.rays.dens)
    )
    np.testing.assert_array_equal(
        np.asarray(hist_state.mean.u[0]), np.asarray(state.mean.u)
    )
    # dens_prop at t=0 is the initial density itself (raytracer.py:140)
    np.testing.assert_array_equal(
        np.asarray(dens_prop[0]), np.asarray(state.rays.dens)
    )
