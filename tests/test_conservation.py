"""The reference's only runtime validation — wave-action conservation,
∂t(wave action) = −∂z(wave-action flux) (``raytracer.py:194-240``, plotted
as panel 2) — promoted to a quantitative test of the diagnostics pipeline.
"""

import numpy as np
import jax
import jax.numpy as jnp

import msgwam_tpu as mt
from msgwam_tpu.diagnostics import wave_action_history


def test_wave_action_budget_closes():
    # pure propagation: no saturation (huge kappa), frozen background
    cfg = mt.REFERENCE_RUN_CONFIG.replace(
        kappa=1e9, saturate_online=True, prognostic_mean=False
    )
    gc = mt.GridConfig()
    centers = gc.centers()
    uu = np.asarray(mt.velocities_sine_homogeneous(jnp.asarray(centers), cfg))
    bg = mt.make_background(gc, cfg, uu, np.zeros_like(uu))
    rays, statics = mt.wave_packet_ic(gc, cfg, bg, n_ray=60)
    state = mt.State(rays, mt.MeanState(jnp.asarray(uu), jnp.zeros(100)))

    dt, n = 120.0, 120
    run = mt.RunConfig(dt=dt, n_steps=n, save_every=1)
    _, stf, hist = jax.jit(lambda s, st: mt.simulate(s, st, bg, cfg, run))(
        state, statics
    )
    hist_state, hist_active, _ = hist

    diag = wave_action_history(hist_state.rays, hist_active, stf, bg, cfg)
    wa = np.asarray(diag.wave_action)        # (n, 100) on face-grid cells
    tend = np.asarray(diag.tendency)         # (n, 100) from flux divergence

    # centered FD time derivative of the projected wave action vs the flux
    # divergence: pointwise agreement is limited by the projection's
    # spatial discretization (the wave action lives on the face-grid cells,
    # the flux on the center grid — ~dz-scale noise the reference only ever
    # inspected visually), so assert strong correlation, not equality
    dwa_dt = ((wa[2:] - wa[:-2]) / (2 * dt)).ravel()
    tend_mid = tend[1:-1].ravel()
    corr = np.corrcoef(dwa_dt, tend_mid)[0, 1]
    assert corr > 0.9, corr

    # the hard invariant: total column wave action is exactly conserved
    # under pure propagation while the packet is interior
    total_wa = wa.sum(axis=1)
    drift = abs(total_wa[-1] - total_wa[0]) / total_wa[0]
    assert drift < 1e-10, drift
