"""BASELINE config-4 style experiment: a continuously-launched wave
spectrum propagating into a transient (tidal) shear — rays are absorbed at
descending critical levels (|m| grows without bound, cg_r -> 0), culled,
and relaunched from the source, while the history streams to disk through
the native async writer.

Run: python examples/critical_level_relaunch.py [--nray 20000] [--hours 12]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_disable_hlo_passes=while_loop_unroller"
).strip()

import numpy as np
import jax
import jax.numpy as jnp

import msgwam_tpu as mt
from msgwam_tpu.models.backgrounds import tidal_shear
from msgwam_tpu.utils.history_io import HistoryWriter, read_history


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nray", type=int, default=20000)
    ap.add_argument("--hours", type=float, default=12.0)
    ap.add_argument("--out", default="results_critical")
    args = ap.parse_args()

    cfg = mt.REFERENCE_RUN_CONFIG.replace(
        dtype="float32",
        projection_backend="mxu", interp_backend="mxu",
        saturate_online=True,
        prognostic_mean=False,            # wind is imposed (tidal), not prognostic
        u0=25.0, rr0=20e3, sig_rr=8e3,
        cull=True, relaunch=True,
        m_max=2 * np.pi / 300.0,          # absorb when lambda_z < 300 m
    )
    gc = mt.GridConfig()
    centers = jnp.asarray(gc.centers(), jnp.float32)
    bg = mt.make_background(gc, cfg, np.zeros(gc.n_cell), np.zeros(gc.n_cell),
                            dtype=jnp.float32)
    source = mt.gaussian_spectrum_source(
        cfg, bg, args.nray, z_launch=2000.0, dz_launch=800.0,
        amplitude_alpha=0.005, dtype=jnp.float32,
    )
    rays, statics = source
    u0 = tidal_shear(centers, 0.0, cfg)
    state = mt.State(rays, mt.MeanState(u0, jnp.zeros_like(u0)))

    wind_fn = lambda t: (tidal_shear(centers, t, cfg), jnp.zeros_like(centers))

    dt = 120.0
    chunk_steps = 30                      # stream one snapshot per hour
    n_chunks = int(args.hours * 3600 / dt / chunk_steps)
    chunk = mt.RunConfig(dt=dt, n_steps=chunk_steps, save_every=chunk_steps)
    sim = jax.jit(lambda s, st, t0: mt.simulate(
        s, st, bg, cfg, chunk, source=source, wind_fn=wind_fn, t0=t0,
    ))

    os.makedirs(args.out, exist_ok=True)
    path = os.path.join(args.out, "wa_history.msgw")
    from msgwam_tpu.diagnostics import pseudo_momentum_flux

    with HistoryWriter(path, (2, gc.n_cell - 1), np.float32) as w:
        for c in range(n_chunks):
            state, statics, _ = sim(state, statics, c * chunk_steps * dt)
            flux = pseudo_momentum_flux(state.rays, statics, bg, cfg)
            w.push(np.asarray(flux))
            n_active = int(np.sum(np.asarray(statics.active)))
            print(f"t = {(c + 1) * chunk_steps * dt / 3600:5.1f} h   "
                  f"active rays {n_active}/{args.nray}   "
                  f"max |m| {float(jnp.max(jnp.abs(state.rays.m))):.4f}",
                  flush=True)

    hist = read_history(path)
    print(f"streamed flux history: {hist.shape} -> {path}")
    assert np.all(np.isfinite(hist))


if __name__ == "__main__":
    main()
