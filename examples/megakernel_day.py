"""A simulated day of 1e6 coupled ray volumes in one kernel launch.

The north-star demonstration (BASELINE.json): a million-ray-volume gravity
wave field, fully coupled to the mean flow with online saturation, stepped
through a whole simulated day (720 steps at dt=120 s) by the whole-run
megakernel — one `simulate_resident` call, which dispatches to the
HBM-streaming kernel at this size (`ops/step_pallas_stream.py`).  On a TPU
v5 lite this takes ~0.5 s of wall clock (~45,000× the NumPy reference,
`lib/libprop.py` + `raytracer.py`, on one CPU core); the same script runs
(slowly, in interpret mode) on CPU.

Run:  python examples/megakernel_day.py [--n-ray 1000000] [--plot out.png]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from msgwam_tpu.utils.xla import apply_recommended_xla_flags

apply_recommended_xla_flags()

import numpy as np
import jax
import jax.numpy as jnp

import msgwam_tpu as mt


def main():
    ap = argparse.ArgumentParser()
    default_n = 1_000_000 if jax.default_backend() == "tpu" else 30_000
    ap.add_argument("--n-ray", type=int, default=default_n)
    ap.add_argument("--steps", type=int, default=720)   # one day at dt=120
    ap.add_argument("--save-every", type=int, default=72)
    ap.add_argument("--plot", help="write the wave-action panels here")
    args = ap.parse_args()

    cfg = mt.REFERENCE_RUN_CONFIG.replace(
        saturate_online=True, dtype="float32",
        projection_backend="mxu", interp_backend="mxu",
    )
    gc = mt.GridConfig()
    centers = gc.centers()
    uu = np.asarray(
        mt.velocities_sine_homogeneous(jnp.asarray(centers, jnp.float32), cfg)
    ).astype(np.float32)
    bg = mt.make_background(gc, cfg, uu, np.zeros_like(uu), dtype=jnp.float32)
    rays, statics = mt.gaussian_spectrum_source(
        cfg, bg, args.n_ray, z_launch=2000.0, dz_launch=500.0,
        amplitude_alpha=0.003, dtype=jnp.float32,
    )
    state = mt.State(
        rays, mt.MeanState(jnp.asarray(uu), jnp.zeros_like(jnp.asarray(uu)))
    )
    run = mt.RunConfig(dt=120.0, n_steps=args.steps,
                       save_every=args.save_every)

    sim = jax.jit(lambda s, st: mt.simulate_resident(s, st, bg, cfg, run))
    final, statics_f, hist = sim(state, statics)   # compile + warm-up
    jax.block_until_ready(final)

    t0 = time.perf_counter()
    final, statics_f, hist = sim(state, statics)
    jax.block_until_ready(final)
    wall = time.perf_counter() - t0

    sim_seconds = args.steps * run.dt
    print(f"{args.n_ray} rays × {args.steps} steps "
          f"({sim_seconds / 3600:.1f} simulated hours) in {wall:.2f} s wall "
          f"({args.n_ray * args.steps / wall:.3g} ray-steps/s, "
          f"{sim_seconds / wall:.0f}× real time)")
    du = np.asarray(final.mean.u) - uu
    print(f"mean-flow response: max |ΔU| = {np.max(np.abs(du)):.3f} m/s at "
          f"z = {centers[np.argmax(np.abs(du))] / 1e3:.0f} km")

    if args.plot:
        from msgwam_tpu.diagnostics import wave_action_history
        from msgwam_tpu.plotting import plot_wave_action_panels

        h_state, h_active, _ = hist
        diag = wave_action_history(h_state.rays, h_active, statics_f, bg, cfg)
        t = np.arange(1, args.steps // args.save_every + 1) \
            * run.dt * args.save_every
        plot_wave_action_panels(
            t, np.asarray(bg.faces[:-1] + 0.5 * (bg.faces[1] - bg.faces[0])),
            np.asarray(diag.wave_action), np.asarray(diag.tendency),
            plot_max_s=float(t[-1]), show=False, save_path=args.plot,
        )
        print(f"wrote {args.plot}")


if __name__ == "__main__":
    main()
