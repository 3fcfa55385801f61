"""Bisect the pallasw slowdown inside the real simulate pipeline at 1e6:
plain pallas vs windowed(no sort) vs windowed+sort at several cadences."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_disable_hlo_passes=while_loop_unroller"
).strip()

import numpy as np
import jax
import jax.numpy as jnp

import msgwam_tpu as mt

N = 1_000_000
STEPS = 50


def setup(window):
    cfg = mt.REFERENCE_RUN_CONFIG.replace(
        saturate_online=True, dtype="float32",
        projection_backend="mxu", interp_backend="mxu",
        rhs_backend="pallas", window_cells=window,
    )
    gc = mt.GridConfig()
    centers = gc.centers()
    uu = np.asarray(mt.velocities_sine_homogeneous(
        jnp.asarray(centers, jnp.float32), cfg)).astype(np.float32)
    bg = mt.make_background(gc, cfg, uu, np.zeros_like(uu), dtype=jnp.float32)
    rays, statics = mt.gaussian_spectrum_source(
        cfg, bg, N, z_launch=2000.0, dz_launch=500.0,
        amplitude_alpha=0.003, dtype=jnp.float32)
    state = mt.State(rays, mt.MeanState(jnp.asarray(uu),
                                        jnp.zeros_like(jnp.asarray(uu))))
    return cfg, bg, state, statics


def run(window, sort_every, label):
    cfg, bg, state, statics = setup(window)
    run_cfg = mt.RunConfig(dt=120.0, n_steps=STEPS, save_every=STEPS)
    f = jax.jit(lambda s, st: mt.simulate(
        s, st, bg, cfg, run_cfg, sort_every=sort_every))
    out = f(state, statics); jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = f(state, statics); jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    print(f"{label:28s} {best/STEPS*1e3:7.3f} ms/step")


if __name__ == "__main__":
    run(0, 0, "pallas (control)")
    run(24, 0, "windowed, no sort (fallback)")
    run(24, 50, "windowed, sort_every=50")
    run(24, 20, "windowed, sort_every=20")
    run(24, 5, "windowed, sort_every=5")
