"""Benchmark: the metric of record (BASELINE.json) — ray-volume steps per
second per chip at 1e5 rays with full wave/mean-flow coupling and online
saturation, on the default device (TPU).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the NumPy reference measured at ~3.0e4 ray-steps/s on one CPU core
(BASELINE.md).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# scan compile time scales with trip count unless the unroller is off
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_disable_hlo_passes=while_loop_unroller"
).strip()

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import msgwam_tpu as mt  # noqa: E402

N_RAY = 100_000
N_STEPS = 100
DT = 120.0
BASELINE_RAY_STEPS_PER_SEC = 3.0e4


def main(n_ray: int = N_RAY, n_steps: int = N_STEPS):
    cfg = mt.REFERENCE_RUN_CONFIG.replace(
        saturate_online=True,
        dtype="float32",
        projection_backend="mxu",
        interp_backend="mxu",
    )
    gc = mt.GridConfig()
    centers = gc.centers()
    uu = np.asarray(
        mt.velocities_sine_homogeneous(jnp.asarray(centers, jnp.float32), cfg)
    ).astype(np.float32)
    vv = np.zeros_like(uu)
    bg = mt.make_background(gc, cfg, uu, vv, dtype=jnp.float32)
    rays, statics = mt.gaussian_spectrum_source(
        cfg, bg, n_ray,
        z_launch=2000.0, dz_launch=500.0,
        amplitude_alpha=0.003,  # keep total forcing physical at 1e5 rays
        dtype=jnp.float32,
    )
    state = mt.State(rays, mt.MeanState(jnp.asarray(uu), jnp.asarray(vv)))
    run = mt.RunConfig(dt=DT, n_steps=n_steps, save_every=n_steps)

    step_fn = jax.jit(lambda s, st: mt.simulate(s, st, bg, cfg, run))
    out = step_fn(state, statics)  # compile + warm-up
    jax.block_until_ready(out)

    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = step_fn(state, statics)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)

    final_state = out[0]
    assert bool(jnp.all(jnp.isfinite(final_state.mean.u))), "wind blew up"
    assert bool(jnp.all(jnp.isfinite(final_state.rays.dens))), "dens blew up"

    ray_steps_per_sec = n_ray * n_steps / best
    print(json.dumps({
        "metric": "ray-volume steps/sec/chip at 1e5 rays (coupled, online saturation, f32)",
        "value": round(ray_steps_per_sec, 1),
        "unit": "ray-steps/s",
        "vs_baseline": round(ray_steps_per_sec / BASELINE_RAY_STEPS_PER_SEC, 1),
    }))


if __name__ == "__main__":
    main()
