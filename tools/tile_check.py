"""TPU check for the auto tile_rows selection: (a) streaming at 1e6 with
tile_rows=128 matches tile_rows=64 to f32 tolerance at a real size, (b) the
lifecycle (cull+relaunch+imposed wind) kernel compiles and runs at 1e6 with
the auto tile (VMEM headroom check), (c) quick timing confirmation.

Run:  nohup python tools/tile_check.py > /tmp/tile_check.log 2>&1 &
"""

import json
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

from bench import _setup, DT
import msgwam_tpu as mt
from msgwam_tpu.ops.step_pallas_stream import simulate_streaming


def rel(a, b):
    a, b = np.asarray(a), np.asarray(b)
    d = np.abs(a - b).max()
    s = max(np.abs(a).max(), 1e-30)
    return float(d / s)


def main():
    # (a) 1e6 equivalence, 64 vs auto(128), 10 steps
    cfg, bg, state, statics = _setup(1_000_000, "mega", "native", w2=96)
    run = mt.RunConfig(dt=DT, n_steps=10, save_every=10)
    a, _, _ = jax.jit(lambda s, st: simulate_streaming(
        s, st, bg, cfg, run, tile_rows=64))(state, statics)
    b, _, _ = jax.jit(lambda s, st: simulate_streaming(
        s, st, bg, cfg, run))(state, statics)   # auto -> 128
    out = {"check": "equiv_1e6_64_vs_auto",
           "rel_dens": rel(a.rays.dens, b.rays.dens),
           "rel_r": rel(a.rays.r, b.rays.r),
           "rel_u": rel(a.mean.u, b.mean.u)}
    print(json.dumps(out), flush=True)

    # (b+c) lifecycle at 1e6 with auto tile: compile + run + time
    from msgwam_tpu.models.backgrounds import tidal_shear
    gc = mt.GridConfig()
    centers = jnp.asarray(gc.centers(), jnp.float32)
    lcfg = cfg.replace(cull=True, relaunch=True,
                       m_max=2 * np.pi / 300.0, prognostic_mean=False)
    rays, lstatics = mt.gaussian_spectrum_source(
        lcfg, bg, 1_000_000, z_launch=2000.0, dz_launch=500.0,
        amplitude_alpha=0.003, dtype=jnp.float32)
    lstate = mt.State(rays, mt.MeanState(
        jnp.zeros_like(centers), jnp.zeros_like(centers)))
    source = (rays, lstatics)
    wf = lambda t: (tidal_shear(centers, t, lcfg), jnp.zeros_like(centers))
    lrun = mt.RunConfig(dt=DT, n_steps=200, save_every=200)
    fn = jax.jit(lambda s, st: simulate_streaming(
        s, st, bg, lcfg, lrun, source=source, wind_fn=wf))
    outp = fn(lstate, lstatics)
    jax.block_until_ready(outp)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        outp = fn(lstate, lstatics)
        jax.block_until_ready(outp)
        best = min(best, time.perf_counter() - t0)
    print(json.dumps({
        "check": "lifecycle_1e6_auto_tile",
        "us_per_step": round(best / lrun.n_steps * 1e6, 2),
        "ray_steps_per_s": round(1_000_000 * lrun.n_steps / best, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
