"""Tile-height follow-ups for the two remaining streaming-kernel users:

(a) the one-launch ensemble (config 5: 8 members x 125k) — members pad to
    tile multiples, but the DMA pipeline streams all 1e6 rays, so the
    amortization argument may be total-size, not per-member-size;
(b) the in-kernel lifecycle at 1e5 (config 4: tidal+cull+relaunch) —
    streams 1e5 rays with extra lifecycle slabs.

Run:  nohup python tools/stream_tile_more.py > /tmp/stream_more.log 2>&1 &
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

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from bench import _setup, DT  # noqa: E402
import msgwam_tpu as mt  # noqa: E402
from msgwam_tpu.ops.step_pallas_stream import (  # noqa: E402
    simulate_streaming, simulate_streaming_ensemble)
from msgwam_tpu.models.backgrounds import tidal_shear  # noqa: E402


def bench_fn(fn, state, statics, n_ray, n_steps, reps=3, **tag):
    out = fn(state, statics)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(state, statics)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    r = {**tag, "us_per_step": round(best / n_steps * 1e6, 2),
         "ray_steps_per_s": round(n_ray * n_steps / best, 1)}
    print(json.dumps(r), flush=True)


def ensemble_case(tile_rows, n_steps=1000):
    cfg, bg, state, statics = _setup(125_000, "mega", "native", w2=96)
    E = 8
    bstate = jax.tree.map(lambda x: jnp.broadcast_to(x, (E,) + x.shape),
                          state)
    bstatics = jax.tree.map(lambda x: jnp.broadcast_to(x, (E,) + x.shape),
                            statics)
    run = mt.RunConfig(dt=DT, n_steps=n_steps, save_every=n_steps)
    fn = jax.jit(lambda s, st: simulate_streaming_ensemble(
        s, st, bg, cfg, run, tile_rows=tile_rows))
    bench_fn(fn, bstate, bstatics, E * 125_000, n_steps,
             case="ensemble_8x125k", tile_rows=tile_rows)


def lifecycle_case(tile_rows, n_steps=1000):
    cfg, bg, state, statics = _setup(100_000, "mega", "native", w2=0, w1=24)
    lcfg = cfg.replace(cull=True, relaunch=True,
                       m_max=2 * np.pi / 300.0, prognostic_mean=False)
    gc = mt.GridConfig()
    centers = jnp.asarray(gc.centers(), jnp.float32)
    rays, lstatics = mt.gaussian_spectrum_source(
        lcfg, bg, 100_000, z_launch=2000.0, dz_launch=500.0,
        amplitude_alpha=0.003, dtype=jnp.float32)
    lstate = mt.State(rays, mt.MeanState(
        jnp.zeros_like(centers), jnp.zeros_like(centers)))
    source = (rays, lstatics)
    wf = lambda t: (tidal_shear(centers, t, lcfg), jnp.zeros_like(centers))
    run = mt.RunConfig(dt=DT, n_steps=n_steps, save_every=n_steps)
    fn = jax.jit(lambda s, st: simulate_streaming(
        s, st, bg, lcfg, run, tile_rows=tile_rows,
        source=source, wind_fn=wf))
    bench_fn(fn, lstate, lstatics, 100_000, n_steps,
             case="lifecycle_1e5", tile_rows=tile_rows)


def main():
    for t in (64, 128, 256):
        try:
            ensemble_case(t)
        except Exception as e:
            print(json.dumps({"case": "ensemble_8x125k", "tile_rows": t,
                              "error": str(e)[:160]}), flush=True)
    for t in (64, 128):
        try:
            lifecycle_case(t)
        except Exception as e:
            print(json.dumps({"case": "lifecycle_1e5", "tile_rows": t,
                              "error": str(e)[:160]}), flush=True)


if __name__ == "__main__":
    main()
