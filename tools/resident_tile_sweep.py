"""Tile-height sweep for the VMEM-resident megakernel (the 1e5 metric of
record).  The resident kernel partitions its in-VMEM work into TILE_ROWS-row
tiles (64 since it landed); the streaming kernel's sweep showed large wins
from bigger tiles, so measure the same knob here.  Bigger resident tiles
halve the per-tile fixed work (window-bound reduction, stage glue, Kahan
update) but widen each tile's union span (more W-fallbacks) and grow the
static per-row unroll (3 branches x T rows).

Monkeypatches step_pallas.TILE_ROWS and clears jit caches between points
(tile_rows is derived inside the traced call, not a static arg).

Run:  nohup python tools/resident_tile_sweep.py > /tmp/res_tile.log 2>&1 &
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

import jax  # noqa: E402

from bench import _setup, DT  # noqa: E402
import msgwam_tpu as mt  # noqa: E402
import msgwam_tpu.ops.step_pallas as sp  # noqa: E402


def measure(n_ray: int, n_steps: int, tile_rows: int, w1: int = 24,
            w2: int = 0, reps: int = 3) -> dict:
    jax.clear_caches()
    sp.TILE_ROWS = tile_rows
    cfg, bg, state, statics = _setup(n_ray, "mega", "native", w2=w2, w1=w1)
    run = mt.RunConfig(dt=DT, n_steps=n_steps, save_every=n_steps)
    fn = jax.jit(lambda s, st: sp.simulate_resident(s, st, bg, cfg, run))
    t0 = time.perf_counter()
    out = fn(state, statics)
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(state, statics)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return {
        "n_ray": n_ray, "n_steps": n_steps, "tile_rows": tile_rows,
        "w1": w1, "w2": w2, "compile_s": round(compile_s, 1),
        "us_per_step": round(best / n_steps * 1e6, 2),
        "ray_steps_per_s": round(n_ray * n_steps / best, 1),
    }


def main():
    for t in (64, 128, 256):
        for w1 in (24, 32, 48):
            if t == 64 and w1 != 24:
                continue   # already measured in the W ladder
            try:
                r = measure(100_000, 2000, t, w1=w1)
            except Exception as e:
                r = {"n_ray": 100_000, "tile_rows": t, "w1": w1,
                     "error": str(e)[:160]}
            print(json.dumps(r), flush=True)
    # capacity point
    for t, w1 in ((128, 24), (128, 32)):
        try:
            r = measure(131_072, 2000, t, w1=w1)
        except Exception as e:
            r = {"n_ray": 131_072, "tile_rows": t, "w1": w1,
                 "error": str(e)[:160]}
        print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
