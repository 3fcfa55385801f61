"""Streamed-tile-size sweep for the HBM-streaming megakernel.

``tile_rows`` (rays per streamed tile / 128) was fixed at 64 since the
kernel landed; it trades DMA/semaphore op count and per-tile fixed costs
(window-bound scan reductions, stage-table reads, branch scaffolding —
fewer, larger tiles amortize better) against window quality (merging a
height-coherent block with a dispersive one widens the union span, so
larger tiles should push more blocks onto the W2/full-width paths) and
double-buffer VMEM (4 * n_arr * tile_rows * 128 * 4 B).

Measures the 1e6 north-star point through the champion config (W=16,
W2=96) at tile_rows in {32, 64, 128, 256}, plus a 1e7 spot check at the
winner vs 64.  One JSON line per measurement.  Run:
  nohup python tools/tile_sweep.py > /tmp/tile_sweep.log 2>&1 &
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
from msgwam_tpu.ops.step_pallas_stream import simulate_streaming  # noqa: E402


def measure(n_ray: int, n_steps: int, tile_rows: int, w1: int = 0,
            w2: int = 96, reps: int = 3) -> dict:
    cfg, bg, state, statics = _setup(n_ray, "mega", "native", w2=w2, w1=w1)
    run = mt.RunConfig(dt=DT, n_steps=n_steps, save_every=n_steps)
    fn = jax.jit(lambda s, st: simulate_streaming(
        s, st, bg, cfg, run, tile_rows=tile_rows))
    out = fn(state, statics)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(state, statics)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return {
        "n_ray": n_ray, "n_steps": n_steps, "tile_rows": tile_rows,
        "w1": w1, "w2": w2,
        "us_per_step": round(best / n_steps * 1e6, 2),
        "ray_steps_per_s": round(n_ray * n_steps / best, 1),
    }


def main():
    for t in (32, 64, 128, 256):
        try:
            r = measure(1_000_000, 1000, t)
        except Exception as e:  # VMEM overflow at large tiles, etc.
            r = {"n_ray": 1_000_000, "tile_rows": t, "error": str(e)[:160]}
        print(json.dumps(r), flush=True)
    # spot-check the 1e7 headline at the non-default candidates
    for t in (128, 256):
        try:
            r = measure(10_000_000, 300, t)
        except Exception as e:
            r = {"n_ray": 10_000_000, "tile_rows": t, "error": str(e)[:160]}
        print(json.dumps(r), flush=True)
    print(json.dumps(measure(10_000_000, 300, 64)), flush=True)


if __name__ == "__main__":
    main()
