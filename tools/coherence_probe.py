"""Probe: is window-fallback decoherence what holds the 1e5 metric of
record (~1.0ns/ray-step) above the 1e6 per-ray rate (~0.68ns/ray-step)?

At 1e5 rays one 8192-ray tile spans 8.2% of the launch m-spectrum, so the
spread of vertical group velocities *within a tile* is ~10x wider than at
1e6 — tiles decohere in z an order of magnitude sooner, and the adaptive
window (W=16) falls back to the exact full-width path (c_pad wide, ~8x
the deposit/interp work) for a growing fraction of tiles over an
8000-step launch (bench.py's metric-of-record horizon).

Two measurements, one process (axon relay: never spawn extra clients):

1. Launch-horizon curve at 1e5: whole-run resident launches of 1000 /
   2000 / 4000 / 8000 steps.  The *marginal* ms/step between consecutive
   horizons isolates the late-run (decohered) step cost from the early
   (coherent) cost, and `window_fallback_stats` at each end state gives
   the fallback fraction it corresponds to.
2. W sweep at the 8000-step horizon: if fallback dominates late steps, a
   wider window (W=32/48/64) trades a linear per-step cost
   (~0.0010*W ms at 1e5, scaled from the 1e6 fit in RESULTS.md) against
   the 8x fallback penalty and may win at the metric of record even
   though W=16 wins at 1e6x1000.

Prints one JSON line per measurement; run via
  nohup python tools/coherence_probe.py > /tmp/coherence_probe.log 2>&1 &
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
import jax.numpy as jnp  # noqa: E402

import msgwam_tpu as mt  # noqa: E402
from msgwam_tpu.diagnostics import window_fallback_stats  # noqa: E402
from msgwam_tpu.ops.step_pallas import simulate_resident  # noqa: E402

from bench import _setup, DT  # noqa: E402

N_RAY = 100_000


def emit(**kw):
    print(json.dumps(kw), flush=True)


def timed_launch(cfg, bg, state, statics, n_steps):
    run = mt.RunConfig(dt=DT, n_steps=n_steps, save_every=n_steps)
    fn = jax.jit(lambda s, st: simulate_resident(s, st, bg, cfg, run))
    out = fn(state, statics)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(state, statics)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best, out


def main():
    cfg, bg, state, statics = _setup(N_RAY, "mega", "native")
    wcfg = cfg.replace(rhs_backend="pallas",
                       window_cells=16)

    # 1. horizon curve (W = default 16)
    horizons = [1000, 2000, 4000, 8000]
    totals = {}
    for n in horizons:
        best, out = timed_launch(cfg, bg, state, statics, n)
        totals[n] = best
        st = window_fallback_stats(DT, out[0], out[1], bg, wcfg)
        emit(kind="horizon", n_steps=n, total_s=round(best, 4),
             us_per_step=round(best / n * 1e6, 2),
             ray_steps_per_s=round(N_RAY * n / best, 1),
             fallback_rate_end=round(float(st.fallback_rate), 4))
    for a, b in zip(horizons, horizons[1:]):
        emit(kind="marginal", steps=f"{a}-{b}",
             us_per_step=round((totals[b] - totals[a]) / (b - a) * 1e6, 2))

    # 2. W sweep at the 8000-step metric-of-record horizon
    for w in (16, 24, 32, 48, 64):
        cw = cfg.replace(window_cells=w)
        best, out = timed_launch(cw, bg, state, statics, 8000)
        st = window_fallback_stats(
            DT, out[0], out[1], bg, wcfg.replace(window_cells=w))
        emit(kind="wsweep", W=w, n_steps=8000,
             us_per_step=round(best / 8000 * 1e6, 2),
             ray_steps_per_s=round(N_RAY * 8000 / best, 1),
             fallback_rate_end=round(float(st.fallback_rate), 4))

    # 3. the same two questions at the 1e6 north-star point (streaming
    # kernel; shorter horizons — 1e6 decoheres ~10x slower per tile)
    cfg6, bg6, state6, statics6 = _setup(1_000_000, "mega", "native")
    wcfg6 = cfg6.replace(rhs_backend="pallas",
                         window_cells=16)
    totals6 = {}
    for n in (1000, 3000):
        best, out = timed_launch(cfg6, bg6, state6, statics6, n)
        totals6[n] = best
        st = window_fallback_stats(DT, out[0], out[1], bg6, wcfg6)
        emit(kind="horizon1e6", n_steps=n, total_s=round(best, 4),
             us_per_step=round(best / n * 1e6, 2),
             ray_steps_per_s=round(1_000_000 * n / best, 1),
             fallback_rate_end=round(float(st.fallback_rate), 4))
    emit(kind="marginal1e6", steps="1000-3000",
         us_per_step=round((totals6[3000] - totals6[1000]) / 2000 * 1e6, 2))
    for w in (24, 32):
        cw = cfg6.replace(window_cells=w)
        best, out = timed_launch(cw, bg6, state6, statics6, 3000)
        st = window_fallback_stats(
            DT, out[0], out[1], bg6, wcfg6.replace(window_cells=w))
        emit(kind="wsweep1e6", W=w, n_steps=3000,
             us_per_step=round(best / 3000 * 1e6, 2),
             ray_steps_per_s=round(1_000_000 * 3000 / best, 1),
             fallback_rate_end=round(float(st.fallback_rate), 4))


if __name__ == "__main__":
    main()
