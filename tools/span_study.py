"""CPU study: per-tile touched-cell SPAN distribution over long launches.

The windowed kernels take the exact full-width path whenever an 8192-ray
tile's touched-cell span exceeds W — and the fallback rate grows as the
buffer decoheres (54% at 1e5 / 28% at 1e6 after 1000 steps).  Whether
that is worth fixing (tier-2 window, larger W) depends on the *span
distribution*, which is pure index math on the simulated state — so this
study runs entirely on CPU while the TPU answers come later from
tools/coherence_probe.py.

For each horizon it reports the fraction of tiles whose span fits
{16, 24, 32, 48, 64, 96} cells and the step cost implied by the measured
1e6 W-scaling fit t(W) = 0.558 + 0.0104*W ms (RESULTS.md):
per-tile cost = F_t + s_t * W_eff, where a W=16 tile pays W_eff=16, a
fallback tile pays W_eff=c_pad, and a two-tier design pays the smallest
tier that fits.  The "speedup" column is vs. the shipped W=16-only
design at the same horizon.

Run:  PYTHONPATH= JAX_PLATFORMS=cpu python tools/span_study.py [--big]
"""

import argparse
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

import msgwam_tpu as mt
from bench import _setup, DT

TIERS = (16, 24, 32, 48, 64, 96)
# measured at 1e6 / 123 tiles / W=16 (benchmarks/RESULTS.md W-scaling fit)
S_TILE = 0.0104 / 123.0        # ms per step per tile per window cell
F_TILE = 0.558 / 123.0         # W-independent ms per step per tile


def block_spans(dt, state, statics, bg, cfg):
    """Per-8192-ray-block window spans from the kernels' index math
    (the single shared mirror, diagnostics.block_window_bounds)."""
    from msgwam_tpu.diagnostics import block_window_bounds

    lo_b, hi_b, c_pad = block_window_bounds(dt, state, statics, bg, cfg)
    win = jnp.clip((lo_b.astype(jnp.int32) // 8) * 8, 0, 10 ** 9)
    span = hi_b - win.astype(jnp.float32)
    # all-inactive blocks have span -inf-ish; they take the windowed path
    return np.asarray(jnp.where(hi_b < lo_b, 0.0, span)), c_pad


def implied_cost(spans, c_pad, tiers):
    """ms/step implied by the W-scaling fit for a given tier ladder."""
    w_eff = np.full_like(spans, float(c_pad))
    for t in sorted(tiers, reverse=True):
        w_eff = np.where(spans <= t, float(t), w_eff)
    return float(np.sum(F_TILE + S_TILE * w_eff))


def study(n_ray, horizons, chunk):
    cfg, bg, state, statics = _setup(n_ray, "mega", "native")
    run = mt.RunConfig(dt=DT, n_steps=chunk, save_every=chunk)
    step = jax.jit(lambda s, st: mt.simulate(s, st, bg, cfg, run,
                                             validate=False))
    done = 0
    for h in horizons:
        while done < h:
            t0 = time.perf_counter()
            state, statics, _ = step(state, statics)
            jax.block_until_ready(state)
            done += chunk
            el = time.perf_counter() - t0
        spans, c_pad = block_spans(DT, state, statics, bg, cfg)
        fits = {t: round(float(np.mean(spans <= t)), 4) for t in TIERS}
        base = implied_cost(spans, c_pad, (16,))
        rows = {
            "W16_only_ms": round(base, 4),
            "tier_16_64_ms": round(implied_cost(spans, c_pad, (16, 64)), 4),
            "tier_16_48_ms": round(implied_cost(spans, c_pad, (16, 48)), 4),
            "W32_only_ms": round(implied_cost(spans, c_pad, (32,)), 4),
            "W48_only_ms": round(implied_cost(spans, c_pad, (48,)), 4),
        }
        speedups = {k.replace("_ms", "_speedup"): round(base / v, 3)
                    for k, v in rows.items() if k != "W16_only_ms"}
        print(json.dumps({
            "n_ray": n_ray, "steps": done,
            "span_q50": round(float(np.quantile(spans, 0.5)), 1),
            "span_q90": round(float(np.quantile(spans, 0.9)), 1),
            "span_max": round(float(np.max(spans)), 1),
            "fit_fraction": fits, **rows, **speedups,
            "chunk_wall_s": round(el, 1),
        }), flush=True)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--big", action="store_true", help="also run 1e6")
    args = ap.parse_args()
    study(100_000, (1000, 2000, 4000, 8000), 1000)
    if args.big:
        study(1_000_000, (1000, 3000), 1000)
