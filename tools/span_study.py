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
    """Per-8192-ray-block window spans, same index math as the kernels
    (mirrors diagnostics.window_fallback_stats but returns the spans)."""
    from msgwam_tpu.constants import ROT_EARTH
    from msgwam_tpu.ops.rhs_pallas import LANE, SUBLANES, prepare_inputs

    _p, _t, fields, dims = prepare_inputs(dt, state, statics, bg, cfg)
    _n, n_tab, n_flux_cells, c_pad = dims
    (dens, r, dr, k, l, m, dm, phi, dkk, dll, area, act) = fields
    g0c = bg.centers[0].astype(jnp.float32)
    dz = (bg.centers[1] - bg.centers[0]).astype(jnp.float32)
    g0f = bg.faces[1].astype(jnp.float32)
    hi_c = g0c + (n_tab - 1.0) * dz
    hi_f = g0f + (n_tab - 2.0) * dz
    nzmax_i = n_flux_cells - 1

    amask = act > 0
    ff = 2.0 * ROT_EARTH * jnp.sin(phi)
    kh2 = k * k + l * l
    k2 = kh2 + m * m
    om = jnp.sqrt((cfg.bvf * cfg.bvf * kh2 + ff * ff * m * m) / k2)
    cgr = -m * (om * om - ff * ff) / om / k2
    r_fin = r + cgr * jnp.float32(dt)
    nlow = jnp.clip(((r - 0.5 * dr) / dz).astype(jnp.int32), 0, nzmax_i)
    nup = jnp.clip(((r + 0.5 * dr) / dz + 1.0).astype(jnp.int32), 0, nzmax_i)
    qf_t = (jnp.clip(r, g0f, hi_f) - g0f) / dz
    qr_t = (jnp.clip(r_fin, g0c, hi_c) - g0c) / dz
    lo_t = jnp.minimum(jnp.minimum(jnp.floor(qf_t), jnp.floor(qr_t)) - 1.0,
                       nlow.astype(jnp.float32))
    hi_t = jnp.maximum(jnp.maximum(jnp.floor(qf_t), jnp.floor(qr_t)) + 2.0,
                       nup.astype(jnp.float32))
    lo_t = jnp.where(amask, lo_t, 1e9)
    hi_t = jnp.where(amask, hi_t, -1e9)
    n_blocks = r.shape[0] // SUBLANES
    lo_b = jnp.min(lo_t.reshape(n_blocks, SUBLANES * LANE), axis=1)
    hi_b = jnp.max(hi_t.reshape(n_blocks, SUBLANES * LANE), axis=1)
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
