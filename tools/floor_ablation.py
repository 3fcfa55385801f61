"""Measured decomposition of the streaming megakernel's step-time floor.

The W-scaling fit (benchmarks/RESULTS.md: t(W) = 0.558 + 0.0104*W ms/step
at 1e6) says most of the step time is W-independent.  This tool separates
that floor into measured components by compile-time-stripping parts of the
per-tile work (``simulate_streaming(_ablate=...)``):

  full       - the production kernel
  nodeposit  - flux deposit (wmat build + MXU contraction + Kahan) removed
  noloop     - entire per-row loop removed (interp + deposit); leaves the
               elementwise physics, window-bound scan, RK3 updates, and
               the double-buffered DMA pipeline

  deposit cost = full - nodeposit
  interp cost  = nodeposit - noloop
  residual     = noloop  (DMA + physics + window scan + RK3 + pipeline)

Ablated runs produce physically wrong results; only times matter here.

Usage: python tools/floor_ablation.py [--n 1000000] [--steps 1000]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_disable_hlo_passes=while_loop_unroller"
).strip()

import numpy as np
import jax
import jax.numpy as jnp

import msgwam_tpu as mt
from msgwam_tpu.ops.step_pallas_stream import simulate_streaming


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--steps", type=int, default=1000)
    args = ap.parse_args()

    cfg = mt.REFERENCE_RUN_CONFIG.replace(
        saturate_online=True, dtype="float32",
        projection_backend="mxu", interp_backend="mxu")
    gc = mt.GridConfig()
    centers = gc.centers()
    uu = np.asarray(mt.velocities_sine_homogeneous(
        jnp.asarray(centers, jnp.float32), cfg)).astype(np.float32)
    vv = np.zeros_like(uu)
    bg = mt.make_background(gc, cfg, uu, vv, dtype=jnp.float32)
    rays, statics = mt.gaussian_spectrum_source(
        cfg, bg, args.n, z_launch=2000.0, dz_launch=500.0,
        amplitude_alpha=0.003, dtype=jnp.float32)
    state = mt.State(rays, mt.MeanState(jnp.asarray(uu), jnp.asarray(vv)))
    run = mt.RunConfig(dt=120.0, n_steps=args.steps, save_every=args.steps)

    times = {}
    for mode in ("full", "nodeposit", "noloop"):
        ab = "" if mode == "full" else mode
        f = jax.jit(lambda s, st, ab=ab: simulate_streaming(
            s, st, bg, cfg, run, _ablate=ab))
        jax.block_until_ready(f(state, statics))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(f(state, statics))
            best = min(best, time.perf_counter() - t0)
        times[mode] = best / args.steps * 1e3
        print(f"{mode:<10} {times[mode]:.4f} ms/step", flush=True)

    print(f"\nDecomposition at n={args.n}, {args.steps} steps/launch:")
    print(f"  flux deposit        {times['full'] - times['nodeposit']:.4f} ms/step")
    print(f"  shear/rho interp    {times['nodeposit'] - times['noloop']:.4f} ms/step")
    print(f"  residual floor      {times['noloop']:.4f} ms/step "
          f"(DMA + physics + window scan + RK3 + pipeline)")


if __name__ == "__main__":
    main()
