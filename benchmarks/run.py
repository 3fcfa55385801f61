"""Benchmark harness reproducing SURVEY.md §6's table and the BASELINE.json
config ladder on the current default device.

Usage:
  python benchmarks/run.py                 # scaling table (configs 2-style)
  python benchmarks/run.py --configs      # BASELINE configs 0-5
  python benchmarks/run.py --backend xla  # parity backends instead of mxu

Reference anchor (BASELINE.md, 1 CPU core): 3.36 ms/step @ 60 rays,
33.4 ms @ 1e3, 334 ms @ 1e4, ~3.0e4 ray-steps/s plateau.
"""

import argparse
import json
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

BASELINE_RAY_STEPS = 3.0e4


def build(cfg, n_ray, source_kind="spectrum", dtype=jnp.float32, u_amp=True):
    gc = mt.GridConfig()
    centers = gc.centers()
    uu = np.asarray(
        mt.velocities_sine_homogeneous(jnp.asarray(centers, dtype), cfg)
    ).astype(dtype)
    if not u_amp:
        uu = np.zeros_like(uu)
    vv = np.zeros_like(uu)
    bg = mt.make_background(gc, cfg, uu, vv, dtype=dtype)
    if source_kind == "packet":
        rays, statics = mt.wave_packet_ic(gc, cfg, bg, n_ray=n_ray, dtype=dtype)
    else:
        rays, statics = mt.gaussian_spectrum_source(
            cfg, bg, n_ray, z_launch=2000.0, dz_launch=500.0,
            amplitude_alpha=0.003, dtype=dtype,
        )
    state = mt.State(rays, mt.MeanState(jnp.asarray(uu), jnp.asarray(vv)))
    return gc, bg, state, statics


def time_steps(cfg, bg, state, statics, n_steps=50, source=None):
    run = mt.RunConfig(dt=120.0, n_steps=n_steps, save_every=n_steps)
    f = jax.jit(lambda s, st: mt.simulate(s, st, bg, cfg, run, source=source))
    t0 = time.perf_counter()
    out = f(state, statics)
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = f(state, statics)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best / n_steps, compile_s


def scaling_table(backend, dtype):
    cfg = mt.REFERENCE_RUN_CONFIG.replace(
        saturate_online=True, dtype=str(np.dtype(dtype)),
        projection_backend="mxu" if backend == "mxu" else "xla",
        interp_backend="mxu" if backend == "mxu" else "gather",
    )
    print(f"# scaling table — backend={backend}, dtype={np.dtype(dtype)}, "
          f"device={jax.devices()[0].device_kind}")
    print(f"{'nray':>9} {'ms/step':>9} {'ray-steps/s':>13} {'vs ref':>9} {'compile s':>10}")
    for n_ray in (60, 1_000, 10_000, 100_000, 1_000_000):
        gc, bg, state, statics = build(cfg, n_ray, dtype=dtype)
        per_step, compile_s = time_steps(cfg, bg, state, statics)
        rs = n_ray / per_step
        print(f"{n_ray:>9} {per_step*1e3:>9.3f} {rs:>13.3e} {rs/BASELINE_RAY_STEPS:>8.0f}x {compile_s:>10.1f}")


def config_ladder(backend, dtype):
    """The BASELINE.json config ladder 0-5."""
    mk = lambda **kw: mt.REFERENCE_RUN_CONFIG.replace(
        dtype=str(np.dtype(dtype)),
        projection_backend="mxu" if backend == "mxu" else "xla",
        interp_backend="mxu" if backend == "mxu" else "gather",
        **kw,
    )
    rows = []

    # 0: single packet, static U(z), no feedback (feedback off via zero wind)
    cfg = mk(saturate_online=False)
    gc, bg, state, statics = build(cfg, 60, source_kind="packet", dtype=dtype)
    rows.append(("0: packet, static bg (60)", 60, *time_steps(cfg, bg, state, statics)))

    # 1: 1e3 rays Gaussian spectrum, fixed background, flux diagnostics only
    cfg = mk(saturate_online=False)
    gc, bg, state, statics = build(cfg, 1000, dtype=dtype)
    rows.append(("1: 1e3 spectrum, fixed bg", 1000, *time_steps(cfg, bg, state, statics)))

    # 2: 1e4 rays, interactive coupling
    cfg = mk(saturate_online=True)
    gc, bg, state, statics = build(cfg, 10_000, dtype=dtype)
    rows.append(("2: 1e4 coupled", 10_000, *time_steps(cfg, bg, state, statics)))

    # 3/4: 1e5 rays, transient shear + critical-level culling + relaunch
    cfg = mk(saturate_online=True, cull=True, relaunch=True,
             m_max=2 * np.pi / 300.0)
    gc, bg, state, statics = build(cfg, 100_000, dtype=dtype)
    source = mt.gaussian_spectrum_source(
        cfg, bg, 100_000, z_launch=2000.0, dz_launch=500.0,
        amplitude_alpha=0.003, dtype=dtype)
    rows.append(("4: 1e5 cull+relaunch", 100_000,
                 *time_steps(cfg, bg, state, statics, source=source)))

    # 5: 1e6-ray ensemble (8 members x 125k), full coupling
    cfg = mk(saturate_online=True)
    gc, bg, state, statics = build(cfg, 125_000, dtype=dtype)
    from msgwam_tpu.parallel import ensemble_simulate
    E = 8
    bstate = jax.tree.map(lambda x: jnp.broadcast_to(x, (E,) + x.shape), state)
    bstatics = jax.tree.map(lambda x: jnp.broadcast_to(x, (E,) + x.shape), statics)
    run = mt.RunConfig(dt=120.0, n_steps=20, save_every=20)
    seq = len(jax.devices()) < E   # vmap defeats fusion; see ensemble.py
    t0 = time.perf_counter()
    out = ensemble_simulate(bstate, bstatics, bg, cfg, run, sequential=seq)
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = ensemble_simulate(bstate, bstatics, bg, cfg, run, sequential=seq)
    jax.block_until_ready(out)
    per_step = (time.perf_counter() - t0) / run.n_steps
    rows.append(("5: 1e6 ensemble (8x125k)", 1_000_000, per_step, compile_s))

    print(f"# BASELINE config ladder — backend={backend}, dtype={np.dtype(dtype)}, "
          f"device={jax.devices()[0].device_kind}")
    print(f"{'config':<28} {'nray':>9} {'ms/step':>9} {'ray-steps/s':>13} {'vs ref':>8}")
    for name, n_ray, per_step, compile_s in rows:
        rs = n_ray / per_step
        print(f"{name:<28} {n_ray:>9} {per_step*1e3:>9.3f} {rs:>13.3e} "
              f"{rs/BASELINE_RAY_STEPS:>7.0f}x")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", action="store_true")
    ap.add_argument("--backend", choices=["mxu", "xla"], default="mxu")
    ap.add_argument("--f64", action="store_true")
    args = ap.parse_args()
    dtype = jnp.float64 if args.f64 else jnp.float32
    if args.f64:
        jax.config.update("jax_enable_x64", True)
    if args.configs:
        config_ladder(args.backend, dtype)
    else:
        scaling_table(args.backend, dtype)
