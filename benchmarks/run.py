"""Benchmark harness reproducing SURVEY.md §6's table and the BASELINE.json
config ladder on the current default device.

Usage:
  python benchmarks/run.py                 # scaling table (configs 2-style)
  python benchmarks/run.py --configs      # BASELINE configs 0-4
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


def time_steps(cfg, bg, state, statics, n_steps=50, source=None,
               wind_fn=None):
    run = mt.RunConfig(dt=120.0, n_steps=n_steps, save_every=n_steps)
    f = jax.jit(lambda s, st: mt.simulate(s, st, bg, cfg, run, source=source,
                                          wind_fn=wind_fn))
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


# Nominal peaks of the bench chip, TPU v5 lite (v5e): HBM ~819 GB/s;
# VPU f32 ~(8 sublanes × 128 lanes × 4 ALUs × 0.94 GHz) ≈ 3.85e12 elem-ops/s.
PEAK_HBM_GBPS = float(os.environ.get("MSGWAM_PEAK_HBM_GBPS", "819"))
PEAK_VPU_OPS = float(os.environ.get("MSGWAM_PEAK_VPU_OPS", "3.85e12"))


def _state_bytes_per_step(n_ray, dtype):
    """Analytic per-step HBM floor: the 9 integrated ray fields + 4 statics
    read once per RK3 stage (3 stages), the 3 active tendencies written,
    and the RK3 q/y stage updates re-reading/re-writing the 3 active fields
    (~6 passes).  A lower bound, not an exact count."""
    itemsize = np.dtype(dtype).itemsize
    reads = 3 * (9 + 4) * n_ray * itemsize
    writes = 3 * 3 * n_ray * itemsize
    rk3 = 6 * 3 * n_ray * itemsize
    return reads + writes + rk3


def _vpu_ops_per_step(n_ray, n_cells=128):
    """Analytic per-step VPU element-op count of the fused algorithm: per
    ray per RHS evaluation, three hat-basis builds (4 ops × n_cells lanes
    each), the flux overlap-weight build (~8 ops × n_cells), and ~60
    elementwise physics ops; × 3 RK3 evaluations.  The MXU contractions are
    negligible FLOPs (~2·n·C·7 MACs/step ≈ 1% of a v5e MXU)."""
    per_ray_eval = (3 * 4 + 8) * n_cells + 60
    return 3 * per_ray_eval * n_ray


def roofline(backend, dtype, max_n=10_000_000):
    """Roofline table (VERDICT r1 item 3).

    The interesting result: after fusion this workload is **VPU-bound, not
    HBM-bound**.  The state is only ~13 floats/ray/stage (the HBM-floor
    column sits at ~10% of peak bandwidth), while the O(n_ray × n_cells)
    basis/weight construction — ~2600 VPU element-ops per ray per RHS
    evaluation — runs at 75-85% of the VPU's nominal element-op peak at
    1e6+ rays.  XLA's cost_analysis() 'bytes accessed' only counts
    executable-level I/O for a scanned computation, so both columns here
    are analytic models of the fused algorithm, not XLA counters.  The
    remaining headroom without changing the algorithm is therefore ≤1.3×;
    beyond that requires cutting the O(n_cells) factor (height-sorted ray
    blocks with windowed bases)."""
    cfg = mt.REFERENCE_RUN_CONFIG.replace(
        saturate_online=True, dtype=str(np.dtype(dtype)),
        projection_backend="mxu" if backend != "xla" else "xla",
        interp_backend="mxu" if backend != "xla" else "gather",
        rhs_backend="pallas" if backend == "pallas" else "xla",
    )
    print(f"# roofline — backend={backend}, dtype={np.dtype(dtype)}, "
          f"device={jax.devices()[0].device_kind}, "
          f"nominal peaks: HBM {PEAK_HBM_GBPS:.0f} GB/s, "
          f"VPU {PEAK_VPU_OPS:.2e} elem-ops/s")
    print(f"{'nray':>9} {'ms/step':>9} {'HBM-floor GB/s':>15} {'% HBM peak':>11} "
          f"{'VPU Tops/s':>11} {'% VPU peak':>11}")
    n = 100_000
    while n <= max_n:
        gc, bg, state, statics = build(cfg, n, dtype=dtype)
        per_step, compile_s = time_steps(cfg, bg, state, statics)
        floor_gbs = _state_bytes_per_step(n, dtype) / per_step / 1e9
        vpu = _vpu_ops_per_step(n) / per_step
        print(f"{n:>9} {per_step*1e3:>9.3f} {floor_gbs:>15.1f} "
              f"{100*floor_gbs/PEAK_HBM_GBPS:>10.1f}% {vpu/1e12:>11.2f} "
              f"{100*vpu/PEAK_VPU_OPS:>10.1f}%")
        n *= 10


def roofline_mega(steps_override=None, sorted_rows=False):
    """Roofline / MFU of the SHIPPED megakernel champions (VERDICT r4 #4)
    — the round-2 table above measured the then-current fused-RHS kernel;
    this measures the whole-run megakernels exactly as ``bench.py`` runs
    them (resident at 1e5, streaming at 1e6/1e7, champion windows,
    launch_sort auto) and models their two floors:

    * **HBM streaming floor** — the streaming kernel moves, per RK3 stage
      per ray, 6 mutable f32 slabs in + 6 out (dens/r/m and the RK3 q
      registers) plus 8 frozen read-only slabs: 80 B/ray/stage, 240
      B/ray/step.  The VMEM-resident kernel (≤131,072 rays) loads the
      state once per LAUNCH, so its per-step HBM traffic is ~0 and its
      floor is pure VPU.
    * **VPU floor** — the *windowed* useful-work model: per ray per RHS
      evaluation, basis/weight construction over the effective window
      ``W_eff`` (20 element-ops per touched cell: three 4-op hat-basis
      builds + the 8-op flux overlap weights) plus ~60 elementwise
      physics ops.  ``W_eff`` mixes the champion tiers by the MEASURED
      per-block rates (``diagnostics.window_fallback_stats``): blocks
      within W1 pay W1, the W1→W2 tail pays W2, full-fallback blocks pay
      the padded column count.  Rates drift over a run (coherence decay),
      so the model brackets with the start-of-run and end-of-run rates
      and reports the midpoint; the spread is shown.

    MFU-style utilization = useful-floor time / measured time; headroom
    = measured time / max(HBM floor, VPU floor).  Writes
    ``benchmarks/ROOFLINE_r05.json``.
    """
    import bench
    from msgwam_tpu.diagnostics import window_fallback_stats
    from msgwam_tpu.ops.rhs_pallas import resolve_champion, \
        resolve_window_cells
    from msgwam_tpu.ops.step_pallas_stream import _auto_tile_rows

    C_PAD = 128
    rows = []
    print(f"# megakernel roofline — device={jax.devices()[0].device_kind}, "
          f"nominal peaks: HBM {PEAK_HBM_GBPS:.0f} GB/s, "
          f"VPU {PEAK_VPU_OPS:.2e} elem-ops/s")
    print(f"{'nray':>9} {'ms/step':>9} {'HBM GB/s':>9} {'%HBM':>6} "
          f"{'W_eff':>11} {'VPU Tops/s':>11} {'%VPU':>6} {'headroom':>9}")
    if sorted_rows:
        # the round-5 sorted multi-launch champions (W2=48,
        # resolve_champion(sorted_multi_launch=True)): 1000-step launches
        # with boundary re-sorts; the end-of-run W_eff uses the INTERNAL
        # (sorted) layout's measured rates — that is the layout the
        # kernel iterates over
        rows_spec = ((1_000_000, 5000), (10_000_000, 3000))
    else:
        rows_spec = ((100_000, bench.N_STEPS),
                     (1_000_000, bench.N_STEPS_BIG),
                     (10_000_000, bench.N_STEPS_BIG))
    for n, steps in rows_spec:
        if steps_override:
            steps = steps_override
        if sorted_rows:
            r = bench.run_one(n, steps, "mega", fallback=True,
                              save_every=1000, launch_sort="on")
        else:
            r = bench.run_one(n, steps, "mega", fallback=True)
        t_step = n / r["value"]
        ch = resolve_champion(n, sorted_multi_launch=sorted_rows)
        cfg, bg, state, statics = bench._setup(
            n, "mega", "native", ch["window_cells2"], ch["window_cells"])
        wcfg = cfg
        W1, W2 = resolve_window_cells(wcfg, C_PAD)
        streaming = n > 131_072
        block_rows = _auto_tile_rows(n) if streaming else 0
        s0 = window_fallback_stats(bench.DT, state, statics, bg, wcfg,
                                   block_rows=block_rows)

        def w_eff(fb, full):
            if W2:
                return (1 - fb) * W1 + (fb - full) * W2 + full * C_PAD
            return (1 - fb) * W1 + fb * C_PAD

        we0 = w_eff(float(s0.fallback_rate), float(s0.full_rate))
        if sorted_rows:
            # internal (launch-sorted) layout rates: what the kernel saw
            we1 = w_eff(r.get("fallback_rate_end_internal", 0.0),
                        r.get("full_rate_end_internal", 0.0))
        else:
            we1 = w_eff(r.get("fallback_rate_end", 0.0),
                        r.get("full_rate_end",
                              r.get("fallback_rate_end", 0.0)))
        we = 0.5 * (we0 + we1)
        vpu_ops = 3 * n * (20 * we + 60)
        hbm_bytes = 240 * n if streaming else 0
        vpu = vpu_ops / t_step
        hbm = hbm_bytes / t_step / 1e9
        floor_t = max(vpu_ops / PEAK_VPU_OPS, hbm_bytes / (PEAK_HBM_GBPS * 1e9))
        row = {
            "n_ray": n, "ms_per_step": round(t_step * 1e3, 4),
            "kernel": "streaming" if streaming else "resident",
            "W1": W1, "W2": W2,
            "w_eff_start": round(we0, 1), "w_eff_end": round(we1, 1),
            "hbm_gbps": round(hbm, 1),
            "hbm_pct_peak": round(100 * hbm / PEAK_HBM_GBPS, 1),
            "vpu_tops": round(vpu / 1e12, 3),
            "vpu_pct_peak": round(100 * vpu / PEAK_VPU_OPS, 1),
            "headroom_x": round(t_step / floor_t, 2),
            "fallback_rate_start": round(float(s0.fallback_rate), 4),
            "fallback_rate_end": r.get("fallback_rate_end"),
            "full_rate_start": round(float(s0.full_rate), 4),
            "full_rate_end": r.get("full_rate_end"),
            "ray_steps_per_sec": r["value"],
        }
        rows.append(row)
        print(f"{n:>9} {t_step*1e3:>9.3f} {hbm:>9.1f} "
              f"{row['hbm_pct_peak']:>5.1f}% "
              f"{we0:>4.0f}->{we1:<4.0f} {vpu/1e12:>11.2f} "
              f"{row['vpu_pct_peak']:>5.1f}% {row['headroom_x']:>8.2f}x",
              flush=True)
        name = ("ROOFLINE_SORTED_r05.json" if sorted_rows
                else "ROOFLINE_r05.json")
        out = os.path.join(os.path.dirname(os.path.abspath(__file__)), name)
        with open(out, "w") as fjson:
            json.dump(rows, fjson, indent=1)
    print(f"wrote benchmarks/{name}")


def scaling_table(backend, dtype):
    cfg = mt.REFERENCE_RUN_CONFIG.replace(
        saturate_online=True, dtype=str(np.dtype(dtype)),
        projection_backend="xla" if backend == "xla" else "mxu",
        interp_backend="gather" if backend == "xla" else "mxu",
        rhs_backend="pallas" if backend == "pallas" else "xla",
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
    """The BASELINE.json config ladder 0-4 (labels = BASELINE.json
    configs[] indices)."""
    mk = lambda **kw: mt.REFERENCE_RUN_CONFIG.replace(
        dtype=str(np.dtype(dtype)),
        projection_backend="xla" if backend == "xla" else "mxu",
        interp_backend="gather" if backend == "xla" else "mxu",
        rhs_backend="pallas" if backend == "pallas" else "xla",
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

    # 3: 1e5 rays, transient shear + critical-level culling + relaunch
    cfg = mk(saturate_online=True, cull=True, relaunch=True,
             m_max=2 * np.pi / 300.0)
    gc, bg, state, statics = build(cfg, 100_000, dtype=dtype)
    source = mt.gaussian_spectrum_source(
        cfg, bg, 100_000, z_launch=2000.0, dz_launch=500.0,
        amplitude_alpha=0.003, dtype=dtype)
    rows.append(("3: 1e5 cull+relaunch", 100_000,
                 *time_steps(cfg, bg, state, statics, source=source)))

    # 4: 1e6-ray ensemble (8 members x 125k), full coupling
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
    rows.append(("4: 1e6 ensemble (8x125k)", 1_000_000, per_step, compile_s))

    print(f"# BASELINE config ladder — backend={backend}, dtype={np.dtype(dtype)}, "
          f"device={jax.devices()[0].device_kind}")
    print(f"{'config':<28} {'nray':>9} {'ms/step':>9} {'ray-steps/s':>13} {'vs ref':>8}")
    for name, n_ray, per_step, compile_s in rows:
        rs = n_ray / per_step
        print(f"{name:<28} {n_ray:>9} {per_step*1e3:>9.3f} {rs:>13.3e} "
              f"{rs/BASELINE_RAY_STEPS:>7.0f}x")


def _time_resident(cfg, bg, state, statics, n_steps=1000, source=None,
                   wind_fn=None):
    """Whole-run megakernel timing (resident <= 131k rays, streaming
    above or when the lifecycle is on) — per-step time over n_steps in
    ONE launch, so the tunneled backend's ~25 ms dispatch constant
    amortizes away."""
    from msgwam_tpu.ops.step_pallas import simulate_resident

    run = mt.RunConfig(dt=120.0, n_steps=n_steps, save_every=n_steps)
    f = jax.jit(lambda s, st: simulate_resident(s, st, bg, cfg, run,
                                                source=source,
                                                wind_fn=wind_fn))
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


def config_ladder_champion(dtype, n_steps=1000):
    """All five BASELINE configs (labels 0-4 = BASELINE.json configs[]
    indices) through the champion backend for each: the whole-run
    megakernel wherever its scope allows (0, 1, 2, 4 — one-launch
    member-partitioned for the ensemble), and the streaming megakernel's
    in-kernel lifecycle (cull + relaunch + transient tidal wind) for
    config 3."""
    from msgwam_tpu.models.backgrounds import tidal_shear

    # measured champion window for <=131k-class problems: W=24 (the W=16
    # default lets ~8% more blocks fall to the full-width path at these
    # sizes — benchmarks/WORKLIST_r03.jsonl); >=1e6 flat runs instead use
    # W=16 + window_cells2=96 (bench.py)
    mk = lambda **kw: mt.REFERENCE_RUN_CONFIG.replace(
        dtype=str(np.dtype(dtype)),
        projection_backend="mxu", interp_backend="mxu",
        **{"window_cells": 24, **kw})
    rows = []

    # 0: single packet, static U(z) — megakernel, offline saturation
    cfg = mk(saturate_online=False)
    gc, bg, state, statics = build(cfg, 60, source_kind="packet", dtype=dtype)
    rows.append(("0: packet, static bg (60)", 60, "mega",
                 *_time_resident(cfg, bg, state, statics, n_steps)))

    # 1: 1e3 spectrum, fixed background — megakernel
    cfg = mk(saturate_online=False)
    gc, bg, state, statics = build(cfg, 1000, dtype=dtype)
    rows.append(("1: 1e3 spectrum, fixed bg", 1000, "mega",
                 *_time_resident(cfg, bg, state, statics, n_steps)))

    # 2: 1e4 coupled — megakernel, online saturation
    cfg = mk(saturate_online=True)
    gc, bg, state, statics = build(cfg, 10_000, dtype=dtype)
    rows.append(("2: 1e4 coupled", 10_000, "mega",
                 *_time_resident(cfg, bg, state, statics, n_steps)))

    # 3: 1e5, transient tidal shear + critical-level cull + relaunch —
    # the streaming megakernel runs the whole lifecycle in-kernel
    # (cull → relaunch at each step boundary, imposed wind from a
    # per-step table); imposed wind => non-prognostic mean
    cfg = mk(saturate_online=True, cull=True, relaunch=True,
             m_max=2 * np.pi / 300.0, prognostic_mean=False)
    gc, bg, state, statics = build(cfg, 100_000, dtype=dtype)
    source = mt.gaussian_spectrum_source(
        cfg, bg, 100_000, z_launch=2000.0, dz_launch=500.0,
        amplitude_alpha=0.003, dtype=dtype)
    centers = jnp.asarray(gc.centers(), dtype)
    wf = lambda t: (tidal_shear(centers, t, cfg),
                    jnp.zeros_like(centers))
    rows.append(("3: 1e5 tidal+cull+relaunch", 100_000, "mega-stream",
                 *_time_resident(cfg, bg, state, statics, n_steps=n_steps,
                                 source=source, wind_fn=wf)))

    # 4: 1e6-ray ensemble, full coupling — the ENTIRE 8-member ensemble as
    # ONE streaming-megakernel launch: the tile range is partitioned among
    # members in-kernel (independent winds, shared sequential flux
    # accumulator), so the ensemble runs at full streaming throughput with
    # a single dispatch (was: 8 sequential per-member resident launches)
    cfg = mk(saturate_online=True)
    gc, bg, state, statics = build(cfg, 125_000, dtype=dtype)
    E = 8
    bstate = jax.tree.map(lambda x: jnp.broadcast_to(x, (E,) + x.shape),
                          state)
    bstatics = jax.tree.map(lambda x: jnp.broadcast_to(x, (E,) + x.shape),
                            statics)
    run = mt.RunConfig(dt=120.0, n_steps=n_steps, save_every=n_steps)
    f = jax.jit(lambda s, st: mt.simulate_streaming_ensemble(
        s, st, bg, cfg, run))
    t0 = time.perf_counter()
    jax.block_until_ready(f(bstate, bstatics))
    compile_s = time.perf_counter() - t0
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(f(bstate, bstatics))
        best = min(best, time.perf_counter() - t0)
    rows.append(("4: 1e6 ensemble (8x125k)", 1_000_000, "mega-ens",
                 best / n_steps, compile_s))

    print(f"# BASELINE config ladder (champion backends) — "
          f"dtype={np.dtype(dtype)}, device={jax.devices()[0].device_kind}, "
          f"{n_steps} steps/launch")
    print(f"{'config':<28} {'nray':>9} {'backend':<12} {'ms/step':>9} "
          f"{'ray-steps/s':>13} {'vs ref':>8}")
    out_rows = []
    for name, n_ray, backend, per_step, compile_s in rows:
        rs = n_ray / per_step
        print(f"{name:<28} {n_ray:>9} {backend:<12} {per_step*1e3:>9.3f} "
              f"{rs:>13.3e} {rs/BASELINE_RAY_STEPS:>7.0f}x")
        out_rows.append({"config": name, "n_ray": n_ray, "backend": backend,
                         "ms_per_step": round(per_step * 1e3, 4),
                         "ray_steps_per_sec": round(rs, 1),
                         "vs_baseline": round(rs / BASELINE_RAY_STEPS, 1),
                         "compile_s": round(compile_s, 1)})
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "CONFIGS_r04.json")
    with open(out, "w") as fjson:
        json.dump(out_rows, fjson, indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", action="store_true")
    ap.add_argument("--roofline", action="store_true")
    ap.add_argument("--roofline-mega", action="store_true",
                    help="roofline/MFU of the shipped whole-run megakernel "
                         "champions (VERDICT r4 #4) -> ROOFLINE_r05.json")
    ap.add_argument("--sorted", action="store_true",
                    help="with --roofline-mega: the sorted multi-launch "
                         "champions (W2=48, 1000-step launches) -> "
                         "ROOFLINE_SORTED_r05.json")
    ap.add_argument("--backend",
                    choices=["mxu", "xla", "pallas", "champion"],
                    default="mxu")
    ap.add_argument("--f64", action="store_true")
    ap.add_argument("--steps", type=int, default=1000)
    args = ap.parse_args()
    dtype = jnp.float64 if args.f64 else jnp.float32
    if args.f64:
        jax.config.update("jax_enable_x64", True)
    if args.roofline_mega:
        roofline_mega(args.steps if args.steps != 1000 else None,
                      sorted_rows=args.sorted)
    elif args.roofline:
        roofline(args.backend, dtype)
    elif args.configs and args.backend == "champion":
        config_ladder_champion(dtype, args.steps)
    elif args.configs:
        config_ladder(args.backend, dtype)
    else:
        scaling_table(args.backend, dtype)
