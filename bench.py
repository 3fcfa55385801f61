"""Benchmark: the metric of record (BASELINE.json) — ray-volume steps per
second per chip at 1e5 rays with full wave/mean-flow coupling and online
saturation, on the default device (TPU).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the NumPy reference measured at ~3.0e4 ray-steps/s on one CPU core
(BASELINE.md).

Flags (the driver runs the default; extra configurations for humans/CI):
  --backend {mega,mxu,pallas,pallasw,xla}  compute path (default mega: the
                               VMEM-resident whole-run megakernel, fastest at
                               the 1e5 metric of record; >131072 rays falls
                               back to pallas, the 1e6 champion; pallasw =
                               height-windowed fused kernel)
  --accum {native,compensated,f64}  flux accumulation (mxu backend)
  --sharded                    shard_map over all visible devices
  --n-ray N / --steps N        problem size
  --all                        run the full backend matrix, one JSON line each
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# scan compile time scales with trip count unless the unroller is off
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_disable_hlo_passes=while_loop_unroller"
).strip()

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import msgwam_tpu as mt  # noqa: E402
from msgwam_tpu.utils.xla import enable_persistent_compile_cache  # noqa: E402

N_RAY = 100_000
# The tunneled TPU backend costs ~21-25 ms per dispatch (measured by
# varying --steps: total = C + n*s).  At the megakernel's ~0.1 ms/step
# that still inflates a 1000-step launch ~20%, so the metric of record
# runs 8000 steps in ONE whole-run kernel launch (measured plateau:
# 1000→8000 steps took 119→101 us/step at 1e5).  Sizes >=1e6 (>=0.7
# ms/step) keep 1000 steps, where the dispatch is <3.5%.
N_STEPS = 8000
N_STEPS_BIG = 1000
# HBM-ceiling matrix row: largest streamed ray count that fits one
# v5-lite chip (16 GB HBM); peak footprint recorded in the row itself
# (benchmarks/BENCH_MATRIX.json, round 5)
CEILING_N_RAY = 50_000_000
DT = 120.0
BASELINE_RAY_STEPS_PER_SEC = 3.0e4


def _setup(n_ray: int, backend: str, accum: str, w2: int = 0,
           w1: int = 0, alpha: float = 0.003, hprop: bool = False,
           sat: str = "online"):
    cfg = mt.REFERENCE_RUN_CONFIG.replace(
        saturate_online=(sat == "online"),
        hprop=hprop,
        dtype="float32",
        projection_backend="xla" if backend == "xla" else "mxu",
        interp_backend="gather" if backend == "xla" else "mxu",
        rhs_backend="pallas" if backend in ("pallas", "pallasw") else "xla",
        # window width: one source of truth — the ModelConfig auto
        # sentinel (-1: the scan path resolves it to its 16-cell floor);
        # "pallas" = the plain full-width fused kernel (window_cells=0)
        window_cells=(w1 or (-1 if backend == "pallasw" else 0)),
        flux_accum=accum if backend == "mxu" else "native",
        window_cells2=w2,
    )
    gc = mt.GridConfig()
    centers = gc.centers()
    uu = np.asarray(
        mt.velocities_sine_homogeneous(jnp.asarray(centers, jnp.float32), cfg)
    ).astype(np.float32)
    vv = np.zeros_like(uu)
    bg = mt.make_background(gc, cfg, uu, vv, dtype=jnp.float32)
    rays, statics = mt.gaussian_spectrum_source(
        cfg, bg, n_ray,
        z_launch=2000.0, dz_launch=500.0,
        amplitude_alpha=alpha,  # default keeps total forcing physical at 1e5
        dtype=jnp.float32,
    )
    state = mt.State(rays, mt.MeanState(jnp.asarray(uu), jnp.asarray(vv)))
    return cfg, bg, state, statics


def run_one(n_ray: int = N_RAY, n_steps: int = N_STEPS,
            backend: str = "mega", accum: str = "native",
            sharded: bool = False, fallback: bool = False,
            w2: int = 0, w1: int = 0, save_every: int = 0,
            launch_sort: str = "auto", hprop: bool = False,
            sat: str = "online") -> dict:
    if hprop and backend in ("pallas", "pallasw", "mega"):
        # the pallas kernel family scopes to hprop=False (frozen
        # positions/horizontal wavenumbers); spherical propagation runs
        # through the scan backends — see the scope matrix in RESULTS.md
        raise ValueError(
            f"--hprop requires --backend mxu or xla (the {backend!r} "
            "kernels scope to hprop=False)")
    if backend == "mega" and sharded:
        # the megakernel family is single-chip; the sharded path runs the
        # adaptive-window fused-RHS kernel per shard
        backend = "pallasw"
    if backend == "mega" and not w1 and not w2:
        # per-size champion windows from the library's measured ladder
        # (ops/rhs_pallas.py:resolve_champion — VERDICT r3 #3: bench reads
        # the table, it no longer owns it); resolved to concrete values
        # here so the fallback diagnostics below mirror the actual run.
        # Mirror the streaming driver's launch-sort auto rule so sorted
        # multi-launch runs pick the narrower W2=48 champion
        from msgwam_tpu.ops.rhs_pallas import resolve_champion
        from msgwam_tpu.ops.step_pallas_stream import LAUNCH_SORT_MIN

        multi = bool(save_every) and save_every < n_steps
        sort_on = (launch_sort == "on"
                   or (launch_sort == "auto" and n_ray >= LAUNCH_SORT_MIN
                       and multi))
        ch = resolve_champion(n_ray,
                              sorted_multi_launch=multi and sort_on)
        w1, w2 = ch["window_cells"], ch["window_cells2"]
    cfg, bg, state, statics = _setup(n_ray, backend, accum, w2, w1,
                                     hprop=hprop, sat=sat)
    run = mt.RunConfig(dt=DT, n_steps=n_steps,
                       save_every=save_every or n_steps)
    # launch-boundary height re-sort (streaming megakernel): auto = the
    # library rule (on >= LAUNCH_SORT_MIN rays); on/off force it for the
    # sorted-vs-unsorted matrix rows
    ls = {"auto": None, "on": True, "off": False}[launch_sort]

    want_perm = False
    if sharded:
        from msgwam_tpu.parallel.sharding import make_mesh, sharded_simulate

        mesh = make_mesh()
        n_dev = mesh.devices.size
        if n_ray % n_dev:
            capacity = -(-n_ray // n_dev) * n_dev
            rays, statics = mt.pad_rays(state.rays, statics, capacity)
            state = mt.State(rays, state.mean)
        step_fn = lambda s, st: sharded_simulate(mesh, s, st, bg, cfg, run)
    elif backend == "mega":
        want_perm = bool(fallback and ls is True and n_ray > 131_072)
        if want_perm:
            # sorted streaming runs: fetch the final slot permutation too,
            # so the fallback diagnostic below also runs on the INTERNAL
            # (launch-sorted) layout the kernel actually iterated over —
            # the returned slot order has the launch-sort-OFF coherence
            # (VERDICT r4 #5)
            from msgwam_tpu.ops.step_pallas_stream import simulate_streaming

            step_fn = jax.jit(lambda s, st: simulate_streaming(
                s, st, bg, cfg, run, launch_sort=True,
                return_final_perm=True))
        else:
            from msgwam_tpu.ops.step_pallas import simulate_resident

            step_fn = jax.jit(lambda s, st: simulate_resident(
                s, st, bg, cfg, run, launch_sort=ls))
    else:
        # pallasw relies on launch-order height coherence (no sorting: XLA's
        # TPU sort costs 150-250 ms at 1e6 rays, ~100x the whole step)
        step_fn = jax.jit(lambda s, st: mt.simulate(s, st, bg, cfg, run))

    t0 = time.perf_counter()
    out = step_fn(state, statics)  # compile + warm-up
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0

    def _time_reps():
        nonlocal out
        b = float("inf")
        for _ in range(3):
            # free the previous output set before allocating the next one:
            # at 1e5 this is immaterial, but near the HBM ceiling keeping
            # two output sets live alongside the input state is the
            # difference between fitting and ResourceExhausted
            out = None
            t0 = time.perf_counter()
            out = step_fn(state, statics)
            jax.block_until_ready(out)
            b = min(b, time.perf_counter() - t0)
        return b, out

    best, out = _time_reps()
    retimed = False
    if n_ray * n_steps / best > 1e11:
        # tunneled-TPU relay flake: a rep returned ~instantly once (a 1e6
        # mxu row measured 2.9e12 ray-steps/s, 6000x its two neighboring
        # runs); no real backend is within 30x of 1e10, so re-time once
        print(f"implausible timing ({best:.2e}s for {n_steps} steps); "
              "re-timing", file=sys.stderr)
        best, out = _time_reps()
        retimed = True

    final_state = out[0]
    assert bool(jnp.all(jnp.isfinite(final_state.mean.u))), "wind blew up"
    if hasattr(final_state, "rays"):
        assert bool(jnp.all(jnp.isfinite(final_state.rays.dens))), "dens blew up"

    ray_steps_per_sec = n_ray * n_steps / best
    label = backend + ("+" + accum if accum != "native" else "") \
        + ("+sharded" if sharded else "") + ("+hprop" if hprop else "") \
        + (f"+w1={w1}" if w1 else "") + (f"+w2={w2}" if w2 else "") \
        + (f"+sort={launch_sort}" if launch_sort != "auto" else "") \
        + (f"+save={save_every}" if save_every else "")
    result = {
        "metric": f"ray-volume steps/sec/chip at {n_ray:,} rays "
                  f"(coupled, {sat} saturation, f32, {label})",
        "value": round(ray_steps_per_sec, 1),
        "unit": "ray-steps/s",
        "vs_baseline": round(ray_steps_per_sec / BASELINE_RAY_STEPS_PER_SEC, 1),
    }
    try:
        peak = jax.local_devices()[0].memory_stats()["peak_bytes_in_use"]
        result["peak_hbm_gb"] = round(peak / 2**30, 2)
    except (AttributeError, KeyError, TypeError):
        pass
    if n_ray >= 20_000_000:
        # HBM-ceiling rows: record the cost of standing the run up too
        result["compile_s"] = round(compile_s - best, 1)
        # the axon tunnel's memory_stats() returns None, so the peak
        # footprint cannot be read; record the analytic streaming-kernel
        # model instead (distinct n-sized f32 buffers: 9 input ray fields
        # + 4 statics + 8 frozen slabs + 3 aliased working + 3 RK3 q regs
        # + dens_prop + 4 single-frame history slabs ~= 32/ray), bracketed
        # empirically by fit/OOM probes — benchmarks/RESULTS.md round 5
        result["hbm_model_gb"] = round(32 * 4 * n_ray / 2**30, 2)
    if retimed:
        # a relay flake triggered a re-time; if even the second pass is
        # implausible, say so in the artifact instead of reporting it as real
        result["retimed"] = True
        if ray_steps_per_sec > 1e11:
            result["suspect_timing"] = True
    if fallback and backend in ("pallasw", "mega") and not sharded:
        # window-coherence observability: what fraction of 8192-ray blocks
        # would run the exact full-width path at the END of this run (the
        # windowed kernels silently stay exact; this makes the perf-mode
        # degradation visible — see diagnostics.window_fallback_stats)
        from msgwam_tpu.diagnostics import window_fallback_stats

        wcfg = cfg if cfg.window_cells else cfg.replace(
            rhs_backend="pallas", window_cells=-1)  # auto -> 16-cell floor
        # (wcfg inherits window_cells2 from cfg, so the full_rate below
        # reflects the tier actually benchmarked)
        block_rows = 0
        if backend == "mega" and n_ray > 131_072:
            # the streaming kernel auto-scales its tile height; mirror it
            from msgwam_tpu.ops.step_pallas_stream import _auto_tile_rows

            block_rows = _auto_tile_rows(n_ray)
        s = window_fallback_stats(DT, out[0], out[1], bg, wcfg,
                                  block_rows=block_rows)
        result["fallback_rate_end"] = round(float(s.fallback_rate), 4)
        if wcfg.window_cells2:
            result["full_rate_end"] = round(float(s.full_rate), 4)
        if want_perm:
            # the rate on the layout the sorted kernel actually SAW at run
            # end (1 boundary sort + save_every steps of drift) — measured,
            # not inferred from the slot order (VERDICT r4 #5)
            from msgwam_tpu.diagnostics import internal_ray_layout

            ist, istat = internal_ray_layout(out[0], out[1], out[3])
            si = window_fallback_stats(DT, ist, istat, bg, wcfg,
                                       block_rows=block_rows)
            result["fallback_rate_end_internal"] = \
                round(float(si.fallback_rate), 4)
            if wcfg.window_cells2:
                result["full_rate_end_internal"] = \
                    round(float(si.full_rate), 4)
    return result


def run_grad(n_ray: int, n_steps: int = 100, remat: bool = True,
             alpha_scale: float = 1.0, backend: str = "mxu") -> dict:
    """Adjoint benchmark (VERDICT r3 #2): time ``jax.grad`` of a
    wind-response loss through the fully coupled run (scan path — the
    pallas kernels' custom VJPs route their backward here anyway) and
    report the backward:forward ratio plus device peak memory.

    ``remat=True`` (the production setting) uses ``simulate(remat=True)``
    with ``save_every ~ sqrt(n_steps)``: the backward stores one state
    snapshot per block instead of per step (~50 MB/step at 1e6 rays —
    an OOM a few hundred steps in without it).

    The source amplitude is normalized so TOTAL wave action is the same
    at every ray count (alpha ~ 1/sqrt(n_ray); per-ray dens ~ alpha^2 and
    all rays share one launch layer, so total forcing ~ n_ray * alpha^2):
    finer ray discretizations of the SAME physical wave field.  Without
    this, 1e6 rays = 10x the physical forcing, the coupled wind feedback
    blows the forward up within ~100 steps, and the gradient is Inf — a
    physics fact about over-forcing, not a numerics bug (measured: loss
    94 -> 1.4e5 between steps 50 and 100 at 1e6, unnormalized).

    ``alpha_scale`` further scales the launch amplitude for LONG-horizon
    rows: at the default forcing the adjoint of the saturation-coupled
    system grows ~x2/step once strong breaking sets in (~step 120;
    measured, tools/grad_blowup_probe.py + benchmarks/RESULTS.md round
    5), so a 720-step gradient overflows even in f64 — a property of the
    linearized physics (thresholded breaking + wind feedback), not of
    the implementation (the 100-step gradient is FD-validated,
    tests/test_autodiff.py).  Full-day rows run at ``alpha_scale=0.1``
    (1% of default forcing power), where the day-long linearization
    stays bounded; the timing is forcing-independent.  Non-finite
    gradients are recorded as ``"gradient_finite": false`` in the row —
    a measured outcome, not a harness failure."""
    alpha = 0.003 * alpha_scale * min(1.0, (1e5 / n_ray) ** 0.5)
    cfg, bg, state, statics = _setup(n_ray, backend, "native", alpha=alpha)
    save = max(1, round(n_steps ** 0.5))
    while n_steps % save:
        save -= 1
    run = mt.RunConfig(dt=DT, n_steps=n_steps, save_every=save)
    u0 = state.mean.u
    observe = lambda s, st, aux: s.mean.u  # O(n_cell) history only

    def loss(dens0):
        s = state._replace(rays=state.rays._replace(dens=dens0))
        final, _, _ = mt.simulate(s, statics, bg, cfg, run,
                                  observe=observe, remat=remat,
                                  validate=False)
        return jnp.sum((final.mean.u - u0) ** 2)

    fwd = jax.jit(loss)
    grad = jax.jit(jax.grad(loss))

    def _time(fn, arg):
        out = fn(arg)  # compile + warm-up
        jax.block_until_ready(out)
        b = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = fn(arg)
            jax.block_until_ready(out)
            b = min(b, time.perf_counter() - t0)
        return b, out

    t_fwd, _ = _time(fwd, state.rays.dens)
    t_grad, g = _time(grad, state.rays.dens)
    finite = bool(jnp.all(jnp.isfinite(g)))
    gmax = float(jnp.max(jnp.where(jnp.isfinite(g), jnp.abs(g), 0.0)))
    if finite:
        assert gmax > 0.0, "gradient identically zero"
    try:
        peak = jax.local_devices()[0].memory_stats()["peak_bytes_in_use"]
    except (AttributeError, KeyError, TypeError):
        peak = None
    rs = n_ray * n_steps / t_grad
    result = {
        "metric": f"adjoint (value+grad) ray-steps/sec at {n_ray:,} rays "
                  f"(coupled run, {n_steps} steps, "
                  f"remat={remat if isinstance(remat, str) else ('on' if remat else 'off')})",
        "value": round(rs, 1),
        "unit": "ray-steps/s",
        "vs_baseline": round(rs / BASELINE_RAY_STEPS_PER_SEC, 1),
        "forward_s": round(t_fwd, 4),
        "grad_s": round(t_grad, 4),
        "bwd_fwd_ratio": round(t_grad / t_fwd, 2),
        "gradient_finite": finite,
        "grad_max_abs": gmax,
    }
    if alpha_scale != 1.0:
        result["alpha_scale"] = alpha_scale
    if peak is not None:
        result["peak_hbm_gb"] = round(peak / 2**30, 2)
    return result


def run_matrix(n_steps: int = N_STEPS) -> list:
    """Multi-size, multi-backend matrix (VERDICT r2 #8): the metric of
    record (1e5), the north-star operating point (1e6), the VMEM
    capacity boundary (131072), and the 1e7 scale headline, each through
    its champion backends, with window-fallback observability where it
    applies."""
    rows = []
    # >=1e6 rows use the shorter launch (dispatch cost is <3.5% there);
    # scale it with --steps so smoke invocations stay small everywhere
    big = max(1, round(N_STEPS_BIG * n_steps / N_STEPS))
    for n_ray, backend, steps, kw in [
        (100_000, "mega", n_steps, {}),  # metric of record, VMEM-resident
        (100_000, "pallasw", n_steps, {}),
        (131_072, "mega", n_steps, {}),  # resident-kernel capacity point
        (1_000_000, "mega", big, {}),    # north star, HBM-streaming
        (1_000_000, "pallasw", big, {}),
        (1_000_000, "mxu", big, {}),
        (10_000_000, "mega", big, {}),   # scale headline, 256-row tiles
        # launch-boundary height re-sort (VERDICT r3 #1): multi-launch
        # long runs, sorted vs unsorted, with end-of-run fallback rates.
        # Sorted rows report BOTH layouts: fallback_rate_end on the
        # returned slot order (= the unsorted kernel's coherence) and
        # fallback_rate_end_internal on the layout the sorted kernel
        # actually iterated over (final perm applied — VERDICT r4 #5).
        (1_000_000, "mega", 5 * big,
         dict(save_every=big, launch_sort="off")),
        (1_000_000, "mega", 5 * big,
         dict(save_every=big, launch_sort="on")),
        (10_000_000, "mega", 3 * big,
         dict(save_every=big, launch_sort="off")),
        (10_000_000, "mega", 3 * big,
         dict(save_every=big, launch_sort="on")),
        # spherical horizontal propagation (VERDICT r3 #7): hprop runs
        # through the scan backends (the pallas kernel family scopes to
        # hprop=False); the hprop-off mxu rows above/below are the delta
        (100_000, "mxu", n_steps, {}),
        (100_000, "mxu", n_steps, dict(hprop=True)),
        (1_000_000, "mxu", big, dict(hprop=True)),
        # HBM-ceiling demonstration (VERDICT r3 #6): the largest streamed
        # point that fits one chip, with peak footprint recorded
        (CEILING_N_RAY, "mega", big, {}),
    ]:
        try:
            rows.append(run_one(n_ray, steps, backend, fallback=True, **kw))
        except Exception as e:  # noqa: BLE001 — a ResourceExhausted on the
            # ceiling row must not discard the 15 rows before it (ADVICE r4)
            rows.append({
                "metric": f"{backend} at {n_ray:,} rays ({steps} steps)",
                "error": f"{type(e).__name__}: {str(e)[:300]}",
            })
        print(json.dumps(rows[-1]), flush=True)
        _write_matrix(rows)  # incremental: the artifact survives any crash
    return rows


def _write_matrix(rows) -> str:
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "benchmarks", "BENCH_MATRIX.json")
    tmp = out + ".tmp"
    with open(tmp, "w") as f:
        json.dump(rows, f, indent=1)
    os.replace(tmp, out)
    return out


def main(n_ray: int = N_RAY, n_steps: int = N_STEPS):
    """Driver entry point: ONE JSON line — the metric of record, plus the
    north-star 1e6 operating point as an embedded extra measurement so the
    driver artifact evidences both (VERDICT r2 #8)."""
    # whole-run kernel launches compile in tens of seconds; reruns of the
    # same configuration hit the on-disk cache (MSGWAM_COMPILE_CACHE=off to
    # disable).  Called here, not at import, so `--help`/argparse errors
    # never force TPU backend initialization (ADVICE r3).
    enable_persistent_compile_cache()
    result = run_one(n_ray, n_steps)
    if n_ray >= N_RAY:  # skip the 1e6 extra for tiny smoke-test sizes
        try:
            extra = run_one(1_000_000, N_STEPS_BIG, "mega", fallback=True)
            result["extra"] = [extra]
        except Exception as e:  # metric of record must still be reported
            result["extra_error"] = str(e)[:200]
    print(json.dumps(result))


def cli(argv=None):
    """Flag-driven entry point (also reachable as
    ``python -m msgwam_tpu bench <flags>``)."""
    ap = argparse.ArgumentParser(prog="bench.py")
    ap.add_argument("--backend",
                    choices=["mega", "mxu", "pallas", "pallasw", "xla"],
                    default="mega")
    ap.add_argument("--accum", choices=["native", "compensated", "f64"],
                    default="native")
    ap.add_argument("--sharded", action="store_true")
    ap.add_argument("--n-ray", type=int, default=N_RAY)
    ap.add_argument("--steps", type=int, default=N_STEPS)
    ap.add_argument("--w1", type=int, default=0,
                    help="first window width override (window_cells)")
    ap.add_argument("--w2", type=int, default=0,
                    help="second window tier (window_cells2; 0 = off)")
    ap.add_argument("--all", action="store_true",
                    help="run the backend matrix (one JSON line per entry)")
    ap.add_argument("--matrix", action="store_true",
                    help="multi-size matrix (1e5/131k/1e6) -> "
                         "benchmarks/BENCH_MATRIX.json")
    ap.add_argument("--fallback", action="store_true",
                    help="report the window-fallback rate at run end "
                         "(pallasw/mega backends)")
    ap.add_argument("--save-every", type=int, default=0,
                    help="kernel-launch window (steps per launch; 0 = one "
                         "whole-run launch).  Multi-launch runs exercise "
                         "the launch-boundary height re-sort")
    ap.add_argument("--launch-sort", choices=["auto", "on", "off"],
                    default="auto",
                    help="streaming megakernel launch-boundary height "
                         "re-sort (auto = library rule)")
    ap.add_argument("--grad", action="store_true",
                    help="adjoint benchmark: jax.grad through the coupled "
                         "run at --n-ray (default 100 steps; any explicit "
                         "--steps overrides, e.g. 720 = a simulated day)")
    ap.add_argument("--hprop", action="store_true",
                    help="spherical horizontal propagation on (scan "
                         "backends only: --backend mxu or xla; the pallas "
                         "kernel family scopes to hprop=False)")
    ap.add_argument("--sat", choices=["online", "offline"], default="online",
                    help="saturation mode: online (inside the RHS, the "
                         "perf default) or offline (the reference quirk-2 "
                         "between-steps finite-difference pass)")
    ap.add_argument("--grad-remat", choices=["auto", "on", "full", "off"],
                    default="auto",
                    help="jax.checkpoint remat for --grad: full (= auto) is "
                         "per-block + per-step — required at 1e6 rays "
                         "(85 GB HBM without) AND 4.2x faster even at 1e5 "
                         "(ratio 4.61 vs 19.76: the block backward is "
                         "bandwidth-bound on 99-wide residuals); on = "
                         "per-block only, off = none (OOMs at 1e6 beyond "
                         "a few hundred steps)")
    ap.add_argument("--grad-alpha-scale", type=float, default=1.0,
                    help="launch-amplitude scale for --grad long-horizon "
                         "rows: at the default forcing the adjoint of the "
                         "saturation-coupled run grows ~2x/step past "
                         "~step 120 and overflows (measured — RESULTS.md "
                         "round 5); 0.1 keeps a full simulated day "
                         "bounded")
    args = ap.parse_args(argv)
    enable_persistent_compile_cache()  # after parsing: --help stays cheap
    if args.grad:
        # --steps is honored when given (720/1440-step full-length adjoint
        # rows, VERDICT r4 #3); the bare default (8000, sized for the
        # forward megakernel) drops to the 100-step adjoint default
        steps = args.steps if args.steps != N_STEPS else 100
        remat = args.grad_remat
        if remat == "auto":
            remat = "full"  # measured fastest at every size (see --help)
        # --backend pallasw runs the adjoint's forwards (primal + the two
        # remat replays) through the fused windowed kernel — measured
        # +26% end-to-end at 1e6 (the custom-vjp backward transposes the
        # equivalent XLA path either way); mega has no scan-path grad,
        # so the default maps to the mxu reference path
        gbackend = args.backend if args.backend in ("mxu", "xla",
                                                    "pallasw") else "mxu"
        print(json.dumps(run_grad(args.n_ray, steps,
                                  remat={"on": True, "off": False}.get(
                                      remat, remat),
                                  alpha_scale=args.grad_alpha_scale,
                                  backend=gbackend)))
    elif args.matrix:
        run_matrix(args.steps)  # writes BENCH_MATRIX.json incrementally
        print("wrote benchmarks/BENCH_MATRIX.json", file=sys.stderr)
    elif args.all:
        if args.hprop:
            raise SystemExit("--all runs fixed backends; use explicit "
                             "--backend mxu --hprop instead")
        for backend, accum in [("mega", "native"), ("mxu", "native"),
                               ("mxu", "compensated"),
                               ("pallas", "native"), ("pallasw", "native"),
                               ("xla", "native")]:
            print(json.dumps(run_one(args.n_ray, args.steps, backend, accum,
                                     sat=args.sat)))
    elif (args.backend == "mega" and args.accum == "native"
          and not args.sharded and not args.fallback and not args.w2
          and not args.w1 and not args.save_every and not args.hprop
          and args.sat == "online" and args.launch_sort == "auto"
          and args.n_ray == N_RAY and args.steps == N_STEPS):
        # bare `python bench.py` (the driver invocation): metric of record
        # plus the embedded 1e6 north-star measurement
        main(args.n_ray, args.steps)
    else:
        print(json.dumps(run_one(args.n_ray, args.steps, args.backend,
                                 args.accum, args.sharded, args.fallback,
                                 w2=args.w2, w1=args.w1,
                                 save_every=args.save_every,
                                 launch_sort=args.launch_sort,
                                 hprop=args.hprop, sat=args.sat)))


if __name__ == "__main__":
    cli()
