"""Microbenchmark: windowed vs full fused kernel in isolation on TPU.

Times (a) the raw pallas calls with pre-built inputs, (b) the full
rhs_fused / rhs_fused_windowed wrappers including the XLA prelude
(window computation + table gather), on a height-sorted state.
"""
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
from msgwam_tpu.ops import rhs_pallas as rp
from msgwam_tpu.ops import rhs_pallas_windowed as rw


N_ITERS = 100


def timeit(f, *a, n=5):
    """Per-iteration time of f scanned N_ITERS times in one dispatch (the
    axon TPU tunnel costs ~25 ms per dispatch, so single calls only measure
    the tunnel)."""
    out = f(*a)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        out = f(*a)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best / N_ITERS


def main(n_ray):
    cfg = mt.REFERENCE_RUN_CONFIG.replace(
        saturate_online=True, dtype="float32",
        projection_backend="mxu", interp_backend="mxu",
        rhs_backend="pallas",
    )
    gc = mt.GridConfig()
    centers = gc.centers()
    uu = np.asarray(
        mt.velocities_sine_homogeneous(jnp.asarray(centers, jnp.float32), cfg)
    ).astype(np.float32)
    bg = mt.make_background(gc, cfg, uu, np.zeros_like(uu), dtype=jnp.float32)
    rays, statics = mt.gaussian_spectrum_source(
        cfg, bg, n_ray, z_launch=2000.0, dz_launch=500.0,
        amplitude_alpha=0.003, dtype=jnp.float32,
    )
    # spread over ~10 km like a matured run, then sort
    r = np.linspace(1.5e3, 12e3, n_ray).astype(np.float32)
    rays = rays._replace(r=jnp.asarray(np.sort(r)))
    state = mt.State(rays, mt.MeanState(jnp.asarray(uu), jnp.zeros_like(jnp.asarray(uu))))

    params, tables, fields, dims = rp.prepare_inputs(120.0, state, statics, bg, cfg)
    n, n_tab, n_flux, c_pad = dims
    w_cells = 24
    win, ok = rw._block_windows(fields, params, dims, w_cells)
    print("n_blocks:", win.shape, "ok:", bool(ok), "win[:6]:", np.asarray(win)[:6])

    common = dict(n_tab=n_tab, n_flux_cells=n_flux,
                  saturate_online=True, faithful=True, interpret=False)

    def scanned(call):
        """Repeat `call` N_ITERS times inside one jit, threading the height
        rows through the r-tendency so iterations can't be deduplicated."""
        @jax.jit
        def many(r_rows):
            def body(r, _):
                f2 = fields[:1] + (r,) + fields[2:]
                out = call(f2)
                return r + 1e-9 * out[1], None
            r_rows, _ = jax.lax.scan(body, r_rows, None, length=N_ITERS)
            return r_rows
        return lambda: many(fields[1])

    t_full = timeit(scanned(
        lambda f2: rp._rhs_fused_call(params, tables, *f2, **common)))

    dz = bg.centers[1] - bg.centers[0]
    du_dz = (state.mean.u[1:] - state.mean.u[:-1]) / dz
    dv_dz = (state.mean.v[1:] - state.mean.v[:-1]) / dz
    tabf = lambda x: jnp.pad(x.astype(jnp.float32), (0, c_pad - x.shape[0]))
    idx = win[:, None] + jnp.arange(w_cells, dtype=win.dtype)[None, :]
    tabs = jnp.stack([tabf(du_dz)[idx], tabf(dv_dz)[idx], tabf(bg.rhobar)[idx]], axis=1)
    tabs = jnp.broadcast_to(
        tabs.reshape(tabs.shape[0], 3 * w_cells, 1),
        (tabs.shape[0], 3 * w_cells, rw.LANE),
    )
    tabs = jax.device_put(tabs)

    t_win = timeit(scanned(
        lambda f2: rw._rhs_windowed_call(
            params, win, tabs, *f2, w_cells=w_cells, **common)))

    def scanned_state(fn):
        @jax.jit
        def many(s):
            def body(s, _):
                tend, _flux = fn(s)
                rays = s.rays._replace(r=s.rays.r + 1e-9 * tend["r"])
                return s._replace(rays=rays), None
            s, _ = jax.lax.scan(body, s, None, length=N_ITERS)
            return s
        return lambda: many(state)

    t_wrap = timeit(scanned_state(lambda s: rw.rhs_fused_windowed(
        120.0, s, statics, bg, cfg.replace(window_cells=24))))
    t_wrap_full = timeit(scanned_state(
        lambda s: rp.rhs_fused(120.0, s, statics, bg, cfg)))

    print(f"n_ray={n_ray:.0e}  raw full: {t_full*1e3:.3f} ms   "
          f"raw windowed: {t_win*1e3:.3f} ms")
    print(f"             wrapped full: {t_wrap_full*1e3:.3f} ms   "
          f"wrapped windowed(+prelude): {t_wrap*1e3:.3f} ms")


if __name__ == "__main__":
    for n in (100_000, 1_000_000):
        main(n)
