"""Section bisect of the windowed kernel: time variants with the interp
loop or flux loop disabled, and sweep W, to locate where the time goes.
Scratch tool; not part of the test suite."""
import os
import sys
import time
import functools

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_disable_hlo_passes=while_loop_unroller"
).strip()

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import msgwam_tpu as mt
from msgwam_tpu.constants import ROT_EARTH
from msgwam_tpu.ops import rhs_pallas as rp
from msgwam_tpu.ops import rhs_pallas_windowed as rw
from msgwam_tpu.ops.rhs_pallas import (
    LANE, SUBLANES, _G0C, _DZ, _G0F, _DT, _BVF, _KAPPA, _F0)

N_ITERS = 100


def kernel_var(
    params_ref, win_ref, tabs_ref,
    dens_ref, r_ref, dr_ref, k_ref, l_ref, m_ref, dm_ref, phi_ref,
    dkk_ref, dll_ref, area_ref, act_ref,
    dens_st_ref, drr_st_ref, dmm_st_ref, flux_ref,
    acc_ref, comp_ref, du_s, dv_s, rho_s,
    *, n_tab, n_flux_cells, c_pad, w_cells,
    do_interp, do_flux,
):
    i = pl.program_id(0)
    n_prog = pl.num_programs(0)
    g0c = params_ref[_G0C]; dz = params_ref[_DZ]; g0f = params_ref[_G0F]
    dt = params_ref[_DT]; bvf = params_ref[_BVF]; kappa = params_ref[_KAPPA]
    f0 = params_ref[_F0]
    W = w_cells
    win = win_ref[i]

    @pl.when(i == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        comp_ref[:] = jnp.zeros_like(comp_ref)

    dens = dens_ref[:]; r = r_ref[:]; dr = dr_ref[:]
    k = k_ref[:]; l = l_ref[:]; m = m_ref[:]; phi = phi_ref[:]
    dkk = dkk_ref[:]; dll = dll_ref[:]; area = area_ref[:]; act = act_ref[:]

    ff = 2.0 * ROT_EARTH * jnp.sin(phi)
    kh2 = k * k + l * l
    k2 = kh2 + m * m
    om = jnp.sqrt((bvf * bvf * kh2 + ff * ff * m * m) / k2)
    cgr = -m * (om * om - ff * ff) / om / k2
    r_fin = r + cgr * dt

    r_lo = r - 0.5 * dr
    r_up = r + 0.5 * dr
    nzmax = n_flux_cells - 1
    nlow_t = (r_lo / dz).astype(jnp.int32)
    nup_t = (r_up / dz + 1.0).astype(jnp.int32)
    ood = ((nlow_t >= nzmax) & (nup_t >= nzmax)) | ((nlow_t <= 0) & (nup_t <= 0))
    live_t = (act > 0) & ~ood
    pv = jnp.abs(dkk * dll * dm_ref[:])
    fv = cgr * dens / dz
    fvk = jnp.where(live_t, fv * k * pv, 0.0)
    fvl = jnp.where(live_t, fv * l * pv, 0.0)
    nlow_t = jnp.clip(nlow_t, 0, nzmax)
    nup_t = jnp.clip(nup_t, 0, nzmax)

    w_i = jax.lax.broadcasted_iota(jnp.int32, (W, LANE), 0)
    col_i = w_i + win
    col_f = col_i.astype(jnp.float32)
    gflo = g0c + col_f * dz
    gfhi = gflo + dz
    hi_c = g0c + (n_tab - 1.0) * dz
    hi_f = g0f + (n_tab - 2.0) * dz
    tabs = tabs_ref[0]

    def hat(q):
        return jnp.maximum(0.0, 1.0 - jnp.abs(q - col_f))

    def interp(tab, B):
        return jnp.sum(tab * B, axis=0)

    if do_interp:
        for j in range(SUBLANES):
            rj = r_ref[j, :][None, :]
            Bf = hat((jnp.clip(rj, g0f, hi_f) - g0f) / dz)
            du_s[j, :] = interp(tabs[0 * W:1 * W, :], Bf)
            dv_s[j, :] = interp(tabs[1 * W:2 * W, :], Bf)
            rfj = r_fin[j, :][None, :]
            Br = hat((jnp.clip(rfj, g0c, hi_c) - g0c) / dz)
            rho_s[j, :] = interp(tabs[2 * W:3 * W, :], Br)
    else:
        du_s[:] = jnp.zeros_like(du_s)
        dv_s[:] = jnp.zeros_like(dv_s)
        rho_s[:] = jnp.ones_like(rho_s)

    if do_flux:
        blk = jnp.zeros((W, 8), jnp.float32)
        for j in range(SUBLANES):
            rl = r_lo[j, :][None, :]
            ru = r_up[j, :][None, :]
            in_span = (col_i >= nlow_t[j, :][None, :]) \
                & (col_i < nup_t[j, :][None, :])
            wmat = jnp.where(
                in_span,
                jnp.abs(jnp.minimum(gfhi, ru) - jnp.maximum(gflo, rl)),
                0.0,
            )
            fv8 = jnp.concatenate(
                [fvk[j, :][None, :], fvl[j, :][None, :],
                 jnp.zeros((6, LANE), jnp.float32)], axis=0)
            part = jax.lax.dot_general(
                wmat, fv8,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            blk = blk + part
        sl = pl.ds(win, W)
        y = blk - comp_ref[sl, :]
        t = acc_ref[sl, :] + y
        comp_ref[sl, :] = (t - acc_ref[sl, :]) - y
        acc_ref[sl, :] = t

    dmm_st = -(k * du_s[:] + l * dv_s[:])
    m_fin = m + dmm_st * dt
    dmm_fin = area / dr
    omh = jnp.sqrt((bvf * bvf * kh2 + f0 * f0 * m * m) / k2)
    cap = (kappa * kappa * 0.5 * rho_s[:] * omh * bvf * bvf
           / (m_fin * m_fin) / (omh * omh - f0 * f0))
    pvol = dkk * dll * dmm_fin
    exceed = cap < dens * pvol
    dens_st = jnp.where(exceed, (cap - dens) / dt, 0.0)

    amask = act > 0
    dens_st_ref[:] = jnp.where(amask, dens_st, 0.0)
    drr_st_ref[:] = jnp.where(amask, cgr, 0.0)
    dmm_st_ref[:] = jnp.where(amask, dmm_st, 0.0)

    @pl.when(i == n_prog - 1)
    def _():
        flux_ref[:] = acc_ref[:]


def call_var(params, win, tabs, fields, n_tab, n_flux, c_pad, W,
             do_interp, do_flux):
    n_rows = fields[1].shape[0]
    n_blocks = n_rows // SUBLANES
    kernel = functools.partial(
        kernel_var, n_tab=n_tab, n_flux_cells=n_flux, c_pad=c_pad,
        w_cells=W, do_interp=do_interp, do_flux=do_flux)
    row = pl.BlockSpec((SUBLANES, LANE), lambda i: (i, 0))
    return pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 3 * W, LANE), lambda i: (i, 0, 0)),
            row, row, row, row, row, row, row, row, row, row, row, row,
        ],
        out_specs=(row, row, row, pl.BlockSpec((c_pad, 8), lambda i: (0, 0))),
        out_shape=(
            jax.ShapeDtypeStruct((n_rows, LANE), jnp.float32),
            jax.ShapeDtypeStruct((n_rows, LANE), jnp.float32),
            jax.ShapeDtypeStruct((n_rows, LANE), jnp.float32),
            jax.ShapeDtypeStruct((c_pad, 8), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((c_pad, 8), jnp.float32),
            pltpu.VMEM((c_pad, 8), jnp.float32),
            pltpu.VMEM((SUBLANES, LANE), jnp.float32),
            pltpu.VMEM((SUBLANES, LANE), jnp.float32),
            pltpu.VMEM((SUBLANES, LANE), jnp.float32),
        ],
    )(params, win, tabs, *fields)


def timeit(f, n=5):
    out = f(); jax.block_until_ready(out)
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        out = f(); jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best / N_ITERS


def main(n_ray=1_000_000):
    cfg = mt.REFERENCE_RUN_CONFIG.replace(
        saturate_online=True, dtype="float32",
        projection_backend="mxu", interp_backend="mxu", rhs_backend="pallas")
    gc = mt.GridConfig()
    centers = gc.centers()
    uu = np.asarray(mt.velocities_sine_homogeneous(
        jnp.asarray(centers, jnp.float32), cfg)).astype(np.float32)
    bg = mt.make_background(gc, cfg, uu, np.zeros_like(uu), dtype=jnp.float32)
    rays, statics = mt.gaussian_spectrum_source(
        cfg, bg, n_ray, z_launch=2000.0, dz_launch=500.0,
        amplitude_alpha=0.003, dtype=jnp.float32)
    r = np.sort(np.linspace(1.5e3, 12e3, n_ray).astype(np.float32))
    rays = rays._replace(r=jnp.asarray(r))
    state = mt.State(rays, mt.MeanState(jnp.asarray(uu),
                                        jnp.zeros_like(jnp.asarray(uu))))
    params, tables, fields, dims = rp.prepare_inputs(
        120.0, state, statics, bg, cfg)
    n, n_tab, n_flux, c_pad = dims

    dz = bg.centers[1] - bg.centers[0]
    du_dz = (state.mean.u[1:] - state.mean.u[:-1]) / dz
    dv_dz = (state.mean.v[1:] - state.mean.v[:-1]) / dz
    tabf = lambda x: jnp.pad(x.astype(jnp.float32), (0, c_pad - x.shape[0]))

    def scanned(call):
        @jax.jit
        def many(r_rows):
            def body(rr, _):
                f2 = fields[:1] + (rr,) + fields[2:]
                out = call(f2)
                return rr + 1e-9 * out[1], None
            r_rows, _ = jax.lax.scan(body, r_rows, None, length=N_ITERS)
            return r_rows
        return lambda: many(fields[1])

    for W in (16, 24, 32, 48):
        win, ok = rw._block_windows(fields, params, dims, W)
        idx = win[:, None] + jnp.arange(W, dtype=win.dtype)[None, :]
        tabs = jnp.stack([tabf(du_dz)[idx], tabf(dv_dz)[idx],
                          tabf(bg.rhobar)[idx]], axis=1)
        tabs = jnp.broadcast_to(
            tabs.reshape(tabs.shape[0], 3 * W, 1),
            (tabs.shape[0], 3 * W, LANE))
        tabs = jax.device_put(tabs)
        for di, dfl, label in ((True, True, "both"), (True, False, "interp"),
                               (False, True, "flux"), (False, False, "none")):
            t = timeit(scanned(lambda f2, W=W, di=di, dfl=dfl, tabs=tabs,
                               win=win: call_var(
                params, win, tabs, f2, n_tab, n_flux, c_pad, W, di, dfl)))
            print(f"W={W:3d} {label:7s} {t*1e3:.3f} ms")


if __name__ == "__main__":
    main()
