"""Height-windowed fused-RHS pallas kernel (the sorted fast path).

The full fused kernel (``rhs_pallas.py``) is VPU-roofline-bound on the
O(n_ray × n_cells) basis/weight construction: every 128-ray lane row builds
(c_pad, LANE) hat-basis and overlap-weight matrices spanning the *entire*
vertical grid, even though one ray volume only ever touches a handful of
cells (dr ≈ 250 m on a 1 km grid) and the interpolation hat has 2-cell
support.  When the ray buffer is (approximately) sorted by height, each
8192-ray block spans a narrow band of the grid, so the construction can be
restricted to a per-block window of ``W`` cells:

* the XLA prelude computes, per block, the union of every cell index the
  kernel will touch (interp queries at r and the saturation-extrapolated
  r_fin, the shear queries in face space, and the flux deposit span
  [nlow, nup)), takes the block min/max, and emits an 8-aligned window
  start ``win[b]``;
* the per-block shear/density tables are gathered to
  ``(n_blocks, 3·W, LANE)`` slabs (each window row broadcast across lanes),
  so the in-kernel interpolation is a (W, LANE) multiply + sublane
  reduction against the hat basis — ``c_pad/W`` × less VPU work than the
  full kernel's (c_pad, LANE) builds;
* the flux deposit contracts the windowed (W, LANE) weight matrix against
  the (8, LANE) flux-value rows on the MXU and Kahan-accumulates the
  (W, 8) partial into a transposed (c_pad, 8) VMEM accumulator at the
  dynamic (8-aligned) sublane offset ``win[b]`` — cells live on sublanes
  throughout, so nothing is ever relayouted (the v3 design rule);
* if *any* block's span exceeds ``W`` — rays unsorted, or drifted too far
  since the last sort — a ``lax.cond`` falls back to the full kernel for
  that step, so the windowed path is always-correct, never silently
  truncating (the fallback predicate is computed from the same index
  arithmetic the kernels use, ``lib/libprop.py:121-137``).

Sorting itself lives in :func:`msgwam_tpu.models.integrate.simulate`
(``sort_every``): the state is kept physically height-ordered with a
carried slot-identity permutation, so history frames and relaunch templates
keep the reference's per-slot semantics exactly.

Float32, ``hprop=False`` (same scope as the full fused kernel).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import ROT_EARTH
from .rhs_pallas import (
    LANE, SUBLANES, TILE, _ceil_to, _rhs_fused_call, prepare_inputs,
    _G0C, _DZ, _G0F, _DT, _BVF, _KAPPA, _F0,
)


def _kernel(
    params_ref, win_ref, tabs_ref,
    dens_ref, r_ref, dr_ref, k_ref, l_ref, m_ref, dm_ref, phi_ref,
    dkk_ref, dll_ref, area_ref, act_ref,
    dens_st_ref, drr_st_ref, dmm_st_ref, flux_ref,
    acc_ref, comp_ref, du_s, dv_s, rho_s,
    *, n_tab: int, n_flux_cells: int, c_pad: int, w_cells: int,
    saturate_online: bool, faithful: bool,
):
    i = pl.program_id(0)
    n_prog = pl.num_programs(0)
    g0c = params_ref[_G0C]
    dz = params_ref[_DZ]
    g0f = params_ref[_G0F]
    dt = params_ref[_DT]
    bvf = params_ref[_BVF]
    kappa = params_ref[_KAPPA]
    f0 = params_ref[_F0]
    W = w_cells

    win = win_ref[i]                       # 8-aligned window start (cells)

    @pl.when(i == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        comp_ref[:] = jnp.zeros_like(comp_ref)

    # --- tile-wise physics (identical to rhs_pallas._kernel) ---------------
    dens = dens_ref[:]
    r = r_ref[:]
    dr = dr_ref[:]
    k = k_ref[:]
    l = l_ref[:]
    m = m_ref[:]
    phi = phi_ref[:]
    dkk = dkk_ref[:]
    dll = dll_ref[:]
    area = area_ref[:]
    act = act_ref[:]

    ff = 2.0 * ROT_EARTH * jnp.sin(phi)
    kh2 = k * k + l * l
    k2 = kh2 + m * m
    om = jnp.sqrt((bvf * bvf * kh2 + ff * ff * m * m) / k2)
    cgr = -m * (om * om - ff * ff) / om / k2        # lib/libprop.py:434-448
    r_fin = r + cgr * dt                            # saturation extrapolation

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

    # --- window-local cell coordinates --------------------------------------
    w_i = jax.lax.broadcasted_iota(jnp.int32, (W, LANE), 0)
    col_i = w_i + win                               # global cell index
    col_f = col_i.astype(jnp.float32)
    gflo = g0c + col_f * dz
    gfhi = gflo + dz

    hi_c = g0c + (n_tab - 1.0) * dz
    hi_f = g0f + (n_tab - 2.0) * dz

    tabs = tabs_ref[0]                              # (3W, LANE)

    def hat(q):                                     # (1, LANE) -> (W, LANE)
        return jnp.maximum(0.0, 1.0 - jnp.abs(q - col_f))

    def interp(tab, B):                             # windowed mul + reduce
        return jnp.sum(tab * B, axis=0)             # (LANE,)

    # With hprop off the winds u, v themselves never enter any live tendency
    # (only the shears and ρ̄ do — models/rhs.py:109-114), so unlike the full
    # kernel no u/v interpolation is performed at all: 3 tables, not 5.
    for j in range(SUBLANES):
        rj = r_ref[j, :][None, :]                   # native lane row
        Bf = hat((jnp.clip(rj, g0f, hi_f) - g0f) / dz)
        du_s[j, :] = interp(tabs[0 * W:1 * W, :], Bf)
        dv_s[j, :] = interp(tabs[1 * W:2 * W, :], Bf)
        if saturate_online:
            rfj = r_fin[j, :][None, :]
            Br = hat((jnp.clip(rfj, g0c, hi_c) - g0c) / dz)
            rho_s[j, :] = interp(tabs[2 * W:3 * W, :], Br)

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
        )                                           # (W, LANE)
        fv8 = jnp.concatenate(
            [fvk[j, :][None, :], fvl[j, :][None, :],
             jnp.zeros((6, LANE), jnp.float32)], axis=0
        )                                           # (8, LANE)
        part = jax.lax.dot_general(
            wmat, fv8,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                           # (W, 8): cells on sublanes
        blk = blk + part                            # register accumulation

    # ONE Kahan update of the windowed sublane slice per 8192-ray block
    # (block partials + compensated combine = the 'compensated' accuracy
    # grade; a per-sublane update would serialize the loop through a
    # dynamic VMEM address — measured 2.6x slower)
    sl = pl.ds(win, W)
    y = blk - comp_ref[sl, :]
    t = acc_ref[sl, :] + y
    comp_ref[sl, :] = (t - acc_ref[sl, :]) - y
    acc_ref[sl, :] = t

    dmm_st = -(k * du_s[:] + l * dv_s[:])           # lib/libprop.py:519-520

    if saturate_online:
        m_fin = m + dmm_st * dt
        dmm_fin = area / dr
        omh = jnp.sqrt((bvf * bvf * kh2 + f0 * f0 * m * m) / k2)
        cap = (
            kappa * kappa * 0.5 * rho_s[:] * omh * bvf * bvf
            / (m_fin * m_fin) / (omh * omh - f0 * f0)
        )
        pvol = dkk * dll * dmm_fin
        cap_applied = cap if faithful else cap / pvol
        exceed = cap < dens * pvol
        dens_st = jnp.where(exceed, (cap_applied - dens) / dt, 0.0)
    else:
        dens_st = jnp.zeros_like(dens)

    amask = act > 0
    dens_st_ref[:] = jnp.where(amask, dens_st, 0.0)
    drr_st_ref[:] = jnp.where(amask, cgr, 0.0)
    dmm_st_ref[:] = jnp.where(amask, dmm_st, 0.0)

    @pl.when(i == n_prog - 1)
    def _():
        flux_ref[:] = acc_ref[:]


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_tab", "n_flux_cells", "w_cells",
        "saturate_online", "faithful", "interpret",
    ),
)
def _rhs_windowed_call(
    params, win, tabs,
    dens, r, dr, k, l, m, dm, phi, dkk, dll, area, act,
    n_tab: int, n_flux_cells: int, w_cells: int,
    saturate_online: bool, faithful: bool, interpret: bool,
):
    n_rows = r.shape[0]
    n_blocks = n_rows // SUBLANES
    c_pad = _ceil_to(max(n_tab, n_flux_cells), 128)
    kernel = functools.partial(
        _kernel, n_tab=n_tab, n_flux_cells=n_flux_cells, c_pad=c_pad,
        w_cells=w_cells,
        saturate_online=saturate_online, faithful=faithful,
    )
    row = pl.BlockSpec((SUBLANES, LANE), lambda i: (i, 0))
    outs = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),                # params
            pl.BlockSpec(memory_space=pltpu.SMEM),                # win
            pl.BlockSpec((1, 3 * w_cells, LANE), lambda i: (i, 0, 0)),
            row, row, row, row, row, row, row, row, row, row, row, row,
        ],
        out_specs=(
            row, row, row,
            pl.BlockSpec((c_pad, 8), lambda i: (0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_rows, LANE), jnp.float32),
            jax.ShapeDtypeStruct((n_rows, LANE), jnp.float32),
            jax.ShapeDtypeStruct((n_rows, LANE), jnp.float32),
            jax.ShapeDtypeStruct((c_pad, 8), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((c_pad, 8), jnp.float32),   # flux accumulator (cells on sublanes)
            pltpu.VMEM((c_pad, 8), jnp.float32),   # Kahan compensation
            pltpu.VMEM((SUBLANES, LANE), jnp.float32),
            pltpu.VMEM((SUBLANES, LANE), jnp.float32),
            pltpu.VMEM((SUBLANES, LANE), jnp.float32),
        ],
        interpret=interpret,
    )(params, win, tabs, dens, r, dr, k, l, m, dm, phi, dkk, dll, area, act)
    return outs


def _block_windows(fields, params, dims, w_cells: int):
    """Per-block window starts + validity, from the same index arithmetic
    the kernels use.  Returns ``(win (n_blocks,) int32 8-aligned, ok bool)``.
    Only active rays constrain the window (inactive slots are masked in the
    kernel, so garbage interp reads there are harmless)."""
    (dens, r, dr, k, l, m, dm, phi, dkk, dll, area, act) = fields
    n, n_tab, n_flux_cells, c_pad = dims
    g0c, dz, g0f, dt, bvf = params[_G0C], params[_DZ], params[_G0F], \
        params[_DT], params[_BVF]

    ff = 2.0 * ROT_EARTH * jnp.sin(phi)
    kh2 = k * k + l * l
    k2 = kh2 + m * m
    om = jnp.sqrt((bvf * bvf * kh2 + ff * ff * m * m) / k2)
    cgr = -m * (om * om - ff * ff) / om / k2
    r_fin = r + cgr * dt

    hi_c = g0c + (n_tab - 1.0) * dz
    hi_f = g0f + (n_tab - 2.0) * dz
    qf = (jnp.clip(r, g0f, hi_f) - g0f) / dz
    qr = (jnp.clip(r_fin, g0c, hi_c) - g0c) / dz

    nzmax = n_flux_cells - 1
    r_lo = r - 0.5 * dr
    r_up = r + 0.5 * dr
    nlow = jnp.clip((r_lo / dz).astype(jnp.int32), 0, nzmax)
    nup = jnp.clip((r_up / dz + 1.0).astype(jnp.int32), 0, nzmax)

    # hat(q) has support on cells (q-1, q+1); ±1 margin is exact
    qlo = jnp.floor(jnp.minimum(qf, qr)).astype(jnp.int32) - 1
    qhi = jnp.floor(jnp.maximum(qf, qr)).astype(jnp.int32) + 2
    lo = jnp.minimum(qlo, nlow)
    hi = jnp.maximum(qhi, nup)

    big = jnp.int32(2 ** 30)
    alive = act > 0
    lo = jnp.where(alive, lo, big)
    hi = jnp.where(alive, hi, -big)

    n_blocks = r.shape[0] // SUBLANES
    lo_b = jnp.min(lo.reshape(n_blocks, -1), axis=1)
    hi_b = jnp.max(hi.reshape(n_blocks, -1), axis=1)
    win = jnp.clip((lo_b // 8) * 8, 0, max(c_pad - w_cells, 0))
    ok = jnp.all(hi_b - win <= w_cells)
    return win, ok


def rhs_fused_windowed(dt, state, statics, bg, cfg):
    """Windowed fused-RHS entry point, drop-in for
    :func:`msgwam_tpu.ops.rhs_pallas.rhs_fused`: returns
    ``(ray_tendencies_dict, pm_interior)``.  Runs the W-cell windowed kernel
    when every 8192-ray block's touched-cell span fits the window (the
    height-sorted steady state), else falls back to the full kernel in the
    same jitted step via ``lax.cond`` — always correct, fast when sorted."""
    params, tables, fields, dims = prepare_inputs(dt, state, statics, bg, cfg)
    n, n_tab, n_flux_cells, c_pad = dims
    mean = state.mean

    w_cells = min(_ceil_to(max(cfg.window_cells, 16), 8), c_pad)
    win, ok = _block_windows(fields, params, dims, w_cells)

    # per-block windowed tables: row w of slab v broadcasts table_v[win+w]
    dz = bg.centers[1] - bg.centers[0]
    du_dz = (mean.u[1:] - mean.u[:-1]) / dz
    dv_dz = (mean.v[1:] - mean.v[:-1]) / dz

    def tab(x):
        x = x.astype(jnp.float32)
        return jnp.pad(x, (0, c_pad - x.shape[0]))

    idx = win[:, None] + jnp.arange(w_cells, dtype=win.dtype)[None, :]
    tabs = jnp.stack(
        [tab(du_dz)[idx], tab(dv_dz)[idx], tab(bg.rhobar)[idx]], axis=1,
    )                                              # (n_blocks, 3, W)
    tabs = jnp.broadcast_to(
        tabs.reshape(tabs.shape[0], 3 * w_cells, 1),
        (tabs.shape[0], 3 * w_cells, LANE),
    )

    interpret = jax.default_backend() != "tpu"
    common = dict(
        n_tab=n_tab, n_flux_cells=n_flux_cells,
        saturate_online=bool(cfg.saturate_online),
        faithful=bool(cfg.faithful_saturation),
        interpret=interpret,
    )

    def windowed(_):
        d, r_, m_, fluxT = _rhs_windowed_call(
            params, win, tabs, *fields, w_cells=w_cells, **common
        )
        return d, r_, m_, fluxT.T[:2, :n_flux_cells]

    def full(_):
        d, r_, m_, flux = _rhs_fused_call(params, tables, *fields, **common)
        return d, r_, m_, flux[:2, :n_flux_cells]

    dens_st, drr_st, dmm_st, pm_interior = jax.lax.cond(ok, windowed, full, None)
    unshape = lambda x: x.reshape(-1)[:n]
    tend = {
        "dens": unshape(dens_st),
        "r": unshape(drr_st),
        "m": unshape(dmm_st),
    }
    return tend, pm_interior
