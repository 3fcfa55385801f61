"""Adaptive height-windowed fused-RHS pallas kernel (streaming, any size).

Second-generation windowed design, carrying over the megakernel's measured
lessons (ops/step_pallas.py): the per-block window is computed **inside the
kernel** from the block's own touched-cell bounds, and a block whose span
outgrows the window falls back — per block, inside the same kernel — to
the exact full-width path.  This replaces round-2's first windowed design
(XLA-prelude window computation + whole-step ``lax.cond`` fallback), whose
per-eval prelude cost more than the windows saved.

Per 8192-ray block (grid step):

* the streamed (64, LANE) ray-field blocks arrive via BlockSpecs (no
  dynamic addressing anywhere — fully static 64-row unrolls);
* elementwise physics, then the block's window ``[win, win+W)`` from the
  same index arithmetic as the projection (``lib/libprop.py:121-137``),
  inactive rays excluded;
* windowed branch: (W, LANE) hat-basis interpolation of du/dz, dv/dz (and
  ρ̄ at the saturation-extrapolated height) against a (c_pad, 8) column
  table sliced at ``win``; flux deposit as (W, LANE)×(8, LANE) MXU
  contractions accumulated in registers, ONE Kahan-compensated update of
  the transposed (c_pad, 8) accumulator per block;
* fallback branch: identical structure at full width (c_pad rows) — still
  exact, just slower; consecutive source slots are height-coherent, so
  coherent workloads stay windowed with **no sorting** (XLA's TPU sort
  costs 150-250 ms at 1e6 rays, ~100× the step — measured round 2).

Scope: ``hprop=False``, float32 (same as the full fused kernel); selected
with ``cfg.rhs_backend="pallas"`` + ``cfg.window_cells > 0``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import ROT_EARTH
from .rhs_pallas import (
    LANE, SUBLANES, _ceil_to, prepare_inputs, resolve_window_cells,
    _G0C, _DZ, _G0F, _DT, _BVF, _KAPPA, _F0,
)

# staged-mode scalar slots (appended to the 8 shared ones)
_CC, _BC, _FIRST = 8, 9, 10


def _kernel(
    params_ref, tabs_ref,
    dens_ref, r_ref, dr_ref, k_ref, l_ref, m_ref,
    pv_ref, ff2_ref, kh2_ref, pvb_ref, act_ref,
    *rest,
    n_tab: int, n_flux_cells: int, c_pad: int, w_cells: int,
    w2_cells: int,
    saturate_online: bool, faithful: bool, staged: bool = False,
):
    if staged:
        (qd_ref, qr_ref, qm_ref,
         dens_st_ref, drr_st_ref, dmm_st_ref, flux_ref,
         qdo_ref, qro_ref, qmo_ref, acc_ref, comp_ref) = rest
    else:
        (dens_st_ref, drr_st_ref, dmm_st_ref, flux_ref,
         acc_ref, comp_ref) = rest
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
    T = SUBLANES

    @pl.when(i == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        comp_ref[:] = jnp.zeros_like(comp_ref)

    # --- block-wise physics -------------------------------------------------
    dens = dens_ref[:]
    r = r_ref[:]
    dr = dr_ref[:]
    k = k_ref[:]
    l = l_ref[:]
    m = m_ref[:]
    act = act_ref[:]
    amask = act > 0

    # ff^2, k^2+l^2 and the phase volume are run constants (hprop off),
    # precomputed once in XLA and hoisted out of the step scan
    ff2 = ff2_ref[:]
    kh2 = kh2_ref[:]
    k2 = kh2 + m * m
    # one reciprocal + one rsqrt instead of 3 divides + 1 sqrt per ray
    # (lib/libprop.py:434-448 algebra unchanged; divides/sqrts retire at a
    # fraction of VPU mul throughput)
    om2 = (bvf * bvf * kh2 + ff2 * m * m) * (1.0 / k2)
    cgr = -m * (om2 - ff2) * jax.lax.rsqrt(om2) * (1.0 / k2)
    r_fin = r + cgr * dt

    idz = 1.0 / dz                     # scalar; hoisted by the compiler
    r_lo = r - 0.5 * dr
    r_up = r + 0.5 * dr
    nzmax_i = n_flux_cells - 1
    nlow = (r_lo * idz).astype(jnp.int32)
    nup = (r_up * idz + 1.0).astype(jnp.int32)
    ood = ((nlow >= nzmax_i) & (nup >= nzmax_i)) | ((nlow <= 0) & (nup <= 0))
    live = amask & ~ood
    pv = pv_ref[:]
    fv = cgr * dens * idz
    fvk = jnp.where(live, fv * k * pv, 0.0)
    fvl = jnp.where(live, fv * l * pv, 0.0)
    nlow = jnp.clip(nlow, 0, nzmax_i)
    nup = jnp.clip(nup, 0, nzmax_i)

    hi_c = g0c + (n_tab - 1.0) * dz
    hi_f = g0f + (n_tab - 2.0) * dz

    # --- the block's window -------------------------------------------------
    qf_t = (jnp.clip(r, g0f, hi_f) - g0f) * idz
    qr_t = (jnp.clip(r_fin, g0c, hi_c) - g0c) * idz
    lo_t = jnp.minimum(jnp.minimum(jnp.floor(qf_t), jnp.floor(qr_t)) - 1.0,
                       nlow.astype(jnp.float32))
    hi_t = jnp.maximum(jnp.maximum(jnp.floor(qf_t), jnp.floor(qr_t)) + 2.0,
                       nup.astype(jnp.float32))
    lo_t = jnp.where(amask, lo_t, 1e9)
    hi_t = jnp.where(amask, hi_t, -1e9)
    lo_min8 = (jnp.min(lo_t).astype(jnp.int32) // 8) * 8
    hi_max = jnp.max(hi_t)
    win = jnp.clip(lo_min8, 0, c_pad - W)
    winf = win.astype(jnp.float32)
    ok = hi_max - winf <= W
    W2 = w2_cells
    if W2:
        # second tier before the exact full-width fallback (the span
        # distribution is bimodal — tools/span_study.py)
        win2 = jnp.clip(lo_min8, 0, c_pad - W2)
        fits2 = hi_max - win2.astype(jnp.float32) <= W2
        ok2 = (~ok) & fits2
        full_cond = (~ok) & (~fits2)
    else:
        full_cond = ~ok

    col_full = jax.lax.broadcasted_iota(jnp.int32, (c_pad, LANE), 0)
    col_full_f = col_full.astype(jnp.float32)
    col_win_i = jax.lax.broadcasted_iota(jnp.int32, (W, LANE), 0)
    col_win = col_win_i.astype(jnp.float32)
    if W2:
        col_win2_i = jax.lax.broadcasted_iota(jnp.int32, (W2, LANE), 0)
        col_win2 = col_win2_i.astype(jnp.float32)

    def dot(a, b, dims):
        return jax.lax.dot_general(
            a, b, dimension_numbers=(dims, ((), ())),
            preferred_element_type=jnp.float32,
        )

    def finish(du_rows, dv_rows, rho_rows):
        """Tendencies from the interpolated rows (shared by both branches);
        writes the three output blocks."""
        du_t = jnp.stack(du_rows)
        dv_t = jnp.stack(dv_rows)
        dmm_st = -(k * du_t + l * dv_t)             # lib/libprop.py:519-520
        if saturate_online:
            rho_t = jnp.stack(rho_rows)
            m_fin = m + dmm_st * dt
            # same 1-div + 1-rsqrt factoring as the dispersion block
            omh2 = (bvf * bvf * kh2 + f0 * f0 * m * m) * (1.0 / k2)
            cap = (
                kappa * kappa * 0.5 * rho_t * omh2
                * jax.lax.rsqrt(omh2) * bvf * bvf
                / (m_fin * m_fin * (omh2 - f0 * f0))
            )
            # dkk·dll·dmm_final with dmm_final = area/dr (area preservation);
            # pvb = dkk·dll·area precomputed in XLA
            pvol = pvb_ref[:] / dr
            cap_applied = cap if faithful else cap / pvol
            exceed = cap < dens * pvol
            dens_st = jnp.where(exceed & amask,
                                (cap_applied - dens) * (1.0 / dt), 0.0)
        else:
            dens_st = jnp.zeros_like(dens)
        dens_st_ref[:] = dens_st
        drr_st_ref[:] = jnp.where(amask, cgr, 0.0)
        dmm_st_ref[:] = jnp.where(amask, dmm_st, 0.0)

    def kahan(part, sl):
        y = part - comp_ref[sl, :]
        t = acc_ref[sl, :] + y
        comp_ref[sl, :] = (t - acc_ref[sl, :]) - y
        acc_ref[sl, :] = t

    def _windowed_tier(Wv, winv, col_i, col_f):
        winfv = winv.astype(jnp.float32)
        tabw = tabs_ref[pl.ds(winv, Wv), :]         # (Wv, 8): du, dv, ρ̄
        tab_du = tabw[:, 0:1]
        tab_dv = tabw[:, 1:2]
        tab_rho = tabw[:, 2:3]
        gflo = g0c + (winfv + col_f) * dz
        gfhi = gflo + dz
        colw = col_i + winv

        du_rows, dv_rows, rho_rows = [], [], []
        blk = jnp.zeros((Wv, 8), jnp.float32)
        for j in range(T):
            # hat coordinates hoisted: qf_t/qr_t already hold the clipped,
            # dz-normalized heights for the whole block
            Bf = jnp.maximum(
                0.0, 1.0 - jnp.abs(qf_t[j, :][None, :] - winfv - col_f))
            du_rows.append(jnp.sum(tab_du * Bf, axis=0))
            dv_rows.append(jnp.sum(tab_dv * Bf, axis=0))
            if saturate_online:
                Br = jnp.maximum(
                    0.0, 1.0 - jnp.abs(
                        qr_t[j, :][None, :] - winfv - col_f))
                rho_rows.append(jnp.sum(tab_rho * Br, axis=0))

            in_span = (colw >= nlow[j, :][None, :]) \
                & (colw < nup[j, :][None, :])
            wmat = jnp.where(
                in_span,
                jnp.abs(jnp.minimum(gfhi, r_up[j, :][None, :])
                        - jnp.maximum(gflo, r_lo[j, :][None, :])),
                0.0,
            )                                       # (Wv, LANE)
            fv8 = jnp.concatenate(
                [fvk[j, :][None, :], fvl[j, :][None, :],
                 jnp.zeros((6, LANE), jnp.float32)], axis=0)
            blk = blk + dot(wmat, fv8, ((1,), (1,)))

        finish(du_rows, dv_rows, rho_rows)
        kahan(blk, pl.ds(winv, Wv))

    @pl.when(ok)
    def _windowed():
        _windowed_tier(W, win, col_win_i, col_win)

    if W2:
        @pl.when(ok2)
        def _windowed2():
            _windowed_tier(W2, win2, col_win2_i, col_win2)

    @pl.when(full_cond)
    def _full():
        tab_rows = dot(
            jnp.concatenate([jnp.eye(3, dtype=jnp.float32),
                             jnp.zeros((3, 5), jnp.float32)], axis=1),
            tabs_ref[:], ((1,), (1,)),
        )                                           # (3, c_pad)
        shear_rows = tab_rows[0:2, :]
        rho_row = tab_rows[2:3, :]
        gflo = g0c + col_full_f * dz
        gfhi = gflo + dz

        du_rows, dv_rows, rho_rows = [], [], []
        blk = jnp.zeros((c_pad, 8), jnp.float32)
        for j in range(T):
            Bf = jnp.maximum(
                0.0, 1.0 - jnp.abs(qf_t[j, :][None, :] - col_full_f))
            sh2 = dot(shear_rows, Bf, ((1,), (0,)))
            du_rows.append(sh2[0, :])
            dv_rows.append(sh2[1, :])
            if saturate_online:
                Br = jnp.maximum(
                    0.0, 1.0 - jnp.abs(
                        qr_t[j, :][None, :] - col_full_f))
                rho_rows.append(dot(rho_row, Br, ((1,), (0,)))[0, :])

            in_span = (col_full >= nlow[j, :][None, :]) \
                & (col_full < nup[j, :][None, :])
            wmat = jnp.where(
                in_span,
                jnp.abs(jnp.minimum(gfhi, r_up[j, :][None, :])
                        - jnp.maximum(gflo, r_lo[j, :][None, :])),
                0.0,
            )                                       # (c_pad, LANE)
            fv8 = jnp.concatenate(
                [fvk[j, :][None, :], fvl[j, :][None, :],
                 jnp.zeros((6, LANE), jnp.float32)], axis=0)
            blk = blk + dot(wmat, fv8, ((1,), (1,)))

        finish(du_rows, dv_rows, rho_rows)
        kahan(blk, pl.ds(0, c_pad))

    if staged:
        # Williamson RK3 stage arithmetic fused in-kernel (the XLA glue's
        # q/y elementwise passes cost a measured ~0.18 ms/step at 1e6):
        #   q' = dt·f − c·q ; y' = y + b·q'  (stage 1: q' = dt·f, y += q'/3
        #   via division, lib/libprop.py:693-698).  The tendency just
        #   written to each output ref is read back and replaced by y'.
        cc = params_ref[_CC]
        bc = params_ref[_BC]
        first = params_ref[_FIRST] > 0.5

        def upd(st_ref, q_ref, qo_ref, y):
            tend = st_ref[:]
            q_new = jnp.where(first, dt * tend, dt * tend - cc * q_ref[:])
            y_new = jnp.where(first, y + q_new / 3.0, y + bc * q_new)
            qo_ref[:] = q_new
            st_ref[:] = y_new

        upd(dens_st_ref, qd_ref, qdo_ref, dens)
        upd(drr_st_ref, qr_ref, qro_ref, r)
        upd(dmm_st_ref, qm_ref, qmo_ref, m)

    @pl.when(i == n_prog - 1)
    def _():
        flux_ref[:] = acc_ref[:]


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_tab", "n_flux_cells", "w_cells", "w2_cells",
        "saturate_online", "faithful", "interpret"
    ),
)
def _rhs_adaptive_call(
    params, tabs,
    dens, r, dr, k, l, m, pv, ff2, kh2, pvb, act,
    n_tab: int, n_flux_cells: int, w_cells: int, w2_cells: int,
    saturate_online: bool, faithful: bool, interpret: bool,
):
    n_rows = r.shape[0]
    n_blocks = n_rows // SUBLANES
    c_pad = _ceil_to(max(n_tab, n_flux_cells), 128)
    kernel = functools.partial(
        _kernel, n_tab=n_tab, n_flux_cells=n_flux_cells, c_pad=c_pad,
        w_cells=w_cells, w2_cells=w2_cells,
        saturate_online=saturate_online, faithful=faithful,
    )
    row = pl.BlockSpec((SUBLANES, LANE), lambda i: (i, 0))
    outs = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),                 # params
            pl.BlockSpec((c_pad, 8), lambda i: (0, 0)),            # col tables
            row, row, row, row, row, row, row, row, row, row, row,
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
            pltpu.VMEM((c_pad, 8), jnp.float32),   # flux accumulator
            pltpu.VMEM((c_pad, 8), jnp.float32),   # Kahan compensation
        ],
        interpret=interpret,
    )(params, tabs, dens, r, dr, k, l, m, pv, ff2, kh2, pvb, act)
    return outs


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_tab", "n_flux_cells", "w_cells", "w2_cells",
        "saturate_online", "faithful", "interpret"
    ),
)
def _rhs_staged_call(
    params, tabs,
    dens, r, dr, k, l, m, pv, ff2, kh2, pvb, act,
    qd, qr, qm,
    n_tab: int, n_flux_cells: int, w_cells: int, w2_cells: int,
    saturate_online: bool, faithful: bool, interpret: bool,
):
    """Adaptive-window RHS + fused RK3 stage update: returns
    ``(y_dens', y_r', y_m', fluxT, q_dens', q_r', q_m')``."""
    n_rows = r.shape[0]
    n_blocks = n_rows // SUBLANES
    c_pad = _ceil_to(max(n_tab, n_flux_cells), 128)
    kernel = functools.partial(
        _kernel, n_tab=n_tab, n_flux_cells=n_flux_cells, c_pad=c_pad,
        w_cells=w_cells, w2_cells=w2_cells,
        saturate_online=saturate_online, faithful=faithful,
        staged=True,
    )
    row = pl.BlockSpec((SUBLANES, LANE), lambda i: (i, 0))
    big = jax.ShapeDtypeStruct((n_rows, LANE), jnp.float32)
    outs = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),                 # params
            pl.BlockSpec((c_pad, 8), lambda i: (0, 0)),            # col tables
            row, row, row, row, row, row, row, row, row, row, row,
            row, row, row,                                         # q in
        ],
        out_specs=(
            row, row, row,
            pl.BlockSpec((c_pad, 8), lambda i: (0, 0)),
            row, row, row,                                         # q out
        ),
        out_shape=(
            big, big, big,
            jax.ShapeDtypeStruct((c_pad, 8), jnp.float32),
            big, big, big,
        ),
        scratch_shapes=[
            pltpu.VMEM((c_pad, 8), jnp.float32),   # flux accumulator
            pltpu.VMEM((c_pad, 8), jnp.float32),   # Kahan compensation
        ],
        interpret=interpret,
    )(params, tabs, dens, r, dr, k, l, m, pv, ff2, kh2, pvb, act,
      qd, qr, qm)
    return outs


def _derived_fields(fields):
    """(dens, r, dr, k, l, m, pv, ff2, kh2, pvb, act) from prepare_inputs'
    12-field tuple — the last four are per-ray run constants (hprop off),
    computed once in XLA and hoisted out of the step scan."""
    (dens, r, dr, k, l, m, dm, phi, dkk, dll, area, act) = fields
    ff = 2.0 * ROT_EARTH * jnp.sin(phi)
    return (dens, r, dr, k, l, m,
            jnp.abs(dkk * dll * dm), ff * ff, k * k + l * l,
            dkk * dll * area, act)


def rk3_step_fused_windowed(dt, state, statics, bg, cfg, axis_name=None):
    """One complete Williamson RK3 step with the stage arithmetic fused into
    the adaptive-window kernel: 3 kernel launches per step, no XLA q/y
    passes.  Matches the generic ``rk3_step`` with the pallas backend at f32
    tolerance (tests/test_windowed.py); requires ``hprop=False`` and the
    default RHS."""
    from ..state import MeanState, State, coriolis

    params8, _t, fields, dims = prepare_inputs(dt, state, statics, bg, cfg)
    n, n_tab, n_flux_cells, c_pad = dims
    w_cells, w2_cells = resolve_window_cells(cfg, c_pad)
    interpret = jax.default_backend() != "tpu"

    f = list(_derived_fields(fields))
    # (dens, r, dr, k, l, m, pv, ff2, kh2, pvb, act); dynamic: 0, 1, 5
    zero = jnp.zeros_like(f[0])
    qd = qr = qm = zero
    u = state.mean.u.astype(jnp.float32)
    v = state.mean.v.astype(jnp.float32)
    qu = jnp.zeros_like(u)
    qv = jnp.zeros_like(v)
    dzc = bg.centers[1] - bg.centers[0]

    def col(x):
        x = x.astype(jnp.float32)
        return jnp.pad(x, (0, c_pad - x.shape[0]))

    rho_col = col(bg.rhobar)
    zcol = jnp.zeros((c_pad,), jnp.float32)
    ff0 = coriolis(cfg.phi0, jnp.float32)
    pg = bg.pressure_gradient.astype(jnp.float32)
    rhobar = bg.rhobar.astype(jnp.float32)

    for cc, bc, first in ((0.0, 0.0, 1.0), (5.0 / 9.0, 15.0 / 16.0, 0.0),
                          (153.0 / 128.0, 8.0 / 15.0, 0.0)):
        du_dz = (u[1:] - u[:-1]) / dzc
        dv_dz = (v[1:] - v[:-1]) / dzc
        tabs = jnp.stack(
            [col(du_dz), col(dv_dz), rho_col, zcol, zcol, zcol, zcol, zcol],
            axis=1,
        )
        # prepare_inputs builds 7 scalar slots; pad to 8 so the staged
        # coefficients land exactly on _CC/_BC/_FIRST = 8/9/10
        params = jnp.concatenate([
            params8,
            jnp.zeros((8 - params8.shape[0],), jnp.float32),
            jnp.asarray([cc, bc, first], jnp.float32),
        ])
        f[0], f[1], f[5], fluxT, qd, qr, qm = _rhs_staged_call(
            params, tabs, *f, qd, qr, qm,
            n_tab=n_tab, n_flux_cells=n_flux_cells, w_cells=w_cells,
            w2_cells=w2_cells,
            saturate_online=bool(cfg.saturate_online),
            faithful=bool(cfg.faithful_saturation),
            interpret=interpret,
        )

        pm_interior = fluxT.T[:2, :n_flux_cells]
        if axis_name is not None:
            pm_interior = jax.lax.psum(pm_interior, axis_name)
        if cfg.prognostic_mean:
            pm_flux = jnp.concatenate(
                [pm_interior[:, :1], pm_interior, pm_interior[:, -1:]], axis=1)
            dzf = (bg.faces[1] - bg.faces[0]).astype(jnp.float32)
            grad = (pm_flux[:, 1:] - pm_flux[:, :-1]) / dzf
            du_st = ff0 * v - (pg[0] + grad[0]) / rhobar
            dv_st = -ff0 * u - (pg[1] + grad[1]) / rhobar
            if first:
                qu = dt * du_st
                qv = dt * dv_st
                u = u + qu / 3.0
                v = v + qv / 3.0
            else:
                qu = dt * du_st - cc * qu
                qv = dt * dv_st - cc * qv
                u = u + bc * qu
                v = v + bc * qv

    unshape = lambda x: x.reshape(-1)[:n]
    dtype = state.rays.dens.dtype
    rays = state.rays._replace(
        dens=unshape(f[0]).astype(dtype),
        r=unshape(f[1]).astype(dtype),
        m=unshape(f[5]).astype(dtype),
    )
    mean = MeanState(u.astype(state.mean.u.dtype),
                     v.astype(state.mean.v.dtype))
    return State(rays, mean)


def rhs_fused_windowed(dt, state, statics, bg, cfg):
    """Adaptive-window fused-RHS entry point, drop-in for
    :func:`msgwam_tpu.ops.rhs_pallas.rhs_fused`: returns
    ``(ray_tendencies_dict, pm_interior)``."""
    params, _tables, fields, dims = prepare_inputs(dt, state, statics, bg, cfg)
    n, n_tab, n_flux_cells, c_pad = dims
    mean = state.mean

    dz = bg.centers[1] - bg.centers[0]
    du_dz = (mean.u[1:] - mean.u[:-1]) / dz
    dv_dz = (mean.v[1:] - mean.v[:-1]) / dz

    def col(x):
        x = x.astype(jnp.float32)
        return jnp.pad(x, (0, c_pad - x.shape[0]))

    tabs = jnp.stack(
        [col(du_dz), col(dv_dz), col(bg.rhobar)]
        + [jnp.zeros((c_pad,), jnp.float32)] * 5, axis=1,
    )                                               # (c_pad, 8)

    w_cells, w2_cells = resolve_window_cells(cfg, c_pad)
    interpret = jax.default_backend() != "tpu"
    dens_st, drr_st, dmm_st, fluxT = _rhs_adaptive_call(
        params, tabs, *_derived_fields(fields),
        n_tab=n_tab, n_flux_cells=n_flux_cells, w_cells=w_cells,
            w2_cells=w2_cells,
        saturate_online=bool(cfg.saturate_online),
        faithful=bool(cfg.faithful_saturation),
        interpret=interpret,
    )
    unshape = lambda x: x.reshape(-1)[:n]
    tend = {
        "dens": unshape(dens_st),
        "r": unshape(drr_st),
        "m": unshape(dmm_st),
    }
    return tend, fluxT.T[:2, :n_flux_cells]
