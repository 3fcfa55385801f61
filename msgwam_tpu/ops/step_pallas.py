"""VMEM-resident whole-run megakernel: many full RK3 steps per launch.

The scan-based step path pays, per time step: ~0.1 ms of XLA while-loop
overhead (measured on the tunneled TPU backend), 3 kernel launches, the RK3
stage arithmetic's HBM round-trips, and 3× streaming of the ray state
through VMEM.  At the metric-of-record size (1e5 rays) those fixed costs
rival the physics itself (~0.15 ms/eval).

This kernel removes all of them at once for states that fit in VMEM
(~16 MB/core → capacity ≤ 131,072 rays; the whole 1e5-ray benchmark state
is ~8 MB): ONE ``pallas_call`` with a sequential 3-D grid
``(n_steps, 3 stages, n_tiles)`` executes ``n_steps`` complete Williamson
RK3 steps (``lib/libprop.py:680-700``) with the ray state, the RK3 ``q``
registers, and the mean wind all resident in VMEM.  Layout lessons baked in
(each measured against the alternatives this round):

* work is addressed at *tile* granularity (64 sublane rows = 8192 rays):
  one dynamic VMEM slab read/write per array per tile, then fully **static**
  per-row addressing inside the unrolled 64-row loop — per-row or per-group
  ``fori`` bodies with dynamic addressing measured 1.6-2.3× slower (the
  packed-group MXU variant was latency-bound on its 14 small serial dots);
* each tile gets a ``W``-cell window (cells on sublanes) computed in-kernel
  from the tile's own touched-cell bounds — consecutive source slots are
  height-coherent, so **no sorting is needed**; a tile whose span outgrows
  ``W`` falls back, inside the same kernel, to the exact full-width path
  (never a silent truncation);
* the flux deposit contracts per row on the MXU and accumulates in
  registers per tile, with a single flux-accumulator update per tile;
* stage boundaries ride the sequential grid: at ``tile == 0`` the stage's
  shear/ρ̄ interpolation tables are rebuilt from the current wind (one MXU
  map, ``shear = SH^T·u``); at the last tile the accumulated flux is turned
  into the wind update (``grad = G^T·flux``, Coriolis, pressure gradient —
  ``lib/libprop.py:523-558,653-663``); both maps are host-precomputed by
  pushing basis vectors through the exact XLA-path formulas;
* the RK3 q/y updates run tile-wise in place on VMEM refs (stage 1's
  ``y += q/3`` uses the reference's division form).

Scope: ``hprop=False``, float32, both saturation modes (online inside the
stages, or the reference's offline direct saturation as a 4th grid phase
with FD rates across the step incl. quirk 2 — ``raytracer.py:182-188``),
no culling/relaunch/prescribed wind inside the kernel (those run through
the scan path).  Equivalence to the XLA path is tested at f32 tolerance
over multi-step trajectories (tests/test_megakernel.py).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import ROT_EARTH

LANE = 128
TILE_ROWS = 64           # 8192 rays per tile
MAX_ROWS = 1024          # 131,072 rays: ~12 MB of VMEM working set
WIN = 16                 # default per-tile window cells (8-aligned); the
                         # round-2 W-scan found narrower windows always win
                         # while blocks stay coherent (benchmarks/RESULTS.md)


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


# scalar-parameter slots (float32 SMEM)
(_G0C, _DZ, _G0F, _DT, _BVF, _KAPPA, _F0, _RDIV) = range(8)


def _kernel(
    params_ref, maps_ref, cols_ref,
    dens_in, r_in, m_in, uv_in,
    k_ref, l_ref, dr_ref, dm_ref, phi_ref, dkk_ref, dll_ref, area_ref, act_ref,
    dens_o, r_o, m_o, uv_o, dens_pp,
    qd, qr, qm, du_s, dv_s, rho_s, quv, acc_ref, tabs_m, r_prev, m_prev,
    ff2_s, kh2_s, pv_s, comp_m,
    *, n_rows: int, n_tab: int, n_flux_cells: int, c_pad: int,
    tile_rows: int, online: bool, prognostic: bool, faithful: bool,
    w_cells: int = WIN, w2_cells: int = 0,
):
    step = pl.program_id(0)
    st = pl.program_id(1)            # 0-2: RK3 stages; 3 (offline): saturation
    tl = pl.program_id(2)
    n_tiles = pl.num_programs(2)

    g0c = params_ref[_G0C]
    dz = params_ref[_DZ]
    g0f = params_ref[_G0F]
    dt = params_ref[_DT]
    bvf = params_ref[_BVF]
    kappa = params_ref[_KAPPA]
    f0 = params_ref[_F0]
    W = w_cells
    W2 = w2_cells                  # second window tier; 0 = disabled
    T = tile_rows

    @pl.when((step == 0) & (st == 0) & (tl == 0))
    def _():
        dens_o[:] = dens_in[:]
        r_o[:] = r_in[:]
        m_o[:] = m_in[:]
        uv_o[:] = uv_in[:]
        # per-ray run constants (hprop off: phi, k, l, dm, dkk, dll frozen)
        sphi = jnp.sin(phi_ref[:])
        ff2_s[:] = (2.0 * ROT_EARTH) * (2.0 * ROT_EARTH) * sphi * sphi
        kh2_s[:] = k_ref[:] * k_ref[:] + l_ref[:] * l_ref[:]
        pv_s[:] = jnp.abs(dkk_ref[:] * dll_ref[:] * dm_ref[:])

    # --- per-stage setup (before any tile of this stage) -------------------
    @pl.when((tl == 0) & (st < 3))
    def _():
        sh_cols = jax.lax.dot_general(
            maps_ref[0:c_pad, :], uv_o[:],
            dimension_numbers=((((0,), (0,))), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                   # (c_pad, 8)
        tabs_m[:, 0:2] = sh_cols[:, 0:2]
        tabs_m[:, 2:3] = cols_ref[:, 0:1]                   # ρ̄
        tabs_m[:, 3:8] = jnp.zeros((c_pad, 5), jnp.float32)
        acc_ref[:] = jnp.zeros((c_pad, 8), jnp.float32)
        comp_m[:] = jnp.zeros((c_pad, 8), jnp.float32)

    nzmax_i = n_flux_cells - 1
    nzmax = jnp.float32(nzmax_i)
    hi_c = g0c + (n_tab - 1.0) * dz
    hi_f = g0f + (n_tab - 2.0) * dz

    col_full = jax.lax.broadcasted_iota(jnp.int32, (c_pad, LANE), 0)
    col_full_f = col_full.astype(jnp.float32)
    col_win_i = jax.lax.broadcasted_iota(jnp.int32, (W, LANE), 0)
    col_win = col_win_i.astype(jnp.float32)
    if W2:
        col_win2_i = jax.lax.broadcasted_iota(jnp.int32, (W2, LANE), 0)
        col_win2 = col_win2_i.astype(jnp.float32)

    # --- tile work ---------------------------------------------------------
    base = tl * T
    slab = pl.ds(base, T)

    def kahan_acc(part, sl):
        # Kahan-compensated flux accumulation (the windowed kernel's
        # comp_ref pattern): keeps the up-to-16-tile partial sum's deposit
        # error at the windowed kernel's ~1e-7 level instead of growing
        # with tile count (tests/test_megakernel.py deposit-accuracy test).
        y = part - comp_m[sl, :]
        t = acc_ref[sl, :] + y
        comp_m[sl, :] = (t - acc_ref[sl, :]) - y
        acc_ref[sl, :] = t

    def _stage_tile():

        dens = dens_o[slab, :]
        r = r_o[slab, :]
        m = m_o[slab, :]
        k = k_ref[slab, :]
        l = l_ref[slab, :]
        dr = dr_ref[slab, :]
        phi = phi_ref[slab, :]
        act = act_ref[slab, :]
        amask = act > 0

        ff2 = ff2_s[slab, :]
        kh2 = kh2_s[slab, :]
        pv = pv_s[slab, :]
        # one reciprocal + one rsqrt instead of 3 divides + 1 sqrt per ray
        # (lib/libprop.py:434-448 algebra unchanged; divides/sqrts retire
        # at a fraction of VPU mul throughput)
        k2 = kh2 + m * m
        om2 = (bvf * bvf * kh2 + ff2 * m * m) * (1.0 / k2)
        cgr = -m * (om2 - ff2) * jax.lax.rsqrt(om2) * (1.0 / k2)
        r_fin = r + cgr * dt
        idz = 1.0 / dz                 # scalar; hoisted by the compiler
        fv = cgr * dens * idz
        r_lo = r - 0.5 * dr
        r_up = r + 0.5 * dr
        nlow = (r_lo * idz).astype(jnp.int32)
        nup = (r_up * idz + 1.0).astype(jnp.int32)
        ood = ((nlow >= nzmax_i) & (nup >= nzmax_i)) | ((nlow <= 0) & (nup <= 0))
        live = amask & ~ood
        fvk = jnp.where(live, fv * k * pv, 0.0)
        fvl = jnp.where(live, fv * l * pv, 0.0)
        nlow = jnp.clip(nlow, 0, nzmax_i)
        nup = jnp.clip(nup, 0, nzmax_i)

        # --- per-tile window from the tile's own touched-cell bounds -----------
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
        if W2:
            # second tier before the exact full-width fallback: per-block
            # spans are bimodal (tools/span_study.py) — the dispersive
            # fast-tail blocks mix to 80-100 cells while coherent blocks
            # stay under ~16-24 — so one wide retry recovers most of the
            # 8x full-width penalty
            win2 = jnp.clip(lo_min8, 0, c_pad - W2)
            fits2 = hi_max - win2.astype(jnp.float32) <= W2
            ok2 = (~ok) & fits2
            full_cond = (~ok) & (~fits2)
        else:
            full_cond = ~ok

        def hat_full(q):
            return jnp.maximum(0.0, 1.0 - jnp.abs(q - col_full_f))

        def _windowed_tier(Wv, winv, col_i, col_f):
            winfv = winv.astype(jnp.float32)
            tabw = tabs_m[pl.ds(winv, Wv), :]                   # (Wv, 8)
            tab_du = tabw[:, 0:1]
            tab_dv = tabw[:, 1:2]
            tab_rho = tabw[:, 2:3]
            gflo = g0c + (winfv + col_f) * dz
            gfhi = gflo + dz
            colw = col_i + winv

            def hat_win(q):
                return jnp.maximum(0.0, 1.0 - jnp.abs(q - winfv - col_f))

            du_rows = []
            dv_rows = []
            rho_rows = []
            tile_acc = jnp.zeros((Wv, 8), jnp.float32)
            for j in range(T):
                # hat coordinates hoisted: qf_t/qr_t already hold the
                # clipped, dz-normalized heights for the whole tile
                Bf = hat_win(qf_t[j, :][None, :])
                du_rows.append(jnp.sum(tab_du * Bf, axis=0))
                dv_rows.append(jnp.sum(tab_dv * Bf, axis=0))
                if online:          # in-stage ρ̄ only for online saturation
                    Br = hat_win(qr_t[j, :][None, :])
                    rho_rows.append(jnp.sum(tab_rho * Br, axis=0))

                in_span = (colw >= nlow[j, :][None, :]) \
                    & (colw < nup[j, :][None, :])
                rl = r_lo[j, :][None, :]
                ru = r_up[j, :][None, :]
                wmat = jnp.where(
                    in_span,
                    jnp.abs(jnp.minimum(gfhi, ru) - jnp.maximum(gflo, rl)),
                    0.0,
                )                                               # (Wv, LANE)
                fv8 = jnp.concatenate(
                    [fvk[j, :][None, :], fvl[j, :][None, :],
                     jnp.zeros((6, LANE), jnp.float32)], axis=0)
                tile_acc = tile_acc + jax.lax.dot_general(
                    wmat, fv8, dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )                                               # (Wv, 8)

            du_s[slab, :] = jnp.stack(du_rows)
            dv_s[slab, :] = jnp.stack(dv_rows)
            if online:
                rho_s[slab, :] = jnp.stack(rho_rows)
            kahan_acc(tile_acc, pl.ds(winv, Wv))

        @pl.when(ok)
        def _windowed():
            _windowed_tier(W, win, col_win_i, col_win)

        if W2:
            @pl.when(ok2)
            def _windowed2():
                _windowed_tier(W2, win2, col_win2_i, col_win2)

        @pl.when(full_cond)
        def _full():
            # exact fallback: full-width bases/weights (row form of the stage
            # tables via one small transposing contraction)
            eye2 = jnp.concatenate(
                [jnp.eye(3, dtype=jnp.float32),
                 jnp.zeros((3, 5), jnp.float32)], axis=1)       # (3, 8)
            tab_rows = jax.lax.dot_general(
                eye2, tabs_m[:],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                                   # (3, c_pad)
            shear_rows = tab_rows[0:2, :]
            rho_row = tab_rows[2:3, :]

            du_rows = []
            dv_rows = []
            rho_rows = []
            tile_acc = jnp.zeros((c_pad, 8), jnp.float32)
            for j in range(T):
                Bf = hat_full(qf_t[j, :][None, :])
                sh2 = jax.lax.dot_general(
                    shear_rows, Bf, dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                du_rows.append(sh2[0, :])
                dv_rows.append(sh2[1, :])
                if online:
                    Br = hat_full(qr_t[j, :][None, :])
                    rho = jax.lax.dot_general(
                        rho_row, Br,
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    rho_rows.append(rho[0, :])

                in_span = (col_full >= nlow[j, :][None, :]) \
                    & (col_full < nup[j, :][None, :])
                rl = r_lo[j, :][None, :]
                ru = r_up[j, :][None, :]
                wmat = jnp.where(
                    in_span,
                    jnp.abs(jnp.minimum(gfhi_full_ := g0c + (col_full_f + 1.0) * dz,
                                        ru)
                            - jnp.maximum(g0c + col_full_f * dz, rl)),
                    0.0,
                )                                               # (c_pad, LANE)
                fv8 = jnp.concatenate(
                    [fvk[j, :][None, :], fvl[j, :][None, :],
                     jnp.zeros((6, LANE), jnp.float32)], axis=0)
                tile_acc = tile_acc + jax.lax.dot_general(
                    wmat, fv8, dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )                                               # (c_pad, 8)

            du_s[slab, :] = jnp.stack(du_rows)
            dv_s[slab, :] = jnp.stack(dv_rows)
            if online:
                rho_s[slab, :] = jnp.stack(rho_rows)
            kahan_acc(tile_acc, pl.ds(0, c_pad))

        # --- tendencies + RK3 q/y updates for this tile ------------------------
        du_t = du_s[slab, :]
        dv_t = dv_s[slab, :]
        dmm_st = -(k * du_t + l * dv_t)                         # lib/libprop.py:519
        if online:
            rho_t = rho_s[slab, :]
            m_fin = m + dmm_st * dt
            dmm_fin = area_ref[slab, :] / dr
            # same 1-div + 1-rsqrt factoring as the dispersion block
            omh2 = (bvf * bvf * kh2 + f0 * f0 * m * m) * (1.0 / k2)
            cap = (
                kappa * kappa * 0.5 * rho_t * omh2
                * jax.lax.rsqrt(omh2) * bvf * bvf
                / (m_fin * m_fin * (omh2 - f0 * f0))
            )
            pvol = dkk_ref[slab, :] * dll_ref[slab, :] * dmm_fin
            cap_applied = cap if faithful else cap / pvol
            exceed = cap < dens * pvol
            dens_st = jnp.where(exceed & amask,
                                (cap_applied - dens) * (1.0 / dt), 0.0)
        else:
            dens_st = jnp.zeros_like(dens)
        drr_st = jnp.where(amask, cgr, 0.0)
        dmm_st = jnp.where(amask, dmm_st, 0.0)

        c_coef = jnp.where(st == 1, 5.0 / 9.0,
                           jnp.where(st == 2, 153.0 / 128.0, 0.0))
        b_coef = jnp.where(st == 1, 15.0 / 16.0,
                           jnp.where(st == 2, 8.0 / 15.0, 1.0))
        first = st == 0

        def upd(q_ref, y_ref, tend, y_val):
            q_new = jnp.where(first, dt * tend,
                              dt * tend - c_coef * q_ref[slab, :])
            # stage 1 adds q/3 via *division*, exactly like lib/libprop.py:694
            y_new = jnp.where(first, y_val + q_new / 3.0,
                              y_val + b_coef * q_new)
            q_ref[slab, :] = q_new
            y_ref[slab, :] = y_new

        upd(qd, dens_o, dens_st, dens)
        upd(qr, r_o, drr_st, r)
        upd(qm, m_o, dmm_st, m)

        # --- stage completion: flux -> wind (last tile of the stage) -----------
        @pl.when(tl == n_tiles - 1)
        def _():
            if prognostic:
                grad = jax.lax.dot_general(
                    maps_ref[c_pad:2 * c_pad, :], acc_ref[:],
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )                                               # (c_pad, 8)
                uvT = uv_o[:]
                du_col = f0 * uvT[:, 1:2] \
                    - (cols_ref[:, 1:2] + grad[:, 0:1]) * cols_ref[:, 3:4]
                dv_col = -f0 * uvT[:, 0:1] \
                    - (cols_ref[:, 2:3] + grad[:, 1:2]) * cols_ref[:, 3:4]
                duv = jnp.concatenate(
                    [du_col, dv_col, jnp.zeros((c_pad, 6), jnp.float32)], axis=1)
                q_new = jnp.where(first, dt * duv, dt * duv - c_coef * quv[:])
                uv_o[:] = jnp.where(first, uvT + q_new / 3.0,
                                    uvT + b_coef * q_new)
                quv[:] = q_new

    def _offline_saturation_tile():
        # driver-side direct saturation with FD rates across the completed
        # step (raytracer.py:182-188 -> lib/libprop.py:561-610), including
        # quirk 2 (the height rate divided by RDIV=1 in faithful mode)
        rdiv = params_ref[_RDIV]
        r_p = r_prev[slab, :]
        m_p = m_prev[slab, :]
        r_n = r_o[slab, :]
        m_n = m_o[slab, :]
        dens_n = dens_o[slab, :]
        dens_pp[slab, :] = dens_n                  # propagated (pre-sat)
        k = k_ref[slab, :]
        l = l_ref[slab, :]
        dr = dr_ref[slab, :]
        act = act_ref[slab, :]
        amask = act > 0

        r_rate = (r_n - r_p) / rdiv
        m_rate = (m_n - m_p) / dt
        r_fin = r_p + r_rate * dt                  # lib/libprop.py:591
        m_fin = m_p + m_rate * dt
        dmm_fin = area_ref[slab, :] / dr           # dr rate is exactly 0

        # ρ̄ at the extrapolated height: per-tile window, full-width fallback
        qr_t = (jnp.clip(r_fin, g0c, hi_c) - g0c) / dz
        lo_t = jnp.where(amask, jnp.floor(qr_t) - 1.0, 1e9)
        hi_t = jnp.where(amask, jnp.floor(qr_t) + 2.0, -1e9)
        win = jnp.clip((jnp.min(lo_t).astype(jnp.int32) // 8) * 8,
                       0, c_pad - W)
        winf = win.astype(jnp.float32)
        ok = jnp.max(hi_t) - winf <= W

        @pl.when(ok)
        def _win():
            tab_rho = tabs_m[pl.ds(win, W), 2:3]
            rows = []
            for j in range(T):
                Br = jnp.maximum(
                    0.0, 1.0 - jnp.abs(
                        qr_t[j, :][None, :] - winf - col_win))
                rows.append(jnp.sum(tab_rho * Br, axis=0))
            rho_s[slab, :] = jnp.stack(rows)

        @pl.when(~ok)
        def _fullw():
            rho_row = jax.lax.dot_general(
                jnp.concatenate([jnp.zeros((1, 2), jnp.float32),
                                 jnp.ones((1, 1), jnp.float32),
                                 jnp.zeros((1, 5), jnp.float32)], axis=1),
                tabs_m[:],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                      # (1, c_pad)
            rows = []
            for j in range(T):
                Br = jnp.maximum(
                    0.0, 1.0 - jnp.abs(
                        qr_t[j, :][None, :] - col_full_f))
                rho = jax.lax.dot_general(
                    rho_row, Br,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                rows.append(rho[0, :])
            rho_s[slab, :] = jnp.stack(rows)

        rho_t = rho_s[slab, :]
        kh2 = kh2_s[slab, :]
        # pre-step m, phi0; 1-div + 1-rsqrt factoring (see _stage_tile)
        omh2 = (bvf * bvf * kh2 + f0 * f0 * m_p * m_p) \
            * (1.0 / (kh2 + m_p * m_p))
        cap = (
            kappa * kappa * 0.5 * rho_t * omh2
            * jax.lax.rsqrt(omh2) * bvf * bvf
            / (m_fin * m_fin * (omh2 - f0 * f0))
        )
        pvol = dkk_ref[slab, :] * dll_ref[slab, :] * dmm_fin
        cap_applied = cap if faithful else cap / pvol
        exceed = (cap < dens_n * pvol) & amask
        dens_o[slab, :] = jnp.where(exceed, cap_applied, dens_n)

    if online:
        _stage_tile()

        @pl.when(st == 2)
        def _():
            dens_pp[slab, :] = dens_o[slab, :]     # dens_prop ≡ dens online
    else:
        # offline mode: st 0-2 are the RK3 stages, st 3 the driver-side
        # direct saturation of raytracer.py:182-188

        @pl.when(st == 0)
        def _():
            # pre-step state for the finite-difference rates — saved BEFORE
            # stage 1 updates y in place
            r_prev[slab, :] = r_o[slab, :]
            m_prev[slab, :] = m_o[slab, :]

        pl.when(st < 3)(_stage_tile)

        @pl.when(st == 3)
        def _():
            _offline_saturation_tile()



@functools.partial(
    jax.jit,
    static_argnames=("n_steps", "n_tab", "n_flux_cells",
                     "online", "prognostic", "faithful", "interpret",
                     "w_cells", "w2_cells"),
)
def _megakernel_call(
    params, maps, cols,
    dens, r, m, uvT,
    k, l, dr, dm, phi, dkk, dll, area, act,
    n_steps: int, n_tab: int, n_flux_cells: int,
    online: bool, prognostic: bool, faithful: bool, interpret: bool,
    w_cells: int = WIN, w2_cells: int = 0,
):
    n_rows = r.shape[0]
    tile_rows = TILE_ROWS if n_rows % TILE_ROWS == 0 else 8
    n_tiles = n_rows // tile_rows
    c_pad = _ceil_to(max(n_tab, n_flux_cells), 128)
    kernel = functools.partial(
        _kernel, n_rows=n_rows, n_tab=n_tab, n_flux_cells=n_flux_cells,
        c_pad=c_pad, tile_rows=tile_rows, online=online,
        prognostic=prognostic, faithful=faithful,
        w_cells=min(w_cells, c_pad),
        w2_cells=w2_cells if w2_cells < c_pad else 0,
    )
    whole = pl.BlockSpec((n_rows, LANE), lambda i, s, t: (0, 0))
    col8 = pl.BlockSpec((c_pad, 8), lambda i, s, t: (0, 0))
    big = lambda: pltpu.VMEM((n_rows, LANE), jnp.float32)
    outs = pl.pallas_call(
        kernel,
        grid=(n_steps, 3 if online else 4, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),                   # params
            pl.BlockSpec((2 * c_pad, c_pad), lambda i, s, t: (0, 0)),  # SH;G
            col8,                                                    # tables
            whole, whole, whole, col8,
            whole, whole, whole, whole, whole, whole, whole, whole, whole,
        ],
        out_specs=(whole, whole, whole, col8, whole),
        out_shape=(
            jax.ShapeDtypeStruct((n_rows, LANE), jnp.float32),
            jax.ShapeDtypeStruct((n_rows, LANE), jnp.float32),
            jax.ShapeDtypeStruct((n_rows, LANE), jnp.float32),
            jax.ShapeDtypeStruct((c_pad, 8), jnp.float32),
            jax.ShapeDtypeStruct((n_rows, LANE), jnp.float32),  # dens_prop
        ),
        scratch_shapes=[
            big(),                                     # qd
            big(),                                     # qr
            big(),                                     # qm
            big(),                                     # du
            big(),                                     # dv
            big(),                                     # rho
            pltpu.VMEM((c_pad, 8), jnp.float32),       # q_uv
            pltpu.VMEM((c_pad, 8), jnp.float32),       # flux accumulator
            pltpu.VMEM((c_pad, 8), jnp.float32),       # stage tables
            big(),                                     # r_prev (offline FD)
            big(),                                     # m_prev (offline FD)
            big(),                                     # ff2 (run constant)
            big(),                                     # kh2 (run constant)
            big(),                                     # |dkk dll dm| (run constant)
            pltpu.VMEM((c_pad, 8), jnp.float32),       # Kahan compensation
        ],
        interpret=interpret,
    )(params, maps, cols, dens, r, m, uvT,
      k, l, dr, dm, phi, dkk, dll, area, act)
    return outs


def _host_linear_map(fn, dim: int) -> np.ndarray:
    """(dim, dim) matrix M with row_out = row_in @ M, built by pushing basis
    vectors through ``fn`` (guarantees the same linear map as the XLA path,
    up to f32 summation of ≤2 terms per output)."""
    cols = [fn(np.eye(dim, dtype=np.float64)[j]) for j in range(dim)]
    return np.stack(cols, axis=0).astype(np.float32)


def build_operators(bg, cfg, n_tab: int, c_pad: int):
    """Host-side static operators + column tables for the megakernel.

    ``bg`` must be concrete (it is run-constant); everything here is NumPy
    so the builder also works when called under an outer ``jit`` trace that
    closes over the background."""
    centers = np.asarray(bg.centers, np.float64)
    dz = float(centers[1] - centers[0])
    n_flux = n_tab - 1
    n_cell = n_tab

    def shear_map(u):
        out = np.zeros(c_pad)
        out[: n_tab - 1] = (u[1:n_tab] - u[: n_tab - 1]) / dz
        return out

    def grad_map(a):
        a = a[:n_flux]
        pmf = np.concatenate([a[:1], a, a[-1:]])
        out = np.zeros(c_pad)
        out[: n_cell] = (pmf[1:] - pmf[:-1]) / dz
        return out

    SH = _host_linear_map(shear_map, c_pad)
    G = _host_linear_map(grad_map, c_pad)
    maps = jnp.asarray(np.concatenate([SH, G], axis=0))   # (2*c_pad, c_pad)

    rhobar_np = np.asarray(bg.rhobar, np.float64)
    pg_np = np.asarray(bg.pressure_gradient, np.float64)
    rho = np.zeros(c_pad, np.float32)
    rho[:n_tab] = rhobar_np[:n_tab]
    pgx = np.zeros(c_pad, np.float32)
    pgy = np.zeros(c_pad, np.float32)
    pgx[:n_cell] = pg_np[0, :n_cell]
    pgy[:n_cell] = pg_np[1, :n_cell]
    inv_rho = np.zeros(c_pad, np.float32)
    inv_rho[:n_cell] = 1.0 / np.maximum(rho[:n_cell], 1e-30)
    cols = np.zeros((c_pad, 8), np.float32)
    cols[:, 0] = rho
    cols[:, 1] = pgx
    cols[:, 2] = pgy
    cols[:, 3] = inv_rho
    return maps, jnp.asarray(cols)


def simulate_resident(state, statics, bg, cfg, run, include_t0: bool = False,
                      source=None, wind_fn=None, t0: float = 0.0,
                      launch_sort=None, observe=None, source_key=None):
    """Drop-in fast path for ``simulate``: runs whole RK3 steps in-kernel.

    ``observe(state, statics, aux) -> pytree`` (same contract as
    :func:`msgwam_tpu.simulate`) reduces each history frame on device
    before stacking; without it the history stacks full ray states, which
    is an OOM cliff at large ray counts and fine save cadence (see
    ``step_pallas_stream.simulate_streaming``'s history-memory note).

    When the config enables the per-step lifecycle (``cfg.cull`` /
    ``cfg.relaunch`` with a ``source`` template, or a prescribed transient
    ``wind_fn``), the call routes to the HBM-streaming variant, which runs
    cull → relaunch in-kernel at each step boundary and reads the imposed
    wind from a per-step table (``ops/step_pallas_stream.py``); that path
    is not differentiable.

    **Differentiable in (state, statics)**: carries a ``custom_vjp`` whose
    backward pass differentiates the numerically equivalent XLA scan path
    (the same pattern as the fused-RHS kernels, ``models/rhs.py:206-231``),
    so ``jax.grad`` through a whole resident run matches the scan path —
    tested in tests/test_megakernel.py.  ``bg`` is closed over, not
    differentiated: the kernel's flux→wind operators are host-built from a
    *concrete* background (it is run-constant), so it cannot be a traced
    custom_vjp argument.  See :func:`_simulate_resident_impl` for the full
    contract.
    """

    if cfg.cull or cfg.relaunch or wind_fn is not None:
        from .step_pallas_stream import simulate_streaming

        return simulate_streaming(state, statics, bg, cfg, run,
                                  include_t0=include_t0, source=source,
                                  wind_fn=wind_fn, t0=t0,
                                  launch_sort=launch_sort, observe=observe,
                                  source_key=source_key)

    @functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
    def diff(s, st, cfg_, run_, inc):
        return _simulate_resident_impl(s, st, bg, cfg_, run_, inc,
                                       launch_sort=launch_sort,
                                       observe=observe)

    def fwd(s, st, cfg_, run_, inc):
        return diff(s, st, cfg_, run_, inc), (s, st)

    def bwd(cfg_, run_, inc, res, g):
        # differentiate the equivalent dense-XLA scan path (same physics,
        # same masks; kernels match at f32 tolerance so the gradients are
        # consistent to the same order).  flux_accum is carried through.
        from ..models.integrate import simulate

        s, st = res
        xla_cfg = cfg_.replace(rhs_backend="xla", window_cells=0,
                               projection_backend="mxu",
                               interp_backend="mxu")

        def generic(s_, st_):
            return simulate(s_, st_, bg, xla_cfg, run_,
                            include_t0=inc, observe=observe, validate=False)

        _, vjp = jax.vjp(generic, s, st)
        return vjp(g)

    diff.defvjp(fwd, bwd)
    return diff(state, statics, cfg, run, bool(include_t0))


def _simulate_resident_impl(state, statics, bg, cfg, run,
                            include_t0: bool = False, launch_sort=None,
                            observe=None):
    """Drop-in fast path for ``simulate`` on VMEM-sized problems: runs
    ``run.n_steps`` steps as ``n_steps // save_every`` megakernel launches
    (each launch = ``save_every`` full RK3 steps resident in VMEM).

    Returns ``(final_state, statics, history)`` where history is the default
    observable ``(State, active, dens_prop)`` stacked per save point —
    matching ``simulate``'s default history framing.  Constant-by-structure
    ray fields (lam, phi, dr, k, l, dm) are broadcast from the initial
    state.

    Both saturation modes are supported in-kernel: online (inside each RK3
    stage) and the reference's offline direct saturation with FD rates
    across the step (``raytracer.py:182-188``, incl. quirk 2 via
    ``cfg.faithful_offline_rates``), which runs as a 4th grid phase per
    step; ``dens_prop`` then carries the pre-saturation density exactly
    like the scan path's aux channel.

    Requires ``hprop=False``, f32 state, no culling/relaunch/prescribed
    wind.  Above the 131,072-ray VMEM capacity the call transparently
    dispatches to the HBM-streaming variant of the same whole-run kernel
    (``ops/step_pallas_stream.py``) — any ray count is supported.  For
    anything else use :func:`msgwam_tpu.simulate`.
    """
    from ..state import RayState, MeanState, State

    if cfg.hprop:
        raise ValueError("simulate_resident requires hprop=False")
    if cfg.cull or cfg.relaunch:
        raise ValueError(
            "the VMEM-resident kernel does not run the lifecycle in-kernel; "
            "call simulate_resident(..., source=...) to route to the "
            "streaming variant, or simulate()"
        )
    # mirror validate_inputs' dtype discipline: this kernel computes in f32,
    # so silently accepting (and down-casting) an f64 parity-config state
    # would hide the precision loss (ADVICE round 2)
    import numpy as _np

    for name, arr in (("state.rays.dens", state.rays.dens),
                      ("state.mean.u", state.mean.u)):
        got = jnp.asarray(arr).dtype
        if got != _np.float32:
            raise TypeError(
                f"simulate_resident computes in float32 but {name} has "
                f"dtype {got}; build the state with dtype=float32 (or use "
                f"simulate() for the f64 parity path)"
            )
    if run.n_steps % run.save_every:
        raise ValueError("n_steps must be divisible by save_every")
    rays, mean = state.rays, state.mean
    n = rays.r.shape[0]
    # resolve the window auto sentinels (-1) against the measured champion
    # ladder for this problem size (rhs_pallas.resolve_champion)
    from .rhs_pallas import apply_champion

    cfg = apply_champion(cfg, n)
    n_rows_needed = _ceil_to(n, LANE) // LANE
    if n_rows_needed > MAX_ROWS:
        # above the VMEM-resident capacity the HBM-streaming variant runs
        # the same whole-run kernel structure with the per-ray state
        # pipelined through VMEM tile by tile (ops/step_pallas_stream.py)
        from .step_pallas_stream import simulate_streaming

        return simulate_streaming(state, statics, bg, cfg, run,
                                  include_t0=include_t0,
                                  launch_sort=launch_sort, observe=observe)

    n_tab = bg.centers.shape[0]
    n_flux_cells = n_tab - 1
    c_pad = _ceil_to(max(n_tab, n_flux_cells), 128)
    maps, cols = build_operators(bg, cfg, n_tab, c_pad)

    f0 = 2.0 * ROT_EARTH * np.sin(float(cfg.phi0))
    centers_np = np.asarray(bg.centers, np.float64)
    faces_np = np.asarray(bg.faces, np.float64)
    dz = np.float32(centers_np[1] - centers_np[0])
    rdiv = 1.0 if cfg.faithful_offline_rates else float(run.dt)
    params = jnp.asarray(np.array([
        np.float32(centers_np[0]), dz, np.float32(faces_np[1]),
        np.float32(run.dt), np.float32(cfg.bvf), np.float32(cfg.kappa),
        np.float32(f0), np.float32(rdiv),
    ], dtype=np.float32))

    # pad to whole 64-row tiles once the state is at least one tile big:
    # a non-64-divisible row count silently dropped the kernel to 8-row
    # tiles (98 tiles at 1e5 rays), measured 1.4x slower than 13 full tiles
    pad_unit = TILE_ROWS * LANE if n >= TILE_ROWS * LANE else 8 * LANE
    n_pad = _ceil_to(max(n, 8 * LANE), pad_unit)
    pad = n_pad - n

    def shape2(x, fill=None):
        # pad by REPLICATING the last slot (not a constant): padded rays are
        # inactive (masked everywhere), but constant fills (r=0, tiny k/m)
        # were measured to slow the kernel ~1.6x at 1e5 rays — out-of-band
        # heights put the pad rows on a different interp/flux path than
        # their tile's window.  Only the activity mask pads with a constant
        # (0 = inactive).
        x = jnp.asarray(x).astype(jnp.float32)
        if fill is not None:
            return jnp.pad(x, (0, pad), constant_values=fill).reshape(-1, LANE)
        return jnp.pad(x, (0, pad), mode="edge").reshape(-1, LANE)

    def colpad(u, v):
        out = jnp.zeros((c_pad, 8), jnp.float32)
        out = out.at[: u.shape[0], 0].set(jnp.asarray(u).astype(jnp.float32))
        out = out.at[: v.shape[0], 1].set(jnp.asarray(v).astype(jnp.float32))
        return out

    statics_fields = (
        shape2(rays.k), shape2(rays.l), shape2(rays.dr),
        shape2(rays.dm), shape2(rays.phi),
        shape2(statics.dkk), shape2(statics.dll),
        shape2(statics.rr_mm_area),
        shape2(statics.active.astype(jnp.float32), fill=0.0),
    )

    interpret = jax.default_backend() != "tpu"
    unshape = lambda x: x.reshape(-1)[:n]
    from .rhs_pallas import resolve_window_cells

    w_cells, w2_cells = resolve_window_cells(cfg, c_pad)

    n_cell = mean.u.shape[0]

    def to_state(dens, r, m, uvT, like_dtype):
        rs = RayState(
            dens=unshape(dens).astype(like_dtype),
            lam=rays.lam, phi=rays.phi,
            r=unshape(r).astype(like_dtype), dr=rays.dr,
            k=rays.k, l=rays.l,
            m=unshape(m).astype(like_dtype), dm=rays.dm,
        )
        ms = MeanState(uvT[:n_cell, 0].astype(like_dtype),
                       uvT[:n_cell, 1].astype(like_dtype))
        return State(rs, ms)

    def chunk(carry, _):
        dens, r, m, uvT = carry
        dens, r, m, uvT, dens_prop = _megakernel_call(
            params, maps, cols, dens, r, m, uvT, *statics_fields,
            n_steps=run.save_every, n_tab=n_tab, n_flux_cells=n_flux_cells,
            online=bool(cfg.saturate_online),
            prognostic=bool(cfg.prognostic_mean),
            faithful=bool(cfg.faithful_saturation),
            interpret=interpret, w_cells=w_cells, w2_cells=w2_cells,
        )
        hist_out = (dens, r, m, uvT, dens_prop)
        if observe is not None:
            # reduce the frame on device inside the scan (history-memory
            # note: simulate_streaming's docstring)
            from ..models.integrate import StepAux

            hist_out = observe(
                to_state(dens, r, m, uvT, rays.dens.dtype), statics,
                StepAux(dens_prop=unshape(dens_prop)
                        .astype(rays.dens.dtype)))
        return (dens, r, m, uvT), hist_out

    carry0 = (shape2(rays.dens), shape2(rays.r), shape2(rays.m),
              colpad(mean.u, mean.v))
    n_outer = run.n_steps // run.save_every
    carry, hist = jax.lax.scan(chunk, carry0, None, length=n_outer)

    final = to_state(*carry, rays.dens.dtype)

    if observe is not None:
        history = hist
        if include_t0:
            from ..models.integrate import StepAux

            obs0 = observe(state, statics,
                           StepAux(dens_prop=state.rays.dens))
            history = jax.tree.map(
                lambda o0, h: jnp.concatenate([jnp.asarray(o0)[None], h]),
                obs0, history)
        return final, statics, history

    hd, hr, hm, huv, hpp = hist
    frames = [
        to_state(hd[t], hr[t], hm[t], huv[t], rays.dens.dtype)
        for t in range(n_outer)
    ]
    prop_frames = [
        unshape(hpp[t]).astype(rays.dens.dtype) for t in range(n_outer)
    ]
    if include_t0:
        frames = [state] + frames
        prop_frames = [state.rays.dens] + prop_frames
    history_state = jax.tree.map(lambda *xs: jnp.stack(xs), *frames)
    active_hist = jnp.broadcast_to(
        statics.active, (len(frames),) + statics.active.shape
    )
    history = (history_state, active_hist, jnp.stack(prop_frames))
    return final, statics, history
